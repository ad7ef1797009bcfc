"""Int8 W8A8 quantized encode path (models/quantize.py).

Quality contract: per-channel int8 weights + per-token dynamic int8
activations keep embedding cosine vs the fp path > 0.999 and preserve
nearest-neighbor ordering on a smoke corpus.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.models.bert import BertConfig, BertEncoderModel
from nexus_tpu.models.quantize import quantize_bert_params


def _tiny(add_pool=False):
    return BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, add_pooling_layer=add_pool,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )


def test_quantized_encoder_close_to_fp():
    cfg = _tiny()
    model = BertEncoderModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 200, (4, 24)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    ref = model.apply(variables, ids)["last_hidden_state"]

    vq = quantize_bert_params(variables)
    # scanned kernels became int8 with a per-(layer, channel) scale
    kq = vq["params"]["layers"]["layer"]["intermediate_dense"]["kernel"]
    assert kq.dtype == jnp.int8 and kq.shape == (4, 64, 128)
    assert vq["params"]["layers"]["layer"]["intermediate_dense"]["scale"].shape == (4, 128)
    # non-projection leaves untouched
    assert vq["params"]["embeddings"]["word_embeddings"]["embedding"].dtype != jnp.int8

    mq = BertEncoderModel(dataclasses.replace(cfg, quantized=True), dtype=jnp.float32)
    out = mq.apply(vq, ids)["last_hidden_state"]
    a = np.asarray(ref).reshape(-1, 64)
    b = np.asarray(out).reshape(-1, 64)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos.min()


def test_quantized_flash_attention_composes():
    cfg = dataclasses.replace(_tiny(), attention_impl="pallas", quantized=True)
    ref_cfg = _tiny()
    model = BertEncoderModel(ref_cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 200, (2, 16)), jnp.int32)
    mask = jnp.asarray((rng.random((2, 16)) < 0.8), jnp.int32).at[:, 0].set(1)
    # right-contiguous mask for the lengths fast path
    mask = jnp.sort(mask, axis=1)[:, ::-1]
    variables = model.init(jax.random.PRNGKey(0), ids)
    ref = model.apply(variables, ids, attention_mask=mask)["last_hidden_state"]
    mq = BertEncoderModel(cfg, dtype=jnp.float32)
    out = mq.apply(quantize_bert_params(variables), ids, attention_mask=mask)["last_hidden_state"]
    valid = np.asarray(mask).astype(bool)
    a, b = np.asarray(ref)[valid], np.asarray(out)[valid]
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos.min()


@pytest.fixture()
def tiny_ckpt(tmp_path):
    pytest.importorskip("torch")
    from transformers import BertConfig as HFC
    from transformers import BertModel, BertTokenizerFast

    d = tmp_path / "bert"
    d.mkdir()
    words = ["the", "dog", "cat", "runs", "sits", "fast", "slow", "red", "blue", "sky"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=4, intermediate_size=64,
                  max_position_embeddings=64)).save_pretrained(str(d))
    return str(d)


def test_text_embedder_quantized_serving(tiny_ckpt):
    """TextEmbedder(quantized=True): int8 engine, neighbor-order parity."""
    from nexus_tpu.inference.embedder.text_retrieval import TextEmbedder

    texts = ["the dog runs fast", "a red cat sits", "blue sky", "the slow dog",
             "cat runs", "red and blue", "dog sits slow", "fast sky"]
    fp = TextEmbedder(tiny_ckpt, batch_size=8, max_length=16, seq_buckets=(16,))
    q = TextEmbedder(tiny_ckpt, batch_size=8, max_length=16, seq_buckets=(16,),
                     quantized=True)
    e_fp = fp.encode(texts)
    e_q = q.encode(texts)
    cos = np.sum(e_fp * e_q, -1)  # both L2-normalized
    assert cos.min() > 0.999, cos.min()
    # retrieval quality: the int8 engine's chosen neighbor scores within
    # 2e-3 of the fp optimum under the FP metric (exact-argmax is unstable
    # for a random tiny model whose similarities are near-tied)
    s_fp = e_fp @ e_fp.T
    np.fill_diagonal(s_fp, -1)
    s_q = e_q @ e_q.T
    np.fill_diagonal(s_q, -1)
    chosen = s_fp[np.arange(len(texts)), s_q.argmax(-1)]
    assert (s_fp.max(-1) - chosen < 2e-3).all(), s_fp.max(-1) - chosen


def test_quantized_llama_close_to_fp():
    """Decoder trunk int8: last-hidden cosine vs fp > 0.998 (GQA + RoPE;
    the pre-norm residual stream amplifies quant noise slightly more than
    the post-norm BERT stack)."""
    from nexus_tpu.models.llama import LlamaConfig, LlamaModel
    from nexus_tpu.models.quantize import quantize_llama_params

    cfg = LlamaConfig(vocab_size=200, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=3, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    model = LlamaModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(2, 200, (2, 20)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    ref = model.apply(variables, ids)["last_hidden_state"]

    qcfg = dataclasses.replace(cfg, quantized=True)
    mq = LlamaModel(qcfg, dtype=jnp.float32)
    out = mq.apply(quantize_llama_params(variables), ids)["last_hidden_state"]
    a = np.asarray(ref).reshape(-1, 64)
    b = np.asarray(out).reshape(-1, 64)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.998, cos.min()


def test_quantized_decoder_reranker_scores():
    """TextReranker(quantized=True) on a decoder cross-encoder: int8 scores
    track the fp scores closely enough to preserve pair ordering."""
    from types import SimpleNamespace

    from nexus_tpu.inference.reranker.text_retrieval import TextReranker
    from nexus_tpu.models.llama import LlamaConfig
    from nexus_tpu.training.reranker.text_retrieval.decoder_only import (
        DecoderCrossEncoderModel,
    )

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=32)

    proto = DecoderCrossEncoderModel(dataclasses.replace(cfg), dtype="float32")
    variables = proto.init_variables(jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    ids = np.zeros((6, 16), np.int32)
    for i in range(6):
        ln = int(rng.integers(4, 16))
        ids[i, :ln] = rng.integers(2, 127, ln)
    feed = {"input_ids": ids, "attention_mask": (ids != 0).astype(np.int32),
            "token_type_ids": np.zeros_like(ids)}

    def scores(quant):
        m = DecoderCrossEncoderModel(dataclasses.replace(cfg), dtype="float32")
        m.variables = variables
        rr = TextReranker(model=m, tokenizer=SimpleNamespace(pad_token="[PAD]"),
                          batch_size=6, max_length=16, quantized=quant)
        return np.asarray(rr.session.run(None, feed)[0])

    s_fp = scores(False)
    s_q = scores(True)
    # scores are unbounded logits: compare on scale of the observed spread
    spread = s_fp.max() - s_fp.min() + 1e-6
    assert np.max(np.abs(s_fp - s_q)) / spread < 0.05, (s_fp, s_q)


def test_quantized_decoder_embedder_encode():
    """Regression (review finding): BiDecoderOnlyEmbedderModel aliases
    bert_config to its LlamaConfig — quantize_model must dispatch on the
    config CLASS and route decoders to the llama converter."""
    from types import SimpleNamespace

    from nexus_tpu.inference.embedder.text_retrieval import TextEmbedder
    from nexus_tpu.models.llama import LlamaConfig
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import (
        BiDecoderOnlyEmbedderModel,
    )

    cfg = LlamaConfig(vocab_size=120, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=32)
    margs = TextEmbedderModelArguments(dtype="float32",
                                       sentence_pooling_method="last_token")

    def build():
        m = BiDecoderOnlyEmbedderModel(dataclasses.replace(cfg), margs)
        m.variables = variables
        return m

    proto = BiDecoderOnlyEmbedderModel(dataclasses.replace(cfg), margs)
    variables = proto.init_variables(jax.random.PRNGKey(0))

    class Tok:
        pad_token = "[PAD]"

        def __call__(self, texts, **kw):
            rng = np.random.default_rng(abs(hash(tuple(texts))) % 2**31)
            ids = np.zeros((len(texts), 16), np.int64)
            for i, t in enumerate(texts):
                ln = 4 + (len(t) % 10)
                ids[i, :ln] = rng.integers(2, 119, ln)
            return {"input_ids": ids, "attention_mask": (ids != 0).astype(np.int64)}

    texts = ["alpha beta", "gamma delta epsilon", "zeta", "eta theta"]
    fp = TextEmbedder(model=build(), tokenizer=Tok(), batch_size=4,
                      max_length=16, seq_buckets=(16,))
    q = TextEmbedder(model=build(), tokenizer=Tok(), batch_size=4,
                     max_length=16, seq_buckets=(16,), quantized=True)
    e_fp, e_q = fp.encode(texts), q.encode(texts)
    assert np.isfinite(e_q).all()
    cos = np.sum(e_fp * e_q, -1)
    assert cos.min() > 0.99, cos
    # and the trunk really is int8
    k = q.model.variables["params"]["layers"]["layer"]["self_attn"]["q_proj"]["kernel"]
    assert k.dtype == jnp.int8


def test_quantized_aot_session_parity(tiny_ckpt):
    """int8 composes with the bucketed AOT session path (infer_mode='aot'):
    same embeddings as the jit engine."""
    from nexus_tpu.inference.embedder.text_retrieval import TextEmbedder

    texts = ["the dog runs", "red cat", "blue sky sits", "fast slow"]
    q_jit = TextEmbedder(tiny_ckpt, batch_size=4, max_length=16,
                         seq_buckets=(16,), quantized=True)
    q_aot = TextEmbedder(tiny_ckpt, batch_size=4, max_length=16,
                         seq_buckets=(16,), quantized=True, infer_mode="aot")
    a = q_jit.encode(texts)
    b = q_aot.encode(texts)
    np.testing.assert_allclose(a, b, atol=2e-5)


def _tiny128():
    """Big enough for the fused-kernel shape gate (H % 128 == 0)."""
    return BertConfig(
        vocab_size=300, hidden_size=128, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=256,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )


def test_int8_fused_megakernel_matches_unfused_quantized():
    """attention_impl='fused' + quantized=True runs the int8 full-layer
    megakernel (fused_encoder_layer_int8): same quantization math as the
    unfused QuantDense path, so outputs agree tightly — and both stay
    cosine > 0.999 vs the fp model."""
    import dataclasses as dc

    cfg = _tiny128()
    model = BertEncoderModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(2, 300, (3, 40)), jnp.int32)
    lens = np.array([40, 17, 29])
    mask = jnp.asarray(np.arange(40)[None, :] < lens[:, None], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    fp = model.apply(variables, ids, attention_mask=mask)["last_hidden_state"]

    vq = quantize_bert_params(variables)
    out = {}
    for impl in ("xla", "fused"):
        mq = BertEncoderModel(dc.replace(cfg, quantized=True,
                                         attention_impl=impl),
                              dtype=jnp.float32)
        out[impl] = mq.apply(vq, ids, attention_mask=mask)["last_hidden_state"]
    valid = np.asarray(mask).astype(bool)
    a, b = np.asarray(out["xla"])[valid], np.asarray(out["fused"])[valid]
    np.testing.assert_allclose(a, b, atol=5e-2)
    f = np.asarray(fp)[valid]
    cos = np.sum(f * b, -1) / (np.linalg.norm(f, axis=-1)
                               * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos.min()


def test_int8_fused_megakernel_segment_mode():
    """Packed rows (segment_ids) through the int8 megakernel agree with the
    unfused quantized path."""
    import dataclasses as dc

    cfg = _tiny128()
    model = BertEncoderModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(8)
    ids = jnp.asarray(rng.integers(2, 300, (2, 32)), jnp.int32)
    seg = np.zeros((2, 32), np.int32)
    seg[0, :10], seg[0, 10:25] = 1, 2
    seg[1, :20] = 1
    seg = jnp.asarray(seg)
    mask = (seg > 0).astype(jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    vq = quantize_bert_params(variables)
    out = {}
    for impl in ("xla", "fused"):
        mq = BertEncoderModel(dc.replace(cfg, quantized=True,
                                         attention_impl=impl),
                              dtype=jnp.float32)
        out[impl] = mq.apply(vq, ids, attention_mask=mask,
                             segment_ids=seg)["last_hidden_state"]
    valid = np.asarray(seg) > 0
    a, b = np.asarray(out["xla"])[valid], np.asarray(out["fused"])[valid]
    np.testing.assert_allclose(a, b, atol=5e-2)


def test_int8_fused_op_matches_quantdense_composition():
    """Op-level oracle: fused_encoder_layer_int8 vs the same layer built
    from QuantDense GEMMs + exact softmax in plain XLA."""
    from nexus_tpu.models.quantize import _quantize_kernel
    from nexus_tpu.ops.fused_encoder import fused_encoder_layer_int8

    H, HEADS, FF, EPS = 128, 2, 256, 1e-12
    rng = np.random.default_rng(9)
    b, l = 2, 24
    x = jnp.asarray(rng.normal(0, 1, (b, l, H)), jnp.float32)
    lengths = jnp.asarray([24, 13], jnp.int32)

    def mkw(k_in, k_out):
        w = rng.normal(0, 0.05, (k_in, k_out)).astype(np.float32)
        q, s = _quantize_kernel(w)
        return jnp.asarray(q), jnp.asarray(s), w

    wqkv_q, s_qkv, wqkv = mkw(H, 3 * H)
    wo_q, s_o, wo = mkw(H, H)
    wup_q, s_up, wup = mkw(H, FF)
    wdn_q, s_dn, wdn = mkw(FF, H)
    bqkv, bo = (jnp.asarray(rng.normal(0, 0.05, n), jnp.float32)
                for n in (3 * H, H))
    bup, bdn = (jnp.asarray(rng.normal(0, 0.05, n), jnp.float32)
                for n in (FF, H))
    g1, b1, g2, b2 = (jnp.asarray(rng.normal(1, 0.1, H), jnp.float32)
                      for _ in range(4))

    def qdense(t, wq, s, bias):
        tf = jnp.asarray(t, jnp.float32)
        amax = jnp.max(jnp.abs(tf), axis=-1, keepdims=True)
        s_a = jnp.maximum(amax, 1e-6) / 127.0
        tq = jnp.clip(jnp.round(tf / s_a), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(tq, wq, (((t.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * s_a * s + bias

    def ln(t, g, bb):
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
        return (t - mu) * jax.lax.rsqrt(var + EPS) * g + bb

    # oracle
    qkv = qdense(x, wqkv_q, s_qkv, bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to4 = lambda t: t.reshape(b, l, HEADS, H // HEADS)  # noqa: E731
    s = jnp.einsum("bqhd,bkhd->bhqk", to4(q), to4(k)) / np.sqrt(H // HEADS)
    kpos = np.arange(l)[None, :] < np.asarray(lengths)[:, None]
    s = jnp.where(jnp.asarray(kpos)[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, to4(v)).reshape(b, l, H)
    ctx = jnp.where(jnp.asarray(kpos)[:, :, None], ctx, 0.0)
    h1 = ln(x + qdense(ctx, wo_q, s_o, bo), g1, b1)
    up = jax.nn.gelu(qdense(h1, wup_q, s_up, bup))
    want = ln(h1 + qdense(up, wdn_q, s_dn, bdn), g2, b2)

    got = fused_encoder_layer_int8(
        x, (wqkv_q, s_qkv, bqkv, wo_q, s_o, bo, g1, b1,
            wup_q, s_up, bup, wdn_q, s_dn, bdn, g2, b2),
        lengths=lengths, heads=HEADS, eps=EPS)
    valid = np.asarray(kpos)
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid], atol=3e-2)


def test_int8_decoder_composes_with_fused_megakernel():
    """quantized + attention_impl='fused' on the decoder trunk: the
    megakernel consumes DEQUANTIZED attention projections (weights stay
    int8 in HBM) while the MLP keeps int8 GEMMs. Output tracks both the
    unfused quantized path and the fp model."""
    from nexus_tpu.models.llama import LlamaConfig, LlamaModel
    from nexus_tpu.models.quantize import quantize_llama_params

    cfg = LlamaConfig(vocab_size=200, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    model = LlamaModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(2, 200, (2, 24)), jnp.int32)
    lens = np.array([24, 11])
    mask = jnp.asarray(np.arange(24)[None, :] < lens[:, None], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    fp = model.apply(variables, ids,
                     attention_mask=mask)["last_hidden_state"]

    vq = quantize_llama_params(variables)
    out = {}
    for impl in ("pallas", "fused"):
        mq = LlamaModel(dataclasses.replace(cfg, quantized=True,
                                            attention_impl=impl),
                        dtype=jnp.float32)
        out[impl] = mq.apply(vq, ids,
                             attention_mask=mask)["last_hidden_state"]
    valid = np.asarray(mask).astype(bool)
    f = np.asarray(fp)[valid]
    for impl, o in out.items():
        b = np.asarray(o)[valid]
        cos = np.sum(f * b, -1) / (np.linalg.norm(f, axis=-1)
                                   * np.linalg.norm(b, axis=-1))
        assert cos.min() > 0.998, (impl, cos.min())
    a = np.asarray(out["pallas"])[valid]
    b = np.asarray(out["fused"])[valid]
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos.min()


def test_quantize_vlm_params_excludes_vision_tower():
    """VLM conversion: the text trunk quantizes, the vision tower must NOT —
    the Qwen2.5-VL vision block reuses gate/up/down_proj NAMES but holds
    plain nn.Dense modules (a blanket llama-names walk would corrupt it)."""
    from nexus_tpu.models.quantize import quantize_vlm_params

    w = lambda *s: np.random.default_rng(0).normal(0, 0.1, s).astype(np.float32)  # noqa: E731
    variables = {"params": {
        "visual": {"blocks": {"block": {
            "qkv": {"kernel": w(8, 24), "bias": w(24)},
            "gate_proj": {"kernel": w(8, 16), "bias": w(16)},
            "down_proj": {"kernel": w(16, 8), "bias": w(8)},
        }}},
        "layers": {"layer": {
            "self_attn": {"q_proj": {"kernel": w(8, 8)}},
            "mlp": {"gate_proj": {"kernel": w(8, 16)}},
        }},
    }}
    out = quantize_vlm_params(variables)
    vis = out["params"]["visual"]["blocks"]["block"]
    assert vis["gate_proj"]["kernel"].dtype == np.float32
    assert "scale" not in vis["gate_proj"]
    txt = out["params"]["layers"]["layer"]
    assert txt["self_attn"]["q_proj"]["kernel"].dtype == jnp.int8
    assert txt["mlp"]["gate_proj"]["scale"].shape == (16,)


def test_multimodal_embedder_quantized_serving(tmp_path):
    """MultimodalEmbedder(quantized=True): the text trunk serves int8 with
    embedding cosine vs fp > 0.99."""
    from transformers import BertTokenizerFast

    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder
    from nexus_tpu.models.vlm import VLMConfig
    from nexus_tpu.training.embedder.multimodal_retrieval import (
        BiMultimodalEmbedderModel,
    )
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )

    words = ["a", "cat", "dog", "red", "blue", "photo"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))

    cfg = VLMConfig.tiny()
    model = BiMultimodalEmbedderModel(
        cfg, TextEmbedderModelArguments(dtype="float32", temperature=0.1))
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    items = ["a red photo", "blue dog", {"text": "cat photo"}]

    def encode(quant):
        m = BiMultimodalEmbedderModel(
            cfg, TextEmbedderModelArguments(dtype="float32", temperature=0.1))
        m.variables = model.variables
        e = MultimodalEmbedder(model=m, tokenizer=tok, batch_size=4,
                               max_length=16, quantized=quant)
        return e.encode_queries(items)

    e_fp = encode(False)
    cfg.text.quantized = False  # reset (quantize_model flips the shared cfg)
    e_q = encode(True)
    cfg.text.quantized = False
    assert np.isfinite(e_q).all()
    cos = np.sum(e_fp * e_q, -1)
    assert cos.min() > 0.99, cos
