"""Sequence packing: packer invariants + packed-vs-unpacked model parity
+ fused QKV parity (parity target: the reference's dynamic-shape
length-sorted batching, Nexus/inference/embedder/text_retrieval/base.py)."""

import jax
from jax.flatten_util import ravel_pytree as _ravel_pytree
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.models.bert import BertConfig, BertEncoderModel, pool_hidden_states
from nexus_tpu.ops.packing import (
    PackedBatch,
    pack_sequences,
    pool_packed_cls,
    pool_packed_mean,
)


def _random_seqs(rng, n, lo=3, hi=20, vocab=100):
    return [rng.integers(1, vocab, rng.integers(lo, hi + 1)).astype(np.int32) for _ in range(n)]


def test_packer_invariants():
    rng = np.random.default_rng(0)
    seqs = _random_seqs(rng, 64, lo=2, hi=30)
    packed = pack_sequences(seqs, row_len=32)
    assert packed.n_sequences == 64
    # every sequence present, contiguous, with restarting positions
    for i, s in enumerate(seqs):
        r, c = int(packed.pool_rows[i]), int(packed.pool_cols[i])
        l = len(s)
        np.testing.assert_array_equal(packed.input_ids[r, c : c + l], s)
        np.testing.assert_array_equal(packed.position_ids[r, c : c + l], np.arange(l))
        assert (packed.token_seq[r, c : c + l] == i).all()
        seg = packed.segment_ids[r, c : c + l]
        assert (seg == seg[0]).all() and seg[0] >= 1
    # padding is segment 0 / token_seq == N
    pad = packed.segment_ids == 0
    assert (packed.input_ids[pad] == 0).all()
    assert (packed.token_seq[pad] == 64).all()
    # FFD should be dense for this mixture
    assert packed.occupancy > 0.8
    # rows never exceed row_len (trivially true by construction) and each
    # row's segments are 1..S contiguous
    for r in range(packed.n_rows):
        segs = packed.segment_ids[r][packed.segment_ids[r] > 0]
        if len(segs):
            assert set(np.unique(segs)) == set(range(1, segs.max() + 1))


def test_packer_row_padding():
    rng = np.random.default_rng(1)
    packed = pack_sequences(_random_seqs(rng, 10, lo=2, hi=8), row_len=16)
    padded = packed.pad_rows(packed.n_rows + 3)
    assert padded.n_rows == packed.n_rows + 3
    assert (padded.segment_ids[packed.n_rows :] == 0).all()
    assert (padded.token_seq[packed.n_rows :] == 10).all()


@pytest.fixture(scope="module")
def tiny_bert():
    config = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, add_pooling_layer=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = BertEncoderModel(config)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    return config, model, variables


def _encode_unpacked(model, variables, seqs, max_len):
    ids = np.zeros((len(seqs), max_len), np.int32)
    mask = np.zeros((len(seqs), max_len), np.int32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    out = model.apply(variables, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    return out["last_hidden_state"], jnp.asarray(mask)


def test_packed_matches_unpacked(tiny_bert):
    """The packed forward must produce the SAME per-sequence embeddings as
    padding each sequence into its own row."""
    config, model, variables = tiny_bert
    rng = np.random.default_rng(2)
    seqs = _random_seqs(rng, 24, lo=3, hi=14)
    packed = pack_sequences(seqs, row_len=32)

    hidden_packed = model.apply(
        variables,
        jnp.asarray(packed.input_ids),
        position_ids=jnp.asarray(packed.position_ids),
        segment_ids=jnp.asarray(packed.segment_ids),
    )["last_hidden_state"]
    cls_packed = pool_packed_cls(hidden_packed, packed.pool_rows, packed.pool_cols)
    mean_packed = pool_packed_mean(
        hidden_packed, packed.token_seq, packed.lengths, packed.n_sequences
    )

    hidden_unpacked, mask = _encode_unpacked(model, variables, seqs, max_len=16)
    cls_ref = pool_hidden_states(hidden_unpacked, mask, "cls")
    mean_ref = pool_hidden_states(hidden_unpacked, mask, "mean")

    np.testing.assert_allclose(np.asarray(cls_packed), np.asarray(cls_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean_packed), np.asarray(mean_ref), atol=2e-5)


def test_fused_qkv_parity(tiny_bert):
    """fused_qkv=True with packed q|k|v kernels reproduces the unfused model."""
    config, model, variables = tiny_bert
    fused_cfg = BertConfig.from_dict({**config.to_dict(), "fused_qkv": True})
    fused_model = BertEncoderModel(fused_cfg)

    def fuse(tree):
        tree = jax.tree_util.tree_map(lambda x: x, tree)  # copy containers
        layers = tree["params"]["layers"]["layer"]
        att = layers["attention_self"]
        qkv = {
            "kernel": jnp.concatenate(
                [att["query"]["kernel"], att["key"]["kernel"], att["value"]["kernel"]],
                axis=-1,
            ),
            "bias": jnp.concatenate(
                [att["query"]["bias"], att["key"]["bias"], att["value"]["bias"]], axis=-1
            ),
        }
        layers_new = {k: v for k, v in layers.items() if k != "attention_self"}
        layers_new["attention_self"] = {"qkv": qkv}
        params = {k: v for k, v in tree["params"].items() if k != "layers"}
        params["layers"] = {"layer": layers_new}
        return {"params": params}

    fused_vars = fuse(variables)
    ids = jnp.asarray(np.random.default_rng(3).integers(1, 100, (4, 12)), jnp.int32)
    out_a = model.apply(variables, ids)["last_hidden_state"]
    out_b = fused_model.apply(fused_vars, ids)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=2e-5)


def test_text_embedder_packed_encode_parity(tmp_path):
    """TextEmbedder(packing=True) returns the same embeddings as the padded
    path, while processing fewer device tokens."""
    pytest.importorskip("torch")
    from transformers import BertConfig as HFC
    from transformers import BertModel, BertTokenizerFast

    d = tmp_path / "m"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "aa", "bb", "cc", "dd", "ee"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=64)).save_pretrained(str(d))

    from nexus_tpu.inference import TextEmbedder

    rng = np.random.default_rng(5)
    words = ["aa", "bb", "cc", "dd", "ee"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 12))) for _ in range(33)]
    plain = TextEmbedder(model_name_or_path=str(d), batch_size=16, max_length=32)
    packed = TextEmbedder(model_name_or_path=str(d), batch_size=16, max_length=32,
                          packing=True)
    a = plain.encode(texts)
    b = packed.encode(texts)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=3e-5)


def test_hf_convert_fused_qkv(tmp_path):
    """torch->flax conversion with fused_qkv packs q|k|v and matches the
    unfused conversion numerically."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
    )
    hf_model = BertModel(hf_cfg)
    sd = hf_model.state_dict()

    from nexus_tpu.models.bert import BertConfig as NxBertConfig
    from nexus_tpu.models.hf_convert import torch_bert_to_flax

    cfg = NxBertConfig.from_hf(hf_cfg.to_dict())
    cfg.add_pooling_layer = False
    cfg.hidden_dropout_prob = 0.0
    cfg.attention_probs_dropout_prob = 0.0
    vars_plain = torch_bert_to_flax(sd, cfg)
    cfg_fused = NxBertConfig.from_dict({**cfg.to_dict(), "fused_qkv": True})
    vars_fused = torch_bert_to_flax(sd, cfg_fused)

    ids = jnp.asarray(np.random.default_rng(4).integers(1, 100, (2, 10)), jnp.int32)
    out_a = BertEncoderModel(cfg).apply(vars_plain, ids)["last_hidden_state"]
    out_b = BertEncoderModel(cfg_fused).apply(vars_fused, ids)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=2e-5)


# ---------------------------------------------------------------------------
# packed TRAINING: loss + gradients match the padded path
# ---------------------------------------------------------------------------


def _ragged_contrastive_batch(rng, b, g, max_len, vocab=200):
    """Padded batch + its packed twin over the same ragged sequences."""
    from nexus_tpu.ops.packing import pack_tokenized

    def make(n):
        lens = rng.integers(3, max_len + 1, n)
        ids = np.zeros((n, max_len), np.int32)
        mask = np.zeros((n, max_len), np.int32)
        for i, l in enumerate(lens):
            ids[i, :l] = rng.integers(1, vocab, l)
            mask[i, :l] = 1
        return ids, mask

    q_ids, q_mask = make(b)
    p_ids, p_mask = make(b * g)
    padded = {
        "query_input_ids": q_ids, "query_attention_mask": q_mask,
        "passage_input_ids": p_ids, "passage_attention_mask": p_mask,
    }
    packed = {}
    for prefix, (ids, mask) in (("query", (q_ids, q_mask)), ("passage", (p_ids, p_mask))):
        pk = pack_tokenized(ids, mask, row_len=max_len, row_bucket=4)
        packed.update({f"{prefix}_{k}": v for k, v in pk.items()})
    return padded, packed


@pytest.mark.parametrize("pooling", ["cls", "mean", "last_token"])
def test_packed_training_loss_and_grad_parity(pooling):
    """loss_fn over a packed batch == loss_fn over the equivalent padded
    batch, including gradients (block-diagonal segment attention + restarting
    positions must be transparent to training)."""
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel

    cfg = BertConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, add_pooling_layer=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    margs = TextEmbedderModelArguments(
        temperature=0.05, dtype="float32", sentence_pooling_method=pooling,
        attention_impl="xla",
    )
    model = BiTextEmbedderModel(cfg, margs)
    variables = model.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    padded, packed = _ragged_contrastive_batch(rng, b=4, g=3, max_len=24)

    key = jax.random.PRNGKey(1)
    loss_pad, _ = model.loss_fn(variables, {k: jnp.asarray(v) for k, v in padded.items()}, key)
    loss_pk, _ = model.loss_fn(variables, {k: jnp.asarray(v) for k, v in packed.items()}, key)
    np.testing.assert_allclose(float(loss_pad), float(loss_pk), rtol=2e-5)

    g_pad = jax.grad(lambda v: model.loss_fn(v, padded, key)[0])(variables)
    g_pk = jax.grad(lambda v: model.loss_fn(v, packed, key)[0])(variables)
    flat_pad, _ = _ravel_pytree(g_pad)
    flat_pk, _ = _ravel_pytree(g_pk)
    np.testing.assert_allclose(np.asarray(flat_pad), np.asarray(flat_pk), atol=5e-5)


def test_packed_collator_emits_packed_keys(tmp_path):
    """TextEmbedderCollator(pack_sequences=True) produces the packed batch
    layout the model's loss_fn dispatches on."""
    pytest.importorskip("torch")
    from transformers import BertTokenizerFast

    d = tmp_path / "tok"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "aa", "bb", "cc"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))

    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderDataArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.dataset import TextEmbedderCollator

    args = TextEmbedderDataArguments(
        train_group_size=2, query_max_len=16, passage_max_len=16,
        pack_sequences=True, pack_row_len=16, pack_row_bucket=2,
    )
    coll = TextEmbedderCollator(tok, args)
    examples = [
        {"query": "aa bb", "passages": ["aa", "bb cc aa"], "teacher_scores": None},
        {"query": "cc", "passages": ["bb", "aa aa"], "teacher_scores": None},
    ]
    batch = coll(examples)
    assert batch["query_pool_rows"].shape == (2,)
    assert batch["passage_pool_rows"].shape == (4,)
    assert batch["query_input_ids"].shape[1] == 16
    assert batch["query_input_ids"].shape[0] % 2 == 0  # row bucket
    # every real token accounted for
    assert batch["passage_lengths"].sum() == (batch["passage_segment_ids"] > 0).sum()


def test_packed_cross_encoder_scores_parity():
    """Packed (query,passage) pair scoring through pool_gather matches the
    padded cross-encoder bit-for-bit-within-tolerance: same params, the CLS
    of each packed pair rides through the same pooler + classifier."""
    from nexus_tpu.ops.packing import pack_tokenized
    from nexus_tpu.training.reranker.text_retrieval.modeling import CrossEncoderModel

    cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = CrossEncoderModel(cfg, train_group_size=4, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    n_pairs, L = 8, 32
    lens = rng.integers(6, L, n_pairs)
    ids = np.zeros((n_pairs, L), np.int32)
    mask = np.zeros((n_pairs, L), np.int32)
    tt = np.zeros((n_pairs, L), np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(1, 127, l)
        mask[i, :l] = 1
        tt[i, l // 2 : l] = 1  # second half = passage segment

    padded = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
              "token_type_ids": jnp.asarray(tt)}
    want = np.asarray(model.scores(model.variables, padded))

    pk = pack_tokenized(ids, mask, row_len=L, row_bucket=4, extras={"token_type_ids": tt})
    packed = {k: jnp.asarray(v) for k, v in pk.items()}
    got = np.asarray(model.scores(model.variables, packed))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # loss parity too (group CE over the same scores)
    loss_pad, _ = model.loss_fn(model.variables, padded, jax.random.PRNGKey(1))
    loss_pk, _ = model.loss_fn(model.variables, packed, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_pk), float(loss_pad), atol=2e-4)


def test_decoder_embedder_packed_encode_parity(tmp_path):
    """TextEmbedder(packing=True) with a DECODER (causal, last-token
    pooling) embedder: packed embeddings equal the padded path — causal
    attention within segments, per-segment last-token gather."""
    from transformers import BertTokenizerFast

    from nexus_tpu.inference import TextEmbedder
    from nexus_tpu.models.llama import LlamaConfig
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import (
        BiDecoderOnlyEmbedderModel,
    )

    d = tmp_path / "tok"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "aa", "bb", "cc", "dd", "ee"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))

    cfg = LlamaConfig(vocab_size=len(vocab), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=64)
    model = BiDecoderOnlyEmbedderModel(
        cfg, TextEmbedderModelArguments(sentence_pooling_method="last_token",
                                        dtype="float32"))
    model.variables = model.init_variables(jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    words = ["aa", "bb", "cc", "dd", "ee"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 12))) for _ in range(21)]
    plain = TextEmbedder(model=model, tokenizer=tok, batch_size=8, max_length=32)
    packed = TextEmbedder(model=model, tokenizer=tok, batch_size=8, max_length=32,
                          packing=True)
    a = plain.encode(texts)
    b = packed.encode(texts)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=3e-5)


def test_packed_decoder_reranker_training_parity():
    """pack_pairs for the DECODER cross-encoder: loss_fn over a packed
    pairs batch equals the padded batch, including gradients (the runner
    now allows packed collation for LLM backbones)."""
    from nexus_tpu.models.llama import LlamaConfig
    from nexus_tpu.ops.packing import pack_tokenized
    from nexus_tpu.training.reranker.text_retrieval.decoder_only import (
        DecoderCrossEncoderModel,
    )

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    model = DecoderCrossEncoderModel(cfg, train_group_size=3, dtype="float32")
    variables = model.init_variables(jax.random.PRNGKey(0))

    rng = np.random.default_rng(9)
    n, L = 6, 24  # 2 groups x 3 pairs
    ids = np.zeros((n, L), np.int32)
    for i in range(n):
        ln = int(rng.integers(4, L))
        ids[i, :ln] = rng.integers(2, 127, ln)
    mask = (ids != 0).astype(np.int32)
    padded = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)}
    packed = {k: jnp.asarray(v)
              for k, v in pack_tokenized(ids, mask, row_len=L, row_bucket=2).items()}

    key = jax.random.PRNGKey(1)
    loss_pad, _ = model.loss_fn(variables, padded, key)
    loss_pk, _ = model.loss_fn(variables, packed, key)
    np.testing.assert_allclose(float(loss_pad), float(loss_pk), rtol=2e-5)

    from jax.flatten_util import ravel_pytree as _rp

    g_pad = _rp(jax.grad(lambda v: model.loss_fn(v, padded, key)[0])(variables))[0]
    g_pk = _rp(jax.grad(lambda v: model.loss_fn(v, packed, key)[0])(variables))[0]
    np.testing.assert_allclose(np.asarray(g_pad), np.asarray(g_pk), atol=5e-5)
