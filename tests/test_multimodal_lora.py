"""LoRA adapter training + chat-template batching on the real Qwen2-VL
multimodal embedder (parity: the reference's --use_lora / --use_chat_template
path in Nexus/training/embedder/multimodal_retrieval, modeling.py:92-150 and
the MultimodalProcessorAdapter chat-template branch, multimodal.py:1144+)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _tiny_hf_config():
    from transformers import Qwen2VLConfig as HFQwen2VLConfig

    return HFQwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, num_heads=2, in_channels=3, patch_size=4,
            temporal_patch_size=2, spatial_merge_size=2, mlp_ratio=2.0,
            hidden_size=48, hidden_act="quick_gelu",
        ),
        text_config=dict(
            vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        ),
        image_token_id=7, video_token_id=8, vision_start_token_id=9,
    )


@pytest.fixture(scope="module")
def hf_ckpt_dir(tmp_path_factory):
    from transformers import Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(_tiny_hf_config()).eval()
    d = tmp_path_factory.mktemp("qwen2vl_ckpt")
    hf.save_pretrained(d)
    return str(d)


class _Tok:
    pad_token_id = 0

    def __call__(self, text, **kw):
        toks = [10 + (ord(ch) % 200) for ch in text]
        return {"input_ids": toks[: kw.get("max_length", 64)]}


def _feed(model, texts, with_image=True):
    from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter

    c = model.vlm_config
    adapter = Qwen2VLProcessorAdapter(
        _Tok(), image_size=16, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, max_length=32,
        image_token_id=c.image_token_id, video_token_id=c.video_token_id,
        vision_start_token_id=c.vision_start_token_id,
    )
    rng = np.random.default_rng(0)
    items = []
    for t in texts:
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        items.append({"text": t, "images": [img] if with_image else []})
    return adapter(items)


def _leaf_paths(tree, pred):
    found = []

    def walk(t, path):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, path + (k,))
        elif pred(path):
            found.append(path)

    walk(tree, ())
    return found


def test_lora_graft_preserves_base_forward(hf_ckpt_dir):
    """lora_B starts at zero, so a freshly-grafted LoRA model must encode
    identically to the plain converted model."""
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )

    plain = BiMultimodalEmbedderModel.from_hf_pretrained(hf_ckpt_dir, image_size=16)
    lora = BiMultimodalEmbedderModel.from_hf_pretrained(
        hf_ckpt_dir, image_size=16, lora_rank=2, lora_alpha=4.0
    )
    assert lora.uses_lora and not plain.uses_lora
    lora_leaves = _leaf_paths(
        lora.variables["params"], lambda p: p[-1] in ("lora_A", "lora_B")
    )
    assert lora_leaves, "no adapter params created"

    feed = _feed(plain, ["hello world", "second"])
    a = plain.encode_feed(plain.variables, {k: jnp.asarray(v) for k, v in feed.items()})
    b = lora.encode_feed(lora.variables, {k: jnp.asarray(v) for k, v in feed.items()})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    mask = lora.trainable_filter()["params"]
    trainable = _leaf_paths(mask, lambda p: True)
    on = [p for p in trainable if _get(mask, p)]
    assert set(on) == {p for p in trainable if p[-1] in ("lora_A", "lora_B")}


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def test_lora_train_step_updates_adapters_only(hf_ckpt_dir):
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )
    from nexus_tpu.training.trainer import RecTrainer

    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )

    # float32 end to end: the merged-export parity check below folds A·B into
    # the base kernels, which only matches the adapter path tightly when the
    # base kernels are not bf16-rounded
    model = BiMultimodalEmbedderModel.from_hf_pretrained(
        hf_ckpt_dir, TextEmbedderModelArguments(dtype="float32"),
        image_size=16, lora_rank=2, lora_alpha=4.0,
    )
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_mm_lora", per_device_train_batch_size=2,
        learning_rate=1e-2, optimizer="adamw", num_train_epochs=1,
    ))
    trainer = RecTrainer(model, targs)
    trainer.init_state()
    step = trainer._build_train_step()

    qf = _feed(model, ["q one", "q two"])
    pf = _feed(model, ["p pos", "p neg", "p pos2", "p neg2"])
    batch = {f"query_{k}": jnp.asarray(v) for k, v in qf.items()}
    batch.update({f"passage_{k}": jnp.asarray(v) for k, v in pf.items()})

    before = jax.tree_util.tree_map(np.asarray, trainer._state.params)
    state, metrics = step(trainer._state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree_util.tree_map(np.asarray, state.params)

    changed, frozen_changed = [], []

    def compare(b, a, path=()):
        if isinstance(b, dict):
            for k in b:
                compare(b[k], a[k], path + (k,))
        elif not np.allclose(b, a):
            (changed if path[-1] in ("lora_A", "lora_B") else frozen_changed).append(path)

    compare(before, after)
    assert changed, "no adapter parameter moved"
    assert not frozen_changed, f"frozen base weights moved: {frozen_changed[:3]}"

    # adapter-only save + merged export round-trip
    out = "/tmp/nx_mm_lora/save"
    model.save(out, state.variables)
    assert os.path.exists(os.path.join(out, "adapter_model.msgpack"))
    assert not os.path.exists(os.path.join(out, "flax_model.msgpack"))

    merged_dir = "/tmp/nx_mm_lora/merged"
    model.save_merged_model(merged_dir, state.variables)
    merged = BiMultimodalEmbedderModel.from_pretrained(merged_dir)
    assert not merged.uses_lora
    feed = {k: jnp.asarray(v) for k, v in _feed(model, ["probe text"]).items()}
    want = model.encode_feed(state.variables, feed)
    got = merged.encode_feed(merged.variables, feed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # trainer resume protocol restores adapters over current base weights
    restored = model.load_variables(out, current=model.variables)
    got2 = model.encode_feed(restored, feed)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=2e-5)


def test_chat_template_token_layout():
    from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter

    tok = _Tok()
    adapter = Qwen2VLProcessorAdapter(
        tok, image_size=16, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, max_length=256, image_token_id=7,
        video_token_id=8, vision_start_token_id=9, vision_end_token_id=6,
        use_chat_template=True,
    )
    rng = np.random.default_rng(0)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    feed = adapter([{"text": "hi", "images": [img]}])
    ids = feed["input_ids"][0]
    n_img = adapter.tokens_per_image
    pre, suf = adapter.chat_prefix_ids, adapter.chat_suffix_ids
    assert pre and suf
    assert list(ids[: len(pre)]) == pre
    block = ids[len(pre) : len(pre) + n_img + 2]
    assert block[0] == 9 and block[-1] == 6  # vision_start ... vision_end
    assert (block[1:-1] == 7).all()
    text_ids = tok("hi")["input_ids"]
    body_start = len(pre) + n_img + 2
    assert list(ids[body_start : body_start + len(text_ids)]) == text_ids
    tail = ids[body_start + len(text_ids) : body_start + len(text_ids) + len(suf)]
    assert list(tail) == suf
    n_real = int(feed["attention_mask"][0].sum())
    assert n_real == body_start + len(text_ids) + len(suf)
