import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.models.vlm import VLMBackbone, VLMConfig
from nexus_tpu.modules.multimodal import (
    MultimodalProcessorAdapter,
    load_image,
    normalize_multimodal_item,
)


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("tok")
    words = ["a", "cat", "dog", "red", "blue", "photo", "of", "the"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"))


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    paths = []
    for i, color in enumerate([(255, 0, 0), (0, 0, 255), (0, 255, 0)]):
        p = d / f"img{i}.png"
        Image.new("RGB", (32, 32), color).save(p)
        paths.append(str(p))
    return paths


def test_normalize_multimodal_item(images):
    assert normalize_multimodal_item("hello")["text"] == "hello"
    item = normalize_multimodal_item({"text": "x", "image": "a.png"}, media_root="/root")
    assert item["images"] == ["/root/a.png"]
    item2 = normalize_multimodal_item({"text": "y", "images": [images[0]]})
    assert item2["images"] == [images[0]]


def test_load_image_normalization(images):
    arr = load_image(images[0], 56)
    assert arr.shape == (56, 56, 3)
    assert np.isfinite(arr).all()


def test_processor_adapter(tokenizer, images):
    proc = MultimodalProcessorAdapter(tokenizer, image_size=56, num_image_tokens=16,
                                      max_length=64, max_images=2)
    items = [
        {"text": "a photo of the cat", "images": [images[0]], "videos": [], "pages": []},
        {"text": "dog", "images": [], "videos": [], "pages": []},
    ]
    feed = proc(items)
    assert feed["input_ids"].shape == (2, 64)
    assert feed["pixel_values"].shape == (2, 2, 56, 56, 3)
    # sample 0: 16 slots reserved then text
    assert feed["image_slot_mask"][0, :16].sum() == 16
    assert feed["image_slot_mask"][1].sum() == 0
    assert feed["attention_mask"][0].sum() > 16
    # sample 1 pixels all zero (no image)
    assert np.abs(feed["pixel_values"][1]).sum() == 0


def test_vlm_backbone_forward(tokenizer, images, key):
    cfg = VLMConfig.tiny()
    model = VLMBackbone(cfg, dtype=jnp.float32)
    proc = MultimodalProcessorAdapter(tokenizer, image_size=cfg.vision.image_size,
                                      num_image_tokens=cfg.num_image_tokens,
                                      max_length=48, max_images=1)
    feed = proc([
        {"text": "a red photo", "images": [images[0]], "videos": [], "pages": []},
        {"text": "a blue photo", "images": [images[1]], "videos": [], "pages": []},
    ])
    variables = model.init(key, input_ids=jnp.asarray(feed["input_ids"]),
                           attention_mask=jnp.asarray(feed["attention_mask"]),
                           pixel_values=jnp.asarray(feed["pixel_values"]),
                           image_slot_mask=jnp.asarray(feed["image_slot_mask"]))
    out = model.apply(variables, input_ids=jnp.asarray(feed["input_ids"]),
                      attention_mask=jnp.asarray(feed["attention_mask"]),
                      pixel_values=jnp.asarray(feed["pixel_values"]),
                      image_slot_mask=jnp.asarray(feed["image_slot_mask"]))
    h = out["last_hidden_state"]
    assert h.shape == (2, 48, cfg.text.hidden_size)
    # different images -> different representations at image positions
    assert not np.allclose(np.asarray(h[0, 0]), np.asarray(h[1, 0]), atol=1e-4)


def test_multimodal_normal_vs_aot_engine_parity(tokenizer, images, tmp_path):
    """Normal-jit vs AOT multimodal engines agree bit-for-bit on embeddings,
    and an MMEB smoke run through both produces identical metrics (the
    eval-as-engine-parity-test pattern, VERDICT r2 item 9)."""
    import jax

    from nexus_tpu.evaluation.mmeb_v2 import MMEBEvaluator
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder
    from nexus_tpu.training.embedder.multimodal_retrieval import BiMultimodalEmbedderModel
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )

    cfg = VLMConfig.tiny()
    model = BiMultimodalEmbedderModel(
        cfg, TextEmbedderModelArguments(dtype="float32", temperature=0.1)
    )
    model.variables = model.init_variables(jax.random.PRNGKey(0))

    embs = {}
    for mode in ("normal", "aot"):
        e = MultimodalEmbedder(
            model=model, tokenizer=tokenizer, batch_size=2, max_length=32, infer_mode=mode,
        )
        embs[mode] = e.encode_queries(
            [{"text": "cat", "images": [images[0]]}, "just text", "a red photo"]
        )
    np.testing.assert_array_equal(embs["normal"], embs["aot"])

    # MMEB smoke through both engine modes: identical metric tables
    ds = tmp_path / "mmeb"
    ds.mkdir()
    with open(ds / "ImageNet-1K.jsonl", "w") as f:
        for i, w in enumerate(["cat", "dog", "red"]):
            f.write(json.dumps({
                "query": {"text": f"a photo of {w}", "images": [images[i % 3]]},
                "candidates": [{"text": c} for c in ["cat", "dog", "red"]],
                "label": i,
            }) + "\n")
    results = {}
    for mode in ("normal", "aot"):
        e = MultimodalEmbedder(
            model=model, tokenizer=tokenizer, batch_size=2, max_length=32, infer_mode=mode,
        )
        ev = MMEBEvaluator(
            e, str(ds), output_dir=str(tmp_path / f"out_{mode}"), reuse_embeddings=False
        )
        results[mode] = ev.run(["ImageNet-1K"])
    assert results["normal"] == results["aot"], results


def test_multimodal_embedder_train_and_infer(tokenizer, images, tmp_path):
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.multimodal_retrieval import (
        BiMultimodalEmbedderModel,
        MultimodalEmbedderRunner,
    )
    from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderModelArguments

    # tiny jsonl dataset: text+image queries, text passages
    data = tmp_path / "mm.jsonl"
    with open(data, "w") as f:
        for i in range(16):
            rec = {
                "query": {"text": "a photo of the cat", "images": [images[i % 3]]},
                "pos": [{"text": "cat photo"}],
                "neg": [{"text": "blue dog"}],
            }
            f.write(json.dumps(rec) + "\n")

    cfg = VLMConfig.tiny()
    model = BiMultimodalEmbedderModel(
        cfg, TextEmbedderModelArguments(dtype="float32", temperature=0.1)
    )
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "out"), num_train_epochs=1, max_steps=2,
        per_device_train_batch_size=1, learning_rate=1e-3, logging_steps=10,
        evaluation_strategy="no",
    ))
    runner = MultimodalEmbedderRunner(
        model, tokenizer, [str(data)], targs, train_group_size=2, max_length=48,
    )
    state = runner.run()
    assert int(state.step) > 0

    # reload + inference engine
    emb = MultimodalEmbedder(
        model_name_or_path=str(tmp_path / "out"), tokenizer=tokenizer,
        batch_size=2, max_length=48,
    )
    q = emb.encode_queries([{"text": "cat", "images": [images[0]]}, "just text"])
    assert q.shape == (2, cfg.text.hidden_size)
    assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-3)


def test_qwen_adapter_buckets_vision_rows(tmp_path):
    """Mixed image-count batches pad pixel_patches to a bounded bucket set
    (pow-2 to 4, then multiples of 4) so serving compiles O(log) programs,
    and padded rows leave the embeddings bit-identical (no image tokens
    reference them)."""
    import jax
    import jax.numpy as jnp

    from nexus_tpu.models.llama import LlamaConfig
    from nexus_tpu.models.qwen2_vl import (
        Qwen2VLBackbone, Qwen2VLConfig, Qwen2VLVisionConfig)
    from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter
    from transformers import BertTokenizerFast

    words = ["a", "cat", "dog", "red"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))
    vcfg = Qwen2VLVisionConfig(depth=1, embed_dim=16, num_heads=2, patch_size=4,
                               temporal_patch_size=2, spatial_merge_size=2,
                               mlp_ratio=2.0, hidden_size=24)
    tc = LlamaConfig(vocab_size=64, hidden_size=24, intermediate_size=48,
                     num_hidden_layers=1, num_attention_heads=2,
                     num_key_value_heads=1, max_position_embeddings=128,
                     attention_bias=True)
    cfg = Qwen2VLConfig(vision=vcfg, text=tc, mrope_section=[2, 2, 2],
                        image_token_id=60, video_token_id=61,
                        vision_start_token_id=62, vision_end_token_id=63)
    grid = (1, 8, 8)
    adapter = Qwen2VLProcessorAdapter(
        tok, image_size=8 * 4, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, max_length=64, image_token_id=60,
        video_token_id=61, vision_start_token_id=62, vision_end_token_id=63)

    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    mk = lambda n_img: {"text": "a cat", "images": [img] * n_img,  # noqa: E731
                        "videos": [], "pages": []}
    # 3 images across the batch -> bucket 4 (one zero pad row)
    feed = adapter([mk(2), mk(1), mk(0), mk(0)])
    assert feed["pixel_patches"].shape[0] == 4
    # 5 -> 8
    assert adapter([mk(2), mk(3)])["pixel_patches"].shape[0] == 8
    # 1 -> 1, 2 -> 2 (no waste for the common single-image request)
    assert adapter([mk(1)])["pixel_patches"].shape[0] == 1
    assert adapter([mk(1), mk(1)])["pixel_patches"].shape[0] == 2

    # padded rows must not change the hidden states: compare bucket-4 feed
    # against the same feed with the pad rows stripped
    net = Qwen2VLBackbone(cfg, grid_thw=grid)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.asarray(feed["input_ids"]),
                      jnp.asarray(feed["attention_mask"]),
                      jnp.asarray(feed["pixel_patches"]),
                      jnp.asarray(feed["positions3"]))
    out_pad = net.apply(params, jnp.asarray(feed["input_ids"]),
                        jnp.asarray(feed["attention_mask"]),
                        jnp.asarray(feed["pixel_patches"]),
                        jnp.asarray(feed["positions3"]))
    out_exact = net.apply(params, jnp.asarray(feed["input_ids"]),
                          jnp.asarray(feed["attention_mask"]),
                          jnp.asarray(feed["pixel_patches"][:3]),
                          jnp.asarray(feed["positions3"]))
    np.testing.assert_allclose(
        np.asarray(out_pad["last_hidden_state"]),
        np.asarray(out_exact["last_hidden_state"]), atol=1e-6)
