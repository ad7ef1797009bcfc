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
