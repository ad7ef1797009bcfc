"""Qwen3-VL backbone parity vs the HF torch implementation (deepstack vision
features, interleaved M-RoPE, q/k-norm text trunk). Reference role:
Nexus/evaluation/mmeb_v2/qwen3_vl_embedding.py / qwen3_vl_reranker.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _tiny_hf_config():
    from transformers import Qwen3VLConfig as HFQwen3VLConfig

    return HFQwen3VLConfig(
        vision_config=dict(
            depth=4, hidden_size=32, intermediate_size=64, num_heads=2,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=48,
            num_position_embeddings=64, deepstack_visual_indexes=[1, 2],
        ),
        text_config=dict(
            vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=512, rope_theta=10000.0,
            rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
        ),
        image_token_id=7, video_token_id=8, vision_start_token_id=9,
    )


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import Qwen3VLForConditionalGeneration

    from nexus_tpu.models.hf_convert import torch_qwen3vl_to_flax
    from nexus_tpu.models.qwen3_vl import Qwen3VLConfig

    torch.manual_seed(0)
    hf = Qwen3VLForConditionalGeneration(_tiny_hf_config()).eval()
    config = Qwen3VLConfig.from_hf(hf.config)
    variables = torch_qwen3vl_to_flax(hf.state_dict(), config)
    return hf, config, variables


GRID = (1, 8, 8)  # 64 patches -> 16 merged tokens per image


def _rand_patches(rng, n_img, config):
    return rng.standard_normal(
        (n_img, GRID[0] * GRID[1] * GRID[2], config.vision.patch_dim)
    ).astype(np.float32)


def test_vision_tower_parity(tiny_pair):
    """Merged tokens AND both deepstack feature taps match HF."""
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(0)
    patches = _rand_patches(rng, 2, config)

    from nexus_tpu.models.qwen3_vl import Qwen3VLVisionTower

    tower = Qwen3VLVisionTower(config.vision, grid_thw=GRID)
    ours, ours_deep = tower.apply(
        {"params": variables["params"]["visual"]}, jnp.asarray(patches)
    )

    with torch.no_grad():
        flat = torch.from_numpy(patches.reshape(-1, patches.shape[-1]))
        grid = torch.tensor([list(GRID)] * 2)
        theirs, theirs_deep = hf.model.visual(flat, grid_thw=grid)
    theirs = theirs.numpy().reshape(2, -1, theirs.shape[-1])
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)
    assert len(ours_deep) == len(theirs_deep) == 2
    for a, b in zip(ours_deep, theirs_deep):
        b = b.numpy().reshape(2, -1, b.shape[-1])
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4)


def test_full_backbone_parity(tiny_pair):
    """Text + scattered image tokens + deepstack injection + interleaved
    M-RoPE, vs HF Qwen3VLModel."""
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(1)
    n_tok = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)  # merged tokens per image
    seq = 2 + n_tok + 3
    ids = np.zeros((2, seq), np.int64)
    for b in range(2):
        ids[b, :1] = rng.integers(10, 250)
        ids[b, 1] = 9  # vision_start
        ids[b, 2 : 2 + n_tok] = 7  # image tokens
        ids[b, 2 + n_tok :] = rng.integers(10, 250, 3)
    patches = _rand_patches(rng, 2, config)

    from nexus_tpu.models.qwen2_vl import get_mrope_positions
    from nexus_tpu.models.qwen3_vl import Qwen3VLBackbone

    positions3 = get_mrope_positions(
        ids, None, [GRID, GRID], image_token_id=7, video_token_id=8, merge=2,
    )
    net = Qwen3VLBackbone(config, grid_thw=GRID)
    ours = net.apply(
        variables, jnp.asarray(ids, jnp.int32),
        pixel_patches=jnp.asarray(patches),
        positions3=jnp.asarray(positions3),
    )["last_hidden_state"]

    with torch.no_grad():
        flat = torch.from_numpy(patches.reshape(-1, patches.shape[-1]))
        grid = torch.tensor([list(GRID)] * 2)
        out = hf.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
            pixel_values=flat, image_grid_thw=grid,
        )
    theirs = out.last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4)


def test_backbone_text_only(tiny_pair):
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(10, 250, (2, 6))

    from nexus_tpu.models.qwen3_vl import Qwen3VLBackbone

    net = Qwen3VLBackbone(config, grid_thw=GRID)
    ours = net.apply(variables, jnp.asarray(ids, jnp.int32))["last_hidden_state"]
    with torch.no_grad():
        out = hf.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones((2, 6), dtype=torch.long),
        )
    np.testing.assert_allclose(np.asarray(ours), out.last_hidden_state.numpy(), atol=2e-4)


def test_rope_index_parity_vs_hf(tiny_pair):
    """get_mrope_positions matches HF Qwen3VLModel.get_rope_index."""
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(3)
    n_tok = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)
    seq = 3 + n_tok + 2
    ids = np.zeros((1, seq), np.int64)
    ids[0, :2] = rng.integers(10, 250, 2)
    ids[0, 2] = 9
    ids[0, 3 : 3 + n_tok] = 7
    ids[0, 3 + n_tok :] = rng.integers(10, 250, 2)

    from nexus_tpu.models.qwen2_vl import get_mrope_positions

    ours = get_mrope_positions(ids, None, [GRID], image_token_id=7,
                               video_token_id=8, merge=2)
    theirs, _ = hf.model.get_rope_index(
        torch.from_numpy(ids), image_grid_thw=torch.tensor([list(GRID)])
    )
    np.testing.assert_array_equal(ours, theirs.numpy())


def test_binary_score_vector(tiny_pair):
    """Yes/no scoring vector equals HF's lm_head row difference."""
    hf, config, variables = tiny_pair

    from nexus_tpu.models.hf_convert import qwen3vl_binary_score_vector

    vec = qwen3vl_binary_score_vector(hf.state_dict(), yes_token_id=11, no_token_id=12)
    w = hf.lm_head.weight.detach().numpy()
    np.testing.assert_allclose(vec, w[11] - w[12], atol=1e-6)


class _StubTok:
    """Adapter only needs __call__/pad_token_id/convert_tokens_to_ids."""

    pad_token_id = 0

    def __call__(self, text, truncation=True, max_length=64, add_special_tokens=True):
        return {"input_ids": [10 + (ord(ch) % 64) for ch in text][:max_length]}

    def convert_tokens_to_ids(self, tok):
        return {"yes": 11, "no": 12}[tok]


def test_embedder_end_to_end_qwen3(tiny_pair, tmp_path):
    """A real (tiny) HF Qwen3-VL checkpoint flows through from_hf_pretrained
    -> processor adapter -> encode, matching the torch model (deepstack
    injection included)."""
    from PIL import Image

    hf, config, _ = tiny_pair
    ckpt = tmp_path / "hfckpt"
    hf.save_pretrained(str(ckpt))

    from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )

    margs = TextEmbedderModelArguments(temperature=0.05, dtype="float32")
    model = BiMultimodalEmbedderModel.from_hf_pretrained(
        str(ckpt), margs, image_size=32  # 8x8 patches at patch_size 4
    )
    assert model.backbone_type == "qwen3-vl"
    assert model.grid_thw == (1, 8, 8)

    adapter = Qwen2VLProcessorAdapter(
        _StubTok(), image_size=32, patch_size=4, spatial_merge_size=2,
        max_length=48, image_token_id=7, video_token_id=8, vision_start_token_id=9,
    )
    rng = np.random.default_rng(4)
    items = [
        {"text": "a red square",
         "images": [Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8))]},
        {"text": "pure text passage", "images": []},
    ]
    feed = adapter(items)
    variables = model.variables
    reps = model.encode_feed(variables, {k: jnp.asarray(v) for k, v in feed.items()})
    assert reps.shape == (2, config.text.hidden_size)
    assert np.isfinite(np.asarray(reps)).all()

    with torch.no_grad():
        theirs = hf.model(
            input_ids=torch.from_numpy(feed["input_ids"].astype(np.int64)),
            attention_mask=torch.from_numpy(feed["attention_mask"].astype(np.int64)),
            pixel_values=torch.from_numpy(
                feed["pixel_patches"].reshape(-1, feed["pixel_patches"].shape[-1])
            ),
            image_grid_thw=torch.tensor([[1, 8, 8]]),
        ).last_hidden_state.numpy()
    ours = model.net.apply(
        variables, jnp.asarray(feed["input_ids"]),
        attention_mask=jnp.asarray(feed["attention_mask"]),
        pixel_patches=jnp.asarray(feed["pixel_patches"]),
        positions3=jnp.asarray(feed["positions3"]),
    )["last_hidden_state"]
    diff = np.abs(np.asarray(ours) - theirs)[feed["attention_mask"].astype(bool)]
    assert diff.max() < 5e-4, diff.max()


def test_multimodal_reranker_yes_logit_parity(tiny_pair, tmp_path):
    """MultimodalReranker scores == torch last-hidden @ (w_yes - w_no) on the
    same feed, and from_hf_pretrained builds the whole stack from a raw HF
    checkpoint dir (parity: qwen3_vl_reranker.py compute_scores)."""
    from PIL import Image

    hf, config, _ = tiny_pair
    ckpt = tmp_path / "hfckpt"
    hf.save_pretrained(str(ckpt))

    from nexus_tpu.inference.reranker.multimodal import MultimodalReranker

    rr = MultimodalReranker.from_hf_pretrained(
        str(ckpt), tokenizer=_StubTok(), batch_size=2, max_length=48, image_size=32,
    )
    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8))
    pairs = [
        ({"text": "what color"}, {"text": "red", "images": [img]}),
        ("plain query", "plain candidate"),
    ]
    scores = rr.compute_score(pairs, normalize=True)
    assert len(scores) == 2 and all(0.0 <= s <= 1.0 for s in scores)

    # raw-logit parity against torch on the identical processed feed
    items = [rr._pair_item(q, c) for q, c in pairs]
    feed = rr.processor(items)
    raw = rr.compute_score(pairs, normalize=False)
    with torch.no_grad():
        hidden = hf.model(
            input_ids=torch.from_numpy(feed["input_ids"].astype(np.int64)),
            attention_mask=torch.from_numpy(feed["attention_mask"].astype(np.int64)),
            pixel_values=torch.from_numpy(
                feed["pixel_patches"].reshape(-1, feed["pixel_patches"].shape[-1])
            ),
            image_grid_thw=torch.tensor([[1, 8, 8]]),
        ).last_hidden_state
        w = hf.lm_head.weight
        last = torch.from_numpy(
            feed["attention_mask"].sum(1).astype(np.int64) - 1
        )
        pooled = hidden[torch.arange(2), last]
        theirs = (pooled @ (w[11] - w[12])).numpy()
    np.testing.assert_allclose(np.asarray(raw), theirs, atol=5e-3)


def test_mmeb_rerank_with_multimodal_reranker(tiny_pair, tmp_path):
    """The MMEB harness passes FULL multimodal items (not text projections)
    to a reranker flagged multimodal=True, and rescoring reorders top-k."""
    import json

    hf, config, _ = tiny_pair
    ckpt = tmp_path / "hfckpt"
    hf.save_pretrained(str(ckpt))

    from nexus_tpu.inference.reranker.multimodal import MultimodalReranker

    rr = MultimodalReranker.from_hf_pretrained(
        str(ckpt), tokenizer=_StubTok(), batch_size=2, max_length=48, image_size=32,
    )
    seen_pairs = []
    orig = rr.compute_score

    def spy(pairs, normalize=True):
        seen_pairs.extend(pairs)
        return orig(pairs, normalize=normalize)

    rr.compute_score = spy

    ds = tmp_path / "data"
    ds.mkdir()
    recs = [
        {"query": {"text": "find the red square"},
         "candidates": [{"text": "blue circle"}, {"text": "red square"}], "label": 1},
    ]
    with open(ds / "toy.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )

    model = BiMultimodalEmbedderModel.from_hf_pretrained(str(ckpt), image_size=32)
    emb = MultimodalEmbedder(model=model, tokenizer=_StubTok(), batch_size=2, max_length=48)
    ev = MMEBEvaluator(
        embedder=emb, dataset_dir=str(ds), output_dir=str(tmp_path / "out"),
        reranker=rr, rerank_top_k=2,
    )
    metrics = ev.evaluate_task_jsonl("toy")
    assert metrics and all(np.isfinite(v) for v in metrics.values())
    # the harness handed over FULL items (dicts), not text strings
    assert seen_pairs and isinstance(seen_pairs[0][0], dict)


def test_timestamp_video_layout_and_forward(tiny_pair):
    """Qwen3-VL video layout: '<t.t seconds>' text precedes each
    (1, g, g) temporal-pair block with video placeholders + vision_end
    (HF Qwen3VLProcessor video_placeholder parity), and the feed runs
    through the backbone."""
    _, config, variables = tiny_pair
    from nexus_tpu.models.qwen3_vl import Qwen3VLBackbone
    from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter

    class Tok:
        pad_token_id = 0

        def __call__(self, t, **kw):
            return {"input_ids": [10 + ord(c) % 100 for c in t][: kw.get("max_length", 64)]}

    tok = Tok()
    ad = Qwen2VLProcessorAdapter(
        tok, image_size=16, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, max_length=128, image_token_id=7,
        video_token_id=8, vision_start_token_id=9, vision_end_token_id=6,
        num_video_frames=4, video_timestamps=True,
    )
    rng = np.random.default_rng(0)
    frames = [(rng.random((16, 16, 3)) * 255).astype(np.uint8) for _ in range(4)]
    feed = ad([{"text": "clip", "videos": [frames], "images": [], "pages": []}])

    ids = feed["input_ids"][0]
    # 4 frames / tps 2 -> 2 blocks of (1, 4, 4) grids, 4 merged tokens each
    assert feed["pixel_patches"].shape == (2, 16, 96)
    assert int((ids == 8).sum()) == 8
    # layout per block: [timestamp text]+[vs]+[video]*4+[ve]
    vs_pos = np.where(ids == 9)[0]
    assert len(vs_pos) == 2
    for p in vs_pos:
        assert (ids[p + 1 : p + 5] == 8).all() and ids[p + 5] == 6
    # timestamp text before the first block: frame-dir fps fallback 24 ->
    # mean(0/24, 1/24) ~ 0.0 -> "<0.0 seconds>"
    expected_prefix = tok("<0.0 seconds>")["input_ids"]
    assert list(ids[: len(expected_prefix)]) == expected_prefix

    net = Qwen3VLBackbone(config, grid_thw=(1, 4, 4))
    out = net.apply(
        variables, jnp.asarray(feed["input_ids"]),
        attention_mask=jnp.asarray(feed["attention_mask"]),
        pixel_patches=jnp.asarray(feed["pixel_patches"]),
        positions3=jnp.asarray(feed["positions3"]),
    )["last_hidden_state"]
    assert np.isfinite(np.asarray(out)).all()


def test_qwen3_5_registry_and_parity(tiny_pair, tmp_path):
    """A checkpoint declaring model_type 'qwen3_5' (Qwen3.5) loads through
    the registry as the qwen3-vl-family backbone — variant 'qwen3.5', chat
    template/timestamp behavior included — and its forward matches the torch
    reference (ref Nexus/modules/multimodal.py:16,32 lists qwen3_5 beside
    qwen3_vl in every family set)."""
    import json
    import os

    from nexus_tpu.modules.multimodal import (
        QWEN3_TIMESTAMP_VARIANTS,
        QWEN_VL_FAMILY,
        load_multimodal_backbone,
    )
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )

    assert "qwen3.5" in QWEN_VL_FAMILY and "qwen3.5" in QWEN3_TIMESTAMP_VARIANTS

    hf, config, _ = tiny_pair
    ckpt = tmp_path / "hfckpt35"
    hf.save_pretrained(str(ckpt))
    # declare the Qwen3.5 model type (transformers 4.57 has no Qwen3_5
    # classes yet — the reference gates on a main build; this repo's
    # converter reads the safetensors directly, so only the declared
    # model_type changes the dispatch)
    cfg_path = os.path.join(str(ckpt), "config.json")
    with open(cfg_path) as f:
        d = json.load(f)
    d["model_type"] = "qwen3_5"
    with open(cfg_path, "w") as f:
        json.dump(d, f)

    margs = TextEmbedderModelArguments(temperature=0.05, dtype="float32")
    model = BiMultimodalEmbedderModel.from_hf_pretrained(str(ckpt), margs, image_size=32)
    assert model.backbone_type == "qwen3.5"
    assert model.vlm_config.variant == "qwen3.5"

    # registry factory resolves the alias
    net = load_multimodal_backbone("qwen3.5", config=model.vlm_config, grid_thw=(1, 8, 8))
    assert type(net).__name__ == "Qwen3VLBackbone"

    # torch parity on the text path (same converted weights)
    rng = np.random.default_rng(7)
    ids = rng.integers(10, 200, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    ids = ids * mask
    with torch.no_grad():
        theirs = hf.model.language_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    positions3 = np.stack([pos] * 3, axis=0)
    ours = np.asarray(
        model.net.apply(
            model.variables, jnp.asarray(ids),
            attention_mask=jnp.asarray(mask), positions3=jnp.asarray(positions3),
        )["last_hidden_state"]
    )
    diff = np.abs(ours - theirs)[mask.astype(bool)]
    assert diff.max() < 5e-4, diff.max()
