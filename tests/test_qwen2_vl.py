"""Qwen2-VL backbone parity vs the HF torch implementation (VERDICT round-1
item #4: load a real (tiny) Qwen2-VL checkpoint and match its torch hidden
states within tolerance). Reference role: Nexus/modules/multimodal.py
backbone loading."""

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
def tiny_pair(tmp_path_factory):
    """(hf_model, nx_config, nx_variables) with converted weights."""
    from transformers import Qwen2VLForConditionalGeneration

    from nexus_tpu.models.hf_convert import torch_qwen2vl_to_flax
    from nexus_tpu.models.qwen2_vl import Qwen2VLConfig

    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(_tiny_hf_config()).eval()
    config = Qwen2VLConfig.from_hf(hf.config)
    variables = torch_qwen2vl_to_flax(hf.state_dict(), config)
    return hf, config, variables


GRID = (1, 8, 8)  # t, h, w patches -> 64 patches -> 16 merged tokens


def _rand_patches(rng, n_img, config):
    return rng.standard_normal(
        (n_img, GRID[0] * GRID[1] * GRID[2], config.vision.patch_dim)
    ).astype(np.float32)


def test_vision_tower_parity(tiny_pair):
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(0)
    patches = _rand_patches(rng, 2, config)

    from nexus_tpu.models.qwen2_vl import Qwen2VLVisionTower

    tower = Qwen2VLVisionTower(config.vision, grid_thw=GRID)
    ours = tower.apply({"params": variables["params"]["visual"]}, jnp.asarray(patches))

    with torch.no_grad():
        flat = torch.from_numpy(patches.reshape(-1, patches.shape[-1]))
        grid = torch.tensor([list(GRID)] * 2)
        theirs = hf.model.visual(flat, grid_thw=grid).numpy()
    theirs = theirs.reshape(2, -1, theirs.shape[-1])
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_full_backbone_parity(tiny_pair):
    """Text + scattered image tokens + M-RoPE, vs HF Qwen2VLModel."""
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(1)
    n_tok = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)  # merged tokens per image
    b, l = 2, 40
    ids = rng.integers(10, 250, (b, l)).astype(np.int64)
    # sample 0: one image; sample 1: pure text
    ids[0, 3] = 9  # vision_start
    ids[0, 4 : 4 + n_tok] = 7  # image tokens
    mask = np.ones((b, l), np.int64)
    mask[1, 35:] = 0  # ragged padding
    ids[1, 35:] = 0
    patches = _rand_patches(rng, 1, config)

    with torch.no_grad():
        theirs = hf.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(patches.reshape(-1, patches.shape[-1])),
            image_grid_thw=torch.tensor([list(GRID)]),
        ).last_hidden_state.numpy()

    from nexus_tpu.models.qwen2_vl import Qwen2VLBackbone, get_mrope_positions

    pos3 = get_mrope_positions(
        ids, mask, [GRID], image_token_id=7, video_token_id=8, merge=2
    )
    # oracle-check the host position computation against HF's
    hf_pos, _ = hf.model.get_rope_index(
        torch.from_numpy(ids), torch.tensor([list(GRID)]), None, torch.from_numpy(mask)
    )
    valid = np.broadcast_to(mask[None].astype(bool), (3, b, l))
    np.testing.assert_array_equal(pos3[valid], hf_pos.numpy()[valid])

    net = Qwen2VLBackbone(config, grid_thw=GRID)
    ours = net.apply(
        variables, jnp.asarray(ids.astype(np.int32)),
        attention_mask=jnp.asarray(mask.astype(np.int32)),
        pixel_patches=jnp.asarray(patches),
        positions3=jnp.asarray(pos3),
    )["last_hidden_state"]

    diff = np.abs(np.asarray(ours) - theirs)[mask.astype(bool)]
    assert diff.max() < 5e-4, diff.max()


def test_backbone_text_only(tiny_pair):
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(10, 250, (2, 12)).astype(np.int64)
    with torch.no_grad():
        theirs = hf.model(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    from nexus_tpu.models.qwen2_vl import Qwen2VLBackbone

    net = Qwen2VLBackbone(config, grid_thw=GRID)
    ours = net.apply(variables, jnp.asarray(ids.astype(np.int32)))["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4)


def test_adapter_patches_match_hf_image_processor():
    """Our pinned-resolution patch extraction produces byte-identical
    flattened patches to the HF Qwen2VLImageProcessor on the same image."""
    from PIL import Image
    from transformers import Qwen2VLImageProcessor

    from nexus_tpu.modules.multimodal import load_image, qwen2vl_image_to_patches

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 255, (112, 112, 3), np.uint8))
    ours = qwen2vl_image_to_patches(load_image(img, 112)[None], patch_size=14)

    proc = Qwen2VLImageProcessor(min_pixels=56 * 56, max_pixels=112 * 112)
    out = proc(images=[img], return_tensors="np")
    assert tuple(out["image_grid_thw"][0]) == (1, 8, 8)
    np.testing.assert_allclose(ours, out["pixel_values"], atol=2e-3)


def test_embedder_end_to_end_with_real_checkpoint(tiny_pair, tmp_path):
    """VERDICT item #4 'done' bar: a real (tiny) HF Qwen2-VL checkpoint flows
    through from_hf_pretrained -> processor adapter -> encode -> one training
    step, and the encoded hidden states match the torch model."""
    from PIL import Image
    from transformers import Qwen2TokenizerFast

    hf, config, _ = tiny_pair
    ckpt = tmp_path / "hfckpt"
    hf.save_pretrained(str(ckpt))

    from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )
    from nexus_tpu.training.trainer import RecTrainer

    margs = TextEmbedderModelArguments(temperature=0.05, dtype="float32")
    model = BiMultimodalEmbedderModel.from_hf_pretrained(
        str(ckpt), margs, image_size=32  # 8x8 patches at patch_size 4
    )
    assert model.backbone_type == "qwen2-vl"
    assert model.grid_thw == (1, 8, 8)

    # hand-rolled vocab-free tokenizer stub: adapter only needs __call__/pad id
    class StubTok:
        pad_token_id = 0

        def __call__(self, text, truncation=True, max_length=64, add_special_tokens=True):
            return {"input_ids": [10 + (ord(ch) % 64) for ch in text][:max_length]}

    adapter = Qwen2VLProcessorAdapter(
        StubTok(), image_size=32, patch_size=4, spatial_merge_size=2,
        max_length=48, image_token_id=7, video_token_id=8, vision_start_token_id=9,
    )
    rng = np.random.default_rng(4)
    items = [
        {"text": "a red square", "images": [Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8))]},
        {"text": "pure text passage", "images": []},
    ]
    feed = adapter(items)
    assert feed["pixel_patches"].shape == (1, 64, config.vision.patch_dim)
    variables = model.init_variables(jax.random.PRNGKey(0))
    reps = model.encode_feed(variables, {k: jnp.asarray(v) for k, v in feed.items()})
    assert reps.shape == (2, config.text.hidden_size)
    assert np.isfinite(np.asarray(reps)).all()

    # cross-check the adapter-fed backbone against torch on the same feed
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

    # one contrastive training step through RecTrainer
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "out"), num_train_epochs=1,
        per_device_train_batch_size=1, learning_rate=1e-4, logging_steps=1,
        evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    batch = {}
    for k, v in feed.items():
        batch[f"query_{k}"] = v
        batch[f"passage_{k}"] = v
    trainer.init_state()
    step = trainer._build_train_step()
    state, metrics = step(trainer._state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def _tiny_hf_25_config():
    from transformers.models.qwen2_5_vl import Qwen2_5_VLConfig

    return Qwen2_5_VLConfig(
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=48, num_heads=2,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, window_size=16,  # 2x2 merged units/window
            fullatt_block_indexes=[1], out_hidden_size=48, hidden_act="silu",
        ),
        text_config=dict(
            vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        ),
        image_token_id=7, video_token_id=8, vision_start_token_id=9,
    )


def test_qwen2_5_vl_parity(tmp_path):
    """Qwen2.5-VL: windowed-attention vision tower (RMSNorm, gated MLP) and
    the full backbone match HF torch hidden states."""
    from transformers.models.qwen2_5_vl import Qwen2_5_VLForConditionalGeneration

    from nexus_tpu.models.hf_convert import torch_qwen2vl_to_flax
    from nexus_tpu.models.qwen2_vl import (
        Qwen2VLBackbone,
        Qwen2VLConfig,
        Qwen25VLVisionTower,
        get_mrope_positions,
    )

    torch.manual_seed(1)
    hf = Qwen2_5_VLForConditionalGeneration(_tiny_hf_25_config()).eval()
    config = Qwen2VLConfig.from_hf(hf.config)
    assert config.variant == "qwen2.5-vl"
    variables = torch_qwen2vl_to_flax(hf.state_dict(), config)

    rng = np.random.default_rng(5)
    patches = rng.standard_normal((2, 64, config.vision.patch_dim)).astype(np.float32)
    tower = Qwen25VLVisionTower(config.vision, grid_thw=GRID)
    ours = tower.apply({"params": variables["params"]["visual"]}, jnp.asarray(patches))
    with torch.no_grad():
        theirs = hf.model.visual(
            torch.from_numpy(patches.reshape(-1, patches.shape[-1])),
            grid_thw=torch.tensor([list(GRID)] * 2),
        ).numpy().reshape(2, -1, 48)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4)

    # full backbone with one image + ragged text
    n_tok = 16
    ids = rng.integers(10, 250, (2, 30)).astype(np.int64)
    ids[0, 2] = 9
    ids[0, 3 : 3 + n_tok] = 7
    mask = np.ones((2, 30), np.int64)
    mask[1, 20:] = 0
    ids[1, 20:] = 0
    with torch.no_grad():
        theirs = hf.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(patches[:1].reshape(-1, patches.shape[-1])),
            image_grid_thw=torch.tensor([list(GRID)]),
        ).last_hidden_state.numpy()
    pos3 = get_mrope_positions(ids, mask, [GRID], image_token_id=7, video_token_id=8, merge=2)
    net = Qwen2VLBackbone(config, grid_thw=GRID)
    out = net.apply(
        variables, jnp.asarray(ids.astype(np.int32)),
        attention_mask=jnp.asarray(mask.astype(np.int32)),
        pixel_patches=jnp.asarray(patches[:1]),
        positions3=jnp.asarray(pos3),
    )["last_hidden_state"]
    diff = np.abs(np.asarray(out) - theirs)[mask.astype(bool)]
    assert diff.max() < 8e-4, diff.max()


def test_load_hf_qwen2vl_roundtrip(tiny_pair, tmp_path):
    """save_pretrained dir -> load_hf_qwen2vl -> same params as direct map."""
    hf, config, variables = tiny_pair
    hf.save_pretrained(str(tmp_path / "ckpt"))
    from nexus_tpu.models.hf_convert import load_hf_qwen2vl

    config2, variables2 = load_hf_qwen2vl(str(tmp_path / "ckpt"))
    assert config2.mrope_section == config.mrope_section
    assert config2.vision.depth == config.vision.depth
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(variables2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_video_temporal_block_parity(tiny_pair):
    """A (2, 8, 8) temporal video block (4 frames, tps 2) through the tower +
    trunk matches HF's pixel_values_videos / video_grid_thw path — true
    temporal patching + temporal M-RoPE, not frames-as-images."""
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(5)
    vgrid = (2, 8, 8)
    n_tok = vgrid[0] * (vgrid[1] // 2) * (vgrid[2] // 2)  # 32 merged tokens
    b, l = 1, 48
    ids = rng.integers(10, 250, (b, l)).astype(np.int64)
    ids[0, 2] = 9  # vision_start
    ids[0, 3 : 3 + n_tok] = 8  # video tokens
    mask = np.ones((b, l), np.int64)
    patches = rng.standard_normal(
        (1, vgrid[0] * vgrid[1] * vgrid[2], config.vision.patch_dim)
    ).astype(np.float32)

    with torch.no_grad():
        theirs = hf.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values_videos=torch.from_numpy(patches.reshape(-1, patches.shape[-1])),
            video_grid_thw=torch.tensor([list(vgrid)]),
        ).last_hidden_state.numpy()

    from nexus_tpu.models.qwen2_vl import Qwen2VLBackbone, get_mrope_positions

    pos3 = get_mrope_positions(
        ids, mask, [vgrid], image_token_id=7, video_token_id=8, merge=2
    )
    hf_pos, _ = hf.model.get_rope_index(
        torch.from_numpy(ids), None, torch.tensor([list(vgrid)]), torch.from_numpy(mask)
    )
    np.testing.assert_array_equal(pos3, hf_pos.numpy())

    net = Qwen2VLBackbone(config, grid_thw=vgrid)
    ours = net.apply(
        variables, jnp.asarray(ids.astype(np.int32)),
        attention_mask=jnp.asarray(mask.astype(np.int32)),
        pixel_patches=jnp.asarray(patches),
        positions3=jnp.asarray(pos3),
    )["last_hidden_state"]
    diff = np.abs(np.asarray(ours) - theirs)
    assert diff.max() < 5e-4, diff.max()


def test_video_mode_adapter_layout():
    """Video-mode adapter (grid_t=2): one temporal block per video with
    video_token_id placeholders; images replicate frames into a block."""
    from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter

    class Tok:
        pad_token_id = 0

        def __call__(self, t, **kw):
            return {"input_ids": [10 + ord(c) % 100 for c in t][: kw.get("max_length", 64)]}

    rng = np.random.default_rng(0)
    frames = [(rng.random((16, 16, 3)) * 255).astype(np.uint8) for _ in range(4)]
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    ad = Qwen2VLProcessorAdapter(
        Tok(), image_size=16, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, max_length=96, image_token_id=7,
        video_token_id=8, vision_start_token_id=9, grid_t=2,
    )
    assert ad.tokens_per_image == 2 * 4  # t * (g/merge)^2
    feed = ad([
        {"text": "clip", "videos": [frames], "images": [], "pages": []},
        {"text": "img", "images": [img], "videos": [], "pages": []},
    ])
    # one block each, P = t*h*w patches
    assert feed["pixel_patches"].shape == (2, 2 * 4 * 4, 4 * 4 * 2 * 3)
    assert int((feed["input_ids"][0] == 8).sum()) == 8  # video placeholders
    assert int((feed["input_ids"][1] == 7).sum()) == 8  # image placeholders
    # temporal M-RoPE: the video block's t-component must advance
    t_comp = feed["positions3"][0, 0]
    vid_pos = np.where(feed["input_ids"][0] == 8)[0]
    assert len(set(t_comp[vid_pos].tolist())) == 2  # two temporal steps


def test_qwen2_5_vl_video_tower_parity():
    """Qwen2.5-VL tower with a (2, 8, 8) temporal grid matches HF's video
    path: windows stay within frames by layout, full-attention layers get the
    per-frame block-diagonal mask."""
    from transformers.models.qwen2_5_vl import Qwen2_5_VLForConditionalGeneration

    from nexus_tpu.models.hf_convert import torch_qwen2vl_to_flax
    from nexus_tpu.models.qwen2_vl import Qwen2VLConfig, Qwen25VLVisionTower

    torch.manual_seed(2)
    hf = Qwen2_5_VLForConditionalGeneration(_tiny_hf_25_config()).eval()
    config = Qwen2VLConfig.from_hf(hf.config)
    variables = torch_qwen2vl_to_flax(hf.state_dict(), config)

    vgrid = (2, 8, 8)
    rng = np.random.default_rng(6)
    patches = rng.standard_normal(
        (1, vgrid[0] * vgrid[1] * vgrid[2], config.vision.patch_dim)
    ).astype(np.float32)
    tower = Qwen25VLVisionTower(config.vision, grid_thw=vgrid)
    ours = tower.apply({"params": variables["params"]["visual"]}, jnp.asarray(patches))
    with torch.no_grad():
        theirs = hf.model.visual(
            torch.from_numpy(patches.reshape(-1, patches.shape[-1])),
            grid_thw=torch.tensor([list(vgrid)]),
        ).numpy().reshape(1, -1, 48)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4)


def test_qwen2_5_vl_video_temporal_positions_parity():
    """Qwen2.5-VL spaces VIDEO temporal M-RoPE components by
    tokens_per_second * second_per_grid_t (HF get_rope_index time_tensor);
    get_mrope_positions(temporal_scale=...) must reproduce it exactly."""
    from transformers.models.qwen2_5_vl import Qwen2_5_VLForConditionalGeneration

    from nexus_tpu.models.qwen2_vl import Qwen2VLConfig, get_mrope_positions

    torch.manual_seed(3)
    hf = Qwen2_5_VLForConditionalGeneration(_tiny_hf_25_config()).eval()
    config = Qwen2VLConfig.from_hf(hf.config)
    tps_video = hf.config.vision_config.tokens_per_second
    assert config.vision.tokens_per_second == tps_video

    vgrid = (3, 8, 8)
    n_tok = vgrid[0] * 16
    rng = np.random.default_rng(7)
    ids = rng.integers(10, 250, (1, 64)).astype(np.int64)
    ids[0, 2] = 9
    ids[0, 3 : 3 + n_tok] = 8
    mask = np.ones((1, 64), np.int64)
    second_per_grid_t = 1.0  # HF processor: temporal_patch_size / fps = 2/2

    hf_pos, _ = hf.model.get_rope_index(
        torch.from_numpy(ids), None, torch.tensor([list(vgrid)]),
        torch.tensor([second_per_grid_t]), torch.from_numpy(mask),
    )
    ours = get_mrope_positions(
        ids, mask, [vgrid], image_token_id=7, video_token_id=8, merge=2,
        temporal_scale=second_per_grid_t * tps_video,
    )
    np.testing.assert_array_equal(ours, hf_pos.numpy())
