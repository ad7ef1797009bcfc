"""LLaVA-Next backbone parity vs the HF torch implementation (closes the
'llava-next' entry of the reference VLM registry, Nexus/modules/
multimodal.py:172-512): CLIP tower features, AnyRes pack plan, and the full
merged forward must match torch within tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

IMG_TOK = 7


def _tiny_hf_config():
    from transformers import LlavaNextConfig as HFConfig

    return HFConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=16, patch_size=8, num_channels=3,
            hidden_act="quick_gelu", layer_norm_eps=1e-5,
        ),
        text_config=dict(
            model_type="llama", vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-6,
        ),
        image_grid_pinpoints=[[16, 16], [16, 32], [32, 16], [32, 32]],
        image_token_index=IMG_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import LlavaNextForConditionalGeneration

    from nexus_tpu.models.hf_convert import torch_llava_next_to_flax
    from nexus_tpu.models.llava_next import LlavaNextConfig

    torch.manual_seed(0)
    hf = LlavaNextForConditionalGeneration(_tiny_hf_config()).eval()
    config = LlavaNextConfig.from_hf(hf.config)
    variables = torch_llava_next_to_flax(hf.state_dict(), config)
    return hf, config, variables


# two images: a tall one (24x16 -> best fit 32x16, 1x2 tile grid) and a wide
# one (16x28 -> best fit 16x32, 2x1)
IMAGE_SIZES = [(24, 16), (16, 28)]


def _tiles(rng, config):
    from nexus_tpu.models.llava_next import num_tiles

    counts = [num_tiles(s, config.image_grid_pinpoints, config.vision.image_size)
              for s in IMAGE_SIZES]
    px = rng.standard_normal(
        (sum(counts), config.vision.image_size, config.vision.image_size, 3)
    ).astype(np.float32)
    return px, counts


def test_config_roundtrip(tiny_pair):
    _, config, _ = tiny_pair
    assert config.vision.num_hidden_layers == 3
    assert config.feature_depth == 2  # -2 -> run 2 of 3 layers
    assert config.image_token_id == IMG_TOK
    assert config.text.num_key_value_heads == 2


def test_packed_image_features_parity(tiny_pair):
    """Tower + projector + AnyRes gather plan vs HF get_image_features."""
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(0)
    px, counts = _tiles(rng, config)

    with torch.no_grad():
        theirs = hf.model.get_image_features(
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2),
            image_sizes=torch.tensor([list(s) for s in IMAGE_SIZES]),
        )  # list per image or packed tensor, version-dependent
        if isinstance(theirs, (list, tuple)):
            theirs = torch.cat(list(theirs), dim=0)

    from nexus_tpu.models.llava_next import (
        LlavaNextBackbone, build_pack_gather, image_feature_lens,
    )

    lens = image_feature_lens(IMAGE_SIZES, config)
    assert theirs.shape[0] == sum(lens)

    # drive the features through the backbone: a sequence of ONLY image
    # placeholders reads back the packed table in plan order
    ids = np.full((1, sum(lens)), IMG_TOK, np.int64)
    gather = build_pack_gather(ids, IMAGE_SIZES, config)
    backbone = LlavaNextBackbone(config)

    # direct numeric check of the plan: build the table from HF's UNPACKED
    # projected features (base+tiles per image), then gather — the packed
    # order must reproduce HF's pack_image_features exactly
    with torch.no_grad():
        vis = hf.model.vision_tower(
            torch.from_numpy(px).permute(0, 3, 1, 2), output_hidden_states=True
        ).hidden_states[config.vision_feature_layer][:, 1:]
        proj = hf.model.multi_modal_projector(vis)  # [N_tiles, P, D]
        newline = hf.model.image_newline
        table = torch.cat([proj.reshape(-1, proj.shape[-1]), newline[None]], dim=0).numpy()
    ours_packed = table[gather[0]]
    np.testing.assert_allclose(ours_packed, theirs.numpy(), atol=1e-5)


def test_full_forward_parity(tiny_pair):
    """Full backbone (vision + merge + Llama trunk) vs HF last_hidden_state."""
    hf, config, variables = tiny_pair
    rng = np.random.default_rng(1)
    px, counts = _tiles(rng, config)

    from nexus_tpu.models.llava_next import (
        LlavaNextBackbone, build_pack_gather, image_feature_lens,
    )

    lens = image_feature_lens(IMAGE_SIZES, config)
    # batch of 2: [text, img0-tokens, text] / [text, img1-tokens], right-pad
    text0 = [3, 4, 5]
    text1 = [9, 10]
    row0 = text0 + [IMG_TOK] * lens[0] + [11, 12]
    row1 = text1 + [IMG_TOK] * lens[1] + [13]
    L = max(len(row0), len(row1))
    ids = np.zeros((2, L), np.int64)
    mask = np.zeros((2, L), np.int64)
    ids[0, : len(row0)] = row0
    mask[0, : len(row0)] = 1
    ids[1, : len(row1)] = row1
    mask[1, : len(row1)] = 1

    with torch.no_grad():
        out = hf.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2),
            image_sizes=torch.tensor([list(s) for s in IMAGE_SIZES]),
        )
        theirs = out.last_hidden_state.numpy()

    gather = build_pack_gather(ids, IMAGE_SIZES, config)
    backbone = LlavaNextBackbone(config)
    ours = np.asarray(
        backbone.apply(
            variables, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(px),
            jnp.asarray(gather),
        )["last_hidden_state"]
    )
    # padded positions may differ (HF attends pad rows to themselves); compare valid
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], theirs[valid], atol=2e-4)


def test_registry_builds():
    from nexus_tpu.models.llava_next import LlavaNextConfig
    from nexus_tpu.modules.multimodal import load_multimodal_backbone

    cfg = LlavaNextConfig.from_hf(_tiny_hf_config())
    mdl = load_multimodal_backbone("llava-next", config=cfg)
    assert mdl.config.image_token_id == IMG_TOK


def test_processor_adapter_end_to_end(tiny_pair):
    """Raw images -> AnyRes tiles + plan -> backbone forward (static shapes)."""
    _, config, variables = tiny_pair
    from nexus_tpu.models.llava_next import LlavaNextBackbone, image_feature_lens
    from nexus_tpu.modules.multimodal import LlavaNextProcessorAdapter

    class _Tok:
        pad_token_id = 0

        def __call__(self, text, **kw):
            toks = [min(3 + ord(ch) % 100, 127) for ch in text]
            toks = [t if t != IMG_TOK else IMG_TOK + 1 for t in toks]  # avoid the placeholder id
            return {"input_ids": toks[: kw.get("max_length", 64)]}

    rng = np.random.default_rng(0)
    img_tall = (rng.random((24, 16, 3)) * 255).astype(np.uint8)
    img_wide = (rng.random((16, 28, 3)) * 255).astype(np.uint8)
    adapter = LlavaNextProcessorAdapter(_Tok(), config, max_length=64, max_tiles=8)
    feed = adapter([
        {"text": "a tall thing", "images": [img_tall]},
        {"text": "wide", "images": [img_wide]},
    ])
    assert feed["pixel_values"].shape == (8, 16, 16, 3)
    lens = image_feature_lens([(24, 16), (16, 28)], config)
    assert int((feed["input_ids"] == config.image_token_id).sum()) == sum(lens)

    backbone = LlavaNextBackbone(config)
    out = backbone.apply(
        variables, jnp.asarray(feed["input_ids"]), jnp.asarray(feed["attention_mask"]),
        jnp.asarray(feed["pixel_values"]), jnp.asarray(feed["pack_gather"]),
    )["last_hidden_state"]
    assert out.shape == (2, 64, config.text.hidden_size)
    assert np.isfinite(np.asarray(out)).all()
