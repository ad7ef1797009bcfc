"""BERT-family text encoder in Flax — the backbone for BGE-style embedders and
cross-encoder rerankers (reference role: the HF AutoModel loaded at
Nexus/training/embedder/text_retrieval/runner.py:94-140).

TPU-first notes:
- weights can be held and computed in bfloat16 (`dtype=jnp.bfloat16`) with
  f32 layernorm statistics — the standard TPU recipe;
- static shapes: inputs are always [B, L] with an attention mask, bucketed
  at the session layer, never dynamic;
- everything is vanilla XLA (fused by the compiler); a fused Pallas attention
  path can be swapped in via `attention_impl='pallas'` for long sequences.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nexus_tpu.config import AbsArguments

Array = jnp.ndarray


@dataclass
class BertConfig(AbsArguments):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    pad_token_id: int = 0
    # nexus extras
    add_pooling_layer: bool = True
    attention_impl: str = "xla"  # 'xla' | 'pallas' (flash attention kernel)
    # | 'fused' (ops/fused_encoder.py megakernel: QKV+attention+O+LN in one
    # Pallas program — the fastest encode path; falls back to flash/xla when
    # dropout is active in training or shapes are unsupported)
    fused_qkv: bool = False  # one [h, 3h] projection instead of 3 [h, h]
    # the pallas/fused fast paths reduce a padding-only attention mask to
    # per-row lengths (right-contiguous masks — the tokenizer default the
    # engines/collators enforce; +17% at seq 512). Set False for left-padded
    # or non-contiguous masks: attention then uses the full mask as segment
    # ids, correct for any layout.
    right_padded_masks: bool = True
    # RoBERTa/XLM-R (BGE-M3's trunk): non-pad token positions start at
    # padding_idx + 1 (HF create_position_ids_from_input_ids). 0 = BERT.
    position_offset: int = 0
    # int8 W8A8 serving path: projection/FFN kernels are int8 (converted by
    # models/quantize.py:quantize_bert_params), activations quantize
    # per-token inline, GEMMs accumulate int32 on the MXU at 2x bf16 peak.
    # Inference-only; composes with every attention_impl — 'fused' runs the
    # int8 full-layer megakernel (fused_encoder_layer_int8).
    quantized: bool = False

    @classmethod
    def from_hf(cls, hf_config) -> "BertConfig":
        import dataclasses as _dc

        d = hf_config.to_dict() if hasattr(hf_config, "to_dict") else dict(hf_config)
        names = {f.name for f in _dc.fields(cls)}
        kw = {k: v for k, v in d.items() if k in names and v is not None}
        if "roberta" in str(d.get("model_type", "")):
            # positions start at padding_idx+1 (pad_token_id is 1 for
            # roberta/xlm-roberta); token_type table is a single row
            kw.setdefault("position_offset", int(d.get("pad_token_id", 1)) + 1)
        return cls(**kw)


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids, position_ids, train: bool = False):
        c = self.config
        we = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")
        pe = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="position_embeddings")
        te = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype, name="token_type_embeddings")
        x = we(input_ids) + pe(position_ids + c.position_offset) + te(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="LayerNorm")(x)
        x = nn.Dropout(c.hidden_dropout_prob, deterministic=not train)(x)
        return x.astype(self.dtype)


class _DenseParams(nn.Module):
    """Materializes the SAME param tree as an nn.Dense of `features` (keys
    'kernel'/'bias', identical initializers/param dtype) without computing —
    the fused megakernel path reads raw weights while keeping checkpoints
    and hf_convert layouts byte-compatible with the unfused path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int, dtype):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k.astype(dtype), b


class _QuantDenseParams(nn.Module):
    """Materializes the SAME param tree as a QuantDense of `features`
    (int8 'kernel' + f32 'scale'/'bias') without computing — the int8 fused
    megakernel reads the raw quantized weights while keeping checkpoints
    byte-compatible with the unfused QuantDense path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.zeros,
                       (in_features, self.features), jnp.int8)
        s = self.param("scale", nn.initializers.ones,
                       (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, s, b


class _LNParams(nn.Module):
    """nn.LayerNorm's param tree ('scale'/'bias') without computing."""

    @nn.compact
    def __call__(self, features: int):
        g = self.param("scale", nn.initializers.ones_init(), (features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (features,), jnp.float32)
        return g, b



def _proj_dense(c, features, name, dtype):
    """nn.Dense, or the int8 QuantDense when config.quantized (serving)."""
    if c.quantized:
        from nexus_tpu.models.quantize import QuantDense

        return QuantDense(features, out_dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)

class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, train: bool = False, segment_ids=None,
                 return_weights: bool = False):
        c = self.config
        h, n_heads = c.hidden_size, c.num_attention_heads
        head_dim = h // n_heads
        if return_weights:
            # fused megakernel path: hand the raw [H, 3H] projection to the
            # kernel; param tree identical to the unfused Dense modules
            if c.quantized:
                # int8 layout: (kernel, scale, bias) per projection —
                # per-output-channel scales concatenate exactly like columns
                if c.fused_qkv:
                    return _QuantDenseParams(3 * h, name="qkv")(h)
                kq, sq, bq = _QuantDenseParams(h, name="query")(h)
                kk, sk, bk = _QuantDenseParams(h, name="key")(h)
                kv, sv, bv = _QuantDenseParams(h, name="value")(h)
                return (jnp.concatenate([kq, kk, kv], axis=-1),
                        jnp.concatenate([sq, sk, sv]),
                        jnp.concatenate([bq, bk, bv]))
            if c.fused_qkv:
                return _DenseParams(3 * h, name="qkv")(h, self.dtype)
            wq, bq = _DenseParams(h, name="query")(h, self.dtype)
            wk, bk = _DenseParams(h, name="key")(h, self.dtype)
            wv, bv = _DenseParams(h, name="value")(h, self.dtype)
            return (jnp.concatenate([wq, wk, wv], axis=-1),
                    jnp.concatenate([bq, bk, bv]))
        if c.fused_qkv:
            # one [h, 3h] matmul keeps the MXU on a single fat GEMM instead
            # of three slim ones (measurably better at short sequences)
            qkv = _proj_dense(c, 3 * h, "qkv", self.dtype)(hidden)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = _proj_dense(c, h, "query", self.dtype)(hidden)
            k = _proj_dense(c, h, "key", self.dtype)(hidden)
            v = _proj_dense(c, h, "value", self.dtype)(hidden)
        b, l = hidden.shape[:2]
        q = q.reshape(b, l, n_heads, head_dim)
        k = k.reshape(b, l, n_heads, head_dim)
        v = v.reshape(b, l, n_heads, head_dim)
        if c.attention_impl in ("pallas", "fused") and not (
            train and c.attention_probs_dropout_prob > 0
        ):
            from nexus_tpu.ops.flash_attention import (
                flash_attention, flash_attention_padded)

            # whole-row blocks up to 512: at encoder lengths one (head, row)
            # program does a single dense VMEM attention — far fewer, fatter
            # programs than the 128-block streaming shape.
            # (A layout-native [B, L, H, D] variant that would drop the four
            # HBM transposes was tried and is infeasible under current
            # Mosaic tiling rules — BENCH_NOTES r3 records the attempt.)
            blk = min(512, max(128, l))
            qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if segment_ids is None and c.right_padded_masks:
                # padding-only RIGHT-contiguous mask (tokenizer default; the
                # sessions enforce it): the lengths fast path masks with a
                # register iota compare instead of segment-id loads (+17% at
                # seq 512). right_padded_masks=False handles any layout.
                lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
                ctx = flash_attention_padded(qt, kt, vt, lengths, blk, blk)
            else:
                seg = segment_ids if segment_ids is not None else attention_mask
                ctx = flash_attention(qt, kt, vt, seg.astype(jnp.int32), blk, blk)
            return ctx.transpose(0, 2, 1, 3).reshape(b, l, h)
        scale = 1.0 / jnp.sqrt(head_dim).astype(self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if segment_ids is not None:
            # packed rows: tokens attend only within their own segment
            allowed = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
                segment_ids[:, None, :] != 0
            )
            bias = jnp.where(allowed[:, None], 0.0, jnp.finfo(jnp.float32).min)
        else:
            bias = jnp.where(attention_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits.astype(jnp.float32) + bias, axis=-1).astype(self.dtype)
        probs = nn.Dropout(c.attention_probs_dropout_prob, deterministic=not train)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(b, l, h)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, train: bool = False, segment_ids=None):
        c = self.config
        from nexus_tpu.ops.fused_encoder import (
            fused_attention_ln, fused_encoder_layer, fused_encoder_layer_int8,
            fused_layer_int8_supported, fused_layer_supported,
            fused_supported)

        h = c.hidden_size
        if (c.attention_impl == "fused" and c.quantized and not train
                and fused_layer_int8_supported(
                    h, c.num_attention_heads, hidden.shape[1],
                    c.intermediate_size, c.hidden_act)):
            # int8 W8A8 full-layer megakernel: projection/FFN GEMMs at the
            # MXU's 2x int8 peak inside one program per row (serving path)
            wqkv_q, s_qkv, bqkv = BertSelfAttention(
                c, dtype=self.dtype, name="attention_self")(
                hidden, attention_mask, train, segment_ids,
                return_weights=True)
            wo_q, s_o, bo = _QuantDenseParams(h, name="attention_output_dense")(h)
            g1, b1 = _LNParams(name="attention_output_LayerNorm")(h)
            wup_q, s_up, bup = _QuantDenseParams(
                c.intermediate_size, name="intermediate_dense")(h)
            wdn_q, s_dn, bdn = _QuantDenseParams(h, name="output_dense")(
                c.intermediate_size)
            g2, b2 = _LNParams(name="output_LayerNorm")(h)
            kw = dict(heads=c.num_attention_heads, eps=c.layer_norm_eps,
                      act=c.hidden_act)
            if segment_ids is not None:
                kw["segment_ids"] = segment_ids
            elif c.right_padded_masks:
                kw["lengths"] = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
            else:
                kw["segment_ids"] = attention_mask.astype(jnp.int32)
            return fused_encoder_layer_int8(
                hidden, (wqkv_q, s_qkv, bqkv, wo_q, s_o, bo, g1, b1,
                         wup_q, s_up, bup, wdn_q, s_dn, bdn, g2, b2), **kw)
        # HIDDEN dropout runs through the fused kernels (key-derived mask
        # operands; the backward regenerates them). Attention-PROBS dropout
        # cannot ([L, L]-per-head masks don't fit as operands) and gates the
        # fused paths off — the flash-attn training convention keeps it 0.
        no_probs_dropout = not (train and c.attention_probs_dropout_prob > 0)
        fuse_layer = (
            c.attention_impl == "fused" and no_probs_dropout and not c.quantized
            and fused_layer_supported(h, c.num_attention_heads, hidden.shape[1],
                                      c.intermediate_size, c.hidden_act)
        )
        fuse_attn = (
            c.attention_impl == "fused" and no_probs_dropout and not c.quantized
            and not fuse_layer
            and fused_supported(h, c.num_attention_heads, hidden.shape[1])
        )
        if fuse_layer or fuse_attn:
            wqkv, bqkv = BertSelfAttention(c, dtype=self.dtype, name="attention_self")(
                hidden, attention_mask, train, segment_ids, return_weights=True
            )
            wo, bo = _DenseParams(h, name="attention_output_dense")(h, self.dtype)
            gamma, beta = _LNParams(name="attention_output_LayerNorm")(h)
            kw = dict(heads=c.num_attention_heads, eps=c.layer_norm_eps)
            if train and c.hidden_dropout_prob > 0:
                kw["dropout_rate"] = c.hidden_dropout_prob
                kw["dropout_rng"] = self.make_rng("dropout")
            if segment_ids is not None:
                kw["segment_ids"] = segment_ids
            elif c.right_padded_masks:
                kw["lengths"] = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
            else:
                # non-right-contiguous masks: the 0/1 mask doubles as
                # segment ids (correct for any padding layout)
                kw["segment_ids"] = attention_mask.astype(jnp.int32)
        if fuse_layer:
            wup, bup = _DenseParams(c.intermediate_size, name="intermediate_dense")(
                h, self.dtype)
            wdn, bdn = _DenseParams(h, name="output_dense")(c.intermediate_size,
                                                            self.dtype)
            gamma2, beta2 = _LNParams(name="output_LayerNorm")(h)
            return fused_encoder_layer(
                hidden, (wqkv, bqkv, wo, bo, gamma, beta, wup, bup, wdn, bdn,
                         gamma2, beta2), act=c.hidden_act, **kw)
        if fuse_attn:
            hidden = fused_attention_ln(hidden, wqkv, bqkv, wo, bo, gamma,
                                        beta, **kw)
        else:
            attn = BertSelfAttention(c, dtype=self.dtype, name="attention_self")(
                hidden, attention_mask, train, segment_ids
            )
            attn = _proj_dense(c, c.hidden_size, "attention_output_dense", self.dtype)(attn)
            attn = nn.Dropout(c.hidden_dropout_prob, deterministic=not train)(attn)
            hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="attention_output_LayerNorm")(
                hidden + attn
            ).astype(self.dtype)
        inter = _proj_dense(c, c.intermediate_size, "intermediate_dense", self.dtype)(hidden)
        act = {"gelu": nn.gelu, "relu": nn.relu, "gelu_new": nn.gelu}[c.hidden_act]
        inter = act(inter)
        out = _proj_dense(c, c.hidden_size, "output_dense", self.dtype)(inter)
        out = nn.Dropout(c.hidden_dropout_prob, deterministic=not train)(out)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="output_LayerNorm")(
            hidden + out
        ).astype(self.dtype)


class _ScannedLayer(nn.Module):
    """BertLayer wrapped for nn.scan: (carry=hidden, _) -> (hidden, None)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, _, attention_mask, train, segment_ids):
        out = BertLayer(self.config, dtype=self.dtype, name="layer")(
            hidden, attention_mask, train, segment_ids
        )
        return out, None


class BertEncoderModel(nn.Module):
    """Full BERT encoder: embeddings -> L transformer layers -> (pooler).

    With ``scan_layers=True`` (default) the L layers run through
    ``jax.lax.scan`` over a stacked parameter axis: ONE layer is traced and
    compiled, cutting XLA compile time ~L-fold with identical math — the
    right trade on TPU where first-compile latency matters (weights convert
    between stacked/unstacked layouts via `stack_layer_params`).
    """

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True
    remat: bool = False  # gradient checkpointing: recompute layer activations in backward
    remat_policy: Optional[str] = None  # None=full remat | 'dots' = save matmul
    # outputs, recompute only elementwise (cheaper backward, more memory) |
    # 'offload_dots' = park matmul outputs in HOST memory instead of
    # recomputing OR keeping them in HBM — the escape hatch from the 16 GB
    # HBM wall that forces full-layer remat at seq-512 (v5e hosts carry
    # 100s of GB of RAM; XLA overlaps the DMA with compute)
    remat_plain_layers: int = 0  # PARTIAL remat: the last k layers skip remat
    # (their activations are saved), trading memory back for ~k/L of the
    # recompute FLOPs; params split into 'layers' (rematted) + 'layers_plain'

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Optional[Array] = None,
        token_type_ids: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        train: bool = False,
        segment_ids: Optional[Array] = None,
        pool_gather: Optional[tuple] = None,
    ):
        """``pool_gather=(rows, cols)``: packed-batch pooling — the CLS
        hidden state of each packed sequence is gathered from its slot and
        fed through the SAME pooler dense, so a cross-encoder head scores
        packed rows with identical params as the padded path."""
        c = self.config
        if segment_ids is not None and attention_mask is None:
            attention_mask = (segment_ids != 0).astype(jnp.int32)
        if attention_mask is None:
            attention_mask = (input_ids != c.pad_token_id).astype(jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        mask_bool = attention_mask.astype(bool)
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, position_ids, train
        )
        if self.scan_layers:
            if self.remat:
                remat_kw = {"static_argnums": (4,)}
                if self.remat_policy == "dots":
                    remat_kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                elif self.remat_policy == "offload_dots":
                    remat_kw["policy"] = jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                        "device", "pinned_host")
                layer_cls = nn.remat(_ScannedLayer, **remat_kw)
            else:
                layer_cls = _ScannedLayer
            n_plain = min(self.remat_plain_layers, c.num_hidden_layers) if self.remat else 0
            scan_kw = dict(
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            )
            Scanned = nn.scan(layer_cls, length=c.num_hidden_layers - n_plain, **scan_kw)
            x, _ = Scanned(c, dtype=self.dtype, name="layers")(
                x, None, mask_bool, train, segment_ids
            )
            if n_plain:
                ScanPlain = nn.scan(_ScannedLayer, length=n_plain, **scan_kw)
                x, _ = ScanPlain(c, dtype=self.dtype, name="layers_plain")(
                    x, None, mask_bool, train, segment_ids
                )
        else:
            for i in range(c.num_hidden_layers):
                x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                    x, mask_bool, train, segment_ids
                )
        pooled = None
        if c.add_pooling_layer:
            cls_states = x[:, 0] if pool_gather is None else x[pool_gather[0], pool_gather[1]]
            pooled = nn.tanh(
                nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler_dense")(cls_states)
            )
        return {"last_hidden_state": x, "pooler_output": pooled}


def stack_layer_params(params: dict, num_layers: int, plain_layers: int = 0) -> dict:
    """Convert per-layer params {'layer_0': t0, ...} into the scanned layout
    {'layers': {'layer': stack([t0...])}} expected by scan_layers=True. With
    ``plain_layers`` k the LAST k layers stack separately under
    'layers_plain' (the partial-remat split, remat_plain_layers)."""
    import jax

    layers = [params[f"layer_{i}"] for i in range(num_layers)]
    out = {k: v for k, v in params.items() if not k.startswith("layer_")}
    stack = lambda ls: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ls)  # noqa: E731
    split = num_layers - plain_layers
    out["layers"] = {"layer": stack(layers[:split])}
    if plain_layers:
        out["layers_plain"] = {"layer": stack(layers[split:])}
    return out


def pool_hidden_states(
    hidden: Array, attention_mask: Array, method: str = "cls"
) -> Array:
    """Sentence-embedding pooling (parity: Nexus/training/embedder/
    text_retrieval/modeling.py:142-175): cls | mean | last_token."""
    mask = attention_mask.astype(hidden.dtype)
    if method == "cls":
        return hidden[:, 0]
    if method == "mean":
        s = jnp.sum(hidden * mask[..., None], axis=1)
        d = jnp.clip(jnp.sum(mask, axis=1, keepdims=True), 1e-9, None)
        return s / d
    if method == "last_token":
        # works for both right padding (last non-pad) and left padding (last col)
        left_padded = mask[:, -1].sum() == mask.shape[0]
        last_idx = jnp.where(
            left_padded,
            hidden.shape[1] - 1,
            jnp.maximum(jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0),
        )
        return jnp.take_along_axis(
            hidden, jnp.broadcast_to(last_idx, (hidden.shape[0],))[:, None, None], axis=1
        )[:, 0]
    raise ValueError(f"unknown pooling method {method!r}")
