"""Multi-feature categorical embedding (parity: Nexus/modules/embedding.py:8-106).

TPU-first design: instead of one table per feature (a Python loop of small
gathers), ALL features share a single fused table indexed with per-feature
offsets — the whole embedding layer is ONE gather, which XLA maps to a single
efficient dynamic-gather over HBM and which shards row-wise over a device
mesh for model-parallel embedding tables (the TorchRec-equivalent path).

Output modes match the reference: concat ([*, F*D]) / stack ([*, F, D]) /
dict ({feat: [*, D]}).
"""

from __future__ import annotations

from typing import Dict, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class MultiFeatEmbedding(nn.Module):
    """Embedding layer for multiple categorical features.

    Attributes:
        features: ordered feature names.
        feat_nums: cardinality per feature (same order). Pass either this or
            a `stats` object via `from_stats`.
        embedding_dim: embedding dim shared by all features.
        concat_embeddings / stack_embeddings: output mode (mutually exclusive;
            both False -> dict output).
        zero_pad: treat index 0 of every feature as padding (zero vector),
            matching the reference's per-feature ``padding_idx=0``.
    """

    features: Sequence[str]
    feat_nums: Sequence[int]
    embedding_dim: int
    concat_embeddings: bool = True
    stack_embeddings: bool = False
    zero_pad: bool = True

    @classmethod
    def from_stats(cls, features, stats, embedding_dim, **kw) -> "MultiFeatEmbedding":
        nums = [getattr(stats, f) for f in features]
        return cls(features=tuple(features), feat_nums=tuple(nums), embedding_dim=embedding_dim, **kw)

    @property
    def total_embedding_dim(self) -> int:
        return self.embedding_dim * len(self.features)

    def setup(self):
        if self.concat_embeddings and self.stack_embeddings:
            raise ValueError("concat_embeddings and stack_embeddings are mutually exclusive")
        offsets, cur = {}, 0
        for feat, n in zip(self.features, self.feat_nums):
            offsets[feat] = cur
            cur += int(n)
        self._feat2offset = offsets
        # round the fused table up to 128 rows: aligned for TPU tiling and
        # evenly divisible for model-parallel row sharding
        self._total_rows = -(-cur // 128) * 128
        self.combined_table = nn.Embed(
            num_embeddings=self._total_rows,
            features=self.embedding_dim,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="combined_table",
        )

    def __call__(self, batch: Dict[str, Array], strict: bool = True) -> Union[Array, Dict[str, Array]]:
        """Embed all (present) features of ``batch``.

        With ``strict=True`` every feature must be present. With
        ``strict=False`` only the intersection is embedded (used for sequence
        feature sub-dicts).
        """
        feats = [f for f in self.features if (strict or f in batch)]
        if strict:
            missing = [f for f in feats if f not in batch]
            if missing:
                raise KeyError(f"batch missing embedding features {missing}")
        outputs: Dict[str, Array] = {}
        for feat in feats:
            idx = batch[feat]
            emb = self.combined_table(idx + self._feat2offset[feat])
            if self.zero_pad:
                emb = emb * (idx != 0)[..., None].astype(emb.dtype)
            outputs[feat] = emb
        if self.concat_embeddings:
            return jnp.concatenate([outputs[f] for f in feats], axis=-1)
        if self.stack_embeddings:
            return jnp.stack([outputs[f] for f in feats], axis=-2)
        return outputs
