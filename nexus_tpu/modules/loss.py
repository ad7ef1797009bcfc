"""Loss functions (parity: Nexus/modules/loss.py:30-338).

Design: losses are lightweight configured callables (dataclasses), not NN
modules — they carry only hyperparameters (plus, for the IPS in-batch loss, a
precomputed weight table) and are safe to close over inside jit. Padding in
pos/neg scores is signalled with -inf exactly as in the reference; we mask it
out with `jnp.where` instead of `nan_to_num`.

All reductions return scalar f32.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _log_sigmoid(x):
    return jax.nn.log_sigmoid(x)


def _finite_mean_over_last(values: Array, reference: Array) -> Array:
    """Mean over last axis counting only positions where `reference` is finite,
    then mean over the rest. Mirrors the reference's notpadnum/nan_to_num dance."""
    finite = jnp.isfinite(reference)
    values = jnp.where(finite, values, 0.0)
    count = jnp.maximum(jnp.sum(finite.astype(values.dtype), axis=-1), 1.0)
    return jnp.mean(jnp.sum(values, axis=-1) / count)


class LossFunction:
    """Base for loss callables (plain class so subclasses choose frozen-ness)."""

    def __call__(self, *args, **kwargs) -> Array:  # pragma: no cover - abstract
        raise NotImplementedError


# --------------------------------------------------------------------------
# Pointwise
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SquareLoss(LossFunction):
    def __call__(self, label: Array, pos_score: Array, **kw) -> Array:
        return jnp.mean((label - pos_score) ** 2)


@dataclass(frozen=True)
class BCEWithLogitLoss(LossFunction):
    reduction: str = "mean"

    def __call__(self, label: Array, scores: Array, **kw) -> Array:
        loss = jnp.maximum(scores, 0) - scores * label + jnp.log1p(jnp.exp(-jnp.abs(scores)))
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


@dataclass(frozen=True)
class BCELoss(LossFunction):
    reduction: str = "mean"
    eps: float = 1e-12

    def __call__(self, label: Array, scores: Array, **kw) -> Array:
        scores = jnp.clip(scores, self.eps, 1.0 - self.eps)
        loss = -(label * jnp.log(scores) + (1.0 - label) * jnp.log(1.0 - scores))
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


@dataclass(frozen=True)
class MSELoss(LossFunction):
    threshold: Optional[float] = None
    reduction: str = "mean"

    def __call__(self, label: Array, score: Array, **kw) -> Array:
        if self.threshold is not None:
            label = (label > self.threshold).astype(score.dtype)
        return jnp.mean((score - label) ** 2)


# --------------------------------------------------------------------------
# Full-score / pairwise sampled losses
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SoftmaxLoss(LossFunction):
    def __call__(self, pos_score: Array, all_score: Array, **kw) -> Array:
        if all_score.ndim > pos_score.ndim:
            return jnp.mean(jax.nn.logsumexp(all_score, axis=-1) - pos_score)
        out = jax.nn.logsumexp(all_score, axis=-1, keepdims=True) - pos_score
        return _finite_mean_over_last(out, pos_score)


@dataclass(frozen=True)
class BPRLoss(LossFunction):
    dns: bool = False  # dynamic negative sampling: use hardest negative only

    def __call__(self, pos_score: Array, neg_score: Array, **kw) -> Array:
        if self.dns:
            hardest = jnp.max(neg_score, axis=-1)
            return -jnp.mean(_log_sigmoid(pos_score - hardest))
        diff = _log_sigmoid(pos_score[..., None] - neg_score)
        return -jnp.mean(jnp.mean(diff, axis=-1))


@dataclass(frozen=True)
class Top1Loss(LossFunction):
    dns: bool = False

    def __call__(self, pos_score: Array, neg_score: Array, **kw) -> Array:
        if self.dns:
            hardest = jnp.max(neg_score, axis=-1)
            return jnp.mean(jax.nn.sigmoid(hardest - pos_score) + jax.nn.sigmoid(hardest**2))
        loss = jax.nn.sigmoid(neg_score - pos_score[..., None]) + jax.nn.sigmoid(neg_score**2)
        return jnp.mean(jnp.mean(loss, axis=-1))


@dataclass(frozen=True)
class SampledSoftmaxLoss(LossFunction):
    """Sampled softmax with proposal-probability correction (log q subtraction)."""

    def __call__(
        self, pos_score: Array, log_pos_prob: Array, neg_score: Array, log_neg_prob: Array, **kw
    ) -> Array:
        new_pos = pos_score - log_pos_prob
        new_neg = neg_score - log_neg_prob
        if new_pos.ndim < new_neg.ndim:
            new_pos = new_pos[..., None]
        allsc = jnp.concatenate([new_pos, new_neg], axis=-1)
        out = jax.nn.logsumexp(allsc, axis=-1, keepdims=True) - new_pos
        return _finite_mean_over_last(out, new_pos)


@dataclass(frozen=True)
class InfoNCELoss(LossFunction):
    """Sampled softmax without proposal correction (q == uniform)."""

    def __call__(self, pos_score: Array, neg_score: Array, label: Array | None = None, **kw) -> Array:
        ssl = SampledSoftmaxLoss()
        return ssl(pos_score, jnp.zeros_like(pos_score), neg_score, jnp.zeros_like(neg_score))


@dataclass
class InBatchSoftmaxLoss(LossFunction):
    """In-batch softmax with inverse-propensity weights from item popularity
    (parity: Nexus/modules/loss.py:126-169).

    `ips` is a [num_items] weight table; build it with `with_item_popularity`.
    """

    num_items: int = 0
    temperature: float = 0.07
    ips: Optional[Array] = None

    def with_item_popularity(self, item_ids, pop_counts, mode: int = 0) -> "InBatchSoftmaxLoss":
        item2pop = jnp.zeros((self.num_items,), jnp.float32).at[jnp.asarray(item_ids)].set(
            jnp.asarray(pop_counts, jnp.float32)
        )
        if mode == 0:
            item2pop = jnp.log(item2pop + 1.0) + 1e-5
        elif mode == 1:
            item2pop = jnp.log(item2pop**0.75 + 1.0) + 1e-5
        else:
            raise ValueError("mode should be 0 or 1")
        item_pop = item2pop / jnp.sum(item2pop)
        return dataclasses.replace(self, ips=1.0 / item_pop)

    def __call__(self, query_vector: Array, pos_item_vector: Array, pos_item_id: Array, **kw) -> Array:
        logits = (query_vector @ pos_item_vector.T) / self.temperature
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        pos_log_probs = jnp.diagonal(log_probs)
        if self.ips is not None:
            weight = self.ips[pos_item_id]
        else:
            weight = jnp.ones_like(pos_log_probs)
        return -jnp.mean(pos_log_probs * weight)


@dataclass(frozen=True)
class WeightedBPRLoss(LossFunction):
    def __call__(self, pos_score: Array, neg_score: Array, log_neg_prob: Array, **kw) -> Array:
        diff = _log_sigmoid(pos_score[..., None] - neg_score)
        weight = jax.nn.softmax(neg_score - log_neg_prob, axis=-1)
        return -jnp.mean(jnp.sum(diff * weight, axis=-1))


@dataclass(frozen=True)
class BinaryCrossEntropyLoss(LossFunction):
    """Sampled-softmax-corrected BCE (parity: loss.py:213-246)."""

    dns: bool = False

    def _weight(self, neg_score: Array, log_neg_prob: Array) -> Array:
        return jnp.ones_like(neg_score) / neg_score.shape[-1]

    def __call__(self, pos_score: Array, neg_score: Array, log_neg_prob: Array | None = None, **kw) -> Array:
        if self.dns:
            hardest = jnp.max(neg_score, axis=-1)
            return jnp.mean(-_log_sigmoid(pos_score) + jax.nn.softplus(hardest))
        if log_neg_prob is None:
            log_neg_prob = jnp.zeros_like(neg_score)
        weight = self._weight(neg_score, log_neg_prob)
        finite = jnp.isfinite(pos_score)
        n_finite = jnp.maximum(jnp.sum(finite), 1)
        pos_loss = jnp.sum(jnp.where(finite, _log_sigmoid(pos_score), 0.0)) / n_finite
        neg_loss = jnp.sum(jax.nn.softplus(neg_score) * weight, axis=-1)
        if pos_score.ndim == neg_score.ndim - 1:
            neg_loss = jnp.sum(jnp.where(finite, neg_loss, 0.0)) / n_finite
        else:
            neg_loss = jnp.mean(neg_loss)
        return -pos_loss + neg_loss


@dataclass(frozen=True)
class WeightedBinaryCrossEntropyLoss(BinaryCrossEntropyLoss):
    def _weight(self, neg_score: Array, log_neg_prob: Array) -> Array:
        return jax.nn.softmax(neg_score - log_neg_prob, axis=-1)


@dataclass(frozen=True)
class HingeLoss(LossFunction):
    margin: float = 2.0
    num_items: Optional[int] = None

    def __call__(self, pos_score: Array, neg_score: Array, **kw) -> Array:
        loss = jnp.maximum(jnp.max(neg_score, axis=-1) - pos_score + self.margin, 0.0)
        if self.num_items is not None:
            impostors = (neg_score - pos_score[..., None] + self.margin) > 0
            rank = jnp.mean(impostors.astype(loss.dtype), axis=-1) * self.num_items
            return jnp.mean(loss * jnp.log(rank + 1.0))
        return jnp.mean(loss)


@dataclass(frozen=True)
class NCELoss(LossFunction):
    def __call__(
        self, pos_score: Array, log_pos_prob: Array, neg_score: Array, log_neg_prob: Array, **kw
    ) -> Array:
        new_pos = pos_score - log_pos_prob
        new_neg = neg_score - log_neg_prob
        loss = _log_sigmoid(new_pos) + jnp.sum(new_neg - jax.nn.softplus(new_neg), axis=-1)
        return -jnp.mean(loss)


@dataclass(frozen=True)
class CCLLoss(LossFunction):
    margin: float = 0.8
    neg_weight: float = 0.3

    def __call__(self, pos_score: Array, neg_score: Array, **kw) -> Array:
        finite = jnp.isfinite(pos_score)
        pos_sig = jax.nn.sigmoid(pos_score)
        neg_sig = jax.nn.sigmoid(neg_score)
        neg_mean = jnp.mean(jax.nn.relu(neg_sig - self.margin), axis=-1)
        loss = (1.0 - pos_sig) + self.neg_weight * neg_mean
        loss = jnp.where(finite, loss, 0.0)
        return jnp.sum(loss) / jnp.maximum(jnp.sum(finite), 1)


# --------------------------------------------------------------------------
# Classification / distillation
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class CrossEntropyLoss(LossFunction):
    reduction: str = "mean"
    label_smoothing: float = 0.0

    def __call__(self, input: Array, target: Array, **kw) -> Array:
        log_probs = jax.nn.log_softmax(input, axis=-1)
        n = input.shape[-1]
        if target.ndim == input.ndim - 1:
            onehot = jax.nn.one_hot(target, n, dtype=log_probs.dtype)
        else:
            onehot = target
        if self.label_smoothing > 0:
            onehot = onehot * (1 - self.label_smoothing) + self.label_smoothing / n
        loss = -jnp.sum(onehot * log_probs, axis=-1)
        if self.reduction == "mean":
            return jnp.mean(loss)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss


@dataclass(frozen=True)
class KLDivLoss(LossFunction):
    """KD loss: -mean(sum(log_softmax(student) * teacher_probs))."""

    def __call__(self, student_scores: Array, teacher_targets: Array, **kw) -> Array:
        return -jnp.mean(
            jnp.sum(jax.nn.log_softmax(student_scores, axis=-1) * teacher_targets, axis=-1)
        )


@dataclass(frozen=True)
class M3KDLoss(LossFunction):
    """BGE-M3 style listwise distillation (parity: loss.py:197-211).

    For each of the `group_size` candidates per query, compute CE of the
    student over the full score matrix with previously-used targets masked
    out, weighted by the teacher's probability for that candidate.
    The loop bound is a static Python int, so it unrolls cleanly under jit.
    """

    def __call__(self, student_scores: Array, teacher_targets: Array, group_size: int, **kw) -> Array:
        b = student_scores.shape[0]
        base_labels = jnp.arange(b) * group_size
        neg_inf = jnp.finfo(student_scores.dtype).min
        mask = jnp.zeros_like(student_scores)
        loss = 0.0
        ce = CrossEntropyLoss(reduction="none")
        for i in range(group_size):
            targets = base_labels + i
            masked_scores = student_scores + mask
            per_query = ce(masked_scores, targets)
            loss = loss + jnp.mean(teacher_targets[:, i] * per_query)
            mask = mask.at[jnp.arange(b), targets].set(neg_inf)
        return loss


def l2_reg_loss_fn(*embeddings: Array) -> Array:
    """Sum over inputs of mean-over-batch squared L2 norm (parity: loss.py:302)."""
    loss = 0.0
    for emb in embeddings:
        loss = loss + jnp.mean(jnp.sum(emb * emb, axis=-1))
    return loss


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

_LOSSES = {
    "square": SquareLoss,
    "softmax": SoftmaxLoss,
    "bpr": BPRLoss,
    "top1": Top1Loss,
    "sampled_softmax": SampledSoftmaxLoss,
    "in_batch_softmax": InBatchSoftmaxLoss,
    "weighted_bpr": WeightedBPRLoss,
    "cross_entropy": CrossEntropyLoss,
    "kl_div": KLDivLoss,
    "m3_kd": M3KDLoss,
    "binary_cross_entropy": BinaryCrossEntropyLoss,
    "weighted_binary_cross_entropy": WeightedBinaryCrossEntropyLoss,
    "hinge": HingeLoss,
    "infonce": InfoNCELoss,
    "nce": NCELoss,
    "ccl": CCLLoss,
    "bce_with_logit": BCEWithLogitLoss,
    "bce": BCELoss,
    "mse": MSELoss,
}


def get_loss(name: str, **kwargs) -> LossFunction:
    key = name.lower().replace("loss", "").strip("_")
    aliases = {"inbatchsoftmax": "in_batch_softmax", "sampledsoftmax": "sampled_softmax"}
    key = aliases.get(key, key)
    if key not in _LOSSES:
        raise ValueError(f"unknown loss {name!r}; known: {sorted(_LOSSES)}")
    return _LOSSES[key](**kwargs)
