"""Generic layers (parity: Nexus/modules/layer.py:16-210).

Flax linen modules. BatchNorm uses `use_running_average` driven by a
`train` flag; ranking models in this framework run BN in batch-stats mode
during training and running-average mode at eval (handled via the
`batch_stats` collection).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from nexus_tpu.modules.activations import get_activation

Array = jnp.ndarray


class MLPModule(nn.Module):
    """Configurable MLP: [d0, d1, ..., dn] with per-layer dropout/BN/activation.

    `mlp_layers` lists every layer dim including the input dim, as in the
    reference (layer.py:68). Flattens leading axes before BatchNorm so BN is
    always over the feature axis.
    """

    mlp_layers: Sequence[int]
    activation_func: Optional[str] = "relu"
    dropout: float = 0.0
    use_bias: bool = True
    batch_norm: bool = False
    last_activation: bool = True
    last_bn: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dims = list(self.mlp_layers)
        lead_shape = x.shape[:-1]
        x = x.reshape(-1, x.shape[-1])
        n_layers = len(dims) - 1
        for idx, out_dim in enumerate(dims[1:]):
            is_last = idx == n_layers - 1
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.Dense(out_dim, use_bias=self.use_bias)(x)
            want_bn = self.batch_norm and (not is_last or self.last_bn)
            if want_bn:
                x = nn.BatchNorm(use_running_average=not train)(x)
            want_act = self.activation_func is not None and (not is_last or self.last_activation)
            if want_act:
                act = get_activation(self.activation_func, out_dim)
                x = act(x)
        return x.reshape(*lead_shape, x.shape[-1])


class FC(nn.Module):
    """Dropout -> Dense -> [BN] -> ReLU (parity: layer.py:48-65)."""

    output_dim: int
    use_bn: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.output_dim)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class SENet(nn.Module):
    """Squeeze-excite gate: x * 2*sigmoid(fc2(relu(fc1(x)))) (parity: layer.py:16-46)."""

    input_dim: int
    reduction: int = 2
    use_bn: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = max(1, self.input_dim // self.reduction)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        out = nn.Dense(hidden)(out)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        out = nn.Dense(self.input_dim)(out)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=not train)(out)
        gate = nn.sigmoid(out)
        return 2.0 * gate * x


class ActivationUnit(nn.Module):
    """DIN target attention scores (parity: layer.py:160-190).

    query [B, D], keys [B, L, D] -> scores [B, L, 1] via
    dense(dice(dnn(cat(q, k, q-k, q*k)))).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, query: Array, keys: Array) -> Array:
        keys = keys.reshape(*keys.shape[:2], -1)
        query = query.reshape(query.shape[0], -1)
        q = jnp.broadcast_to(query[:, None, :], keys.shape)
        attn_in = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
        h = nn.Dense(self.hidden_size, name="dnn")(attn_in)
        h = get_activation("dice", self.hidden_size)(h)
        return nn.Dense(1, name="dense")(h)


class LambdaModule(nn.Module):
    func: Callable = None

    def __call__(self, x):
        return self.func(x)


class HStackModule(nn.Module):
    """Apply a list of submodules to the same input and aggregate the outputs."""

    layers: Sequence[Any]
    aggregate_function: Callable = None

    @nn.compact
    def __call__(self, x, **kwargs):
        outputs = [layer(x, **kwargs) if isinstance(layer, nn.Module) else layer(x) for layer in self.layers]
        agg = self.aggregate_function or (lambda ys: jnp.stack(ys, axis=-1))
        return agg(outputs)
