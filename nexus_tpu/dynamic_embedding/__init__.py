from nexus_tpu.dynamic_embedding.id_transformer import (  # noqa: F401
    IDTransformer,
    IDTransformerGroup,
)
from nexus_tpu.dynamic_embedding.tde import TDEModel, wrap_dataloader  # noqa: F401


def parse_tde_features(pairs):
    """'name=capacity' CLI pairs -> {name: int(capacity)} (shared by the
    TDE train/eval CLIs; capacities must be integers, names may not
    contain '=')."""
    out = {}
    for p in pairs:
        name, sep, cap = p.rpartition("=")
        if not sep or not name:
            raise ValueError(f"expected name=capacity, got {p!r}")
        out[name] = int(cap)
    return out
