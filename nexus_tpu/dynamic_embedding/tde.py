"""Dynamic-embedding model wrapper — the TorchRec-TDE replacement
(parity: Nexus/training/embedder/recommendation/tde_modeling.py:17-170 +
dynamic_embedding/wrappers.py).

Architecture (TPU host/device split):
- the device holds a FIXED-capacity embedding cache table (rows = slots)
  inside the model's normal fused MultiFeatEmbedding — trained by optax like
  any other parameter;
- the host-side IDTransformerGroup (native C++ LRU) maps unbounded global
  ids to slots per batch BEFORE the batch is fed to the compiled step;
- on eviction, the old row is pulled from the device table and spilled to
  the parameter server (any KVStore); on re-admission of a previously seen
  id, its row is restored into the table. Row traffic per step is tiny
  (only cache misses) and stays off the jit critical path.

`TDEModel` wraps any retriever/ranker built with capacity-sized stats.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nexus_tpu.dynamic_embedding.id_transformer import IDTransformerGroup
from nexus_tpu.inference.feature_store import KVStore, MemoryKVStore
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.dynamic_embedding")


class TDEModel:
    """Wrap a rec model: transform id features per batch + spill/load rows.

    Args:
        model: a BaseRetriever/BaseRanker whose data_config.stats already
            uses CACHE CAPACITIES for the dynamic features (the reference
            builds its plan the same way: table size = cache rows).
        tde_features: feature name -> capacity (must match stats).
        ps: parameter server KVStore (reference: redis url in tde_settings).
    """

    def __init__(self, model, tde_features: Dict[str, int], ps: Optional[KVStore] = None,
                 use_native: bool = True):
        self.model = model
        self.tde_features = dict(tde_features)
        self.transformer_group = IDTransformerGroup(self.tde_features, use_native=use_native)
        self.ps = ps or MemoryKVStore()
        self._tables: Optional[List[Tuple[tuple, Dict[str, int]]]] = None

    # -- model protocol passthrough (trainer sees a normal model) -----------

    def __getattr__(self, name):
        return getattr(self.model, name)

    # -- batch transform -----------------------------------------------------

    def transform_batch(self, batch: dict, variables=None) -> Tuple[dict, dict]:
        """Host-side id->slot transform + PS row traffic. Returns the
        transformed batch and the updated variables (row loads applied)."""
        new_batch, events = self.transformer_group.transform_batch(batch)
        if variables is not None and any(adm or ev for adm, ev in events.values()):
            variables = self._apply_row_traffic(variables, events)
        return new_batch, variables

    @staticmethod
    def _find_embedding_paths(params: dict, prefix=()) -> List[tuple]:
        """Locate every fused combined_table inside the param tree."""
        found = []
        for k, v in params.items():
            if k == "combined_table" and isinstance(v, dict) and "embedding" in v:
                found.append(prefix + (k, "embedding"))
            elif isinstance(v, dict):
                found += TDEModel._find_embedding_paths(v, prefix + (k,))
        return found

    def _layout(self, params) -> List[Tuple[tuple, Dict[str, int]]]:
        """[(table_path, {feature: in-table offset})] — tables are identified
        by the embedding module's name in the param path (context_embedding /
        item_embedding / embedding_layer), falling back to row-count matching
        against the feature-list layouts MultiFeatEmbedding uses."""
        if self._tables is not None:
            return self._tables
        d = self.model.data_config
        stats = d.stats

        def offsets_of(feats):
            out, cur = {}, 0
            for f in feats:
                out[f] = cur
                cur += int(getattr(stats, f))
            # MultiFeatEmbedding pads fused tables up to 128 rows
            return -(-cur // 128) * 128, out

        named_layouts = {
            "context_embedding": d.context_features,
            "item_embedding": d.item_features,
            "embedding_layer": list(stats.columns),
        }
        fallback = [offsets_of(f) for f in
                    (d.context_features, d.item_features, list(stats.columns)) if f]
        tables = []
        for path in self._find_embedding_paths(params):
            table = params
            for p in path:
                table = table[p]
            rows = table.shape[0]
            match = None
            for key in path:
                name = getattr(key, "key", key) if not isinstance(key, str) else key
                for module_name, feats in named_layouts.items():
                    if feats and module_name in str(name):
                        match = offsets_of(feats)[1]
                        break
                if match:
                    break
            if match is None:
                match = next((off for total, off in fallback if total == rows), None)
            if match is None:
                logger.warning("tde: no feature layout matches table %s (%d rows)", path, rows)
                continue
            tables.append((path, match))
        self._tables = tables
        return tables

    def _apply_row_traffic(self, variables, events: Dict[str, tuple]):
        params = variables["params"]
        new_params = params
        for path, offsets in self._layout(params):
            table = new_params
            for p in path:
                table = table[p]
            emb = table  # [total_rows, D] device array
            evict_rows, evict_keys = [], []
            load_rows, load_vals = [], []
            for feat, (admitted, evicted) in events.items():
                if feat not in offsets:
                    continue
                base = offsets[feat]
                tname = "_".join(path[:-2]) or "t"
                for gid, slot in evicted:
                    evict_rows.append(base + slot)
                    evict_keys.append(f"tde:{tname}:{feat}:{gid}")
                for gid, slot in admitted:
                    blob = self.ps.get(f"tde:{tname}:{feat}:{gid}")
                    if blob is not None:
                        load_rows.append(base + slot)
                        load_vals.append(np.frombuffer(blob, np.float32))
            if evict_rows:
                rows = np.asarray(emb)[np.asarray(evict_rows)]
                for key, row in zip(evict_keys, rows):
                    self.ps.set(key, row.astype(np.float32).tobytes())
            if load_rows:
                # emb may be numpy (fresh checkpoint restore) or a jax array
                emb = jnp.asarray(emb).at[jnp.asarray(load_rows)].set(
                    jnp.asarray(np.stack(load_vals))
                )
                new_params = _set_in(new_params, list(path), emb)
        if new_params is not params:
            variables = {**variables, "params": new_params}
        return variables

    # -- corpus encode under dynamic ids ------------------------------------

    def compute_item_vectors(self, variables, batch_size: int = 4096):
        """Encode the FULL item corpus through the item tower with per-chunk
        id->slot transforms (parity: the reference's TDE eval passes the item
        loader through the same transform its batches use). The cache only
        ever holds `capacity` ids, so each chunk admits its ids (restoring
        spilled rows from the PS) before encoding — vectors stay indexed by
        GLOBAL item position. Returns (vectors, updated_variables)."""
        import jax

        model = self.model
        feats = model.item_feat_table
        if feats is None:
            raise RuntimeError("no item dataset attached; call set_item_dataset first")
        n = next(iter(feats.values())).shape[0]
        encode = jax.jit(lambda v, b: model.net.apply(v, b, method="encode_item"))
        out = []
        for off in range(0, n, batch_size):
            lo = min(off, max(n - batch_size, 0)) if off + batch_size > n else off
            chunk = {k: np.asarray(v[lo : lo + batch_size]) for k, v in feats.items()}
            chunk_t, variables = self.transform_batch(chunk, variables)
            vecs = np.asarray(encode(variables, {k: jnp.asarray(v) for k, v in chunk_t.items()}))
            if off + batch_size > n:  # final overlapped window: keep the tail
                vecs = vecs[-(n - off):]
            out.append(vecs)
        return np.concatenate(out, axis=0), variables

    # -- persistence (parity: tde_save / state gather) -----------------------

    def tde_save(self, path: str, variables) -> None:
        """Spill ALL resident rows to the PS and save transformer state."""
        params = variables["params"]
        state = {}
        for feat in self.tde_features:
            pairs = self.transformer_group[feat].dump()
            state[feat] = pairs
            for tree_path, offsets in self._layout(params):
                if feat not in offsets:
                    continue
                table = params
                for p in tree_path:
                    table = table[p]
                emb = np.asarray(table)
                base = offsets[feat]
                tname = "_".join(tree_path[:-2]) or "t"
                for gid, slot in pairs:
                    self.ps.set(
                        f"tde:{tname}:{feat}:{gid}",
                        emb[base + slot].astype(np.float32).tobytes(),
                    )
        with open(path, "wb") as f:
            pickle.dump(state, f)
        logger.info("tde state saved: %s (%d features)", path, len(state))

    def tde_load(self, path: str, variables):
        with open(path, "rb") as f:
            state = pickle.load(f)
        events = {}
        for feat, pairs in state.items():
            if feat not in self.transformer_group:
                continue
            self.transformer_group[feat].restore(pairs)
            events[feat] = (pairs, [])  # admitted: load rows from PS
        return self._apply_row_traffic(variables, events)


def _set_in(tree: dict, path: list, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_in(tree[path[0]], path[1:], value)}


def wrap_dataloader(batches, tde_model: TDEModel, get_variables, set_variables):
    """Iterate batches with id transform applied; row traffic updates the
    live variables via the provided getter/setter (parity: wrap_dataloader,
    dynamic_embedding/wrappers.py:309-399)."""
    for batch in batches:
        variables = get_variables()
        new_batch, new_vars = tde_model.transform_batch(batch, variables)
        if new_vars is not None and new_vars is not variables:
            set_variables(new_vars)
        yield new_batch
