"""Streaming sharded dataset over partitioned table files — the industrial
data path (parity: Nexus/training/reranker/recommendation/dataset.py).

Host-side only (numpy); the device never sees ragged data. Key behaviors
mirrored from the reference:
- batch-level iteration: the dataset yields WHOLE fixed-size batch dicts,
  so the training loop is a plain `for batch in dataset` with static shapes
  for jit (the reference pushes batch_size into the dataset and runs the HF
  dataloader with batch_size=1, dataset.py:103-159);
- global slice assignment across (rank, worker) grid per file
  (`calc_slice_position`);
- daily user-sequence side-table join keyed by a request column, re-nested
  into {seq_name: {feat: [B, L]}} sub-dicts;
- shuffle buffer over batches;
- `ItemDataset` with id->features table and item popularity counts.

TPU addition: train iteration drops the ragged tail (static shapes); eval
iteration pads the final batch and reports `_nvalid` so evaluators can mask.
"""

from __future__ import annotations

import os
import re
import zlib
from collections import OrderedDict
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from nexus_tpu.data.clients import get_client, process_conditions
from nexus_tpu.data.processor import DataArguments


def calc_slice_position(
    row_count: int, slice_id: int, slice_count: int, batch_size: int,
    drop_redundant_bs_eq_one: bool, pre_total_remain: int = 0,
) -> Tuple[int, int, int]:
    """Assign this worker's contiguous row range within a file, carrying the
    remainder rows that didn't fill a full per-worker batch from the previous
    file (parity: dataset.py:103-159)."""
    pre_remain_size = pre_total_remain // slice_count
    pre_remain_split = pre_total_remain % slice_count

    size = (row_count + pre_total_remain) // slice_count
    split_point = (row_count + pre_total_remain) % slice_count
    if slice_id < split_point:
        start = slice_id * (size + 1)
        end = start + size + 1
    else:
        start = split_point * (size + 1) + (slice_id - split_point) * size
        end = start + size

    real_start = start - pre_remain_size * slice_id - min(pre_remain_split, slice_id)
    real_end = end - pre_remain_size * (slice_id + 1) - min(pre_remain_split, slice_id + 1)
    if (
        drop_redundant_bs_eq_one
        and split_point != 0
        and (end - start) % batch_size == 1
        and size % batch_size == 0
    ):
        real_end -= 1
        split_point = 0
    return real_start, real_end, (size % batch_size) * slice_count + split_point


def _concat_ragged(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Concat row blocks whose padded widths may differ (variable-list
    columns pad to each chunk's own max length)."""
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] == b.shape[1]:
        return np.concatenate([a, b])
    w = max(a.shape[1], b.shape[1])

    def pad(v):
        return v if v.shape[1] == w else np.pad(v, ((0, 0), (0, w - v.shape[1])))

    return np.concatenate([pad(a), pad(b)])


def _date_token(path: str) -> Optional[str]:
    m = re.search(r"\d{4}-\d{2}-\d{2}|\d{8}", os.path.basename(path))
    return m.group(0) if m else None


def _column_to_numpy(col: pa.ChunkedArray) -> np.ndarray:
    """Zero-copy(-where-possible) arrow -> numpy (parity: the reference's
    `_to_tensor` buffer reinterpretation, dataset.py:28-100).

    - fixed-size lists: one buffer view + reshape to [N, L];
    - variable lists: vectorized offsets-based scatter into a padded [N, max]
      matrix (NO to_pylist — the round-1 ragged path went through Python
      objects, which capped the industrial data path);
    - flat columns: direct buffer view.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), arr.type.list_size)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        offsets = offsets - offsets[0]
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        maxlen = int(lens.max()) if len(lens) else 0
        out = np.zeros((len(arr), maxlen), dtype=flat.dtype if flat.size else np.int64)
        mask = np.arange(maxlen)[None, :] < lens[:, None]
        out[mask] = flat
        return out
    return arr.to_numpy(zero_copy_only=False)


class _SideTable:
    """One user-sequence side table family (daily files) with an LRU cache of
    per-day key->row lookups (parity: dataset.py:586-639)."""

    def __init__(self, info: dict, client_type: str, cache_days: int = 2):
        self.info = info
        self.name = info["name"]
        self.key = info["key"]
        self.use_cols = list(info.get("use_cols") or info["columns"])
        self.length = int(info.get("length", 50))
        self.client = get_client(client_type, info["url"])
        self.files_by_date = {}
        for f in self.client.list_files():
            tok = _date_token(f)
            if tok:
                self.files_by_date[tok] = f
        self._cache: "OrderedDict[str, tuple]" = OrderedDict()
        self.cache_days = cache_days

    def _load_day(self, token: str):
        if token in self._cache:
            self._cache.move_to_end(token)
            return self._cache[token]
        path = self.files_by_date.get(token)
        if path is None:
            raise FileNotFoundError(f"side table {self.name}: no file for date {token}")
        table = self.client.read_table(path, columns=[self.key] + self.use_cols)
        keys = _column_to_numpy(table.column(self.key))
        index = {int(k): i for i, k in enumerate(keys)}
        cols = {}
        for c in self.use_cols:
            mat = _column_to_numpy(table.column(c))
            if mat.ndim == 1:
                mat = mat[:, None]
            if mat.shape[1] < self.length:
                mat = np.pad(mat, ((0, 0), (0, self.length - mat.shape[1])))
            cols[c] = mat[:, : self.length]
        entry = (index, cols)
        self._cache[token] = entry
        while len(self._cache) > self.cache_days:
            self._cache.popitem(last=False)
        return entry

    def lookup(self, token: str, key_values: np.ndarray) -> Dict[str, np.ndarray]:
        index, cols = self._load_day(token)
        rows = np.array([index.get(int(k), -1) for k in key_values])
        missing = rows < 0
        rows = np.where(missing, 0, rows)
        out = {}
        for c, mat in cols.items():
            v = mat[rows]
            if missing.any():
                v = v.copy()
                v[missing] = 0
            out[c] = v
        return out


class ShardedDataset:
    """Iterable over fixed-size batch dicts, sharded across ranks.

    Args:
        data_args: DataArguments with `files` already split.
        batch_size: per-rank batch size (static).
        rank / world_size: this process's shard of every file.
        shuffle: shuffle row order within each file + a batch shuffle buffer.
        drop_last: drop the ragged tail (train). When False, the final batch
            is zero-padded and carries `_nvalid`.
    """

    def __init__(
        self,
        data_args: DataArguments,
        batch_size: int,
        rank: int = 0,
        world_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        shuffle_buffer_batches: int = 5,
    ):
        self.args = data_args
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shuffle_buffer_batches = shuffle_buffer_batches
        self.epoch = 0
        self._row_counts: Dict[str, int] = {}
        self.client = get_client(data_args.type, data_args.url)
        self.data_attr = data_args.to_attr()
        self.side_tables = [
            _SideTable(info, data_args.type) for info in (data_args.user_sequential_info or [])
        ]
        self.seq_key_cols = {st.name: st.key for st in self.side_tables}
        self._filters = None
        if data_args.filter_settings:
            fs = data_args.filter_settings
            self._filters = (fs["by"], process_conditions(fs["filter_conditions"]))

        self.columns = list(
            dict.fromkeys(
                (data_args.context_features or [])
                + (data_args.item_features or [])
                + (data_args.labels or [])
                + [st.key for st in self.side_tables]
            )
        )

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    # -- iteration --------------------------------------------------------

    def _emit_batches(self, cols, idx, token, rng) -> Iterator[Dict[str, np.ndarray]]:
        bs = self.batch_size
        if self.shuffle:
            rng.shuffle(idx)
        for off in range(0, len(idx), bs):
            sel = idx[off : off + bs]
            if len(sel) < bs and self.drop_last:
                break
            nvalid = len(sel)
            if len(sel) < bs:
                sel = np.concatenate([sel, np.zeros(bs - len(sel), np.int64)])
            batch: Dict[str, np.ndarray] = {c: v[sel] for c, v in cols.items()}
            for st in self.side_tables:
                batch[st.name] = st.lookup(token, batch[st.key])
            if nvalid < bs:
                batch["_nvalid"] = np.asarray(nvalid)
            yield batch

    def _stream_parquet_batches(self, path: str, start: int, end: int, token, rng):
        """Row-group-aware streaming scan (parity: reference dataset.py:172-226):
        only row groups overlapping this rank's [start, end) slice are read,
        one at a time — peak memory is O(row_group + batch), never the file.
        A pending buffer carries rows across row-group boundaries so batch
        boundaries don't depend on row-group layout; with shuffle on, rows
        shuffle within each chunk and batches through the shuffle buffer."""
        pf = self.client.parquet_file(path)
        bs = self.batch_size
        pending: Optional[Dict[str, np.ndarray]] = None
        offset = 0
        for g in range(pf.metadata.num_row_groups):
            g_rows = pf.metadata.row_group(g).num_rows
            g_start, g_end = offset, offset + g_rows
            offset = g_end
            lo, hi = max(start, g_start), min(end, g_end)
            if lo >= hi:
                continue
            table = pf.read_row_group(g, columns=self.columns)
            cols = {c: _column_to_numpy(table.column(c)) for c in self.columns}
            if lo - g_start or hi - g_end:
                cols = {c: v[lo - g_start : hi - g_start] for c, v in cols.items()}
            if pending is not None:
                cols = {c: _concat_ragged(pending[c], v) for c, v in cols.items()}
                pending = None
            n = len(next(iter(cols.values())))
            full = (n // bs) * bs
            if n - full:
                pending = {c: v[full:] for c, v in cols.items()}
                cols = {c: v[:full] for c, v in cols.items()}
            if full:
                yield from self._emit_batches(cols, np.arange(full), token, rng)
        if pending is not None and len(next(iter(pending.values()))):
            n = len(next(iter(pending.values())))
            yield from self._emit_batches(pending, np.arange(n), token, rng)

    def _file_batches(self, path: str, carry: dict) -> Iterator[Dict[str, np.ndarray]]:
        token = _date_token(path)
        # per-file shuffle stream; zlib.crc32 (not hash()) so the stream is
        # identical across processes — a preemption-resumed run on a fresh VM
        # must replay the exact same batch order (PYTHONHASHSEED salts str
        # hashes per process, which silently broke cross-process resume)
        rng = np.random.default_rng(
            self.seed + self.epoch * 1000 + zlib.crc32(path.encode()) % 100000)
        streamable = (
            self._filters is None
            and hasattr(self.client, "is_parquet")
            and self.client.is_parquet(path)
        )
        if streamable:
            n = self._row_counts.get(path)
            if n is None:
                n = self.client.row_count(path)
            start, end, carry["remain"] = calc_slice_position(
                n, self.rank, self.world_size, self.batch_size,
                drop_redundant_bs_eq_one=not self.drop_last,
                pre_total_remain=carry.get("remain", 0),
            )
            yield from self._stream_parquet_batches(
                path, max(start, 0), min(end, n), token, rng
            )
            return

        # fallback: whole-file read (filters need the data; csv/feather)
        table = self.client.read_table(path, columns=self.columns)
        cols = {c: _column_to_numpy(table.column(c)) for c in self.columns}
        n = len(table)
        if self._filters is not None:
            by, conds = self._filters
            mask = np.ones(n, bool)
            for op, val in conds:
                mask &= op(cols[by], val)
            cols = {c: v[mask] for c, v in cols.items()}
            n = int(mask.sum())
        start, end, carry["remain"] = calc_slice_position(
            n, self.rank, self.world_size, self.batch_size,
            drop_redundant_bs_eq_one=not self.drop_last, pre_total_remain=carry.get("remain", 0),
        )
        start, end = max(start, 0), min(end, n)
        yield from self._emit_batches(cols, np.arange(start, end), token, rng)

    def _prefetch_row_counts(self, files: List[str]) -> Dict[str, int]:
        """Parallel parquet-footer metadata reads for all files before
        iteration (parity: the reference's metadata threadpool +
        all_gather_object, dataset.py:540-554 — under SPMD every rank reads
        the same footers, no object gather needed)."""
        from concurrent.futures import ThreadPoolExecutor

        parquet_files = [
            f for f in files
            if hasattr(self.client, "is_parquet") and self.client.is_parquet(f)
        ]
        if not parquet_files:
            return {}
        with ThreadPoolExecutor(max_workers=min(8, len(parquet_files))) as ex:
            counts = list(ex.map(self.client.row_count, parquet_files))
        return dict(zip(parquet_files, counts))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        files = self.args.files or self.client.list_files()
        self._row_counts = self._prefetch_row_counts(files)
        carry: dict = {"remain": 0}
        buffer: List[dict] = []
        rng = np.random.default_rng(self.seed + self.epoch)
        for path in files:
            for batch in self._file_batches(path, carry):
                if self.shuffle and self.shuffle_buffer_batches > 1:
                    buffer.append(batch)
                    if len(buffer) >= self.shuffle_buffer_batches:
                        yield buffer.pop(int(rng.integers(len(buffer))))
                else:
                    yield batch
        while buffer:
            yield buffer.pop(int(rng.integers(len(buffer))))


class ItemDataset:
    """All candidate items with their features (parity: embedder dataset.py:38-83,
    plus the popularity dict used by IPS in-batch softmax)."""

    def __init__(self, data_args: DataArguments):
        if not data_args.item_info:
            raise ValueError("data config has no item_info section")
        info = data_args.item_info
        client = get_client(data_args.type, info["url"])
        files = client.list_files()
        tables = [client.read_table(f, columns=list(info["use_cols"])) for f in files]
        table = pa.concat_tables(tables)
        self.key = info["key"]
        self.columns = [c for c in info["use_cols"]]
        self.features = {c: _column_to_numpy(table.column(c)) for c in self.columns}
        self.item_ids = self.features[self.key]
        self.num_items = int(data_args.stats[data_args.item_col])

    def __len__(self):
        return len(self.item_ids)

    def iter_batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.item_ids)
        for off in range(0, n, batch_size):
            sel = slice(off, min(off + batch_size, n))
            nvalid = sel.stop - sel.start
            batch = {c: v[sel] for c, v in self.features.items()}
            if nvalid < batch_size:
                pad = batch_size - nvalid
                batch = {c: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)]) for c, v in batch.items()}
                batch["_nvalid"] = np.asarray(nvalid)
            yield batch

    def item_feature_table(self) -> Dict[str, np.ndarray]:
        """Dense id-indexed feature arrays [num_items, ...] for on-device
        negative-feature lookup (sampled ids -> features with one gather)."""
        out = {}
        ids = self.item_ids.astype(np.int64)
        for c in self.columns:
            v = self.features[c]
            dense = np.zeros((self.num_items, *v.shape[1:]), dtype=v.dtype)
            dense[ids] = v
            out[c] = dense
        return out


def compute_item_popularity(dataset: ShardedDataset, fiid: str) -> Dict[int, int]:
    """Scan the train files once and count item occurrences."""
    counts: Dict[int, int] = {}
    for path in dataset.args.files or []:
        table = dataset.client.read_table(path, columns=[fiid])
        vals, cnts = np.unique(_column_to_numpy(table.column(fiid)), return_counts=True)
        for v, c in zip(vals.tolist(), cnts.tolist()):
            counts[int(v)] = counts.get(int(v), 0) + int(c)
    return counts
