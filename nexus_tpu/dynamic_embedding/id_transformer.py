"""ID transformer: unbounded global ids -> bounded cache slots with LRU
eviction (parity: torchrec_dynamic_embedding's IDTransformerGroup used at
dynamic_embedding/wrappers.py:24-306).

Two implementations with the same API:
- native C++ (nexus_tpu/csrc/id_transformer.cpp) via ctypes — built on first
  use with g++ and cached next to the source;
- pure-Python fallback (OrderedDict LRU) when no compiler is available.

`transform(ids)` returns (slots, admitted(id, slot), evicted(id, slot)); the
caller (TDEModel) spills evicted embedding rows to the parameter server and
loads admitted rows from it. id 0 is padding -> slot 0, reserved.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.dynamic_embedding")

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libid_transformer.so")
_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(_CSRC, "id_transformer.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            # per-pid temp + atomic rename: concurrent processes must never
            # CDLL a partially-linked library
            tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.idt_create.restype = ctypes.c_void_p
        lib.idt_create.argtypes = [ctypes.c_int64]
        lib.idt_destroy.argtypes = [ctypes.c_void_p]
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.idt_transform.restype = ctypes.c_int64
        lib.idt_transform.argtypes = [
            ctypes.c_void_p, i64p, ctypes.c_int64, i32p, i64p, i32p, i64p, i32p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.idt_size.restype = ctypes.c_int64
        lib.idt_size.argtypes = [ctypes.c_void_p]
        for name in ("idt_hits", "idt_misses", "idt_evictions"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.idt_dump.restype = ctypes.c_int64
        lib.idt_dump.argtypes = [ctypes.c_void_p, i64p, i32p, ctypes.c_int64]
        lib.idt_restore.argtypes = [ctypes.c_void_p, i64p, i32p, ctypes.c_int64]
        _lib = lib
        logger.info("native id_transformer loaded (%s)", _LIB_PATH)
    except Exception as e:
        logger.warning("native id_transformer unavailable (%s); using python fallback", e)
        _lib = None
    return _lib


class _PyTransformer:
    """Pure-Python LRU fallback with the same semantics as the C++ core."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.lru: "OrderedDict[int, int]" = OrderedDict()  # id -> slot, MRU last
        self.free_slots: List[int] = []
        self.next_slot = 1  # slot 0 reserved for padding
        self.hits = self.misses = self.evictions = 0

    def transform(self, ids: np.ndarray):
        slots = np.zeros(len(ids), np.int32)
        admitted, evicted = [], []
        for i, raw in enumerate(ids):
            gid = int(raw)
            if gid == 0:
                continue
            if gid in self.lru:
                self.lru.move_to_end(gid)
                slots[i] = self.lru[gid]
                self.hits += 1
                continue
            self.misses += 1
            if self.free_slots:
                s = self.free_slots.pop()
            elif self.next_slot < self.capacity:
                s = self.next_slot
                self.next_slot += 1
            else:
                old_id, s = self.lru.popitem(last=False)
                evicted.append((old_id, s))
                self.evictions += 1
            self.lru[gid] = s
            slots[i] = s
            admitted.append((gid, s))
        return slots, admitted, evicted

    def dump(self):
        return [(gid, s) for gid, s in self.lru.items()]

    def restore(self, pairs):
        for gid, s in pairs:
            self.lru[int(gid)] = int(s)
            self.next_slot = max(self.next_slot, int(s) + 1)

    @property
    def size(self):
        return len(self.lru)


class IDTransformer:
    """One feature's id->slot transformer (native when possible)."""

    def __init__(self, capacity: int, use_native: bool = True):
        self.capacity = capacity
        lib = _load_native() if use_native else None
        if lib is not None:
            self._lib = lib
            self._handle = ctypes.c_void_p(lib.idt_create(capacity))
            self._py = None
        else:
            self._lib = None
            self._py = _PyTransformer(capacity)

    @property
    def is_native(self) -> bool:
        return self._py is None

    def transform(self, ids: np.ndarray) -> Tuple[np.ndarray, list, list]:
        """ids (any shape int) -> (slots same shape int32, admitted, evicted)."""
        shape = np.shape(ids)
        flat = np.ascontiguousarray(np.asarray(ids, np.int64).reshape(-1))
        n = flat.shape[0]
        if self._py is not None:
            slots, admitted, evicted = self._py.transform(flat)
            return slots.reshape(shape), admitted, evicted
        slots = np.zeros(n, np.int32)
        adm_ids = np.zeros(n, np.int64)
        adm_slots = np.zeros(n, np.int32)
        ev_ids = np.zeros(n, np.int64)
        ev_slots = np.zeros(n, np.int32)
        n_ev = ctypes.c_int64(0)
        n_adm = self._lib.idt_transform(
            self._handle, flat, n, slots, adm_ids, adm_slots, ev_ids, ev_slots,
            ctypes.byref(n_ev),
        )
        admitted = list(zip(adm_ids[:n_adm].tolist(), adm_slots[:n_adm].tolist()))
        evicted = list(zip(ev_ids[: n_ev.value].tolist(), ev_slots[: n_ev.value].tolist()))
        return slots.reshape(shape), admitted, evicted

    def dump(self) -> List[Tuple[int, int]]:
        if self._py is not None:
            return self._py.dump()
        ids = np.zeros(self.capacity, np.int64)
        slots = np.zeros(self.capacity, np.int32)
        n = self._lib.idt_dump(self._handle, ids, slots, self.capacity)
        return list(zip(ids[:n].tolist(), slots[:n].tolist()))

    def restore(self, pairs) -> None:
        if self._py is not None:
            self._py.restore(pairs)
            return
        if not pairs:
            return
        ids = np.ascontiguousarray([p[0] for p in pairs], np.int64)
        slots = np.ascontiguousarray([p[1] for p in pairs], np.int32)
        self._lib.idt_restore(self._handle, ids, slots, len(pairs))

    @property
    def stats(self) -> Dict[str, int]:
        if self._py is not None:
            p = self._py
            return {"size": p.size, "hits": p.hits, "misses": p.misses, "evictions": p.evictions}
        return {
            "size": self._lib.idt_size(self._handle),
            "hits": self._lib.idt_hits(self._handle),
            "misses": self._lib.idt_misses(self._handle),
            "evictions": self._lib.idt_evictions(self._handle),
        }

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_handle", None):
            try:
                self._lib.idt_destroy(self._handle)
            except Exception:
                pass


class IDTransformerGroup:
    """Per-feature transformers (parity: IDTransformerGroup)."""

    def __init__(self, capacities: Dict[str, int], use_native: bool = True):
        self.transformers = {
            feat: IDTransformer(cap, use_native=use_native) for feat, cap in capacities.items()
        }

    def __getitem__(self, feat: str) -> IDTransformer:
        return self.transformers[feat]

    def __contains__(self, feat):
        return feat in self.transformers

    def transform_batch(self, batch: dict, parallel: bool = True) -> Tuple[dict, Dict[str, tuple]]:
        """Transform every configured feature in a (possibly nested) batch.
        Returns (new_batch, {feat: (admitted, evicted)}).

        With ``parallel`` (default) features shard across a thread pool —
        the native transform releases the GIL for the whole ctypes call, so
        distinct features' LRU updates genuinely overlap (each feature's own
        leaves stay serialized on one thread: a transformer is not
        thread-safe against itself)."""
        # collect (path, array) leaves per feature
        per_feat: Dict[str, list] = {}
        skeleton: dict = {}

        def collect(d, path):
            out = {}
            for k, v in d.items():
                if isinstance(v, dict):
                    out[k] = collect(v, path + (k,))
                elif k in self.transformers:
                    per_feat.setdefault(k, []).append((path + (k,), v))
                    out[k] = None  # filled in below
                else:
                    out[k] = v
            return out

        skeleton = collect(batch, ())

        def run_feat(feat):
            tr = self.transformers[feat]
            admitted, evicted, results = [], [], []
            for path, v in per_feat[feat]:
                slots, a, e = tr.transform(np.asarray(v))
                results.append((path, slots.astype(np.int64)))
                admitted += a
                evicted += e
            return feat, results, (admitted, evicted)

        if parallel and len(per_feat) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(per_feat))) as ex:
                outputs = list(ex.map(run_feat, per_feat))
        else:
            outputs = [run_feat(f) for f in per_feat]

        events: Dict[str, tuple] = {}
        for feat, results, ev in outputs:
            events[feat] = ev
            for path, slots in results:
                d = skeleton
                for k in path[:-1]:
                    d = d[k]
                d[path[-1]] = slots
        return skeleton, events

    @property
    def stats(self):
        return {f: t.stats for f, t in self.transformers.items()}
