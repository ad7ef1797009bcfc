"""Online feature store — the Redis + protobuf feature-cache path
(parity: Nexus/inference/embedder/recommendation/base.py:84-130, 448-507 and
examples/recommendation/inference/feature_insert/).

Design: a `KVStore` interface with two backends —
- `MemoryKVStore`: in-process dict (tests, single-node serving, benchmarks);
- `RedisKVStore`: real Redis when the `redis` package + server exist.

Values are serialized feature protos (see `FeatureCodec`). Since protobuf
codegen for arbitrary schemas is an offline step, `FeatureCodec` uses the
self-describing `google.protobuf.Struct` wire format by default (same
serialized-proto-in-KV architecture, schema-flexible); fixed schemas can
plug in generated message classes via `register_message`.

The serving engines hydrate features with ONE mget round-trip per batch and
assemble fixed-shape numpy arrays for the device — the host side of the
feature path stays off the TPU critical path.
"""

from __future__ import annotations

import ctypes
import fnmatch
import os
import subprocess
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libfeature_codec.so")
_lib = None
_lib_tried = False


def _load_native():
    """Build (once, g++) + load the native Struct batch decoder; None when no
    compiler is available (callers fall back to the Python path)."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(_CSRC, "feature_codec.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            # per-pid temp + atomic rename: concurrent processes (multi-host
            # bring-up) must never CDLL a partially-linked library
            tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fc_schema_create.restype = ctypes.c_void_p
        lib.fc_schema_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
        ]
        lib.fc_schema_destroy.argtypes = [ctypes.c_void_p]
        lib.fc_decode_batch.restype = ctypes.c_int32
        lib.fc_decode_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class StructBatchDecoder:
    """Batch-decode serialized google.protobuf.Struct feature rows straight
    into fixed-shape int64 columns via the native codec
    (nexus_tpu/csrc/feature_codec.cpp — the reference's C++ protobuf-codegen
    role in its serving hot path, base.py:448-507). Falls back to the Python
    proto path when no compiler exists.

    schema: [(field_name, width)] — width 1 yields a [B] column, width L a
    zero-padded [B, L] column. Returns (columns, lengths) dicts.
    """

    def __init__(self, schema: Sequence[Tuple[str, int]]):
        self.schema = [(str(n), int(w)) for n, w in schema]
        names = [n for n, _ in self.schema]
        if len(set(names)) != len(names):  # dup names would collapse the
            # cols dict and leave NULL output pointers for the native call
            dups = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate schema field names: {dups}")
        self._lib = _load_native()
        self._handle = None
        if self._lib is not None:
            names = (ctypes.c_char_p * len(self.schema))(
                *[n.encode() for n, _ in self.schema]
            )
            widths = np.asarray([w for _, w in self.schema], np.int32)
            self._handle = self._lib.fc_schema_create(names, widths, len(self.schema))

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.fc_schema_destroy(self._handle)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def decode_batch(self, blobs: List[Optional[bytes]]):
        n = len(blobs)
        cols = {name: np.zeros((n, w) if w > 1 else (n,), np.int64)
                for name, w in self.schema}
        lens = {name: np.zeros((n,), np.int32) for name, _ in self.schema}
        if not n:
            return cols, lens
        if self.native:
            safe = [b or b"" for b in blobs]
            offsets = np.zeros((n + 1,), np.int64)
            offsets[1:] = np.cumsum([len(b) for b in safe])
            data = np.frombuffer(b"".join(safe), np.uint8) if offsets[-1] else np.zeros(
                (1,), np.uint8
            )
            out_ptrs = (ctypes.c_void_p * len(self.schema))(
                *[c.ctypes.data_as(ctypes.c_void_p).value for c in cols.values()]
            )
            all_lens = np.zeros((len(self.schema), n), np.int32)
            self._lib.fc_decode_batch(
                self._handle, np.ascontiguousarray(data), offsets, n, out_ptrs, all_lens
            )
            for i, (name, _) in enumerate(self.schema):
                lens[name] = all_lens[i]
            return cols, lens
        # Python fallback: per-row proto decode
        codec = FeatureCodec()
        for i, blob in enumerate(blobs):
            row = codec.decode(blob) if blob else {}
            for name, w in self.schema:
                v = row.get(name)
                if v is None:
                    continue
                vals = ([int(x) for x in v[:w]] if isinstance(v, (list, tuple))
                        else [int(v)])
                if w > 1:
                    cols[name][i, : len(vals)] = vals
                elif vals:
                    cols[name][i] = vals[0]
                lens[name][i] = len(vals)
        return cols, lens


class KVStore:
    def get(self, key: str) -> Optional[bytes]:
        raise NotImplementedError

    def mget(self, keys: List[str]) -> List[Optional[bytes]]:
        return [self.get(k) for k in keys]

    def set(self, key: str, value) -> None:
        raise NotImplementedError

    def mset(self, items: Dict[str, bytes]) -> None:
        for k, v in items.items():
            self.set(k, v)

    def keys(self, pattern: str = "*") -> List[str]:
        raise NotImplementedError


class MemoryKVStore(KVStore):
    """In-process KV store with a Redis-like surface."""

    def __init__(self):
        self._data: Dict[str, bytes] = {}

    def get(self, key):
        return self._data.get(key)

    def set(self, key, value):
        if isinstance(value, str):
            value = value.encode()
        self._data[key] = value

    def keys(self, pattern: str = "*"):
        return [k for k in self._data if fnmatch.fnmatch(k, pattern)]

    def __len__(self):
        return len(self._data)

    # redis-less persistence: offline TDE benchmarks/evals hand the trained
    # parameter-server contents to a later process through a file (the role
    # redis plays in the reference deployment)
    def save(self, path: str) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self._data, f)

    @classmethod
    def load(cls, path: str) -> "MemoryKVStore":
        import pickle

        store = cls()
        with open(path, "rb") as f:
            store._data = pickle.load(f)
        return store


class RedisKVStore(KVStore):
    def __init__(self, host="localhost", port=6379, db=0, url: Optional[str] = None):
        import redis  # optional dependency

        self.client = redis.from_url(url) if url else redis.Redis(host=host, port=port, db=db)

    def get(self, key):
        return self.client.get(key)

    def mget(self, keys):
        return self.client.mget(keys)

    def set(self, key, value):
        self.client.set(key, value)

    def keys(self, pattern="*"):
        return [k.decode() for k in self.client.keys(pattern)]


def get_kv_store(config: Optional[dict] = None) -> KVStore:
    config = config or {}
    backend = config.get("backend", "memory")
    if backend == "redis":
        return RedisKVStore(
            host=config.get("host", "localhost"),
            port=int(config.get("port", 6379)),
            db=int(config.get("db", 0)),
            url=config.get("url"),
        )
    return MemoryKVStore()


class FeatureCodec:
    """Serialize/deserialize feature dicts as protobuf
    (the recflow_pb2 role). Default wire format: google.protobuf.Struct."""

    def __init__(self, message_cls=None, fields: Optional[List[str]] = None):
        self.message_cls = message_cls
        self.fields = fields

    def encode(self, features: Dict) -> bytes:
        if self.message_cls is not None:
            msg = self.message_cls()
            for k, v in features.items():
                if isinstance(v, (list, tuple, np.ndarray)):
                    getattr(msg, k).extend(int(x) for x in np.asarray(v).reshape(-1))
                else:
                    setattr(msg, k, int(v) if isinstance(v, (np.integer, int)) else v)
            return msg.SerializeToString()
        from google.protobuf import struct_pb2

        s = struct_pb2.Struct()
        clean = {}
        for k, v in features.items():
            if isinstance(v, np.ndarray):
                clean[k] = v.tolist()
            elif isinstance(v, (np.integer,)):
                clean[k] = int(v)
            elif isinstance(v, (np.floating,)):
                clean[k] = float(v)
            else:
                clean[k] = v
        s.update(clean)
        return s.SerializeToString()

    def decode(self, data: bytes) -> Dict:
        if data is None:
            return {}
        if self.message_cls is not None:
            msg = self.message_cls()
            msg.ParseFromString(data)
            out = {}
            for field in msg.DESCRIPTOR.fields:
                value = getattr(msg, field.name)
                out[field.name] = list(value) if field.label == field.LABEL_REPEATED else value
            return out
        from google.protobuf import struct_pb2
        from google.protobuf.json_format import MessageToDict

        s = struct_pb2.Struct()
        s.ParseFromString(data)
        return MessageToDict(s)


class FeatureCache:
    """Keyed feature hydration over a KVStore (key templates per feature
    group, parity: the feature-cache YAML semantics of the reference)."""

    def __init__(self, kv: KVStore, codec: Optional[FeatureCodec] = None):
        self.kv = kv
        self.codec = codec or FeatureCodec()

    def insert_rows(self, key_template: str, key_col: str, rows: Iterable[Dict]) -> int:
        n = 0
        for row in rows:
            self.kv.set(key_template.format(row[key_col]), self.codec.encode(row))
            n += 1
        return n

    def fetch(self, key_template: str, key_values: Iterable) -> List[Dict]:
        keys = [key_template.format(v) for v in key_values]
        blobs = self.kv.mget(keys)
        return [self.codec.decode(b) for b in blobs]
