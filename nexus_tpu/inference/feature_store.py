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

import fnmatch
from typing import Dict, Iterable, List, Optional

import numpy as np


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
