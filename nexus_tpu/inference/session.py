"""Inference sessions — the ONNX/TensorRT replacement.

The reference dispatches between torch / onnxruntime / TensorRT sessions by
`infer_mode` (Nexus/abc/inference/inference_engine.py:57-65), each exposing
`run(output_names, input_feed)`. Here all modes are XLA:

- NormalSession: jit-compiled callable (compile-on-first-shape).
- AOTSession: ahead-of-time lowered+compiled executables for a FIXED set of
  bucketed shapes (the TensorRT-optimization-profile equivalent). Inputs are
  padded up to the nearest bucket; no compile at serve time.
- export/import via jax.export (serialized StableHLO) — the ONNX-file
  equivalent: `AOTSession.serialize()` / `AOTSession.deserialize()`.

`infer_mode` strings keep reference parity: 'normal' -> NormalSession,
'onnx'/'tensorrt'/'aot' -> AOTSession.
"""

from __future__ import annotations

import pickle
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def pad_to_bucket(x: np.ndarray, bucket: Tuple[int, ...]) -> np.ndarray:
    pads = [(0, b - s) for s, b in zip(x.shape, bucket)]
    if all(p == (0, 0) for p in pads):
        return x
    return np.pad(x, pads)


def pick_bucket(shape: Tuple[int, ...], buckets: Sequence[Tuple[int, ...]]) -> Tuple[int, ...]:
    """Smallest bucket that fits `shape` (elementwise)."""
    candidates = [b for b in buckets if all(s <= bs for s, bs in zip(shape, b))]
    if not candidates:
        raise ValueError(f"no bucket fits shape {shape}; buckets={list(buckets)}")
    return min(candidates, key=lambda b: int(np.prod(b)))


class InferenceSession:
    """ORT-like session interface: run(output_names, input_feed)."""

    def run(self, output_names, input_feed: Dict[str, np.ndarray]):
        raise NotImplementedError


class NormalSession(InferenceSession):
    """jit wrapper (parity: the duck-typed NormalSession,
    inference/embedder/text_retrieval/base.py:392-432).

    `bound` is a pytree (model params) passed as the first RUNTIME argument
    each call — never closed over, so large weights are not baked into the
    program as XLA constants (which stalls compilation for 100M+ params).
    """

    def __init__(self, fn: Callable, input_names: Sequence[str], bound=None):
        self.fn = jax.jit(fn)
        self.input_names = list(input_names)
        self.bound = bound

    def run(self, output_names, input_feed: Dict[str, np.ndarray]):
        args = [input_feed[k] for k in self.input_names]
        if self.bound is not None:
            out = self.fn(self.bound, *args)
        else:
            out = self.fn(*args)
        if not isinstance(out, (tuple, list)):
            out = (out,)
        return [np.asarray(o) for o in out]


class AOTSession(InferenceSession):
    """Bucketed-shape AOT-compiled executables.

    Each bucket is a tuple of full input shapes; call-time inputs are padded
    to the nearest bucket and the matching precompiled executable runs with
    zero retracing. `n_valid` rows are sliced back out.
    """

    def __init__(
        self,
        fn: Callable,
        input_names: Sequence[str],
        buckets: Sequence[Dict[str, Tuple[int, ...]]],
        dtypes: Optional[Dict[str, np.dtype]] = None,
        bound=None,
    ):
        self.fn = fn
        self.input_names = list(input_names)
        self.buckets = list(buckets)
        self.dtypes = dtypes or {}
        self.bound = bound
        self._compiled: Dict[tuple, jax.stages.Compiled] = {}
        for bucket in self.buckets:
            self._compile(bucket)

    def _bucket_key(self, bucket: Dict[str, Tuple[int, ...]]) -> tuple:
        return tuple(tuple(bucket[k]) for k in self.input_names)

    def _compile(self, bucket: Dict[str, Tuple[int, ...]]):
        args = [
            jax.ShapeDtypeStruct(bucket[k], self.dtypes.get(k, np.int32))
            for k in self.input_names
        ]
        if self.bound is not None:
            bound_spec = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), self.bound
            )
            lowered = jax.jit(self.fn).lower(bound_spec, *args)
        else:
            lowered = jax.jit(self.fn).lower(*args)
        self._compiled[self._bucket_key(bucket)] = lowered.compile()

    def pick(self, input_feed: Dict[str, np.ndarray]) -> Dict[str, Tuple[int, ...]]:
        best = None
        for bucket in self.buckets:
            if all(
                all(s <= bs for s, bs in zip(np.asarray(input_feed[k]).shape, bucket[k]))
                for k in self.input_names
            ):
                size = sum(int(np.prod(bucket[k])) for k in self.input_names)
                if best is None or size < best[0]:
                    best = (size, bucket)
        if best is None:
            raise ValueError(
                f"no bucket fits shapes { {k: np.asarray(v).shape for k, v in input_feed.items()} }"
            )
        return best[1]

    def run(self, output_names, input_feed: Dict[str, np.ndarray]):
        bucket = self.pick(input_feed)
        n_valid = np.asarray(input_feed[self.input_names[0]]).shape[0]
        args = [
            pad_to_bucket(np.asarray(input_feed[k]), bucket[k]).astype(
                self.dtypes.get(k, np.int32), copy=False
            )
            for k in self.input_names
        ]
        if self.bound is not None:
            args = [self.bound] + args
        out = self._compiled[self._bucket_key(bucket)](*args)
        if not isinstance(out, (tuple, list)):
            out = (out,)
        return [np.asarray(o)[:n_valid] for o in out]

    # -- serialized StableHLO (the ONNX-file equivalent) -------------------

    def serialize(self) -> bytes:
        """Weights (the bound pytree) are embedded in the artifact, exactly
        like an ONNX file embeds its initializers."""
        from jax import export as jexport

        blobs = {}
        for bucket in self.buckets:
            args = [
                jax.ShapeDtypeStruct(bucket[k], self.dtypes.get(k, np.int32))
                for k in self.input_names
            ]
            if self.bound is not None:
                bound_spec = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), self.bound
                )
                exported = jexport.export(jax.jit(self.fn))(bound_spec, *args)
            else:
                exported = jexport.export(jax.jit(self.fn))(*args)
            blobs[self._bucket_key(bucket)] = exported.serialize()
        bound_host = (
            jax.tree_util.tree_map(lambda x: np.asarray(x), self.bound)
            if self.bound is not None
            else None
        )
        return pickle.dumps(
            {
                "input_names": self.input_names,
                "buckets": self.buckets,
                "dtypes": self.dtypes,
                "blobs": blobs,
                "bound": bound_host,
            }
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "AOTSession":
        from jax import export as jexport

        meta = pickle.loads(data)
        obj = cls.__new__(cls)
        obj.input_names = meta["input_names"]
        obj.buckets = meta["buckets"]
        obj.dtypes = meta["dtypes"]
        obj.bound = meta.get("bound")
        obj._compiled = {}
        for key, blob in meta["blobs"].items():
            exported = jexport.deserialize(blob)
            obj._compiled[key] = jax.jit(exported.call)
        obj.fn = None
        return obj


def get_inference_session(
    fn: Callable,
    input_names: Sequence[str],
    infer_mode: str = "normal",
    buckets: Optional[Sequence[Dict[str, Tuple[int, ...]]]] = None,
    dtypes=None,
    bound=None,
) -> InferenceSession:
    """Session dispatch (parity: abc/inference/inference_engine.py:57-65).
    'onnx' and 'tensorrt' map to the AOT path on TPU."""
    if infer_mode in (None, "normal"):
        return NormalSession(fn, input_names, bound=bound)
    if infer_mode in ("onnx", "tensorrt", "trt", "aot"):
        if not buckets:
            raise ValueError("AOT session needs shape buckets")
        return AOTSession(fn, input_names, buckets, dtypes, bound=bound)
    raise ValueError(f"unknown infer_mode {infer_mode!r}")
