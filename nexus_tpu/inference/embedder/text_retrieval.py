"""Text embedder inference (parity: Nexus/inference/embedder/text_retrieval/
base.py:24-801).

`TextEmbedder` mirrors BaseEmbedder's user API — encode_queries /
encode_corpus / encode with instruction formatting and length-sorted
batching — re-designed for static shapes: sequences are length-sorted, then
packed into (batch, seq) BUCKETS and run through either a jit session or AOT
precompiled executables (the TensorRT-profile equivalent).

The reference's OOM-adaptive batch shrinking (base.py:299-320) is replaced by
deterministic bucketing: TPU memory use is known at compile time.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.inference.session import AOTSession, NormalSession, get_inference_session
from nexus_tpu.models.bert import pool_hidden_states
from nexus_tpu.utils.buckets import batch_bucket, pad_rows
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.inference.text_embedder")

DEFAULT_SEQ_BUCKETS = (32, 64, 128, 256, 512)


def _override_attention_impl(model, impl: str) -> None:
    """Serve-time attention-path override: flips attention_impl on whichever
    net config the wrapped model carries (BertConfig / LlamaConfig, or a VLM
    backbone's text trunk AND vision tower). The session re-lowers on the
    next compile, so the checkpoint stays untouched and the megakernel
    ('fused') / flash ('pallas') paths can be enabled without editing
    config.json."""
    vlm = getattr(model, "vlm_config", None)
    candidates = [getattr(model, a, None) for a in ("bert_config", "llama_config")]
    candidates.append(getattr(vlm, "text", None))
    candidates.append(getattr(vlm, "vision", None))
    candidates.append(getattr(model, "vit_config", None))
    for cfg in candidates:
        if cfg is not None and hasattr(cfg, "attention_impl"):
            cfg.attention_impl = impl


class TextEmbedder:
    """Encode text into embeddings with a BiTextEmbedderModel checkpoint."""

    def __init__(
        self,
        model_name_or_path: str = None,
        model=None,
        tokenizer=None,
        normalize_embeddings: bool = True,
        query_instruction_for_retrieval: Optional[str] = None,
        query_instruction_format: str = "{}{}",
        batch_size: int = 256,
        max_length: int = 512,
        seq_buckets: Sequence[int] = DEFAULT_SEQ_BUCKETS,
        infer_mode: str = "normal",
        mesh=None,
        packing: bool = False,
        output_dtype: str = "float32",
        attention_impl: Optional[str] = None,
        quantized: bool = False,
    ):
        """``mesh``: shard encode batches across the mesh's data axis — the
        multi-chip replacement for the reference's per-GPU process pool
        (abc/inference/embedder/AbsEmbedder.py:120-245); one compiled program,
        XLA splits the batch over chips.

        ``attention_impl``: override the checkpoint's attention path —
        'fused' (megakernel, fastest encode) | 'pallas' (flash) | 'xla';
        None keeps what the checkpoint's config recorded.

        ``quantized``: int8 W8A8 encode (BERT-family checkpoints): kernels
        convert to per-channel int8 at load, activations quantize per token
        inline, GEMMs run int8 on the MXU at 2x bf16 peak (embedding cosine
        vs the fp path > 0.999; models/quantize.py)."""
        from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel

        if model is None:
            model = BiTextEmbedderModel.from_pretrained(model_name_or_path)
        if attention_impl is not None:
            _override_attention_impl(model, attention_impl)
        if quantized:
            from nexus_tpu.models.quantize import quantize_model

            quantize_model(model)
        self.mesh = mesh
        self.model = model
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.tokenizer = tokenizer
        self.normalize = normalize_embeddings
        self.query_instruction = query_instruction_for_retrieval
        self.query_instruction_format = query_instruction_format
        self.batch_size = batch_size
        self.max_length = max_length
        self.seq_buckets = tuple(b for b in seq_buckets if b <= max_length) or (max_length,)
        self.infer_mode = infer_mode
        self.packing = packing
        # 'float16' halves the device->host result transfer; normalized
        # embeddings carry |x|<=1 so fp16's 2^-11 relative step costs ~5e-4
        # per component — negligible for retrieval, opt-in for serving hosts
        # where readback bandwidth bounds the pipeline
        self.output_dtype = output_dtype
        self.session = self._build_session()
        self._packed_encode = None
        # serializes the host-side mutable state under multi-worker serving
        # (MicroBatcher workers=2): HF fast tokenizers raise 'Already
        # borrowed' on concurrent __call__ with padding/truncation kwargs,
        # and concurrent lazy-cache population would duplicate 40s+ remote
        # compiles. Device calls stay OUTSIDE the lock — worker A tokenizes
        # while worker B's device call runs, which is the whole point of the
        # pipelined batcher.
        self._host_lock = threading.Lock()

    # -- session -----------------------------------------------------------

    def _encode_fn(self, variables, input_ids, attention_mask):
        out = self.model.net.apply(variables, input_ids, attention_mask=attention_mask)
        reps = pool_hidden_states(
            out["last_hidden_state"].astype(jnp.float32),
            attention_mask,
            self.model.args.sentence_pooling_method,
        )
        if self.normalize:
            reps = reps / jnp.clip(jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12, None)
        return reps.astype(jnp.dtype(self.output_dtype))

    def _build_session(self):
        names = ["input_ids", "attention_mask"]
        bound = self.model.variables
        if self.mesh is not None:
            # multi-chip encode: params replicated, token batch sharded on
            # the data axis; XLA compiles ONE program over all chips
            import jax
            from nexus_tpu.parallel.mesh import data_parallel_shardings

            batch_sh, rep_sh = data_parallel_shardings(self.mesh)
            session = NormalSession(self._encode_fn, names, bound=jax.device_put(bound, rep_sh))
            session.fn = jax.jit(
                self._encode_fn, in_shardings=(rep_sh, batch_sh, batch_sh),
                out_shardings=rep_sh,
            )
            return session
        if self.infer_mode == "normal":
            return NormalSession(self._encode_fn, names, bound=bound)
        buckets = [
            {"input_ids": (self.batch_size, L), "attention_mask": (self.batch_size, L)}
            for L in self.seq_buckets
        ]
        return get_inference_session(
            self._encode_fn, names, infer_mode=self.infer_mode, buckets=buckets, bound=bound
        )

    # -- public API ---------------------------------------------------------

    def encode_queries(self, queries: Union[str, List[str]], **kw) -> np.ndarray:
        if self.query_instruction:
            if isinstance(queries, str):
                queries = self.query_instruction_format.format(self.query_instruction, queries)
            else:
                queries = [
                    self.query_instruction_format.format(self.query_instruction, q)
                    for q in queries
                ]
        return self.encode(queries, **kw)

    def encode_corpus(self, corpus: Union[str, List[str]], **kw) -> np.ndarray:
        return self.encode(corpus, **kw)

    def encode_info(self, texts, **kw) -> np.ndarray:
        return self.encode(texts, **kw)

    def encode(self, sentences: Union[str, List[str]], batch_size: Optional[int] = None) -> np.ndarray:
        single = isinstance(sentences, str)
        if single:
            sentences = [sentences]
        batch_size = batch_size or self.batch_size
        if (self.packing and self.mesh is None and self.infer_mode == "normal"
                and self.model.args.sentence_pooling_method in (
                    "cls", "mean", "last_token")):
            # packed encode dispatches its own jitted program; under AOT
            # (onnx/tensorrt-parity) modes the bucketed session IS the
            # contract, so packing falls back to it rather than silently
            # serving a different program than convert_to_serialized exports
            reps = self._encode_packed(sentences, batch_size)
            return reps[0] if single else reps

        # length-sorted batching (reference base.py:291-297) so each batch
        # lands in the tightest sequence bucket
        lengths = [len(s) for s in sentences]
        order = np.argsort(lengths)[::-1]
        sorted_sentences = [sentences[i] for i in order]

        all_reps = np.empty((len(sentences), 0))
        chunks: List[np.ndarray] = []
        for off in range(0, len(sorted_sentences), batch_size):
            chunk = sorted_sentences[off : off + batch_size]
            with self._host_lock:
                enc = self.tokenizer(
                    chunk, padding=True, truncation=True, max_length=self.max_length,
                    return_tensors="np",
                )
            ids, mask = enc["input_ids"], enc["attention_mask"]
            L = ids.shape[1]
            bucket_len = next((b for b in self.seq_buckets if b >= L), self.max_length)
            if bucket_len > L:
                ids = np.pad(ids, ((0, 0), (0, bucket_len - L)))
                mask = np.pad(mask, ((0, 0), (0, bucket_len - L)))
            # batch-size bucket: dynamic micro-batched serving produces
            # arbitrary chunk sizes; one compiled program per pow-2 bucket,
            # not per size (utils/buckets.py — the concurrent-serving fix)
            row_target = batch_bucket(len(ids), cap=batch_size)
            ids, mask = pad_rows(ids, row_target), pad_rows(mask, row_target)
            if self.mesh is not None:
                from nexus_tpu.parallel.mesh import DATA_AXIS

                n_dev = self.mesh.shape[DATA_AXIS]
                n_pad_rows = (-len(ids)) % n_dev
                if n_pad_rows:
                    ids = np.pad(ids, ((0, n_pad_rows), (0, 0)))
                    mask = np.pad(mask, ((0, n_pad_rows), (0, 0)))
            reps = self.session.run(
                None, {"input_ids": ids.astype(np.int32), "attention_mask": mask.astype(np.int32)}
            )[0]
            chunks.append(np.asarray(reps[: len(chunk)]))
        sorted_reps = np.concatenate(chunks, axis=0)
        # restore original order
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        reps = sorted_reps[inv]
        return reps[0] if single else reps

    # -- packed encode -------------------------------------------------------

    def _build_packed_encode(self):
        method = self.model.args.sentence_pooling_method
        normalize = self.normalize
        out_dtype = jnp.dtype(self.output_dtype)
        net = self.model.net
        from functools import partial

        from nexus_tpu.ops.packing import pool_packed_cls, pool_packed_mean

        # decoder embedders (BiDecoderOnlyEmbedderModel) take LlamaModel
        # kwargs (positions/segment_ids, causal-within-segment attention);
        # encoders take BERT kwargs. Pooling follows the configured method
        # regardless of family (last_token = each segment's final slot).
        is_decoder = getattr(self.model, "llama_config", None) is not None

        @partial(jax.jit, static_argnums=(7,))
        def packed_encode(variables, ids, seg, pos, pool_rows, pool_cols,
                          token_seq, n_seq, lengths):
            if is_decoder:
                out = net.apply(variables, ids, positions=pos, segment_ids=seg)
            else:
                out = net.apply(variables, ids, position_ids=pos, segment_ids=seg)
            hidden = out["last_hidden_state"].astype(jnp.float32)
            if method == "cls":
                reps = pool_packed_cls(hidden, pool_rows, pool_cols)
            elif method == "last_token":
                last_cols = pool_cols + jnp.maximum(lengths, 1) - 1
                reps = hidden[pool_rows, last_cols]
            else:
                reps = pool_packed_mean(hidden, token_seq, lengths, n_seq)
            if normalize:
                reps = reps / jnp.clip(jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12, None)
            return reps.astype(out_dtype)

        return packed_encode

    def _dispatch_packed(self, sentences: List[str], batch_size: int):
        """Host work (tokenize + pack) + ASYNC device dispatch for every
        chunk; returns futures without fetching — the streaming overlap
        primitive."""
        from nexus_tpu.ops.packing import pack_sequences

        if self._packed_encode is None:
            with self._host_lock:  # one worker installs the jitted program
                if self._packed_encode is None:
                    self._packed_encode = self._build_packed_encode()
        with self._host_lock:
            enc = self.tokenizer(
                list(sentences), truncation=True, max_length=self.max_length,
                padding=False,
            )["input_ids"]
        futures = []  # (offset, n_valid, device reps — not yet fetched)
        for off in range(0, len(enc), batch_size):
            chunk = enc[off : off + batch_size]
            longest = max(len(s) for s in chunk)
            row_len = next((b for b in self.seq_buckets if b >= longest), self.max_length)
            packed = pack_sequences([np.asarray(s, np.int32) for s in chunk], row_len)
            # row bucketing, two regimes: small packs (dynamic micro-batched
            # serving — arbitrary sizes) round up to a power of two so the
            # program count stays log2 instead of one-per-size (remote
            # compile storms measured at 6-12 s p50, utils/buckets.py);
            # large packs (offline encode — stationary length mixes) keep
            # the tighter multiple-of-8 rounding
            if packed.n_rows <= 128:
                from nexus_tpu.utils.buckets import batch_bucket

                packed = packed.pad_rows(max(8, batch_bucket(packed.n_rows)))
            else:
                packed = packed.pad_rows(-(-packed.n_rows // 8) * 8)
            n = packed.n_sequences
            pad_n = batch_size - n  # static [batch_size] pooling slots
            pool_rows = np.pad(packed.pool_rows, (0, pad_n))
            pool_cols = np.pad(packed.pool_cols, (0, pad_n))
            lengths = np.pad(packed.lengths, (0, pad_n), constant_values=1)
            token_seq = np.where(packed.token_seq >= n, batch_size, packed.token_seq)
            reps = self._packed_encode(
                self.model.variables,
                jnp.asarray(packed.input_ids), jnp.asarray(packed.segment_ids),
                jnp.asarray(packed.position_ids), jnp.asarray(pool_rows),
                jnp.asarray(pool_cols), jnp.asarray(token_seq), batch_size,
                jnp.asarray(lengths),
            )
            futures.append((off, n, reps))
        return len(sentences), futures

    @staticmethod
    def _finish_packed(total: int, futures) -> np.ndarray:
        out = None
        for off, n, reps in futures:
            reps = np.asarray(reps)[:n]  # host fetch = the blocking point
            if out is None:
                out = np.empty((total, reps.shape[-1]), reps.dtype)
            out[off : off + n] = reps
        if out is None:  # empty input: an empty [0, d]-shaped result, not None
            return np.empty((0, 0), np.float32)
        return out

    def _encode_packed(self, sentences: List[str], batch_size: int) -> np.ndarray:
        """Pack tokenized sentences into dense fixed-length rows (no padding
        to the bucket edge for short text — the MXU sees >95% real tokens).
        Embeddings match the unpacked path exactly (same-segment attention,
        restarting positions); tests assert the parity."""
        return self._finish_packed(*self._dispatch_packed(sentences, batch_size))

    # -- streaming encode ----------------------------------------------------

    def _dispatch_dense(self, sentences: List[str], batch_size: int):
        """Length-sorted tokenize + async jit dispatch, no fetch (normal-jit
        sessions only)."""
        lengths = [len(s) for s in sentences]
        order = np.argsort(lengths)[::-1]
        sorted_sentences = [sentences[i] for i in order]
        bound = self.session.bound
        fn = self.session.fn
        futures = []
        for off in range(0, len(sorted_sentences), batch_size):
            chunk = sorted_sentences[off : off + batch_size]
            with self._host_lock:
                enc = self.tokenizer(
                    chunk, padding=True, truncation=True, max_length=self.max_length,
                    return_tensors="np",
                )
            ids, mask = enc["input_ids"], enc["attention_mask"]
            L = ids.shape[1]
            bucket_len = next((b for b in self.seq_buckets if b >= L), self.max_length)
            if bucket_len > L:
                ids = np.pad(ids, ((0, 0), (0, bucket_len - L)))
                mask = np.pad(mask, ((0, 0), (0, bucket_len - L)))
            reps = fn(bound, ids.astype(np.int32), mask.astype(np.int32))
            futures.append((len(chunk), reps))
        return order, futures

    @staticmethod
    def _finish_dense(order, futures) -> np.ndarray:
        chunks = [np.asarray(reps)[:n] for n, reps in futures]
        sorted_reps = np.concatenate(chunks, axis=0)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return sorted_reps[inv]

    def encode_stream(self, sentence_batches, batch_size: Optional[int] = None):
        """Pipelined encode over a STREAM of sentence lists: batch n+1's
        tokenization/packing runs on the host while batch n's program runs
        on the device (jax dispatch is async — the same double-buffer shape
        as the rec path's batch_inference_stream). Yields one [B, D] array
        per input batch, in order.

        Matches the reference's continuous length-sorted encode loop
        (inference/embedder/text_retrieval/base.py:291-320) with the host
        work hidden behind device time instead of serialized before it."""
        batch_size = batch_size or self.batch_size
        packed = self.packing and self.mesh is None and self.infer_mode == "normal" and (
            self.model.args.sentence_pooling_method in ("cls", "mean", "last_token")
        )
        if not packed and (self.mesh is not None or not isinstance(self.session, NormalSession)):
            # AOT sessions expose no device futures; mesh sessions need
            # encode()'s per-device row padding — both fall back to
            # sequential full encodes
            for sentences in sentence_batches:
                yield self.encode(sentences, batch_size=batch_size)
            return
        # one fetch worker: the result readback (device->host transfer)
        # releases the GIL, so it overlaps the NEXT batch's tokenization on
        # the main thread — without it the stream is tokenize + fetch
        # serialized even though dispatch is async
        from concurrent.futures import ThreadPoolExecutor

        dispatch = self._dispatch_packed if packed else self._dispatch_dense
        finish = self._finish_packed if packed else self._finish_dense
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = None
            for sentences in sentence_batches:
                dispatched = dispatch(sentences, batch_size)
                if pending is not None:
                    yield pending.result()
                pending = pool.submit(finish, *dispatched)
            if pending is not None:
                yield pending.result()



class BaseEmbedderInferenceEngine(TextEmbedder):
    """Engine with mode dispatch + serialized-executable export
    (parity: BaseEmbedderInferenceEngine, base.py:434-801; convert_to_onnx/
    convert_to_tensorrt become StableHLO serialization)."""

    def __init__(self, infer_args=None, **kw):
        if infer_args is not None:
            kw.setdefault("model_name_or_path", getattr(infer_args, "model_name_or_path", None))
            kw.setdefault("infer_mode", getattr(infer_args, "infer_mode", "normal") or "normal")
            kw.setdefault("batch_size", getattr(infer_args, "infer_batch_size", 256))
        self.infer_args = infer_args
        super().__init__(**kw)

    def inference(self, inputs, *args, normalize: bool = True, **kw) -> np.ndarray:
        return self.encode(inputs)

    def convert_to_serialized(self, output_path: str) -> str:
        """Export the AOT executables as serialized StableHLO (the onnx-file
        equivalent). Requires infer_mode in ('onnx','tensorrt','aot')."""
        session = self.session
        if not isinstance(session, AOTSession):
            buckets = [
                {"input_ids": (self.batch_size, L), "attention_mask": (self.batch_size, L)}
                for L in self.seq_buckets
            ]
            session = AOTSession(self._encode_fn, ["input_ids", "attention_mask"], buckets, bound=self.model.variables)
        with open(output_path, "wb") as f:
            f.write(session.serialize())
        logger.info("serialized executables -> %s", output_path)
        return output_path

    @classmethod
    def load_serialized(cls, path: str) -> AOTSession:
        with open(path, "rb") as f:
            return AOTSession.deserialize(f.read())
