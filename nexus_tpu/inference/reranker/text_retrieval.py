"""Text reranker inference (parity: Nexus/inference/reranker/text_retrieval/
base.py:25-783): (query, passage) pair scoring with sigmoid normalization,
bucketed static shapes, jit or AOT sessions.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from nexus_tpu.inference.session import AOTSession, NormalSession, get_inference_session
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.inference.text_reranker")

DEFAULT_SEQ_BUCKETS = (64, 128, 256, 512)


class TextReranker:
    def __init__(
        self,
        model_name_or_path: str = None,
        model=None,
        tokenizer=None,
        batch_size: int = 128,
        max_length: int = 512,
        seq_buckets: Sequence[int] = DEFAULT_SEQ_BUCKETS,
        infer_mode: str = "normal",
        normalize: bool = True,
        pair_template: Optional[str] = None,
        attention_impl: Optional[str] = None,
        packing: bool = False,
        mesh=None,
        quantized: bool = False,
    ):
        """``pair_template``: LLM-reranker prompt formatting — e.g.
        ``"A: {query}\\nB: {passage}\\nPredict whether passage B answers "
        "query A."`` Each pair becomes ONE formatted sequence (the decoder
        scores its last token); without it, pairs tokenize as the standard
        two-segment (query, passage) encoding.

        ``attention_impl``: serve-time attention-path override ('fused' |
        'pallas' | 'xla'); None keeps the checkpoint's configuration.

        ``packing``: score many pairs per max_length-token row instead of
        one right-padded pair each (block-diagonal segment attention, same
        scores) — at realistic pair lengths (~190 tokens vs 512 buckets)
        this removes most pad FLOPs. Identical mechanics to the packed
        training collator; both cross-encoder families support it.

        ``mesh``: shard scoring batches across the mesh's data axis — the
        multi-chip replacement for the reference's per-GPU reranker process
        pool (abc/inference/reranker/AbsReranker.py:111-188); one compiled
        program, XLA splits the pair batch over chips."""
        from nexus_tpu.training.reranker.text_retrieval.decoder_only import load_reranker_model

        if model is None:
            # dispatches BERT-head vs decoder (LLM yes-logit) by config.json
            model = load_reranker_model(model_name_or_path)
        if attention_impl is not None:
            from nexus_tpu.inference.embedder.text_retrieval import _override_attention_impl

            _override_attention_impl(model, attention_impl)
        if quantized:
            # int8 W8A8 scoring (models/quantize.py): per-channel int8
            # kernels + per-token dynamic activations; both families
            from nexus_tpu.models.quantize import quantize_model

            quantize_model(model)
        self.model = model
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        if tokenizer.pad_token is None and tokenizer.eos_token is not None:
            # decoder tokenizers (Llama/Mistral) ship without a pad token;
            # padding=True in compute_score would raise otherwise
            tokenizer.pad_token = tokenizer.eos_token
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length
        self.seq_buckets = tuple(b for b in seq_buckets if b <= max_length) or (max_length,)
        self.infer_mode = infer_mode
        self.normalize = normalize
        self.pair_template = pair_template
        self.mesh = mesh
        self.packing = packing
        self._packed_fn = None
        self._packed_session = None
        # serializes tokenizer calls + lazy jit-cache population under
        # multi-worker serving (MicroBatcher workers=2); device calls stay
        # outside the lock (see TextEmbedder._host_lock)
        self._host_lock = threading.Lock()
        if packing and infer_mode != "normal":
            # packed scoring through bucketed AOT executables: same
            # contract as the padded session (convert_to_serialized then
            # exports THIS program — the served path)
            self._packed_session = self._build_packed_session()
        self.session = self._build_session()

    def _score_fn(self, variables, input_ids, attention_mask, token_type_ids):
        # model.scores ignores token_type_ids for decoder backbones, so one
        # session feed serves both cross-encoder families
        return self.model.scores(
            variables,
            {
                "input_ids": input_ids,
                "attention_mask": attention_mask,
                "token_type_ids": token_type_ids,
            },
        )

    def _build_session(self):
        names = ["input_ids", "attention_mask", "token_type_ids"]
        bound = self.model.variables
        if self.mesh is not None:
            # multi-chip scoring: params replicated, pair batch sharded on
            # the data axis; one compiled program over all chips
            import jax

            from nexus_tpu.parallel.mesh import data_parallel_shardings

            batch_sh, rep_sh = data_parallel_shardings(self.mesh)
            session = NormalSession(self._score_fn, names,
                                    bound=jax.device_put(bound, rep_sh))
            session.fn = jax.jit(
                self._score_fn,
                in_shardings=(rep_sh, batch_sh, batch_sh, batch_sh),
                out_shardings=rep_sh,
            )
            return session
        if self.infer_mode == "normal":
            return NormalSession(self._score_fn, names, bound=bound)
        buckets = [
            {k: (self.batch_size, L) for k in names} for L in self.seq_buckets
        ]
        return get_inference_session(
            self._score_fn, names, infer_mode=self.infer_mode, buckets=buckets, bound=bound
        )

    def compute_score(
        self,
        sentence_pairs: Union[Tuple[str, str], List[Tuple[str, str]]],
        batch_size: Optional[int] = None,
        normalize: Optional[bool] = None,
    ) -> Union[float, List[float]]:
        single = isinstance(sentence_pairs, tuple) or (
            isinstance(sentence_pairs, list)
            and len(sentence_pairs) == 2
            and isinstance(sentence_pairs[0], str)
        )
        if single:
            sentence_pairs = [tuple(sentence_pairs)]
        batch_size = batch_size or self.batch_size
        normalize = self.normalize if normalize is None else normalize

        # length-sorted batching over combined pair length
        lengths = [len(q) + len(p) for q, p in sentence_pairs]
        order = np.argsort(lengths)[::-1]
        scores = np.zeros(len(sentence_pairs), np.float32)
        for off in range(0, len(order), batch_size):
            idx = order[off : off + batch_size]
            qs = [sentence_pairs[i][0] for i in idx]
            ps = [sentence_pairs[i][1] for i in idx]
            if self.pair_template:
                texts = [
                    self.pair_template.format(query=q, passage=p) for q, p in zip(qs, ps)
                ]
                with self._host_lock:
                    enc = self.tokenizer(
                        texts, padding=True, truncation=True, max_length=self.max_length,
                        return_tensors="np",
                    )
            else:
                with self._host_lock:
                    enc = self.tokenizer(
                        qs, ps, padding=True, truncation=True, max_length=self.max_length,
                        return_tensors="np",
                    )
            ids = enc["input_ids"]
            if self.packing and self.mesh is None:
                tt = enc.get("token_type_ids")
                out = self._score_packed(
                    ids.astype(np.int32),
                    enc["attention_mask"].astype(np.int32),
                    None if tt is None else tt.astype(np.int32),
                )
                scores[idx] = out
                continue
            L = ids.shape[1]
            bucket_len = next((b for b in self.seq_buckets if b >= L), self.max_length)
            # batch-size bucket: dynamic serving scores arbitrary candidate
            # counts; pow-2 buckets cap the program count (utils/buckets.py)
            from nexus_tpu.utils.buckets import batch_bucket

            pad_rows = batch_bucket(len(ids), cap=batch_size) - len(ids)
            if self.mesh is not None:
                from nexus_tpu.parallel.mesh import DATA_AXIS

                n_dev = self.mesh.shape[DATA_AXIS]
                pad_rows += (-(len(ids) + pad_rows)) % n_dev
            feed = {}
            for name in ("input_ids", "attention_mask", "token_type_ids"):
                arr = enc.get(name)
                if arr is None:
                    arr = np.zeros_like(ids)
                if bucket_len > L:
                    arr = np.pad(arr, ((0, 0), (0, bucket_len - L)))
                if pad_rows:
                    arr = np.pad(arr, ((0, pad_rows), (0, 0)))
                feed[name] = arr.astype(np.int32)
            out = np.asarray(self.session.run(None, feed)[0])[: len(idx)]
            scores[idx] = out
        if normalize:
            scores = 1.0 / (1.0 + np.exp(-scores))
        result = scores.tolist()
        return result[0] if single else result

    _PACKED_NAMES = ("pool_rows", "pool_cols", "lengths", "input_ids",
                     "segment_ids", "position_ids", "token_type_ids")

    def _packed_score_fn(self, variables, pool_rows, pool_cols, lengths,
                         input_ids, segment_ids, position_ids,
                         token_type_ids):
        return self.model.scores(variables, {
            "pool_rows": pool_rows, "pool_cols": pool_cols,
            "lengths": lengths, "input_ids": input_ids,
            "segment_ids": segment_ids, "position_ids": position_ids,
            "token_type_ids": token_type_ids,
        })

    def _build_packed_session(self):
        """Bucketed AOT executables for the packed layout. pool_rows leads
        the input names so the session's n_valid (dim 0 of the first input)
        is the SEQUENCE count — outputs slice back to the real pairs.
        Row-count buckets are N/8..N (multiples of 8): packing never needs
        more rows than sequences."""
        n = self.batch_size
        l = self.max_length
        m8 = lambda v: -(-max(v, 1) // 8) * 8  # noqa: E731
        row_buckets = sorted({m8(n // 8), m8(n // 4), m8(n // 2), m8(n)})
        buckets = [
            {
                "pool_rows": (n,), "pool_cols": (n,), "lengths": (n,),
                **{k: (r, l) for k in ("input_ids", "segment_ids",
                                       "position_ids", "token_type_ids")},
            }
            for r in row_buckets
        ]
        return AOTSession(self._packed_score_fn, self._PACKED_NAMES, buckets,
                          bound=self.model.variables)

    def _score_packed(self, ids: np.ndarray, mask: np.ndarray,
                      token_type_ids: Optional[np.ndarray]) -> np.ndarray:
        """Pack one right-padded chunk into max_length rows and score it in
        a single program (jitted, or a bucketed AOT executable when
        infer_mode != 'normal'). Row count is bucketed (multiples of 8) and
        the per-sequence pool arrays are padded to stable shapes."""
        import jax

        from nexus_tpu.ops.packing import pack_tokenized

        extras = {} if token_type_ids is None else {"token_type_ids": token_type_ids}
        pk = pack_tokenized(ids, mask, row_len=self.max_length, row_bucket=8,
                            extras=extras)
        n = ids.shape[0]
        if "token_type_ids" not in pk:
            pk["token_type_ids"] = np.zeros_like(pk["input_ids"])
        if self._packed_session is not None:
            # session pads pool arrays with zeros; the nets clamp
            # max(length, 1) so those phantom entries gather col 0 and are
            # sliced off by n_valid
            feed = {k: np.asarray(pk[k], np.int32) for k in self._PACKED_NAMES}
            return np.asarray(self._packed_session.run(None, feed)[0])[:n]
        npad = -(-n // 32) * 32

        def padn(a, fill=0):
            return np.pad(a, (0, npad - n), constant_values=fill)

        batch = {
            "input_ids": pk["input_ids"],
            "segment_ids": pk["segment_ids"],
            "position_ids": pk["position_ids"],
            "token_type_ids": pk["token_type_ids"],
            "pool_rows": padn(pk["pool_rows"]),
            "pool_cols": padn(pk["pool_cols"]),
            "lengths": padn(pk["lengths"], 1),
        }
        if self._packed_fn is None:
            with self._host_lock:  # one worker installs the jitted program
                if self._packed_fn is None:
                    self._packed_fn = jax.jit(
                        lambda v, b: self.model.scores(v, b))
        out = np.asarray(
            self._packed_fn(self.model.variables,
                            {k: jnp.asarray(v) for k, v in batch.items()}))
        return out[:n]


class BaseRerankerInferenceEngine(TextReranker):
    """Engine with AOT export parity (convert_to_onnx/trt -> StableHLO)."""

    def __init__(self, infer_args=None, **kw):
        if infer_args is not None:
            kw.setdefault("model_name_or_path", getattr(infer_args, "model_name_or_path", None))
            kw.setdefault("infer_mode", getattr(infer_args, "infer_mode", "normal") or "normal")
            kw.setdefault("batch_size", getattr(infer_args, "infer_batch_size", 128))
        self.infer_args = infer_args
        super().__init__(**kw)

    def inference(self, pairs, *args, **kw):
        return self.compute_score(pairs)

    def convert_to_serialized(self, output_path: str) -> str:
        if self.packing:
            # export the program that actually serves: the packed layout
            session = self._packed_session or self._build_packed_session()
        else:
            names = ["input_ids", "attention_mask", "token_type_ids"]
            session = self.session
            if not isinstance(session, AOTSession):
                buckets = [{k: (self.batch_size, L) for k in names} for L in self.seq_buckets]
                session = AOTSession(self._score_fn, names, buckets, bound=self.model.variables)
        with open(output_path, "wb") as f:
            f.write(session.serialize())
        return output_path
