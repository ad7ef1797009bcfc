"""Text reranker inference (parity: Nexus/inference/reranker/text_retrieval/
base.py:25-783): (query, passage) pair scoring with sigmoid normalization,
bucketed static shapes, jit or AOT sessions.
"""

from __future__ import annotations

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
    ):
        """``pair_template``: LLM-reranker prompt formatting — e.g.
        ``"A: {query}\\nB: {passage}\\nPredict whether passage B answers "
        "query A."`` Each pair becomes ONE formatted sequence (the decoder
        scores its last token); without it, pairs tokenize as the standard
        two-segment (query, passage) encoding.

        ``attention_impl``: serve-time attention-path override ('fused' |
        'pallas' | 'xla'); None keeps the checkpoint's configuration."""
        from nexus_tpu.training.reranker.text_retrieval.decoder_only import load_reranker_model

        if model is None:
            # dispatches BERT-head vs decoder (LLM yes-logit) by config.json
            model = load_reranker_model(model_name_or_path)
        if attention_impl is not None:
            from nexus_tpu.inference.embedder.text_retrieval import _override_attention_impl

            _override_attention_impl(model, attention_impl)
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
                enc = self.tokenizer(
                    texts, padding=True, truncation=True, max_length=self.max_length,
                    return_tensors="np",
                )
            else:
                enc = self.tokenizer(
                    qs, ps, padding=True, truncation=True, max_length=self.max_length,
                    return_tensors="np",
                )
            ids = enc["input_ids"]
            L = ids.shape[1]
            bucket_len = next((b for b in self.seq_buckets if b >= L), self.max_length)
            feed = {}
            for name in ("input_ids", "attention_mask", "token_type_ids"):
                arr = enc.get(name)
                if arr is None:
                    arr = np.zeros_like(ids)
                if bucket_len > L:
                    arr = np.pad(arr, ((0, 0), (0, bucket_len - L)))
                feed[name] = arr.astype(np.int32)
            out = np.asarray(self.session.run(None, feed)[0])[: len(idx)]
            scores[idx] = out
        if normalize:
            scores = 1.0 / (1.0 + np.exp(-scores))
        result = scores.tolist()
        return result[0] if single else result


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
        names = ["input_ids", "attention_mask", "token_type_ids"]
        session = self.session
        if not isinstance(session, AOTSession):
            buckets = [{k: (self.batch_size, L) for k in names} for L in self.seq_buckets]
            session = AOTSession(self._score_fn, names, buckets, bound=self.model.variables)
        with open(output_path, "wb") as f:
            f.write(session.serialize())
        return output_path
