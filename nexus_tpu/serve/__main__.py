"""Serving CLI (parity: the reference launches its services as scripts that
load engines from YAML — serve/inference_service.py:131-160 and
serve/inference_service_text_retrieval.py; here the same contract is a
module entry point over the HTTP JSON services):

    python -m nexus_tpu.serve --mode rec  --config serve_rec.yaml
    python -m nexus_tpu.serve --mode text --config serve_text.yaml

Config (json or yaml):

rec mode
  retriever: {model_ckpt_path, retrieve_mode, output_topk, item_index_path,
              feature_cache: {...}}         # engine config dict (engine docs)
  ranker:    {model_ckpt_path, output_topk, feature_cache: {...}}  # optional
service knobs (both modes, all optional)
  host, port, max_batch, batch_wait_ms, workers,
  max_queue (admission cap -> 503), deadline_ms (queue budget -> 504)

text mode
  embedder:  {model_name_or_path, batch_size, max_length, infer_mode,
              attention_impl, quantized, packing}   # TextEmbedder kwargs
  corpus:    path to a jsonl of {"id": ..., "text": ...} (or {"_id","text"})
  index_path: optional prebuilt ItemIndex .npz (else built from the corpus)
  reranker:  {model_name_or_path, ...} optional TextReranker kwargs
"""

from __future__ import annotations

import argparse
import json


def _load_config(path: str) -> dict:
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    with open(path) as f:
        return json.load(f)


def _service_kw(cfg: dict) -> dict:
    keys = ("host", "port", "max_batch", "batch_wait_ms", "workers",
            "max_queue", "deadline_ms")
    return {k: cfg[k] for k in keys if k in cfg}


def _build_rec(cfg: dict):
    from nexus_tpu.inference.embedder.recommendation import (
        BaseEmbedderInferenceEngine,
    )
    from nexus_tpu.inference.reranker.recommendation import (
        BaseRerankerInferenceEngine,
    )
    from nexus_tpu.serve.service import InferenceService

    retriever = BaseEmbedderInferenceEngine(cfg["retriever"])
    ranker = (BaseRerankerInferenceEngine(cfg["ranker"], kv_store=retriever.kv)
              if cfg.get("ranker") else None)
    return InferenceService(retriever, ranker, **_service_kw(cfg))


def _build_text(cfg: dict):
    from nexus_tpu.inference.embedder.text_retrieval import TextEmbedder
    from nexus_tpu.serve.service import TextRetrievalService

    emb = TextEmbedder(**cfg["embedder"])
    corpus = {}
    with open(cfg["corpus"]) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            corpus[str(rec.get("id", rec.get("_id")))] = rec["text"]
    index = None
    if cfg.get("index_path"):
        from nexus_tpu.inference.index import ItemIndex

        index = ItemIndex.load(cfg["index_path"])
    reranker = None
    if cfg.get("reranker"):
        from nexus_tpu.inference.reranker.text_retrieval import TextReranker

        reranker = TextReranker(**cfg["reranker"])
    return TextRetrievalService(emb, corpus, reranker_engine=reranker,
                                index=index, **_service_kw(cfg))


def main(argv=None) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
    ap = argparse.ArgumentParser(prog="python -m nexus_tpu.serve")
    ap.add_argument("--mode", choices=("rec", "text"), required=True)
    ap.add_argument("--config", required=True, help="service config (.json/.yaml)")
    ns = ap.parse_args(argv)
    cfg = _load_config(ns.config)
    svc = _build_rec(cfg) if ns.mode == "rec" else _build_text(cfg)
    svc.start(block=True)


if __name__ == "__main__":
    main()
