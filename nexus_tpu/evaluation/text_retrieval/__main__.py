"""Text-retrieval evaluation CLI (parity: Nexus/evaluation/text_retrieval/
__main__.py).

    python -m nexus_tpu.evaluation.text_retrieval --config eval_config.json
    # or flags:
    python -m nexus_tpu.evaluation.text_retrieval \
        --dataset_dir ./beir --dataset_names fiqa \
        --embedder_name_or_path /path/to/bge [--reranker_name_or_path ...]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="TextRetrievalEvalArguments JSON file")
    ap.add_argument("--dataset_dir")
    ap.add_argument("--dataset_names", nargs="*")
    ap.add_argument("--eval_output_dir")
    ap.add_argument("--embedder_name_or_path")
    ap.add_argument("--reranker_name_or_path")
    ap.add_argument("--embedder_infer_mode")
    ap.add_argument("--search_top_k", type=int)
    ap.add_argument("--rerank_top_k", type=int)
    ap.add_argument("--embedder_batch_size", type=int)
    ap.add_argument("--k_values", nargs="*", type=int)
    ap.add_argument("--overwrite", action="store_true", default=None)
    ns = ap.parse_args()

    from nexus_tpu.evaluation.text_retrieval.runner import (
        TextRetrievalEvalArguments,
        TextRetrievalEvalRunner,
    )

    base = TextRetrievalEvalArguments.from_json(ns.config) if ns.config \
        else TextRetrievalEvalArguments()
    for k, v in vars(ns).items():
        if k != "config" and v is not None:
            setattr(base, k, v)
    TextRetrievalEvalRunner(base).run()


if __name__ == "__main__":
    main()
