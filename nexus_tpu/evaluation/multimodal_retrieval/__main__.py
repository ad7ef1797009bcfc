"""Multimodal-retrieval evaluation CLI (parity: Nexus/evaluation/
multimodal_retrieval/__main__.py).

    python -m nexus_tpu.evaluation.multimodal_retrieval \
        --dataset_dir data/eval --dataset_names colors \
        --model_name_or_path /ckpt [--media_root data]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--dataset_names", nargs="+", required=True)
    ap.add_argument("--model_name_or_path", required=True)
    ap.add_argument("--media_root", default=None)
    ap.add_argument("--eval_output_dir", default="./mm_eval_results")
    ap.add_argument("--search_top_k", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_length", type=int, default=128)
    ap.add_argument("--k_values", nargs="*", type=int, default=[1, 5, 10])
    ns = ap.parse_args()

    from nexus_tpu.evaluation.multimodal_retrieval.runner import (
        MultimodalRetrievalEvalRunner,
    )
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder

    embedder = MultimodalEmbedder(
        model_name_or_path=ns.model_name_or_path,
        batch_size=ns.batch_size,
        max_length=ns.max_length,
        media_root=ns.media_root,
    )
    runner = MultimodalRetrievalEvalRunner(
        embedder,
        dataset_dir=ns.dataset_dir,
        dataset_names=ns.dataset_names,
        eval_output_dir=ns.eval_output_dir,
        media_root=ns.media_root,
        search_top_k=ns.search_top_k,
        k_values=ns.k_values,
    )
    print(runner.run())


if __name__ == "__main__":
    main()
