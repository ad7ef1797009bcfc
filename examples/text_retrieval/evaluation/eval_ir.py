"""Text IR evaluation (parity: examples/text_retrieval/evaluation): run a
BEIR-layout dataset through the dense retriever (+optional reranker); pass
--infer_mode aot to validate the AOT engine against normal mode (the
eval-as-parity-test pattern)."""
import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from nexus_tpu.evaluation.text_retrieval.runner import (
    TextRetrievalEvalArguments, TextRetrievalEvalRunner,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embedder", required=True)
    ap.add_argument("--reranker", default=None)
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--datasets", nargs="+", required=True)
    ap.add_argument("--output_dir", default="/tmp/nexus_ir_eval")
    ap.add_argument("--infer_mode", default=None, choices=[None, "normal", "aot"])
    args = ap.parse_args()

    runner = TextRetrievalEvalRunner(TextRetrievalEvalArguments(
        dataset_dir=args.dataset_dir, dataset_names=args.datasets,
        eval_output_dir=args.output_dir, embedder_name_or_path=args.embedder,
        reranker_name_or_path=args.reranker, embedder_infer_mode=args.infer_mode,
    ))
    for name, metrics in runner.run().items():
        print(name, metrics)


if __name__ == "__main__":
    main()
