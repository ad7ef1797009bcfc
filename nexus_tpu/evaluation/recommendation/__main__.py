"""Recommendation evaluation CLI (parity: Nexus/evaluation/recommendation/
__main__.py).

    python -m nexus_tpu.evaluation.recommendation \
        --data_config data_config.json \
        [--retriever_ckpt_path ckpt/retriever] [--ranker_ckpt_path ckpt/ranker] \
        [--metrics ndcg recall] [--cutoffs 10 50]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_config", required=True)
    ap.add_argument("--retriever_ckpt_path")
    ap.add_argument("--ranker_ckpt_path")
    ap.add_argument("--eval_batch_size", type=int, default=512)
    ap.add_argument("--metrics", nargs="*")
    ap.add_argument("--cutoffs", nargs="*", type=int)
    ns = ap.parse_args()

    from nexus_tpu.evaluation.recommendation import RecommenderEvalRunner

    out = RecommenderEvalRunner(
        ns.data_config,
        retriever_ckpt_path=ns.retriever_ckpt_path,
        ranker_ckpt_path=ns.ranker_ckpt_path,
        eval_batch_size=ns.eval_batch_size,
        metrics=ns.metrics,
        cutoffs=ns.cutoffs,
    ).run()
    print(json.dumps(out, default=lambda x: round(float(x), 6)))


if __name__ == "__main__":
    main()
