"""Recommendation ranker training CLI (parity: Nexus/training/reranker/
recommendation/__main__.py).

    python -m nexus_tpu.training.reranker.recommendation \
        --model_config model.json --data_config data.json \
        --train_config train.json [--model_class MLPRanker]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--data_config", required=True)
    ap.add_argument("--train_config", required=True)
    ap.add_argument("--model_class", default="MLPRanker",
                    help="registered model name: MLPRanker | DCNv2Ranker | "
                         "MMoERanker | DINRanker | ...")
    ap.add_argument("--resume_from_checkpoint", default=None)
    ns = ap.parse_args()

    from nexus_tpu.training.reranker.recommendation import RankerRunner
    from nexus_tpu.utils.registry import get_model_cls

    RankerRunner(
        model_config_or_path=ns.model_config,
        data_config_or_path=ns.data_config,
        train_config_or_path=ns.train_config,
        model_class=get_model_cls(ns.model_class),
    ).run(resume_from_checkpoint=ns.resume_from_checkpoint)


if __name__ == "__main__":
    main()
