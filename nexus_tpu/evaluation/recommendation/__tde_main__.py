"""TDE recommendation evaluation CLI (parity: Nexus/evaluation/
recommendation/__tde_main__.py).

    python -m nexus_tpu.evaluation.recommendation.__tde_main__ \
        --data_config data_config.json --retriever_ckpt_path ckpt \
        --tde_feature video_id=2000 [--ps_path ckpt/tde_ps.pkl]
"""

import argparse

from nexus_tpu.dynamic_embedding import parse_tde_features
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_config", required=True)
    ap.add_argument("--retriever_ckpt_path")
    ap.add_argument("--ranker_ckpt_path")
    ap.add_argument("--tde_feature", nargs="+", required=True,
                    help="name=capacity pairs, e.g. video_id=2000")
    ap.add_argument("--ps_path", help="persisted parameter-server file "
                    "(defaults to <ckpt>/tde_ps.pkl if present)")
    ap.add_argument("--eval_batch_size", type=int, default=512)
    ap.add_argument("--metrics", nargs="*")
    ap.add_argument("--cutoffs", nargs="*", type=int)
    ns = ap.parse_args()

    from nexus_tpu.evaluation.recommendation import TDERecommenderEvalRunner
    from nexus_tpu.inference.feature_store import MemoryKVStore

    ckpt = ns.retriever_ckpt_path or ns.ranker_ckpt_path
    ps_path = ns.ps_path or (os.path.join(ckpt, "tde_ps.pkl") if ckpt else None)
    ps = MemoryKVStore.load(ps_path) if ps_path and os.path.exists(ps_path) else None
    out = TDERecommenderEvalRunner(
        ns.data_config,
        tde_features=parse_tde_features(ns.tde_feature),
        ps=ps,
        retriever_ckpt_path=ns.retriever_ckpt_path,
        ranker_ckpt_path=ns.ranker_ckpt_path,
        eval_batch_size=ns.eval_batch_size,
        metrics=ns.metrics,
        cutoffs=ns.cutoffs,
    ).run()
    print(json.dumps(out, default=lambda x: round(float(x), 6)))


if __name__ == "__main__":
    main()
