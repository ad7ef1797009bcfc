"""TDE ranker training CLI (parity: Nexus/training/reranker/recommendation/
__tde_main__.py).

    python -m nexus_tpu.training.reranker.recommendation.__tde_main__ \
        --model_config model.json --data_config data.json \
        --train_config train.json --tde_feature video_id=2000
"""

import argparse

from nexus_tpu.dynamic_embedding import parse_tde_features


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--data_config", required=True)
    ap.add_argument("--train_config", required=True)
    ap.add_argument("--model_class", default="MLPRanker")
    ap.add_argument("--tde_feature", nargs="+", required=True)
    ap.add_argument("--redis_url", default=None)
    ns = ap.parse_args()

    from nexus_tpu.dynamic_embedding.runner import TDERankerRunner
    from nexus_tpu.utils.registry import get_model_cls

    ps = None
    if ns.redis_url:
        from nexus_tpu.inference.feature_store import RedisKVStore

        ps = RedisKVStore(url=ns.redis_url)
    runner = TDERankerRunner(
        ns.model_config, ns.data_config, ns.train_config,
        model_class=get_model_cls(ns.model_class),
        tde_features=parse_tde_features(ns.tde_feature), ps=ps,
    )
    runner.run()
    print("id transformer stats:", runner.tde.transformer_group.stats)


if __name__ == "__main__":
    main()
