"""Config-driven local multimodal retrieval evaluation (parity: the
reference's examples/multimodal_retrieval/evaluation/run_local_eval.sh over
eval_config.json — corpus.jsonl / queries.jsonl / qrels layout).

    python examples/multimodal_retrieval/evaluation/run_local_eval.py \
        --embedder /path/to/multimodal_embedder_save \
        [--config examples/multimodal_retrieval/evaluation/eval_config.json]

Smoke mode (no --embedder): trains the tiny in-repo VLM on the bundled color
dataset first, then evaluates it on the bundled eval fixture.
"""
import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", "..", ".."))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embedder", default=None, help="multimodal embedder save dir")
    ap.add_argument("--config", default=os.path.join(HERE, "eval_config.json"))
    args = ap.parse_args()

    with open(args.config) as f:
        cfg = json.load(f)

    from nexus_tpu.evaluation.multimodal_retrieval import MultimodalRetrievalEvalRunner
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder

    if args.embedder:
        embedder = MultimodalEmbedder(model_name_or_path=args.embedder,
                                      media_root=cfg.get("media_root"))
    else:  # smoke: reuse the bundled smoke-training model
        sys.path.insert(0, os.path.join(REPO, "examples", "multimodal_retrieval"))
        import train_smoke

        model, tokenizer = train_smoke.main()
        embedder = MultimodalEmbedder(
            model=model, tokenizer=tokenizer, max_length=48,
            media_root=os.path.join(REPO, cfg.get("media_root", "")),
        )

    runner = MultimodalRetrievalEvalRunner(
        embedder,
        dataset_dir=os.path.join(REPO, cfg["dataset_dir"]),
        dataset_names=cfg["dataset_names"],
        eval_output_dir=cfg.get("eval_output_dir", "/tmp/nexus_mm_eval_results"),
        media_root=os.path.join(REPO, cfg["media_root"]) if cfg.get("media_root") else None,
        search_top_k=cfg.get("search_top_k", 100),
        k_values=tuple(cfg.get("k_values", (1, 5, 10))),
    )
    results = runner.run()
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
