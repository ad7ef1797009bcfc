"""FiQA-layout eval-parity run (parity target: the reference's committed
examples/text_retrieval/evaluation/search_results/eval_results.md, which
records FiQA ndcg@10 = 39.127 for bge-base-en-v1.5).

This environment has zero egress, so the real bge-base weights cannot be
fetched; this script instead proves the full pipeline on a FiQA-layout local
fixture with a tiny BGE-architecture checkpoint, running the SAME benchmark
through the normal-jit engine AND the AOT engine (and a rerank stage), and
asserts the two modes agree — the reference's eval-as-engine-parity-test
pattern (SURVEY §4.4). With real weights mounted locally, point
--embedder at them and the same command reproduces the reference table.

Usage: python run_fiqa_eval.py [--embedder <hf_dir>] [--out <dir>]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np


def build_fixture(root: str, n_docs: int = 400, n_queries: int = 60) -> str:
    """FiQA-layout BEIR dataset: corpus.jsonl / queries.jsonl / qrels/test.tsv."""
    rng = np.random.default_rng(0)
    d = os.path.join(root, "fiqa-test")
    os.makedirs(os.path.join(d, "qrels"), exist_ok=True)
    topics = ["rate", "bond", "stock", "fund", "tax", "loan", "risk", "yield"]
    words = ["market", "asset", "credit", "hedge", "margin", "equity", "option", "income"]
    with open(os.path.join(d, "corpus.jsonl"), "w") as f:
        for i in range(n_docs):
            topic = topics[i % len(topics)]
            body = " ".join(rng.choice(words, 12)) + f" {topic} " + " ".join(rng.choice(words, 6))
            f.write(json.dumps({"_id": f"d{i}", "title": f"{topic} note {i}", "text": body}) + "\n")
    with open(os.path.join(d, "queries.jsonl"), "w") as f, open(
        os.path.join(d, "qrels", "test.tsv"), "w"
    ) as q:
        q.write("query-id\tcorpus-id\tscore\n")
        for j in range(n_queries):
            gold = (j * 7) % n_docs
            topic = topics[gold % len(topics)]
            f.write(json.dumps({"_id": f"q{j}", "text": f"what about {topic} note {gold}"}) + "\n")
            q.write(f"q{j}\td{gold}\t1\n")
            q.write(f"q{j}\td{(gold + len(topics)) % n_docs}\t1\n")
    return root


def build_tiny_checkpoint(root: str) -> str:
    """Deterministic tiny BGE-architecture HF checkpoint + word tokenizer."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    d = os.path.join(root, "tiny-bge")
    if os.path.exists(os.path.join(d, "config.json")):
        return d
    os.makedirs(d, exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += ["what", "about", "note"]
    vocab += ["rate", "bond", "stock", "fund", "tax", "loan", "risk", "yield"]
    vocab += ["market", "asset", "credit", "hedge", "margin", "equity", "option", "income"]
    vocab += [str(i) for i in range(512)]
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt")).save_pretrained(d)
    torch.manual_seed(0)
    BertModel(BertConfig(
        vocab_size=len(vocab), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128, max_position_embeddings=128,
    )).save_pretrained(d)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embedder", default=None, help="HF checkpoint dir (default: tiny fixture model)")
    ap.add_argument("--reranker", default=None)
    ap.add_argument("--dataset_dir", default=None,
                    help="real BEIR root (contains <dataset_name>/corpus.jsonl "
                         "...); default: generated FiQA-layout fixture")
    ap.add_argument("--dataset_name", default=None,
                    help="dataset subdir under --dataset_dir (default: fiqa)")
    ap.add_argument("--max_length", type=int, default=None,
                    help="query/passage token cap (default 64 on the fixture, "
                         "512 on a real --dataset_dir)")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "search_results"))
    ap.add_argument("--work", default="/tmp/nx_fiqa_eval")
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.work, exist_ok=True)
    if args.dataset_dir:
        dataset_dir = args.dataset_dir
        dataset_name = args.dataset_name or "fiqa"
        max_length = args.max_length or 512
    else:
        dataset_dir = build_fixture(args.work)
        dataset_name = "fiqa-test"
        max_length = args.max_length or 64
    embedder = args.embedder or build_tiny_checkpoint(args.work)
    reranker = args.reranker or embedder

    from nexus_tpu.evaluation.text_retrieval import (
        TextRetrievalEvalArguments,
        TextRetrievalEvalRunner,
    )

    results = {}
    for mode in ("normal", "aot"):
        eargs = TextRetrievalEvalArguments(
            dataset_dir=dataset_dir, dataset_names=[dataset_name],
            eval_output_dir=os.path.join(args.work, f"out_{mode}"),
            embedder_name_or_path=embedder,
            reranker_name_or_path=reranker,
            embedder_infer_mode=mode,
            search_top_k=1000 if args.dataset_dir else 50, rerank_top_k=10,
            embedder_batch_size=32,
            embedder_query_max_length=max_length,
            embedder_passage_max_length=max_length,
            k_values=[1, 5, 10], overwrite=True,
        )
        results[mode] = TextRetrievalEvalRunner(eargs).run()[dataset_name]

    # engine parity: normal vs AOT must agree (the reference validates its
    # ONNX/TRT engines exactly this way)
    for variant in results["normal"]:
        for metric in ("NDCG@10", "Recall@10"):
            a = results["normal"][variant][metric]
            b = results["aot"][variant][metric]
            assert abs(a - b) < 1e-3, (variant, metric, a, b)
    print("normal vs aot parity OK")

    os.makedirs(args.out, exist_ok=True)
    lines = [
        "# FiQA-layout eval run (nexus_tpu)",
        "",
        "Reference numbers (real bge-base-en-v1.5 on real FiQA — "
        "examples/text_retrieval/evaluation/search_results/eval_results.md in "
        "hanhainebula/Nexus): ndcg@10 **39.127** (NoReranker) / 37.672 "
        "(+bge-reranker-base); recall@10 45.797 / 45.648.",
        "",
        "This run: zero-egress environment, so the pipeline is proven on a "
        "FiQA-layout local fixture with a tiny in-repo checkpoint; the SAME "
        "benchmark runs through the normal-jit AND AOT engines and must "
        "agree (engine-parity test). Mount real weights and pass --embedder "
        "to reproduce the reference table with this exact command.",
        "",
        "| engine mode | variant | ndcg@10 | recall@10 | mrr@10 |",
        "|---|---|---|---|---|",
    ]
    for mode, variants in results.items():
        for variant, m in variants.items():
            lines.append(
                f"| {mode} | {variant} | {m['NDCG@10']:.5f} | "
                f"{m['Recall@10']:.5f} | {m.get('MRR@10', float('nan')):.5f} |"
            )
    path = os.path.join(args.out, "eval_results.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
    for mode, variants in results.items():
        for variant, m in variants.items():
            print(mode, variant, {k: round(v, 4) for k, v in m.items() if "10" in k})


if __name__ == "__main__":
    main()
