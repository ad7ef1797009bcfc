"""MMEB-v2 CLI (parity: the reference's eval_embedding.py HfArgumentParser
main). Example:
    python -m nexus_tpu.evaluation.mmeb_v2 --model_dir ... --dataset_dir ... \
        --tasks MSCOCO_t2i ImageNet-1K --output_dir ./mmeb_out
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--tasks", nargs="*", default=None)
    ap.add_argument("--output_dir", default="./mmeb_results")
    ap.add_argument("--reranker_dir", default=None)
    ap.add_argument("--rerank_top_k", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--media_root", default=None)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world_size", type=int, default=1)
    ap.add_argument("--run_id", default=None,
                    help="token scoping cross-rank gather files when reusing "
                         "an output_dir across runs")
    ap.add_argument("--attention_impl", default=None,
                    choices=["fused", "pallas", "xla"],
                    help="text-trunk attention override: 'fused' enables "
                         "the decoder megakernel (fast eval encode)")
    ap.add_argument("--quantized", action="store_true",
                    help="int8 W8A8 serving of the text trunk "
                         "(quantize_vlm_params; vision tower stays fp)")
    ap.add_argument("--infer_mode", default="normal",
                    choices=["normal", "aot"],
                    help="'aot' runs explicitly lowered+compiled executables "
                         "— rerunning a task in both modes doubles as the "
                         "engine-parity test (identical metric tables)")
    args = ap.parse_args()

    from nexus_tpu.evaluation.mmeb_v2 import MMEBEvaluator
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder

    embedder = MultimodalEmbedder(
        model_name_or_path=args.model_dir, batch_size=args.batch_size,
        media_root=args.media_root, attention_impl=args.attention_impl,
        infer_mode=args.infer_mode, quantized=args.quantized,
    )
    reranker = None
    if args.reranker_dir:
        from nexus_tpu.inference.reranker.text_retrieval import TextReranker

        reranker = TextReranker(model_name_or_path=args.reranker_dir,
                                attention_impl=args.attention_impl)
    ev = MMEBEvaluator(
        embedder, args.dataset_dir, output_dir=args.output_dir, reranker=reranker,
        rerank_top_k=args.rerank_top_k, rank=args.rank, world_size=args.world_size,
        run_id=args.run_id,
    )
    results = ev.run(args.tasks)
    for task, m in results.items():
        print(task, m)


if __name__ == "__main__":
    main()
