from nexus_tpu.evaluation.ir_metrics import evaluate_ir_metrics, mrr_at_k  # noqa: F401
