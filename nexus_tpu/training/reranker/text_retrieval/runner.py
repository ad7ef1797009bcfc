"""Text reranker training runner (parity: Nexus/training/reranker/
text_retrieval/runner.py)."""

from __future__ import annotations

from typing import List, Optional

from nexus_tpu.parallel.mesh import get_default_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.text_retrieval.dataset import (
    TextRerankerCollator,
    TextRerankerTrainDataset,
    make_batch_iterator,
)
from nexus_tpu.training.trainer import RecTrainer
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.runner.text_reranker")


class TextRerankerRunner:
    def __init__(
        self,
        model_name_or_path: str,
        train_data: List[str],
        training_args: TrainingArguments,
        train_group_size: int = 8,
        max_len: int = 512,
        knowledge_distillation: bool = False,
        lora_rank: int = 0,
        lora_alpha: float = 16.0,
        pack_pairs: bool = False,
        pair_template: Optional[str] = None,
        remat: bool = True,
        remat_policy=None,
        mesh=None,
        trainer_kwargs=None,
    ):
        """``remat=False`` turns gradient checkpointing off — pair it with
        ``training_args.gradient_accumulation_steps`` to bound activation
        memory by the micro-batch instead of recompute (the group-CE loss
        accumulates to EXACTLY the full-batch gradient);
        ``remat_policy='offload_dots'`` keeps remat but parks matmul outputs
        in host RAM instead of recomputing them (see models/bert.py).
        ``trainer_kwargs``: extra RecTrainer options (``shard_opt_state=True``
        for ZeRO-1, ``shard_tensor_parallel=True`` for a Megatron-style trunk
        layout over a `model` mesh axis)."""
        from transformers import AutoTokenizer

        from nexus_tpu.training.reranker.text_retrieval.decoder_only import load_reranker_model

        self.training_args = training_args
        self.mesh = mesh or get_default_mesh()
        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        if self.tokenizer.pad_token is None and self.tokenizer.eos_token is not None:
            self.tokenizer.pad_token = self.tokenizer.eos_token
        # BERT-head or decoder (LLM) cross-encoder, chosen by config.json
        self.model = load_reranker_model(
            model_name_or_path,
            train_group_size=train_group_size,
            use_kd=knowledge_distillation,
            lora_rank=lora_rank,
            lora_alpha=lora_alpha,
            tokenizer=self.tokenizer,
            remat=remat,
            remat_policy=remat_policy,
        )
        self.dataset = TextRerankerTrainDataset(
            train_data, train_group_size=train_group_size, seed=training_args.seed,
            knowledge_distillation=knowledge_distillation,
        )
        # both cross-encoder families score packed rows (BERT: CLS gather;
        # decoder: per-segment last-token gather), so pack_pairs applies to
        # either backbone
        self.collator = TextRerankerCollator(
            self.tokenizer, max_len=max_len, pack=pack_pairs,
            pair_template=pair_template,
        )
        self.trainer = RecTrainer(self.model, training_args, mesh=self.mesh,
                                  **(trainer_kwargs or {}))

    def run(self, resume_from_checkpoint: Optional[str] = None):
        from nexus_tpu.parallel.mesh import DATA_AXIS

        global_bs = self.training_args.per_device_train_batch_size * self.mesh.shape[DATA_AXIS]
        it = make_batch_iterator(self.dataset, self.collator, global_bs)
        state = self.trainer.train(it, resume_from_checkpoint=resume_from_checkpoint)
        self.trainer.save_model(self.training_args.output_dir, blocking=True)
        if getattr(self.model, "uses_lora", False):
            # LoRA runs: the adapters alone can't serve — also export the
            # merged standalone model (ref save_merged_model parity)
            self.model.save_merged_model(self.training_args.output_dir, state.variables)
        self.tokenizer.save_pretrained(self.training_args.output_dir)
        logger.info("reranker saved to %s", self.training_args.output_dir)
        return state
