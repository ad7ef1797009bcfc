"""Text-embedder training runner (parity: Nexus/training/embedder/
text_retrieval/runner.py:32-182)."""

from __future__ import annotations

from typing import Optional

from nexus_tpu.parallel.mesh import get_default_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.embedder.text_retrieval.arguments import (
    TextEmbedderDataArguments,
    TextEmbedderModelArguments,
)
from nexus_tpu.training.embedder.text_retrieval.dataset import (
    TextEmbedderCollator,
    TextEmbedderTrainDataset,
    make_batch_iterator,
)
from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel
from nexus_tpu.training.trainer import RecTrainer
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.runner.text_embedder")


def load_tokenizer(model_name_or_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_name_or_path)


class TextEmbedderRunner:
    def __init__(
        self,
        model_args: TextEmbedderModelArguments,
        data_args: TextEmbedderDataArguments,
        training_args: TrainingArguments,
        mesh=None,
        model=None,
        trainer_kwargs=None,
    ):
        """``model``: a pre-built embedder model (e.g. a
        BiDecoderOnlyEmbedderModel with LoRA adapters) — when omitted, the
        BERT-family BiTextEmbedderModel loads from model_name_or_path.
        ``trainer_kwargs``: extra RecTrainer options (e.g.
        ``shard_opt_state=True`` for ZeRO-1, ``shard_tensor_parallel=True``
        for a Megatron-style trunk layout over a `model` mesh axis)."""
        self.model_args = model_args
        self.data_args = data_args
        self.training_args = training_args
        self.mesh = mesh or get_default_mesh()
        self.tokenizer = load_tokenizer(model_args.model_name_or_path)
        self.model = model or BiTextEmbedderModel.from_pretrained(
            model_args.model_name_or_path, model_args
        )
        self.model.no_in_batch_neg_flag = data_args.no_in_batch_neg_flag
        self.dataset = TextEmbedderTrainDataset(data_args, seed=training_args.seed)
        self.collator = TextEmbedderCollator(self.tokenizer, data_args)
        self.trainer = RecTrainer(self.model, training_args, mesh=self.mesh,
                                  **(trainer_kwargs or {}))

    def run(self, resume_from_checkpoint: Optional[str] = None):
        from nexus_tpu.parallel.mesh import DATA_AXIS

        global_bs = self.training_args.per_device_train_batch_size * self.mesh.shape[DATA_AXIS]
        batch_iter = make_batch_iterator(self.dataset, self.collator, global_bs)
        state = self.trainer.train(batch_iter, resume_from_checkpoint=resume_from_checkpoint)
        out = self.training_args.output_dir
        self.trainer.save_model(out, blocking=True)
        self.tokenizer.save_pretrained(out)
        logger.info("embedder saved to %s", out)
        return state
