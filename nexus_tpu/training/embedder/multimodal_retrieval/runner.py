"""Multimodal embedder training runner (parity: Nexus/training/embedder/
multimodal_retrieval/runner.py:29-138)."""

from __future__ import annotations

from typing import List, Optional

from nexus_tpu.modules.multimodal import MultimodalProcessorAdapter
from nexus_tpu.parallel.mesh import DATA_AXIS, get_default_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.embedder.multimodal_retrieval.dataset import (
    MultimodalCollator,
    MultimodalEmbedderTrainDataset,
    make_batch_iterator,
)
from nexus_tpu.training.embedder.multimodal_retrieval.modeling import BiMultimodalEmbedderModel
from nexus_tpu.training.trainer import RecTrainer
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.runner.multimodal")


class MultimodalEmbedderRunner:
    def __init__(
        self,
        model: BiMultimodalEmbedderModel,
        tokenizer,
        train_data: List[str],
        training_args: TrainingArguments,
        train_group_size: int = 4,
        media_root: Optional[str] = None,
        max_length: int = 128,
        max_images: int = 1,
        query_instruction: Optional[str] = None,
        use_chat_template: bool = False,
        mesh=None,
    ):
        self.training_args = training_args
        self.mesh = mesh or get_default_mesh()
        self.model = model
        self.tokenizer = tokenizer
        c = model.vlm_config
        if getattr(model, "backbone_type", "nexus-vlm") in ("qwen2-vl", "qwen2.5-vl", "qwen3-vl", "qwen3.5"):
            from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter

            t, h, w = model.grid_thw
            self.processor = Qwen2VLProcessorAdapter(
                tokenizer,
                image_size=h * c.vision.patch_size,
                patch_size=c.vision.patch_size,
                temporal_patch_size=c.vision.temporal_patch_size,
                spatial_merge_size=c.vision.spatial_merge_size,
                max_length=max_length,
                image_token_id=c.image_token_id,
                video_token_id=c.video_token_id,
                vision_start_token_id=c.vision_start_token_id,
                vision_end_token_id=getattr(c, "vision_end_token_id", 151653),
                use_chat_template=use_chat_template,
                grid_t=t,
                # qwen3-vl videos: '<t.t seconds>' text before each (1,g,g)
                # temporal-pair block (HF Qwen3VLProcessor layout)
                video_timestamps=getattr(model, "backbone_type", "") in ("qwen3-vl", "qwen3.5"),
                # Qwen2.5-VL spaces video temporal M-RoPE by
                # tokens_per_second * second_per_grid_t (tps / fps, fps=2.0
                # HF processor default); Qwen2-VL uses plain arange(t)
                temporal_scale=(
                    getattr(c.vision, "tokens_per_second", 0)
                    * c.vision.temporal_patch_size / 2.0
                ) or 1.0,
            )
        else:
            self.processor = MultimodalProcessorAdapter(
                tokenizer,
                image_size=c.vision.image_size,
                num_image_tokens=c.num_image_tokens,
                max_length=max_length,
                max_images=max_images,
            )
        self.dataset = MultimodalEmbedderTrainDataset(
            train_data, train_group_size=train_group_size, media_root=media_root,
            query_instruction=query_instruction, seed=training_args.seed,
        )
        self.collator = MultimodalCollator(self.processor)
        self.trainer = RecTrainer(self.model, training_args, mesh=self.mesh)

    def run(self, resume_from_checkpoint: Optional[str] = None):
        global_bs = self.training_args.per_device_train_batch_size * self.mesh.shape[DATA_AXIS]
        it = make_batch_iterator(self.dataset, self.collator, global_bs)
        state = self.trainer.train(it, resume_from_checkpoint=resume_from_checkpoint)
        self.trainer.save_model(self.training_args.output_dir, blocking=True)
        self.tokenizer.save_pretrained(self.training_args.output_dir)
        logger.info("multimodal embedder saved to %s", self.training_args.output_dir)
        return state
