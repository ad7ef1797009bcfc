"""LoRA-variant MMEB-v2 embedding eval (parity: Nexus/evaluation/mmeb_v2/
eval_emb_lora.py): load a base multimodal checkpoint, overlay trained LoRA
adapters (adapter_model.msgpack) on the backbone weights, then run the
standard MMEBEvaluator."""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def load_adapter_overlay(variables: dict, adapter_dir: str) -> dict:
    """Overlay adapter_model.msgpack LoRA trees onto base variables."""
    from flax import serialization

    path = os.path.join(adapter_dir, "adapter_model.msgpack")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no adapter_model.msgpack under {adapter_dir}")
    with open(path, "rb") as f:
        adapters = serialization.msgpack_restore(f.read())

    from collections.abc import Mapping

    def copy_tree(t):
        return {k: copy_tree(v) for k, v in t.items()} if isinstance(t, Mapping) else t

    def apply(params, tree):
        for k, v in tree.items():
            if k in ("lora_A", "lora_B"):
                params[k] = jnp.asarray(v)
            elif isinstance(v, Mapping) and k in params:
                apply(params[k], v)

    out = copy_tree(variables)
    apply(out["params"], adapters)
    return out


def run_lora_eval(
    model_dir: str,
    adapter_dir: str,
    tokenizer=None,
    data_basedir: Optional[str] = None,
    dataset_dir: Optional[str] = None,
    output_dir: str = "./mmeb_results_lora",
    task_names=None,
    **evaluator_kw,
):
    """Base checkpoint + adapters -> MMEBEvaluator.run()."""
    from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )

    model = BiMultimodalEmbedderModel.from_pretrained(model_dir)
    if model.variables is None:
        import jax

        model.variables = model.init_variables(jax.random.PRNGKey(0))
    model.variables = load_adapter_overlay(model.variables, adapter_dir)
    embedder = MultimodalEmbedder(model=model, tokenizer=tokenizer,
                                  model_name_or_path=model_dir)
    evaluator = MMEBEvaluator(
        embedder, dataset_dir=dataset_dir, data_basedir=data_basedir,
        output_dir=output_dir, **evaluator_kw,
    )
    return evaluator.run(task_names)
