"""Checkpoint save/load with the reference's schema
(parity: training/embedder/recommendation/modeling.py:240-300).

Layout:
    <dir>/model.msgpack       — flax-serialized variables (replaces model.pt)
    <dir>/model_config.json   — model config + model_type + model_name +
                                embedded data_config (same keys as reference)
    <dir>/item_vectors.npy    — retriever item embedding matrix (optional)

`from_pretrained` reconstructs the model class reflectively from the
`model_name` stored in the config via the model registry.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple, Type, Union

import numpy as np
from flax import serialization

from nexus_tpu.data.attrs import DataAttr4Model
from nexus_tpu.utils.registry import get_model_cls


def save_checkpoint(checkpoint_dir: str, model, variables, item_vectors=None) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(_to_host(variables)))
    config_dict = dict(model.model_config.to_dict())
    config_dict["model_name_or_path"] = checkpoint_dir
    config_dict["model_type"] = model.model_type
    config_dict["model_name"] = type(model).__name__
    config_dict["data_config"] = model.data_config.to_dict()
    with open(os.path.join(checkpoint_dir, "model_config.json"), "w") as f:
        json.dump(config_dict, f, ensure_ascii=False, indent=2, default=str)
    if item_vectors is not None:
        np.save(os.path.join(checkpoint_dir, "item_vectors.npy"), np.asarray(item_vectors))


def load_checkpoint(
    checkpoint_dir: str, model_class_or_name: Optional[Union[Type, str]] = None
) -> Tuple[object, dict]:
    """Returns (model, variables); attaches `model.item_vectors` when saved."""
    with open(os.path.join(checkpoint_dir, "model_config.json")) as f:
        config_dict = json.load(f)
    data_config = DataAttr4Model.from_dict(config_dict.pop("data_config"))
    model_type = config_dict.pop("model_type")
    model_name = config_dict.pop("model_name")
    if model_class_or_name is None:
        model_class_or_name = model_name
    cls = (
        get_model_cls(model_class_or_name)
        if isinstance(model_class_or_name, str)
        else model_class_or_name
    )
    model = cls(data_config, config_dict)
    assert model.model_type == model_type, (
        f"checkpoint is a {model_type}, loaded class is a {model.model_type}"
    )
    target = model.init_variables_shape()
    with open(os.path.join(checkpoint_dir, "model.msgpack"), "rb") as f:
        variables = serialization.from_bytes(target, f.read())
    iv_path = os.path.join(checkpoint_dir, "item_vectors.npy")
    if os.path.exists(iv_path):
        model.item_vectors = np.load(iv_path)
    return model, variables


def _to_host(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def restore_flax_msgpack(checkpoint_dir: str, current) -> dict:
    """Restore variables from an HF-layout save dir (flax_model.msgpack),
    typed against the current variable tree. The shared implementation of
    the model ``load_variables`` trainer-resume protocol for text/multimodal
    models (whose save() writes HF-style dirs, not the rec schema above)."""
    path = os.path.join(checkpoint_dir, "flax_model.msgpack")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no flax_model.msgpack in {checkpoint_dir}")
    with open(path, "rb") as f:
        return serialization.from_bytes(current, f.read())
