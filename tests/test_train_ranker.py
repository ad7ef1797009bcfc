import os

import numpy as np
import pytest

from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.checkpoint import load_checkpoint
from nexus_tpu.training.reranker.recommendation import (
    DCNv2Ranker,
    MLPRanker,
    MMoERanker,
    RankerRunner,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_rank")
    return generate_synthetic_recflow(str(root), n_days=3, rows_per_day=768, seq_len=6)


def train_args(tmp_path, **kw):
    base = dict(
        output_dir=str(tmp_path / "ckpt"),
        num_train_epochs=2,
        per_device_train_batch_size=32,  # 32*8 devices = 256 global
        learning_rate=0.01,
        optimizer="adam",
        logging_steps=2,
        metrics=["auc", "logloss"],
        batch_norm=False,
    )
    base.update(kw)
    return TrainingArguments.from_dict(base)


MODEL_CFG = {
    "embedding_dim": 8,
    "mlp_layers": [32, 16],
    "activation": "relu",
    "dropout": 0.0,
    "batch_norm": False,
}


def test_mlp_ranker_end_to_end(synth, tmp_path):
    runner = RankerRunner(
        model_config_or_path=MODEL_CFG,
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path),
        model_class=MLPRanker,
    )
    state = runner.run()
    assert int(state.step) > 0
    metrics = runner.trainer.evaluate(lambda: iter(runner.load_dataset()[1]))
    assert "auc" in metrics and "logloss" in metrics
    assert 0.5 < metrics["auc"] <= 1.0  # learned signal beats random

    # checkpoint roundtrip through the registry
    ckpt = os.path.join(str(tmp_path / "ckpt"))
    model2, variables2 = load_checkpoint(ckpt)
    assert type(model2).__name__ == "MLPRanker"
    pred1, _ = runner.model.eval_step(state.variables, _first_batch(runner))
    pred2, _ = model2.eval_step(variables2, _first_batch(runner))
    assert np.allclose(np.asarray(pred1), np.asarray(pred2), atol=1e-5)


def _first_batch(runner):
    ds = runner.load_dataset()[1]
    b = next(iter(ds))
    b.pop("_nvalid", None)
    return b


def test_dcnv2_ranker_trains(synth, tmp_path):
    cfg = dict(MODEL_CFG, cross_net_layers=2, deep_cross_combination="parallel")
    runner = RankerRunner(
        model_config_or_path=cfg,
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path, num_train_epochs=1),
        model_class=DCNv2Ranker,
    )
    state = runner.run()
    assert int(state.step) > 0


def test_mmoe_multitask(synth_multi, tmp_path):
    cfg = dict(MODEL_CFG, n_experts=2, gate_layers=[8], tower_layers=[8])
    runner = RankerRunner(
        model_config_or_path=cfg,
        data_config_or_path=synth_multi,
        train_config_or_path=train_args(tmp_path, num_train_epochs=1),
        model_class=MMoERanker,
    )
    state = runner.run()
    metrics = runner.trainer.evaluate(lambda: iter(runner.load_dataset()[1]))
    assert "auc_effective_view" in metrics and "auc_long_view" in metrics and "auc" in metrics


@pytest.fixture(scope="module")
def synth_multi(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_multi")
    return generate_synthetic_recflow(
        str(root), n_days=2, rows_per_day=512, seq_len=4,
        labels=("effective_view", "long_view"),
    )


def test_ranker_predict_topk(synth, tmp_path):
    runner = RankerRunner(
        model_config_or_path=MODEL_CFG,
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path, num_train_epochs=1, max_steps=2),
        model_class=MLPRanker,
    )
    state = runner.run()
    b = _first_batch(runner)
    context = {k: b[k][:4] for k in runner.data_attr.context_features}
    context["seq_effective"] = {k: v[:4] for k, v in b["seq_effective"].items()}
    n_cand = 7
    candidates = {
        k: np.tile(b[k][:n_cand][None], (4, 1)) for k in runner.data_attr.item_features
    }
    topk_idx = runner.model.predict(state.variables, context, candidates, topk=3)
    assert topk_idx.shape == (4, 3)
    assert (np.asarray(topk_idx) < n_cand).all()
