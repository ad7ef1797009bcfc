import numpy as np
import pytest

from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.checkpoint import load_checkpoint
from nexus_tpu.training.embedder.recommendation import (
    DSSMInBatchRetriever,
    MLPRetriever,
    RetrieverRunner,
    SASRecRetriever,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_ret")
    return generate_synthetic_recflow(str(root), n_days=2, rows_per_day=512, seq_len=4)


def train_args(tmp_path, **kw):
    base = dict(
        output_dir=str(tmp_path / "ckpt"),
        num_train_epochs=1,
        per_device_train_batch_size=16,  # 16*8=128 global
        learning_rate=0.01,
        logging_steps=2,
        metrics=["ndcg", "recall"],
    )
    base.update(kw)
    return TrainingArguments.from_dict(base)


MODEL_CFG = {
    "embedding_dim": 8,
    "mlp_layers": [32, 16],
    "num_neg": 8,
    "dropout": 0.0,
    "batch_norm": False,
}


def test_mlp_retriever_end_to_end(synth, tmp_path):
    runner = RetrieverRunner(
        model_config_or_path=MODEL_CFG,
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path),
        model_class=MLPRetriever,
    )
    state = runner.run()
    assert int(state.step) > 0

    # eval produces topk metrics
    metrics = runner.trainer.evaluate(lambda: iter(runner.load_dataset()[1]))
    assert any(k.startswith("ndcg@") for k in metrics)
    assert all(0.0 <= v <= 1.0 for v in metrics.values())

    # item vectors persisted and reloadable
    model2, variables2 = load_checkpoint(str(tmp_path / "ckpt"))
    assert model2.item_vectors is not None
    assert model2.item_vectors.shape[0] == runner.data_attr.num_items


def test_dssm_in_batch_retriever(synth, tmp_path):
    runner = RetrieverRunner(
        model_config_or_path=MODEL_CFG,
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path),
        model_class=DSSMInBatchRetriever,
    )
    # IPS weights wired from item popularity
    assert runner.model.loss_function.ips is not None
    state = runner.trainer.train(lambda: iter(runner.load_dataset()[0]))
    assert int(state.step) > 0


def test_sasrec_retriever(synth, tmp_path):
    cfg = dict(MODEL_CFG, n_layers=1, n_heads=2, hidden_size=32)
    runner = RetrieverRunner(
        model_config_or_path=cfg,
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path),
        model_class=SASRecRetriever,
    )
    state = runner.trainer.train(lambda: iter(runner.load_dataset()[0]))
    assert int(state.step) > 0
    # shared item embedding: encode_item params live under item_embedding
    assert "item_embedding" in state.params


def test_retriever_predict(synth, tmp_path):
    runner = RetrieverRunner(
        model_config_or_path=MODEL_CFG,
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path, max_steps=2),
        model_class=MLPRetriever,
    )
    state = runner.trainer.train(lambda: iter(runner.load_dataset()[0]))
    ds = runner.load_dataset()[1]
    b = next(iter(ds))
    context = {k: b[k][:4] for k in runner.data_attr.context_features}
    candidates = {k: np.tile(b[k][:9][None], (4, 1)) for k in runner.data_attr.item_features}
    idx = runner.model.predict(state.variables, context, candidates, topk=5)
    assert idx.shape == (4, 5)


def test_midx_sampler_training_with_refresh(synth, tmp_path):
    """Train with the MIDX sampler + per-epoch codebook refresh."""
    from nexus_tpu.modules.sampler import MIDXUniformSampler
    from nexus_tpu.training.callback import SamplerRefreshCallback

    runner = RetrieverRunner(
        model_config_or_path=dict(MODEL_CFG, sampler="midx_uni", num_clusters=4),
        data_config_or_path=synth,
        train_config_or_path=train_args(tmp_path, num_train_epochs=2),
        model_class=MLPRetriever,
    )
    model = runner.model
    assert isinstance(model.negative_sampler, MIDXUniformSampler)
    # initial index build from the (random-init) item vectors
    import jax

    runner.trainer.init_state()
    model.update_sampler_index(jax.random.PRNGKey(0), runner.trainer.state_variables())
    assert model.negative_sampler.c0 is not None
    runner.trainer.callbacks.append(SamplerRefreshCallback())
    c0_before = np.asarray(model.negative_sampler.c0)
    state = runner.trainer.train(lambda: iter(runner.load_dataset()[0]))
    assert int(state.step) > 0
    # codebooks were rebuilt from trained item vectors
    assert not np.allclose(c0_before, np.asarray(model.negative_sampler.c0))


def test_popular_and_lsh_samplers_from_config(synth, tmp_path):
    """Popularity/LSH samplers wire up from the sampler= config string once
    the item dataset (with popularity counts) attaches."""
    import jax

    from nexus_tpu.modules.sampler import LSHSampler, MIDXPopSampler, PopularSampler
    from nexus_tpu.training.callback import SamplerRefreshCallback

    for name, cls in [("popular", PopularSampler), ("midx_pop", MIDXPopSampler),
                      ("lsh", LSHSampler)]:
        runner = RetrieverRunner(
            model_config_or_path=dict(MODEL_CFG, sampler=name, num_clusters=4),
            data_config_or_path=synth,
            train_config_or_path=train_args(tmp_path, max_steps=2),
            model_class=MLPRetriever,
        )
        assert isinstance(runner.model.negative_sampler, cls), name
        if name != "popular":  # quantized samplers need an index build
            runner.trainer.init_state()
            runner.model.update_sampler_index(
                jax.random.PRNGKey(0), runner.trainer.state_variables()
            )
        state = runner.trainer.train(lambda: iter(runner.load_dataset()[0]))
        assert int(state.step) > 0, name
