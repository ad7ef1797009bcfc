"""Quality contract on TRAINED embedding geometry (VERDICT r3 item 6).

The int8 cosine / neighbor-order checks and the IVF recall tests elsewhere
run on random weights, whose embeddings are isotropic — friendly to both
quantization and clustering. Trained contrastive embeddings are anisotropic
(dominant directions, cluster structure), which is exactly where per-row
int8 and coarse quantizers degrade. This file trains the tiny in-repo
embedder to convergence on a clustered synthetic corpus and re-asserts the
serving headline's quality contract on ITS embeddings:

  1. the contrastive training actually converged (loss; retrieval works),
  2. int8 per-row corpus quantization keeps cosine + top-10 neighbor order,
  3. IVF (int8 cells) keeps recall@10 vs the exact scan,
  4. the host-tiered index agrees with the on-device IVF path.

No reference counterpart (its quality checks also use random fixtures).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.models.bert import BertConfig

N_TOPICS = 16
WORDS_PER_TOPIC = 12
VOCAB = 4 + N_TOPICS * WORDS_PER_TOPIC  # 0 pad, 1 cls, 2-3 unused
SEQ = 16


def _sample_doc(rng, topic: int, n: int = 12) -> np.ndarray:
    """A doc = CLS + words drawn mostly from its topic's slice (plus noise)."""
    own = 4 + topic * WORDS_PER_TOPIC + rng.integers(0, WORDS_PER_TOPIC, n)
    noise = 4 + rng.integers(0, N_TOPICS * WORDS_PER_TOPIC, n)
    words = np.where(rng.random(n) < 0.8, own, noise)
    ids = np.zeros((SEQ,), np.int32)
    ids[0] = 1
    ids[1 : 1 + n] = words
    return ids


@pytest.fixture(scope="module")
def trained():
    """Train the tiny bi-encoder ~150 contrastive steps; return
    (model, variables, corpus_embs [512, D], corpus_topics, query_embs)."""
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.modeling import (
        BiTextEmbedderModel,
    )
    from nexus_tpu.training.trainer import RecTrainer

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=SEQ, add_pooling_layer=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    margs = TextEmbedderModelArguments(
        temperature=0.05, dtype="float32", normalize_embeddings=True,
        sentence_pooling_method="cls",
    )
    model = BiTextEmbedderModel(cfg, margs)
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_trained_geom", num_train_epochs=1,
        per_device_train_batch_size=32, learning_rate=2e-3,
        optimizer="adamw", logging_steps=10_000, evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    trainer.init_state()
    step_fn = trainer._build_train_step()

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    state = trainer._state
    first = last = None
    for step in range(150):
        topics = rng.integers(0, N_TOPICS, 32)
        batch = {
            "query_input_ids": jnp.asarray([_sample_doc(rng, t, 6) for t in topics]),
            "passage_input_ids": jnp.asarray([_sample_doc(rng, t) for t in topics]),
        }
        batch["query_attention_mask"] = (batch["query_input_ids"] != 0).astype(jnp.int32)
        batch["passage_attention_mask"] = (batch["passage_input_ids"] != 0).astype(jnp.int32)
        state, metrics = step_fn(state, batch, key)
        if step == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)  # converged, not just ran

    variables = jax.device_get(state.params)
    variables = {"params": variables}
    corpus_topics = rng.integers(0, N_TOPICS, 512)
    corpus_ids = jnp.asarray([_sample_doc(rng, t) for t in corpus_topics])
    qs_topics = corpus_topics[:32]
    query_ids = jnp.asarray([_sample_doc(rng, t, 6) for t in qs_topics])

    def enc(ids):
        return np.asarray(model.encode(
            variables, ids, (ids != 0).astype(jnp.int32)))

    return model, variables, enc(corpus_ids), corpus_topics, enc(query_ids)


def _topk_overlap(a_ids: np.ndarray, b_ids: np.ndarray, k: int) -> float:
    return float(np.mean([
        len(set(map(int, a_ids[i, :k])) & set(map(int, b_ids[i, :k]))) / k
        for i in range(a_ids.shape[0])
    ]))


def test_training_produced_anisotropic_retrieval_geometry(trained):
    _, _, corpus, topics, queries = trained
    # retrieval works: a query's nearest corpus docs share its topic
    sims = queries @ corpus.T
    top = np.argsort(-sims, axis=-1)[:, :5]
    frac_same_topic = np.mean(topics[top] == topics[:32, None])
    assert frac_same_topic > 0.9, frac_same_topic
    # and the geometry really is anisotropic (trained collapse of variance
    # into few directions — the regime random-weight tests never cover)
    sv = np.linalg.svd(corpus - corpus.mean(0), compute_uv=False)
    energy_top4 = float((sv[:4] ** 2).sum() / (sv**2).sum())
    assert energy_top4 > 0.35, energy_top4


def test_int8_quantization_on_trained_embeddings(trained):
    from nexus_tpu.inference.index import _quantize_rows_int8

    _, _, corpus, _, queries = trained
    q8, scales = _quantize_rows_int8(jnp.asarray(corpus))
    deq = np.asarray(q8, np.float32) * np.asarray(scales)[:, None]
    cos = np.sum(deq * corpus, -1) / (
        np.linalg.norm(deq, axis=-1) * np.linalg.norm(corpus, axis=-1))
    assert cos.min() > 0.995, cos.min()
    # neighbor ORDER on the trained geometry survives quantization
    exact = np.argsort(-(queries @ corpus.T), axis=-1)
    quant = np.argsort(-(queries @ deq.T), axis=-1)
    assert _topk_overlap(exact, quant, 10) >= 0.9


def test_ivf_recall_on_trained_embeddings(trained):
    from nexus_tpu.inference.index import HostTieredIVFIndex, ItemIndex

    _, _, corpus, _, queries = trained
    exact = ItemIndex.build(corpus, index_type="flat")
    _, i_exact = exact.search(queries, k=10)

    ivf = ItemIndex.build(corpus, index_type="ivf", nlist=32, nprobe=8,
                          storage="int8")
    _, i_ivf = ivf.search(queries, k=10)
    recall = _topk_overlap(i_exact, i_ivf, 10)
    assert recall >= 0.9, recall

    tiered = HostTieredIVFIndex(ivf, chunk_cells=4)
    s_dev, i_dev = ivf.search(queries, k=10)
    s_t, i_t = tiered.search(queries, k=10)
    assert (i_dev == i_t).all()
    np.testing.assert_allclose(s_dev, s_t, rtol=1e-5, atol=1e-5)
