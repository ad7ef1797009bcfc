import numpy as np
import pytest

from nexus_tpu.dynamic_embedding.id_transformer import (
    IDTransformer,
    IDTransformerGroup,
    _load_native,
)


@pytest.fixture(params=["native", "python"])
def transformer(request):
    use_native = request.param == "native"
    if use_native and _load_native() is None:
        pytest.skip("no native lib")
    t = IDTransformer(capacity=8, use_native=use_native)
    if use_native and not t.is_native:
        pytest.skip("native build failed")
    return t


def test_basic_mapping(transformer):
    ids = np.array([100, 200, 100, 0, 300])
    slots, admitted, evicted = transformer.transform(ids)
    assert slots[3] == 0  # padding stays 0
    assert slots[0] == slots[2]  # same id -> same slot
    assert len(set(slots[[0, 1, 4]].tolist())) == 3  # distinct ids distinct slots
    assert (slots[[0, 1, 4]] > 0).all()
    assert len(admitted) == 3 and len(evicted) == 0


def test_lru_eviction(transformer):
    cap = transformer.capacity  # 8 -> 7 usable slots (slot 0 reserved)
    first = np.arange(1, 8) * 10  # fills all 7 slots
    slots1, _, ev1 = transformer.transform(first)
    assert len(ev1) == 0
    # touch id 10 making it MRU; then insert a new id -> evicts id 20 (LRU)
    transformer.transform(np.array([10]))
    slots2, admitted, evicted = transformer.transform(np.array([999]))
    assert len(evicted) == 1
    assert evicted[0][0] == 20  # least recently used
    # slot is recycled
    assert slots2[0] == evicted[0][1]
    # id 10 still resident
    s10, adm, _ = transformer.transform(np.array([10]))
    assert len(adm) == 0


def test_stats_and_dump_restore(transformer):
    transformer.transform(np.array([5, 6, 7, 5]))
    st = transformer.stats
    assert st["hits"] == 1 and st["misses"] == 3
    pairs = transformer.dump()
    assert {p[0] for p in pairs} == {5, 6, 7}

    t2 = IDTransformer(capacity=8, use_native=transformer.is_native)
    t2.restore(pairs)
    slots, admitted, _ = t2.transform(np.array([5, 6, 7]))
    assert len(admitted) == 0  # all restored as residents
    assert sorted(slots.tolist()) == sorted(p[1] for p in pairs)


def test_native_matches_python_semantics():
    if _load_native() is None:
        pytest.skip("no native lib")
    tn = IDTransformer(64, use_native=True)
    tp = IDTransformer(64, use_native=False)
    rng = np.random.default_rng(0)
    for _ in range(20):
        ids = rng.integers(0, 200, 50)
        sn, an, en = tn.transform(ids)
        sp, ap, ep = tp.transform(ids)
        # same residency behavior: same ids admitted/evicted (slot numbering
        # may differ between implementations)
        assert sorted(g for g, _ in an) == sorted(g for g, _ in ap)
        assert sorted(g for g, _ in en) == sorted(g for g, _ in ep)
        # consistency: same id within batch -> same slot
        for impl_slots in (sn, sp):
            for gid in np.unique(ids):
                if gid == 0:
                    continue
                assert len(set(impl_slots[ids == gid].tolist())) == 1


def test_group_nested_batch():
    g = IDTransformerGroup({"video_id": 16, "author_id": 16}, use_native=False)
    batch = {
        "video_id": np.array([101, 102]),
        "author_id": np.array([7, 8]),
        "age": np.array([1, 2]),
        "seq": {"video_id": np.array([[101, 0], [103, 104]])},
    }
    out, events = g.transform_batch(batch)
    assert out["age"].tolist() == [1, 2]  # untouched
    assert out["video_id"][0] == out["seq"]["video_id"][0][0]  # shared mapping
    assert out["seq"]["video_id"][0][1] == 0  # padding
    assert "video_id" in events and "author_id" in events


def test_tde_model_end_to_end(tmp_path):
    """Unbounded ids -> bounded table, with PS spill/restore round-trip."""
    import jax

    from nexus_tpu.data.attrs import DataAttr4Model, Statistics
    from nexus_tpu.dynamic_embedding.tde import TDEModel
    from nexus_tpu.training.embedder.recommendation import MLPRetriever

    CAP = 32
    stats = Statistics.from_dict({"user_id": 100, "video_id": CAP, "author_id": 50})
    attr = DataAttr4Model(
        fiid="video_id", flabels=["click"], features=["user_id", "video_id", "author_id"],
        context_features=["user_id"], item_features=["video_id", "author_id"],
        seq_features={}, seq_lengths={}, num_items=CAP, stats=stats,
    )
    model = MLPRetriever(attr, {"embedding_dim": 4, "mlp_layers": [8], "num_neg": 2,
                                "dropout": 0.0, "batch_norm": False})
    tde = TDEModel(model, {"video_id": CAP}, use_native=False)
    variables = model.init_variables(jax.random.PRNGKey(0))

    # batch with HUGE global ids (way beyond table size)
    batch = {"user_id": np.array([1, 2]), "video_id": np.array([10**12, 10**12 + 5]),
             "author_id": np.array([3, 4]), "click": np.array([1, 0])}
    new_batch, variables = tde.transform_batch(batch, variables)
    assert new_batch["video_id"].max() < CAP
    assert new_batch["user_id"].tolist() == [1, 2]

    # fill beyond capacity -> evictions spill rows to PS
    big = {"user_id": np.ones(CAP * 2, np.int64),
           "video_id": np.arange(10**9, 10**9 + CAP * 2),
           "author_id": np.ones(CAP * 2, np.int64), "click": np.zeros(CAP * 2, np.int64)}
    _, variables = tde.transform_batch(big, variables)
    assert tde.transformer_group["video_id"].stats["evictions"] > 0
    assert len(tde.ps.keys("tde:*:video_id:*")) > 0  # keys are table-scoped

    # save + restore into a fresh wrapper
    tde.tde_save(str(tmp_path / "tde.pkl"), variables)
    model2 = MLPRetriever(attr, {"embedding_dim": 4, "mlp_layers": [8], "num_neg": 2,
                                 "dropout": 0.0, "batch_norm": False})
    tde2 = TDEModel(model2, {"video_id": CAP}, ps=tde.ps, use_native=False)
    variables2 = model2.init_variables(jax.random.PRNGKey(1))
    variables2 = tde2.tde_load(str(tmp_path / "tde.pkl"), variables2)

    def rows_of(tde_obj, variables_, gid_to_slot):
        """Fetch each resident gid's row in every table containing video_id."""
        out = {}
        for path, offsets in tde_obj._layout(variables_["params"]):
            if "video_id" not in offsets:
                continue
            table = variables_["params"]
            for p in path:
                table = table[p]
            emb = np.asarray(table)
            for gid, slot in gid_to_slot.items():
                out.setdefault(gid, {})[path] = emb[offsets["video_id"] + slot]
        return out

    orig = dict(tde.transformer_group["video_id"].dump())
    restored = dict(tde2.transformer_group["video_id"].dump())
    assert set(orig) == set(restored)  # same resident ids
    rows1 = rows_of(tde, variables, orig)
    rows2 = rows_of(tde2, variables2, restored)
    for gid in list(orig)[:5]:
        for path in rows1[gid]:
            assert np.allclose(rows1[gid][path], rows2[gid][path], atol=1e-6)


def test_tde_retriever_runner_end_to_end(tmp_path):
    """Full TDE training run on synthetic data: ids transformed per batch,
    checkpoint + transformer state saved."""
    import os

    from nexus_tpu.data.synthetic import generate_synthetic_recflow
    from nexus_tpu.dynamic_embedding.runner import TDERetrieverRunner
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.recommendation import MLPRetriever

    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "ckpt"), num_train_epochs=1,
        per_device_train_batch_size=8, max_steps=3, learning_rate=0.01,
        logging_steps=10, evaluation_strategy="no",
    ))
    runner = TDERetrieverRunner(
        {"embedding_dim": 8, "mlp_layers": [16], "num_neg": 4, "dropout": 0.0, "batch_norm": False},
        cfg, targs, model_class=MLPRetriever,
        tde_features={"video_id": 2000}, use_native=False,
    )
    state = runner.run()
    assert int(state.step) > 0
    assert os.path.exists(str(tmp_path / "ckpt" / "tde_state.pkl"))
    assert runner.tde.transformer_group["video_id"].stats["misses"] > 0


def test_tde_serving_engine(tmp_path):
    """TDE u2i serving: unbounded raw ids hydrate -> transform -> encode."""
    import numpy as np

    from nexus_tpu.data.synthetic import generate_synthetic_recflow
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.dynamic_embedding.runner import TDERetrieverRunner
    from nexus_tpu.inference.feature_store import FeatureCache, MemoryKVStore
    from nexus_tpu.inference.index import ItemIndex
    from nexus_tpu.inference.tde_engine import TDEEmbedderInferenceEngine
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.recommendation import MLPRetriever

    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    ckpt = str(tmp_path / "ckpt")
    runner = TDERetrieverRunner(
        {"embedding_dim": 8, "mlp_layers": [16], "num_neg": 4, "dropout": 0.0, "batch_norm": False},
        cfg,
        TrainingArguments.from_dict(dict(output_dir=ckpt, num_train_epochs=1, max_steps=3,
                                         per_device_train_batch_size=8, learning_rate=0.01,
                                         logging_steps=10, evaluation_strategy="no")),
        model_class=MLPRetriever, tde_features={"video_id": 2000}, use_native=False,
    )
    state = runner.run()
    runner.model.update_item_vectors(state.variables)
    runner.trainer.save_model(ckpt)

    kv = MemoryKVStore()
    # move the training PS contents into the serving store
    for k in runner.tde.ps.keys("tde:*"):
        kv.set(k, runner.tde.ps.get(k))
    cache = FeatureCache(kv)
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    kv.set("user:1", cache.codec.encode({
        "user_id": 1, "device_id": 2, "age": 3, "gender": 1, "province": 4,
        "seq_effective.video_id": [11, 12, 0, 0],
        "seq_effective.author_id": [1, 2, 0, 0],
        "seq_effective.category_level_two": [1, 1, 0, 0],
        "seq_effective.category_level_one": [1, 1, 0, 0],
        "seq_effective.upload_type": [1, 1, 0, 0],
    }))
    index = ItemIndex.build(runner.model.item_vectors, index_type="flat")
    engine = TDEEmbedderInferenceEngine(
        {"model_ckpt_path": ckpt, "retrieve_mode": "u2i", "output_topk": 5,
         "tde_features": {"video_id": 2000}},
        kv_store=kv, item_index=index,
    )
    out = engine.batch_inference([1])
    assert out["item_ids"].shape == (1, 5)


# ---------------------------------------------------------------------------
# soak: collision/eviction correctness under multi-billion-scale id traffic
# ---------------------------------------------------------------------------


def test_soak_lru_invariants_vs_oracle():
    """200k zipf-ish ids drawn from a 2^62 space through a small cache:
    the native transformer must agree with the Python LRU oracle on every
    slot assignment, admission and eviction — hash collisions in the C++
    open-addressing table must never alias two live ids to one slot."""
    if _load_native() is None:
        pytest.skip("no native lib")
    cap = 257
    native = IDTransformer(capacity=cap, use_native=True)
    oracle = IDTransformer(capacity=cap, use_native=False)
    if not native.is_native:
        pytest.skip("native build failed")

    rng = np.random.default_rng(0)
    # heavy-tailed reuse over a huge sparse space (stresses the hash table)
    hot = rng.integers(1, 2**62, 300)
    for step in range(100):
        n = int(rng.integers(100, 2048))
        cold = rng.integers(1, 2**62, n)
        use_hot = rng.random(n) < 0.6
        ids = np.where(use_hot, hot[rng.integers(0, len(hot), n)], cold)
        s_n, a_n, e_n = native.transform(ids)
        s_o, a_o, e_o = oracle.transform(ids)
        np.testing.assert_array_equal(s_n, s_o)
        assert a_n == a_o, f"step {step}: admissions diverge"
        assert e_n == e_o, f"step {step}: evictions diverge"
        # live mapping is injective and bounded
        live = native.dump()
        slots = [s for _, s in live]
        assert len(slots) == len(set(slots)) <= cap - 1
        assert all(1 <= s < cap for s in slots)
    st_n, st_o = native.stats, oracle.stats
    assert st_n["evictions"] == st_o["evictions"] > 1000
    assert st_n["hits"] == st_o["hits"]
    assert st_n["misses"] == st_o["misses"]
    # event-sourced reconstruction equals the live table
    assert sorted(native.dump()) == sorted(oracle.dump())


def test_soak_spill_restore_roundtrip():
    """Rows evicted to the PS and later readmitted must carry their exact
    values back — simulated embedding table driven by transform events
    (the TDEModel spill/restore contract under heavy eviction pressure)."""
    if _load_native() is None:
        pytest.skip("no native lib")
    cap, dim = 64, 4
    t = IDTransformer(capacity=cap, use_native=True)
    table = np.zeros((cap, dim), np.float32)
    ps: dict = {}  # id -> row (the KV parameter server)
    truth: dict = {}  # id -> expected row value

    def value_of(gid):
        return np.full((dim,), float(gid % 99991), np.float32)

    rng = np.random.default_rng(1)
    pool = rng.integers(1, 2**40, 500)
    for _ in range(200):
        ids = pool[rng.integers(0, len(pool), 32)]
        slots, admitted, evicted = t.transform(ids)
        for gid, s in evicted:  # spill BEFORE overwriting the slot
            ps[gid] = table[s].copy()
        for gid, s in admitted:
            table[s] = ps.get(gid, value_of(gid))
            truth[gid] = table[s].copy()
        # every live id's slot holds its true row
        for gid, s in t.dump():
            np.testing.assert_array_equal(table[s], truth[gid])
    assert t.stats["evictions"] > 1000


def test_group_parallel_matches_serial():
    """transform_batch(parallel=True) shards features over threads and
    produces identical slots/events to the serial path."""
    caps = {"a": 32, "b": 16, "c": 64}
    g1 = IDTransformerGroup(caps, use_native=False)
    g2 = IDTransformerGroup(caps, use_native=False)
    rng = np.random.default_rng(2)
    for _ in range(20):
        batch = {
            "ctx": {"a": rng.integers(0, 1000, (8,)), "b": rng.integers(0, 500, (8, 3))},
            "item": {"c": rng.integers(0, 2000, (8,))},
            "label": np.ones((8,)),
        }
        out1, ev1 = g1.transform_batch(batch, parallel=True)
        out2, ev2 = g2.transform_batch(batch, parallel=False)
        for k in ("a", "b"):
            np.testing.assert_array_equal(out1["ctx"][k], out2["ctx"][k])
        np.testing.assert_array_equal(out1["item"]["c"], out2["item"]["c"])
        np.testing.assert_array_equal(out1["label"], batch["label"])
        assert ev1 == ev2


def test_tde_standalone_eval_runner(tmp_path):
    """Checkpoint-based TDE eval: transformer state + PS rows restored from
    disk, corpus encoded under per-chunk transforms, metrics finite (parity:
    Nexus/evaluation/recommendation/tde_runner.py)."""
    import os

    import numpy as np

    from nexus_tpu.data.synthetic import generate_synthetic_recflow
    from nexus_tpu.dynamic_embedding.runner import TDERetrieverRunner
    from nexus_tpu.evaluation.recommendation import TDERecommenderEvalRunner
    from nexus_tpu.inference.feature_store import MemoryKVStore
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.recommendation import MLPRetriever

    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    ckpt = str(tmp_path / "ckpt")
    runner = TDERetrieverRunner(
        {"embedding_dim": 8, "mlp_layers": [16], "num_neg": 4, "dropout": 0.0,
         "batch_norm": False},
        cfg,
        TrainingArguments.from_dict(dict(output_dir=ckpt, num_train_epochs=1, max_steps=4,
                                         per_device_train_batch_size=8, learning_rate=0.01,
                                         logging_steps=10, evaluation_strategy="no")),
        model_class=MLPRetriever, tde_features={"video_id": 2000}, use_native=False,
    )
    state = runner.run()
    runner.model.update_item_vectors(state.variables)
    runner.trainer.save_model(ckpt)
    assert os.path.exists(os.path.join(ckpt, "tde_ps.pkl"))

    # fresh "process": everything restored from disk
    ev = TDERecommenderEvalRunner(
        cfg, tde_features={"video_id": 2000},
        ps=MemoryKVStore.load(os.path.join(ckpt, "tde_ps.pkl")),
        use_native=False, retriever_ckpt_path=ckpt,
        metrics=["ndcg", "recall"], cutoffs=[5],
    )
    out = ev.run()
    assert "retriever" in out and np.isfinite(list(out["retriever"].values())).all()
    # chunked transformed corpus encode matches the capacity invariant
    assert ev._tde["retriever"].transformer_group["video_id"].stats["size"] <= 2000


def test_tde_reranker_serving_engine(tmp_path):
    """TDE ranker serving: unbounded ids in context + candidates transform
    through the restored state before the compiled predict."""
    import numpy as np

    from nexus_tpu.data.dataset import ItemDataset
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.data.synthetic import generate_synthetic_recflow
    from nexus_tpu.dynamic_embedding.runner import TDERankerRunner
    from nexus_tpu.inference.feature_store import FeatureCache, MemoryKVStore
    from nexus_tpu.inference.tde_engine import TDERerankerInferenceEngine
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.reranker.recommendation import MLPRanker

    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    ckpt = str(tmp_path / "ckpt")
    runner = TDERankerRunner(
        {"embedding_dim": 8, "mlp_layers": [16], "dropout": 0.0, "batch_norm": False},
        cfg,
        TrainingArguments.from_dict(dict(output_dir=ckpt, num_train_epochs=1, max_steps=3,
                                         per_device_train_batch_size=8, learning_rate=0.01,
                                         logging_steps=10, evaluation_strategy="no")),
        model_class=MLPRanker, tde_features={"video_id": 2000}, use_native=False,
    )
    runner.run()

    kv = MemoryKVStore()
    cache = FeatureCache(kv)
    kv.set("user:1", cache.codec.encode({
        "user_id": 1, "device_id": 2, "age": 3, "gender": 1, "province": 4,
        "seq_effective.video_id": [11, 12, 0, 0],
        "seq_effective.author_id": [1, 2, 0, 0],
        "seq_effective.category_level_two": [1, 1, 0, 0],
        "seq_effective.category_level_one": [1, 1, 0, 0],
        "seq_effective.upload_type": [1, 1, 0, 0],
    }))
    engine = TDERerankerInferenceEngine(
        {"model_ckpt_path": ckpt, "output_topk": 3, "tde_features": {"video_id": 2000}},
        kv_store=kv,
    )
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    table = ItemDataset(train_cfg).item_feature_table()
    cand_ids = np.array([[5, 9, 13, 21, 34]])
    candidates = {f: table[f][cand_ids] for f in train_cfg.item_features}
    out = engine.batch_inference([1], candidates)
    assert out["item_ids"].shape == (1, 3)
    assert set(out["item_ids"][0]) <= set(cand_ids[0])


def test_eval_rereads_state_per_batch():
    """RecTrainer.evaluate must re-read trainer._state per batch: TDE eval
    loaders swap PS-spilled cache rows into the state as the iterator admits
    evicted ids; a one-time snapshot would score stale embedding rows."""
    import jax
    import jax.numpy as jnp

    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.trainer import RecTrainer

    class _ProbeModel:
        """eval_step returns the current value of params['w'] — so the test
        observes WHICH state snapshot each batch was scored with."""

        def init_variables(self, rng):
            return {"params": {"w": jnp.zeros((1,), jnp.float32)}}

        def loss_fn(self, variables, batch, rng):
            return jnp.sum(variables["params"]["w"]), {"batch_stats": None}

        def eval_step(self, variables, batch):
            v = variables["params"]["w"][0]
            return jnp.full((1,), v), batch["y"][:1]

        def eval_context(self, variables):
            return {}

        def compute_metrics(self, pred, target):
            return {"pred_sum": float(np.sum(pred))}

    trainer = RecTrainer(_ProbeModel(), TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_probe_eval", num_train_epochs=1,
        per_device_train_batch_size=1, learning_rate=0.1,
        evaluation_strategy="no")))
    trainer.init_state()

    class _MutatingLoader:
        """Bumps params['w'] before each yielded batch (the TDE
        transform_batch pattern)."""

        def __iter__(self):
            for i in range(3):
                st = trainer._state
                new_params = {"w": jnp.full((1,), float(i + 1))}
                trainer._state = st.replace(params=new_params)
                yield {"y": np.zeros((1,), np.float32)}

    m = trainer.evaluate(_MutatingLoader())
    # per-batch re-read sees w = 1, 2, 3 -> sum 6; a stale snapshot sees 0
    assert m["pred_sum"] == 6.0, m
