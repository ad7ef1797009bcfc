import numpy as np
import pytest

import jax.numpy as jnp

from nexus_tpu.inference.feature_store import FeatureCache, FeatureCodec, MemoryKVStore
from nexus_tpu.inference.index import ItemIndex, gen_i2i_index, gen_item_index
from nexus_tpu.inference.session import AOTSession, NormalSession, get_inference_session


def _fn(a, b):
    return (a * 2 + b).astype(np.float32).sum(axis=-1)


def test_normal_session():
    s = NormalSession(lambda a, b: a + b, ["a", "b"])
    out = s.run(None, {"a": np.ones((2, 3), np.int32), "b": np.ones((2, 3), np.int32)})
    assert np.asarray(out[0]).sum() == 12


def test_aot_session_bucketing():
    buckets = [
        {"a": (4, 8), "b": (4, 8)},
        {"a": (8, 16), "b": (8, 16)},
    ]
    s = AOTSession(lambda a, b: (a + b).sum(axis=-1), ["a", "b"], buckets)
    # input smaller than smallest bucket -> padded to (4, 8), sliced back
    out = s.run(None, {"a": np.ones((3, 5), np.int32), "b": np.ones((3, 5), np.int32)})[0]
    assert out.shape == (3,)
    assert (out == 10).all()  # 5 valid cols * 2 (pad contributes 0)
    # larger input picks the bigger bucket
    out = s.run(None, {"a": np.ones((7, 12), np.int32), "b": np.ones((7, 12), np.int32)})[0]
    assert out.shape == (7,)
    # too large -> clear error
    with pytest.raises(ValueError):
        s.run(None, {"a": np.ones((9, 4), np.int32), "b": np.ones((9, 4), np.int32)})


def test_aot_session_serialize_roundtrip(tmp_path):
    buckets = [{"a": (2, 4), "b": (2, 4)}]
    s = AOTSession(lambda a, b: a * b, ["a", "b"], buckets)
    blob = s.serialize()
    s2 = AOTSession.deserialize(blob)
    feed = {"a": np.full((2, 4), 3, np.int32), "b": np.full((2, 4), 2, np.int32)}
    assert np.allclose(s2.run(None, feed)[0], 6)


def test_get_inference_session_dispatch():
    assert isinstance(get_inference_session(lambda a: a, ["a"]), NormalSession)
    s = get_inference_session(
        lambda a: a, ["a"], infer_mode="tensorrt", buckets=[{"a": (2, 2)}]
    )
    assert isinstance(s, AOTSession)
    with pytest.raises(ValueError):
        get_inference_session(lambda a: a, ["a"], infer_mode="tensorrt")


def test_item_index_flat_and_ivf(key):
    import jax

    vecs = np.array(jax.random.normal(key, (500, 16)))
    vecs = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)  # IP == cosine
    q = vecs[:5] + 0.01  # queries near items 0..4
    flat = ItemIndex.build(vecs, index_type="flat")
    scores, ids = flat.search(q, k=3)
    assert (ids[:, 0] == np.arange(5)).all()

    ivf = ItemIndex.build(vecs, index_type="ivf", nlist=10, nprobe=5)
    s2, ids2 = ivf.search(q, k=3)
    # nearest neighbor recall@1 of IVF with half the lists probed
    assert (ids2[:, 0] == np.arange(5)).mean() >= 0.8

    cos = ItemIndex.build(vecs, metric="cosine")
    s3, ids3 = cos.search(q, k=3)
    assert ids3.shape == (5, 3)


def test_item_index_save_load(tmp_path, key):
    import jax

    vecs = np.asarray(jax.random.normal(key, (100, 8)))
    idx = ItemIndex.build(vecs, index_type="ivf", nlist=5, nprobe=3)
    p = str(tmp_path / "index.npz")
    idx.save(p)
    idx2 = ItemIndex.load(p)
    q = vecs[:3]
    _, a = idx.search(q, 5)
    _, b = idx2.search(q, 5)
    assert (a == b).all()


def test_gen_item_index_and_i2i(tmp_path, key):
    import jax

    vecs = np.asarray(jax.random.normal(key, (64, 8)))
    idx = gen_item_index(vecs, str(tmp_path / "idx.npz"), index_type="flat")
    kv = MemoryKVStore()
    gen_i2i_index(vecs, kv, topk=5)
    blob = kv.get("i2i:0")
    neighbors = [int(x) for x in blob.decode().split(",")]
    assert len(neighbors) == 5 and 0 not in neighbors


def test_feature_codec_roundtrip():
    codec = FeatureCodec()
    row = {"user_id": 7, "age": 3, "seq.video_id": [1, 2, 3]}
    decoded = codec.decode(codec.encode(row))
    assert int(decoded["user_id"]) == 7
    assert [int(x) for x in decoded["seq.video_id"]] == [1, 2, 3]


def test_feature_cache_mget():
    kv = MemoryKVStore()
    cache = FeatureCache(kv)
    rows = [{"user_id": i, "age": i % 5} for i in range(10)]
    assert cache.insert_rows("user:{}", "user_id", rows) == 10
    fetched = cache.fetch("user:{}", [3, 7, 99])
    assert int(fetched[0]["age"]) == 3
    assert fetched[2] == {}  # missing key -> empty dict


def test_multichip_sharded_encode(tmp_path):
    """Multi-chip encode parity (replaces the reference's per-GPU process
    pool): the same texts encode identically through a single-device session
    and a batch-sharded 8-device mesh session."""
    pytest.importorskip("torch")
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "m"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b", "c", "d"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=32)).save_pretrained(str(d))

    from nexus_tpu.inference import TextEmbedder
    from nexus_tpu.parallel.mesh import get_default_mesh

    texts = [f"a b c d a b"[: 3 + i % 6] for i in range(13)]  # ragged batch
    single = TextEmbedder(model_name_or_path=str(d), batch_size=8, max_length=16)
    sharded = TextEmbedder(model=single.model, tokenizer=single.tokenizer,
                           batch_size=8, max_length=16, mesh=get_default_mesh())
    r1 = single.encode_corpus(texts)
    r2 = sharded.encode_corpus(texts)
    assert r1.shape == r2.shape == (13, 32)
    assert np.allclose(r1, r2, atol=1e-5)


def test_encode_stream_matches_encode(tmp_path):
    """Pipelined encode_stream (tokenize n+1 overlapping device n) yields
    the same embeddings as batch encode, packed and dense paths alike."""
    pytest.importorskip("torch")
    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "m"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b", "c", "d"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=32)).save_pretrained(str(d))

    from nexus_tpu.inference import TextEmbedder

    batches = [
        [f"a b c d"[: 2 + (i + j) % 5] for i in range(5 + j)] for j in range(3)
    ]
    for packing in (False, True):
        emb = TextEmbedder(model_name_or_path=str(d), batch_size=4, max_length=16,
                           packing=packing)
        streamed = list(emb.encode_stream(batches))
        assert len(streamed) == len(batches)
        for got, sentences in zip(streamed, batches):
            want = emb.encode(sentences)
            np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"packing={packing}")


def test_encode_output_dtype_fp16(tmp_path):
    """output_dtype='float16' halves the result payload with <=1e-3
    per-component deviation on normalized embeddings (transfer-bound
    serving hosts opt in)."""
    pytest.importorskip("torch")
    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "m"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b", "c"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=32)).save_pretrained(str(d))

    from nexus_tpu.inference import TextEmbedder

    texts = ["a b c", "c b", "a"]
    for packing in (False, True):
        f32 = TextEmbedder(model_name_or_path=str(d), batch_size=4, max_length=16,
                           packing=packing)
        f16 = TextEmbedder(model=f32.model, tokenizer=f32.tokenizer, batch_size=4,
                           max_length=16, packing=packing, output_dtype="float16")
        a = f32.encode(texts)
        b = f16.encode(texts)
        assert b.dtype == np.float16
        np.testing.assert_allclose(a, b.astype(np.float32), atol=1e-3)


def test_ivf_int8_storage(key):
    """int8 cell storage: 4x memory saving with near-exact recall (per-row
    symmetric quant, scales applied after the matmul)."""
    import jax

    vecs = np.asarray(jax.random.normal(key, (3000, 32)))
    q = vecs[:8] + 0.01
    dense = ItemIndex.build(vecs, index_type="ivf", nlist=32, nprobe=16)
    quant = ItemIndex.build(vecs, index_type="ivf", nlist=32, nprobe=16, storage="int8")
    assert quant.vectors.dtype == np.int8 and quant.row_scales is not None
    _, a = dense.search(q, k=10)
    _, b = quant.search(q, k=10)
    overlap = np.mean([len(set(a[i]) & set(b[i])) / 10 for i in range(8)])
    assert overlap >= 0.9, overlap
    assert (b[:, 0] == np.arange(8)).mean() >= 0.9

    # save/load roundtrip keeps the quantized layout
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        quant.save(f"{d}/idx.npz")
        loaded = ItemIndex.load(f"{d}/idx.npz")
        _, c = loaded.search(q, k=10)
        assert (b == c).all()


def test_sharded_ivf_matches_single_device(key):
    """8-device mesh IVF: subcells round-robin over the data axis, local
    union-scan + one all_gather merge == the single-index result set."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from nexus_tpu.inference.index import ShardedIVFIndex
    from nexus_tpu.parallel.mesh import get_default_mesh

    vecs = np.asarray(jax.random.normal(key, (4000, 32)))
    q = vecs[:6] + 0.01
    base = ItemIndex.build(vecs, index_type="ivf", nlist=64, nprobe=64)
    sharded = ShardedIVFIndex(base, get_default_mesh())
    s_single, i_single = base.search(q, k=10)
    s_shard, i_shard = sharded.search(q, k=10)
    # same probe set -> same candidates; ids may tie-order differ
    for r in range(6):
        assert set(i_single[r]) == set(i_shard[r]), r
    np.testing.assert_allclose(np.sort(s_single, -1), np.sort(s_shard, -1), atol=1e-4)

    # int8 sharded variant
    base_q = ItemIndex.build(vecs, index_type="ivf", nlist=64, nprobe=64, storage="int8")
    sharded_q = ShardedIVFIndex(base_q, get_default_mesh())
    _, i_q = sharded_q.search(q, k=10)
    overlap = np.mean([len(set(i_shard[r]) & set(i_q[r])) / 10 for r in range(6)])
    assert overlap >= 0.9, overlap


def test_streamed_build_matches_in_memory(key):
    """build_streamed (constant-memory 3-pass over chunks) produces the SAME
    index layout and search results as build() given identical centroids —
    the at-scale build path (ROADMAP: corpora exceeding host memory)."""
    import numpy as np

    rng = np.random.default_rng(3)
    n, d = 700, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cents = rng.standard_normal((12, d)).astype(np.float32)

    base = ItemIndex.build(vecs, index_type="ivf", nlist=12, nprobe=6,
                           storage="int8", centroids=cents)

    def chunks():
        for off in range(0, n, 128):
            yield vecs[off : off + 128]

    streamed = ItemIndex.build_streamed(chunks, nprobe=6, storage="int8",
                                        centroids=cents)
    np.testing.assert_array_equal(np.asarray(base.vectors), np.asarray(streamed.vectors))
    np.testing.assert_array_equal(base.item_ids, streamed.item_ids)
    np.testing.assert_allclose(np.asarray(base.row_scales), np.asarray(streamed.row_scales),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(base.cluster_items), np.asarray(streamed.cluster_items))
    np.testing.assert_array_equal(np.asarray(base.cluster_counts), np.asarray(streamed.cluster_counts))

    q = rng.standard_normal((4, d)).astype(np.float32)
    s1, i1 = base.search(q, 10)
    s2, i2 = streamed.search(q, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_streamed_build_self_kmeans(key):
    """Without given centroids, build_streamed trains k-means on a reservoir
    sample and still reaches exact-search recall on clustered data."""
    import numpy as np

    rng = np.random.default_rng(4)
    cents = rng.standard_normal((8, 16)).astype(np.float32) * 5
    labels = rng.integers(0, 8, 600)
    vecs = (cents[labels] + 0.3 * rng.standard_normal((600, 16))).astype(np.float32)

    def chunks():
        for off in range(0, 600, 100):
            yield vecs[off : off + 100]

    idx = ItemIndex.build_streamed(chunks, nlist=8, nprobe=8, storage="int8",
                                   kmeans_train_size=256, seed=1)
    flat = ItemIndex.build(vecs, index_type="flat")
    q = vecs[:8] + 0.05 * rng.standard_normal((8, 16)).astype(np.float32)
    _, ids_ivf = idx.search(q, 10)
    _, ids_flat = flat.search(q, 10)
    recall = np.mean([
        len(set(ids_ivf[i]) & set(ids_flat[i])) / 10 for i in range(8)
    ])
    assert recall > 0.9, recall


def test_engine_attention_impl_override(tmp_path):
    """TextEmbedder(attention_impl=...) flips the checkpoint's attention
    path at serve time; embeddings stay identical across impls on a ragged
    right-padded batch."""
    pytest.importorskip("torch")
    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "m"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b", "c", "d"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=128, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=128,
                  max_position_embeddings=32)).save_pretrained(str(d))

    from nexus_tpu.inference import TextEmbedder

    texts = ["a b c", "a", "d c b a d c b a", "b d"]
    reps = {}
    for impl in ("xla", "fused"):
        e = TextEmbedder(model_name_or_path=str(d), batch_size=4,
                         max_length=16, attention_impl=impl)
        assert e.model.bert_config.attention_impl == impl
        reps[impl] = e.encode(texts)
    # bf16 checkpoint (from_pretrained default): cross-impl noise ~7e-4
    np.testing.assert_allclose(reps["xla"], reps["fused"], atol=2e-3)


def test_host_tiered_ivf_matches_ondevice():
    """HostTieredIVFIndex (cells resident on host, probed cells streamed to
    the device) must return the SAME results as the all-on-device IVF search
    with full probing, and recall@10 1.0 vs exact."""
    import jax

    from nexus_tpu.inference.index import HostTieredIVFIndex

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((4000, 32)).astype(np.float32)
    q = vecs[:8] + 0.01
    exact = ItemIndex.build(vecs, index_type="flat")
    _, i_exact = exact.search(q, k=10)

    for storage in ("dense", "int8"):
        base = ItemIndex.build(vecs, index_type="ivf", nlist=64, nprobe=64,
                               storage=storage)
        s_dev, i_dev = base.search(q, k=10)
        tiered = HostTieredIVFIndex(base, chunk_cells=8)
        timers = {}
        s_t, i_t = tiered.search(q, k=10, timers=timers)
        np.testing.assert_allclose(np.sort(s_dev, -1), np.sort(s_t, -1),
                                   rtol=1e-5, atol=1e-5)
        recall = np.mean([len(set(map(int, i_exact[r])) & set(map(int, i_t[r]))) / 10
                          for r in range(len(q))])
        # int8 loses a little vs exact f32 to quantization (score parity vs
        # the on-device int8 path above is the strict contract)
        assert recall >= (0.99 if storage == "dense" else 0.95), (storage, recall)
        assert timers["cells"] == 64  # full probe visits every cell once
        assert timers["score"] > 0 and timers["transfer"] >= 0

    # partial probing parity with the on-device path at the same nprobe
    base = ItemIndex.build(vecs, index_type="ivf", nlist=64, nprobe=8,
                           storage="int8")
    tiered = HostTieredIVFIndex(base, chunk_cells=4)
    s_dev, i_dev = base.search(q, k=5)
    s_t, i_t = tiered.search(q, k=5)
    # same probed cells -> same candidate set -> identical results
    assert (i_dev == i_t).all()
    np.testing.assert_allclose(s_dev, s_t, rtol=1e-5, atol=1e-5)


def test_tiered_sharded_ivf_composition():
    """TieredShardedIVFIndex (the 100M north-star layout: subcells
    round-robin over shards, each shard host-tiered) matches exact search —
    recall@10 >= 0.99 and score parity — for dense and int8 storage."""
    from nexus_tpu.inference.index import TieredShardedIVFIndex

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((4000, 32)).astype(np.float32)
    q = vecs[:8] + 0.01
    exact = ItemIndex.build(vecs, index_type="flat")
    s_e, i_e = exact.search(q, k=10)
    for storage in ("dense", "int8"):
        base = ItemIndex.build(vecs, index_type="ivf", nlist=64, nprobe=64,
                               storage=storage)
        tiered = TieredShardedIVFIndex(base, n_shards=8, chunk_cells=4)
        times = []
        s_t, i_t = tiered.search(q, k=10, per_shard_times=times)
        assert len(times) == 8 and all(t > 0 for t in times)
        recall = np.mean(
            [len(set(map(int, i_e[r])) & set(map(int, i_t[r]))) / 10
             for r in range(len(q))])
        assert recall >= (0.99 if storage == "dense" else 0.95), (storage, recall)
        if storage == "dense":
            np.testing.assert_allclose(np.sort(s_e, -1), np.sort(s_t, -1),
                                       rtol=1e-5, atol=1e-5)


def test_host_tiered_consumer_failure_joins_producer():
    """If the device scoring leg raises, the producer thread must not stay
    blocked on the bounded queue (round-4 advisor finding): the search
    raises, and the producer exits promptly."""
    import threading

    from nexus_tpu.inference.index import HostTieredIVFIndex

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((2000, 16)).astype(np.float32)
    base = ItemIndex.build(vecs, index_type="ivf", nlist=32, nprobe=32)
    tiered = HostTieredIVFIndex(base, chunk_cells=1, prefetch=1)
    n_before = threading.active_count()

    boom = RuntimeError("score leg failed")

    def bad_score(b, k):
        def fn(*a, **kw):
            raise boom
        return fn

    tiered._score_fn = bad_score
    with pytest.raises(RuntimeError, match="score leg failed"):
        tiered.search(vecs[:4], k=5)
    # producer joined (with many chunks + prefetch=1 it WOULD have blocked
    # on put() forever before the fix)
    import time as _t

    deadline = _t.monotonic() + 10
    while threading.active_count() > n_before and _t.monotonic() < deadline:
        _t.sleep(0.05)
    assert threading.active_count() <= n_before
