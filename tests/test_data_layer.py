import numpy as np
import pytest

from nexus_tpu.data.dataset import (
    ItemDataset,
    ShardedDataset,
    calc_slice_position,
    compute_item_popularity,
)
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.data.synthetic import generate_synthetic_recflow


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    cfg_path = generate_synthetic_recflow(str(root), n_days=3, rows_per_day=512, seq_len=6)
    return cfg_path


def test_config_split(synth):
    proc = ConfigProcessor(synth)
    train_cfg, eval_cfg = proc.split_config()
    assert len(train_cfg.files) == 2  # days 1-2 train
    assert len(eval_cfg.files) == 1  # last day eval
    attr = train_cfg.to_attr()
    assert attr.fiid == "video_id"
    assert attr.seq_lengths == {"seq_effective": 6}
    assert attr.num_items == 2000


def test_sharded_dataset_batches(synth):
    train_cfg, _ = ConfigProcessor(synth).split_config()
    ds = ShardedDataset(train_cfg, batch_size=128, shuffle=True, drop_last=True)
    batches = list(ds)
    assert len(batches) == 8  # 1024 rows / 128
    b = batches[0]
    assert b["user_id"].shape == (128,)
    assert b["effective_view"].shape == (128,)
    assert b["seq_effective"]["video_id"].shape == (128, 6)
    # seq padding uses 0
    assert (b["seq_effective"]["video_id"] >= 0).all()


def test_sharded_dataset_rank_partition(synth):
    train_cfg, _ = ConfigProcessor(synth).split_config()
    seen = []
    for rank in range(2):
        ds = ShardedDataset(train_cfg, batch_size=64, rank=rank, world_size=2, drop_last=True)
        for b in ds:
            seen.append(b["request_id"])
    all_ids = np.concatenate(seen)
    # no duplicates across ranks
    assert len(np.unique(all_ids)) == len(all_ids)
    assert len(all_ids) == 1024  # both days fully covered


def test_eval_padding(synth):
    _, eval_cfg = ConfigProcessor(synth).split_config()
    ds = ShardedDataset(eval_cfg, batch_size=100, drop_last=False)
    batches = list(ds)
    total = sum(int(b.get("_nvalid", b["user_id"].shape[0])) for b in batches)
    assert total == 512
    assert batches[-1]["user_id"].shape == (100,)  # padded to static shape


def test_item_dataset(synth):
    train_cfg, _ = ConfigProcessor(synth).split_config()
    items = ItemDataset(train_cfg)
    assert len(items) == 2000
    table = items.item_feature_table()
    assert table["video_id"].shape == (2000,)
    assert table["author_id"].shape == (2000,)
    pop = compute_item_popularity(ShardedDataset(train_cfg, batch_size=1), "video_id")
    assert sum(pop.values()) == 1024


def test_calc_slice_position_covers_all_rows():
    # all rows assigned exactly once across slices
    n, workers, bs = 1003, 4, 32
    spans = [calc_slice_position(n, i, workers, bs, False) for i in range(workers)]
    covered = sorted((s, e) for s, e, _ in spans)
    assert covered[0][0] == 0
    for (s1, e1), (s2, e2) in zip(covered, covered[1:]):
        assert e1 == s2
    assert covered[-1][1] == n


def test_filter_settings(synth):
    """process_conditions-driven row filtering (reference filter_settings)."""
    import copy

    train_cfg, _ = ConfigProcessor(synth).split_config()
    cfg = copy.deepcopy(train_cfg)
    cfg.filter_settings = {"by": "effective_view", "filter_conditions": [">=1"]}
    ds = ShardedDataset(cfg, batch_size=32, drop_last=False)
    rows = 0
    for b in ds:
        nv = int(b.get("_nvalid", len(b["user_id"])))
        assert (b["effective_view"][:nv] >= 1).all()
        rows += nv
    assert 0 < rows < 1024  # some rows filtered out


def test_same_dataset_within_batch_merge_and_drop(tmp_path):
    import json

    from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderDataArguments
    from nexus_tpu.training.embedder.text_retrieval.dataset import TextEmbedderTrainDataset

    def write(name, n):
        p = tmp_path / name
        with open(p, "w") as f:
            for i in range(n):
                f.write(json.dumps({"query": f"q{i}", "pos": [f"p{i}"], "neg": ["n"]}) + "\n")
        return str(p)

    big = write("big.jsonl", 20)
    small = write("small.jsonl", 6)
    tiny = write("tiny.jsonl", 2)
    args = TextEmbedderDataArguments(
        train_data=[big, small, tiny], train_group_size=2,
        same_dataset_within_batch=True, small_threshold=10, drop_threshold=4,
    )
    ds = TextEmbedderTrainDataset(args)
    # big kept; small (6 >= drop 4, < small 10) merged; tiny (2 < 4) dropped
    assert "big.jsonl" in ds.dataset_names
    assert "_merged_small" in ds.dataset_names
    assert len(ds) == 26
    # batches are homogeneous: queries within one batch share a source
    for group in ds.iter_batches(4):
        texts = {e["query"][0] for e in group}
        assert len(group) == 4


def test_row_group_streaming(tmp_path):
    """Row-group-aware scan: only the groups overlapping this rank's slice
    are read, one at a time (constant memory — parity target: reference
    dataset.py:172-226); coverage identical to the whole-file path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nexus_tpu.data.processor import DataArguments

    n = 1000
    path = tmp_path / "data"
    path.mkdir()
    table = pa.table({
        "user_id": pa.array(np.arange(n)),
        "video_id": pa.array(np.arange(n) % 50 + 1),
        "label": pa.array((np.arange(n) % 2).astype(np.float32)),
        # variable-length list column exercises the offsets-based conversion
        "tags": pa.array([[int(i % 7)] * (i % 5 + 1) for i in range(n)]),
    })
    pq.write_table(table, str(path / "2024-01-01.parquet"), row_group_size=100)

    args = DataArguments.from_dict(dict(
        type="file", url=str(path), context_features=["user_id", "tags"],
        item_features=["video_id"], labels=["label"],
        item_col="video_id", stats={"user_id": n, "video_id": 51, "tags": 8},
    ))
    args.files = [str(path / "2024-01-01.parquet")]

    read_groups = []

    def spying(ds):
        orig = ds.client.parquet_file

        def wrap(p):
            pf = orig(p)

            class Spy:
                metadata = pf.metadata

                def read_row_group(self, g, columns=None):
                    read_groups.append(g)
                    return pf.read_row_group(g, columns=columns)

            return Spy()

        ds.client.parquet_file = wrap
        return ds

    # rank 1 of 2: rows [500, 1000) -> only row groups 5..9 are read
    ds = spying(ShardedDataset(args, batch_size=64, rank=1, world_size=2, drop_last=False))
    batches = list(ds)
    assert sorted(set(read_groups)) == [5, 6, 7, 8, 9]
    rows = np.concatenate([
        b["user_id"][: int(b.get("_nvalid", len(b["user_id"])))] for b in batches
    ])
    assert sorted(rows.tolist()) == list(range(500, 1000))
    # ragged list column padded to [B, maxlen] with correct values
    b0 = batches[0]
    assert b0["tags"].ndim == 2
    i = int(b0["user_id"][0])
    expect = [i % 7] * (i % 5 + 1)
    assert b0["tags"][0, : len(expect)].tolist() == expect
    assert (b0["tags"][0, len(expect):] == 0).all()

    # both ranks together cover every row exactly once
    read_groups.clear()
    ds0 = ShardedDataset(args, batch_size=64, rank=0, world_size=2, drop_last=False)
    rows0 = np.concatenate([
        b["user_id"][: int(b.get("_nvalid", len(b["user_id"])))] for b in ds0
    ])
    assert sorted(np.concatenate([rows0, rows]).tolist()) == list(range(n))


def test_variable_list_conversion_matches_pylist():
    import pyarrow as pa

    from nexus_tpu.data.dataset import _column_to_numpy

    data = [[1, 2, 3], [], [4], [5, 6, 7, 8], None]
    arr = pa.array(data)
    out = _column_to_numpy(pa.chunked_array([arr]))
    assert out.shape == (5, 4)
    assert out[0].tolist() == [1, 2, 3, 0]
    assert out[3].tolist() == [5, 6, 7, 8]
    assert (out[1] == 0).all() and (out[4] == 0).all()
    # sliced arrays (non-zero offset) stay correct
    sliced = arr.slice(2, 2)
    out2 = _column_to_numpy(sliced)
    assert out2[0].tolist() + out2[1].tolist() == [4, 0, 0, 0, 5, 6, 7, 8]


def test_compute_item_vectors_batched(synth):
    """Large item counts encode through fixed-size windows with identical
    results to the single-call path (bounded peak memory)."""
    from nexus_tpu.data.dataset import ItemDataset
    from nexus_tpu.training.embedder.recommendation import MLPRetriever

    train_cfg, _ = ConfigProcessor(synth).split_config()
    model = MLPRetriever(train_cfg.to_attr(), {
        "embedding_dim": 8, "mlp_layers": [16, 8], "num_neg": 4,
        "dropout": 0.0, "batch_norm": False,
    })
    item_ds = ItemDataset(train_cfg)
    item_ds.item_pop_dict = {}
    model.set_item_dataset(item_ds)
    import jax

    variables = model.init_variables(jax.random.PRNGKey(0))
    whole = model.compute_item_vectors(variables)
    batched = model.compute_item_vectors(variables, batch_size=300)  # 2000 items, ragged tail
    assert whole.shape == batched.shape
    np.testing.assert_allclose(whole, batched, atol=1e-5)
