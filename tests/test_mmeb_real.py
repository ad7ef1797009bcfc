"""Real-format MMEB-v2 harness: registry parity, parser smoke over local
fixtures in the actual (HF save_to_disk) schemas, graded visdoc metrics,
LoRA adapter overlay."""

import os

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")
from PIL import Image

from nexus_tpu.evaluation.mmeb_v2.constant import (
    EVAL_DATASET_HF_PATH,
    IMAGE_TASKS,
    MMEB_TASKS,
    SUBSET_MAP,
    local_dataset_path,
    task_parser,
)


def test_registry_matches_reference():
    """1:1 vs reference constant.py:6-173: 46 video/visdoc HF paths + the
    MMEB image suite; every task resolves to a registered parser."""
    assert len(EVAL_DATASET_HF_PATH) == 46
    assert EVAL_DATASET_HF_PATH["MSR-VTT"] == ("VLM2Vec/MSR-VTT", "test_1k", "test")
    assert EVAL_DATASET_HF_PATH["EgoSchema"] == ("VLM2Vec/EgoSchema", "Subset", "test")
    assert EVAL_DATASET_HF_PATH["VisRAG_PlotQA"] == ("openbmb/VisRAG-Ret-Test-PlotQA", None, "train")
    assert EVAL_DATASET_HF_PATH["ViDoRe_biomedical_lectures_v2"] == (
        "vidore/biomedical_lectures_v2", "english", "test")
    assert len(SUBSET_MAP["MVBench"]) == 20
    assert SUBSET_MAP["ViDoRe_arxivqa"] == {"corpus", "qrels", "queries"}
    assert len(IMAGE_TASKS) == 36
    assert len(MMEB_TASKS) == 46 + 36

    from nexus_tpu.evaluation.mmeb_v2.datasets import PARSER_REGISTRY

    reference_parsers = {
        "activitynetqa", "didemo", "egoschema", "image_cls", "image_i2i_vg",
        "image_i2t", "image_qa", "image_t2i", "moment_retrieval",
        "momentseeker", "msrvtt", "msvd", "mvbench", "nextqa", "ssv2",
        "vatex", "video_classification", "videomme", "videommmu", "vidore",
        "visrag", "youcook2",
    }
    assert reference_parsers <= set(PARSER_REGISTRY)
    for t in MMEB_TASKS:
        assert task_parser(t) in PARSER_REGISTRY, t


class _FakeEmbedder:
    """Deterministic embedder keyed on the item's identity surface: text, or
    the image filename stem, or the video frame-dir name."""

    def __init__(self, dim=16):
        self.dim = dim

    def _key(self, item):
        if isinstance(item, str):
            return item
        if item.get("videos") and item["videos"][0]:
            return os.path.basename(os.path.dirname(item["videos"][0][0]))
        if item.get("text"):
            return item["text"].split()[-1]  # identity = last token (robust to instructions)
        if item.get("images"):
            return os.path.splitext(os.path.basename(item["images"][0]))[0]
        return ""

    def _vec(self, item):
        rng = np.random.default_rng(abs(hash(self._key(item))) % (2**32))
        v = rng.normal(size=self.dim)
        return v / np.linalg.norm(v)

    def encode_queries(self, items):
        return np.stack([self._vec(i) for i in items])

    encode_corpus = encode_queries


def _png(path, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8)).save(path)


@pytest.fixture()
def basedir(tmp_path):
    """Local fixtures in the REAL schemas under the annotation tree."""
    base = tmp_path / "mmeb"
    # --- image_cls task (ziyjiang/MMEB_Test_Instruct/<task> layout) --------
    img_task_dir, _, _ = local_dataset_path(str(base), "HatefulMemes")
    rows = {
        "qry_inst": ["<|image_1|>" for _ in range(4)],  # cleaned to empty
        "qry_text": [f"label {i}" for i in range(4)],  # == gold target text
        "qry_img_path": [f"m{i}.png" for i in range(4)],
        "tgt_text": [[f"label {i}", "label x", "label y"] for i in range(4)],
    }
    datasets.Dataset.from_dict(rows).save_to_disk(os.path.join(img_task_dir, "HatefulMemes"))
    for i in range(4):
        _png(str(base / "media" / "HatefulMemes" / f"m{i}.png"), i)

    # --- MSVD video retrieval (VLM2Vec/MSVD layout) -------------------------
    vid_dir, _, _ = local_dataset_path(str(base), "MSVD")
    vids = {
        "video_id": [f"vid{i}" for i in range(3)],
        "video": [f"vid{i}.avi" for i in range(3)],
        "caption": [[f"vid{i}"] for i in range(3)],  # caption == video id key
    }
    datasets.Dataset.from_dict(vids).save_to_disk(vid_dir)
    for i in range(3):
        for f in range(3):
            _png(str(base / "frames" / "MSVD" / f"vid{i}" / f"{f:04d}.png"), 10 * i + f)

    # --- ViDoRe visdoc (corpus/queries/qrels BEIR layout, graded) ----------
    doc_dir, _, _ = local_dataset_path(str(base), "ViDoRe_arxivqa")
    corpus_imgs = [Image.fromarray(np.full((16, 16, 3), 30 * i, np.uint8)) for i in range(5)]
    datasets.Dataset.from_dict(
        {"corpus-id": [f"doc{i}" for i in range(5)], "image": corpus_imgs}
    ).save_to_disk(os.path.join(doc_dir, "corpus"))
    datasets.Dataset.from_dict(
        {"query-id": ["q0", "q1"], "query": ["doc0", "doc3"]}
    ).save_to_disk(os.path.join(doc_dir, "queries"))
    datasets.Dataset.from_dict(
        {"query-id": ["q0", "q0", "q1"], "corpus-id": ["doc0", "doc1", "doc3"],
         "score": [2, 1, 1]}
    ).save_to_disk(os.path.join(doc_dir, "qrels"))
    return str(base)


def test_real_format_image_task(basedir, tmp_path):
    from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator

    ev = MMEBEvaluator(
        _FakeEmbedder(), data_basedir=basedir, output_dir=str(tmp_path / "out"),
        parser_kwargs={"image_root": os.path.join(basedir, "media", "HatefulMemes")},
    )
    m = ev.evaluate_task("HatefulMemes")
    assert m["hit@1"] == 1.0  # qry_text == gold tgt_text under the fake embedder


def test_real_format_video_task(basedir, tmp_path):
    from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator

    ev = MMEBEvaluator(
        _FakeEmbedder(), data_basedir=basedir, output_dir=str(tmp_path / "out"),
        parser_kwargs={"num_frames": 2},
    )
    m = ev.evaluate_task("MSVD")
    assert m["hit@1"] == 1.0  # caption == frame-dir key


def test_real_format_visdoc_graded(basedir, tmp_path):
    from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator

    ev = MMEBEvaluator(
        _FakeEmbedder(), data_basedir=basedir, output_dir=str(tmp_path / "out"),
    )
    m = ev.evaluate_task("ViDoRe_arxivqa")
    # query text == relevant doc id -> top-1 is the graded-2 (q0) / graded-1 (q1) doc
    assert m["hit@1"] == 1.0
    assert 0.0 < m["ndcg@5"] <= 1.0
    # corpus images were materialized from the dataset rows into image_root
    assert os.path.exists(os.path.join(basedir, "media", "ViDoRe_arxivqa", "doc0.png"))


def test_full_suite_run_and_report(basedir, tmp_path):
    """run() auto-discovers the locally-present real-format tasks and writes
    the per-modality report (report_score_v2 parity)."""
    from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator

    ev = MMEBEvaluator(
        _FakeEmbedder(), data_basedir=basedir, output_dir=str(tmp_path / "out"),
        parser_kwargs={"num_frames": 2,
                       "image_root": os.path.join(basedir, "media", "HatefulMemes")},
    )
    results = ev.run()
    assert set(results) >= {"HatefulMemes", "MSVD", "ViDoRe_arxivqa"}
    report = (tmp_path / "out" / "mmeb_results.md").read_text()
    for modality in ("image", "video", "visdoc"):
        assert modality in report


def test_lora_overlay(tmp_path):
    import jax
    from flax import serialization

    from nexus_tpu.evaluation.mmeb_v2.eval_emb_lora import load_adapter_overlay

    variables = {"params": {"layer": {"lora_A": np.zeros((2, 2), np.float32),
                                      "dense": np.ones((2, 2), np.float32)}}}
    adapters = {"layer": {"lora_A": np.full((2, 2), 7.0, np.float32)}}
    with open(tmp_path / "adapter_model.msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(adapters))
    out = load_adapter_overlay(variables, str(tmp_path))
    assert float(np.asarray(out["params"]["layer"]["lora_A"]).mean()) == 7.0
    assert float(np.asarray(out["params"]["layer"]["dense"]).mean()) == 1.0
    # base untouched
    assert float(variables["params"]["layer"]["lora_A"].mean()) == 0.0


def _write_mp4(path, n_frames=12, size=(64, 48)):
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8.0, size)
    assert w.isOpened()
    for i in range(n_frames):
        frame = np.zeros((size[1], size[0], 3), np.uint8)
        frame[:, :, 2] = i * 20  # red ramp (BGR)
        w.write(frame)
    w.release()


def test_video_container_decode_save_frames(tmp_path):
    """Raw mp4 -> frame cache via OpenCV (the decord replacement; parity:
    reference save_frames, utils/vision_utils/vision_utils.py)."""
    from nexus_tpu.evaluation.mmeb_v2.vision_utils import (
        get_total_frames, process_video_frames, save_frames,
    )

    vid = tmp_path / "clip.mp4"
    _write_mp4(vid)
    assert get_total_frames(str(vid)) == 12
    frame_dir = tmp_path / "frames"
    save_frames(str(vid), str(frame_dir), max_frames_saved=6)
    saved = sorted(os.listdir(frame_dir))
    assert len(saved) == 6 and saved[0].endswith(".jpeg")
    picked = process_video_frames(str(frame_dir), 3)
    assert len(picked) == 3
    # idempotent: a second call must not re-extract
    save_frames(str(vid), str(frame_dir), max_frames_saved=6)
    assert sorted(os.listdir(frame_dir)) == saved


def test_video_container_decode_adapter_path(tmp_path):
    """Raw mp4 consumed directly by the processor toolkit's frame loader
    (training/inference path): uniform temporal sampling + CLIP normalize."""
    from nexus_tpu.modules.multimodal import IMAGE_MEAN, IMAGE_STD, load_video_frames

    vid = tmp_path / "clip.mp4"
    _write_mp4(vid)
    frames = load_video_frames(str(vid), image_size=16, num_frames=4)
    assert len(frames) == 4
    assert all(f.shape == (16, 16, 3) for f in frames)
    # the red ramp must increase across sampled frames (BGR->RGB handled)
    red = [float((f * IMAGE_STD + IMAGE_MEAN)[..., 0].mean()) for f in frames]
    assert red == sorted(red) and red[-1] > red[0] + 0.2
    green = [float((f * IMAGE_STD + IMAGE_MEAN)[..., 1].mean()) for f in frames]
    assert max(green) < 0.2


def test_rank_sharded_eval_merges_to_single_rank_result(basedir, tmp_path):
    """Two ranks over disjoint query shards merge (query-weighted, via the
    rank-0 file gather — parity: the reference's dist.gather + report) to
    exactly the single-rank metrics (4 queries, world 2, no padding)."""
    from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator

    kwargs = dict(
        data_basedir=basedir,
        parser_kwargs={"image_root": os.path.join(basedir, "media", "HatefulMemes")},
    )
    single = MMEBEvaluator(_FakeEmbedder(), output_dir=str(tmp_path / "w1"), **kwargs)
    base = single.run(["HatefulMemes"])["HatefulMemes"]

    out2 = str(tmp_path / "w2")
    r1 = MMEBEvaluator(_FakeEmbedder(), output_dir=out2, rank=1, world_size=2, **kwargs)
    part = r1.run(["HatefulMemes"])["HatefulMemes"]
    assert part["_n"] == 2  # half the queries
    r0 = MMEBEvaluator(_FakeEmbedder(), output_dir=out2, rank=0, world_size=2, **kwargs)
    merged = r0.run(["HatefulMemes"])["HatefulMemes"]

    assert merged["_n"] == 4
    for m, v in base.items():
        if not m.startswith("_"):
            assert abs(merged[m] - v) < 1e-6, (m, merged[m], v)
    # rank 0 wrote the merged report
    assert os.path.exists(os.path.join(out2, "mmeb_results.md"))
