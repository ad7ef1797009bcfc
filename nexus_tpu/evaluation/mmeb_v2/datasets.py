"""MMEB-v2 dataset parsers over the REAL data format (parity:
Nexus/evaluation/mmeb_v2/data/datasets/* — all 21 registered parser names).

Each parser consumes the task's HF dataset (loaded from the local
save_to_disk annotation tree, schema identical to the VLM2Vec/vidore/
openbmb hub datasets) and emits rows in the harness contract:

    query row: {"query_input": ITEM, "cand_input": [ITEM...],
                "dataset_infos": {"cand_names": [...], "label_name": ...,
                                  ("rel_scores": [...])}}
    corpus row: {"cand_input": ITEM, "dataset_infos": {"cand_name": ...}}

where ITEM = {"text", "image", "video" (frame path list), "instruction"}.
The evaluator dedups candidates by cand_name into one encode pool
(generate_cand_dataset parity).
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Dict, List, Optional, Tuple

from nexus_tpu.evaluation.mmeb_v2.vision_utils import (
    process_video_frames,
    qa_template,
    save_frames,
)

PARSER_REGISTRY: Dict[str, Callable] = {}


def register_parser(name: str):
    def deco(fn):
        if name in PARSER_REGISTRY:
            raise RuntimeError(f"parser {name!r} already registered")
        PARSER_REGISTRY[name] = fn
        return fn

    return deco


class AutoEvalPairDataset:
    """Registry facade (parity: base_eval_dataset.AutoEvalPairDataset)."""

    registry = PARSER_REGISTRY

    @classmethod
    def instantiate(cls, dataset_parser: str, **kwargs):
        if dataset_parser not in PARSER_REGISTRY:
            raise KeyError(
                f"unknown dataset parser {dataset_parser!r}; known: {sorted(PARSER_REGISTRY)}"
            )
        return PARSER_REGISTRY[dataset_parser](**kwargs)


# -- loading helpers ---------------------------------------------------------

def load_local_hf_dataset(path: str, subset: Optional[str] = None,
                          split: Optional[str] = None):
    """load_from_disk over the reference's annotation layout; tolerates a
    DatasetDict saved with splits."""
    from datasets import load_from_disk

    target = os.path.join(path, subset) if subset and os.path.isdir(
        os.path.join(path, subset)
    ) else path
    ds = load_from_disk(target)
    if hasattr(ds, "keys") and split is not None and split in getattr(ds, "keys", lambda: [])():
        ds = ds[split]
    return ds


def sample_dataset(dataset, **kwargs):
    n = kwargs.get("num_sample_per_subset", sys.maxsize)
    if isinstance(n, str) and n.isdigit():
        n = int(n)
    if isinstance(n, int) and n < dataset.num_rows:
        dataset = dataset.select(range(n))
    return dataset


def load_qrels_mapping(qrels) -> Dict[str, Dict[str, int]]:
    """query-id -> {corpus-id: relevance} keeping the max graded score."""
    out: Dict[str, Dict[str, int]] = {}
    for row in qrels:
        if row["score"] > 0:
            m = out.setdefault(str(row["query-id"]), {})
            m[str(row["corpus-id"])] = max(m.get(str(row["corpus-id"]), 0), row["score"])
    return out


def generate_cand_dataset(rows: List[dict], corpus: Optional[List[dict]]):
    """Dedup all candidates by cand_name into one encode pool; returns
    (cand_items, name->index)."""
    items, index = [], {}
    for row in rows:
        for item, name in zip(row["cand_input"], row["dataset_infos"]["cand_names"]):
            if name not in index:
                index[name] = len(items)
                items.append(item)
    for row in corpus or []:
        name = row["dataset_infos"]["cand_name"]
        if name not in index:
            index[name] = len(items)
            items.append(row["cand_input"])
    return items, index


def _frames_for(video_name: str, video_rel_path: Optional[str], kwargs) -> List[str]:
    """Cached frame extraction: frame_root/<video_name>, extracting from
    video_root when raw video exists and a decoder is available."""
    frame_dir = os.path.join(kwargs["frame_root"], str(video_name))
    if not os.path.isdir(frame_dir) and video_rel_path:
        video_path = os.path.join(kwargs.get("video_root", ""), video_rel_path)
        save_frames(video_path, frame_dir, kwargs.get("max_frames_saved", 32))
    return process_video_frames(frame_dir, kwargs.get("num_frames", 8))


def _maybe_save_image(image, image_root: str, name: str) -> str:
    """Persist an in-dataset PIL image to image_root/<name>.png (the
    reference's vidore/visrag corpus materialization)."""
    path = os.path.join(image_root, f"{name}.png")
    if not os.path.exists(path) and image is not None and not isinstance(image, str):
        os.makedirs(image_root, exist_ok=True)
        image.save(path)
    return path


# -- MMEB image tasks (columns: qry_inst/qry_text/qry_img_path/tgt_*) --------

def _image_rows(ds, kwargs, query_has_image: bool, cand_field: str = "tgt_text",
                cand_img_field: Optional[str] = None, cand_inst_field: Optional[str] = None):
    image_root = kwargs.get("image_root", "")
    rows = []
    for r in ds:
        inst = (r.get("qry_inst") or "").replace("<|image_1|>", "").strip()
        q = {"text": r.get("qry_text", "") or "", "instruction": inst}
        if query_has_image and r.get("qry_img_path"):
            q["image"] = os.path.join(image_root, r["qry_img_path"])
        cands, names = [], []
        if cand_img_field:  # image candidates
            texts = r.get(cand_field) or [""] * len(r[cand_img_field])
            insts = (r.get(cand_inst_field) or [""] * len(r[cand_img_field])) if cand_inst_field else [""] * len(r[cand_img_field])
            for t, p, ci in zip(texts, r[cand_img_field], insts):
                cands.append({
                    "text": t or "",
                    "image": os.path.join(image_root, p),
                    "instruction": (ci or "").replace("<|image_1|>", "").strip(),
                })
                names.append(p)
        else:  # text candidates
            for t in r[cand_field]:
                cands.append({"text": t})
                names.append(t)
        rows.append({
            "query_input": q,
            "cand_input": cands,
            "dataset_infos": {"cand_names": names, "label_name": names[0]},
        })
    return rows


def _load_image_task(kwargs):
    from nexus_tpu.evaluation.mmeb_v2.constant import local_dataset_path

    path, subset, split = local_dataset_path(kwargs["data_basedir"], kwargs["dataset_name"])
    return sample_dataset(load_local_hf_dataset(path, subset, split), **kwargs)


@register_parser("image_cls")
def load_image_cls_dataset(**kwargs):
    return _image_rows(_load_image_task(kwargs), kwargs, query_has_image=True), None


@register_parser("image_qa")
def load_image_qa_dataset(**kwargs):
    return _image_rows(_load_image_task(kwargs), kwargs, query_has_image=True), None


@register_parser("image_i2t")
def load_image_i2t_dataset(**kwargs):
    return _image_rows(_load_image_task(kwargs), kwargs, query_has_image=True), None


@register_parser("image_t2i")
def load_image_t2i_dataset(**kwargs):
    return _image_rows(
        _load_image_task(kwargs), kwargs, query_has_image=False,
        cand_field="tgt_text", cand_img_field="tgt_img_path", cand_inst_field="tgt_inst",
    ), None


@register_parser("image_i2i_vg")
def load_image_i2i_vg_dataset(**kwargs):
    return _image_rows(
        _load_image_task(kwargs), kwargs, query_has_image=True,
        cand_field="tgt_text", cand_img_field="tgt_img_path", cand_inst_field="tgt_inst",
    ), None


# -- video retrieval (caption -> video) ---------------------------------------

def _load_video_task(kwargs):
    from nexus_tpu.evaluation.mmeb_v2.constant import local_dataset_path

    path, subset, split = local_dataset_path(kwargs["data_basedir"], kwargs["dataset_name"])
    return sample_dataset(load_local_hf_dataset(path, subset, split), **kwargs)


def _video_ret_rows(ds, kwargs, id_col: str, video_col: str, text_col: str,
                    qry_inst: str, tgt_inst: str, first_of_list: bool = False):
    rows = []
    for r in ds:
        text = r[text_col][0] if first_of_list and isinstance(r[text_col], (list, tuple)) else r[text_col]
        frames = _frames_for(r[id_col], r.get(video_col), kwargs)
        rows.append({
            "query_input": {"text": text, "instruction": qry_inst},
            "cand_input": [{"video": frames, "instruction": tgt_inst}],
            "dataset_infos": {"cand_names": [str(r[id_col])], "label_name": str(r[id_col])},
        })
    return rows


_V_QRY = "Find the video snippet that corresponds to the given summary."
_V_TGT = "Understand the content of the provided video."


@register_parser("msvd")
def load_msvd_dataset(**kwargs):
    return _video_ret_rows(_load_video_task(kwargs), kwargs, "video_id", "video",
                           "caption", _V_QRY, _V_TGT, first_of_list=True), None


@register_parser("msrvtt")
def load_msrvtt_dataset(**kwargs):
    return _video_ret_rows(_load_video_task(kwargs), kwargs, "video_id", "video",
                           "caption", _V_QRY, _V_TGT, first_of_list=True), None


@register_parser("didemo")
def load_didemo_dataset(**kwargs):
    return _video_ret_rows(_load_video_task(kwargs), kwargs, "video_id", "video",
                           "caption", _V_QRY, _V_TGT, first_of_list=True), None


@register_parser("vatex")
def load_vatex_dataset(**kwargs):
    return _video_ret_rows(_load_video_task(kwargs), kwargs, "video_id", "video",
                           "caption", _V_QRY, _V_TGT, first_of_list=True), None


@register_parser("youcook2")
def load_youcook2_dataset(**kwargs):
    ds = _load_video_task(kwargs)
    rows = []
    for r in ds:
        vid = r.get("video_id") or r.get("id")
        frames = _frames_for(vid, r.get("video_path") or r.get("video"), kwargs)
        rows.append({
            "query_input": {"text": r.get("sentence") or r.get("caption"),
                            "instruction": _V_QRY},
            "cand_input": [{"video": frames, "instruction": _V_TGT}],
            "dataset_infos": {"cand_names": [str(vid)], "label_name": str(vid)},
        })
    return rows, None


# -- video classification ------------------------------------------------------

_CLS_INST = "Classify the video into the correct category."


def _video_cls_rows(ds, kwargs, label_col: str = "pos_text"):
    rows = []
    for r in ds:
        frames = _frames_for(r["video_id"], r.get("video_path"), kwargs)
        label = r[label_col]
        rows.append({
            "query_input": {"video": frames, "instruction": _CLS_INST},
            "cand_input": [{"text": label}],
            "dataset_infos": {"cand_names": [label], "label_name": label},
        })
    return rows


@register_parser("video_classification")
def load_video_classification_dataset(**kwargs):
    return _video_cls_rows(_load_video_task(kwargs), kwargs), None


@register_parser("ssv2")
def load_ssv2_dataset(**kwargs):
    return _video_cls_rows(_load_video_task(kwargs), kwargs), None


# -- video QA (multiple choice) ------------------------------------------------

_QA_INST = "Answer the multiple-choice question about the video."


def _video_qa_rows(ds, kwargs, video_col: str, question_col: str,
                   options_of, answer_of, qid_of):
    rows = []
    for r in ds:
        options = options_of(r)
        answer = answer_of(r)
        question, cands, _, aidx = qa_template(r[question_col], options,
                                               options[answer] if isinstance(answer, int) else answer)
        vid = qid_of(r)
        frames = _frames_for(vid, r.get(video_col), kwargs)
        rows.append({
            "query_input": {"video": frames, "text": question, "instruction": _QA_INST},
            "cand_input": [{"text": c} for c in cands],
            "dataset_infos": {"cand_names": cands, "label_name": cands[aidx]},
        })
    return rows


@register_parser("nextqa")
def load_nextqa_dataset(**kwargs):
    return _video_qa_rows(
        _load_video_task(kwargs), kwargs, "video", "question",
        options_of=lambda r: [r["a0"], r["a1"], r["a2"], r["a3"], r["a4"]],
        answer_of=lambda r: int(r["answer"]),
        qid_of=lambda r: r["video"],
    ), None


@register_parser("egoschema")
def load_egoschema_dataset(**kwargs):
    return _video_qa_rows(
        _load_video_task(kwargs), kwargs, "video_idx", "question",
        options_of=lambda r: list(r["option"]),
        answer_of=lambda r: int(r["answer"]),
        qid_of=lambda r: r["video_idx"],
    ), None


@register_parser("mvbench")
def load_mvbench_dataset(**kwargs):
    from nexus_tpu.evaluation.mmeb_v2.constant import SUBSET_MAP, local_dataset_path

    path, _, split = local_dataset_path(kwargs["data_basedir"], kwargs["dataset_name"])
    rows = []
    for sub in sorted(SUBSET_MAP["MVBench"]):
        subdir = os.path.join(path, sub)
        if not os.path.isdir(subdir):
            continue
        ds = sample_dataset(load_local_hf_dataset(subdir, None, split), **kwargs)
        rows += _video_qa_rows(
            ds, kwargs, "video", "question",
            options_of=lambda r: list(r["candidates"]),
            answer_of=lambda r: r["answer"],
            qid_of=lambda r: r["video"],
        )
    return rows, None


@register_parser("videomme")
def load_videomme_dataset(**kwargs):
    return _video_qa_rows(
        _load_video_task(kwargs), kwargs, "videoID", "question",
        options_of=lambda r: list(r["options"]),
        answer_of=lambda r: "ABCD".index(r["answer"]) if isinstance(r["answer"], str) and len(r["answer"]) == 1 else r["answer"],
        qid_of=lambda r: r["videoID"],
    ), None


@register_parser("activitynetqa")
def load_activitynetqa_dataset(**kwargs):
    ds = _load_video_task(kwargs)
    rows = []
    for r in ds:
        frames = _frames_for(r["video_name"], r.get("video_path"), kwargs)
        answer = r["answer"]
        cands = [answer] + [c for c in ("yes", "no") if c != answer]
        rows.append({
            "query_input": {"video": frames, "text": r["question"], "instruction": _QA_INST},
            "cand_input": [{"text": c} for c in cands],
            "dataset_infos": {"cand_names": cands, "label_name": answer},
        })
    return rows, None


@register_parser("videommmu")
def load_videommmu_dataset(**kwargs):
    return _video_qa_rows(
        _load_video_task(kwargs), kwargs, "id", "question",
        options_of=lambda r: list(r["options"]),
        answer_of=lambda r: r["answer"] if isinstance(r["answer"], int) else "ABCDEFGH".index(r["answer"]),
        qid_of=lambda r: r["id"],
    ), None


# -- moment retrieval -----------------------------------------------------------

_M_QRY = "Find the video clip that matches the described moment."
_M_TGT = "Understand the content of the provided clip."


@register_parser("moment_retrieval")
def load_moment_retrieval_dataset(**kwargs):
    """QVHighlight / Charades-STA: query text vs per-video candidate clips
    (clip_root holds frame dirs per clip id)."""
    ds = _load_video_task(kwargs)
    rows = []
    for r in ds:
        clips = r.get("clip_ids") or r.get("clips") or []
        cands, names = [], []
        for cid in clips:
            frames = process_video_frames(
                os.path.join(kwargs.get("clip_root", kwargs["frame_root"]), str(cid)),
                kwargs.get("num_clip_frames", kwargs.get("num_frames", 8)),
            )
            cands.append({"video": frames, "instruction": _M_TGT})
            names.append(str(cid))
        label = str(r.get("label_clip_id", names[0] if names else ""))
        rows.append({
            "query_input": {"text": r["query"], "instruction": _M_QRY},
            "cand_input": cands,
            "dataset_infos": {"cand_names": names, "label_name": label},
        })
    return rows, None


@register_parser("momentseeker")
def load_momentseeker_dataset(**kwargs):
    return load_moment_retrieval_dataset(**kwargs)


# -- visual documents (BEIR corpus/queries/qrels) --------------------------------

_DOC_QRY = "Find a document image that matches the given query."


def _beir_rows(kwargs, image_of_corpus_row):
    from nexus_tpu.evaluation.mmeb_v2.constant import local_dataset_path

    path, _, split = local_dataset_path(kwargs["data_basedir"], kwargs["dataset_name"])
    queries = load_local_hf_dataset(os.path.join(path, "queries"), None, split)
    corpus = load_local_hf_dataset(os.path.join(path, "corpus"), None, split)
    qrels = load_local_hf_dataset(os.path.join(path, "qrels"), None, split)
    qrels_map = load_qrels_mapping(qrels)
    image_root = kwargs.get("image_root", os.path.join(path, "images"))

    corpus_rows = []
    for r in corpus:
        cid = str(r["corpus-id"])
        img_path = image_of_corpus_row(r, cid, image_root)
        corpus_rows.append({
            "cand_input": {"image": img_path},
            "dataset_infos": {"cand_name": cid},
        })
    rows = []
    for r in sample_dataset(queries, **kwargs):
        qid = str(r["query-id"])
        rel = qrels_map.get(qid, {})
        names = list(rel.keys())
        rows.append({
            "query_input": {"text": r["query"], "instruction": _DOC_QRY},
            "cand_input": [],
            "dataset_infos": {
                "cand_names": names,
                "label_name": names,
                "rel_scores": [rel[n] for n in names],
            },
        })
    return rows, corpus_rows


@register_parser("vidore")
def load_vidore_dataset(**kwargs):
    return _beir_rows(
        kwargs, lambda r, cid, root: _maybe_save_image(r.get("image"), root, cid)
    )


@register_parser("visrag")
def load_visrag_dataset(**kwargs):
    return _beir_rows(
        kwargs, lambda r, cid, root: _maybe_save_image(r.get("image"), root, cid)
    )


def load_task(task_name: str, **kwargs) -> Tuple[List[dict], Optional[List[dict]]]:
    """Entry: resolve the task's parser from the registry and run it."""
    from nexus_tpu.evaluation.mmeb_v2.constant import task_parser

    kwargs.setdefault("dataset_name", task_name)
    return AutoEvalPairDataset.instantiate(task_parser(task_name), **kwargs)
