"""MMEB-v2 task registry (parity: Nexus/evaluation/mmeb_v2/constant.py:6-173,
1:1 on the video/visdoc HF-path table + the MMEB image-task suite the
reference drives through its image_* parsers).

Data layout is the REAL MMEB-v2 format: HF datasets saved to disk under
<data_basedir>/annotation/<repo_id>[/<subset>] (the reference's
download_dataset layout), with media under image_root/video_root/frame_root.
This environment has no egress, so `download_datasets()` is gated; point
`data_basedir` at a pre-downloaded tree or local fixtures in the same schema.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

# (repo, subset, split) — the reference table, 1:1
EVAL_DATASET_HF_PATH: Dict[str, Tuple[Optional[str], Optional[str], str]] = {
    # Video-RET
    "MSR-VTT": ("VLM2Vec/MSR-VTT", "test_1k", "test"),
    "MSVD": ("VLM2Vec/MSVD", None, "test"),
    "DiDeMo": ("VLM2Vec/DiDeMo", None, "test"),
    "YouCook2": ("lmms-lab/YouCook2", None, "val"),
    "VATEX": ("VLM2Vec/VATEX", None, "test"),
    # Video-CLS
    "HMDB51": ("VLM2Vec/HMDB51", None, "test"),
    "UCF101": ("VLM2Vec/UCF101", None, "test"),
    "Breakfast": ("VLM2Vec/Breakfast", None, "test"),
    "Kinetics-700": ("VLM2Vec/Kinetics-700", None, "test"),
    "SmthSmthV2": ("VLM2Vec/SmthSmthV2", None, "test"),
    # Video-MRET (moment retrieval)
    "QVHighlight": ("VLM2Vec/QVHighlight", None, "test"),
    "Charades-STA": ("VLM2Vec/Charades-STA", None, "test"),
    "MomentSeeker": ("VLM2Vec/MomentSeeker", None, "test"),
    "MomentSeeker_1k8": ("VLM2Vec/MomentSeeker_1k8", None, "test"),
    # Video-QA
    "NExTQA": ("VLM2Vec/NExTQA", "MC", "test"),
    "EgoSchema": ("VLM2Vec/EgoSchema", "Subset", "test"),
    "MVBench": ("VLM2Vec/MVBench", None, "train"),
    "Video-MME": ("VLM2Vec/Video-MME", None, "test"),
    "ActivityNetQA": ("VLM2Vec/ActivityNetQA", None, "test"),
    # Visdoc-ViDoRe
    "ViDoRe_arxivqa": ("vidore/arxivqa_test_subsampled_beir", None, "test"),
    "ViDoRe_docvqa": ("vidore/docvqa_test_subsampled_beir", None, "test"),
    "ViDoRe_infovqa": ("vidore/infovqa_test_subsampled_beir", None, "test"),
    "ViDoRe_tabfquad": ("vidore/tabfquad_test_subsampled_beir", None, "test"),
    "ViDoRe_tatdqa": ("vidore/tatdqa_test_beir", None, "test"),
    "ViDoRe_shiftproject": ("vidore/shiftproject_test_beir", None, "test"),
    "ViDoRe_syntheticDocQA_artificial_intelligence": ("vidore/syntheticDocQA_artificial_intelligence_test_beir", None, "test"),
    "ViDoRe_syntheticDocQA_energy": ("vidore/syntheticDocQA_energy_test_beir", None, "test"),
    "ViDoRe_syntheticDocQA_government_reports": ("vidore/syntheticDocQA_government_reports_test_beir", None, "test"),
    "ViDoRe_syntheticDocQA_healthcare_industry": ("vidore/syntheticDocQA_healthcare_industry_test_beir", None, "test"),
    # Visdoc-VisRAG
    "VisRAG_ArxivQA": ("openbmb/VisRAG-Ret-Test-ArxivQA", None, "train"),
    "VisRAG_ChartQA": ("openbmb/VisRAG-Ret-Test-ChartQA", None, "train"),
    "VisRAG_MP-DocVQA": ("openbmb/VisRAG-Ret-Test-MP-DocVQA", None, "train"),
    "VisRAG_SlideVQA": ("openbmb/VisRAG-Ret-Test-SlideVQA", None, "train"),
    "VisRAG_InfoVQA": ("openbmb/VisRAG-Ret-Test-InfoVQA", None, "train"),
    "VisRAG_PlotQA": ("openbmb/VisRAG-Ret-Test-PlotQA", None, "train"),
    # Visdoc-ViDoSeek / MMLongBench
    "ViDoSeek-doc": ("VLM2Vec/ViDoSeek", None, "test"),
    "ViDoSeek-page": ("VLM2Vec/ViDoSeek-page-fixed", None, "test"),
    "MMLongBench-doc": ("VLM2Vec/MMLongBench-doc", None, "test"),
    "MMLongBench-page": ("VLM2Vec/MMLongBench-page-fixed", None, "test"),
    # Visdoc-ViDoRe_v2
    "ViDoRe_esg_reports_human_labeled_v2": ("vidore/esg_reports_human_labeled_v2", None, "test"),
    "ViDoRe_biomedical_lectures_v2": ("vidore/biomedical_lectures_v2", "english", "test"),
    "ViDoRe_biomedical_lectures_v2_multilingual": ("vidore/biomedical_lectures_v2", None, "test"),
    "ViDoRe_economics_reports_v2": ("vidore/economics_reports_v2", "english", "test"),
    "ViDoRe_economics_reports_v2_multilingual": ("vidore/economics_reports_v2", None, "test"),
    "ViDoRe_esg_reports_v2": ("vidore/esg_reports_v2", "english", "test"),
    "ViDoRe_esg_reports_v2_multilingual": ("vidore/esg_reports_v2", None, "test"),
}

# per-dataset subsets that must each be downloaded/loaded (reference SUBSET_MAP)
_BEIR = {"corpus", "qrels", "queries"}
SUBSET_MAP: Dict[str, set] = {
    "MVBench": {
        "object_interaction", "moving_count", "moving_attribute",
        "scene_transition", "object_existence", "episodic_reasoning",
        "action_antonym", "character_order", "action_localization",
        "action_prediction", "moving_direction", "action_count",
        "state_change", "fine_grained_pose", "unexpected_action",
        "object_shuffle", "counterfactual_inference", "action_sequence",
        "fine_grained_action", "egocentric_navigation",
    },
    **{k: set(_BEIR) for k in EVAL_DATASET_HF_PATH if k.startswith(("ViDoRe", "VisRAG", "ViDoSeek", "MMLongBench"))},
}

# MMEB image-task suite (driven through the image_* parsers over
# ziyjiang/MMEB_Test_Instruct subsets, as in the reference's task configs)
IMAGE_DATASET_HF_PATH = "ziyjiang/MMEB_Test_Instruct"
IMAGE_TASKS: Dict[str, str] = {  # task -> parser
    # classification
    "ImageNet-1K": "image_cls", "N24News": "image_cls", "HatefulMemes": "image_cls",
    "VOC2007": "image_cls", "SUN397": "image_cls", "Place365": "image_cls",
    "ImageNet-A": "image_cls", "ImageNet-R": "image_cls", "ObjectNet": "image_cls",
    "Country211": "image_cls",
    # vqa
    "OK-VQA": "image_qa", "A-OKVQA": "image_qa", "DocVQA": "image_qa",
    "InfographicsVQA": "image_qa", "ChartQA": "image_qa", "Visual7W": "image_qa",
    "ScienceQA": "image_qa", "VizWiz": "image_qa", "GQA": "image_qa",
    "TextVQA": "image_qa",
    # retrieval
    "VisDial": "image_t2i", "CIRR": "image_t2i", "VisualNews_t2i": "image_t2i",
    "MSCOCO_t2i": "image_t2i", "FashionIQ": "image_t2i", "Wiki-SS-NQ": "image_t2i",
    "EDIS": "image_t2i", "VisualNews_i2t": "image_i2t", "MSCOCO_i2t": "image_i2t",
    "NIGHTS": "image_i2i_vg", "WebQA": "image_t2i", "OVEN": "image_i2t",
    # grounding
    "MSCOCO": "image_i2i_vg", "RefCOCO": "image_i2i_vg",
    "RefCOCO-Matching": "image_i2i_vg", "Visual7W-Pointing": "image_i2i_vg",
}

# task -> parser for the video/visdoc suite
VIDEO_VISDOC_PARSERS: Dict[str, str] = {
    "MSR-VTT": "msrvtt", "MSVD": "msvd", "DiDeMo": "didemo",
    "YouCook2": "youcook2", "VATEX": "vatex",
    "HMDB51": "video_classification", "UCF101": "video_classification",
    "Breakfast": "video_classification", "Kinetics-700": "video_classification",
    "SmthSmthV2": "ssv2",
    "QVHighlight": "moment_retrieval", "Charades-STA": "moment_retrieval",
    "MomentSeeker": "momentseeker", "MomentSeeker_1k8": "momentseeker",
    "NExTQA": "nextqa", "EgoSchema": "egoschema", "MVBench": "mvbench",
    "Video-MME": "videomme", "ActivityNetQA": "activitynetqa",
    **{k: "vidore" for k in EVAL_DATASET_HF_PATH if k.startswith(("ViDoRe", "ViDoSeek", "MMLongBench"))},
    **{k: "visrag" for k in EVAL_DATASET_HF_PATH if k.startswith("VisRAG")},
}


def task_parser(task: str) -> str:
    if task in IMAGE_TASKS:
        return IMAGE_TASKS[task]
    if task in VIDEO_VISDOC_PARSERS:
        return VIDEO_VISDOC_PARSERS[task]
    raise KeyError(f"unknown MMEB task {task!r}")


def task_modality(task: str) -> str:
    if task in IMAGE_TASKS:
        return "image"
    if task not in EVAL_DATASET_HF_PATH:
        raise KeyError(f"unknown MMEB task {task!r}")
    if task.startswith(("ViDoRe", "VisRAG", "ViDoSeek", "MMLongBench")):
        return "visdoc"
    return "video"


def task_type(task: str) -> str:
    p = task_parser(task)
    if p in ("image_cls", "video_classification", "ssv2"):
        return "classification"
    if p in ("image_qa", "nextqa", "egoschema", "mvbench", "videomme",
             "activitynetqa", "videommmu"):
        return "vqa"
    if p in ("moment_retrieval", "momentseeker"):
        return "moment_retrieval"
    return "retrieval"


# full suite: video/visdoc registry + image tasks
MMEB_TASKS: Dict[str, dict] = {
    **{t: {"modality": task_modality(t), "type": task_type(t)} for t in EVAL_DATASET_HF_PATH},
    **{t: {"modality": "image", "type": task_type(t)} for t in IMAGE_TASKS},
}

BASE_ANNOTATION_DIR = "annotation"


def local_dataset_path(data_basedir: str, task: str) -> Tuple[str, Optional[str], str]:
    """(local_path, subset, split) mirroring the reference's save_to_disk
    layout: <basedir>/annotation/<repo_id>[/<subset>]."""
    if task in IMAGE_TASKS:
        return (
            os.path.join(data_basedir, BASE_ANNOTATION_DIR, IMAGE_DATASET_HF_PATH),
            task, "test",
        )
    repo, subset, split = EVAL_DATASET_HF_PATH[task]
    return os.path.join(data_basedir, BASE_ANNOTATION_DIR, repo), subset, split


def task_data_exists(data_basedir: str, task: str) -> bool:
    """True when the task's local save_to_disk dataset is present (for tasks
    with subsets, the subset dir itself must exist)."""
    path, subset, _ = local_dataset_path(data_basedir, task)
    if subset is not None and os.path.isdir(os.path.join(path, subset)):
        return True
    if subset is not None:
        # subset may have been saved flat (single-subset download)
        return os.path.isdir(path) and os.path.exists(os.path.join(path, "dataset_info.json"))
    return os.path.isdir(path)


def get_task_info(task_name: str) -> dict:
    if task_name not in MMEB_TASKS:
        raise KeyError(f"unknown MMEB task {task_name!r}; known: {sorted(MMEB_TASKS)}")
    return MMEB_TASKS[task_name]


def tasks_by_modality(modality: str):
    return [t for t, info in MMEB_TASKS.items() if info["modality"] == modality]


def download_datasets(data_basedir: str, tasks=None) -> None:
    """Populate the local annotation tree from the HF hub (reference
    constant.py main()). Gated: this environment has no egress."""
    from datasets import load_dataset

    for task in tasks or EVAL_DATASET_HF_PATH:
        repo, subset, split = EVAL_DATASET_HF_PATH[task]
        local = os.path.join(data_basedir, BASE_ANNOTATION_DIR, repo)
        if os.path.exists(local):
            continue
        if task in SUBSET_MAP:
            for sub in SUBSET_MAP[task]:
                ds = load_dataset(repo, sub, split=split)
                ds.save_to_disk(os.path.join(local, sub))
        else:
            ds = load_dataset(repo, subset, split=split) if subset else load_dataset(repo, split=split)
            ds.save_to_disk(local)
