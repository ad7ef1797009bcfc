"""MMEB-v2 task registry (parity: Nexus/evaluation/mmeb_v2/constant.py:6-173).

Tasks are keyed by name with modality (image / video / visdoc) and task type
(retrieval / classification / vqa / grounding). Data for each task lives at
<dataset_dir>/<task>.jsonl in the harness's unified format:
    {"query": <item>, "candidates": [<item>...], "label": <gold index>}
or  {"query": <item>, "rel_ids": [...]} with a shared <task>_corpus.jsonl.
"""

from __future__ import annotations

from typing import Dict

# representative slice of the ~60-task MMEB-v2 suite, organized like the
# reference registry; extend by adding entries (name -> modality, type)
MMEB_TASKS: Dict[str, dict] = {
    # image retrieval
    "VisualNews_t2i": {"modality": "image", "type": "retrieval"},
    "VisualNews_i2t": {"modality": "image", "type": "retrieval"},
    "MSCOCO_t2i": {"modality": "image", "type": "retrieval"},
    "MSCOCO_i2t": {"modality": "image", "type": "retrieval"},
    "NIGHTS": {"modality": "image", "type": "retrieval"},
    "WebQA": {"modality": "image", "type": "retrieval"},
    "OVEN": {"modality": "image", "type": "retrieval"},
    "EDIS": {"modality": "image", "type": "retrieval"},
    # image classification / vqa / grounding
    "ImageNet-1K": {"modality": "image", "type": "classification"},
    "HatefulMemes": {"modality": "image", "type": "classification"},
    "SUN397": {"modality": "image", "type": "classification"},
    "OK-VQA": {"modality": "image", "type": "vqa"},
    "A-OKVQA": {"modality": "image", "type": "vqa"},
    "DocVQA": {"modality": "image", "type": "vqa"},
    "MSCOCO": {"modality": "image", "type": "grounding"},
    "RefCOCO": {"modality": "image", "type": "grounding"},
    # video
    "MSR-VTT": {"modality": "video", "type": "retrieval"},
    "MSVD": {"modality": "video", "type": "retrieval"},
    "DiDeMo": {"modality": "video", "type": "retrieval"},
    "UCF101": {"modality": "video", "type": "classification"},
    "HMDB51": {"modality": "video", "type": "classification"},
    "Video-MME": {"modality": "video", "type": "vqa"},
    # visual documents
    "ViDoRe_arxivqa": {"modality": "visdoc", "type": "retrieval"},
    "ViDoRe_docvqa": {"modality": "visdoc", "type": "retrieval"},
    "ViDoRe_infovqa": {"modality": "visdoc", "type": "retrieval"},
    "ViDoRe_tabfquad": {"modality": "visdoc", "type": "retrieval"},
    "VisRAG_ArxivQA": {"modality": "visdoc", "type": "retrieval"},
}


def get_task_info(task_name: str) -> dict:
    if task_name not in MMEB_TASKS:
        raise KeyError(f"unknown MMEB task {task_name!r}; known: {sorted(MMEB_TASKS)}")
    return MMEB_TASKS[task_name]


def tasks_by_modality(modality: str):
    return [t for t, info in MMEB_TASKS.items() if info["modality"] == modality]
