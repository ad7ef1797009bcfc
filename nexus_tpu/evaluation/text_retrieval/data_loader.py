"""Eval dataset loading (parity: Nexus/evaluation/text_retrieval/
data_loader.py:34-448 — BEIR/AIR-Bench style corpora).

Resolution order per dataset:
1. LOCAL BEIR layout: <dataset_dir>/<name>/{corpus.jsonl, queries.jsonl,
   qrels*.tsv} (the layout the reference caches after download);
2. remote .zip download -> extract into <dataset_dir> (the reference's
   BEIR-distribution path, data_loader.py:34-448) — `dataset_url_template`
   defaults to the public BEIR bucket; tested against a mocked transport
   since this build environment has zero egress;
3. HF `datasets` (BeIR/<name> config pairs) when the local cache has them.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict, Optional

from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.data_loader")

BEIR_URL_TEMPLATE = (
    "https://public.ukp.informatik.tu-darmstadt.de/thakur/BEIR/datasets/{name}.zip"
)


class TextRetrievalEvalDataLoader:
    def __init__(self, dataset_dir: str, download: bool = False,
                 dataset_url_template: str = BEIR_URL_TEMPLATE,
                 transport=None):
        """``download``: fetch missing datasets from the BEIR distribution.
        ``transport``: callable url -> bytes (defaults to urllib; injectable
        for offline tests)."""
        self.dataset_dir = dataset_dir
        self.download = download
        self.url_template = dataset_url_template
        self.transport = transport

    # -- acquisition --------------------------------------------------------

    def _fetch(self, url: str) -> bytes:
        if self.transport is not None:
            return self.transport(url)
        import urllib.request

        with urllib.request.urlopen(url, timeout=600) as r:
            return r.read()

    def _download_dataset(self, dataset_name: str) -> None:
        """Download + extract a BEIR zip into the dataset dir (the zip nests
        a <name>/ folder with corpus/queries/qrels)."""
        url = self.url_template.format(name=dataset_name)
        logger.info("downloading %s from %s", dataset_name, url)
        blob = self._fetch(url)
        os.makedirs(self.dataset_dir, exist_ok=True)
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            z.extractall(self.dataset_dir)

    def _try_hf_datasets(self, dataset_name: str) -> bool:
        """Materialize the local layout from the HF `datasets` cache
        (BeIR/<name> + BeIR/<name>-qrels), offline-only."""
        try:
            from datasets import load_dataset

            d = os.path.join(self.dataset_dir, dataset_name)
            os.makedirs(d, exist_ok=True)
            corpus = load_dataset(f"BeIR/{dataset_name}", "corpus", split="corpus")
            queries = load_dataset(f"BeIR/{dataset_name}", "queries", split="queries")
            qrels = load_dataset(f"BeIR/{dataset_name}-qrels", split="test")
            with open(os.path.join(d, "corpus.jsonl"), "w") as f:
                for r in corpus:
                    f.write(json.dumps({"_id": r["_id"], "title": r.get("title", ""),
                                        "text": r["text"]}) + "\n")
            with open(os.path.join(d, "queries.jsonl"), "w") as f:
                for r in queries:
                    f.write(json.dumps({"_id": r["_id"], "text": r["text"]}) + "\n")
            with open(os.path.join(d, "qrels.tsv"), "w") as f:
                f.write("query-id\tcorpus-id\tscore\n")
                for r in qrels:
                    f.write(f"{r['query-id']}\t{r['corpus-id']}\t{r['score']}\n")
            return True
        except Exception as e:  # no cache / no egress
            logger.info("HF datasets path unavailable for %s: %s", dataset_name, e)
            return False

    def _dir(self, dataset_name: str) -> str:
        d = os.path.join(self.dataset_dir, dataset_name)
        if not os.path.isdir(d) and self.download:
            try:
                self._download_dataset(dataset_name)
            except Exception as e:
                logger.warning("download failed for %s (%s); trying HF cache",
                               dataset_name, e)
                self._try_hf_datasets(dataset_name)
        if not os.path.isdir(d):
            raise FileNotFoundError(f"dataset dir not found: {d}")
        return d

    def load_corpus(self, dataset_name: str) -> Dict[str, dict]:
        path = os.path.join(self._dir(dataset_name), "corpus.jsonl")
        corpus = {}
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                corpus[str(rec.get("_id", rec.get("id")))] = {
                    "title": rec.get("title", ""),
                    "text": rec.get("text", ""),
                }
        return corpus

    def load_queries(self, dataset_name: str) -> Dict[str, str]:
        path = os.path.join(self._dir(dataset_name), "queries.jsonl")
        queries = {}
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                queries[str(rec.get("_id", rec.get("id")))] = rec["text"]
        return queries

    def load_qrels(self, dataset_name: str, split: str = "test") -> Dict[str, Dict[str, int]]:
        d = self._dir(dataset_name)
        candidates = [
            os.path.join(d, "qrels", f"{split}.tsv"),
            os.path.join(d, f"qrels.{split}.tsv"),
            os.path.join(d, "qrels.tsv"),
        ]
        path = next((p for p in candidates if os.path.exists(p)), None)
        if path is None:
            raise FileNotFoundError(f"no qrels found under {d}")
        qrels: Dict[str, Dict[str, int]] = {}
        with open(path) as f:
            first = True
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if first and not parts[-1].lstrip("-").isdigit():
                    first = False
                    continue  # header row
                first = False
                if len(parts) == 4:  # trec format: qid iter docid rel
                    qid, _, did, rel = parts
                else:
                    qid, did, rel = parts[:3]
                qrels.setdefault(str(qid), {})[str(did)] = int(float(rel))
        return qrels
