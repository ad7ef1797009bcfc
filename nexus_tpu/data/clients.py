"""Storage clients: file discovery + table reading
(parity: Nexus/modules/dataset.py:14-99).

`BaseClient` indexes date- or number-partitioned table files under a
directory and reads parquet/feather/csv through pyarrow. `HDFSClient` (and
any other remote scheme) goes through fsspec with the same interface.
"""

from __future__ import annotations

import os
import re
from datetime import datetime
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.feather as feather
import pyarrow.parquet as pq

_SUPPORTED = (".parquet", ".feather", ".csv", ".arrow")


class BaseClient:
    """Local filesystem client over a directory of partitioned table files."""

    def __init__(self, url: str):
        self.url = url.removeprefix("file://")

    # -- file discovery ---------------------------------------------------

    def list_files(self) -> List[str]:
        if os.path.isfile(self.url):
            return [self.url]
        names = sorted(
            f for f in os.listdir(self.url) if f.endswith(_SUPPORTED) or "." not in f
        )
        return [os.path.join(self.url, f) for f in names]

    @staticmethod
    def _file_date(path: str, fmt: str) -> Optional[datetime]:
        stem = os.path.splitext(os.path.basename(path))[0]
        # allow prefixes like part-2024-01-13
        m = re.search(r"\d{4}-\d{2}-\d{2}|\d{8}", stem)
        token = m.group(0) if m else stem
        for f in (fmt, "%Y-%m-%d", "%Y%m%d"):
            try:
                return datetime.strptime(token, f)
            except ValueError:
                continue
        return None

    def get_filenames_in_period(self, file_partition: dict, start, end) -> List[str]:
        """Files whose partition token falls in [start, end) — the reference's
        date-range split convention."""
        fmt = (file_partition or {}).get("format", "%Y-%m-%d")
        ptype = (file_partition or {}).get("type", "date")
        start = _as_dt(start)
        end = _as_dt(end)
        out = []
        for path in self.list_files():
            if ptype == "date":
                d = self._file_date(path, fmt)
                if d is not None and start <= d < end:
                    out.append(path)
            else:  # number partition: numeric filename ordering
                stem = os.path.splitext(os.path.basename(path))[0]
                if stem.isdigit() and int(str(start)) <= int(stem) < int(str(end)):
                    out.append(path)
        return out

    def get_train_eval_filenames(
        self, file_partition: dict, train_period: dict, test_period: dict
    ) -> Tuple[List[str], List[str]]:
        train = self.get_filenames_in_period(
            file_partition, train_period["start_date"], train_period["end_date"]
        )
        evalf = self.get_filenames_in_period(
            file_partition, test_period["start_date"], test_period["end_date"]
        )
        return train, evalf

    # -- reading ----------------------------------------------------------

    @staticmethod
    def is_parquet(path: str) -> bool:
        return path.endswith(".parquet") or "." not in os.path.basename(path)

    def read_table(self, path: str, columns: Optional[List[str]] = None) -> pa.Table:
        if self.is_parquet(path):
            return pq.read_table(path, columns=columns)
        if path.endswith((".feather", ".arrow")):
            t = feather.read_table(path)
            return t.select(columns) if columns else t
        if path.endswith(".csv"):
            t = pacsv.read_csv(path)
            return t.select(columns) if columns else t
        raise ValueError(f"unsupported file format: {path}")

    def parquet_file(self, path: str) -> pq.ParquetFile:
        """Handle for row-group-granular streaming reads."""
        return pq.ParquetFile(path)

    def row_count(self, path: str) -> int:
        """Row count WITHOUT reading data for parquet (footer metadata only);
        other formats fall back to a single-column read."""
        if self.is_parquet(path):
            return pq.ParquetFile(path).metadata.num_rows
        t = self.read_table(path)
        return t.num_rows


class HDFSClient(BaseClient):
    """Remote client through fsspec (hdfs://, s3://, gs://, ...)."""

    def __init__(self, url: str):
        import fsspec

        self.url = url
        self.fs, self.path = fsspec.core.url_to_fs(url)

    def list_files(self) -> List[str]:
        if self.fs.isfile(self.path):
            return [self.url]
        scheme = self.url.split("://")[0]
        return sorted(
            f"{scheme}://{p}" for p in self.fs.ls(self.path) if p.endswith(_SUPPORTED)
        )

    def read_table(self, path: str, columns=None) -> pa.Table:
        import fsspec

        with fsspec.open(path, "rb") as f:
            if path.endswith(".parquet"):
                return pq.read_table(f, columns=columns)
            if path.endswith((".feather", ".arrow")):
                t = feather.read_table(f)
                return t.select(columns) if columns else t
            raise ValueError(f"unsupported remote format: {path}")

    def parquet_file(self, path: str) -> pq.ParquetFile:
        import fsspec

        return pq.ParquetFile(fsspec.open(path, "rb").open())

    def row_count(self, path: str) -> int:
        if path.endswith(".parquet"):
            return self.parquet_file(path).metadata.num_rows
        return self.read_table(path).num_rows


def get_client(client_type: str, url: str) -> BaseClient:
    if client_type in ("file", "local") or url.startswith(("file://", "/", ".")):
        return BaseClient(url)
    if client_type == "hdfs" or "://" in url:
        return HDFSClient(url)
    return BaseClient(url)


def _as_dt(x) -> datetime:
    if isinstance(x, datetime):
        return x
    return datetime.strptime(str(x)[:10], "%Y-%m-%d")


def process_conditions(conditions: List[str]):
    """Compile string conditions like '>=5', '!=0', '<10' into predicates
    (parity: Nexus/modules/dataset.py:175)."""
    import operator

    ops = {">=": operator.ge, "<=": operator.le, "==": operator.eq,
           "!=": operator.ne, ">": operator.gt, "<": operator.lt}
    compiled = []
    for cond in conditions:
        for sym in (">=", "<=", "==", "!=", ">", "<"):
            if cond.startswith(sym):
                compiled.append((ops[sym], float(cond[len(sym):])))
                break
        else:
            raise ValueError(f"cannot parse condition {cond!r}")
    return compiled
