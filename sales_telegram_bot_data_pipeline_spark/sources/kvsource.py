"""Python DataSource V2 connector modeling the reference's DynamoDB item
tables (dags/utils/s3_dynamodb_utils.py:12-31 — `get_item` point reads on a
composite (filename, shop_name) key and `put_item` writes; table shape per
README.md:71-74).

Spark-first re-expression: DynamoDB's parallel Scan is a partitioned read —
one InputPartition per scan SEGMENT, items routed to segments by a stable
key hash (exactly DynamoDB's internal segmentation contract), so a
1000-executor cluster scans 1000 segments concurrently.  The reference's
`get_item` becomes FILTER PUSHDOWN: EqualTo filters on the key columns
reach the reader (Spark 4.1 Python-DataSource `pushFilters`), which then
opens only the one segment that can contain the key — a point get, not a
scan.  Writes go through the DataSourceWriter protocol: each task emits an
independent jsonl part file and a commit message; commit is rename-free
and idempotent (last-write-wins at the file level, the KV contract).

The storage format here is jsonl on a filesystem path (the test/fixture
medium); a real deployment swaps the two `_iter_lines`/`write` seams for
the DynamoDB SDK without touching the Spark-facing protocol classes.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

KV_SCHEMA = (
    "filename string, shop_name string, valid_from string, valid_to string, valid boolean"
)
KEY_COLS = ("filename", "shop_name")
_FIELDS = ("filename", "shop_name", "valid_from", "valid_to", "valid")


def _segment_of(filename: str, n_segments: int) -> int:
    """Stable segment routing by key hash (md5 so Python/pytest and any
    future engine agree; NOT Python's salted builtin hash)."""
    return int(hashlib.md5(str(filename).encode()).hexdigest()[:15], 16) % n_segments


@dataclass
class _Segment(InputPartition):
    segment: int


class KVReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sales_kv requires a 'path' option")
        self.n_segments = int(options.get("num_segments", "4"))
        self.key_eq: dict[str, str] = {}

    def pushFilters(self, filters: list[Filter]):
        """Accept EqualTo on key columns (point-get semantics) and
        IsNotNull on anything; everything else is Spark's job."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and f.attribute[0] in KEY_COLS:
                self.key_eq[f.attribute[0]] = f.value
            elif isinstance(f, IsNotNull):
                continue
            else:
                yield f

    def partitions(self):
        if "filename" in self.key_eq:
            # point get: only ONE segment can contain the key
            return [_Segment(_segment_of(self.key_eq["filename"], self.n_segments))]
        return [_Segment(i) for i in range(self.n_segments)]

    def read(self, partition: _Segment):
        for rec in self._iter_records():
            if _segment_of(rec.get("filename"), self.n_segments) != partition.segment:
                continue
            if any(rec.get(k) != v for k, v in self.key_eq.items()):
                continue
            yield tuple(rec.get(f) for f in _FIELDS)

    # --- storage seam (swap for the real KV SDK in deployment) ------------
    def _iter_records(self):
        for name in sorted(os.listdir(self.path)):
            if not name.endswith(".jsonl"):
                continue
            with open(os.path.join(self.path, name), encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        yield json.loads(line)


@dataclass
class _KVCommit(WriterCommitMessage):
    file: str
    rows: int


class KVWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sales_kv requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator):
        """Runs on executors: one independent part file per task — no
        shared state, no rename dance (KV puts are idempotent)."""
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps({f: row[f] for f in _FIELDS}) + "\n")
                n += 1
        return _KVCommit(file=fname, rows=n)

    def commit(self, messages):
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as fh:
            fh.write(json.dumps({"files": [m.file for m in messages], "rows": sum(m.rows for m in messages)}))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class KVDataSource(DataSource):
    """``spark.read.format("sales_kv").option("path", dir).load()`` /
    ``df.write.format("sales_kv").option("path", dir).mode("append").save()``."""

    @classmethod
    def name(cls) -> str:
        return "sales_kv"

    def schema(self) -> str:
        return KV_SCHEMA

    def reader(self, schema: StructType) -> KVReader:
        return KVReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KVWriter:
        return KVWriter(self.options, overwrite)
