"""Arrow IPC (Feather v2 stream) corpus source — the zero-copy
interchange format ML dataloaders consume directly (HuggingFace
datasets, polars, DuckDB all read Arrow IPC without a parse step).

The reference ships data between tasks as JSON strings (op 6 XCom
shuttle); the engine's training-data tail wants a columnar binary
handoff instead.  Design points, 100-TB honest:

- WRITE is partition-parallel: every Spark partition spools ITS OWN
  ``.arrows`` stream file through ``mapInPandas`` (Arrow batches are the
  native interchange of a pandas UDF, so serialization is one memcpy —
  no driver collect, no single writer).  The task returns a one-row
  (file, n_rows) summary, so the job's result set is O(partitions).
- READ goes through ``binaryFile`` + an Arrow decode ``mapInPandas``:
  one file = one task (IPC streams are not mid-file splittable — unlike
  parquet row groups; the writer controls parallelism by partition
  count, which is exactly how sharded ``.arrows`` datasets ship).
- The declared schema is explicit on both sides; a file whose embedded
  schema drifts from the contract fails loudly at decode (schema drift
  must never silently cast at 100 TB).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from .tables import load_table

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
DOC_SPARK_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _expected_pa_schema():
    """The declared Arrow contract — names AND types.  A file whose
    embedded schema drifts in type (doc_id written int32, n_chars
    double) must fail at decode, not silently cast through to_pandas."""
    import pyarrow as pa

    return pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )


def write_documents_arrow(df: DataFrame, path: str) -> list:
    """Spool a documents-shaped DataFrame as one Arrow IPC stream file
    per partition; returns the bounded (file, n_rows) summary rows."""
    import pandas as pd

    # Fresh directory every write: a re-run that produces FEWER partitions
    # must not leave stale part-*.arrows files for the reader to silently
    # re-read (duplicate rows).
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def _write(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pyarrow as pa
        from pyspark import TaskContext

        contract = _expected_pa_schema()
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.arrows")
        n = 0
        writer = None
        try:
            for pdf in batches:
                tbl = pa.Table.from_pandas(
                    pdf[DOC_COLS], preserve_index=False
                ).cast(contract)  # pin the written schema to the contract
                if writer is None:
                    sink = pa.OSFile(fname, "wb")
                    writer = pa.ipc.new_stream(sink, tbl.schema)
                writer.write_table(tbl)
                n += len(pdf)
        finally:
            if writer is not None:
                writer.close()
        if n:
            yield pd.DataFrame({"file": [fname], "n_rows": [n]})

    return (
        df.select(*DOC_COLS)
        .mapInPandas(_write, "file string, n_rows long")
        .collect()  # bounded: one row per partition
    )


def read_arrow_documents(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of ``.arrows`` stream files: binaryFile source
    (one task per file) + Arrow decode in mapInPandas.  The embedded
    schema is checked against the declared contract — drift fails the
    task, never silently casts."""
    import pandas as pd

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pyarrow as pa

        contract = _expected_pa_schema()
        for pdf in batches:
            for content in pdf["content"]:
                with pa.ipc.open_stream(pa.BufferReader(content)) as reader:
                    # names AND types — a type drift (doc_id int32,
                    # n_chars double) must fail loudly, not be cast by
                    # to_pandas on the way through
                    if not reader.schema.equals(contract):
                        raise ValueError(
                            f"arrow schema drift: {reader.schema} "
                            f"!= {contract}"
                        )
                    for batch in reader:
                        yield batch.to_pandas()

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arrows")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_decode, DOC_SPARK_SCHEMA)


@register(
    "arrow_ipc_corpus_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    doc="Arrow IPC (Feather v2 stream) corpus round-trip: the documents "
    "table spooled as one .arrows stream file per partition through "
    "mapInPandas (partition-parallel, no driver collect — the write "
    "job's result is the bounded per-file summary) and re-read through "
    "binaryFile + Arrow decode with a fail-loud schema-drift check.  "
    "Values must survive the columnar binary boundary exactly; the "
    "oracle checks against the parquet original.  The zero-copy "
    "dataloader handoff beside the JSONL (line-text) and CSV "
    "(delimited) sources.",
    tags=("source", "arrow", "roundtrip", "udf"),
)
def arrow_ipc_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # key the spool dir on the FULL sf_dir path (md5), not its basename —
    # two datasets sharing a leaf dir name in one app must not collide
    # (same keying as the session-view cache)
    sf_key = hashlib.md5(
        os.path.abspath(sf_dir.rstrip("/")).encode("utf-8")
    ).hexdigest()[:16]
    path = os.path.join(
        "/tmp",
        f"sales_telegram_bot_data_pipeline_arrow_{spark.sparkContext.applicationId}",
        sf_key,
    )
    write_documents_arrow(docs, path)
    return read_arrow_documents(spark, path).orderBy("doc_id")
