"""JSONL corpus source — the interchange format raw text corpora actually
ship in (one JSON object per line).

The reference moves JSON between tasks as strings (op 6 XCom shuttle,
``data_pipeline.py:56`` ``json.dumps`` / ``:73`` ``ast.literal_eval``); the
engine's native form is a first-class JSONL *source* with:

- an EXPLICIT schema (no inference pass over 100 TB — schema inference is
  a full extra scan and type-drifts between samples);
- PERMISSIVE mode with a ``_corrupt_record`` dead-letter column (op 45
  per-row error isolation applied at the ingest boundary: one mangled line
  must never fail a 100 TB load, and the corrupt rows stay queryable for
  triage);
- line-splittable scans (uncompressed/bgzip JSONL splits on newlines, so
  parallelism is free like parquet — unlike one giant JSON array).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..registry import register
from .tables import load_table

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        # dead-letter: PERMISSIVE mode parks the raw line here instead of
        # failing the task (must be part of the declared schema)
        StructField("_corrupt_record", StringType()),
    ]
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Spool a documents-shaped DataFrame as JSON lines (overwrite)."""
    df.select(*DOC_COLS).write.mode("overwrite").json(path)


def read_jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """Schema-explicit, dead-lettering JSONL scan of a documents corpus."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


@register(
    "jsonl_corpus_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    doc="JSONL corpus source round-trip: the documents table spooled as "
    "JSON lines (the raw-corpus interchange format) and re-read through "
    "the schema-explicit, PERMISSIVE dead-letter JSONL source — values "
    "must survive the format boundary exactly, which the oracle checks "
    "against the parquet original.  No schema inference (an extra full "
    "scan at 100 TB) and no fail-the-job parse mode.",
    tags=("source", "json", "roundtrip"),
)
def jsonl_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # app-keyed scratch (same discipline as the streaming spool): stable
    # within one app — repeated runs overwrite — disjoint across apps
    path = os.path.join(
        "/tmp",
        f"sales_telegram_bot_data_pipeline_jsonl_{spark.sparkContext.applicationId}",
        os.path.basename(sf_dir.rstrip("/")),
    )
    write_documents_jsonl(docs, path)
    # localCheckpoint BEFORE the dead-letter filter: Spark refuses any plan
    # whose pruned column set against a raw JSON/CSV scan is ONLY
    # _corrupt_record (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    # — a count() over this query prunes to exactly that shape.  Breaking
    # lineage materializes the parsed rows once and makes every downstream
    # plan shape legal.
    back = read_jsonl_documents(spark, path).localCheckpoint()
    return (
        back.where(F.col("_corrupt_record").isNull())
        .select(*DOC_COLS)
        .orderBy("doc_id")
    )
