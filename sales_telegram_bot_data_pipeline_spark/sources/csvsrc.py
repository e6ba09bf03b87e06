"""CSV corpus source — the OTHER interchange format corpora arrive in
(exports from spreadsheets, legacy warehouses, vendor drops).

Same ingest discipline as the JSONL source (sources/jsonl.py):

- EXPLICIT schema, never inference (an extra full scan at 100 TB, and CSV
  inference is the worst offender — every column starts life as a string
  and type-drifts between samples);
- PERMISSIVE mode with a ``_corrupt_record`` dead-letter column (op 45
  per-row error isolation at the ingest boundary — a mangled line must
  never fail the load, and the corrupt rows stay queryable for triage);
- quote/escape handled by the writer+reader pair (a free-text column WILL
  contain the delimiter eventually); ``multiLine`` stays OFF so the scan
  remains line-splittable — embedded newlines belong in JSONL/parquet,
  not CSV, and the dead-letter column is exactly where a violation lands.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..registry import register
from .tables import load_table

DOCUMENTS_CSV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("_corrupt_record", StringType()),
    ]
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

_CSV_OPTS = {"header": "false", "quote": '"', "escape": '"', "sep": ","}


def write_documents_csv(df: DataFrame, path: str) -> None:
    """Spool a documents-shaped DataFrame as quoted CSV (overwrite)."""
    df.select(*DOC_COLS).write.mode("overwrite").options(**_CSV_OPTS).csv(path)


def read_csv_documents(spark: SparkSession, path: str) -> DataFrame:
    """Schema-explicit, dead-lettering CSV scan of a documents corpus."""
    return (
        spark.read.schema(DOCUMENTS_CSV_SCHEMA)
        .options(**_CSV_OPTS)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


@register(
    "csv_corpus_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    doc="CSV corpus source round-trip: the documents table spooled as "
    "quoted CSV and re-read through the schema-explicit, PERMISSIVE "
    "dead-letter CSV source — values must survive the format boundary "
    "exactly (oracle = the parquet original). No schema inference, no "
    "fail-the-job parse mode, line-splittable scan (multiLine off).",
    tags=("source", "csv", "roundtrip"),
)
def csv_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        "/tmp",
        f"sales_telegram_bot_data_pipeline_csv_{spark.sparkContext.applicationId}",
        os.path.basename(sf_dir.rstrip("/")),
    )
    write_documents_csv(docs, path)
    # localCheckpoint before the dead-letter filter — same reason as the
    # JSONL twin: a count()-shaped plan prunes to only _corrupt_record,
    # which Spark refuses against a raw CSV scan.
    back = read_csv_documents(spark, path).localCheckpoint()
    return (
        back.where(F.col("_corrupt_record").isNull())
        .select(*DOC_COLS)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# parquet schema evolution (mergeSchema) — the 100-TB schema-drift surface
# --------------------------------------------------------------------------
@register(
    "parquet_schema_evolution",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
FROM documents
ORDER BY doc_id
""",
    doc="Schema evolution round-trip: half the corpus written under the OLD "
    "schema (doc_id, lang), half under the NEW one (+ n_chars), read back "
    "in one scan with mergeSchema — old files surface the added column as "
    "NULL, nothing rewrites. The drift story a long-lived 100 TB dataset "
    "lives with (columns are added, history is not backfilled); oracle "
    "derives the same NULL pattern from the parquet original.",
    tags=("source", "schema-evolution", "roundtrip"),
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = os.path.join(
        "/tmp",
        f"sales_telegram_bot_data_pipeline_schevo_{spark.sparkContext.applicationId}",
        os.path.basename(sf_dir.rstrip("/")),
    )
    docs.where("doc_id % 2 = 0").select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "gen=old"))
    docs.where("doc_id % 2 = 1").select("doc_id", "lang", "n_chars").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "gen=new"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen=old"), os.path.join(base, "gen=new")
    )
    return merged.select("doc_id", "lang", "n_chars").orderBy("doc_id")
