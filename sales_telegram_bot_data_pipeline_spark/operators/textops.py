"""Text-analysis queries over the documents table: normalization (op 15),
language-ID heuristic, quality scoring, token counting, fingerprinting.

These generalize the reference's OCR-text cleanup surface
(correct_names.py:13-18) into the text-analysis family a large-scale
training-data pipeline runs over billions of documents.  Everything is a
projection — embarrassingly parallel, no shuffle except the final orderBy
(dropped at scale); filters/column pruning reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.dialect import DUCKDB, SPARK, Dialect
from ..functions.text import (
    fingerprint_fields_sql,
    normalize_sql,
    quality_fields_sql,
    stopword_ratio_sql,
    token_count_sql,
)
from ..registry import register
from ..sources.tables import load_table


def _doc_view(spark: SparkSession, sf_dir: str, name: str = "sales_telegram_bot_data_pipeline_docs") -> str:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(name)
    return name


# Inject reference-shaped dirt (tab, pipe, NBSP, diacritics) so the
# normalization actually exercises every rule — documents.text is plain
# ASCII.  Unicode goes into the literal directly (chr(n) is byte-valued in
# Spark and code-point-valued in DuckDB, so it is only safe for ASCII).
def _dirty(d: Dialect, x: str) -> str:
    nbsp = " "
    return f"('Smetanový' || chr(9) || 'jogurt | ' || {x} || '{nbsp}mléko™')"


def _norm_query_sql(d: Dialect, table: str) -> str:
    dirty = _dirty(d, "text")
    return (
        f"SELECT doc_id, {normalize_sql(d, dirty)} AS normalized "
        f"FROM {table} ORDER BY doc_id"
    )


@register(
    "preprocess_text_normalize",
    oracle=_norm_query_sql(DUCKDB, "documents"),
    doc="Reference op 15 preprocess_text: delete tab/newline/pipe, NBSP→space, "
    "lower, fold Czech diacritics, non-ASCII→space — native expressions over "
    "dirtied document text ('Smetanový\\tjogurt | …' prefix exercises every rule).",
    tags=("text", "scalar"),
)
def preprocess_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_norm_query_sql(SPARK, _doc_view(spark, sf_dir)))


def _lang_query_sql(d: Dialect, table: str) -> str:
    ratio = stopword_ratio_sql(d, "text")
    return (
        f"SELECT doc_id, lang AS declared_lang, {ratio} AS en_stopword_ratio, "
        f"CASE WHEN {ratio} >= 0.05 THEN 'en' ELSE 'other' END AS guessed_lang "
        f"FROM {table} ORDER BY doc_id"
    )


@register(
    "lang_id_heuristic",
    oracle=_lang_query_sql(DUCKDB, "documents"),
    doc="Language-ID heuristic: English-stopword density over tokens; "
    "row-parallel, no shuffle.",
    tags=("text",),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_lang_query_sql(SPARK, _doc_view(spark, sf_dir)))


def _quality_query_sql(d: Dialect, table: str) -> str:
    fields = quality_fields_sql(d, "text")
    cols = ", ".join(f"{sql} AS {name}" for name, sql in fields.items())
    return f"SELECT doc_id, {cols} FROM {table} ORDER BY doc_id"


@register(
    "text_quality_stats",
    oracle=_quality_query_sql(DUCKDB, "documents"),
    doc="Quality scoring: token count, avg token length, type-token ratio, "
    "stopword ratio, punctuation count per document.",
    tags=("text",),
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_quality_query_sql(SPARK, _doc_view(spark, sf_dir)))


def _tokcount_query_sql(d: Dialect, table: str) -> str:
    return (
        f"SELECT doc_id, n_chars, {token_count_sql(d, 'text')} AS n_bpe_ish_tokens, "
        f"{d.alen(d.splitws('text'))} AS n_ws_tokens "
        f"FROM {table} ORDER BY doc_id"
    )


@register(
    "token_count",
    oracle=_tokcount_query_sql(DUCKDB, "documents"),
    doc="Token counting: whitespace tokens + BPE-ish regex pieces "
    "(word chars / isolated punctuation).",
    tags=("text",),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_tokcount_query_sql(SPARK, _doc_view(spark, sf_dir)))


def _fp_query_sql(d: Dialect, table: str) -> str:
    fields = fingerprint_fields_sql(d, "text")
    cols = ", ".join(f"{sql} AS {name}" for name, sql in fields.items())
    return f"SELECT doc_id, {cols} FROM {table} ORDER BY doc_id"


@register(
    "doc_fingerprint",
    oracle=_fp_query_sql(DUCKDB, "documents"),
    doc="Document fingerprinting: md5 of canonicalized text + portable "
    "60-bit integer prefix (identical across engines).",
    tags=("text", "hash"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_fp_query_sql(SPARK, _doc_view(spark, sf_dir)))
