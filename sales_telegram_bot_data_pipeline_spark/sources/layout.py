"""Storage-layout sources: ORC interchange round-trip and hive-partitioned
dataset writes with partition-pruned reads.

The 100 TB relevance: a production lake keeps hot fact tables
hive-partitioned on a low-cardinality routing column so that predicate
queries read only matching directories (partition pruning happens in the
driver BEFORE any task launches — pruned files are never opened), and
interchanges with engines that speak ORC.  Both paths here are exercised
end-to-end and oracle-checked against the parquet originals: the layout
must never change the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .tables import load_table

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _scratch(spark: SparkSession, kind: str, sf_dir: str) -> str:
    # app-keyed scratch (same discipline as the JSONL/CSV round-trips):
    # stable within one app — repeated runs overwrite — disjoint across apps
    return os.path.join(
        "/tmp",
        f"sales_telegram_bot_data_pipeline_{kind}_{spark.sparkContext.applicationId}",
        os.path.basename(sf_dir.rstrip("/")),
    )


@register(
    "orc_corpus_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    doc="ORC corpus source round-trip: the documents table written as ORC "
    "(the columnar interchange format next to parquet — zlib-compressed, "
    "schema-carrying, so the read needs no inference pass) and re-read; "
    "values must survive the format boundary exactly, which the oracle "
    "checks against the parquet original.",
    tags=("source", "orc", "roundtrip"),
)
def orc_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = _scratch(spark, "orc", sf_dir)
    docs.select(*DOC_COLS).write.mode("overwrite").orc(path)
    return spark.read.orc(path).select(*DOC_COLS).orderBy("doc_id")


PRUNE_KEEP = ("1-URGENT", "2-HIGH")


def write_orders_partitioned(df: DataFrame, path: str) -> None:
    """Hive-partition the orders table by o_orderpriority — the
    low-cardinality routing column a deployment partitions hot facts on.
    One directory per priority; the write repartitions on the partition
    column first so each directory is written by the tasks that own its
    rows (without it every task appends a small file to every directory —
    the classic small-files explosion at scale)."""
    (
        df.repartition("o_orderpriority")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(path)
    )


def read_orders_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Scan ONLY the PRUNE_KEEP partition directories: the filter is on the
    partition column, so Catalyst resolves it against directory names in
    the driver (PartitionFilters in the executed plan) and never opens the
    other directories' files — plan-asserted in
    tests/test_round6c_ops.py::test_partition_pruned_scan_plan."""
    return spark.read.parquet(path).where(F.col("o_orderpriority").isin(*PRUNE_KEEP))


@register(
    "partitioned_dataset_prune",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderpriority IN {PRUNE_KEEP}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Hive-partitioned dataset write + partition-pruned read: orders "
    "re-laid-out as one directory per o_orderpriority (repartition-first "
    "write avoids the small-files explosion), then scanned with a "
    "partition-column predicate that prunes at the DRIVER — non-matching "
    "directories are never opened (PartitionFilters plan-asserted). The "
    "oracle aggregates the same predicate over the unpartitioned original: "
    "layout must not change data.",
    tags=("source", "layout", "pruning"),
)
def partitioned_dataset_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(spark, "part_orders", sf_dir)
    write_orders_partitioned(orders, path)
    pruned = read_orders_pruned(spark, path)
    return (
        pruned.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_price"),
        )
        # the partition column comes back as the directory's string value;
        # group output is tiny (|PRUNE_KEEP| rows)
        .withColumn("o_orderpriority", F.col("o_orderpriority").cast("string"))
        .orderBy("o_orderpriority")
    )
