"""Runtime-filtering proofs: dynamic partition pruning (DPP) and Bloom-filter
runtime filters — the two Spark mechanisms that turn a selective dimension
predicate into fact-side data skipping at execution time.  At 100 TB these
are the difference between scanning a year and scanning a day: DPP prunes
whole partitions of a partitioned fact table from the dim side's broadcast
result; the Bloom filter pre-filters shuffle-join probe rows at the scan.
Neither needs operator code — they are planner features the engine's layout
(partitioned datasets, selective dim filters) must be SHAPED to trigger,
which is exactly what these tests pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_telegram_bot_data_pipeline_spark.sinks.dataset import write_dataset
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _plan_of(df) -> str:
    df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    root = str(tmp_path / "orders_by_year")
    write_dataset(orders, root, partition_by=("o_year",), n_shards=2)
    fact = spark.read.parquet(root)

    dim = spark.createDataFrame(
        [(y, "hot" if y == 1995 else "cold") for y in range(1992, 1999)],
        "o_year int, temp string",
    ).where(F.col("temp") == "hot")

    joined = fact.join(dim, "o_year").agg(
        F.count("*").alias("n"), F.countDistinct("o_year").alias("n_years")
    )
    plan = _plan_of(joined)
    assert "dynamicpruning" in plan.lower(), "partition filter was not injected from the dim side"
    row = joined.collect()[0]
    assert row["n_years"] == 1  # only the 1995 partition survived


def test_bloom_filter_runtime_filter_on_shuffle_join(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # local test tables are far below the 10 GB production default
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join so the bloom filter (not a broadcast) does the work
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.count("*").alias("n")
        )
        plan = _plan_of(joined)
        assert "bloomfilter" in plan.lower() or "might_contain" in plan.lower(), (
            "no runtime bloom filter was injected on the probe side"
        )
        assert joined.collect()[0]["n"] > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE skew-join handling: a join keyed on a pathologically hot key
    must show a skew=true sort-merge join in the adaptive plan — the
    runtime answer to hot-key shuffles that salting answers statically
    (operators/scale.py).  Thresholds are scaled to local data; the
    mechanism is identical at 256 MB partitions on a cluster."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        # left: 500k rows, 95% on the hot key; right: a normal dim —
        # the one-sided skew that split-and-replicate handles
        left = spark.range(500_000).select(
            F.when(F.col("id") % 20 < 19, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(2_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("w")
        )
        joined = left.join(right, "k").agg(F.count("*").alias("n"))
        joined.collect()
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "skew=true" in plan, "AQE did not mark/split the skewed join partition"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
