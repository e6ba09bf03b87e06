"""Round-7 operator pins: dynamic partition pruning (the runtime
scan-killer next to static pruning), and the streaming replay session
right-sizing invariants."""

from __future__ import annotations

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def _formatted_plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dynamic_partition_pruning_in_plan(spark):
    """The fact scan must carry a dynamicpruning subquery in its
    PartitionFilters: the dim-side tier filter is not on the partition
    column, so only RUNTIME pruning (broadcast reuse) can skip the cold
    directories — a static PartitionFilters entry alone would mean Catalyst
    folded the dim away and the query stopped proving DPP."""
    df = q.REGISTRY["dynamic_partition_pruned_join"].fn(spark, SF_SMOKE)
    df.collect()
    plan = _formatted_plan(df)
    assert "dynamicpruningexpression" in plan.lower(), (
        "fact scan lost its dynamic partition pruning filter"
    )
    assert "PartitionFilters" in plan


def test_dpp_join_prunes_to_hot_priorities(spark):
    rows = q.REGISTRY["dynamic_partition_pruned_join"].fn(spark, SF_SMOKE).collect()
    prios = [r.o_orderpriority for r in rows]
    assert prios == sorted(prios)
    assert all(p.startswith(("1-", "2-")) for p in prios)
    assert all(r.n_orders > 0 for r in rows)


def test_stream_session_is_isolated(spark):
    """stream_session must clone, not mutate: the shared session's conf is
    untouched (the bench warm-up runs 8 queries concurrently in one
    session) while the clone carries the right-sized state partitioning."""
    from sales_telegram_bot_data_pipeline_spark.streaming.windows import (
        STREAM_STATE_PARTITIONS,
        stream_session,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    s = stream_session(spark)
    assert s is not spark
    assert s.conf.get("spark.sql.shuffle.partitions") == str(STREAM_STATE_PARTITIONS)
    assert s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled") == "false"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true") != "false"
