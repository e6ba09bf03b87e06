"""Pin that NOTHING depends on the engine's tuned session (session.py).

The driver builds its own DEFAULT SparkSession — ANSI mode ON, default
shuffle partitions, none of get_spark's configs — so a query that only
passes under the repo session would pass pytest and fail the driver.  Run
one curated-window query through the full oracle compare in a fresh
subprocess using plain ``SparkSession.builder.getOrCreate()``.
"""

from __future__ import annotations

import subprocess
import sys

from conftest import SF_SMOKE

_SCRIPT = f"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")  # test hygiene only, not a tuning
    .getOrCreate()
)
import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401  (populate registry)
from sales_telegram_bot_data_pipeline_spark.oracle import compare_query, duckdb_connection

con = duckdb_connection({SF_SMOKE!r})
# flagship + the queries whose driver rows changed this round (round-5
# window rotation swap-ins) + representatives of the round-5 operator
# families (ANSI mode is the risk: arithmetic that wraps on the tuned
# session ERRORS on the driver's)
for name in (
    "detected_data_native",
    "price_dispatcher_suite",
    "curation_pipeline_end2end",
    "table_checksum_audit",
    "pagerank_neardup_graph",
    "bigram_lm_score",
    "recursive_hierarchy_rollup",
    "lateral_topk_orders",
    "pit_join_scd2",
    "sketch_rollup_distinct",
    "winnowing_doc_matches",
    "label_propagation_communities",
    "countmin_heavy_hitters",
    "weighted_sample_aes",
    "hybrid_rrf_retrieval",
    "lsh_recall_audit",
    "snapshot_diff_audit",
    "zipf_fit_audit",
    "bitext_margin_mining",
    "curation_pipeline_v2",
    "dedup_containment",
    "user_cadence_profile",
    # round-6 second-wave families (ANSI risks each covers: decimal div /
    # rank arithmetic, NULLIF-guarded z denominator, TIMESTAMP_NTZ casts,
    # saveAsTable under the default catalog, mapInPandas summaries, the
    # ExistenceJoin-avoiding LEFT-JOIN flag)
    "rfm_segmentation",
    "spearman_rank_correlation",
    "ab_conversion_ztest",
    "time_weighted_average_value",
    "bucketed_join_colocated",
    "misra_gries_topk",
    "mips_topk_audit",
    # round-7 rotation swap-ins not already above (ANSI risks: ratio
    # divisions NULLIF-guarded, md5-hash arithmetic, per-band candidate
    # counts, blocked-join key casts, segment-ratio doubles, support/lift
    # divisions, rank-blend integer sums)
    "leakage_safe_split",
    "dedup_prefix_filter_join",
    "quality_rank_blend",
    "lsh_band_tuning_audit",
    "record_linkage_blocked",
    "boilerplate_segment_removal",
    "association_rules_lift",
    # round-8 rotation swap-ins not already above (ANSI risks: midrank
    # DECIMAL numerators + NULLIF-guarded AUC divisors, milli-unit
    # weight sums, weighted-median selection casts, CUSUM DECIMAL prefix
    # arithmetic, runtime-filter plan under default AQE, nano-unit LN
    # survival sums, weekly-median interpolation, day-spine prefix sums)
    "apss_cosine_join",
    "roc_auc_quality_score",
    "weighted_median_by_flag",
    "cusum_change_detection",
    "dynamic_partition_pruned_join",
    "sq8_quantization_error_audit",
    "kaplan_meier_repurchase",
    "theilsen_trend_robust",
    "hll_cumulative_distinct_audit",
):
    r = compare_query(spark, con, name, {SF_SMOKE!r})
    assert r.ok, f"{{name}} failed on a DEFAULT session: {{r.detail}}"
    print("OK", name)
spark.stop()
"""


def test_default_session_oracle_parity():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert proc.stdout.count("OK") == 45
