"""Semantic checks for the round-6 operator additions beyond the oracle
match: sessionization partition/gap invariants, TF-IDF ranking sanity,
MinHash estimator-error bounds, and robust median/MAD cross-checked against
DuckDB's native median()/mad() aggregates."""

from __future__ import annotations

import duckdb

from sales_telegram_bot_data_pipeline_spark.operators.scalars_extra import (
    OUTLIER_K,
    robust_price_outliers,
)
from sales_telegram_bot_data_pipeline_spark.operators.temporal import (
    SESSIONIZE_GAP_S,
    SESSIONIZE_USER_MOD,
    sessionize_gap_islands,
)
from sales_telegram_bot_data_pipeline_spark.operators.retrieval import (
    TFIDF_TOP_K,
    tfidf_top_terms,
)
from sales_telegram_bot_data_pipeline_spark.operators.dedup import (
    dedup_minhash_lsh,
    minhash_estimate_error_audit,
)
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_sessionize_partitions_all_sampled_events(spark):
    """Sessions must PARTITION the sampled users' events: per-session
    counts sum to the sampled event count, session sequences are dense
    from 1, and a session's span can only exceed the gap threshold via
    chained events (duration < n_events * gap)."""
    sessions = sessionize_gap_islands(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    n_sampled = ev.where(f"user_id % {SESSIONIZE_USER_MOD} = 0").count()
    assert sum(r["n_events"] for r in sessions) == n_sampled
    by_user: dict[int, list] = {}
    for r in sessions:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rows in by_user.items():
        seqs = sorted(r["session_seq"] for r in rows)
        assert seqs == list(range(1, len(rows) + 1)), f"user {user} seqs not dense"
        for r in rows:
            assert r["duration_s"] >= 0
            # a session of n events spans at most (n-1) gaps of <= GAP each
            assert r["duration_s"] <= (r["n_events"] - 1) * SESSIONIZE_GAP_S
        # consecutive sessions are separated by MORE than the gap
        rows_sorted = sorted(rows, key=lambda r: r["session_seq"])
        for a, b in zip(rows_sorted, rows_sorted[1:]):
            assert b["session_start_ep"] - a["session_end_ep"] > SESSIONIZE_GAP_S


def test_tfidf_top_terms_ranked_and_bounded(spark):
    rows = tfidf_top_terms(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc, "no documents scored"
    for doc, terms in by_doc.items():
        assert 1 <= len(terms) <= TFIDF_TOP_K
        ranked = sorted(terms, key=lambda r: r["rk"])
        assert [r["rk"] for r in ranked] == list(range(1, len(terms) + 1))
        # scores non-increasing with rank; smooth idf keeps them positive
        for a, b in zip(ranked, ranked[1:]):
            assert a["score"] >= b["score"]
        assert all(r["score"] > 0 for r in terms)


def test_minhash_estimate_error_within_bounds(spark):
    """The agreement fraction and exact Jaccard both live in [0,1], so
    every per-pair error does too; mean <= max; and the audit must cover
    exactly the LSH candidate pairs."""
    row = minhash_estimate_error_audit(spark, SF_SMOKE).collect()[0]
    n_pairs = dedup_minhash_lsh(spark, SF_SMOKE).count()
    assert row["n_pairs"] == n_pairs
    assert 0.0 <= row["mean_abs_err"] <= row["max_abs_err"] <= 1.0


def test_robust_outliers_match_duckdb_native_aggregates(spark):
    """The distributed-rank median/MAD must equal DuckDB's NATIVE median()
    and mad() aggregates exactly (both are exact algorithms on the same
    integer-cents data), and the outlier count must equal a direct
    recount under the same rule."""
    got = robust_price_outliers(spark, SF_SMOKE).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    )
    med, mad, n = con.execute(
        "SELECT CAST(median(CAST(o_totalprice*100 AS BIGINT)) AS DOUBLE) / 100.0,"
        "       CAST(mad(CAST(o_totalprice*100 AS BIGINT)) AS DOUBLE) / 100.0,"
        "       COUNT(*) FROM orders"
    ).fetchone()
    assert got["n_orders"] == n
    assert abs(got["median_price"] - med) < 1e-6
    assert abs(got["mad_price"] - mad) < 1e-6
    n_out = con.execute(
        f"SELECT COUNT(*) FROM orders WHERE abs(o_totalprice - {med}) > {OUTLIER_K} * {mad}"
    ).fetchone()[0]
    assert got["n_outliers"] == n_out
