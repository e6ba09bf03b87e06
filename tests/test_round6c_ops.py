"""Semantic checks for the third round-6 operator batch beyond the oracle
match: PQ-ADC exactness when the candidate pool covers the corpus (the
rerank is exact cosine, so PQ == brute force at full fan-out), and the
Matryoshka audit's built-in full-dimension self-check."""

from __future__ import annotations

import pytest

from sales_telegram_bot_data_pipeline_spark.operators import similarity as sim
from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
    _emb_view,
    _pq_sql,
    SPARK,
    TOP_K,
    N_QUERIES,
    knn_cosine_bruteforce,
    knn_cosine_pq,
    matryoshka_recall_audit,
)

from conftest import SF_SMOKE


def test_pq_full_candidate_pool_equals_bruteforce(spark, monkeypatch):
    """With PQ_CAND >= corpus size the ADC stage keeps everything and the
    exact-cosine rerank must reproduce brute force bit-for-bit — pins that
    the approximation lives ONLY in candidate selection, never scoring."""
    monkeypatch.setattr(sim, "PQ_CAND", 10_000)
    full = spark.sql(_pq_sql(SPARK, _emb_view(spark, SF_SMOKE))).collect()
    bf = knn_cosine_bruteforce(spark, SF_SMOKE).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert {key(r): (r["neighbor_id"], r["cosine"]) for r in full} == {
        key(r): (r["neighbor_id"], r["cosine"]) for r in bf
    }


def test_pq_shape_and_rerank_scores_exact(spark):
    """Default PQ output: TOP_K dense ranks per query; every returned
    cosine equals the exact cosine brute force computes for that same
    (query, neighbor) pair — ADC never leaks into the emitted score."""
    rows = knn_cosine_pq(spark, SF_SMOKE).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == set(range(N_QUERIES))
    bf_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in spark.sql(
            sim._rank_window_sql(
                sim._bruteforce_scored(SPARK, _emb_view(spark, SF_SMOKE)), k=10_000
            )
        ).collect()
    }
    for q, qrows in per_q.items():
        assert sorted(r["rank"] for r in qrows) == list(range(1, TOP_K + 1))
        ordered = sorted(qrows, key=lambda r: r["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["cosine"], -a["neighbor_id"]) >= (b["cosine"], -b["neighbor_id"])
        for r in qrows:
            assert r["cosine"] == pytest.approx(
                bf_scores[(r["query_id"], r["neighbor_id"])], abs=1e-9
            )


def test_matryoshka_full_dim_self_check(spark):
    rows = {r["dim"]: r for r in matryoshka_recall_audit(spark, SF_SMOKE).collect()}
    assert set(rows) == set(sim._MRL_DIMS)
    full = max(sim._MRL_DIMS)
    assert rows[full]["recall_at_k"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_truth"] == N_QUERIES * TOP_K
        assert r["n_hit"] <= r["n_truth"]
