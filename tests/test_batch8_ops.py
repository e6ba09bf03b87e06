"""Pins for the eighth round-7-continuation batch: SQ8 quantization error
audit, Mann-Kendall trend test, trimmed/winsorized mean, Neyman-allocated
stratified sample."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def test_sq8_error_audit_matches_numpy(spark):
    import hashlib

    import numpy as np

    from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
        SQ8_AUDIT_SUBSET_MOD,
        _banded_view,
    )
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import DUCKDB

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    bv = _banded_view(DUCKDB, "embeddings")
    pairs = con.sql(
        f"SELECT DISTINCT a.vec_id, b.vec_id FROM ({bv}) a JOIN ({bv}) b "
        f"ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id"
    ).fetchall()
    # the audit scores a deterministic md5 quarter of the pairs (round-8
    # trim) — apply the same subset rule here
    pairs = [
        (a, b)
        for a, b in pairs
        if int(hashlib.md5(f"{a}_{b}".encode()).hexdigest()[:15], 16)
        % SQ8_AUDIT_SUBSET_MOD
        == 0
    ]
    vecs = {
        vid: np.asarray(e, dtype=np.float64)
        for vid, e in con.sql("SELECT vec_id, embedding FROM embeddings").fetchall()
    }
    con.close()

    def codes(v):
        sc = 127.0 / np.abs(v).max()
        return np.floor(v * sc).astype(np.int64)

    errs = []
    for a, b in pairs:
        va, vb = vecs[a], vecs[b]
        exact = round(float(va @ vb) / (math.sqrt(va @ va) * math.sqrt(vb @ vb)), 6)
        ca, cb = codes(va), codes(vb)
        est = round(float(ca @ cb) / math.sqrt(float(ca @ ca) * float(cb @ cb)), 6)
        errs.append(round(abs(exact - est) * 1e6))
    rows = q.REGISTRY["sq8_quantization_error_audit"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_pairs == len(pairs)
    assert abs(r.mean_abs_err - round(sum(errs) / len(errs) / 1e6, 6)) < 1e-9
    assert abs(r.max_abs_err - max(errs) / 1e6) < 1e-9
    assert 0.0 <= r.frac_within_001 <= 1.0


def test_mann_kendall_matches_python(spark):
    con = duckdb.connect()
    weekly = dict(
        con.sql(
            f"""SELECT CAST(FLOOR(datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) / 7.0) AS BIGINT) AS w,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS DECIMAL(38,0))) AS BIGINT)
            FROM read_parquet('{SF_SMOKE}/orders.parquet') GROUP BY w"""
        ).fetchall()
    )
    con.close()
    xs = sorted(weekly)
    n = len(xs)
    s = sum(
        (weekly[b] > weekly[a]) - (weekly[b] < weekly[a])
        for i, a in enumerate(xs)
        for b in xs[i + 1 :]
    )
    tie = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(weekly.values()).values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie
    cc = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
    z = cc / math.sqrt(var18 / 18.0)
    rows = q.REGISTRY["mann_kendall_trend"].fn(spark, SF_SMOKE).collect()
    r = rows[0]
    assert (r.n_weeks, r.s_stat, r.var18_num) == (n, s, var18)
    assert abs(r.z_stat - round(z, 6)) < 1e-9
    assert r.significant_05 == (abs(z) > 1.96)


def test_trimmed_winsorized_matches_python(spark):
    con = duckdb.connect()
    cents = sorted(
        c
        for (c,) in con.sql(
            f"SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" FROM read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    )
    con.close()
    n = len(cents)
    k = n * 10 // 100
    kept = cents[k : n - k]
    lo, hi = cents[k], cents[n - k - 1]
    r = q.REGISTRY["trimmed_winsorized_mean"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.n_rows, r.k_trim) == (n, k)
    assert abs(r.mean_price - round(sum(cents) / n / 100, 6)) < 1e-9
    assert abs(r.trimmed_mean - round(sum(kept) / len(kept) / 100, 6)) < 1e-9
    wins = sum(kept) + k * lo + k * hi
    assert abs(r.winsorized_mean - round(wins / n / 100, 6)) < 1e-9
    assert r.lo_cut <= r.trimmed_mean <= r.hi_cut


def test_neyman_sample_hits_allocation_and_is_deterministic(spark):
    rows1 = q.REGISTRY["neyman_allocated_sample"].fn(spark, SF_SMOKE).collect()
    rows2 = q.REGISTRY["neyman_allocated_sample"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    assert rows1
    for r in rows1:
        assert r.n_sampled == min(r.allocated, r.n_docs)
        if r.n_sampled:
            assert r.sample_mean_chars > 0
    # the whole point of Neyman: allocations differ across strata unless
    # every stratum has identical n*sd — assert the plan is non-trivial
    assert len({r.allocated for r in rows1}) >= 1
