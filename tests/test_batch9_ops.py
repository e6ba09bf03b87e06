"""Pins for the ninth round-7-continuation batch: CUSUM change detection
(closed form) and the share-of-parent rollup.  The streaming Misra-Gries
twin is pinned in test_stateful_streaming.py (multi-batch parity)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def test_cusum_matches_python_closed_form(spark):
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
    s = sum(weekly.values())
    qq = sum(v * v for v in weekly.values())
    sigma_scaled = math.sqrt(qq * n - s * s)
    slack = math.floor(0.5 * sigma_scaled)
    h = math.floor(4.0 * sigma_scaled)
    p, minp, expect = 0, 0, {}
    for x in xs:
        p += weekly[x] * n - s - slack
        cus = max(p - min(minp, 0), 0)
        minp = min(minp, p)
        expect[x] = (cus, cus > h)
    rows = q.REGISTRY["cusum_change_detection"].fn(spark, SF_SMOKE).collect()
    assert [r.week for r in rows] == xs
    for r in rows:
        cus, alarm = expect[r.week]
        assert abs(r.cusum_dollars - round(cus / n / 100, 6)) < 1e-6
        assert r.alarm == alarm
    assert all(r.cusum_dollars >= 0 for r in rows)


def test_share_of_parent_matches_python(spark):
    con = duckdb.connect()
    rows_in = con.sql(
        f"""SELECT r.r_name, n.n_name,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS DECIMAL(38,0))) AS BIGINT)
           FROM read_parquet('{SF_SMOKE}/orders.parquet') o
           JOIN read_parquet('{SF_SMOKE}/customer.parquet') c ON c.c_custkey = o.o_custkey
           JOIN read_parquet('{SF_SMOKE}/nation.parquet') n ON n.n_nationkey = c.c_nationkey
           JOIN read_parquet('{SF_SMOKE}/region.parquet') r ON r.r_regionkey = n.n_regionkey
           GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    reg = defaultdict(int)
    for rg, _, c in rows_in:
        reg[rg] += c
    total = sum(reg.values())
    nat = {(rg, na): c for rg, na, c in rows_in}
    out = q.REGISTRY["share_of_parent_rollup"].fn(spark, SF_SMOKE).collect()
    assert {(r.region, r.nation) for r in out} == set(nat)
    for r in out:
        c = nat[(r.region, r.nation)]
        assert r.nation_cents == c
        assert r.region_cents == reg[r.region]
        assert abs(r.share_of_region - round(c / reg[r.region], 6)) < 1e-9
        assert abs(r.share_of_total - round(c / total, 6)) < 1e-9
    # shares within each region sum to ~1
    by_region = defaultdict(float)
    for r in out:
        by_region[r.region] += r.share_of_region
    assert all(abs(v - 1.0) < 1e-4 for v in by_region.values())


def test_hll_cumulative_audit_exact_curve_and_band(spark):
    con = duckdb.connect()
    pairs = con.sql(
        f"SELECT CAST(CAST(ts AS DATE) AS VARCHAR), user_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    con.close()
    firsts = {}
    for day, u in pairs:
        if u not in firsts or day < firsts[u]:
            firsts[u] = day
    days = sorted({d for d, _ in pairs})
    rows = q.REGISTRY["hll_cumulative_distinct_audit"].fn(spark, SF_SMOKE).collect()
    assert [r.day for r in rows] == days
    prev = 0
    for r in rows:
        expect = sum(1 for fd in firsts.values() if fd <= r.day)
        assert r.exact_cum_users == expect
        assert r.exact_cum_users >= prev  # monotone
        prev = r.exact_cum_users
        assert r.new_users == r.exact_cum_users - (
            0 if r.day == days[0] else next(
                x.exact_cum_users for x in rows
                if x.day == days[days.index(r.day) - 1]
            )
        )
    assert rows[-1].exact_cum_users == len(firsts)
    # The 15% sketch contract is WITHIN-ENGINE now (round-8 advisory: the
    # cross-engine flag compared two different estimators and could flip
    # on one engine only): Spark's HLL prefix-union estimate vs the Spark
    # exact curve, per day.
    from sales_telegram_bot_data_pipeline_spark.operators.scalars_extra import hll_prefix_estimates

    est = {r.day: r.a_est for r in hll_prefix_estimates(spark, SF_SMOKE).collect()}
    assert set(est) == set(days)
    for r in rows:
        band = max(1.0, 0.15 * r.exact_cum_users)
        assert abs(est[r.day] - r.exact_cum_users) <= band  # HLL rsd ~1.6%
