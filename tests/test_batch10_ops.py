"""Pins for the tenth round-7-continuation batch: sensitivity audit,
circular time-of-day statistics, cohort LTV triangle."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def _fetch(sql: str):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    rows = con.sql(sql).fetchall()
    con.close()
    return rows


def test_sensitivity_audit_matches_python(spark):
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for et, u, v in _fetch(
        "SELECT event_type, user_id, CAST(ROUND(value * 1000000) AS BIGINT) FROM events"
    ):
        e = per[et][u]
        e[0] += 1
        e[1] += v
    rows = q.REGISTRY["aggregate_sensitivity_audit"].fn(spark, SF_SMOKE).collect()
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        users = per[r.event_type]
        n_rows = sum(e[0] for e in users.values())
        tot = sum(e[1] for e in users.values())
        max_rows = max(e[0] for e in users.values())
        max_val = max(abs(e[1]) for e in users.values())
        assert (r.n_rows, r.n_users) == (n_rows, len(users))
        assert abs(r.max_row_share - round(max_rows / n_rows, 6)) < 1e-9
        assert abs(r.max_value_share - round(max_val / abs(tot), 6)) < 1e-9
        assert r.dominated == (max_rows / n_rows > 0.01)
        assert 0 < r.max_row_share <= 1


def test_circular_profile_matches_python(spark):
    acc = defaultdict(lambda: [0, 0, 0])
    for et, sod in _fetch(
        "SELECT event_type, EXTRACT(hour FROM ts)*3600 + EXTRACT(minute FROM ts)*60"
        " + EXTRACT(second FROM ts) FROM events"
    ):
        ang = sod * 2 * math.pi / 86400.0
        e = acc[et]
        e[0] += round(math.cos(ang) * 1e9)
        e[1] += round(math.sin(ang) * 1e9)
        e[2] += 1
    rows = q.REGISTRY["circular_time_profile"].fn(spark, SF_SMOKE).collect()
    assert {r.event_type for r in rows} == set(acc)
    for r in rows:
        sx, sy, n = acc[r.event_type]
        mean = math.atan2(sy, sx)
        if mean < 0:
            mean += 2 * math.pi
        mean_h = mean * 86400.0 / (2 * math.pi) / 3600.0
        rr = math.sqrt(sx * sx + sy * sy) / n / 1e9
        assert abs(r.mean_hour - round(mean_h, 6)) < 1e-6
        assert abs(r.resultant_r - round(rr, 6)) < 1e-6
        assert abs(r.rayleigh_z - round(n * rr * rr, 6)) < 1e-4
        assert 0 <= r.mean_hour < 24 and 0 <= r.resultant_r <= 1


def test_ltv_triangle_matches_python(spark):
    orders = _fetch(
        "SELECT o_custkey, datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),"
        " CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) FROM orders"
    )
    first = {}
    for ck, d, _ in orders:
        if ck not in first or d < first[ck]:
            first[ck] = d
    cohort = {ck: d // 91 for ck, d in first.items()}
    size = Counter(cohort.values())
    cells = defaultdict(lambda: [0, 0])
    for ck, d, cents in orders:
        key = (cohort[ck], d // 91 - cohort[ck])
        cells[key][0] += cents
        cells[key][1] += 1
    rows = q.REGISTRY["cohort_ltv_triangle"].fn(spark, SF_SMOKE).collect()
    assert {(r.cohort_q, r.age_q) for r in rows} == set(cells)
    for r in rows:
        cents, n = cells[(r.cohort_q, r.age_q)]
        assert r.age_q >= 0
        assert r.n_orders == n
        assert r.n_cust == size[r.cohort_q]
        assert abs(r.revenue - round(cents / 100, 6)) < 1e-6
        assert abs(r.rev_per_cohort_cust - round(cents / size[r.cohort_q] / 100, 6)) < 1e-6
