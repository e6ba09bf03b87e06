"""Brute-force pins for the third round-7-continuation batch: interval
overlap join, quantile-transform uniformity, weighted median."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE

STRIDE, WLEN = 21, 28


def _li(sf_dir: str, sql: str):
    con = duckdb.connect()
    rows = con.sql(
        sql.format(li=f"read_parquet('{sf_dir}/lineitem.parquet')",
                   orders=f"read_parquet('{sf_dir}/orders.parquet')")
    ).fetchall()
    con.close()
    return rows


def test_interval_overlap_matches_bruteforce(spark):
    ivs = _li(
        SF_SMOKE,
        """
        SELECT datediff('day', (SELECT MIN(CAST(l_shipdate AS DATE)) FROM {li}),
                        MIN(CAST(l_shipdate AS DATE))),
               datediff('day', (SELECT MIN(CAST(l_shipdate AS DATE)) FROM {li}),
                        MAX(CAST(l_shipdate AS DATE)))
        FROM {li} GROUP BY l_orderkey
        """,
    )
    dmax = max(b for _, b in ivs)
    agg = defaultdict(lambda: [0, 0, 0])  # widx -> [n, sum_odays, max_odays]
    for i in range(dmax // STRIDE + 1):
        ws, we = i * STRIDE, i * STRIDE + WLEN - 1
        for a, b in ivs:
            if ws <= b and a <= we:
                od = min(b, we) - max(a, ws) + 1
                e = agg[i]
                e[0] += 1
                e[1] += od
                e[2] = max(e[2], od)
    rows = q.REGISTRY["interval_overlap_join"].fn(spark, SF_SMOKE).collect()
    assert {r.widx for r in rows} == set(agg)
    for r in rows:
        n, s, m = agg[r.widx]
        assert r.n_orders == n
        assert abs(r.avg_overlap_days - round(s / n, 6)) < 1e-9
        assert r.max_overlap_days == m
        assert r.window_start_day == r.widx * STRIDE
        # overlap length is bounded by the window length
        assert 1 <= r.max_overlap_days <= WLEN


def test_quantile_transform_is_uniform_up_to_tie_mass(spark):
    rows = q.REGISTRY["quantile_transform_uniformity"].fn(spark, SF_SMOKE).collect()
    assert [r.bucket for r in rows] == list(range(10))
    total = sum(r.n_rows for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    counts = _li(SF_SMOKE, "SELECT COUNT(*) AS c FROM {orders} GROUP BY o_totalprice")
    max_tie_share = max(c for (c,) in counts) / total
    for r in rows:
        # each equal-CDF bucket holds 1/10 of the mass up to one tie group
        assert r.abs_dev <= max_tie_share + 1.0 / total + 1e-9


def test_weighted_median_matches_bruteforce(spark):
    rows = _li(
        SF_SMOKE,
        """
        SELECT l_returnflag, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
               CAST(l_quantity AS BIGINT)
        FROM {li}
        """,
    )
    groups = defaultdict(list)
    for fl, v, w in rows:
        groups[fl].append((v, w))

    def wquant(pairs, num, den):
        pairs.sort()
        tw = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if den * cum >= num * tw:
                return v, tw
        raise AssertionError("unreachable")

    out = {r.flag: r for r in q.REGISTRY["weighted_median_by_flag"].fn(spark, SF_SMOKE).collect()}
    assert set(out) == set(groups)
    for fl, pairs in groups.items():
        med, tw = wquant(list(pairs), 1, 2)
        p90, _ = wquant(list(pairs), 9, 10)
        r = out[fl]
        assert (r.wmedian_cents, r.wp90_cents, r.total_weight) == (med, p90, tw)
        assert r.wmedian_cents <= r.wp90_cents
