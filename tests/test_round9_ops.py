"""Round-9 operator pins: each new operator's math re-derived in pure
Python from the same base data, plus the structural claims the SQL can't
self-certify (PAVA equivalence, Z-order span trade-off, IPF margin
closure, BT normalization)."""

from __future__ import annotations

import hashlib

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _orders_panel(spark):
    """(cust, treat, day_x, cents) rows — Python twin of
    round9._orders_base (md5 assignment replicated with hashlib)."""
    rows = load_table(spark, SF_SMOKE, "orders").selectExpr(
        "o_custkey",
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day_x",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        "o_orderpriority",
        "o_orderstatus",
    ).collect()

    def treat(ck: int) -> int:
        return int(hashlib.md5(str(ck).encode()).hexdigest()[:15], 16) % 2

    return [
        (r.o_custkey, treat(r.o_custkey), r.day_x, r.cents,
         r.o_orderpriority, r.o_orderstatus)
        for r in rows
    ]


def test_cuped_matches_python_and_bounds(spark):
    panel = _orders_panel(spark)
    lo = min(p[2] for p in panel)
    hi = max(p[2] for p in panel)
    per = {}
    for ck, tr, dx, cents, _, _ in panel:
        e = per.setdefault(ck, [tr, 0, 0])
        if dx * 2 < lo + hi:
            e[1] += cents
        else:
            e[2] += cents
    n = len(per)
    sx = sum(v[1] for v in per.values())
    sy = sum(v[2] for v in per.values())
    sxx = sum(v[1] * v[1] for v in per.values())
    sxy = sum(v[1] * v[2] for v in per.values())
    syy = sum(v[2] * v[2] for v in per.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    t = [v for v in per.values() if v[0] == 1]
    c = [v for v in per.values() if v[0] == 0]
    diff_raw = sum(v[2] for v in t) / len(t) - sum(v[2] for v in c) / len(c)
    diff_x = sum(v[1] for v in t) / len(t) - sum(v[1] for v in c) / len(c)

    out = q.REGISTRY["cuped_variance_reduction"].fn(spark, SF_SMOKE).collect()[0]
    assert out.n_units == n
    assert out.n_treat == len(t) and out.n_control == len(c)
    assert abs(out.theta - round(theta, 6)) <= 1e-6
    assert abs(out.diff_raw_dollars - round(diff_raw / 100, 6)) <= 1e-6
    assert abs(
        out.diff_cuped_dollars - round((diff_raw - theta * diff_x) / 100, 6)
    ) <= 1e-6
    assert abs(out.variance_reduction - round(rho2, 6)) <= 1e-6
    assert 0.0 <= out.variance_reduction <= 1.0  # rho^2 by construction


def test_did_matches_python(spark):
    panel = _orders_panel(spark)
    lo = min(p[2] for p in panel)
    hi = max(p[2] for p in panel)
    cells: dict[tuple[int, int], list[int]] = {}
    for _, tr, dx, cents, _, _ in panel:
        post = 1 if dx * 2 >= lo + hi else 0
        e = cells.setdefault((tr, post), [0, 0])
        e[0] += 1
        e[1] += cents
    m = {k: v[1] / v[0] for k, v in cells.items()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    out = q.REGISTRY["did_estimator"].fn(spark, SF_SMOKE).collect()[0]
    assert out.n_t_pre == cells[(1, 0)][0] and out.n_c_post == cells[(0, 1)][0]
    assert abs(out.mean_treat_pre_dollars - round(m[(1, 0)] / 100, 6)) <= 1e-6
    assert abs(out.did_dollars - round(did / 100, 6)) <= 1e-6


def test_isotonic_matches_pava(spark):
    panel = _orders_panel(spark)
    lo = min(p[2] for p in panel)
    hi = max(p[2] for p in panel)
    K = 10
    bins: dict[int, list[int]] = {}
    for _, _, dx, _, _, status in panel:
        b = min(K - 1, (K * (dx - lo)) // (hi - lo + 1))
        e = bins.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += 1 if status == "F" else 0
    ks = sorted(bins)
    weights = [bins[k][0] for k in ks]
    rates = [bins[k][1] / bins[k][0] for k in ks]

    # weighted PAVA, one fitted value per BIN
    blocks = [[rates[i] * weights[i], weights[i], 1] for i in range(len(ks))]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1] + 1e-15:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            blocks[i][2] += blocks[i + 1][2]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fitted: list[float] = []
    for s, w, nbins in blocks:
        fitted.extend([s / w] * nbins)

    rows = {
        r.recency_bin: r
        for r in q.REGISTRY["isotonic_calibration_bins"].fn(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == ks
    for idx, k in enumerate(ks):
        assert rows[k].n_orders == bins[k][0]
        assert abs(rows[k].raw_rate - round(rates[idx], 6)) <= 1e-6
        assert abs(rows[k].isotonic_rate - fitted[idx]) <= 2e-6, (
            f"bin {k}: minimax {rows[k].isotonic_rate} != PAVA {fitted[idx]}"
        )
    # monotone by construction
    iso = [rows[k].isotonic_rate for k in ks]
    assert iso == sorted(iso)
    # the raw rates must actually violate monotonicity somewhere, or the
    # fixture stops exercising the pooling path
    raw = [rows[k].raw_rate for k in ks]
    assert raw != sorted(raw), "fixture produced already-monotone raw rates"


def test_ipf_margins_and_positivity(spark):
    rows = q.REGISTRY["ipf_raking_weights"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 25  # 5 priorities x 5 segments, all populated
    assert all(r.weight > 0 for r in rows)
    total = sum(r.n_orders for r in rows)
    # column margins are exact by construction of the second pass (up to
    # nano-unit quantization)
    by_seg: dict[str, float] = {}
    for r in rows:
        by_seg[r.segment] = by_seg.get(r.segment, 0.0) + r.n_orders * r.weight
    for s, got in by_seg.items():
        assert abs(got / (total / 5) - 1) < 1e-6, f"segment {s} margin {got}"
    # the one-round row residual is reported, small, and consistent
    for r in rows:
        assert abs(r.row_margin_relerr) < 0.2
    by_pri: dict[str, float] = {}
    relerr: dict[str, float] = {}
    for r in rows:
        by_pri[r.priority] = by_pri.get(r.priority, 0.0) + r.n_orders * r.weight
        relerr[r.priority] = r.row_margin_relerr
    for p, got in by_pri.items():
        assert abs((got / (total / 5) - 1) - relerr[p]) <= 2e-6


def test_zorder_span_tradeoff(spark):
    rows = {r.layout: r for r in q.REGISTRY["zorder_layout_audit"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {"custkey_1d", "zorder"}
    c, z = rows["custkey_1d"], rows["zorder"]
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    expect_files = -(-n_orders // 1024)
    assert c.n_files == expect_files and z.n_files == expect_files
    # the clustering claim: a 1-D sort nails its own dimension but spans
    # the whole other dimension; Z-order balances both, so its WORST
    # dimension beats the 1-D layout's worst dimension
    assert c.avg_x_span_frac < z.avg_x_span_frac
    assert z.avg_y_span_frac < c.avg_y_span_frac
    assert max(z.avg_x_span_frac, z.avg_y_span_frac) < max(
        c.avg_x_span_frac, c.avg_y_span_frac
    )
    for r in rows.values():
        assert 0 < r.avg_file_area_frac <= 1


def test_bradley_terry_matches_python(spark):
    panel = _orders_panel(spark)
    spend: dict[tuple[int, str], int] = {}
    for ck, _, _, cents, pri, _ in panel:
        spend[(ck, pri)] = spend.get((ck, pri), 0) + cents
    by_cust: dict[int, dict[str, int]] = {}
    for (ck, pri), sp in spend.items():
        by_cust.setdefault(ck, {})[pri] = sp
    wins: dict[tuple[str, str], int] = {}
    games: dict[tuple[str, str], int] = {}
    for prs in by_cust.values():
        ps = sorted(prs)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                a, b = ps[i], ps[j]
                if prs[a] == prs[b]:
                    continue
                w = a if prs[a] > prs[b] else b
                wins[(w, b if w == a else a)] = wins.get((w, b if w == a else a), 0) + 1
                games[(a, b)] = games.get((a, b), 0) + 1
    players = sorted({p for pair in games for p in pair})
    W = {p: sum(v for (a, _), v in wins.items() if a == p) for p in players}
    G = {p: sum(v for pair, v in games.items() if p in pair) for p in players}
    p1n = {p: (2_000_000_000 * W[p]) // G[p] for p in players}
    import math

    sq = {p: 0 for p in players}
    for (a, b), g in games.items():
        sq[a] += int(math.floor(g * 1e18 / float(p1n[a] + p1n[b])))
        sq[b] += int(math.floor(g * 1e18 / float(p1n[a] + p1n[b])))
    p2n = {
        p: int(math.floor(1e9 * (float(W[p]) * 1e18 / float(sq[p]))))
        for p in players
    }
    zz = sum(p2n.values())
    rows = {r.priority: r for r in q.REGISTRY["bradley_terry_priorities"].fn(spark, SF_SMOKE).collect()}
    assert sorted(rows) == players
    s_total = 0.0
    for p in players:
        assert rows[p].n_wins == W[p]
        assert rows[p].n_games == G[p]
        assert abs(rows[p].bt_strength - round(p2n[p] / zz, 6)) <= 1e-6
        s_total += rows[p].bt_strength
    assert abs(s_total - 1.0) <= 1e-5
