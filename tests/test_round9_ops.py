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


def test_ks_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect()
    by_src: dict[str, list[int]] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.n_chars)
    rows = {
        (r.source_a, r.source_b): r
        for r in q.REGISTRY["ks_two_sample_sources"].fn(spark, SF_SMOKE).collect()
    }
    srcs = sorted(by_src)
    assert set(rows) == {(a, b) for a in srcs for b in srcs if a < b}
    import math

    for (a, b), r in rows.items():
        xs, ys = sorted(by_src[a]), sorted(by_src[b])
        na, nb = len(xs), len(ys)
        grid = sorted(set(xs) | set(ys))
        dnum = max(
            abs(
                sum(1 for v in xs if v <= g) * nb
                - sum(1 for v in ys if v <= g) * na
            )
            for g in grid
        )
        assert r.n_a == na and r.n_b == nb
        assert abs(r.ks_d - round(dnum / (na * nb), 6)) <= 1e-6
        lam = dnum / (na * nb) * math.sqrt(na * nb / (na + nb))
        assert abs(r.ks_lambda - round(lam, 6)) <= 2e-6
        assert 0.0 <= r.ks_d <= 1.0


def test_overdispersion_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").selectExpr(
        "event_type", "datediff(to_date(ts), to_date('1970-01-01')) AS day_x"
    ).collect()
    daily: dict[tuple[str, int], int] = {}
    for r in ev:
        daily[(r.event_type, r.day_x)] = daily.get((r.event_type, r.day_x), 0) + 1
    by_type: dict[str, list[int]] = {}
    for (t, _), c in daily.items():
        by_type.setdefault(t, []).append(c)
    rows = {r.event_type: r for r in q.REGISTRY["overdispersion_audit"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == set(by_type)
    for t, cs in by_type.items():
        n, s, ss = len(cs), sum(cs), sum(c * c for c in cs)
        mean = s / n
        var = (n * ss - s * s) / (n * (n - 1))
        r = rows[t]
        assert r.n_days == n and r.n_events == s
        assert abs(r.mean_daily - round(mean, 6)) <= 1e-6
        assert abs(r.dispersion_index - round(var / mean, 6)) <= 1e-6
        assert r.overdispersed == (var > 1.5 * mean)


def test_smd_matches_python_and_hash_split_is_balanced(spark):
    panel = _orders_panel(spark)
    cust = load_table(spark, SF_SMOKE, "customer").selectExpr(
        "c_custkey", "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acct"
    ).collect()
    per: dict[int, list[int]] = {
        r.c_custkey: [r.acct, 0, 0] for r in cust
    }  # acct, n_orders, spend
    for ck, _, _, cents, _, _ in panel:
        per[ck][1] += 1
        per[ck][2] += cents

    def treat(ck: int) -> int:
        return int(hashlib.md5(str(ck).encode()).hexdigest()[:15], 16) % 2

    rows = {r.covariate: r for r in q.REGISTRY["covariate_balance_smd"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {"acctbal_cents", "n_orders", "spend_cents"}
    for idx, cov in [(0, "acctbal_cents"), (1, "n_orders"), (2, "spend_cents")]:
        t = [v[idx] for ck, v in per.items() if treat(ck) == 1]
        c = [v[idx] for ck, v in per.items() if treat(ck) == 0]
        mt, mc = sum(t) / len(t), sum(c) / len(c)
        vt = (len(t) * sum(x * x for x in t) - sum(t) ** 2) / (len(t) * (len(t) - 1))
        vc = (len(c) * sum(x * x for x in c) - sum(c) ** 2) / (len(c) * (len(c) - 1))
        smd = (mt - mc) / ((vt + vc) / 2) ** 0.5
        r = rows[cov]
        assert r.n_treat == len(t) and r.n_control == len(c)
        assert abs(r.smd - round(smd, 6)) <= 2e-6
        assert r.balanced == (abs(smd) < 0.1)
    # an md5 hash split over iid units is balanced in expectation, but at
    # SF_SMOKE (~75 units per arm) the SMD sampling noise is ~sqrt(4/n)
    # ~= 0.16, so the 0.1 bar can legitimately trip — assert only that no
    # covariate shows a LARGE imbalance (a broken assignment would)
    assert all(abs(r.smd) < 0.5 for r in rows.values())


def test_mde_matches_python_and_cuped_helps(spark):
    import math

    panel = _orders_panel(spark)
    lo = min(p[2] for p in panel)
    hi = max(p[2] for p in panel)
    per: dict[int, list[int]] = {}
    for ck, tr, dx, cents, _, _ in panel:
        e = per.setdefault(ck, [tr, 0, 0])
        if dx * 2 < lo + hi:
            e[1] += cents
        else:
            e[2] += cents
    n = len(per)
    n_t = sum(1 for v in per.values() if v[0] == 1)
    n_c = n - n_t
    sx = sum(v[1] for v in per.values())
    sy = sum(v[2] for v in per.values())
    sxx = sum(v[1] * v[1] for v in per.values())
    sxy = sum(v[1] * v[2] for v in per.values())
    syy = sum(v[2] * v[2] for v in per.values())
    var_y = (n * syy - sy * sy) / (n * (n - 1))
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    zz = 1.959964 + 0.841621
    mde = zz * math.sqrt(var_y * (1 / n_t + 1 / n_c))
    mde_cuped = zz * math.sqrt(var_y * (1 - rho2) * (1 / n_t + 1 / n_c))
    out = q.REGISTRY["ab_power_mde"].fn(spark, SF_SMOKE).collect()[0]
    assert out.n_units == n and out.n_treat == n_t and out.n_control == n_c
    assert abs(out.mde_dollars - round(mde / 100, 6)) <= 2e-6
    assert abs(out.mde_cuped_dollars - round(mde_cuped / 100, 6)) <= 2e-6
    # CUPED can only shrink the MDE (rho^2 >= 0)
    assert out.mde_cuped_dollars <= out.mde_dollars
