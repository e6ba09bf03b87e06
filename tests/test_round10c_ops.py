"""Round-10 third-batch pins: Qini curve, Poisson SPRT path,
Beta-Binomial MoM shrinkage, and the Chapman estimator re-derived in
pure Python at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _users(spark):
    users = defaultdict(lambda: [0, 0])
    for r in load_table(spark, SF_SMOKE, "events").select("user_id", "event_type").collect():
        users[r.user_id][0] += 1
        if r.event_type == "purchase":
            users[r.user_id][1] = 1
    return users


def test_qini_matches_python(spark):
    rows = q.REGISTRY["qini_uplift_curve"].fn(spark, SF_SMOKE).collect()
    users = _users(spark)
    ranked = sorted(
        ((uid, ne, conv) for uid, (ne, conv) in users.items()),
        key=lambda t: (-t[1], t[0]),
    )
    n = len(ranked)
    cells = defaultdict(lambda: [0, 0, 0, 0])  # d -> nt nc ct cc
    for i, (uid, ne, conv) in enumerate(ranked):
        d = i * 10 // n
        t = _md5_60(f"ipw|{uid}") % 2
        cells[d][0] += t
        cells[d][1] += 1 - t
        cells[d][2] += t * conv
        cells[d][3] += (1 - t) * conv
    tnt = sum(v[0] for v in cells.values()); tnc = sum(v[1] for v in cells.values())
    tct = sum(v[2] for v in cells.values()); tcc = sum(v[3] for v in cells.values())
    overall = tct - tcc * tnt / tnc
    gap_micro = 0
    curve = {}
    cnt = cnc = cct = ccc = 0
    for d in sorted(cells):
        cnt += cells[d][0]; cnc += cells[d][1]
        cct += cells[d][2]; ccc += cells[d][3]
        qini = cct - ccc * cnt / cnc if cnc else None
        rand = overall * cnt / tnt
        curve[d] = (cnt, cnc, qini, rand)
        gap_micro += math.floor((qini - rand) * 1e6)
    coef = gap_micro / 1e6 / len(cells)
    assert len(rows) == len(cells)
    for r in rows:
        cnt, cnc, qini, rand = curve[r.decile]
        assert (r.cum_treated, r.cum_control) == (cnt, cnc)
        assert abs(r.qini_uplift - qini) < 1e-5
        assert abs(r.random_uplift - rand) < 1e-5
        assert abs(r.qini_coefficient - coef) < 1e-5


def test_sprt_matches_python(spark):
    row = q.REGISTRY["sprt_poisson_audit"].fn(spark, SF_SMOKE).collect()[0]
    daily = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "orders").selectExpr(
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day"
    ).collect():
        daily[r.day] += 1
    n = len(daily)
    l0 = sum(daily.values()) / n
    ln105 = 0.04879016416943205
    ln19 = 2.9444389791664403
    cum = 0
    cross_day = 0
    cross_sign = 0
    for d in sorted(daily):
        cum += math.floor((daily[d] * ln105 - 0.05 * l0) * 1e9)
        if cross_sign == 0:
            if cum > ln19 * 1e9:
                cross_day, cross_sign = d, 1
            elif cum < -ln19 * 1e9:
                cross_day, cross_sign = d, -1
    assert row.n_days == n
    assert abs(row.lambda0 - l0) < 1e-5
    assert abs(row.final_llr - cum / 1e9) < 1e-5
    assert row.first_crossing_day == cross_day
    want = "accept_h1" if cross_sign > 0 else ("accept_h0" if cross_sign < 0 else "continue")
    assert row.decision == want


def test_betabin_matches_python(spark):
    rows = {r.source: r for r in q.REGISTRY["beta_binomial_shrinkage"].fn(spark, SF_SMOKE).collect()}
    g = defaultdict(lambda: [0, 0])
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "lang").collect():
        g[r.source][0] += 1
        if r.lang == "en":
            g[r.source][1] += 1
    k = len(g)
    rates = {s: x / n for s, (n, x) in g.items()}
    s1 = sum(math.floor(r * 1e9) for r in rates.values())
    s2 = sum(math.floor(r * r * 1e9) for r in rates.values())
    mu = s1 / 1e9 / k
    v = (s2 / 1e9 - (s1 / 1e9) ** 2 / k) / (k - 1)
    strength = max(0.0, mu * (1 - mu) / v - 1)
    for src, (n, x) in g.items():
        r = rows[src]
        assert r.n_docs == n and r.k_sources == k
        assert abs(r.raw_rate - x / n) < 1e-6
        assert abs(r.shrunk_rate - (mu * strength + x) / (strength + n)) < 1e-5
        assert abs(r.alpha - mu * strength) < 1e-4
        assert abs(r.beta - (1 - mu) * strength) < 1e-4
        # shrinkage pulls toward the prior mean
        lo, hi = min(x / n, mu), max(x / n, mu)
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6


def test_capture_recapture_matches_python(spark):
    row = q.REGISTRY["capture_recapture_dedup"].fn(spark, SF_SMOKE).collect()[0]
    a = {
        (r.doc_a, r.doc_b)
        for r in q.REGISTRY["dedup_minhash_lsh"].fn(spark, SF_SMOKE).collect()
    }
    b = {
        (r.doc_a, r.doc_b)
        for r in q.REGISTRY["dedup_jaccard_stopshingle"].fn(spark, SF_SMOKE).collect()
    }
    m = len(a & b)
    nhat = (len(a) + 1) * (len(b) + 1) / (m + 1) - 1
    assert (row.n_pairs_lsh, row.n_pairs_jaccard, row.n_pairs_both) == (
        len(a), len(b), m,
    )
    assert abs(row.chapman_estimate - round(nhat, 2)) < 1e-9
    assert abs(row.coverage_lsh - len(a) / nhat) < 1e-5
    assert abs(row.coverage_jaccard - len(b) / nhat) < 1e-5
    assert row.n_pairs_both <= min(row.n_pairs_lsh, row.n_pairs_jaccard)
    assert row.chapman_estimate >= max(len(a), len(b)) - 1
