"""Round-10 batch pins: each operator re-derived in pure Python at
sf0.001 — Brown-Forsythe F via statistics.median, Hill via sorted tail,
Theil decomposition identity, Granger F via numpy-free closed-form OLS,
Ljung-Box via direct autocorrelations, assortativity/Adamic-Adar via
dict-based graph walks, logrank via per-time at-risk tables, Dirichlet
QL via a term loop, MRR directly, curriculum bands and stratified ATE by
re-implementing the hash/band arithmetic."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).collect()


def _order_cents(spark):
    return [
        r.x
        for r in load_table(spark, SF_SMOKE, "orders")
        .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x")
        .collect()
    ]


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_levene_brown_forsythe_matches_python(spark):
    rows = {r.source: r for r in q.REGISTRY["levene_brown_forsythe"].fn(spark, SF_SMOKE).collect()}
    groups = defaultdict(list)
    for r in _docs(spark):
        groups[r.source].append(r.n_chars)
    # exact grid medians: med2 = x_(floor((n+1)/2)) + x_(floor((n+2)/2))
    med2 = {}
    for s, vs in groups.items():
        vs.sort()
        n = len(vs)
        med2[s] = vs[(n + 1) // 2 - 1] + vs[(n + 2) // 2 - 1]
    z = {s: [abs(2 * v - med2[s]) for v in vs] for s, vs in groups.items()}
    k = len(groups)
    n = sum(len(vs) for vs in groups.values())
    s_all = sum(sum(zz) for zz in z.values())
    ssb = ssw = 0
    for s, zz in z.items():
        ng, sz = len(zz), sum(zz)
        szz = sum(x * x for x in zz)
        ssb += math.floor(ng * (sz / ng - s_all / n) ** 2 * 1e6)
        ssw += math.floor((szz - sz * sz / ng) * 1e6)
    w = (n - k) / (k - 1) * ssb / ssw
    for s, vs in groups.items():
        r = rows[s]
        assert r.n_docs == len(vs)
        assert abs(r.median_chars - med2[s] / 2) < 1e-9
        assert abs(r.mean_absdev_chars - sum(z[s]) / len(vs) / 2) < 1e-5
        assert r.k_groups == k and r.n_total == n
        assert abs(r.bf_statistic - w) < 1e-5
    assert rows and all(r.bf_statistic >= 0 for r in rows.values())


def test_hill_tail_index_matches_python(spark):
    row = q.REGISTRY["hill_tail_index"].fn(spark, SF_SMOKE).collect()[0]
    xs = sorted(_order_cents(spark), reverse=True)
    k = 100
    xk1 = xs[k]
    s = sum(math.floor(math.log(x / xk1) * 1e9) for x in xs[:k])
    assert row.k_order_stats == k
    assert abs(row.threshold_dollars - round(xk1 / 100, 2)) < 1e-9
    assert abs(row.hill_h - s / 1e9 / k) < 1e-5
    assert abs(row.tail_alpha - k * 1e9 / s) < 1e-4
    assert row.tail_alpha > 0


def test_theil_decomposition_matches_python(spark):
    rows = {r.segment: r for r in q.REGISTRY["theil_inequality_decomposition"].fn(spark, SF_SMOKE).collect()}
    seg_of = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    orders = load_table(spark, SF_SMOKE, "orders").selectExpr(
        "o_custkey", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x"
    ).collect()
    by_seg = defaultdict(list)
    for r in orders:
        by_seg[seg_of[r.o_custkey]].append(r.x)
    n = sum(len(v) for v in by_seg.values())
    s = sum(sum(v) for v in by_seg.values())
    st_all = tb_all = 0
    for seg, xs in by_seg.items():
        ng, sg = len(xs), sum(xs)
        st = sum(math.floor((x * n / s) * math.log(x * n / s) * 1e9) for x in xs)
        sw = sum(math.floor((x * ng / sg) * math.log(x * ng / sg) * 1e9) for x in xs)
        tb = math.floor((sg / s) * math.log((sg / s) / (ng / n)) * 1e9)
        st_all += st
        tb_all += tb
        r = rows[seg]
        assert r.n_orders == ng
        assert abs(r.revenue_share - round(sg / s, 6)) < 1e-9
        assert abs(r.theil_within_group - sw / 1e9 / ng) < 1e-5
    some = next(iter(rows.values()))
    assert abs(some.theil_total - st_all / 1e9 / n) < 1e-5
    assert abs(some.theil_between - tb_all / 1e9) < 1e-5
    # decomposition identity: T ~ sum_g s_g T_g + T_between (quantization
    # noise only)
    within_mix = sum(
        rows[seg].revenue_share * rows[seg].theil_within_group for seg in rows
    )
    assert abs(some.theil_total - (within_mix + some.theil_between)) < 1e-3


def test_granger_matches_python(spark):
    row = q.REGISTRY["granger_lag_causality"].fn(spark, SF_SMOKE).collect()[0]
    daily = defaultdict(lambda: [0, 0])
    for r in load_table(spark, SF_SMOKE, "orders").selectExpr(
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x",
    ).collect():
        daily[r.day][0] += r.x
        daily[r.day][1] += 1
    pairs = [
        (daily[d][0], daily[d - 1][0], daily[d - 1][1])
        for d in daily
        if (d - 1) in daily
    ]
    n = len(pairs)
    sy = sum(p[0] for p in pairs); s1 = sum(p[1] for p in pairs); s2 = sum(p[2] for p in pairs)
    # n-scaled centered moments as exact ints (mirrors the SQL's
    # DECIMAL(38,0) arithmetic); the n factor cancels in F and beta
    cyy = float(n * sum(p[0] ** 2 for p in pairs) - sy * sy)
    c11 = float(n * sum(p[1] ** 2 for p in pairs) - s1 * s1)
    c22 = float(n * sum(p[2] ** 2 for p in pairs) - s2 * s2)
    c12 = float(n * sum(p[1] * p[2] for p in pairs) - s1 * s2)
    cy1 = float(n * sum(p[0] * p[1] for p in pairs) - sy * s1)
    cy2 = float(n * sum(p[0] * p[2] for p in pairs) - sy * s2)
    rss_r = cyy - cy1 * cy1 / c11
    det = c11 * c22 - c12 * c12
    rss_u = cyy - ((cy1 * c22 - cy2 * c12) * cy1 + (cy2 * c11 - cy1 * c12) * cy2) / det
    f = (rss_r - rss_u) * (n - 3) / rss_u
    assert row.n_days == n
    assert abs(row.f_statistic - f) < max(1e-4, abs(f) * 1e-5)
    assert row.granger_significant_5pct == (1 if f > 3.84 else 0)


def test_ljung_box_matches_python(spark):
    row = q.REGISTRY["ljung_box_whiteness"].fn(spark, SF_SMOKE).collect()[0]
    daily = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "orders").selectExpr(
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x",
    ).collect():
        daily[r.day] += r.x
    n = len(daily)
    s = sum(daily.values())
    dv = {d: daily[d] * n - s for d in daily}
    d2 = sum(v * v for v in dv.values())
    total_pico = 0
    for lag in range(1, 8):
        nsum = sum(dv[d] * dv[d + lag] for d in dv if (d + lag) in dv)
        rho = nsum / d2
        total_pico += math.floor(rho * rho / (n - lag) * 1e12)
    qstat = n * (n + 2) * total_pico / 1e12
    assert row.n_days == n and row.n_lags == 7
    assert abs(row.ljung_box_q - qstat) < max(1e-4, qstat * 1e-5)
    assert row.reject_whiteness_5pct == (1 if qstat > 14.067 else 0)


def _lsh_pairs(spark):
    return [
        (r.doc_a, r.doc_b)
        for r in q.REGISTRY["dedup_minhash_lsh"].fn(spark, SF_SMOKE).collect()
    ]


def test_degree_assortativity_matches_python(spark):
    row = q.REGISTRY["degree_assortativity"].fn(spark, SF_SMOKE).collect()[0]
    pairs = _lsh_pairs(spark)
    ends = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = Counter(u for u, _ in ends)
    dd = [(deg[u], deg[v]) for u, v in ends]
    m = len(dd)
    s1 = sum(a for a, _ in dd); s2 = sum(b for _, b in dd)
    s11 = sum(a * a for a, _ in dd); s22 = sum(b * b for _, b in dd)
    s12 = sum(a * b for a, b in dd)
    denom = math.sqrt((m * s11 - s1 * s1) * (m * s22 - s2 * s2))
    r = (m * s12 - s1 * s2) / denom if denom else None
    assert row.n_edges == len(pairs)
    assert row.n_nodes == len(deg)
    if r is not None:
        assert abs(row.assortativity_r - round(r, 6)) < 1e-5
        assert -1.0 <= row.assortativity_r <= 1.0


def test_adamic_adar_matches_python(spark):
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import DUCKDB
    from sales_telegram_bot_data_pipeline_spark.operators.round10 import (
        _loose_pairs_sql,
    )
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    pairs = set(
        map(tuple, con.sql(_loose_pairs_sql(DUCKDB, "documents")).fetchall())
    )
    nbr = defaultdict(set)
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    scores = defaultdict(lambda: [0, 0])  # (u,v) -> [count, nano]
    for w, ns in nbr.items():
        wt = math.floor(1e9 / math.log(len(ns))) if len(ns) >= 2 else None
        for u in ns:
            for v in ns:
                if u < v and (u, v) not in pairs:
                    scores[(u, v)][0] += 1
                    scores[(u, v)][1] += wt
    # the Spark/duck sql double-counts nothing: one wedge per center
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    rows = q.REGISTRY["adamic_adar_link_prediction"].fn(spark, SF_SMOKE).collect()
    got = [(r.doc_a, r.doc_b, r.n_common_neighbors) for r in rows]
    want = [(u, v, c) for (u, v), (c, _) in top]
    assert got == want
    for r, ((_, _), (_, nano)) in zip(rows, top):
        assert abs(r.aa_score - nano / 1e9) < 1e-6


def test_logrank_matches_python(spark):
    row = q.REGISTRY["logrank_test_segments"].fn(spark, SF_SMOKE).collect()[0]
    seg_of = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    per = defaultdict(set)
    for r in load_table(spark, SF_SMOKE, "orders").selectExpr(
        "o_custkey AS ck", "CAST(o_orderdate AS DATE) AS d"
    ).collect():
        per[r.ck].add(r.d)
    hmax = max(d for days in per.values() for d in days)
    units = []  # (g, t, ev)
    for ck, days in per.items():
        g = 1 if seg_of[ck] == "BUILDING" else 0
        d1 = min(days)
        later = sorted(x for x in days if x > d1)
        if later:
            units.append((g, (later[0] - d1).days, 1))
        else:
            units.append((g, (hmax - d1).days, 0))
    n1 = sum(1 for g, _, _ in units if g == 1)
    n0 = len(units) - n1
    times = sorted({t for _, t, _ in units})
    o1 = e1m = vm = 0
    for t in times:
        d1c = sum(1 for g, tt, ev in units if g == 1 and tt == t and ev)
        d0c = sum(1 for g, tt, ev in units if g == 0 and tt == t and ev)
        r1 = sum(1 for g, tt, _ in units if g == 1 and tt >= t)
        r0 = sum(1 for g, tt, _ in units if g == 0 and tt >= t)
        dt, nt = d1c + d0c, r1 + r0
        if dt == 0 or nt <= 1:
            continue
        o1 += d1c
        e1m += math.floor(dt * r1 / nt * 1e6)
        vm += math.floor(dt * r1 / nt * (r0 / nt) * ((nt - dt) / (nt - 1)) * 1e6)
    chi2 = (o1 - e1m / 1e6) ** 2 / (vm / 1e6)
    assert (row.n_group1, row.n_group0) == (n1, n0)
    assert row.observed_events_g1 == o1
    assert abs(row.expected_events_g1 - e1m / 1e6) < 1e-5
    assert abs(row.logrank_chi2 - chi2) < max(1e-4, chi2 * 1e-5)
    assert row.reject_equal_hazards_5pct == (1 if chi2 > 3.841 else 0)


def test_query_likelihood_matches_python(spark):
    from sales_telegram_bot_data_pipeline_spark.operators.retrieval import QUERY_TERMS

    rows = q.REGISTRY["query_likelihood_dirichlet"].fn(spark, SF_SMOKE).collect()
    docs = _docs(spark)
    toks = {r.doc_id: r.text.lower().split() for r in docs}
    cl = sum(len(t) for t in toks.values())
    cf = Counter()
    for t in toks.values():
        for w in t:
            if w in QUERY_TERMS:
                cf[w] += 1
    mu = 2000
    scores = {}
    for did, t in toks.items():
        tf = Counter(w for w in t if w in QUERY_TERMS)
        if not tf:
            continue
        s = sum(
            math.floor(
                math.log((tf.get(qt, 0) + mu * cf[qt] / cl) / (len(t) + mu)) * 1e9
            )
            for qt in QUERY_TERMS
        )
        scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r.doc_id, r.ql_score) for r in rows]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws / 1e9) < 1e-6


def test_mrr_matches_python(spark):
    row = q.REGISTRY["mrr_retrieval_eval"].fn(spark, SF_SMOKE).collect()[0]
    bm = q.REGISTRY["bm25_topk_search"].fn(spark, SF_SMOKE).collect()
    rel = {
        r.doc_id: (2 if r.lang == "en" and len(r.text) >= 600 else (1 if r.lang == "en" else 0))
        for r in _docs(spark)
    }
    ranked = sorted(bm, key=lambda r: (-r.bm25, r.doc_id))
    first = next((i + 1 for i, r in enumerate(ranked) if rel[r.doc_id] >= 1), None)
    assert row.first_relevant_rank == (first or 0)
    assert abs(row.mrr - (1 / first if first else 0.0)) < 1e-9
    assert row.success_at_5 == (1 if first and first <= 5 else 0)
    assert row.success_at_10 == (1 if first and first <= 10 else 0)


def test_curriculum_matches_python(spark):
    rows = q.REGISTRY["curriculum_schedule_plan"].fn(spark, SF_SMOKE).collect()
    docs = _docs(spark)
    lo = min(r.n_chars for r in docs)
    hi = max(r.n_chars for r in docs)
    assert len(rows) == len(docs)
    for r, d in zip(rows, sorted(docs, key=lambda x: x.doc_id)):
        band = min(3, (d.n_chars - lo) * 4 // (hi - lo + 1))
        assert r.doc_id == d.doc_id
        assert r.difficulty_band == band
        assert r.epoch_first_seen == band
        assert r.shuffle_key == _md5_60(f"curr|{d.doc_id}")
    assert len({r.difficulty_band for r in rows}) > 1


def test_ipw_ate_matches_python(spark):
    rows = q.REGISTRY["ipw_ate_stratified"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type").collect()
    users = defaultdict(lambda: [0, 0])
    for r in ev:
        users[r.user_id][0] += 1
        if r.event_type == "purchase":
            users[r.user_id][1] = 1
    n_users = len(users)
    n_events = sum(v[0] for v in users.values())
    cells = defaultdict(lambda: [0, 0])  # (stratum, treated) -> [n, conv]
    for uid, (ne, conv) in users.items():
        treated = _md5_60(f"ipw|{uid}") % 2
        s = min(3, 2 * ne * n_users // n_events)
        cells[(s, treated)][0] += 1
        cells[(s, treated)][1] += conv
    strata = sorted({s for s, _ in cells})
    n_used = ate_nano = 0
    for s in strata:
        n1, c1 = cells.get((s, 1), [0, 0])
        n0, c0 = cells.get((s, 0), [0, 0])
        if n1 > 0 and n0 > 0:
            n_used += n1 + n0
            ate_nano += math.floor((n1 + n0) * (c1 / n1 - c0 / n0) * 1e9)
    ate = ate_nano / 1e9 / n_used
    assert len(rows) == len(strata)
    for r in rows:
        n1, c1 = cells.get((r.stratum, 1), [0, 0])
        n0, c0 = cells.get((r.stratum, 0), [0, 0])
        assert (r.n_treated, r.n_control) == (n1, n0)
        assert abs(r.ate_stratified - ate) < 1e-5
