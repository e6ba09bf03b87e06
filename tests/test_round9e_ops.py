"""Round-9 continuation batch-4 pins: nDCG@10, source modularity, price
elasticity, Dickey-Fuller, and Spiegelhalter Z re-derived in pure Python."""

from __future__ import annotations

import math

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_ndcg_matches_python(spark):
    row = q.REGISTRY["ndcg_retrieval_eval"].fn(spark, SF_SMOKE).collect()[0]
    # ranking from the engine's own BM25 op (pinned elsewhere)
    ranked = [r.doc_id for r in q.REGISTRY["bm25_topk_search"].fn(spark, SF_SMOKE).collect()]
    docs = load_table(spark, SF_SMOKE, "documents").selectExpr(
        "doc_id", "lang", "length(text) AS len"
    ).collect()
    rel = {
        r.doc_id: (2 if (r.lang == "en" and r.len >= 600) else (1 if r.lang == "en" else 0))
        for r in docs
    }
    w_nano = [round(1e9 / math.log2(i + 1)) for i in range(1, 11)]
    dcg_nano = sum(rel[d] * w_nano[i] for i, d in enumerate(ranked[:10]))
    n2 = sum(1 for v in rel.values() if v == 2)
    n_rel = sum(1 for v in rel.values() if v >= 1)
    ideal = [2 if p <= n2 else (1 if p <= n_rel else 0) for p in range(1, 11)]
    idcg_nano = sum(g * w_nano[i] for i, g in enumerate(ideal))
    hits = sum(1 for d in ranked[:10] if rel[d] >= 1)
    assert abs(row.dcg_at_10 - dcg_nano / 1e9) < 1e-6
    assert abs(row.idcg_at_10 - idcg_nano / 1e9) < 1e-6
    assert abs(row.ndcg_at_10 - dcg_nano / idcg_nano) < 1e-6
    assert abs(row.precision_at_10 - hits / 10) < 1e-6
    assert abs(row.recall_at_10 - hits / n_rel) < 1e-6
    assert row.n_relevant_corpus == n_rel
    assert 0.0 <= row.ndcg_at_10 <= 1.0


def test_modularity_matches_python(spark):
    rows = q.REGISTRY["graph_modularity_by_source"].fn(spark, SF_SMOKE).collect()
    pairs = [
        (r.doc_a, r.doc_b)
        for r in q.REGISTRY["dedup_minhash_lsh"].fn(spark, SF_SMOKE).collect()
    ]
    src = {
        r.doc_id: r.source
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "source").collect()
    }
    m = len(pairs)
    e, d = {}, {}
    for a, b in pairs:
        sa, sb = src[a], src[b]
        if sa == sb:
            e[sa] = e.get(sa, 0) + 1
        d[sa] = d.get(sa, 0) + 1
        d[sb] = d.get(sb, 0) + 1
    q_mod = sum(
        e.get(s, 0) / m - (d.get(s, 0) / (2 * m)) ** 2 for s in set(src.values())
    )
    by_src = {r.source: r for r in rows}
    assert set(by_src) == set(src.values())
    for s, r in by_src.items():
        assert r.n_edges_within == e.get(s, 0)
        assert r.degree_sum == d.get(s, 0)
        contrib = e.get(s, 0) / m - (d.get(s, 0) / (2 * m)) ** 2
        assert abs(r.contribution - contrib) < 1e-6
        assert abs(r.q_modularity - q_mod) < 1e-5
    # modularity of any partition is bounded
    assert -0.5 <= rows[0].q_modularity <= 1.0


def test_elasticity_matches_python(spark):
    row = q.REGISTRY["price_elasticity_ols"].fn(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem").selectExpr(
        "CAST(ROUND(l_discount * 100, 0) AS INT) AS pct",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qty",
    ).collect()
    lvl = {}
    for r in li:
        n, rev, qty = lvl.get(r.pct, (0, 0, 0))
        lvl[r.pct] = (n + 1, rev + r.cents * (100 - r.pct), qty + r.qty)
    xs, ys = [], []
    for n, rev, qty in lvl.values():
        xs.append(math.log(rev / qty))
        ys.append(math.log(qty / n))
    k = len(xs)
    mx, my = sum(xs) / k, sum(ys) / k
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    slope = sxy / sxx
    assert row.n_levels == k
    assert abs(row.elasticity - slope) < 1e-4
    assert abs(row.fit_r2 - sxy * sxy / (sxx * syy)) < 1e-4


def test_adf_matches_python(spark):
    row = q.REGISTRY["adf_stationarity_audit"].fn(spark, SF_SMOKE).collect()[0]
    orders = load_table(spark, SF_SMOKE, "orders").selectExpr(
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day_x",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
    ).collect()
    daily = {}
    for r in orders:
        daily[r.day_x] = daily.get(r.day_x, 0) + r.cents
    pairs = [
        (daily[d - 1], daily[d] - daily[d - 1]) for d in daily if d - 1 in daily
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    ssxx = sum(x * x for x, _ in pairs) - sx * sx / n
    ssxy = sum(x * y for x, y in pairs) - sx * sy / n
    ssyy = sum(y * y for _, y in pairs) - sy * sy / n
    beta = ssxy / ssxx
    s2 = (ssyy - beta * ssxy) / (n - 2)
    t = beta / math.sqrt(s2 / ssxx)
    assert row.n_pairs == n
    assert abs(row.beta - beta) < 1e-5
    assert abs(row.adf_t_stat - t) < 1e-4
    assert row.crit_5pct == -2.86
    assert row.is_stationary == (1 if t < -2.86 else 0)
    # revenue differences of an i.i.d.-ish daily series are strongly
    # mean-reverting: beta must be negative
    assert beta < 0


def test_spiegelhalter_matches_python(spark):
    row = q.REGISTRY["spiegelhalter_calibration_z"].fn(spark, SF_SMOKE).collect()[0]
    scored = q.REGISTRY["quality_logreg_score"].fn(spark, SF_SMOKE).collect()
    num_nano = den_nano = 0
    for r in scored:
        p = r.quality_prob
        y = 1.0 if r.lang == "en" else 0.0
        num_nano += round((y - p) * (1 - 2 * p) * 1e9)
        den_nano += round((1 - 2 * p) ** 2 * p * (1 - p) * 1e9)
    z = (num_nano / 1e9) / math.sqrt(den_nano / 1e9)
    assert row.n_docs == len(scored)
    assert abs(row.sum_miscalibration - num_nano / 1e9) < 1e-6
    assert abs(row.z_spiegelhalter - z) < 1e-5
    assert row.rejects_calibration == (1 if abs(z) > 1.96 else 0)
