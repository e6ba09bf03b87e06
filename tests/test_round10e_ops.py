"""Round-10 fifth-batch pins: binary-segmentation split, Markov entropy
rate, and two-sample Cramér-von Mises re-derived in pure Python at
sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_binseg_matches_python(spark):
    row = q.REGISTRY["binary_segmentation_split"].fn(spark, SF_SMOKE).collect()[0]
    daily = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "orders").selectExpr(
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x",
    ).collect():
        daily[r.day] += r.x
    days = sorted(daily)
    n = len(days)
    s = sum(daily.values())
    best = None
    n1 = s1 = 0
    for t in days:
        n1 += 1
        s1 += daily[t]
        if n1 == n:
            break
        ss = math.floor((s1 * s1 / n1 + (s - s1) ** 2 / (n - n1) - s * s / n) / 1e6)
        cand = (-ss, t, n1, s1)
        if best is None or cand < best:
            best = cand
    neg_ss, t, n1, s1 = best
    assert row.split_after_day == t
    assert (row.n_days_left, row.n_days_right) == (n1, n - n1)
    assert abs(row.mean_left_dollars - round(s1 / n1 / 100, 2)) < 1e-6
    assert abs(row.mean_right_dollars - round((s - s1) / (n - n1) / 100, 2)) < 1e-6
    assert abs(row.ss_between_per_day_dollars2 - round(-neg_ss * 1e6 / 1e4 / n, 2)) < 1e-6


def test_entropy_rate_matches_python(spark):
    row = q.REGISTRY["markov_entropy_rate"].fn(spark, SF_SMOKE).collect()[0]
    seqs = defaultdict(list)
    for r in sorted(
        load_table(spark, SF_SMOKE, "events").select(
            "user_id", "ts", "event_id", "event_type"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    ):
        seqs[r.user_id].append(r.event_type)
    trans = Counter()
    for evs in seqs.values():
        for a, b in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    n = sum(trans.values())
    ri = Counter()
    marg = Counter()
    for (i, j), c in trans.items():
        ri[i] += c
        marg[j] += c
    h_cond = sum(
        math.floor(-(c / n) * math.log(c / ri[i]) * 1e9)
        for (i, j), c in trans.items()
    )
    h_marg = sum(
        math.floor(-(c / n) * math.log(c / n) * 1e9) for c in marg.values()
    )
    assert row.n_transitions == n
    assert abs(row.entropy_rate_nats - h_cond / 1e9) < 1e-6
    assert abs(row.marginal_entropy_nats - h_marg / 1e9) < 1e-6
    assert abs(
        row.predictive_information_nats - (h_marg - h_cond) / 1e9
    ) < 1e-6
    # conditioning can only reduce entropy (up to quantization noise)
    assert row.entropy_rate_nats <= row.marginal_entropy_nats + 1e-6


def test_cvm_matches_python(spark):
    row = q.REGISTRY["cramer_von_mises_two_sample"].fn(spark, SF_SMOKE).collect()[0]
    groups = defaultdict(list)
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect():
        groups[r.source].append(r.n_chars)
    a_src, b_src = sorted(groups)[:2]
    xa, xb = groups[a_src], groups[b_src]
    na, nb = len(xa), len(xb)
    ca, cb = Counter(xa), Counter(xb)
    pooled = sorted(set(xa) | set(xb))
    fa = fb = 0
    sgap = 0
    for v in pooled:
        fa += ca.get(v, 0)
        fb += cb.get(v, 0)
        w = ca.get(v, 0) + cb.get(v, 0)
        sgap += w * (fa * nb - fb * na) ** 2
    t_stat = sgap / (na * nb) / (na + nb) ** 2
    assert (row.source_a, row.source_b) == (a_src, b_src)
    assert (row.n_a, row.n_b) == (na, nb)
    assert abs(row.cvm_t_statistic - t_stat) < 1e-6
    assert row.reject_same_dist_5pct == (1 if t_stat > 0.461 else 0)
