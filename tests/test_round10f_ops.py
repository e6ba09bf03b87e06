"""Round-10 sixth-batch pins: CLES / Vargha-Delaney A, Hellinger-
Bhattacharyya, and ECE/MCE re-derived in pure Python at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _two_sources(spark):
    groups = defaultdict(list)
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect():
        groups[r.source].append(r.n_chars)
    a, b = sorted(groups)[:2]
    return a, b, groups[a], groups[b]


def test_cles_matches_python(spark):
    row = q.REGISTRY["cles_effect_size"].fn(spark, SF_SMOKE).collect()[0]
    a_src, b_src, xa, xb = _two_sources(spark)
    wins = sum(1 for x in xa for y in xb if x > y)
    ties = sum(1 for x in xa for y in xb if x == y)
    a_stat = (wins + 0.5 * ties) / (len(xa) * len(xb))
    assert (row.source_a, row.source_b) == (a_src, b_src)
    assert (row.n_a, row.n_b) == (len(xa), len(xb))
    assert abs(row.vd_a_statistic - a_stat) < 1e-6
    assert abs(row.rank_biserial_abs - abs(2 * a_stat - 1)) < 1e-6
    assert 0.0 <= row.vd_a_statistic <= 1.0


def test_hellinger_matches_python(spark):
    row = q.REGISTRY["hellinger_bhattacharyya"].fn(spark, SF_SMOKE).collect()[0]
    a_src, b_src, xa, xb = _two_sources(spark)
    ca, cb = Counter(xa), Counter(xb)
    na, nb = len(xa), len(xb)
    bc = sum(
        math.floor(math.sqrt((ca[v] / na) * (cb[v] / nb)) * 1e9)
        for v in set(ca) & set(cb)
    )
    h = math.sqrt(max(0.0, 1 - bc / 1e9))
    assert abs(row.bhattacharyya_coef - bc / 1e9) < 1e-6
    assert abs(row.hellinger_distance - h) < 1e-6
    assert 0.0 <= row.bhattacharyya_coef <= 1.0
    assert 0.0 <= row.hellinger_distance <= 1.0


def test_ece_matches_python(spark):
    rows = q.REGISTRY["expected_calibration_error"].fn(spark, SF_SMOKE).collect()
    scored = q.REGISTRY["quality_logreg_score"].fn(spark, SF_SMOKE).collect()
    lang = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    }
    bins = defaultdict(lambda: [0, 0, 0])  # n, sum_p_micro, sum_y_micro
    for r in scored:
        pu = round(r.quality_prob * 1e6)
        yu = 1_000_000 if lang[r.doc_id] == "en" else 0
        b = min(pu // 100_000, 9)
        bins[b][0] += 1
        bins[b][1] += pu
        bins[b][2] += yu
    n = sum(v[0] for v in bins.values())
    sum_gap = sum(abs(v[2] - v[1]) for v in bins.values())
    ece = sum_gap / 1e6 / n
    mce = max(abs(v[2] - v[1]) / v[0] for v in bins.values()) / 1e6
    got = {r.bin: r for r in rows}
    assert set(got) == set(bins)
    for b, (nk, sp, sy) in bins.items():
        r = got[b]
        assert r.n_docs == nk
        assert abs(r.mean_confidence - sp / 1e6 / nk) < 1e-6
        assert abs(r.observed_rate - sy / 1e6 / nk) < 1e-6
        assert abs(r.ece - ece) < 1e-6
        assert abs(r.mce - mce) < 1e-6
    assert 0.0 <= rows[0].ece <= rows[0].mce <= 1.0
