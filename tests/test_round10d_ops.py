"""Round-10 fourth-batch pins: Kruskal-Wallis, Hodges-Lehmann,
Cochran-Armitage, and Mantel-Haenszel re-derived in pure Python at
sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _doc_lengths(spark):
    groups = defaultdict(list)
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect():
        groups[r.source].append(r.n_chars)
    return groups


def test_kruskal_wallis_matches_python(spark):
    rows = {r.source: r for r in q.REGISTRY["kruskal_wallis_doclen"].fn(spark, SF_SMOKE).collect()}
    groups = _doc_lengths(spark)
    vals = Counter()
    for vs in groups.values():
        vals.update(vs)
    n = sum(vals.values())
    k = len(groups)
    # 2x tie-averaged global rank per value
    r2 = {}
    for v in sorted(vals):
        before = sum(c for vv, c in vals.items() if vv < v)
        r2[v] = 2 * before + vals[v] + 1
    rr_micro = 0
    stats = {}
    for s, vs in groups.items():
        r2sum = sum(r2[v] for v in vs)
        stats[s] = (len(vs), r2sum)
        rr_micro += math.floor(r2sum * r2sum / 4 / len(vs) * 1e6)
    h_raw = 12 / (n * (n + 1)) * (rr_micro / 1e6) - 3 * (n + 1)
    tie_c = 1 - sum(c**3 - c for c in vals.values()) / (n**3 - n)
    h = h_raw / tie_c
    for s, (ng, r2sum) in stats.items():
        r = rows[s]
        assert r.n_docs == ng
        assert abs(r.mean_rank - r2sum / 2 / ng) < 1e-6
        assert (r.n_total, r.k_groups) == (n, k)
        assert abs(r.kw_h_statistic - h) < 1e-4
        assert r.reject_equal_5pct == (1 if h > 30.144 else 0)


def test_hodges_lehmann_matches_python(spark):
    row = q.REGISTRY["hodges_lehmann_shift"].fn(spark, SF_SMOKE).collect()[0]
    groups = _doc_lengths(spark)
    a_src, b_src = sorted(groups)[:2]
    assert (row.source_a, row.source_b) == (a_src, b_src)
    diffs = sorted(x - y for x in groups[a_src] for y in groups[b_src])
    n = len(diffs)
    med2 = diffs[(n + 1) // 2 - 1] + diffs[(n + 2) // 2 - 1]
    assert row.n_pairs == n
    assert abs(row.hodges_lehmann_shift - med2 / 2) < 1e-9
    assert row.min_diff == diffs[0] and row.max_diff == diffs[-1]


def test_cochran_armitage_matches_python(spark):
    rows = {r.priority_score: r for r in q.REGISTRY["cochran_armitage_trend"].fn(spark, SF_SMOKE).collect()}
    cells = defaultdict(lambda: [0, 0])
    for r in load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect():
        s = int(r.o_orderpriority[0])
        cells[s][0] += 1
        if r.o_orderstatus == "F":
            cells[s][1] += 1
    n = sum(v[0] for v in cells.values())
    x = sum(v[1] for v in cells.values())
    sn = sum(s * v[0] for s, v in cells.items())
    sx = sum(s * v[1] for s, v in cells.items())
    ssn = sum(s * s * v[0] for s, v in cells.items())
    num = sx - x * sn / n
    den = (x / n) * (1 - x / n) * (ssn - sn * sn / n)
    chi2 = num * num / den
    for s, (ni, xi) in cells.items():
        r = rows[s]
        assert r.n_orders == ni
        assert abs(r.fulfilled_rate - xi / ni) < 1e-6
        assert r.n_total == n
        assert abs(r.ca_trend_chi2 - chi2) < 1e-4
        assert r.reject_no_trend_5pct == (1 if chi2 > 3.841 else 0)


def test_mantel_haenszel_matches_python(spark):
    rows = {r.stratum: r for r in q.REGISTRY["mantel_haenszel_or"].fn(spark, SF_SMOKE).collect()}
    seg_of = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    tabs = defaultdict(lambda: [0, 0, 0, 0])  # a b c d
    for r in load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderstatus"
    ).collect():
        exp = int(hashlib.md5(f"mh|{r.o_custkey}".encode()).hexdigest()[:15], 16) % 2
        out = 1 if r.o_orderstatus == "F" else 0
        t = tabs[seg_of[r.o_custkey]]
        if exp and out:
            t[0] += 1
        elif exp:
            t[1] += 1
        elif out:
            t[2] += 1
        else:
            t[3] += 1
    sad = sbc = se = sv = 0
    sum_a = 0
    for a, b, c, dd in tabs.values():
        nn = a + b + c + dd
        sum_a += a
        sad += math.floor(a * dd / nn * 1e6)
        sbc += math.floor(b * c / nn * 1e6)
        se += math.floor((a + b) * (a + c) / nn * 1e6)
        sv += math.floor((a + b) * (c + dd) * (a + c) * (b + dd) / (nn * nn * (nn - 1)) * 1e6)
    mh_or = sad / sbc
    cmh = (sum_a - se / 1e6) ** 2 / (sv / 1e6)
    for seg, (a, b, c, dd) in tabs.items():
        r = rows[seg]
        assert (
            r.n_exposed_fulfilled, r.n_exposed_other,
            r.n_control_fulfilled, r.n_control_other,
        ) == (a, b, c, dd)
        assert abs(r.mh_odds_ratio - mh_or) < 1e-5
        assert abs(r.cmh_chi2 - cmh) < 1e-4
    assert all(r.mh_odds_ratio > 0 for r in rows.values())
