"""Round-9 continuation operator pins: each operator's math re-derived in
pure Python from the same base data (BH step-up frontier, McNemar cells,
hash-bucket collisions, m-estimate encoding, Good-Turing identities)."""

from __future__ import annotations

import hashlib

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").selectExpr(
        "source", "text", "length(text) AS len"
    ).collect()


def test_bh_fdr_matches_python(spark):
    rows = q.REGISTRY["bh_fdr_source_audit"].fn(spark, SF_SMOKE).collect()
    docs = _docs(spark)
    per = {}
    for r in docs:
        per.setdefault(r.source, []).append(r.len)
    # Python twin: Welch z^2 vs rest-of-corpus, Chebyshev p, BH step-up
    all_lens = [r.len for r in docs]
    n_all, s1_all = len(all_lens), sum(all_lens)
    s2_all = sum(x * x for x in all_lens)
    stats = {}
    for src, lens in per.items():
        n, s1 = len(lens), sum(lens)
        s2 = sum(x * x for x in lens)
        nr, s1r, s2r = n_all - n, s1_all - s1, s2_all - s2
        mg, mr = s1 / n, s1r / nr
        qg, qr = s2 / n, s2r / nr
        denom = (qg - mg * mg) / (n - 1) + (qr - mr * mr) / (nr - 1)
        z2 = (mg - mr) ** 2 / denom
        stats[src] = (n, z2, min(1.0, 1.0 / z2) if z2 > 1.0 else 1.0)
    order = sorted(stats, key=lambda s: (stats[s][2], s))
    m = len(order)
    k_star = max(
        (i + 1 for i, s in enumerate(order) if stats[s][2] <= 0.10 * (i + 1) / m),
        default=0,
    )
    assert [r.source for r in rows] == order
    for i, r in enumerate(rows):
        n, z2, p = stats[r.source]
        assert r.n_docs == n
        assert abs(r.z_squared - z2) < 1e-5
        assert abs(r.p_chebyshev - p) < 1e-5
        assert r.bh_rank == i + 1
        assert abs(r.bh_critical - 0.10 * (i + 1) / m) < 1e-9
        assert r.rejected == (1 if (i + 1) <= k_star else 0)
    # step-up monotonicity: rejections form a prefix of the p-ordering
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_mcnemar_matches_python(spark):
    row = q.REGISTRY["mcnemar_gate_disagreement"].fn(spark, SF_SMOKE).collect()[0]
    a = b = c = d = 0
    for r in _docs(spark):
        ga = len(r.text) >= 600
        gb = len([w for w in r.text.lower().split() if w]) >= 90
        if ga and gb:
            a += 1
        elif ga:
            b += 1
        elif gb:
            c += 1
        else:
            d += 1
    n = a + b + c + d
    assert (row.both_pass, row.b_disc, row.c_disc, row.both_fail, row.n) == (
        a, b, c, d, n,
    )
    assert abs(row.agreement - (a + d) / n) < 1e-6
    if b + c:
        assert abs(row.mcnemar_chi2 - (b - c) ** 2 / (b + c)) < 1e-5
        cc = max(abs(b - c) - 1, 0) ** 2 / (b + c)
        assert abs(row.mcnemar_chi2_cc - cc) < 1e-5


def _bigram_counts(spark):
    counts = {}
    for r in _docs(spark):
        w = [t for t in r.text.lower().split() if t]
        for i in range(len(w) - 1):
            g = f"{w[i]} {w[i + 1]}"
            counts[g] = counts.get(g, 0) + 1
    return counts


def test_feature_hashing_matches_python(spark):
    rows = {
        r.dim: r
        for r in q.REGISTRY["feature_hashing_collision_audit"].fn(spark, SF_SMOKE).collect()
    }
    counts = _bigram_counts(spark)

    def bucket(word: str, dim: int) -> int:
        return int(hashlib.md5(word.encode()).hexdigest()[:15], 16) % dim

    for dim in (256, 1024, 4096):
        occ = {}
        for wd, cnt in counts.items():
            occ.setdefault(bucket(wd, dim), []).append(cnt)
        r = rows[dim]
        assert r.n_types == len(counts)
        assert r.buckets_used == len(occ)
        collided = [v for v in occ.values() if len(v) >= 2]
        assert r.types_collided == sum(len(v) for v in collided)
        total = sum(counts.values())
        assert abs(r.freq_mass_collided - sum(sum(v) for v in collided) / total) < 1e-5
        assert r.max_bucket_types == max(len(v) for v in occ.values())
    # monotone: wider tables collide less
    assert rows[256].frac_types_collided >= rows[1024].frac_types_collided
    assert rows[1024].frac_types_collided >= rows[4096].frac_types_collided


def test_target_encoding_shrinkage_bounds(spark):
    rows = q.REGISTRY["target_encoding_smoothed"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 25  # 5 segments x 5 priorities
    # global mean from the cells themselves (exact cents)
    orders = load_table(spark, SF_SMOKE, "orders").selectExpr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
    ).collect()
    gmean = sum(r.cents for r in orders) / len(orders) / 100
    m = 200
    for r in rows:
        # m-estimate identity: enc = (n*raw + m*g)/(n+m), within rounding
        enc = (r.n_orders * r.raw_mean_dollars + m * gmean) / (r.n_orders + m)
        assert abs(r.encoded_dollars - enc) < 1e-3
        assert abs(r.shrinkage - m / (r.n_orders + m)) < 1e-6
        # shrinkage pulls the encoding strictly between raw mean and prior
        lo, hi = sorted((r.raw_mean_dollars, gmean))
        assert lo - 1e-6 <= r.encoded_dollars <= hi + 1e-6


def test_good_turing_matches_python(spark):
    rows = q.REGISTRY["good_turing_smoothing_audit"].fn(spark, SF_SMOKE).collect()
    counts = _bigram_counts(spark)
    foff = {}
    for cnt in counts.values():
        foff[cnt] = foff.get(cnt, 0) + 1
    n_tokens = sum(counts.values())
    low = sorted(foff)[:10]
    assert [r.r for r in rows] == low
    for r in rows:
        assert r.n_r == foff[r.r]
        r_star = (r.r + 1) * foff.get(r.r + 1, 0) / foff[r.r]
        assert abs(r.r_star - r_star) < 1e-5
        assert abs(r.gt_prob - r_star / n_tokens) < 1e-6
        assert abs(r.p_unseen - foff.get(1, 0) / n_tokens) < 1e-6
