"""Pins for the seventh round-7-continuation batch: one-way ANOVA, PSI
split drift, daily-revenue autocorrelation, vocabulary coverage curve."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def _fetch(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("documents", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.sql(sql).fetchall()
    con.close()
    return rows


def test_anova_matches_manual_formula(spark):
    data = defaultdict(list)
    for src, n in _fetch(SF_SMOKE, "SELECT source, n_chars FROM documents"):
        data[src].append(n)
    k = len(data)
    nn = sum(len(v) for v in data.values())
    grand = sum(sum(v) for v in data.values()) / nn
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in data.values())
    ssw = sum(sum(x * x for x in v) - sum(v) ** 2 / len(v) for v in data.values())
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    rows = q.REGISTRY["anova_sources_doclen"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.k_groups, r.n_total) == (k, nn)
    assert abs(r.ss_between - ssb) < 1e-3 * max(ssb, 1)
    assert abs(r.ss_within - ssw) < 1e-3 * max(ssw, 1)
    assert abs(r.f_stat - f) < 1e-3 * max(abs(f), 1)
    assert abs(r.eta_squared - ssb / (ssb + ssw)) < 1e-4


def test_psi_matches_python(spark):
    docs = _fetch(SF_SMOKE, "SELECT doc_id, n_chars FROM documents")
    lo = min(n for _, n in docs)
    hi = max(n for _, n in docs)
    counts = defaultdict(lambda: [1, 1])  # laplace-smoothed [train, test]
    for did, n in docs:
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) % 100
        split = "train" if h < 80 else ("val" if h < 90 else "test")
        if split == "val":
            continue
        b = min((16 * (n - lo)) // (hi - lo + 1), 15)
        counts[b][0 if split == "train" else 1] += 1
    tt = sum(v[0] for v in counts.values())
    te = sum(v[1] for v in counts.values())
    psi_u = sum(
        math.floor(
            (a / tt - b_ / te) * math.log((a / tt) / (b_ / te)) * 1e9
        )
        for a, b_ in counts.values()
    )
    rows = q.REGISTRY["psi_split_drift"].fn(spark, SF_SMOKE).collect()
    assert {r.bucket for r in rows} == set(counts)
    for r in rows:
        a, b_ = counts[r.bucket]
        assert (r.n_train, r.n_test) == (a, b_)
        assert abs(r.psi_total - round(psi_u / 1e9, 6)) < 1e-9
        assert r.stable == (psi_u < 100000000)
    # PSI contributions are always >= 0 ((p-q) and ln(p/q) share sign) up to
    # the 1e-9 flooring
    assert all(r.psi_contrib >= -1e-9 for r in rows)


def test_acf_matches_python_exact(spark):
    daily = Counter()
    for day, cents in _fetch(
        SF_SMOKE,
        "SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)), "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) FROM orders",
    ):
        daily[day] += cents
    n = len(daily)
    s = sum(daily.values())
    dev = {d: c * n - s for d, c in daily.items()}
    d2 = sum(v * v for v in dev.values())
    rows = q.REGISTRY["acf_daily_revenue"].fn(spark, SF_SMOKE).collect()
    assert [r.lag for r in rows] == list(range(1, 15))
    for r in rows:
        pairs = [(d, d + r.lag) for d in dev if d + r.lag in dev]
        num = sum(dev[a] * dev[b] for a, b in pairs)
        assert r.n_pairs == len(pairs)
        assert abs(r.acf - round(num / d2, 6)) < 1e-9
        assert abs(r.acf) <= 1.5  # scaled-deviation ratio stays bounded


def test_vocab_coverage_curve_matches_python(spark):
    cnt = Counter()
    for (text,) in _fetch(SF_SMOKE, "SELECT text FROM documents"):
        cnt.update(text.lower().split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    rows = q.REGISTRY["vocab_coverage_curve"].fn(spark, SF_SMOKE).collect()
    assert [r.budget for r in rows] == [250, 500, 1000, 2000, 4000]
    prev = -1.0
    for r in rows:
        covered = sum(c for _, c in ranked[: r.budget])
        assert r.covered_tokens == covered
        assert r.n_types_used == min(r.budget, len(ranked))
        assert abs(r.coverage - round(covered / total, 6)) < 1e-9
        assert abs(r.coverage + r.oov_rate - 1.0) < 2e-6
        assert r.coverage >= prev  # monotone in budget
        prev = r.coverage
