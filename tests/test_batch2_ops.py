"""Brute-force / invariant pins for the second round-7-continuation batch:
padding-waste audit, stratified k-fold plan, window-PPMI co-occurrence,
retention vacuum plan."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def _docs(sf_dir: str):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_padding_waste_matches_python(spark):
    toks = [len(t.lower().split()) for _, t, _ in _docs(SF_SMOKE) if t.lower().split()]
    buckets = Counter(math.ceil(n / 64) * 64 for n in toks)
    out = q.REGISTRY["padding_waste_audit"].fn(spark, SF_SMOKE).collect()
    assert sorted(r.bucket_len for r in out) == sorted(buckets)
    max_len, sum_tok, n_docs = max(toks), sum(toks), len(toks)
    g_expect = 1 - sum_tok / (max_len * n_docs)
    for r in out:
        assert r.n_docs == buckets[r.bucket_len]
        assert r.padded_tokens == r.bucket_len * r.n_docs
        assert 0 <= r.waste_frac < 1
        assert r.sum_tokens <= r.padded_tokens
        assert abs(r.global_pad_waste_frac - g_expect) < 1e-6
    # bucketed batching strictly beats the single-max-length loader here
    total_padded = sum(r.padded_tokens for r in out)
    assert total_padded < max_len * n_docs


def test_kfold_partition_complete_and_stratified(spark):
    rows = q.REGISTRY["stratified_kfold_plan"].fn(spark, SF_SMOKE).collect()
    langs = Counter(l for _, _, l in _docs(SF_SMOKE))
    per_lang = Counter()
    for r in rows:
        assert 0 <= r.fold < 5
        per_lang[r.lang] += r.n_docs
        spread = max(
            x.n_docs for x in rows if x.lang == r.lang
        ) - min(x.n_docs for x in rows if x.lang == r.lang)
        assert r.lang_fold_spread == spread
    assert dict(per_lang) == dict(langs)  # folds partition every stratum


def test_ppmi_window_matches_python(spark):
    pair_counts: Counter = Counter()
    for _, text, _ in _docs(SF_SMOKE):
        w = text.lower().split()
        for i in range(len(w)):
            for d in (1, 2):
                if i + d < len(w) and w[i] != w[i + d]:
                    pair_counts[tuple(sorted((w[i], w[i + d])))] += 1
    n = sum(pair_counts.values())
    marg: Counter = Counter()
    for (a, b), c in pair_counts.items():
        marg[a] += c
        marg[b] += c
    scored = [
        (math.floor(math.log(c * n / (marg[a] * marg[b])) * 1e6), a, b, c)
        for (a, b), c in pair_counts.items()
        if c >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = scored[:40]

    out = q.REGISTRY["ppmi_window_cooccurrence"].fn(spark, SF_SMOKE).collect()
    assert len(out) == len(expect)
    for r, (units, a, b, c) in zip(out, expect):
        assert (r.w1, r.w2, r.n_pair) == (a, b, c)
        assert abs(r.ppmi - max(units, 0) / 1e6) < 1e-9


def test_vacuum_plan_expires_exactly_past_horizon(spark):
    con = duckdb.connect()
    day_counts = dict(
        con.sql(
            f"SELECT CAST(CAST(ts AS DATE) AS VARCHAR), COUNT(*) FROM "
            f"read_parquet('{SF_SMOKE}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    con.close()
    import datetime

    max_day = max(datetime.date.fromisoformat(d) for d in day_counts)
    cutoff = max_day - datetime.timedelta(days=7)
    rows = q.REGISTRY["retention_vacuum_plan"].fn(spark, SF_SMOKE).collect()
    assert {r.day for r in rows} == set(day_counts)
    for r in rows:
        d = datetime.date.fromisoformat(r.day)
        assert r.n_rows == day_counts[r.day]
        assert r.expired == (d < cutoff)
        assert r.reclaim_rows == (r.n_rows if r.expired else 0)
    assert any(r.expired for r in rows) and any(not r.expired for r in rows)
