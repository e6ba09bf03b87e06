"""Pins for the fourth round-7-continuation batch: lang-ID confusion
eval, vocabulary novelty curve, churn training-set builder."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def test_langid_confusion_consistent_with_langid_query(spark):
    """The eval table must agree row-for-row with the registered detector
    it evaluates (shared ratio expression, not a reimplementation)."""
    pred = q.REGISTRY["lang_id_heuristic"].fn(spark, SF_SMOKE).collect()
    per_lang = defaultdict(lambda: [0, 0])
    for r in pred:
        e = per_lang[r.declared_lang]
        e[0] += 1
        e[1] += int(r.guessed_lang == "en")
    out = q.REGISTRY["langid_eval_confusion"].fn(spark, SF_SMOKE).collect()
    assert {r.declared_lang for r in out} == set(per_lang)
    tp = per_lang.get("en", [0, 0])[1]
    fp = sum(v[1] for k, v in per_lang.items() if k != "en")
    fn = per_lang.get("en", [0, 0])[0] - tp
    for r in out:
        n, n_en = per_lang[r.declared_lang]
        assert (r.n_docs, r.n_pred_en) == (n, n_en)
        assert abs(r.pred_en_rate - round(n_en / n, 6)) < 1e-9
        assert abs(r.en_precision - round(tp / (tp + fp), 6)) < 1e-9
        assert abs(r.en_recall - round(tp / (tp + fn), 6)) < 1e-9
        assert abs(r.en_f1 - round(2 * tp / (2 * tp + fp + fn), 6)) < 1e-9


def test_vocab_novelty_curve_properties(spark):
    rows = q.REGISTRY["vocab_novelty_by_source"].fn(spark, SF_SMOKE).collect()
    assert rows
    # cumulative vocab is non-decreasing and ends at the global type count
    con = duckdb.connect()
    (total_types,) = con.sql(
        f"""SELECT COUNT(DISTINCT w) FROM (
            SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                      t -> t <> '')) AS w
            FROM read_parquet('{SF_SMOKE}/documents.parquet'))"""
    ).fetchall()[0]
    con.close()
    prev = 0
    for r in rows:  # already ordered by source
        assert r.new_types <= r.present_types
        assert r.cum_vocab >= prev
        assert r.cum_vocab == prev + r.new_types
        assert abs(r.novelty_rate - round(r.new_types / r.present_types, 6)) < 1e-9
        prev = r.cum_vocab
    assert prev == total_types
    # the first source in acquisition order contributes everything it has
    assert rows[0].new_types == rows[0].present_types


def test_churn_labels_are_leakage_free(spark):
    import datetime

    con = duckdb.connect()
    ords = con.sql(
        f"SELECT o_custkey, CAST(o_orderdate AS DATE), "
        f"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    dmax = max(d for _, d, _ in ords)
    cutoff = dmax - datetime.timedelta(days=365)
    before = defaultdict(list)
    after = set()
    for u, d, cents in ords:
        if d < cutoff:
            before[u].append((d, cents))
        else:
            after.add(u)
    rows = q.REGISTRY["churn_label_features"].fn(spark, SF_SMOKE).collect()
    assert {r.custkey for r in rows} == set(before)  # only observed customers
    for r in rows:
        os_ = before[r.custkey]
        assert r.n_orders == len(os_)
        assert r.spend_cents == sum(c for _, c in os_)
        assert r.order_days == len({d for d, _ in os_})
        assert r.last_gap_days == (cutoff - max(d for d, _ in os_)).days
        assert r.churned == (r.custkey not in after)
    # the label is non-degenerate on this corpus (~20% positive rate)
    assert any(r.churned for r in rows) and any(not r.churned for r in rows)
