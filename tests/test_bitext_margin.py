"""Semantic golden test for margin-based bitext mining: the margin
criterion must keep a genuine translation pair and SUPPRESS a hub vector —
one that scores moderately high against everything — which a raw cosine
threshold would mine by mistake (the operator's core claim)."""

from __future__ import annotations

from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK
from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
    _bitext_mining_sql,
)

DIM = 64


def _vec(*spec):
    """Unit-ish vector: all dims at +0.1 (same sign everywhere -> every
    vector lands in the SAME band buckets, so all pairs are candidates),
    with (index, value) overrides carrying the actual geometry."""
    v = [0.1] * DIM
    for i, x in spec:
        v[i] = x
    return v


def test_margin_keeps_pairs_and_suppresses_hub(spark):
    # a/b and c/d: genuine cross-lang pairs (nearly identical geometry);
    # h: a hub — MODERATE similarity to every cs vector (the hub-spoke
    # pairs b-h / d-h are the false positives a raw threshold mines);
    # a2/c2: en fillers so each cs node's top-k pool holds real neighbors;
    # e/f: cs near-twins of the hub (mining e-h / f-h is CORRECT — they
    # genuinely match — and they pull the hub's own normalizer up).
    hub = ((32, 2.5), (33, 2.5), (40, 2.5), (41, 2.5))
    rows = [
        (0, _vec((32, 5.0), (33, 5.0)), 0),          # a   (en)
        (1, _vec((32, 5.0), (33, 4.8)), 0),          # b   (cs)
        (2, _vec((40, 5.0), (41, 5.0)), 0),          # c   (en)
        (3, _vec((40, 4.8), (41, 5.0)), 0),          # d   (cs)
        (4, _vec(*hub), 0),                          # h   (en)
        (6, _vec((32, 4.9), (33, 5.1)), 0),          # a2  (en)
        (8, _vec((40, 5.1), (41, 4.9)), 0),          # c2  (en)
        (5, _vec((32, 2.6), (33, 2.4), (40, 2.5), (41, 2.5)), 0),  # e (cs)
        (7, _vec((32, 2.5), (33, 2.5), (40, 2.4), (41, 2.6)), 0),  # f (cs)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).createOrReplaceTempView("bitext_hub_emb")
    langs = [(0, "en"), (1, "cs"), (2, "en"), (3, "cs"), (4, "en"),
             (5, "cs"), (6, "en"), (7, "cs"), (8, "en")]
    spark.createDataFrame(langs, "doc_id long, lang string").createOrReplaceTempView(
        "bitext_hub_docs"
    )

    out = spark.sql(
        _bitext_mining_sql(SPARK, "bitext_hub_emb", "bitext_hub_docs")
    ).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    cosine = {(r.doc_a, r.doc_b): r.cosine for r in out}

    assert (0, 1) in pairs and (2, 3) in pairs, f"genuine pairs missing: {pairs}"
    # the hub-SPOKE false positives (hub vs the genuine pairs' members)
    # must be suppressed; hub vs its near-twins e/f (cos ~0.99) is a
    # genuine match and MAY be mined
    hub_spokes = {p for p in pairs if 4 in p and (1 in p or 3 in p)}
    assert not hub_spokes, f"hub-spoke pairs survived the margin filter: {hub_spokes}"
    # the trap a raw threshold falls into: the hub's cosines are HIGH in
    # absolute terms (they'd pass any threshold that keeps the true pairs'
    # ballpark) — check the hub was suppressed by MARGIN, not by low cosine
    all_scored = spark.sql(
        _bitext_mining_sql(SPARK, "bitext_hub_emb", "bitext_hub_docs").replace(
            "WHERE margin_units >= 1020000", "WHERE margin_units >= 0"
        )
    ).collect()
    hub_cos = [r.cosine for r in all_scored if 4 in (r.doc_a, r.doc_b)]
    assert hub_cos and max(hub_cos) > 0.5, "fixture broken: hub should be high-cosine"
