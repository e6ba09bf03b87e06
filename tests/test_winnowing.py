"""Golden test: the fixed-frame-window winnowing selection must equal the
textbook algorithm (Schleimer et al. 2003: per window of W gram hashes,
select the minimum, ties broken by rightmost position; fingerprints = union
over complete windows)."""

from __future__ import annotations

import hashlib

from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK
from sales_telegram_bot_data_pipeline_spark.operators.dedup import (
    WNW_K,
    WNW_W,
    _wnw_selected_rel,
)


def _md5_prefix_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _reference_winnow(words: list[str]) -> set[int]:
    """Textbook winnowing over the doc's k-gram hash sequence; returns the
    1-based selected gram positions."""
    grams = [
        " ".join(words[i : i + WNW_K]) for i in range(len(words) - WNW_K + 1)
    ]
    h = [_md5_prefix_int(g) for g in grams]
    selected: set[int] = set()
    for e in range(WNW_W - 1, len(h)):  # complete windows only
        window = h[e - WNW_W + 1 : e + 1]
        mn = min(window)
        # rightmost position attaining the min
        off = max(j for j, v in enumerate(window) if v == mn)
        selected.add(e - WNW_W + 1 + off + 1)  # to 1-based gram position
    return selected


def _seeded_random_docs(n_docs: int = 30, seed: int = 20260814) -> list[str]:
    """Deterministic fuzz corpus: small alphabet (forces hash ties and
    repeated grams), varied lengths including G < W edges."""
    import random

    rng = random.Random(seed)
    alphabet = ["aa", "bb", "cc", "dd", "ee"]
    return [
        " ".join(rng.choice(alphabet) for _ in range(rng.randint(2, 40)))
        for _ in range(n_docs)
    ]


DOCS = [
    "the quick brown fox jumps over the lazy dog again and again and again",
    "a b c d e f g h i j k l m n o p",
    "dup dup dup dup dup dup dup dup dup dup",  # all-equal hashes: tie storm
    "one two three four",  # exactly one gram, G < W: no complete window
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "x y x y x y x y x y x y",  # periodic
] + _seeded_random_docs()


def test_winnowing_matches_textbook_reference(spark):
    rows = [(i, t) for i, t in enumerate(DOCS)]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "wnw_golden_docs"
    )
    got = {
        (r.doc_id, r.i)
        for r in spark.sql(_wnw_selected_rel(SPARK, "wnw_golden_docs")).collect()
        if r.sel == 1
    }
    want = set()
    for doc_id, text in rows:
        for pos in _reference_winnow(text.lower().split()):
            want.add((doc_id, pos))
    assert got == want
    assert want  # the fixture actually exercises selection
    # guarantee property: at least one fingerprint per W consecutive grams
    for doc_id, text in rows:
        n_grams = len(text.split()) - WNW_K + 1
        if n_grams >= WNW_W:
            sel = sorted(p for d, p in want if d == doc_id)
            assert sel[0] <= WNW_W
            for a, b in zip(sel, sel[1:]):
                assert b - a <= WNW_W
