"""Golden tests for the Aho-Corasick blocklist scan: the automaton must
find exactly the matches a naive per-pattern scan finds — including
overlapping patterns, patterns that are substrings/suffixes of each other,
and repeated hits."""

from __future__ import annotations

from sales_telegram_bot_data_pipeline_spark.operators.blocklist import (
    BLOCKLIST,
    AhoCorasick,
    scan_blocklist,
)


def _naive_find_all(patterns, text):
    hits = []
    for p in patterns:
        start = 0
        while True:
            i = text.find(p, start)
            if i < 0:
                break
            hits.append((i + len(p) - 1, p))
            start = i + 1
    return sorted(hits)


CASES = [
    "the fast key order sort table scan merge part window",
    "slow join slow join slow join",  # repeated, overlapping starts
    "data data data",  # self-overlapping pattern 'data data'
    "nothing matches here at all",
    "",
    "fast keyfast key",  # adjacent occurrences across a shared boundary
]

# patterns with suffix relations to stress failure links
SUFFIX_PATTERNS = ("he", "she", "his", "hers")
SUFFIX_TEXT = "ushers she his hers"


def test_automaton_matches_naive_on_corpus_patterns():
    ac = AhoCorasick(BLOCKLIST)
    for text in CASES:
        assert sorted(ac.find_all(text)) == _naive_find_all(BLOCKLIST, text), text


def test_automaton_failure_links_suffix_patterns():
    ac = AhoCorasick(SUFFIX_PATTERNS)
    assert sorted(ac.find_all(SUFFIX_TEXT)) == _naive_find_all(
        SUFFIX_PATTERNS, SUFFIX_TEXT
    )
    # the classic: 'ushers' must fire he, she, hers
    got = {p for _, p in ac.find_all("ushers")}
    assert got == {"he", "she", "hers"}


def test_blocklist_scan_query_matches_naive(spark):
    rows = [(i, t) for i, t in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_matches, r.patterns_hit, r.blocked)
        for r in scan_blocklist(spark, df, "text").collect()
    }
    for doc_id, text in rows:
        hits = _naive_find_all(BLOCKLIST, text.lower())
        want_pats = "|".join(sorted({p for _, p in hits}))
        assert got[doc_id] == (len(hits), want_pats, len(hits) > 0), text
