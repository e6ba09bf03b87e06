"""Multi-pattern blocklist filtering via a broadcast Aho-Corasick automaton.

The curation problem: scan every document against THOUSANDS of banned
phrases (policy blocklists, known-contaminated strings, boilerplate
signatures).  A regex alternation compiles to an NFA that scales with the
pattern count; Aho-Corasick (1975) matches ALL patterns simultaneously in
O(text + matches) regardless of how many there are — the standard answer,
clean-roomed here (goto/fail/output construction by BFS).

Engine shape: the automaton builds ONCE from the pattern list (a build-once
artifact like the segmentation trie), broadcasts to executors, and an
Arrow-batched pandas UDF streams each document through it — Python is
required (the automaton is stateful per character), so the operator follows
the tokenizer/segmentation pattern: broadcast side-input + vectorized UDF,
never per-row Python expressions.  Output stays small (per-doc match
counts), so the corpus text dies in the UDF.

Not SQL-expressible (stateful per-char scan) -> rows-only registry entry;
semantics pinned by golden tests against a naive find-all implementation
(tests/test_blocklist.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

# The demo blocklist: phrases that occur in the synthetic corpus (so the
# operator demonstrably fires) plus ones that don't.  A deployment feeds
# its policy list through the same build path.
BLOCKLIST = (
    "fast key",
    "table scan",
    "merge part",
    "slow join",
    "data data",
    "forbidden phrase",
    "never appears anywhere",
)


class AhoCorasick:
    """Clean-room Aho-Corasick: goto tree + BFS failure links + merged
    output sets.  ``find_all(text)`` yields (end_index, pattern)."""

    def __init__(self, patterns):
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[str]] = [[]]
        self.fail: list[int] = [0]
        for p in patterns:
            self._insert(p)
        self._build_failures()

    def _insert(self, pattern: str) -> None:
        s = 0
        for ch in pattern:
            nxt = self.goto[s].get(ch)
            if nxt is None:
                nxt = len(self.goto)
                self.goto.append({})
                self.out.append([])
                self.fail.append(0)
                self.goto[s][ch] = nxt
            s = nxt
        self.out[s].append(pattern)

    def _build_failures(self) -> None:
        from collections import deque

        q = deque()
        for s in self.goto[0].values():
            self.fail[s] = 0
            q.append(s)
        while q:
            r = q.popleft()
            for ch, u in self.goto[r].items():
                q.append(u)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                # goto[f][ch] can never be u itself: f is strictly shallower
                # than u's parent r, and the goto structure is a trie
                self.fail[u] = self.goto[f].get(ch, 0)
                self.out[u] = self.out[u] + self.out[self.fail[u]]

    def find_all(self, text: str):
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for pat in self.out[s]:
                yield (i, pat)


def _blocklist_bc(spark: SparkSession):
    from ..functions.broadcast_cache import broadcast_once

    return broadcast_once(spark, "blocklist", (), lambda: AhoCorasick(BLOCKLIST))


def scan_blocklist(spark: SparkSession, df: DataFrame, text_col: str) -> DataFrame:
    """Attach per-row blocklist scan results: total match count, distinct
    patterns hit (sorted, joined), and a block flag."""
    bc = _blocklist_bc(spark)

    @F.pandas_udf("struct<n_matches: int, patterns: string>")
    def scan(texts: pd.Series) -> pd.DataFrame:
        ac = bc.value
        n_out, p_out = [], []
        for t in texts:
            if t is None:
                n_out.append(0)
                p_out.append("")
                continue
            hits = list(ac.find_all(t.lower()))
            n_out.append(len(hits))
            p_out.append("|".join(sorted({p for _, p in hits})))
        return pd.DataFrame({"n_matches": n_out, "patterns": p_out})

    res = df.withColumn("__scan", scan(F.col(text_col)))
    return (
        res.withColumn("n_matches", F.col("__scan.n_matches"))
        .withColumn("patterns_hit", F.col("__scan.patterns"))
        .withColumn("blocked", F.col("__scan.n_matches") > 0)
        .drop("__scan")
    )


@register(
    "blocklist_scan",
    oracle=None,  # stateful per-char automaton scan — not SQL-expressible
    doc=f"Rows-only: Aho-Corasick multi-pattern blocklist scan — "
    f"{len(BLOCKLIST)}-phrase automaton built once and broadcast, Arrow-"
    "batched per-doc scan in O(text + matches) independent of pattern "
    "count (a regex alternation scales with it); emits per-doc match "
    "count, distinct patterns hit, block flag. Golden-tested against a "
    "naive find-all.",
    tags=("curation", "text", "python", "udf"),
)
def blocklist_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        scan_blocklist(spark, docs.select("doc_id", "text"), "text")
        .select("doc_id", "n_matches", "patterns_hit", "blocked")
        .orderBy("doc_id")
    )
