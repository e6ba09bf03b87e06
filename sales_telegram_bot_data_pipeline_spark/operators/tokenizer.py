"""Byte-pair-encoding tokenizer: vocabulary-bounded merge training plus
distributed encoding — the real-token-count step of a training-data
pipeline (the regex token_count in functions/text.py is the cheap proxy;
this is the faithful subword form, clean-room after Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Scale design (100 TB):
- TRAINING runs on the aggregated (word, count) vocabulary, not the corpus:
  one groupBy over words (map-side combinable), a bounded top-V collect
  (same driver-side-bounded pattern as segmentation's top-50k vocab), then
  pure-Python merge induction over at most V word types — corpus size only
  affects the one aggregation pass.
- ENCODING broadcasts the merge ranks (a few KB) and applies them in an
  Arrow-batched pandas UDF — row-parallel, shuffle-free; the per-word
  encode is cached per batch since Zipf makes word types tiny relative to
  tokens.
- The whole operator is deterministic: merge ties break lexicographically,
  so the merge table — and therefore every token count — is reproducible
  from the corpus alone.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

N_MERGES = 200
VOCAB_CAP = 20000  # bounded driver-side vocabulary (top word types by count)
EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def train_bpe_merges(word_counts: dict[str, int], n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Induce BPE merges from a (word -> count) vocabulary.  Classic
    agglomerative loop: repeatedly merge the most frequent adjacent symbol
    pair (ties broken by lexicographic pair order for determinism)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if w:
            vocab[tuple(w) + (EOW,)] = vocab.get(tuple(w) + (EOW,), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, c in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # highest count; ties broken by lexicographically smallest pair
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if i + 1 < len(symbols) and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
        merges.append(pair)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge-rank table: repeatedly apply
    the lowest-rank applicable merge (the standard BPE encode loop)."""
    if not word:
        return []
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


@register(
    "bpe_token_count",
    oracle=None,  # pandas-UDF encode path → rows-only driver check; the
    # algorithm is pinned by tests/test_tokenizer.py golden cases
    doc=f"Real subword token counts: BPE merges ({N_MERGES}) trained on the "
    f"bounded top-{VOCAB_CAP} word-type vocabulary (one corpus aggregation "
    "pass + driver-side induction, Sennrich et al. 2016), broadcast as "
    "ranks, applied by an Arrow-batched pandas UDF with per-batch word "
    "caching. Deterministic: lexicographic tie-breaks.",
    tags=("tokenizer", "text", "udf"),
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).where(F.col("w") != "")
    counts = (
        words.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(VOCAB_CAP)
        .collect()
    )
    merges = train_bpe_merges({r["w"]: r["c"] for r in counts})
    ranks = {pair: i for i, pair in enumerate(merges)}
    b_ranks = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf("int")
    def n_bpe_tokens(texts: pd.Series) -> pd.Series:
        rk = b_ranks.value
        cache: dict[str, int] = {}
        out = []
        for t in texts:
            n = 0
            for w in (t or "").lower().split():
                if w not in cache:
                    cache[w] = len(encode_word(w, rk))
                n += cache[w]
            out.append(n)
        return pd.Series(out, dtype="int32")

    return (
        docs.select(
            "doc_id",
            F.size(F.expr(r"filter(split(lower(text), '\\s+'), t -> t <> '')")).alias("n_words"),
            n_bpe_tokens(F.col("text")).alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "bpe_fertility_by_source",
    oracle=None,  # consumes the Python BPE encoder — rows-only (like
    # bpe_token_count; golden encode behavior pinned in test_tokenizer.py)
    doc="Rows-only: tokenizer-efficiency audit — per (lang, source) BPE "
    "fertility (tokens/word) and compression (chars/token) over the "
    "corpus-trained merges. The number that decides whether a tokenizer "
    "needs retraining for a new source/language mix; per-doc counts "
    "aggregate map-side, the Python stage is the same cached Arrow encode "
    "as bpe_token_count.",
    tags=("tokenizer", "text", "python", "audit"),
)
def bpe_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = bpe_token_count(spark, sf_dir)  # doc_id, n_words, n_bpe_tokens
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.length("text").alias("n_chars_exact")
    )
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("n_bpe_tokens") / F.sum("n_words"), 6
            ).alias("fertility_tokens_per_word"),
            F.round(
                F.sum("n_chars_exact") / F.sum("n_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang", "source")
    )
