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


# --------------------------------------------------------------------------
# unigram-LM tokenizer (SentencePiece-style, clean-room after Kudo 2018)
# --------------------------------------------------------------------------
UNI_MAX_PIECE = 6    # max piece length in the seed vocabulary
UNI_SEED_MIN = 2     # substring must appear in >= this many word tokens
UNI_VOCAB = 2000     # final vocabulary cap (top pieces by probability)
UNI_EM_ROUNDS = 2    # Viterbi-EM rounds (hard-EM: deterministic, no forward
#                      sampling — ties break on fewer pieces then lexicographic)


def _viterbi_segment(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize total
    log-prob; ties broken by FEWER pieces, then lexicographically on the
    piece sequence — fully deterministic.  Unknown single chars get a
    large-but-finite penalty so every word segments."""
    n = len(word)
    UNK = -100.0
    # best[i] = (score, n_pieces, pieces_tuple) for word[:i]
    best: list[tuple[float, int, tuple[str, ...]]] = [(0.0, 0, ())] + [
        (float("-inf"), 0, ())
    ] * n
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - UNI_MAX_PIECE), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) > 1:
                    continue
                lp = UNK
            prev = best[j]
            if prev[0] == float("-inf"):
                continue
            c = (prev[0] + lp, prev[1] + 1, prev[2] + (piece,))
            if (
                cand is None
                or c[0] > cand[0]
                or (c[0] == cand[0] and (c[1], c[2]) < (cand[1], cand[2]))
            ):
                cand = c
        best[i] = cand if cand is not None else (float("-inf"), 0, ())
    return list(best[n][2])


def train_unigram_lm(
    word_counts: dict[str, int],
    vocab_cap: int = UNI_VOCAB,
    em_rounds: int = UNI_EM_ROUNDS,
) -> dict[str, float]:
    """Induce a unigram-LM piece vocabulary from a (word -> count) table.

    Clean-room simplification of Kudo 2018: seed with all substrings up to
    UNI_MAX_PIECE chars whose corpus frequency (weighted by word count)
    reaches UNI_SEED_MIN, plus every single character (coverage floor);
    then hard-EM — each round Viterbi-segments every word TYPE under the
    current probabilities, re-estimates piece probabilities from the
    weighted usage counts, drops unused multi-char pieces, and caps to the
    top ``vocab_cap`` pieces (ties lexicographic).  Runs entirely on the
    bounded word-type vocabulary, never the corpus, mirroring the BPE
    trainer's scale contract."""
    import math

    seed: dict[str, int] = {}
    for w, c in word_counts.items():
        for i in range(len(w)):
            for ln in range(1, min(UNI_MAX_PIECE, len(w) - i) + 1):
                piece = w[i : i + ln]
                seed[piece] = seed.get(piece, 0) + c
    pieces = {
        p: c for p, c in seed.items() if c >= UNI_SEED_MIN or len(p) == 1
    }
    total = sum(pieces.values()) or 1
    logp = {p: math.log(c / total) for p, c in pieces.items()}
    for _ in range(em_rounds):
        usage: dict[str, int] = {}
        for w, c in word_counts.items():
            for piece in _viterbi_segment(w, logp):
                usage[piece] = usage.get(piece, 0) + c
        # coverage floor: single chars survive even when unused this round
        for p in list(logp):
            if len(p) == 1 and p not in usage:
                usage[p] = 1
        kept = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
        total = sum(c for _, c in kept) or 1
        logp = {p: math.log(c / total) for p, c in kept}
    return logp


@register(
    "unigram_token_count",
    oracle=None,  # pandas-UDF Viterbi encode → rows-only driver check; the
    # trainer/encoder are pinned by tests/test_tokenizer.py golden cases
    doc=f"Unigram-LM subword token counts (clean-room after Kudo 2018): "
    f"substring-seeded vocabulary, {UNI_EM_ROUNDS} deterministic hard-EM "
    f"rounds on the bounded top-{VOCAB_CAP} word-type table, capped at "
    f"{UNI_VOCAB} pieces, Viterbi encoding broadcast to an Arrow-batched "
    "pandas UDF with per-batch word caching — the probabilistic sibling "
    "of bpe_token_count (same scale contract: corpus touched once for "
    "the type table, once for encoding).",
    tags=("tokenizer", "text", "udf"),
)
def unigram_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    logp = train_unigram_lm({r["w"]: r["c"] for r in counts})
    b_logp = spark.sparkContext.broadcast(logp)

    @F.pandas_udf("int")
    def n_uni_tokens(texts: pd.Series) -> pd.Series:
        lp = b_logp.value
        cache: dict[str, int] = {}
        out = []
        for t in texts:
            n = 0
            for w in (t or "").lower().split():
                if w not in cache:
                    cache[w] = len(_viterbi_segment(w, lp))
                n += cache[w]
            out.append(n)
        return pd.Series(out, dtype="int32")

    return (
        docs.select(
            "doc_id",
            F.size(F.expr(r"filter(split(lower(text), '\\s+'), t -> t <> '')")).alias("n_words"),
            n_uni_tokens(F.col("text")).alias("n_unigram_tokens"),
        )
        .orderBy("doc_id")
    )
