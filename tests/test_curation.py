"""Semantic checks for dataset-curation operators beyond the oracle match:
split totality/determinism, stratified-rate ordering, contamination hit
validity, and a hand-computed repetition fixture."""

from __future__ import annotations

from sales_telegram_bot_data_pipeline_spark.operators.curation import (
    EN_RATE_PERMILLE,
    OTHER_RATE_PERMILLE,
    dataset_hash_split,
    quality_repetition,
    stratified_sample,
)
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_ORACLE


def test_hash_split_total_and_bounded(spark):
    rows = {r["split_name"]: r for r in dataset_hash_split(spark, SF_ORACLE).collect()}
    assert set(rows) == {"train", "val", "test"}
    n_total = sum(r["n_docs"] for r in rows.values())
    assert n_total == load_table(spark, SF_ORACLE, "documents").count()
    # hash buckets are uniform-ish: train ~80% should dominate both tails
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]


def test_stratified_sample_deterministic_and_rate_ordered(spark):
    a = stratified_sample(spark, SF_ORACLE).collect()
    b = stratified_sample(spark, SF_ORACLE).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]  # no RNG state

    docs = load_table(spark, SF_ORACLE, "documents")
    n_en_corpus = docs.filter("lang = 'en'").count()
    n_other_corpus = docs.count() - n_en_corpus
    n_en_kept = sum(1 for r in a if r["lang"] == "en")
    n_other_kept = len(a) - n_en_kept
    # realized rates land near the configured per-mille thresholds
    assert abs(n_en_kept / n_en_corpus - EN_RATE_PERMILLE / 1000) < 0.08
    assert abs(n_other_kept / n_other_corpus - OTHER_RATE_PERMILLE / 1000) < 0.08
    assert n_other_kept / n_other_corpus > n_en_kept / n_en_corpus


def test_repetition_fractions_bounded(spark):
    rows = quality_repetition(spark, SF_ORACLE).collect()
    assert rows, "documents table produced no repetition rows"
    for r in rows:
        assert 0 < r["top_word_frac"] <= 1
        if r["top_bigram_frac"] is not None:
            assert 0 < r["top_bigram_frac"] <= 1
            assert 0 <= r["dup_bigram_frac"] <= 1
            # the top bigram is itself repeated iff dup mass is nonzero
            if r["dup_bigram_frac"] == 0:
                assert r["top_bigram_frac"] <= 0.5 + 1e-9 or r["n_words"] <= 3


def test_repetition_hand_fixture(spark):
    df = spark.createDataFrame(
        [(1, "buy now buy now buy now"), (2, "all words here differ fully")],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("fixture_docs")
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK
    from sales_telegram_bot_data_pipeline_spark.operators.curation import _repetition_sql

    out = {r["doc_id"]: r for r in spark.sql(_repetition_sql(SPARK, "fixture_docs")).collect()}
    # doc 1: 6 words, "buy"x3 -> 0.5; bigrams: 5 total, "buy now"x3, "now buy"x2 -> all repeated
    assert out[1]["n_words"] == 6
    assert out[1]["top_word_frac"] == 0.5
    assert out[1]["top_bigram_frac"] == 0.6
    assert out[1]["dup_bigram_frac"] == 1.0
    # doc 2: no repetition at all
    assert out[2]["top_word_frac"] == 0.2
    assert out[2]["top_bigram_frac"] == 0.25
    assert out[2]["dup_bigram_frac"] == 0.0


def test_chunking_boundaries_hand_fixture(spark):
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK
    from sales_telegram_bot_data_pipeline_spark.operators.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        _chunking_sql,
    )

    n = CHUNK_TOKENS + CHUNK_STRIDE // 2  # tail chunk adds tokens -> kept
    short = CHUNK_TOKENS - 2  # second start would add nothing -> dropped
    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(n))),
            (2, " ".join(f"w{i}" for i in range(short))),
            (3, "solo"),
        ],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("fixture_chunk_docs")
    rows = spark.sql(_chunking_sql(SPARK, "fixture_chunk_docs")).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 1: two chunks; chunk 0 full-size, chunk 1 overlaps by CHUNK-STRIDE
    assert [r["chunk_idx"] for r in by_doc[1]] == [0, 1]
    assert by_doc[1][0]["n_tokens"] == CHUNK_TOKENS
    assert by_doc[1][1]["n_tokens"] == n - CHUNK_STRIDE
    first_words = by_doc[1][0]["chunk_text"].split()
    second_words = by_doc[1][1]["chunk_text"].split()
    assert first_words[CHUNK_STRIDE:] == second_words[: CHUNK_TOKENS - CHUNK_STRIDE]
    # every token is covered by some chunk
    covered = set(first_words) | set(second_words)
    assert covered == {f"w{i}" for i in range(n)}

    # doc 2: the redundant tail start is dropped
    assert [r["chunk_idx"] for r in by_doc[2]] == [0]
    assert by_doc[2][0]["n_tokens"] == short

    # doc 3: single-token doc yields exactly one 1-token chunk
    assert [(r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in by_doc[3]] == [(0, 1, "solo")]


def test_pii_redaction_counts_and_scrub(spark):
    from sales_telegram_bot_data_pipeline_spark.operators.curation import pii_redaction

    rows = pii_redaction(spark, SF_ORACLE).collect()
    assert rows
    for r in rows[:50]:
        # the injector appends exactly 2 emails, 1 phone, 1 ip per row
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (2, 1, 1)
        assert "[EMAIL]" in r["redacted"] and "[PHONE]" in r["redacted"] and "[IP]" in r["redacted"]
        assert "@" not in r["redacted"]
        assert "+420" not in r["redacted"]


def test_embedding_centroids_shape(spark):
    from sales_telegram_bot_data_pipeline_spark.operators.similarity import embedding_centroids
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    rows = embedding_centroids(spark, SF_ORACLE).collect()
    emb = load_table(spark, SF_ORACLE, "embeddings")
    assert len(rows) == emb.select("label").distinct().count()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    dim = len(emb.first()["embedding"])
    for r in rows:
        assert len(r["centroid"]) == dim
        # synthetic N(0,·) clusters: per-dim means are small but not all zero
        assert all(abs(v) < 1.0 for v in r["centroid"])
        assert any(v != 0.0 for v in r["centroid"])


def test_sequence_packing_shard_count_derives_from_corpus(spark):
    """The docstring's 'shard count scales with the corpus' must be
    structural: at 500 docs and PACK_TARGET_DOCS_PER_SHARD=125 the window
    partitions into exactly ceil(500/125)=4 shards, all populated."""
    import math

    from sales_telegram_bot_data_pipeline_spark.operators.curation import (
        PACK_TARGET_DOCS_PER_SHARD,
        sequence_packing,
    )
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    n_docs = load_table(spark, sf, "documents").count()
    want = max(1, math.ceil(n_docs / PACK_TARGET_DOCS_PER_SHARD))
    shards = {r["shard"] for r in sequence_packing(spark, sf).select("shard").distinct().collect()}
    assert shards == set(range(want))


def test_cdc_chunks_edit_stability(spark):
    """The content-defined chunker's reason to exist: inserting a word
    mid-document must leave every chunk BEFORE the edited chunk untouched
    (same chunk hash), where fixed-stride chunking would shift every later
    boundary.  Build the same doc with and without a mid-doc insertion and
    compare per-chunk hashes up to the edit point."""
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK as _S
    from sales_telegram_bot_data_pipeline_spark.operators.curation import _cdc_sql

    base_words = [f"w{i}token" for i in range(400)]
    edited_words = base_words[:200] + ["INSERTEDZZZ"] + base_words[200:]
    spark.createDataFrame(
        [(1, " ".join(base_words)), (2, " ".join(edited_words))],
        "doc_id long, text string",
    ).createOrReplaceTempView("cdc_edit_docs")
    rows = spark.sql(_cdc_sql(_S, "cdc_edit_docs")).collect()
    orig = sorted((r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_id"])
    edit = sorted((r for r in rows if r["doc_id"] == 2), key=lambda r: r["chunk_id"])

    # which chunk of the original contains the insertion point (pos 201)?
    edit_chunk = next(i for i, r in enumerate(orig) if r["first_pos"] <= 201 <= r["last_pos"])
    assert edit_chunk > 0, "need a prefix chunk before the edit to compare"
    for i in range(edit_chunk):
        assert orig[i]["chunk_hash"] == edit[i]["chunk_hash"]
        assert orig[i]["n_tokens"] == edit[i]["n_tokens"]
    # and the edit really changed the touched chunk
    assert orig[edit_chunk]["chunk_hash"] != edit[edit_chunk]["chunk_hash"]


def test_compression_ratio_matches_direct_zlib(spark):
    """The mapInPandas compressor must agree byte-for-byte with direct
    zlib calls on the same text (REAL compression, not a stub)."""
    import zlib

    from sales_telegram_bot_data_pipeline_spark.operators.curation import compression_ratio

    rows = [(1, "natural prose with varied words and structure here"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for doc_id, text in rows:
        want = len(zlib.compress(text.encode("utf-8"), 6))
        assert got[doc_id]["compressed_len"] == want
        assert got[doc_id]["raw_len"] == len(text.encode("utf-8"))
    # the quality signal orders as designed: boilerplate < prose
    assert got[2]["compression_ratio"] < got[1]["compression_ratio"]


def test_table_checksum_invariant_under_repartitioning(spark):
    """The anti-entropy checksum's core claim: identical under ANY
    partitioning/row order.  Same tables, shuffled into 3 vs 64 partitions
    with opposite sort orders, must produce byte-identical checksum rows."""
    from pyspark.sql import functions as F

    from sales_telegram_bot_data_pipeline_spark.queries import REGISTRY
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    from conftest import SF_ORACLE

    def run(parts, order_col):
        for t in ("lineitem", "orders", "customer"):
            df = load_table(spark, SF_ORACLE, t)
            df.repartition(parts).sortWithinPartitions(order_col[t]).createOrReplaceTempView(
                f"sales_telegram_bot_data_pipeline_cksum_{t}"
            )
        # the registered fn re-registers views from parquet, so rebuild the
        # query on OUR views via the same SQL template
        from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK as _S
        from sales_telegram_bot_data_pipeline_spark.operators.curation import _checksum_sql

        sql = _checksum_sql(_S).format(
            lineitem="sales_telegram_bot_data_pipeline_cksum_lineitem",
            orders="sales_telegram_bot_data_pipeline_cksum_orders",
            customer="sales_telegram_bot_data_pipeline_cksum_customer",
        )
        return sorted(map(tuple, spark.sql(sql).collect()))

    a = run(3, {"lineitem": "l_orderkey", "orders": "o_orderkey", "customer": "c_custkey"})
    b = run(64, {"lineitem": F.desc("l_partkey"), "orders": F.desc("o_custkey"), "customer": F.desc("c_name")})
    assert a == b and len(a) == 3


def test_aes_log_domain_preserves_key_order():
    """A-ES ranks by u^(1/w); the operator ranks by ln(u)/w. The transform
    is order-preserving for u in (0,1], w > 0 — fuzz the equivalence."""
    import math
    import random

    rng = random.Random(20260814)
    pairs = [
        (rng.random() or 1e-12, rng.randint(1, 10_000)) for _ in range(500)
    ]
    by_key = sorted(range(len(pairs)), key=lambda i: pairs[i][0] ** (1.0 / pairs[i][1]))
    by_log = sorted(range(len(pairs)), key=lambda i: math.log(pairs[i][0]) / pairs[i][1])
    assert by_key == by_log


def test_countmin_overcount_guarantee_for_all_words(spark):
    """CMS guarantees estimate >= true count for EVERY key (not just the
    top-20 the registered audit emits): join full exact counts against the
    sketch point queries and assert the invariant corpus-wide."""
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK as D
    from sales_telegram_bot_data_pipeline_spark.operators.curation import (
        CMS_D,
        CMS_W,
        _doc_view,
    )

    view = _doc_view(spark, "/root/testdata/sf0.001")
    w = D.splitws("lower(text)")
    words_rel = (
        f"SELECT word FROM (SELECT {w} AS ws FROM {view}) s "
        f"LATERAL VIEW explode(ws) t AS word WHERE length(word) > 0"
    )
    bucket = D.md5_prefix_int("('cms' || CAST(i AS STRING) || '|' || word)")
    bad = spark.sql(f"""
        WITH wc AS (SELECT word, COUNT(*) AS cnt FROM ({words_rel}) x GROUP BY word),
        coords AS (
          SELECT word, cnt, i, ({bucket}) % {CMS_W} AS bucket
          FROM wc LATERAL VIEW explode(sequence(0, {CMS_D - 1})) t AS i
        ),
        sketch AS (SELECT i, bucket, SUM(cnt) AS c FROM coords GROUP BY i, bucket),
        est AS (
          SELECT co.word, co.cnt, MIN(s.c) AS e
          FROM coords co JOIN sketch s ON s.i = co.i AND s.bucket = co.bucket
          GROUP BY co.word, co.cnt
        )
        SELECT COUNT(*) AS n_total,
               SUM(CASE WHEN e < cnt THEN 1 ELSE 0 END) AS n_undercount
        FROM est
    """).collect()[0]
    assert bad.n_total > 20  # every distinct corpus word is checked
    assert bad.n_undercount == 0


def test_lpa_two_node_component_one_community(spark):
    """The self-vote golden: an isolated near-dup PAIR — the most common
    cluster shape in a near-dup graph — must collapse to ONE community.
    Without each node voting for its own current label, synchronous LPA
    oscillates on this bipartite component (labels swap every iteration),
    so any even iteration count reports two communities; the oracle can't
    catch that because both engines run the same SQL."""
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK
    from sales_telegram_bot_data_pipeline_spark.operators.dedup import _lpa_sql

    spark.createDataFrame([(10, 20)], "vec_a long, vec_b long").createOrReplaceTempView(
        "sales_telegram_bot_data_pipeline_lpa_golden_pair"
    )
    rows = spark.sql(
        _lpa_sql(
            SPARK,
            "unused_table",
            pairs_rel="SELECT vec_a, vec_b FROM sales_telegram_bot_data_pipeline_lpa_golden_pair",
        )
    ).collect()
    got = {r.vec_id: r.community for r in rows}
    assert got == {10: 10, 20: 10}


def test_lpa_four_cycle_converges_single_community(spark):
    """4-cycle (the textbook bipartite oscillator): with the self-vote and
    min-label tie-break both unrolled iterations are stable and the whole
    cycle lands on the smallest node id."""
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK
    from sales_telegram_bot_data_pipeline_spark.operators.dedup import _lpa_sql

    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "vec_a long, vec_b long"
    ).createOrReplaceTempView("sales_telegram_bot_data_pipeline_lpa_golden_cycle")
    rows = spark.sql(
        _lpa_sql(
            SPARK,
            "unused_table",
            pairs_rel="SELECT vec_a, vec_b FROM sales_telegram_bot_data_pipeline_lpa_golden_cycle",
        )
    ).collect()
    got = {r.vec_id: r.community for r in rows}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
