"""Salted-join equivalence and MERGE-upsert semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_telegram_bot_data_pipeline_spark.operators.scale import merge_upsert, salted_join
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    # a deliberately skewed dim: nation-sized key domain
    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = orders.join(cust, on="o_custkey").groupBy("c_nationkey").count()
    salted = salted_join(orders, cust, key="o_custkey").groupBy("c_nationkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, "X")], "k int, w string")
    out = salted_join(left, right, key="k", how="left").collect()
    by_k = {r["k"]: r["w"] for r in out}
    assert len(out) == 3 and by_k[1] == "X" and by_k[2] is None


def test_merge_upsert(spark):
    base = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "k int, s string, x double")
    updates = spark.createDataFrame([(2, "B", 99.0), (3, "c", 30.0)], "k int, s string, x double")
    out = {r["k"]: (r["s"], r["x"]) for r in merge_upsert(base, updates, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0)}
    # idempotent: merging the same batch again changes nothing
    twice = merge_upsert(merge_upsert(base, updates, "k"), updates, "k")
    assert {r["k"]: (r["s"], r["x"]) for r in twice.collect()} == out


def test_multiband_ann_recall_superset_of_single_band(spark):
    """Union-of-bands candidates ⊇ any single band's, so multi-band recall
    vs brute force can only improve; measure both and assert the ordering
    plus a sane floor for the banded operator on testdata."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["knn_cosine_bruteforce"].fn(spark, sf).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["knn_cosine_lsh_bucketed"].fn(spark, sf).collect()
    }
    recall = len(brute & multi) / len(brute)
    assert len(multi) > 0 and recall >= 0.2, f"multi-band recall {recall}"


def test_ivf_ann_recall_vs_bruteforce(spark):
    """IVF probes nprobe/K of the corpus; neighbors in unprobed lists are
    the (intended) approximation. Assert the result is non-empty, every IVF
    hit is a real corpus vector scored with the same exact cosine (IVF ⊆
    the brute-force candidate universe by construction), and recall clears
    a floor on testdata."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["knn_cosine_bruteforce"].fn(spark, sf).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["knn_cosine_ivf"].fn(spark, sf).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert len(ivf) > 0 and recall >= 0.2, f"IVF recall {recall}"


def test_stopshingle_jaccard_recall_vs_full(spark):
    """Stop-shingle candidate gen can only MISS pairs vs the full inverted
    index (refine is identical), never invent or mis-score them; on
    testdata the true near-dup pairs share rare shingles, so nothing is
    lost at all."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    full = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, sf).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in REGISTRY["dedup_jaccard_stopshingle"].fn(spark, sf).collect()
    }
    assert capped <= full
    assert capped == full  # no recall loss on testdata (verified property)


def test_neardup_banded_pairs_are_subset_of_exact(spark):
    """Banded near-dup can only MISS pairs vs exact all-pairs (same
    threshold), never invent them — check on the bounded slice where the
    exact baseline exists."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["embedding_cosine_allpairs_small"].fn(spark, sf).collect()
    }
    banded_all = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["embedding_cosine_neardup"].fn(spark, sf).collect()
    }
    banded_slice = {(a, b) for a, b in banded_all if a < 40 and b < 40}
    assert banded_slice <= exact


def test_simhash_neardup_full_recall_and_minhash_overlap(spark):
    """The pigeonhole block scheme is EXACT at Hamming <= k: the
    fingerprint-level output must equal a brute-force all-pairs reference
    over the same fingerprints (a pair differing in <= k bits shares at
    least one of k+1 blocks), including duplicate-group rows and doc-pair
    counts.  Also pin that MinHash ground-truth near-dups whose
    fingerprints are within k are represented."""
    from itertools import combinations

    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401
    from sales_telegram_bot_data_pipeline_spark.operators.dedup import (
        HAMMING_K,
        SIMHASH_BITS,
        _simhash_sql,
    )
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    blocked = {
        (r["doc_a"], r["doc_b"]): (r["hamming"], r["n_pairs"])
        for r in REGISTRY["simhash_neardup"].fn(spark, sf).collect()
    }

    # brute-force reference: fingerprints in Python, grouped by value
    load_table(spark, sf, "documents").createOrReplaceTempView("snd_docs")
    sim = _simhash_sql(SPARK, "snd_docs", bits=SIMHASH_BITS)
    fp = {r["doc_id"]: r["simhash"] for r in spark.sql(sim).collect()}
    groups: dict = {}
    for doc, s in fp.items():
        groups.setdefault(s, []).append(doc)
    reps = {s: (min(docs), len(docs)) for s, docs in groups.items()}
    brute = {}
    for s, (rep, n) in reps.items():
        if n >= 2:
            brute[(rep, rep)] = (0, n * (n - 1) // 2)
    for sa, sb in combinations(reps, 2):
        h = bin(sa ^ sb).count("1")
        if h <= HAMMING_K:
            (ra, na), (rb, nb) = reps[sa], reps[sb]
            brute[(min(ra, rb), max(ra, rb))] = (h, na * nb)
    assert blocked == brute  # full recall + identical counts

    minhash = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, sf).collect()
    }
    close = 0
    for a, b in minhash:
        sa, sb = fp[a], fp[b]
        if bin(sa ^ sb).count("1") <= HAMMING_K:
            close += 1
            ra, rb = reps[sa][0], reps[sb][0]
            assert (min(ra, rb), max(ra, rb)) in blocked
    assert close  # some ground-truth near-dups are Hamming-close


def test_connected_components_matches_union_find(spark):
    """The iterative min-label propagation must produce exactly the
    components a plain union-find computes on the collected pair list."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        r["doc_id"]: r["cluster_rep"]
        for r in REGISTRY["dedup_connected_components"].fn(spark, sf).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, sf).collect()
    ]
    parent = {d: d for d in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in got}
    assert got == want
    # sanity: clustering is non-trivial on testdata
    assert any(rep != d for d, rep in got.items())


def test_standardize_embeddings_grouped_map(spark):
    """applyInPandas whitening: per (label, dim) the standardized corpus
    must have ~zero mean and ~unit variance, row count and ids preserved."""
    from pyspark.sql import functions as F

    from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
        standardize_embeddings_by_label,
    )
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    out = standardize_embeddings_by_label(spark, SF_SMOKE)
    src = load_table(spark, SF_SMOKE, "embeddings")
    assert out.count() == src.count()
    stats = (
        out.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd"))
        .agg(F.max(F.abs("mu")).alias("worst_mu"),
             F.max(F.abs(F.col("sd") - 1)).alias("worst_sd"))
        .collect()[0]
    )
    assert stats["worst_mu"] < 1e-5
    assert stats["worst_sd"] < 1e-3


def test_sq8_ann_recall_vs_bruteforce(spark):
    """SQ8 scans the full pair universe with int8 codes, then reranks the
    top candidates at full precision — int8 quantization error on 64-dim
    vectors is small, so recall@k against brute force should be near-exact
    (well above the banded/IVF floors)."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["knn_cosine_bruteforce"].fn(spark, sf).collect()
    }
    sq8 = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["knn_cosine_sq8"].fn(spark, sf).collect()
    }
    recall = len(brute & sq8) / len(brute)
    assert len(sq8) == len(brute) and recall >= 0.8, f"SQ8 recall {recall}"


def test_duplicate_spans_structure(spark):
    """Structural invariants of the span detector on the fixture corpus
    (which has near-dup docs but no byte-identical pairs): duplication is
    mutual (≥2 docs flagged), some doc is FULLY duplicated (its near-dup
    twin shares every window: dup_frac = 1.0 ⇔ max_dup_run = n_grams), and
    per-row bounds hold (runs ≤ dup grams ≤ grams)."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    rows = REGISTRY["dedup_duplicate_spans"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert 0 <= r["max_dup_run"] <= r["n_dup_grams"] <= r["n_grams"]
        assert (r["dup_frac"] == 1.0) == (r["n_dup_grams"] == r["n_grams"])
    flagged = [r for r in rows if r["n_dup_grams"] > 0]
    assert len(flagged) >= 2  # a duplicated span needs two carriers
    assert any(r["dup_frac"] == 1.0 for r in flagged)  # full near-dup twins


def test_standardize_arrow_matches_pandas(spark):
    """applyInArrow twin must reproduce the applyInPandas whitening
    bit-for-bit (same float64 kernel, float32 emission)."""
    from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
        standardize_embeddings_by_label,
        standardize_embeddings_by_label_arrow,
    )

    sf = "/root/testdata/sf0.01"
    pd_rows = {r["vec_id"]: r for r in standardize_embeddings_by_label(spark, sf).collect()}
    ar_rows = {r["vec_id"]: r for r in standardize_embeddings_by_label_arrow(spark, sf).collect()}
    assert set(pd_rows) == set(ar_rows)
    for vid, pr in pd_rows.items():
        ar = ar_rows[vid]
        assert pr["label"] == ar["label"]
        assert pr["embedding"] == ar["embedding"], vid


def test_pagerank_invariants(spark):
    """PageRank over the symmetric near-dup graph: node set = edge-touching
    docs of the LSH pair graph; every rank >= the base (1-d) since every
    node has an in-edge; ranks discriminate (hubs of big dup clusters score
    higher than leaf nodes)."""
    from sales_telegram_bot_data_pipeline_spark.registry import REGISTRY
    import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401

    sf = "/root/testdata/sf0.01"
    pr = {r["vec_id"]: r["pagerank"] for r in REGISTRY["pagerank_neardup_graph"].fn(spark, sf).collect()}
    pairs = REGISTRY["embedding_cosine_neardup"].fn(spark, sf).collect()
    touching = {r["vec_a"] for r in pairs} | {r["vec_b"] for r in pairs}
    assert set(pr) == touching
    assert all(v >= 0.15 for v in pr.values())
    # the embedding graph has degree diversity (1..4), so ranks discriminate
    assert len(set(pr.values())) > 1


def test_two_phase_topk_matches_single_window(spark):
    """The salted two-phase per-group top-k must be ROW-identical to the
    single-window form under a total ordering — the bounded-partition
    rewrite source_cap_sample documents for hot sources."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sales_telegram_bot_data_pipeline_spark.operators.scale import two_phase_topk
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    from conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    got = two_phase_topk(orders, "o_custkey", order_cols, k=3, salts=4)
    w = Window.partitionBy("o_custkey").orderBy(*order_cols)
    want = (
        orders.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b and len(a) > 0


def test_two_phase_topk_rejects_reserved_columns(spark):
    import pytest
    from pyspark.sql import functions as F

    from sales_telegram_bot_data_pipeline_spark.operators.scale import two_phase_topk

    df = spark.range(10).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v"), F.lit(1).alias("rank")
    )
    with pytest.raises(ValueError, match="reserved column"):
        two_phase_topk(df, "g", [F.col("v")], 2)


def test_pca_projection(spark):
    """The distributed PCA (mapInPandas Gram partials -> decimal reduce ->
    driver eigh) must match a single-node numpy PCA running the SAME
    quantized pipeline exactly: integer sums make the covariance matrix
    independent of partitioning, so the eigensolve inputs are bit-identical
    and the rounded projections must be equal, not just close."""
    import numpy as np

    from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
        PCA_UNITS,
        embedding_pca_project,
    )
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    got = {r.vec_id: (r.pc1, r.pc2) for r in embedding_pca_project(spark, sf_dir).collect()}

    rows = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.vstack([r.embedding for r in rows]).astype("float64")
    q = np.rint(x * PCA_UNITS).astype("int64")
    n = len(q)
    S = (q.T @ q).astype("float64")
    colsum = q.sum(axis=0).astype("float64")
    mu = colsum / (n * PCA_UNITS)
    cov = S / (n * PCA_UNITS**2) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :2]
    for k in range(2):
        pivot = int(np.argmax(np.abs(comps[:, k])))
        if comps[pivot, k] < 0:
            comps[:, k] = -comps[:, k]
    want_mat = np.round((x - mu) @ comps, 6)
    want = {int(i): (w[0], w[1]) for i, w in zip(ids, want_mat)}
    assert got == want
    # eigenvalue ordering surfaces as projected variance ordering
    pcs = np.array([got[i] for i in sorted(got)])
    assert pcs[:, 0].var() >= pcs[:, 1].var()


def test_pca_flush_on_headroom_is_exact(spark):
    """The overflow guard's flush path must be VALUE-NEUTRAL: shrinking the
    int64 headroom so the accumulator flushes partials every couple of
    Arrow batches (and shrinking the Arrow batch size so partitions hold
    several batches) must reproduce the default model bit-for-bit — extra
    partials are absorbed exactly by the DECIMAL(38,0) reduce."""
    import numpy as np

    from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
        PCA_UNITS,
        _pca_model,
    )
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    mu_a, c_a = _pca_model(spark, sf_dir)

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    amax = max(
        1,
        int(
            round(
                emb.selectExpr(
                    "max(aggregate(embedding, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))) AS m"
                ).collect()[0]["m"]
                * PCA_UNITS
            )
        ),
    )
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
        # headroom admits ~120 rows per accumulated partial: each 50-row
        # batch passes the single-batch guard, and the accumulator flushes
        # after every second batch
        mu_b, c_b = _pca_model(spark, sf_dir, headroom=120 * amax * amax)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
    np.testing.assert_array_equal(mu_a, mu_b)
    np.testing.assert_array_equal(c_a, c_b)


def test_pca_single_batch_overflow_raises(spark):
    """A single Arrow batch that could wrap numpy's int64 matmul must fail
    LOUDLY (ValueError from the executor), never corrupt the covariance
    silently."""
    import pytest

    from sales_telegram_bot_data_pipeline_spark.operators.similarity import _pca_model

    with pytest.raises(Exception, match="overflow int64 within one batch"):
        _pca_model(spark, "/root/testdata/sf0.001", headroom=1)
