"""Property tests for the round-6 second batch: BFS hop distances, the
bucketed epsilon band join, the Misra-Gries candidate-superset guarantee
(adversarial, vocabulary >> capacity), and MMR re-ranking invariants."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sales_telegram_bot_data_pipeline_spark.operators.analytics import (
    BAND_EPS,
    band_join_price_neighbors,
)
from sales_telegram_bot_data_pipeline_spark.operators.curation import (
    MG_CAPACITY,
    MG_TOPK,
    misra_gries_topk,
)
from sales_telegram_bot_data_pipeline_spark.operators.dedup import (
    BFS_MAX_HOPS,
    BFS_SEED_MOD,
    graph_bfs_hops,
)
from sales_telegram_bot_data_pipeline_spark.operators.retrieval import (
    MMR_K,
    mmr_diversified_topk,
)
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_bfs_seeds_at_zero_and_bounded(spark):
    rows = graph_bfs_hops(spark, SF_SMOKE).collect()
    dist = {r.doc_id: r.hops for r in rows}
    seeds = {
        r.doc_id
        for r in load_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") % BFS_SEED_MOD == 0)
        .collect()
    }
    assert seeds, "sf0.001 must contain at least one seed"
    assert all(dist[s] == 0 for s in seeds)
    assert all(0 <= h <= BFS_MAX_HOPS for h in dist.values())
    # non-seeds can only be reached via an edge
    assert all(d == 0 for i, d in dist.items() if i in seeds)


def test_band_join_gap_within_epsilon(spark):
    rows = band_join_price_neighbors(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 must produce at least one banded pair"
    for r in rows:
        assert r.n_pairs > 0
        assert 0 <= r.avg_gap <= BAND_EPS + 1e-9


def test_misra_gries_adversarial_superset(spark, tmp_path):
    """Vocabulary ~8x capacity with a planted heavy head: the exact-recount
    output must equal the true top-k even though every partition's summary
    evicts aggressively."""
    d = str(tmp_path / "sf_mg")
    os.makedirs(d)
    n_noise = MG_CAPACITY * 8
    # 40 heavy words appearing 300x each, plus a long unique-ish tail
    heavy = spark.range(40 * 300).select(
        F.concat(F.lit("heavy"), (F.col("id") % 40).cast("string")).alias("w")
    )
    noise = spark.range(n_noise).select(
        F.concat(F.lit("noise"), F.col("id").cast("string")).alias("w")
    )
    docs = (
        heavy.unionAll(noise)
        .groupBy((F.monotonically_increasing_id() % 64).alias("g"))
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
        .select(F.col("g").alias("doc_id"), "text")
    )
    docs.repartition(8).write.parquet(os.path.join(d, "documents.parquet"))
    got = [(r.word, r.n) for r in misra_gries_topk(spark, d).collect()]
    truth = [
        (r.word, r.n)
        for r in spark.read.parquet(os.path.join(d, "documents.parquet"))
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(MG_TOPK)
        .collect()
    ]
    assert got == truth


def test_mmr_invariants(spark):
    rows = mmr_diversified_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= MMR_K
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len({r.vec_id for r in rows}) == len(rows)
    # first pick is pure relevance
    assert rows[0].mmr_score == rows[0].relevance
    # marginal scores are non-increasing down the ranking
    scores = [r.mmr_score for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))
    # deterministic under re-run
    again = mmr_diversified_topk(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]
