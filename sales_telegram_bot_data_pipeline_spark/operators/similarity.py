"""Similarity search over the embeddings table (array<float>, dim 64).

Brute-force cosine top-k is the exactness baseline: broadcast the (small)
query side, compute dot/norms JVM-side with array lambdas, rank per query.
At 100 TB the corpus side stays partitioned (never collected), the query
side is broadcast, and the per-partition top-k folds before the final k-way
merge — the plan below already has that shape (window over query_id after a
broadcast nested-loop of 5 rows x corpus).

The scale path (IVF / LSH-bucketed ANN) lands in a later round; its
candidate generation reuses dedup.py's banding machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.dialect import DUCKDB, SPARK, Dialect
from ..registry import register
from ..sources.tables import load_table

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5


def _emb_view(spark: SparkSession, sf_dir: str, name: str = "sales_telegram_bot_data_pipeline_emb") -> str:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(name)
    return name


def _dots(d: Dialect, a: str, b: str) -> str:
    """Σ aᵢ·bᵢ over double-cast arrays, sequential accumulation."""
    if d.name == "spark":
        prods = f"zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double))"
        return f"aggregate({prods}, cast(0 as double), (acc, v) -> acc + v)"
    return f"list_sum(list_transform(generate_series(1, len({a})), i -> cast({a}[i] as double) * cast({b}[i] as double)))"


def _knn_sql(d: Dialect, table: str) -> str:
    dot = _dots(d, "q.embedding", "c.embedding")
    qq = _dots(d, "q.embedding", "q.embedding")
    cc = _dots(d, "c.embedding", "c.embedding")
    cosine = f"round(({dot}) / (sqrt({qq}) * sqrt({cc})), 6)"
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cosine} AS cosine
  FROM {table} q JOIN {table} c
    ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine, rank
FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) t
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


@register(
    "knn_cosine_bruteforce",
    oracle=_knn_sql(DUCKDB, "embeddings"),
    doc="Brute-force cosine top-k: 5 broadcast query vectors vs the corpus, "
    "JVM-side array lambdas for dot/norm, per-query ranking window with "
    "deterministic tie-break.",
    tags=("similarity", "topk"),
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_knn_sql(SPARK, _emb_view(spark, sf_dir)))


def _pair_sim_sql(d: Dialect, table: str) -> str:
    """Embedding-cosine near-dup: pairs above a high threshold."""
    dot = _dots(d, "a.embedding", "b.embedding")
    aa = _dots(d, "a.embedding", "a.embedding")
    bb = _dots(d, "b.embedding", "b.embedding")
    cosine = f"round(({dot}) / (sqrt({aa}) * sqrt({bb})), 6)"
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cosine} AS cosine
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE a.vec_id < 40 AND b.vec_id < 40 AND ({cosine}) >= 0.3
ORDER BY vec_a, vec_b
"""


def _sign_bucket(d: Dialect, emb: str, bits: int = 8) -> str:
    """Random-hyperplane-style LSH bucket from the signs of the first
    ``bits`` dimensions — portable (pure element comparisons), and the
    partition key of the scale path: candidates shuffle by bucket, so each
    query probes one bucket instead of the whole corpus."""
    terms = " + ".join(
        f"(CASE WHEN cast({d.get1(emb, i + 1)} as double) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def _knn_lsh_sql(d: Dialect, table: str) -> str:
    dot = _dots(d, "q.embedding", "c.embedding")
    qq = _dots(d, "q.embedding", "q.embedding")
    cc = _dots(d, "c.embedding", "c.embedding")
    cosine = f"round(({dot}) / (sqrt({qq}) * sqrt({cc})), 6)"
    qb = _sign_bucket(d, "q.embedding")
    cb = _sign_bucket(d, "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cosine} AS cosine
  FROM {table} q JOIN {table} c
    ON {qb} = {cb} AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine, rank
FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) t
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


@register(
    "knn_cosine_lsh_bucketed",
    oracle=_knn_lsh_sql(DUCKDB, "embeddings"),
    doc="ANN scale path: sign-sketch LSH bucketing (8 hyperplane bits) — "
    "the corpus partitions by bucket, each query probes only its bucket "
    "(≈1/256 of the data), then exact cosine ranks the candidates. "
    "Approximate by construction; oracle runs the same approximation.",
    tags=("similarity", "lsh", "topk"),
)
def knn_cosine_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_knn_lsh_sql(SPARK, _emb_view(spark, sf_dir)))


@register(
    "embedding_cosine_neardup",
    oracle=_pair_sim_sql(DUCKDB, "embeddings"),
    doc="Embedding-cosine near-duplicate pairs (cosine >= 0.3 — threshold "
    "chosen so the synthetic embeddings yield non-trivial output) over a "
    "bounded slice — the embedding-space variant of the dedup family.",
    tags=("similarity", "dedup"),
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_pair_sim_sql(SPARK, _emb_view(spark, sf_dir)))
