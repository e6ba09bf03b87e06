"""Scale utilities: salted joins for skewed keys and MERGE-style upsert.

These are the knobs a 100 TB deployment reaches for when AQE's automatic
skew splitting isn't enough (extremely hot keys) or when a key-value sink
needs snapshot semantics instead of append.

- ``salted_join``: explode the small/dim side into SALT copies, scatter the
  skewed fact side across salts, equi-join on (key, salt).  Result is
  row-identical to the plain join; the hot key's rows now spread over SALT
  reducers instead of one.
- ``merge_upsert``: last-write-wins MERGE of an updates batch into a base
  snapshot by key (full-outer-join + coalesce) — the batch-table shape of
  the idempotent KV sink (sinks/kv.py); swap in Delta/Iceberg MERGE INTO on
  a cluster with a table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with salt-scattered shuffle.

    The fact side gets a deterministic pseudo-random salt per row (hash of
    the full row via monotonically increasing id is NOT deterministic across
    retries — use a content hash of the key + a cheap row discriminator when
    exact retry-stability matters; here pmod(hash(all columns)) suffices for
    batch jobs).  The dim side replicates each row SALT times.
    """
    fact_s = fact.withColumn("__salt", F.pmod(F.hash(*fact.columns), F.lit(salt)))
    dim_s = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = fact_s.join(dim_s, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 16) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key`` — the 100 TB
    co-location move: two tables bucketed the same way join WITHOUT any
    Exchange, because each scan task already holds exactly one bucket of
    each side's key space.  On a petabyte fact table this converts every
    recurring join/aggregation on the bucket key from a full shuffle into a
    local merge (amortize one layout write across all downstream reads).

    Plan-asserted in tests/test_plans.py::test_bucketed_join_has_no_exchange."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE: rows in ``updates`` replace same-key rows in ``base``; unmatched
    rows pass through (WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT)."""
    cols = [c for c in base.columns if c != key]
    u = updates.select(key, *[F.col(c).alias(f"__u_{c}") for c in cols]).withColumn(
        "__present", F.lit(True)
    )
    joined = base.join(u, on=key, how="full_outer")
    picked = [
        F.when(F.col("__present"), F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c) for c in cols
    ]
    return joined.select(key, *picked)
