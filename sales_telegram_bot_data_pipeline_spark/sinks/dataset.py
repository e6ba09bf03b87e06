"""Partitioned dataset export — the corpus-materialization sink.

The reference's outputs are per-shop JSON blobs pushed one file at a time
(README.md:96-99, boto3 put_object per file); a training-data pipeline
instead materializes curated corpora as partitioned parquet: one directory
per partition value (split/lang), a bounded number of files per partition,
and idempotent re-runs.

Scale design (100 TB):
- ``partition_by`` columns become directory partitions — downstream reads
  prune by them for free (partition pruning happens before any I/O);
- file count is controlled by repartitioning on (partition cols, shard)
  BEFORE the write: each task then holds exactly one output file's rows for
  one partition, so a 1000-executor write produces n_shards files per
  partition, not n_executors × n_partitions small files (the classic
  small-files failure);
- re-runs are idempotent via DYNAMIC partition overwrite: only partitions
  present in the incoming DataFrame are replaced; absent partitions keep
  their previous contents.  A full re-run converges to the same layout; an
  incremental run (one split's refresh) touches only that directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "_shard"


def write_dataset(
    df: DataFrame,
    root: str,
    partition_by: tuple[str, ...] = ("split_name",),
    n_shards: int = 4,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by`` with exactly
    ``n_shards`` files per partition value, replacing only the partitions
    present in ``df`` (dynamic overwrite)."""
    key = F.xxhash64(*[F.col(c) for c in df.columns if c not in partition_by][:1])
    sharded = df.withColumn(SHARD_COL, F.pmod(key, F.lit(n_shards)))
    out = sharded.repartition(
        *[F.col(c) for c in partition_by], F.col(SHARD_COL)
    ).drop(SHARD_COL)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(root)
    )
