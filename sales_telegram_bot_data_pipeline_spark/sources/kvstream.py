"""Python STREAMING DataSource: a replayable KV change feed, modeling a
DynamoDB-Streams-style CDC tail on the reference's detected_data/valid_file
tables (README.md:71-74 — the tables `sources/kvsource.py` scans as a batch
connector; this is their change-log twin, completing the connector matrix:
batch read + batch write + streaming read).

Spark 4's `SimpleDataSourceStreamReader` contract and how this source meets
it:

- ``initialOffset`` -> ``{"index": 0}``: offsets are plain dicts; ours is a
  single monotonically-increasing sequence number into the feed.
- ``read(start)`` returns (rows, nextOffset): each micro-batch advances by
  at most ``batch_size`` records, never past ``max_records`` — a finite
  feed, so ``query.processAllAvailable()`` drains it and returns.
  (``Trigger.AvailableNow`` snapshots only the driver-prefetched batch for
  simple stream readers — measured: 64 of 300 rows — so the drain contract
  is processAllAvailable, pinned in the test.)
- ``readBetweenOffsets(start, end)`` REPLAYS a committed range after
  restart: exactly-once depends on regeneration being deterministic, so
  change records derive from the sequence number alone (md5-mixed fields,
  no RNG, no wall clock) — the same offsets always yield the same rows.

Scale shape: the simple-reader variant executes the read on the DRIVER and
is the prototyping tier (right for a change tail whose per-batch volume is
bounded); a partition-parallel feed would promote to the full
``DataSourceStreamReader`` with per-partition offsets, the same move the
batch connector makes with scan segments.  A real deployment swaps
``_record_at`` for the stream-shard SDK iterator without touching the
Spark-facing protocol class.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

KVSTREAM_SCHEMA = (
    "seq bigint, filename string, shop_name string, op string, valid boolean"
)
_SHOPS = ("albert", "billa", "tesco", "lidl", "penny")
_OPS = ("INSERT", "MODIFY", "REMOVE")
DEFAULT_BATCH = 100
DEFAULT_MAX = 1000


def _record_at(i: int) -> tuple:
    """Deterministic change record for sequence number ``i`` — the
    replayability seam (a real feed reads its shard iterator here)."""
    h = int(hashlib.md5(f"kvstream|{i}".encode()).hexdigest()[:15], 16)
    return (
        i,
        f"pages/valid/part_{h % 997}_page_{1 + h % 3}.png",
        _SHOPS[h % len(_SHOPS)],
        _OPS[(h >> 8) % len(_OPS)],
        bool((h >> 16) % 2),
    )


class KVStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.batch_size = int(options.get("batchsize", DEFAULT_BATCH))
        self.max_records = int(options.get("maxrecords", DEFAULT_MAX))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        lo = int(start["index"])
        hi = min(lo + self.batch_size, self.max_records)
        return iter([_record_at(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_record_at(i) for i in range(int(start["index"]), int(end["index"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing to acknowledge: the synthetic feed has no broker state


class KVStreamDataSource(DataSource):
    """spark.readStream.format("kvstream") after
    spark.dataSource.register(KVStreamDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "kvstream"

    def schema(self) -> str:
        return KVSTREAM_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> KVStreamReader:
        return KVStreamReader(self.options)
