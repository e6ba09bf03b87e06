"""Python DataSource V2 connector (sources/kvsource.py): segmented parallel
scan, key-filter pushdown (point get opens ONE segment), and the
write-commit protocol."""

from __future__ import annotations

import json
import os

import pytest

from sales_telegram_bot_data_pipeline_spark.sources.kvsource import (
    KVDataSource,
    KVReader,
    _segment_of,
)
from pyspark.sql.datasource import EqualTo, GreaterThan


ROWS = [
    {"filename": f"flyer_{i}.pdf", "shop_name": "billa" if i % 2 else "penny",
     "valid_from": "2026-08-01", "valid_to": "2026-08-14", "valid": i % 3 != 0}
    for i in range(40)
]


@pytest.fixture()
def kv_dir(tmp_path):
    p = tmp_path / "kv"
    p.mkdir()
    for shard in range(3):  # several ingest files, irrelevant to segmentation
        with open(p / f"ingest_{shard}.jsonl", "w", encoding="utf-8") as fh:
            for r in ROWS[shard::3]:
                fh.write(json.dumps(r) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def registered(spark):
    # Python-source filter pushdown is flag-gated (Spark 4.1); runtime-settable
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KVDataSource)
    yield spark
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_scan_all_segments(registered, kv_dir):
    df = registered.read.format("sales_kv").option("path", kv_dir).load()
    assert df.rdd.getNumPartitions() == 4  # one per scan segment
    got = {r.filename for r in df.collect()}
    assert got == {r["filename"] for r in ROWS}


def test_point_get_pushdown_opens_one_segment(registered, kv_dir):
    df = (
        registered.read.format("sales_kv").option("path", kv_dir).load()
        .where("filename = 'flyer_7.pdf' AND shop_name = 'billa'")
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].shop_name == "billa"
    # the reader must have narrowed to the key's single segment
    r = KVReader({"path": kv_dir, "num_segments": "4"})
    unsupported = list(r.pushFilters([
        EqualTo(("filename",), "flyer_7.pdf"),
        EqualTo(("shop_name",), "billa"),
        GreaterThan(("valid_from",), "2026-01-01"),
    ]))
    assert len(unsupported) == 1  # the range filter goes back to Spark
    parts = r.partitions()
    assert len(parts) == 1
    assert parts[0].segment == _segment_of("flyer_7.pdf", 4)


def test_residual_filters_still_applied(registered, kv_dir):
    df = (
        registered.read.format("sales_kv").option("path", kv_dir).load()
        .where("valid = false")
    )
    assert df.count() == sum(1 for r in ROWS if not r["valid"])


def test_write_commit_roundtrip(registered, kv_dir, tmp_path):
    out = str(tmp_path / "out")
    src = registered.read.format("sales_kv").option("path", kv_dir).load()
    src.write.format("sales_kv").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = registered.read.format("sales_kv").option("path", out).load()
    assert {r.filename for r in back.collect()} == {r["filename"] for r in ROWS}
    # idempotent re-put of the same logical rows: KV semantics tolerate it
    src.write.format("sales_kv").option("path", out).mode("append").save()
    again = registered.read.format("sales_kv").option("path", out).load()
    assert {r.filename for r in again.collect()} == {r["filename"] for r in ROWS}


# --------------------------------------------------------------------------
# streaming DataSource (kvstream): change-feed tail
# --------------------------------------------------------------------------
def test_kvstream_availablenow_drains_exactly_once(spark):
    """The finite change feed drains under AvailableNow with every sequence
    number delivered exactly once and every field matching the
    deterministic generator."""
    import uuid

    from sales_telegram_bot_data_pipeline_spark.sources.kvstream import (
        KVStreamDataSource,
        _record_at,
    )

    spark.dataSource.register(KVStreamDataSource)
    name = f"kvs_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("kvstream")
        .option("batchsize", 64)
        .option("maxrecords", 300)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    # AvailableNow snapshots only the prefetched batch for simple stream
    # readers; processAllAvailable drains until read() stops advancing
    q.processAllAvailable()
    q.stop()
    rows = spark.table(name).collect()
    assert sorted(r.seq for r in rows) == list(range(300))
    for r in rows[:20]:
        assert tuple(r) == _record_at(r.seq)


def test_kvstream_offset_replay_is_deterministic(spark):
    """readBetweenOffsets must regenerate a committed range bit-for-bit —
    the exactly-once restart contract."""
    from sales_telegram_bot_data_pipeline_spark.sources.kvstream import KVStreamReader

    r = KVStreamReader({"batchsize": "50", "maxrecords": "200"})
    first, off = r.read(r.initialOffset())
    first = list(first)
    assert off == {"index": 50} and len(first) == 50
    replay = list(r.readBetweenOffsets({"index": 0}, {"index": 50}))
    assert replay == first
    # the feed never advances past maxrecords (AvailableNow terminates)
    tail, off2 = r.read({"index": 200})
    assert list(tail) == [] and off2 == {"index": 200}
