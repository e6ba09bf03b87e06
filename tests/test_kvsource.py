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
