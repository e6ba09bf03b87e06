"""applyInPandasWithState correctness: the per-user running totals after
draining the stream must equal the batch groupBy aggregate over the same
files (state accumulates correctly across micro-batches)."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from sales_telegram_bot_data_pipeline_spark.streaming.stateful import running_user_totals
from sales_telegram_bot_data_pipeline_spark.streaming.windows import read_events_stream

from test_streaming_parity import _events_as_stream_source

TMP = os.path.join(os.path.dirname(__file__), ".tmp")


@pytest.fixture()
def scratch():
    path = os.path.join(TMP, uuid.uuid4().hex)
    os.makedirs(path, exist_ok=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_running_totals_match_batch(spark, scratch):
    flat = _events_as_stream_source(spark, scratch)
    stream = read_events_stream(spark, flat)
    out = running_user_totals(stream.groupBy("user_id"))
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # update mode emits one row per user per batch; the LAST emission per
    # user carries the final running totals (monotone n_events → max)
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4)) for r in final.collect()}
    batch = spark.read.parquet(flat).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 4)) for r in batch.collect()}
    assert got == want


def test_running_totals_tws_match_batch(spark, scratch):
    """The transformWithStateInPandas (Spark 4 StatefulProcessor) twin must
    reach the same final per-user totals as the batch aggregate — same
    parity contract as the applyInPandasWithState form.

    Environment gate: the TWS state-server protocol needs a working
    google.protobuf (the runtime speaks protobuf to the state store); this
    container ships a broken protobuf install, so the test skips there —
    the same import-gate pattern as the hunspell path.  The operator code
    itself is environment-independent."""
    pytest.importorskip("google.protobuf.descriptor")
    from sales_telegram_bot_data_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    flat = _events_as_stream_source(spark, scratch)
    stream = read_events_stream(spark, flat)
    out = running_user_totals_tws(stream.groupBy("user_id"))
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4)) for r in final.collect()}
    batch = spark.read.parquet(flat).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 4)) for r in batch.collect()}
    assert got == want
