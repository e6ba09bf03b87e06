"""Blanket plan hygiene over the DRIVER WINDOW: no query the driver checks
may regress into a cartesian product or an unplanned per-row Python stage.
The per-operator plan tests (test_plans.py) pin specific optimizations;
this sweep is the coarse tripwire that catches a future edit turning an
equi-join into a nested loop anywhere in the checked set."""

from __future__ import annotations

import pytest

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.queries import _DRIVER_WINDOW

from conftest import SF_SMOKE

# single-row-aggregate cross joins plan as BroadcastNestedLoopJoin with a
# one-row build side — the O(1) scalar-broadcast shape, explicitly fine
_ONE_ROW_BNLJ_OK = {
    "bm25_topk_search",  # corpus stats scalar
    "sequence_packing",  # derived shard-count scalar
    "dsir_importance",  # bucket-total scalar
    "quality_repetition",
    "dedup_incremental_lsh",
    "curation_pipeline_end2end",
    "watermark_tail_stats",  # one-row watermark-cutoff aggregate
    "bigram_lm_score",  # vocabulary-size scalar (CROSS JOIN one-row COUNT)
    # bounded-broadcast designs: every corpus row scores a TINY broadcast
    # side (|Q| query vectors / K centroids) map-side — O(|Q|)/O(K) work
    # per row by construction, never corpus x corpus
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
}

# mapInPandas / pandas-UDF operators: Python stages are their design.
# detected_data_native is deliberately NOT here: it is pure spark.sql
# (pipeline_native.py), so a Python stage sneaking into the flagship
# native query must trip this test.
_PYTHON_OK = {"word_segmentation"}


@pytest.mark.parametrize("name", _DRIVER_WINDOW)
def test_window_query_plan_hygiene(spark, name):
    df = q.REGISTRY[name].fn(spark, SF_SMOKE)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _ONE_ROW_BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a nested-loop join"
    # row-at-a-time Python is never acceptable anywhere in the window
    assert "BatchEvalPython" not in plan, f"{name} runs a row-at-a-time Python UDF"
    if name not in _PYTHON_OK:
        assert "PythonUDF" not in plan and "MapInPandas" not in plan, (
            f"{name} unexpectedly runs a Python stage"
        )
