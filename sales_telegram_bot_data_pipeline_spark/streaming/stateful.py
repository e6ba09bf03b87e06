"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only stateful surface is DAG #2's stored-flag diffing
(README.md:70-82) — state lives in DynamoDB between runs.  The engine's
native form keeps per-key state in Spark's state store: here a per-user
running aggregate (count + sum + last event time) maintained across
micro-batches, with an idle-timeout that finalizes and evicts quiet keys.

This is the template for any custom operator Spark's built-in windows can't
express (per-key ML feature accumulation, complex session logic, CDC
folding): grouped Arrow batches in, explicit typed state, rows out.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, finalized boolean"
STATE_SCHEMA = "n bigint, total double"


def running_user_totals(
    grouped_stream,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-user running (count, sum(value)) across micro-batches.

    Emits the updated running totals for every user seen in each batch;
    with a ProcessingTimeTimeout configured, idle users are emitted once
    more with ``finalized=True`` and evicted from the state store.
    """

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "total_value": [total], "finalized": [True]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if timeout != "NoTimeout":
            state.setTimeoutDuration(60_000)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total], "finalized": [False]}
        )

    mode = getattr(GroupStateTimeout, timeout)
    return grouped_stream.applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=mode,
    )


# --------------------------------------------------------------------------
# the SAME operator on Spark 4's transformWithStateInPandas (StatefulProcessor)
# --------------------------------------------------------------------------
from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class RunningTotalsProcessor(StatefulProcessor):
    """Spark 4 ``StatefulProcessor`` twin of ``running_user_totals`` —
    the arbitrary-stateful-processing API that succeeds
    ``applyInPandasWithState``: named typed state handles (ValueState /
    ListState / MapState) acquired from a handle in ``init`` instead of one
    positional state tuple, per-key Arrow iterators in
    ``handleInputRows``, explicit timers instead of a timeout conf.

    Both twins are kept: applyInPandasWithState is the stable API teams run
    today; transformWithState is where new stateful operators land (state
    evolution, multiple typed handles, timers).  Batch parity for BOTH is
    pinned by test_stateful_streaming.py."""

    def init(self, handle) -> None:
        self.totals = handle.getValueState("totals", "n bigint, total double")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        n, total = self.totals.get() if self.totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self.totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total], "finalized": [False]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # pragma: no cover
        return iter(())

    def close(self) -> None:
        pass


def running_user_totals_tws(grouped_stream) -> DataFrame:
    """``transformWithStateInPandas`` wiring of RunningTotalsProcessor."""
    return grouped_stream.transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
