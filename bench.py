"""Benchmark runner: executes EVERY registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints a
compact FINAL JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"n_queries": N, "sf": ..., "detail": "BENCH_DETAIL.json"}.  The full
per-query map goes to BENCH_DETAIL.json (the driver's tail capture once
truncated a long stdout line — round-4 postmortem).

Coverage: the whole registry, not a curated headline set (round-5 verdict
task 1: 72 registered queries had no bench row, so a perf regression there
was invisible).  Every query is collected (fully materialized) so measured
time includes the whole plan, not just lazy construction.

Sampling, sized to fit the driver's ~580 s budget at 161 queries (a
serial warm-up-everything + min-of-3-everything sweep measured 9m40s and
timed out):

- A PARALLEL warm-up pass (4 collect threads — the Spark scheduler
  interleaves the jobs, and whole-stage-codegen compilation is JVM-side
  parallel work the single-query sweep leaves idle) absorbs per-plan-shape
  compile cost before any timing: measured, detected_data_pipeline's first
  sf0.1 run is 9.6 s vs 3.0 s steady state.  Untimed, so job interleaving
  cannot pollute any number.
- Each query is then timed CONSECUTIVELY: min of two steady-state runs,
  plus a third when the second still exceeded SLOW_THRESHOLD — the host is
  shared and multi-second scheduler transients land on a random query per
  run, and the Python-stage-heavy queries carry the variance (measured:
  consecutive runs 5.2 / 8.1 / 2.6 s with a 2.6 s steady state), so the
  extra sample goes where the variance lives.
- The timed phase runs SLOWEST-FIRST (ordered by warm-up time): two global
  deadline guards keep the sweep inside the driver's timeout no matter how
  noisy the host is — past SOFT (default 400 s) no third samples are
  granted; past HARD (default 480 s) remaining queries get a single timed
  run — and slowest-first ordering means any clamp degrades the CHEAP tail
  (where one sample is fine), never the expensive Python-stage queries
  whose single sample would carry the most noise.
- Python gc runs between timings so py4j reference-release backlogs aren't
  attributed to an innocent query.

Override the benched set with $SPARK_GRAFT_BENCH_QUERIES (comma-separated),
force a fixed per-query sample count with $SPARK_GRAFT_BENCH_PASSES, and
tune the guards with $SPARK_GRAFT_BENCH_SOFT_DEADLINE /
$SPARK_GRAFT_BENCH_HARD_DEADLINE / $SPARK_GRAFT_BENCH_WARM_PAR.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.session import get_spark

SLOW_THRESHOLD = 0.8  # sec at the warm run; slower queries earn a third sample


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    soft_deadline = float(os.environ.get("SPARK_GRAFT_BENCH_SOFT_DEADLINE", "400"))
    hard_deadline = float(os.environ.get("SPARK_GRAFT_BENCH_HARD_DEADLINE", "480"))
    forced_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "0"))
    warm_par = int(os.environ.get("SPARK_GRAFT_BENCH_WARM_PAR", "4"))
    t_start = time.perf_counter()
    spark = get_spark(app_name="sales_telegram_bot_data_pipeline_spark-bench")
    # full registry in driver-facing order (oracle-backed first, rows-only
    # last — same order __spark_entry__.queries() exposes)
    names = list(q.queries())
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in q.REGISTRY]

    warm_t: dict[str, float] = {}

    def _warm(name: str) -> None:
        t0 = time.perf_counter()
        try:
            q.REGISTRY[name].fn(spark, sf_dir).collect()
        except Exception:
            pass  # the timed phase surfaces real failures serially
        warm_t[name] = time.perf_counter() - t0

    with ThreadPoolExecutor(max_workers=max(1, warm_par)) as pool:
        list(pool.map(_warm, names))

    # Slowest-first (warm-up times are contention-inflated but fine for
    # ORDERING): deadline clamps then degrade only the cheap tail.
    names = sorted(names, key=lambda n: -warm_t.get(n, 0.0))

    times: dict[str, float] = {}
    for name in names:
        fn = q.REGISTRY[name].fn
        samples: list[float] = []
        while True:
            gc.collect()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
            elapsed = time.perf_counter() - t_start
            if forced_passes:
                if len(samples) >= forced_passes:
                    break
                continue
            if elapsed > hard_deadline:
                break  # at risk of the driver's timeout: one sample stands
            if len(samples) == 1:
                continue  # always take a second steady sample
            if (
                len(samples) == 2
                and samples[-1] > SLOW_THRESHOLD
                and elapsed < soft_deadline
            ):
                continue  # slow query, budget allows: one more steady sample
            break
        times[name] = round(min(samples), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver captures only the TAIL of stdout; with per-query entries
    # the full map once overflowed the capture and the head of the line
    # (metric/value) was cut off, leaving the driver with parsed:null
    # (round 4).  So: write the full per-query map to a file artifact, and
    # make the FINAL stdout line a compact total-only JSON whose last bytes
    # always carry the headline number.
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass  # bench result still goes to stdout below
    print(json.dumps(out))  # full line first: head may be lost to tail capture
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "n_queries": len(times),
        "sf": out["sf"],
        "detail": detail_path,
    }
    print(json.dumps(compact))  # LAST line is short: always survives capture
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
