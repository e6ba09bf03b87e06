"""Pins for the fifth round-7-continuation batch: Poisson bootstrap CI,
clustering coefficient, integer-exact Markov stationary distribution."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q

from conftest import SF_SMOKE


def _pois_k(u: float) -> int:
    c, p = 0.0, math.exp(-1.0)
    for k in range(9):
        c += p
        if u < c:
            return k
        p /= k + 1
    return 9


def test_poisson_bootstrap_matches_python_replicate(spark):
    con = duckdb.connect()
    orders = con.sql(
        f"SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" FROM read_parquet('{SF_SMOKE}/orders.parquet')"
    ).fetchall()
    con.close()
    rows = q.REGISTRY["poisson_bootstrap_ci"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 32
    # recompute replicate b=0 from the hash definition
    num = den = 0
    for okey, cents in orders:
        h = int(hashlib.md5(f"{okey}:0".encode()).hexdigest()[:15], 16)
        k = _pois_k(h / 2**60)
        num += k * cents
        den += k
    expect0 = round(num / den / 100, 6)
    by_b = {r.b: r for r in rows}
    assert abs(by_b[0].rep_mean - expect0) < 1e-9
    # CI = (2nd, 31st) order statistics of the replicate means
    means = sorted((r.rep_mean, r.b) for r in rows)
    assert rows[0].ci_lo == means[1][0]
    assert rows[0].ci_hi == means[30][0]
    assert rows[0].ci_lo <= rows[0].mean_price <= rows[0].ci_hi
    assert len({(r.ci_lo, r.ci_hi, r.mean_price) for r in rows}) == 1


def test_clustering_coefficient_matches_bruteforce(spark):
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import DUCKDB
    from sales_telegram_bot_data_pipeline_spark.operators.similarity import (
        _neardup_banded_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    pairs = con.sql(
        _neardup_banded_sql(DUCKDB, "embeddings").replace("ORDER BY vec_a, vec_b", "")
    ).fetchall()
    con.close()
    adj = defaultdict(set)
    for a, b, *_ in pairs:
        adj[a].add(b)
        adj[b].add(a)
    # count each triangle once via its sorted triple
    tri = Counter()
    n_tri = 0
    seen = set()
    for a, b, *_ in pairs:
        for c in adj[a] & adj[b]:
            t = tuple(sorted((a, b, c)))
            if t not in seen:
                seen.add(t)
                for n in t:
                    tri[n] += 1
                n_tri += 1
    wedges = sum(len(v) * (len(v) - 1) for v in adj.values())
    rows = q.REGISTRY["clustering_coefficient_neardup"].fn(spark, SF_SMOKE).collect()
    assert {r.vec_id for r in rows} == {n for n, v in adj.items() if len(v) >= 2}
    for r in rows:
        deg = len(adj[r.vec_id])
        assert r.degree == deg
        assert r.n_triangles == tri[r.vec_id]
        assert abs(r.local_coeff - round(2 * tri[r.vec_id] / (deg * (deg - 1)), 6)) < 1e-9
        # wedges here = sum d(d-1) = 2W, so transitivity 3T/W = 6T/wedges
        assert abs(r.global_transitivity - round(6 * n_tri / wedges, 6)) < 1e-9
        assert 0.0 <= r.local_coeff <= 1.0


def test_markov_stationary_matches_integer_python(spark):
    con = duckdb.connect()
    trans = con.sql(
        f"""
        WITH seq AS (
          SELECT event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS nxt
          FROM read_parquet('{SF_SMOKE}/events.parquet'))
        SELECT event_type, nxt, COUNT(*) FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    live = {i for i, _, _ in trans}
    kept = [(i, j, n) for i, j, n in trans if j in live]  # mirror the
    # operator's terminal-target restriction (a no-op on this corpus)
    rowtot = Counter()
    for i, j, n in kept:
        rowtot[i] += n
    pm = {(i, j): (n * 1_000_000) // rowtot[i] for i, j, n in kept}
    types = sorted(rowtot)
    v = {t: 1_000_000_000_000 // len(types) for t in types}
    for _ in range(8):
        nv = defaultdict(int)
        for (i, j), p in pm.items():
            nv[j] += (v.get(i, 0) * p) // 1_000_000
        v = nv
    rows = q.REGISTRY["markov_stationary_distribution"].fn(spark, SF_SMOKE).collect()
    assert {r.event_type for r in rows} == set(types)
    total = 0.0
    for r in rows:
        assert abs(r.stationary_prob - round(v[r.event_type] / 1e12, 6)) < 1e-9
        total += r.stationary_prob
    assert abs(total - 1.0) < 1e-4  # flooring loses < types*iters pico-units
    assert all(abs(r.mass_leak) < 1e-4 for r in rows)  # no terminal leak here


def test_markov_fold_bit_equal_to_unrolled_chain(spark):
    """The round-12 aggregate() fold form of markov_stationary_distribution
    must be BIT-identical to the original unrolled-CTE power iteration
    (same integer quantization, flooring, and iteration count) — the fold
    only collapses the plan tree (planning was ~3 s at any scale), never
    the arithmetic."""
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK as SPARK_D
    from sales_telegram_bot_data_pipeline_spark.operators.analytics import (
        _markov_stationary_fold_sql,
        _markov_stationary_sql,
    )
    from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

    load_table(spark, SF_SMOKE, "events").createOrReplaceTempView("mk_bit_ev")
    unrolled = spark.sql(_markov_stationary_sql(SPARK_D, "mk_bit_ev")).collect()
    fold = spark.sql(_markov_stationary_fold_sql("mk_bit_ev")).collect()
    assert [tuple(r) for r in fold] == [tuple(r) for r in unrolled]


def test_markov_fold_bit_equal_on_terminal_chain(spark):
    """Round-13 advisory fixture: a corpus with terminal-chain structure.
    State D's only out-edge targets terminal E, so pruning leaves D with
    inflow but no surviving out-edges (D in p.j, not p.i) — the unrolled
    chain keeps re-emitting D's per-step inflow, while sources A/B feed a
    live cycle.  The fold must stay bit-identical here, not just on the
    generated corpus (where every live state has surviving out-edges)."""
    from sales_telegram_bot_data_pipeline_spark.functions.dialect import SPARK as SPARK_D
    from sales_telegram_bot_data_pipeline_spark.operators.analytics import (
        _markov_stationary_fold_sql,
        _markov_stationary_sql,
    )

    rows = []
    # user 1: A,B,A,B,A -> transitions A->B x2, B->A x2 (surviving cycle)
    for k, ty in enumerate(["A", "B", "A", "B", "A"]):
        rows.append((1, ty, k, k))
    # user 2: A,D,E -> A->D (kept: D is live), D->E (pruned: E terminal)
    for k, ty in enumerate(["A", "D", "E"]):
        rows.append((2, ty, k, 100 + k))
    spark.createDataFrame(
        rows, "user_id INT, event_type STRING, ts INT, event_id INT"
    ).createOrReplaceTempView("mk_term_ev")
    unrolled = spark.sql(_markov_stationary_sql(SPARK_D, "mk_term_ev")).collect()
    fold = spark.sql(_markov_stationary_fold_sql("mk_term_ev")).collect()
    assert [tuple(r) for r in fold] == [tuple(r) for r in unrolled]
    # the divergence this fixture guards: D (inflow-only after pruning)
    # must appear with its step-K inflow, and pure sources must NOT emit
    # spurious zero rows
    emitted = {r.event_type for r in fold}
    assert "D" in emitted
    assert all(r.stationary_prob > 0 for r in fold if r.event_type == "D")
