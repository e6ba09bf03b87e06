"""APSS pins: the prefix-filtered all-pairs cosine join must equal the
naive all-pairs form exactly (losslessness of the L2 prefix bound), and
every emitted cosine must clear the threshold."""

from __future__ import annotations

import duckdb

from sales_telegram_bot_data_pipeline_spark import queries as q
from sales_telegram_bot_data_pipeline_spark.functions.dialect import DUCKDB
from sales_telegram_bot_data_pipeline_spark.operators.dedup import (
    APSS_T_DEN,
    APSS_T_NUM,
    _apss_pw_sql,
)

from conftest import SF_SMOKE, SF_ORACLE

T = APSS_T_NUM / APSS_T_DEN


def _naive(sf_dir: str):
    """Naive all-pairs form over the same quantized postings — the ground
    truth the prefix filter must reproduce exactly."""
    t2n, t2d = APSS_T_NUM * APSS_T_NUM, APSS_T_DEN * APSS_T_DEN
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.sql(
        f"""
WITH pw AS ({_apss_pw_sql(DUCKDB, "documents")}),
norms AS (SELECT doc_id, CAST(SUM(wq * wq) AS BIGINT) AS n2 FROM pw GROUP BY doc_id),
num AS (
  SELECT a.doc_id AS a, b.doc_id AS b, CAST(SUM(a.wq * b.wq) AS BIGINT) AS num
  FROM pw a JOIN pw b ON b.f = a.f AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT n.a, n.b,
       ROUND(CAST(n.num AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * nb.n2), 6)
FROM num n
JOIN norms na ON na.doc_id = n.a
JOIN norms nb ON nb.doc_id = n.b
WHERE CAST(n.num AS DECIMAL(38,0)) * n.num * {t2d}
      >= CAST(na.n2 AS DECIMAL(38,0)) * nb.n2 * {t2n}
        """
    ).fetchall()
    con.close()
    return {(a, b): c for a, b, c in rows}


def test_apss_prefix_filter_is_lossless_smoke(spark):
    expect = _naive(SF_SMOKE)
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in q.REGISTRY["apss_cosine_join"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for k, c in got.items():
        assert abs(c - expect[k]) < 1e-9
        assert c >= T - 1e-9
    assert got, "no qualifying pairs at smoke scale"


def test_apss_prefix_filter_is_lossless_sf001(spark):
    expect = _naive(SF_ORACLE)
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in q.REGISTRY["apss_cosine_join"].fn(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(expect)
    assert len(got) >= 5  # md5-eighth subset at t=0.85 keeps ~8 pairs here
