"""sales_telegram_bot_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``Maniachenko/sales_telegram_bot_data_pipeline`` (an Airflow ETL
pipeline that turns retail promo-flyer PDFs into a queryable price table and
fans updates out to Telegram subscribers), re-expressed Spark-first:

- DataFrame/SQL logical plans; Catalyst + Tungsten pick physical strategy.
- Scalar suites (price parsers, text normalization) as native Column
  expressions — JVM-side, whole-stage-codegen friendly; Python only where
  semantics genuinely require it (trie+DP segmentation, external inference),
  and then always Arrow-batched (pandas_udf / mapInPandas).
- Designed for 100 TB: broadcast small dims, bucketed range joins, partial
  aggregation, no driver-side collects in any operator path.

Layout:
    functions/   scalar-function suites (prices, text, hashing, vectors)
    operators/   composable DataFrame operators (relational, temporal,
                 dedup, similarity, segmentation, inference, pivot)
    sources/     table/vocab/binary (multimodal) sources
    sinks/       idempotent batch sinks (key-value store shape, webhook shape)
    streaming/   structured-streaming jobs + batch-parity forms
    plans/       explain/plan-assertion helpers
    queries.py   the named-query registry (Spark callable + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
