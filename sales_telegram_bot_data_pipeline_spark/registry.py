"""Named-query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are SQL-expressible, the equivalent ANSI SQL that DuckDB runs on the
same parquet tables (the driver's correctness oracle).  Column names/aliases
must match exactly between the two sides — the driver sorts columns by name
before value-hashing.

Hash-stability rules used throughout the suite:
- money/quantity aggregates go through exact DECIMAL casts before SUM so the
  result is order-independent and bit-identical across engines, then cast to
  double at the end;
- genuinely fractional outputs (averages, rates, cosine similarities) are
  rounded to 6 decimals on both sides;
- array-valued results are sorted and joined to strings;
- portable 60-bit hashes use ``conv(substr(md5(x),1,15),16,10)`` (Spark) ≡
  ``('0x'||substr(md5(x),1,15))::bigint`` (DuckDB) — verified identical.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add ``fn`` to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco
