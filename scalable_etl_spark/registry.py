"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus the
DuckDB oracle SQL for each name (driver correctness contract).

Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
