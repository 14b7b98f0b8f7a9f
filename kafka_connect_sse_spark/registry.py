"""Operator/query registry: pairs every implemented operator with an ANSI-SQL
DuckDB oracle (where expressible) for the driver's correctness gate.

Every operator from SURVEY.md §2.4 lands here via the @register decorator:

    @register("q_agg_groupby", oracle="SELECT ...")
    def q_agg_groupby(spark, sf_dir): ...

Conventions that keep the cross-engine value-hash stable (FIXTURES.md §6):
  * every computed column is aliased identically in Spark and oracle SQL;
  * money-style double aggregates go through DECIMAL(18,2) so partial-sum
    order cannot perturb low bits (exact in both engines);
  * non-exact float aggregates (stddev/corr/cosine) are rounded explicitly;
  * timestamps are emitted as DATE or as formatted strings — never raw
    timestamps — so session-timezone handling can't skew the comparison;
  * top-k orderings always carry a unique tiebreak key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# submodules that register queries on import
_MODULES = (
    "kafka_connect_sse_spark.operators.relational",
    "kafka_connect_sse_spark.operators.joins",
    "kafka_connect_sse_spark.operators.aggregates",
    "kafka_connect_sse_spark.operators.windows",
    "kafka_connect_sse_spark.operators.setops",
    "kafka_connect_sse_spark.functions.scalar",
    "kafka_connect_sse_spark.operators.dedup",
    "kafka_connect_sse_spark.operators.similarity",
    "kafka_connect_sse_spark.operators.text",
    "kafka_connect_sse_spark.operators.multimodal",
    "kafka_connect_sse_spark.operators.udfs",
    "kafka_connect_sse_spark.streaming.queries",
    "kafka_connect_sse_spark.streaming.landing",
    "kafka_connect_sse_spark.operators.sinks",
)

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # driver hands us its own session; pin runtime-settable conf
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
