"""Set operations (SURVEY.md §2.4): UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def _hi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 150000).select("o_custkey")


def _urgent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")


_HI = "SELECT o_custkey FROM orders WHERE o_totalprice > 150000"
_URG = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@register("q_set_union_all", oracle=f"{_HI} UNION ALL {_URG}")
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (no dedup, no shuffle — pure concatenation of partitions)."""
    return _hi(spark, sf_dir).unionAll(_urgent(spark, sf_dir))


@register("q_set_union_distinct", oracle=f"{_HI} UNION {_URG}")
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (union + distinct ⇒ one hash-dedup shuffle)."""
    return _hi(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


@register("q_set_intersect", oracle=f"{_HI} INTERSECT {_URG}")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    return _hi(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@register("q_set_intersect_all", oracle=f"{_HI} INTERSECT ALL {_URG}")
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, multiplicity = min of the two sides)."""
    return _hi(spark, sf_dir).intersectAll(_urgent(spark, sf_dir))


@register("q_set_except", oracle=f"{_HI} EXCEPT {_URG}")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics — subtract(), not exceptAll+distinct)."""
    return _hi(spark, sf_dir).subtract(_urgent(spark, sf_dir))


@register("q_set_except_all", oracle=f"{_HI} EXCEPT ALL {_URG}")
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference)."""
    return _hi(spark, sf_dir).exceptAll(_urgent(spark, sf_dir))


@register(
    "q_set_union_by_name",
    oracle="""
    SELECT o_orderkey AS k, o_totalprice AS amount, 'ord' AS src FROM orders
    UNION ALL BY NAME
    SELECT c_custkey AS k, 'cust' AS src, c_acctbal AS bal FROM customer
    """,
)
def q_set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union: branches with different column sets combine
    by NAME (missing columns null-filled) — the schema-drift-tolerant
    append a long-lived ingest pipeline needs (vs positional UNION, which
    silently misaligns).  Still a pure concatenation — no shuffle."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("amount"),
        F.lit("ord").alias("src"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.lit("cust").alias("src"),
        F.col("c_acctbal").alias("bal"),
    )
    return o.unionByName(c, allowMissingColumns=True)
