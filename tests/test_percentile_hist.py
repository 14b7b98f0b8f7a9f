"""percentile_cont_by_hist (round-13 optimization) must reproduce
Spark's imperative exact `percentile` BIT-FOR-BIT: same order
statistics, same interpolation arithmetic — including ties, negative
values (bucket floor on negatives), single-row groups, and exact
integral positions (p such that p*(n-1) is whole)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_sse_spark.operators.aggregates import (
    percentile_cont_by_hist,
)


@pytest.fixture(scope="module")
def vals(spark):
    rows = []
    import random

    rng = random.Random(13)
    for g in ("a", "b"):
        for _ in range(500):
            # cents-grid values spanning sign change and bucket edges,
            # with ties
            rows.append((g, round(rng.uniform(-25.0, 75.0), 2)))
        rows.append((g, 10.0))
        rows.append((g, 10.0))
    rows.append(("single", 42.17))
    return spark.createDataFrame(rows, ["g", "v"])


@pytest.mark.parametrize("ps", [[0.5], [0.0, 0.1, 0.9, 1.0], [0.25, 0.75]])
def test_matches_imperative_percentile_exactly(spark, vals, ps):
    names = [f"p{i}" for i in range(len(ps))]
    got = {
        r["g"]: tuple(r[n] for n in names)
        for r in percentile_cont_by_hist(
            vals.select("g", "v", F.lit(1).alias("w")), "g", "v", "w",
            ps, names,
        ).collect()
    }
    want = {
        r["g"]: tuple(r[n] for n in names)
        for r in vals.groupBy("g")
        .agg(
            *[
                F.percentile("v", p).alias(n)
                for p, n in zip(ps, names)
            ]
        )
        .collect()
    }
    assert got == want  # exact float equality, not approx


def test_weighted_matches_frequency_percentile(spark, vals):
    h = vals.groupBy("g", "v").agg(F.count("*").alias("w"))
    got = {
        r["g"]: r["m"]
        for r in percentile_cont_by_hist(
            h, "g", "v", "w", [0.5], ["m"]
        ).collect()
    }
    want = {
        r["g"]: r["m"]
        for r in vals.groupBy("g")
        .agg(F.percentile("v", 0.5).alias("m"))
        .collect()
    }
    assert got == want
