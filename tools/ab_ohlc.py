"""A/B: q_ts_ohlc's min_by/max_by AGGREGATE form vs the first/last_value
WINDOW-SORT form (the claim in its docstring: constant per-group state +
map-side combine beats sorting every partition).  Run at any SF:

    python tools/ab_ohlc.py [sf_dir ...]

Writes tools/ab_ohlc_results.json (median of 3 per variant per SF).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_sse_spark.io import load_table  # noqa: E402
from kafka_connect_sse_spark.session import get_spark  # noqa: E402


def agg_form(spark, sf):
    e = load_table(spark, sf, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count("*").alias("n"),
    )


def window_form(spark, sf):
    e = load_table(spark, sf, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    first = F.first("value").over(wf)
    last = F.last("value").over(wf)
    d = e.select(
        "event_type",
        "day",
        first.alias("open"),
        F.max("value").over(wf).alias("high"),
        F.min("value").over(wf).alias("low"),
        last.alias("close"),
        F.count("*").over(wf).alias("n"),
    ).dropDuplicates(["event_type", "day"])
    return d


def run(fn, spark, sf):
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        fn(spark, sf).collect()
        times.append(round(time.monotonic() - t0, 3))
    times.sort()
    return {"median_s": times[1], "times": times}


def main():
    sfs = sys.argv[1:] or ["/root/repo/testdata/sf1", "/root/testdata/sf0.01"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for sf in sfs:
        if not os.path.isdir(sf):
            continue
        a = run(agg_form, spark, sf)
        b = run(window_form, spark, sf)
        # parity: identical bars
        ra = {tuple(r) for r in agg_form(spark, sf).collect()}
        rb = {tuple(r) for r in window_form(spark, sf).collect()}
        out.append(
            {
                "sf": sf,
                "variants": {"min_by_aggregate": a, "window_sort": b},
                "results_identical": ra == rb,
            }
        )
        print(sf, "agg", a["median_s"], "window", b["median_s"],
              "identical", ra == rb)
    with open(os.path.join(os.path.dirname(__file__), "ab_ohlc_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
