"""A/B: the AQE no-cross-stage-exchange-reuse trap, measured (round 8).

SCALE.md's named trap: a relation feeding TWO consumers is silently
recomputed from the scan when one consumer lands in its own AQE query
stage (broadcast build side) — ReuseExchange does not fire across stage
boundaries.  Two shipped fixes are measured here against their
trap-form twins, output parity asserted first:

  * x_importance_resample: persisted (doc, bucket) counts (current) vs
    the no-persist form whose profile branch re-explodes every token;
  * q_retention_cohort: localCheckpointed DISTINCT (user, day) activity
    (current) vs the plain form that scans raw events once per branch.

Usage: python tools/ab_stage_reuse.py [--sf DIR] [--runs 3] [--record]
--record appends to tools/ab_stage_reuse_results.json (rendered into
PLANS.md by tools/gen_plans.py).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import broadcast  # noqa: E402


def dsir_no_persist(spark, sf_dir):
    """x_importance_resample's TRAP form: identical logical plan, no
    persist — the broadcast profile branch re-runs the token explode."""
    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.operators.pipeline import (
        DSIR_BUCKETS,
        DSIR_TARGET_LANG,
        DSIR_TOP,
    )

    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("g")
    ).select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5(F.col("g")), 1, 2), 16, 10)
        .cast("int")
        .alias("b"),
    )
    doc = ex.groupBy("doc_id", "lang", "b").agg(F.count("*").alias("cnt"))
    prof = doc.groupBy("b").agg(
        F.sum("cnt").alias("cr"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("cnt"))),
            F.lit(0),
        ).alias("ct"),
    )
    wall = Window.partitionBy()
    lw = prof.select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1.0) / (F.sum("ct").over(wall) + float(DSIR_BUCKETS)))
                / ((F.col("cr") + 1.0) / (F.sum("cr").over(wall) + float(DSIR_BUCKETS)))
            ),
            6,
        )
        .cast("decimal(12,6)")
        .alias("lw"),
    )
    return (
        doc.join(broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.round(
                F.sum(F.col("cnt") * F.col("lw")).cast("double"), 6
            ).alias("log_weight"),
        )
        .orderBy(F.col("log_weight").desc(), "doc_id")
        .limit(DSIR_TOP)
    )


def retention_no_checkpoint(spark, sf_dir):
    """q_retention_cohort's TRAP form: no localCheckpoint — the raw
    events scan runs once per branch."""
    from kafka_connect_sse_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    act = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    first = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    j = act.join(first, "user_id")
    flags = j.groupBy("cohort_day", "user_id").agg(
        F.max(
            F.when(F.col("d") == F.date_add(F.col("cohort_day"), 1), 1)
            .otherwise(0)
        ).alias("r1"),
        F.max(
            F.when(F.col("d") == F.date_add(F.col("cohort_day"), 7), 1)
            .otherwise(0)
        ).alias("r7"),
    )
    return flags.groupBy("cohort_day").agg(
        F.count("*").alias("n_users"),
        F.sum("r1").alias("retained_d1"),
        F.sum("r7").alias("retained_d7"),
        F.round(F.sum("r1").cast("double") / F.count("*"), 6).alias("rate_d1"),
        F.round(F.sum("r7").cast("double") / F.count("*"), 6).alias("rate_d7"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # parity: the fix is purely physical
    cur = sorted(map(tuple, qs["x_importance_resample"](spark, args.sf).collect()))
    trap = sorted(map(tuple, dsir_no_persist(spark, args.sf).collect()))
    assert cur == trap, "DSIR fix changed results"
    cur = sorted(map(tuple, qs["q_retention_cohort"](spark, args.sf).collect()))
    trap = sorted(map(tuple, retention_no_checkpoint(spark, args.sf).collect()))
    assert cur == trap, "retention fix changed results"

    variants = {
        "dsir_persisted_current": lambda: qs["x_importance_resample"](
            spark, args.sf
        ),
        "dsir_no_persist_trap": lambda: dsir_no_persist(spark, args.sf),
        "retention_checkpoint_current": lambda: qs["q_retention_cohort"](
            spark, args.sf
        ),
        "retention_no_checkpoint_trap": lambda: retention_no_checkpoint(
            spark, args.sf
        ),
    }
    rec = {"sf": args.sf, "variants": {}}
    for name, fn in variants.items():
        fn().count()  # warm
        times = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn().count()
            times.append(round(time.monotonic() - t0, 3))
        rec["variants"][name] = {
            "median_s": statistics.median(times),
            "times": times,
        }
    print(json.dumps(rec))

    if args.record:
        path = os.path.join(
            os.path.dirname(__file__), "ab_stage_reuse_results.json"
        )
        recs = json.load(open(path)) if os.path.exists(path) else []
        recs = [r for r in recs if r["sf"] != args.sf] + [rec]
        with open(path, "w") as fh:
            json.dump(recs, fh, indent=1)
        print(f"recorded -> {path}")


if __name__ == "__main__":
    main()
