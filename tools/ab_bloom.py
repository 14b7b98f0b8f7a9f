"""A/B: hand-built bloom prune vs Spark's injected runtime bloom filter.

VERDICT r4 item 6: q_join_bloom_prune (operators/joins.py) hand-builds a
256 Ki-bit bloom and pushes it into the fact scan as a literal predicate.
Spark can inject the same thing automatically
(spark.sql.optimizer.runtime.bloomFilter.enabled) — but ONLY into
shuffle joins, and only past size thresholds that local fixtures never
reach, so the injection thresholds are lowered here to force it.  Four
variants of the same logical query (lineitem semi-join filtered orders):

  broadcast        BroadcastHashJoin LeftSemi, no bloom — the plan AQE
                   picks whenever the dim fits the broadcast threshold
  hand_bloom       the operator: JVM-built bloom literal (4 getbit
                   probes in WholeStageCodegen) + broadcast semi verify
  smj_plain        SortMergeJoin LeftSemi (autoBroadcast off) — the
                   100 TB shape when the dim outgrows broadcast
  smj_runtime_bf   SMJ + injected bloom_filter_might_contain on the
                   fact side (runtime.bloomFilter thresholds lowered)

Prints one JSON line: per-variant median-of-3 seconds + plan markers.

Usage: python tools/ab_bloom.py [--sf DIR] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def semi_query(spark, sf_dir):
    from kafka_connect_sse_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    small = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & F.col("o_orderdate").between("1995-01-01", "1995-06-30")
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(
        small, li["l_orderkey"] == small["o_orderkey"], "left_semi"
    )
    return joined.agg(
        F.count("*").alias("n_li"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


CONFS = {
    "broadcast": {},
    "hand_bloom": {},
    "smj_plain": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "smj_runtime_bf": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--record", action="store_true",
        help="append the result to tools/ab_bloom_results.json "
        "(rendered into PLANS.md by tools/gen_plans.py)",
    )
    a = ap.parse_args()
    a.runs = max(1, a.runs)

    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark()
    out = {"sf": a.sf, "variants": {}}
    for name, conf in CONFS.items():
        prev = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            def build():
                if name == "hand_bloom":
                    return queries()["q_join_bloom_prune"](spark, a.sf)
                return semi_query(spark, a.sf)

            plan = build()._jdf.queryExecution().executedPlan().toString()
            markers = {
                "getbit": "getbit" in plan,
                "runtime_bloom": "might_contain" in plan,
                "broadcast_semi": "BroadcastHashJoin" in plan
                and "LeftSemi" in plan,
                "smj_semi": "SortMergeJoin" in plan,
            }
            times = []
            for _ in range(a.runs):
                t0 = time.monotonic()
                rows = build().collect()
                times.append(round(time.monotonic() - t0, 3))
            out["variants"][name] = {
                "median_s": statistics.median(times),
                "times": times,
                "result": {k: rows[0][k] for k in rows[0].asDict()},
                "plan": markers,
            }
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    # all variants must agree on the answer
    vals = {json.dumps(v["result"], sort_keys=True)
            for v in out["variants"].values()}
    out["results_agree"] = len(vals) == 1
    print(json.dumps(out))
    if a.record:
        import os

        path = os.path.join(os.path.dirname(__file__), "ab_bloom_results.json")
        recs = []
        if os.path.exists(path):
            with open(path) as f:
                recs = json.load(f)
        recs = [r for r in recs if r["sf"] != out["sf"]] + [out]
        with open(path, "w") as f:
            json.dump(recs, f, indent=1)


if __name__ == "__main__":
    main()
