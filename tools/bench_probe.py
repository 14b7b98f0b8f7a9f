"""Round-13 measurement probe (guide §1): for each bench query, isolate
where the wall time goes — DataFrame construction (Catalyst analysis),
noop-sink execution (pure computation, §1.4), and the bench protocol's
count()+collect() — and dump .explain("formatted") before/after plans.

    python tools/bench_probe.py [--plans DIR --tag before|after] [names...]
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", help="dump explain('formatted') here")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="kcss-bench-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    names = args.names or (bench_mod.HEADLINE + bench_mod.EXTRA)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    print(f"{'query':28s} {'plan_ms':>8s} {'noop_s':>8s} {'count_s':>8s} "
          f"{'collect_s':>9s}")
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        # warm-ups (bench protocol uses 2)
        for _ in range(2):
            df = fn(spark, args.sf)
            n = df.count()
            if n <= bench_mod.COLLECT_CAP_ROWS:
                df.collect()
        plan_ms, noop_s, count_s, collect_s = [], [], [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            n = df.count()
            t3 = time.perf_counter()
            if n <= bench_mod.COLLECT_CAP_ROWS:
                df.collect()
            t4 = time.perf_counter()
            plan_ms.append((t1 - t0) * 1000)
            noop_s.append(t2 - t1)
            count_s.append(t3 - t2)
            collect_s.append(t4 - t3)
        med = lambda xs: statistics.median(xs)  # noqa: E731
        print(f"{name:28s} {med(plan_ms):8.0f} {med(noop_s):8.3f} "
              f"{med(count_s):8.3f} {med(collect_s):9.3f}")
        if args.plans:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.plans, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
