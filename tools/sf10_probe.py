"""sf10 probe (VERDICT r9 item 3): run the full bench at the
deterministic sf10 tier (60M lineitem rows — 10x the sf1 gate, a 1000x
span above sf0.01) and additionally time the SPARK SIDE of the five
most expensive sweep ops, so the cross-SF regime analysis in
BASELINE.md/SCALE.md gets a fourth point per query.

    python tools/sf10_probe.py --round 10
    # writes BENCH_sf10_r10.json at the repo root
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "testdata", "sf10")

if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the five largest sweep-wall entries of SWEEP_sf1_r09.json — the wall
# there is checker-inclusive (Spark + DuckDB oracle + canonicalization);
# here we time the SPARK side alone, which is what scales with the
# cluster
EXPENSIVE = [
    "x_containment_dedup",
    "q_agg_mad",
    "q_agg_percentile",
    "u_grouped_map_batched",
    "x_decontaminate",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip-bench", action="store_true",
                    help="only time the expensive ops")
    args = ap.parse_args()

    if not os.path.isdir(SF10):
        print(f"{SF10} missing — run tools/gen_fixture.py --sf 10 first",
              file=sys.stderr)
        sys.exit(1)

    path = os.path.join(REPO, f"BENCH_sf10_r{args.round:02d}.json")

    def save(rec):
        with open(path, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"wrote {path}", flush=True)

    rec: dict = {"sf": 10.0, "sf_dir": SF10}
    if os.path.exists(path):
        rec.update(json.load(open(path)))  # resume after a crash
    if not args.skip_bench and "queries" not in rec:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF10)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env,
        )
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{")),
            None,
        )
        if line is None:
            print("bench produced no JSON line", file=sys.stderr)
            print(proc.stdout[-3000:], proc.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
        rec.update(json.loads(line))
        save(rec)  # the bench result must survive an expensive-op crash

    # the expensive-op session gets a tier-sized heap: the first probe
    # attempt OOM'd x_containment_dedup's posting-list pair expansion at
    # the default 8g — sizing the driver to the tier is the same
    # decision a cluster deployment makes per executor; recorded below
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    ops: dict = dict(rec.get("expensive_ops_spark_sec", {}))
    for name in EXPENSIVE:
        if isinstance(ops.get(name), (int, float)):
            continue
        fn = qs[name]
        try:
            times = []
            for i in range(2):  # warm-up + timed
                t0 = time.perf_counter()
                df = fn(spark, SF10)
                n = df.count()
                if n <= 100_000:
                    df.collect()
                times.append(time.perf_counter() - t0)
            ops[name] = round(times[-1], 3)
            print(f"# {name}: {ops[name]}s spark-side (n={n})",
                  file=sys.stderr, flush=True)
        except Exception as exc:  # record, don't die — partial probe
            ops[name] = f"FAILED: {str(exc)[:120]}"
            print(f"# {name}: FAILED {str(exc)[:200]}",
                  file=sys.stderr, flush=True)
        rec["expensive_ops_spark_sec"] = ops
        rec["expensive_ops_driver_mem"] = os.environ[
            "SPARK_GRAFT_DRIVER_MEM"
        ]
        save(rec)


if __name__ == "__main__":
    main()
