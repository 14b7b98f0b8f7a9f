"""Benchmark harness (BASELINE.md §2 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], AQE on, UTC, and prints
ONE JSON line:

    {"metric": "total_median_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Per query: one warm-up run then median of 3 timed runs (collect() to force
full materialization, count only as a fallback for huge outputs).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: the scale-critical operators across every tier
HEADLINE = [
    "q_agg_groupby",          # TPC-H Q1-style scan+agg
    "q_join_multiway",        # 5-table star join
    "q_join_inner_shuffle",   # fact-fact shuffle join
    "q_agg_count_distinct",   # expand + two-phase distinct
    "q_win_ranking",          # partitioned window sort
    "q_topk_per_group",       # ranked top-k
    "q_limit_topk",           # global top-k
    "q_agg_grouping_sets",    # multi-grouping aggregate
    "q_fn_json",              # JSON path extraction (SMT tier)
    "x_text_stats",           # token stats over documents
    "x_dedup_exact_hash",     # content-hash dedup
    "x_dedup_near_minhash",   # MinHash LSH + verify
    "x_sim_topk_cosine",      # brute-force cosine top-k
    "x_fingerprint",          # posexplode fingerprint
    "u_pandas_udf",           # Arrow-vectorized UDF
]

RUNS = 3
# outputs larger than this are forced via count() instead of collect(), so
# the bench measures engine execution, not Python row deserialization
COLLECT_CAP_ROWS = 100_000


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="kcss-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    sf = None
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        pass

    results: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        times = []
        for i in range(RUNS + 1):  # first run is warm-up
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            if n <= COLLECT_CAP_ROWS:
                df.collect()
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
        results[name] = round(statistics.median(times), 3)
        print(f"# {name}: {results[name]}s (n={n})", file=sys.stderr)

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_median_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
