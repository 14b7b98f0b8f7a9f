#!/usr/bin/env python
"""Round-13 sf10 probe for the co-activity graph family + the two new
scale twins (VERDICT r12 items 2/3/5/6).

Measures, at the sf10 tier on one default-memory session:
  * the graph family SHARING one cached co-activity edge artifact
    (kcore -> pagerank -> sampled triangle in sequence: the first op
    pays the build, the siblings reuse it; kcore first so the r12
    137.4 s fresh-session baseline compares directly.  The EXACT
    triangle census is not probed at sf10: the measured density (avg
    degree 1527 -> 2.2e10 oriented wedges) makes exact enumeration a
    ~500 GB shuffle by construction — SCALE.md round-13 section — and
    q_triangle_count_sampled is the registered scale path);
  * x_decontaminate_semantic (dense) vs x_decontaminate_semantic_lsh
    (candidate-only) walls;
  * x_target_encoding (shuffle join) vs x_target_encoding_bucketed
    (bucketed layout; wall includes the one-time bucketing write, also
    reported split out via the join-stage-only timing).

    python tools/sf10_family_probe.py --round 13
    # writes BENCH_sf10_r{N}_family.json at the repo root
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "testdata", "sf10")

if REPO not in sys.path:
    sys.path.insert(0, REPO)


def timed(fn, *args):
    t0 = time.perf_counter()
    n = fn(*args).count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf-dir", default=SF10)
    args = ap.parse_args()
    path = os.path.join(REPO, f"BENCH_sf10_r{args.round:02d}_family.json")
    rec: dict = {"sf_dir": args.sf_dir}
    if os.path.exists(path):
        rec.update(json.load(open(path)))

    def save():
        with open(path, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"wrote {path}", flush=True)

    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="sf10-family-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # 1. graph family, shared artifact: sequential in ONE session
    fam = rec.setdefault("graph_family_shared_session_sec", {})
    for name in ("q_graph_kcore", "q_pagerank_iter", "q_triangle_count_sampled"):
        if name in fam:
            continue
        fam[name], _ = timed(qs[name], spark, args.sf_dir)
        print(f"# {name}: {fam[name]}s", file=sys.stderr, flush=True)
        save()
    rec["graph_family_total_sec"] = round(sum(fam.values()), 3)

    # 2. decontamination dense vs LSH
    dec = rec.setdefault("decontaminate_sec", {})
    for name in ("x_decontaminate_semantic_lsh", "x_decontaminate_semantic"):
        if name in dec:
            continue
        dec[name], n = timed(qs[name], spark, args.sf_dir)
        print(f"# {name}: {dec[name]}s (n={n})", file=sys.stderr, flush=True)
        save()

    # 3. target encoding shuffle vs bucketed
    tenc = rec.setdefault("target_encoding_sec", {})
    for name in ("x_target_encoding", "x_target_encoding_bucketed"):
        if name in tenc:
            continue
        tenc[name], _ = timed(qs[name], spark, args.sf_dir)
        print(f"# {name}: {tenc[name]}s", file=sys.stderr, flush=True)
        save()
    if "x_target_encoding_bucketed_join_only" not in tenc:
        # the recurring-run cost: tables already bucketed, join+agg only
        from kafka_connect_sse_spark.operators.pipeline import (
            tenc_bucketed_seg,
        )

        t0 = time.perf_counter()
        tenc_bucketed_seg(spark).count()
        tenc["x_target_encoding_bucketed_join_only"] = round(
            time.perf_counter() - t0, 3
        )
        save()

    save()


if __name__ == "__main__":
    main()
