"""A/B: zip_with shingles vs the superseded transform-slice form (round 8).

The pre-r8 `shingles()` built token k-shingles as
``transform(sequence(0, n-k), i -> concat_ws(' ', slice(toks, i+1, k)))``
— the lambda references the OUTER ``toks = split(text, ' ')`` expression,
which Catalyst re-evaluates (re-splitting the whole document) per array
ELEMENT on the interpreted lambda path.  The r8 form is a zip_with chain
over k top-level slices: plain per-row arguments, evaluated once.

Both forms are measured here on the same downstream shape every consumer
runs — explode to the (doc_id, shingle) relation and count — plus one
real consumer end-to-end (x_contam_estimate).  Output parity is asserted
on the exploded relation (bit-identical multisets).

Usage: python tools/ab_shingles.py [--sf DIR] [--runs 3] [--record]
--record appends to tools/ab_shingles_results.json (rendered into
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

from pyspark.sql import functions as F  # noqa: E402


def legacy_shingles(text_col, k: int = 3):
    """The superseded transform-slice form, kept ONLY for this A/B."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.operators.dedup import shingles
    from kafka_connect_sse_spark.registry import queries
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, args.sf, "documents")

    def exploded(sh_expr):
        return d.select("doc_id", F.explode(sh_expr).alias("sh"))

    # parity first: the rewrite must be a pure physical change
    old_rel = exploded(legacy_shingles(F.col("text")))
    new_rel = exploded(shingles(F.col("text"), 3))
    diff = old_rel.exceptAll(new_rel).count() + new_rel.exceptAll(old_rel).count()
    assert diff == 0, f"shingle forms diverged: {diff} rows"

    qs = queries()
    variants = {
        "explode_legacy_transform": lambda: old_rel,
        "explode_zipwith": lambda: new_rel,
        "contam_estimate_current": lambda: qs["x_contam_estimate"](
            spark, args.sf
        ),
    }
    rec = {"sf": args.sf, "variants": {}}
    for name, fn in variants.items():
        fn().count()  # warm (codegen/broadcast caches), not recorded
        times = []
        rows = None
        for _ in range(args.runs):
            t0 = time.monotonic()
            rows = fn().count()
            times.append(round(time.monotonic() - t0, 3))
        rec["variants"][name] = {
            "median_s": statistics.median(times),
            "times": times,
            "rows": rows,
        }
    print(json.dumps(rec))

    if args.record:
        path = os.path.join(
            os.path.dirname(__file__), "ab_shingles_results.json"
        )
        recs = json.load(open(path)) if os.path.exists(path) else []
        recs = [r for r in recs if r["sf"] != args.sf] + [rec]
        with open(path, "w") as fh:
            json.dump(recs, fh, indent=1)
        print(f"recorded -> {path}")


if __name__ == "__main__":
    main()
