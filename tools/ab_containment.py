"""Round-14 interleaved A/B (VERDICT r13 item 1): x_containment_dedup's
postings shuffle keyed on the variable-width shingle STRING (round-13
form, inlined below) vs the fixed-width 16-byte unhex(md5(shingle))
DIGEST (HEAD).  Same session, legs alternated A,B,A,B,... so both sample
the same host phase; noop sink (guide §1.4); result equality asserted
once per scale.

    python tools/ab_containment.py --sf /root/repo/testdata/sf1 --runs 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def containment_old(spark, sf_dir):
    """Round-13 form: postings keyed on the shingle string (verbatim from
    commit 927fe31's containment_dedup, max_df='auto' path)."""
    from kafka_connect_sse_spark.io import load_table
    from kafka_connect_sse_spark.operators.dedup import (
        CONTAIN_DF_FLOOR,
        CONTAIN_DF_HEADROOM,
        CONTAIN_MIN_SHINGLES,
        CONTAIN_PROFILE_PREFIX,
        CONTAIN_THR,
        shingle_array,
    )
    from kafka_connect_sse_spark.plans import spread

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", "lang", F.explode(shingle_array(F.col("text"))).alias("shingle")
    )
    sizes = d.select(
        "doc_id", F.size(shingle_array(F.col("text"))).alias("n")
    ).filter(F.col("n") > 0)
    postings = (
        sh.filter(F.col("lang").isNotNull())
        .groupBy("shingle", "lang")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    prof = (
        sh.filter(F.col("lang").isNotNull())
        .filter(F.md5(F.col("shingle")).startswith(CONTAIN_PROFILE_PREFIX))
        .groupBy("shingle", "lang")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
    )
    hist = prof.groupBy("df").agg(F.count("*").alias("cnt"))
    h2 = hist.select(F.col("df").alias("df2"), F.col("cnt").alias("cnt2"))
    cum = (
        hist.join(h2, F.col("df2") <= F.col("df"))
        .groupBy("df")
        .agg(F.sum("cnt2").alias("cum"))
    )
    tot = hist.agg(F.sum("cnt").alias("n_lists"))
    p99 = (
        cum.crossJoin(tot)
        .filter(F.col("cum") >= F.expr("(99 * n_lists + 99) div 100"))
        .agg(F.min("df").alias("p99_df"))
    )
    cap = p99.select(
        F.greatest(
            F.lit(CONTAIN_DF_FLOOR),
            F.lit(CONTAIN_DF_HEADROOM) * F.coalesce(F.col("p99_df"), F.lit(0)),
        ).alias("cap_df")
    )
    postings = postings.crossJoin(cap).filter(F.size("ds") <= F.col("cap_df"))
    inter = (
        postings.select(F.explode("ds").alias("inner_id"), "ds")
        .select("inner_id", F.explode("ds").alias("outer_id"))
        .filter(F.col("inner_id") != F.col("outer_id"))
        .select(
            (
                F.shiftleft(F.col("inner_id").cast("long"), 32)
                + F.col("outer_id").cast("long")
            ).alias("pk")
        )
        .groupBy("pk")
        .agg(F.count("*").alias("n_common"))
        .select(
            F.shiftright(F.col("pk"), 32).alias("inner_id"),
            F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("outer_id"),
            "n_common",
        )
    )
    s = sizes.alias("s")
    cont = F.col("n_common").cast("double") / F.col("s.n")
    return (
        inter.join(s, F.col("inner_id") == F.col("s.doc_id"))
        .filter((cont >= CONTAIN_THR) & (F.col("s.n") >= CONTAIN_MIN_SHINGLES))
        .select(
            "inner_id",
            "outer_id",
            F.col("s.n").alias("n_inner"),
            "n_common",
            F.round(cont, 6).alias("containment"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument(
        "--skip-equality", action="store_true",
        help="skip the collect-based result-equality pass (sf10: already "
        "proven at sf0.001/0.01/0.1/1; a collect of both legs doubles "
        "the wall cost)")
    args = ap.parse_args()

    from kafka_connect_sse_spark.operators.dedup import containment_dedup
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="ab-containment")
    spark.sparkContext.setLogLevel("ERROR")

    legs = {"old_string_key": containment_old, "new_digest_key": containment_dedup}

    if not args.skip_equality:
        # result equality once (sorted rows)
        rows = {}
        for name, fn in legs.items():
            rows[name] = sorted(map(tuple, fn(spark, args.sf).collect()))
        assert rows["old_string_key"] == rows["new_digest_key"], "RESULTS DIFFER"
        print(
            f"# results identical: {len(rows['new_digest_key'])} rows",
            file=sys.stderr,
        )

    times: dict[str, list] = {k: [] for k in legs}
    for _ in range(args.warmups):
        for name, fn in legs.items():
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    for i in range(args.runs):
        for name, fn in legs.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf": args.sf,
        "runs": {k: v for k, v in times.items()},
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
