"""End-to-end example: training-corpus preparation over a document lake.

Runs the full prep chain the engine ships as composable operators —

    parquet documents
      ─▶ quality gate        (length + language allowlist; pushed to scan)
      ─▶ exact dedup         (md5 content digest; 32-byte shuffle keys)
      ─▶ near-dup dedup      (MinHash+LSH banded candidates, exact-Jaccard
                              verified; x_dedup_near_minhash)
      ─▶ language balancing  (content-independent md5 rank per stratum)
      ─▶ sequence packing    (PACK_BUDGET-token packs, ordered concat)
      ─▶ packed parquet out

Every stage is a registered, oracle-verified operator; this script wires
them over a real directory and writes the packed sequences.

Run:

    spark-submit examples/corpus_prep_pipeline.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/corpus_prep
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/corpus_prep")
    args = ap.parse_args()

    from kafka_connect_sse_spark.operators.dedup import x_dedup_near_minhash
    from kafka_connect_sse_spark.operators.pipeline import (
        x_corpus_prep,
        x_doc_concat,
    )
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(app_name="corpus-prep")
    spark.sparkContext.setLogLevel("WARN")

    # near-dup pairs: documents that should collapse to one survivor
    pairs = x_dedup_near_minhash(spark, args.sf_dir)
    n_pairs = pairs.count()

    # per-language prep stats (quality gate -> exact dedup -> balance)
    stats = x_corpus_prep(spark, args.sf_dir)
    stats.show(truncate=False)

    # materialized packed sequences, partitioned by language for pruning
    packed = x_doc_concat(spark, args.sf_dir)
    packed.write.mode("overwrite").partitionBy("lang").parquet(args.out)

    n_packs = spark.read.parquet(args.out).count()
    print(
        f"near-dup pairs: {n_pairs}; packed sequences written: {n_packs} "
        f"-> {args.out}"
    )
    total = (
        stats.agg(F.sum("total_tokens").alias("t")).collect()[0]["t"]
    )
    print(f"kept tokens after prep: {total}")


if __name__ == "__main__":
    main()
