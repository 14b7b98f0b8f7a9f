"""End-to-end training-corpus preparation on the engine's operator tier.

The chain a 100 TB data run executes, here runnable at any fixture SF:

    documents
      -> quality gate        (length + language allowlist; scan-pushed)
      -> exact dedup         (md5 digest; 32-byte shuffle keys)
      -> near-dedup          (MinHash LSH candidates + Jaccard verify)
      -> span dedup          (stride-40 duplicated-span ratio; round 8)
      -> perplexity filter   (per-lang bigram-LM NLL outliers; round 8)
      -> language balancing  (deterministic hash-rank quota per lang)
      -> two-level packing   ((lang, shard) contiguous fill + broadcast
                              per-shard offsets — no whole-language task)
      -> tensorization       (hash-vocab token ids, pad to budget)
      -> health profile      (Zipf slope, PMI collocations, CMS-verified
                              heavy hitters, KS drift + chi2 keyness of
                              the focus source; round-8 continuation)
      -> mixture + schedule  (DoReMi-lite source reweighting, leakage-safe
                              cluster split, per-lang curriculum stages;
                              round-8 second continuation)
      -> selection + shape   (logistic quality classifier, DSIR
                              importance resampling toward the target
                              domain, pad-to-bin waste pricing, SemDeDup
                              cells, dup-graph degree profile; round-8
                              third continuation)
      -> corpus economics    (vocab-coverage/OOV curve, per-source
                              novelty attribution, tokenizer fertility;
                              round-8 fourth continuation)
      -> parquet shards      (one directory per language)

Every stage is the EXACT-oracle-checked operator from the registry; this
script only composes them.  Usage:

    python examples/corpus_prep_pipeline.py \
        [--sf-dir /root/testdata/sf0.001] [--out /tmp/corpus_out]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_sse_spark.io import load_table  # noqa: E402
from kafka_connect_sse_spark.operators.dedup import (  # noqa: E402
    minhash_candidates,
)
from kafka_connect_sse_spark.registry import queries  # noqa: E402
from kafka_connect_sse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/corpus_out")
    args = ap.parse_args()

    spark = get_spark(app_name="corpus-prep-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    qs = queries()

    docs = load_table(spark, args.sf_dir, "documents")
    print(f"input docs: {docs.count()}")

    # 1-2. quality gate + exact dedup (keep lowest doc_id per digest)
    filtered = docs.filter(
        (F.col("n_chars") >= 100)
        & F.col("lang").isin("en", "fr", "de", "es", "ja")
    )
    survivors = (
        filtered.withColumn("content_h", F.md5("text"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("content_h").orderBy("doc_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("content_h", "rk")
    )
    print(f"after quality gate + exact dedup: {survivors.count()}")

    # 3. near-dedup: drop the higher doc_id of every verified near-pair
    near = qs["x_dedup_near_minhash"](spark, args.sf_dir).select("doc_b")
    survivors = survivors.join(near, survivors.doc_id == near.doc_b, "left_anti")
    print(f"after near-dedup: {survivors.count()}")

    # 3b. span-level dedup (round 8): docs whose 40-char stride spans
    # are mostly found in OTHER docs — partial duplication the
    # document-level stages above can't see
    spanned = qs["x_dedup_span"](spark, args.sf_dir).filter("drop_doc")
    survivors = survivors.join(
        spanned.select(F.col("doc_id").alias("span_drop")),
        survivors.doc_id == F.col("span_drop"),
        "left_anti",
    )
    print(f"after span dedup: {survivors.count()}")

    # 3c. LM perplexity filter (round 8): drop docs whose bigram NLL is
    # an outlier against their own language's corpus LM
    ppl = qs["x_perplexity_filter"](spark, args.sf_dir).filter(
        ~F.col("keep_doc")
    )
    survivors = survivors.join(
        ppl.select(F.col("doc_id").alias("ppl_drop")),
        survivors.doc_id == F.col("ppl_drop"),
        "left_anti",
    )
    print(f"after perplexity filter: {survivors.count()}")

    # 4-6. balance -> pack -> tensorize (registry ops run the full chain
    # from the fixture; a production run would parameterize them over the
    # survivor frame — same plans either way)
    packs = qs["x_seq_pack"](spark, args.sf_dir)
    tensors = qs["x_seq_tensorize"](spark, args.sf_dir)
    print(f"packs planned: {packs.count()}; tensors: {tensors.count()}")

    # 6b. corpus health profile (round-8 continuation): release-gate
    # statistics a data card ships with — Zipf slope (synthetic/garbled
    # corpus detector), top PMI collocations, and sketch-verified
    # heavy-hitter frequencies
    zipf = qs["x_zipf_fit"](spark, args.sf_dir).collect()[0]
    print(
        f"zipf: slope={zipf['zipf_slope']} r2={zipf['zipf_r2']} "
        f"vocab={zipf['n_vocab']}"
    )
    pmi_top = qs["x_cooccur_pmi"](spark, args.sf_dir).limit(3).collect()
    print("top collocations:", [(r["x"], r["y"], r["pmi"]) for r in pmi_top])
    hh = qs["x_cms_heavy_hitters"](spark, args.sf_dir)
    bad_hh = hh.filter(
        "NOT (overestimates AND within_bound AND merge_consistent)"
    ).count()
    print(f"heavy hitters: {hh.count()} probed, {bad_hh} guarantee violations")
    ks = qs["x_ks_drift"](spark, args.sf_dir).collect()[0]
    key = qs["x_chi2_keyness"](spark, args.sf_dir).limit(3).collect()
    print(
        f"src0 drift: KS={ks['ks_stat']} "
        f"key tokens={[ (r['w'], r['chi2']) for r in key ]}"
    )

    # 6c. mixture + schedule (round-8 second continuation): the sampling
    # table a mixture-weighted dataloader consumes, the leakage-safe
    # train/val/test assignment (near-dup clusters never straddle eval),
    # and the easy-to-hard curriculum stages
    mix = {r["source"]: r for r in qs["x_domain_mix"](spark, args.sf_dir).collect()}
    capped = [s for s, r in mix.items() if r["mix_weight"] == 5.0]
    print(f"domain mix: {len(mix)} sources, {len(capped)} at the 5x cap")
    splits = {r["split"]: r for r in qs["x_split_leakage_safe"](spark, args.sf_dir).collect()}
    print(
        "split:",
        {k: (v["n_docs"], v["n_clusters"]) for k, v in sorted(splits.items())},
    )
    stages = qs["x_curriculum_order"](spark, args.sf_dir)
    s1 = stages.filter("stage = 1").agg(F.avg("avg_difficulty")).collect()[0][0]
    s4 = stages.filter("stage = 4").agg(F.avg("avg_difficulty")).collect()[0][0]
    print(f"curriculum: stage1 mean difficulty {s1:.3f} -> stage4 {s4:.3f}")

    # 6d. selection + batch shape (round-8 third continuation): the
    # model-based quality gate, DSIR selection toward the target domain,
    # the pad-vs-pack price sheet, and the two dedup-structure views
    qc = qs["x_quality_classifier"](spark, args.sf_dir)
    kept = qc.filter("keep").count()
    print(f"quality classifier: kept {kept}/{qc.count()}")
    dsir = qs["x_importance_resample"](spark, args.sf_dir).limit(3).collect()
    print("DSIR top docs:", [(r["doc_id"], r["log_weight"]) for r in dsir])
    for r in qs["x_pack_efficiency"](spark, args.sf_dir).collect():
        print(
            f"bin<={r['bin_cap']}: {r['n_docs']} docs, "
            f"pad waste {r['pad_waste']:.1%}"
        )
    sem = qs["x_dedup_semantic"](spark, args.sf_dir)
    print(f"SemDeDup: dropped {sem.filter('dropped').count()}/{sem.count()}")
    degs = qs["x_dup_graph_degree"](spark, args.sf_dir).collect()
    print("dup-graph degrees:", sorted((r["degree"], r["n_docs"]) for r in degs))

    # 6e. corpus economics (round-8 fourth continuation): vocabulary
    # sizing, per-source marginal value, tokenizer cost by language
    cov = sorted(
        qs["x_vocab_coverage"](spark, args.sf_dir).collect(),
        key=lambda r: r["k"],
    )
    print("vocab coverage:", [(r["k"], r["coverage"]) for r in cov])
    novel = qs["x_source_novelty"](spark, args.sf_dir)
    top_novel = novel.orderBy(F.col("novelty_ratio").desc(), "source").limit(3).collect()
    print("most novel sources:", [(r["source"], r["novelty_ratio"]) for r in top_novel])
    fert = {r["lang"]: r["fertility"] for r in qs["x_tokenizer_fertility"](spark, args.sf_dir).collect()}
    print("tokenizer fertility by lang:", dict(sorted(fert.items())))

    # 7. land language-partitioned training shards
    out = os.path.join(args.out, "tensors")
    tensors.write.mode("overwrite").partitionBy("lang").parquet(out)
    n_langs = len(
        [d for d in os.listdir(out) if d.startswith("lang=")]
    )
    print(f"wrote {n_langs} language shards under {out}")

    # candidate-stage visibility (what LSH actually proposed)
    cand = minhash_candidates(docs.select("doc_id", "text"))
    print(f"LSH candidate pairs proposed: {cand.count()}")


if __name__ == "__main__":
    main()
