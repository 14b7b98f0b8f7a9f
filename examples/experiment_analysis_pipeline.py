"""End-to-end A/B-experiment readout over the events/orders fixtures.

The analysis chain an experimentation platform runs on a landed event
stream — each stage the EXACT-oracle-checked operator from the
registry, composed into one report:

    significance   q_agg_welch_t        (unequal-variance t)
                 + q_agg_mann_whitney   (rank-sum — no normality
                                         assumption)
                 + q_agg_wilcoxon_signed (within-user paired test:
                                         kills between-user variance)
    effect size    q_agg_cohens_d       (pooled-SD d + Hedges g —
                                         at scale everything is
                                         "significant"; only effect
                                         size says whether it matters)
    uncertainty    q_agg_bootstrap_ci   (32 deterministic Poisson
                                         replicates, one scan)
    distribution   q_agg_iqr_outliers   (Tukey fences)
                 + q_agg_gini           (value concentration)
    dependence     q_agg_mutual_info    (traffic mix vs weekday +
                                         Theil's U)

Usage:

    python examples/experiment_analysis_pipeline.py \
        [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kafka_connect_sse_spark.registry import queries  # noqa: E402
from kafka_connect_sse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    print(f"== experiment readout @ {args.sf_dir}\n")

    print("-- significance (three independent tests)")
    w = q["q_agg_welch_t"](spark, args.sf_dir).collect()[0]
    print(
        f"   welch t        {w['welch_t']:>10.4f}   "
        f"(means {w['mean_a']:.2f} vs {w['mean_b']:.2f})"
    )
    mw = q["q_agg_mann_whitney"](spark, args.sf_dir).collect()[0]
    print(f"   mann-whitney z {mw['mw_z']:>10.4f}")
    wx = q["q_agg_wilcoxon_signed"](spark, args.sf_dir).collect()[0]
    print(
        f"   wilcoxon z     {wx['wilcoxon_z']:>10.4f}   "
        f"(n_pairs {wx['n']}, W+ {wx['w_plus']:.1f})"
    )

    print("\n-- effect size (purchase vs view value)")
    d = q["q_agg_cohens_d"](spark, args.sf_dir).collect()[0]
    print(
        f"   cohens d {d['cohens_d']:>8.4f}   hedges g "
        f"{d['hedges_g']:>8.4f}   "
        f"(n {d['n_a']}/{d['n_b']})"
    )

    print("\n-- uncertainty (Poisson bootstrap, 32 replicates)")
    b = q["q_agg_bootstrap_ci"](spark, args.sf_dir).collect()[0]
    print(
        f"   mean {b['est_mean']:.2f}   "
        f"CI [{b['boot_lo']:.2f}, {b['boot_hi']:.2f}]   "
        f"se {b['boot_se']:.3f}"
    )

    print("\n-- distribution health")
    for r in q["q_agg_iqr_outliers"](spark, args.sf_dir).collect():
        print(
            f"   flag {r['l_returnflag']}: "
            f"fences [{r['lo_fence']:.1f}, {r['hi_fence']:.1f}]  "
            f"outliers {r['n_outliers']}/{r['n']}"
        )
    for r in sorted(
        q["q_agg_gini"](spark, args.sf_dir).collect(),
        key=lambda r: r["o_orderpriority"],
    ):
        print(
            f"   gini[{r['o_orderpriority']}] = {r['gini']:.4f} "
            f"over {r['n_orders']} orders"
        )

    print("\n-- traffic-mix dependence on weekday")
    mi = q["q_agg_mutual_info"](spark, args.sf_dir).collect()[0]
    print(
        f"   MI {mi['mi']:.4f} nats   H(type) {mi['h_type']:.4f}   "
        f"U {mi['uncertainty_coef']:.4f}"
    )

    print("\nexperiment readout complete")
    spark.stop()


if __name__ == "__main__":
    main()
