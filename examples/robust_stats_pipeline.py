"""End-to-end robust-statistics report over the events/lineitem fixtures.

The decision chain an analytics team runs when the data may contain
spikes, heavy tails, or corrupt extremes — every stage the rank-based
twin of a classical moment statistic already in the registry:

    trend        q_ts_theil_sen   (HOW steep — median pairwise slope)
               + q_ts_mann_kendall (HOW sure — tie-corrected S / z)
               + q_ts_changepoint  (WHERE it broke — max between-segment
                                    statistic, day-tiebroken argmax)
               + q_win_median      (rolling exact median vs the spiky
                                    moving average)
    location     q_agg_hodges_lehmann (the rank-sum test's point
                                    estimate; 29% breakdown)
               + q_agg_trimmed_mean  (trimmed + winsorized means)
    comparison   q_agg_mann_whitney  (rank-sum U between groups)
    association  q_agg_spearman + q_agg_kendall_tau (monotone rank
                                    association, two weightings)
               + q_agg_cramers_v     (categorical association)

Every stage is the EXACT-oracle-checked operator from the registry;
this script only composes them and prints a one-screen report.  Usage:

    python examples/robust_stats_pipeline.py [--sf-dir /root/testdata/sf0.001]
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

    print(f"== robust-statistics report @ {args.sf_dir}\n")

    print("-- trend per event type (Theil-Sen slope + Mann-Kendall z)")
    ts = {
        r["event_type"]: r
        for r in q["q_ts_theil_sen"](spark, args.sf_dir).collect()
    }
    mk = {
        r["event_type"]: r
        for r in q["q_ts_mann_kendall"](spark, args.sf_dir).collect()
    }
    for et in sorted(ts):
        print(
            f"  {et:<10} slope={ts[et]['ts_slope']:+.3f}/day "
            f"z={mk[et]['mk_z']:+.2f} over {ts[et]['n_days']} days"
        )

    print("\n-- largest level shift per type (change-point locator)")
    for r in sorted(
        q["q_ts_changepoint"](spark, args.sf_dir).collect(),
        key=lambda r: -abs(r["mean_shift"]),
    )[:3]:
        print(
            f"  {r['event_type']:<10} {r['cp_day']}: "
            f"{r['mean_before']:.1f} -> {r['mean_after']:.1f}/day "
            f"(shift {r['mean_shift']:+.1f})"
        )

    print("\n-- quantity location per return flag (robust vs classical)")
    hl = {
        r["l_returnflag"]: r
        for r in q["q_agg_hodges_lehmann"](spark, args.sf_dir).collect()
    }
    tm = {
        r["l_returnflag"]: r
        for r in q["q_agg_trimmed_mean"](spark, args.sf_dir).collect()
    }
    for f in sorted(hl):
        print(
            f"  flag {f}: HL={hl[f]['hl_estimate']:.2f} "
            f"trimmed={tm[f]['trimmed_mean']:.2f} "
            f"winsorized={tm[f]['winsorized_mean']:.2f}"
        )

    print("\n-- A vs R quantity comparison (Mann-Whitney U)")
    mw = q["q_agg_mann_whitney"](spark, args.sf_dir).collect()[0]
    print(
        f"  U1={mw['u1']:.1f} over n1={mw['n1']}, n2={mw['n2']} "
        f"-> z={mw['mw_z']:+.3f}"
    )

    print("\n-- quantity/discount association per flag (rank measures)")
    sp = {
        r["l_returnflag"]: r
        for r in q["q_agg_spearman"](spark, args.sf_dir).collect()
    }
    kt = {
        r["l_returnflag"]: r
        for r in q["q_agg_kendall_tau"](spark, args.sf_dir).collect()
    }
    for f in sorted(sp):
        print(
            f"  flag {f}: rho={sp[f]['rho_spearman']:+.4f} "
            f"tau_b={kt[f]['tau_b']:+.4f}"
        )

    cv = q["q_agg_cramers_v"](spark, args.sf_dir).collect()[0]
    print(
        f"\n-- event-type x weekday association: chi2={cv['chi2']:.2f} "
        f"V={cv['cramers_v']:.4f} over {cv['n_events']} events"
    )

    spark.stop()


if __name__ == "__main__":
    main()
