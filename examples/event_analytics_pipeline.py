"""Product-analytics dashboard over the event stream — the queries the
reference's SSE -> Kafka -> ksqlDB topology exists to serve, composed
from the registry's analytics tier:

    events
      -> conversion funnel    (strict-order view -> click -> purchase)
      -> cohort retention     (first-seen-day cohorts, D+1 / D+7)
      -> last-touch attribution (which touch gets purchase credit)
      -> volume anomalies     (per-type daily z-scores, |z| > 2)
      -> Pareto / ABC         (revenue concentration over parts)
      -> RFM segmentation     (recency/frequency/monetary quartile grid)

Every stage is the EXACT-oracle-checked operator from the registry; this
script only composes them.  In production the events table is the
checkpointed parquet landing of the SSE source (snk_sse_landing) — the
same analytics run unchanged on the live stream's accumulating history.

Usage:
    python examples/event_analytics_pipeline.py \
        [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_sse_spark.registry import queries  # noqa: E402
from kafka_connect_sse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    f = qs["q_funnel_stages"](spark, args.sf_dir).collect()[0]
    print(
        f"funnel: {f['n_users']} users -> view {f['reached_view']} "
        f"-> click {f['reached_click']} -> purchase {f['reached_purchase']} "
        f"(overall {f['conv_overall']:.1%})"
    )

    ret = qs["q_retention_cohort"](spark, args.sf_dir).orderBy("cohort_day")
    for r in ret.collect():
        print(
            f"cohort {r['cohort_day']}: {r['n_users']} users, "
            f"D1 {r['rate_d1']:.1%}, D7 {r['rate_d7']:.1%}"
        )

    att = qs["q_attribution_last_touch"](spark, args.sf_dir).collect()
    print(
        "attribution:",
        {r["attributed"]: r["n_purchases"] for r in att},
    )

    anom = qs["q_anomaly_zscore_daily"](spark, args.sf_dir)
    n_anom = anom.filter("is_anomaly").count()
    worst = anom.orderBy(F.abs(F.col("z")).desc()).limit(1).collect()[0]
    print(
        f"anomalies: {n_anom} flagged; extreme day "
        f"{worst['event_type']}@{worst['day']} z={worst['z']}"
    )

    abc = {r["abc"]: r for r in qs["q_pareto_abc"](spark, args.sf_dir).collect()}
    print(
        "ABC: "
        + ", ".join(
            f"{k}={abc[k]['n_parts']} parts ({abc[k]['revenue_share']:.1%} rev)"
            for k in sorted(abc)
        )
    )

    rfm = qs["q_rfm_segments"](spark, args.sf_dir)
    champions = rfm.filter("r_q = 1 AND f_q = 1 AND m_q = 1").collect()
    n_cells = rfm.count()
    n_champ = champions[0]["n_users"] if champions else 0
    print(f"RFM: {n_cells} populated cells, {n_champ} champions (1,1,1)")

    print("event analytics complete")


if __name__ == "__main__":
    main()
