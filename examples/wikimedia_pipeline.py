"""End-to-end example: the reference's Wikipedia deployment, Spark-first.

The reference's docker-compose runs five services (broker, schema registry,
Connect worker with the SSE connector, ksqlDB, Control Center) to get from
the Wikimedia SSE endpoint to SQL analytics (docker-compose.yml:1-130).
This script is the whole topology in one process:

    SSE endpoint ──sse source──▶ raw parquet landing (replayable)
                                        │
                                        ▼
                          spark.sql over typed recentchange rows

Run (requires network access to the endpoint — otherwise point --uri at
any SSE server, e.g. the test stub in tests/test_sse_source.py):

    spark-submit examples/wikimedia_pipeline.py \
        --uri https://stream.wikimedia.org/v2/stream/recentchange \
        --landing /tmp/wikimedia/raw --checkpoint /tmp/wikimedia/ckpt \
        --seconds 30
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kafka_connect_sse_spark.schemas import parse_recentchange
from kafka_connect_sse_spark.session import get_spark
from kafka_connect_sse_spark.streaming.landing import land_sse_to_parquet


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uri", required=True)
    ap.add_argument("--landing", default="/tmp/wikimedia/raw")
    ap.add_argument("--checkpoint", default="/tmp/wikimedia/ckpt")
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()

    spark = get_spark(app_name="wikimedia-sse-pipeline")

    # 1. ingest: the connector tier (auth/headers/rate-limit/backoff are
    #    options — see sources/sse.py for the full ConfigDef surface)
    query = land_sse_to_parquet(
        spark,
        args.uri,
        args.landing,
        args.checkpoint,
        options={
            "sse.header.Accept-Language": "en",
            "rate.limit.requests.per.second": "10",
            "retry.max.attempts": "10",
            # Last-Event-ID resume on reconnect defaults to true;
            # EventStreams honors it, so drops inside a run lose nothing
            "sse.resume.last.event.id": "true",
        },
    )
    print(f"landing {args.uri} → {args.landing} for {args.seconds}s ...")
    time.sleep(args.seconds)
    query.stop()
    query.awaitTermination(30)

    # 2. analytics: the ksqlDB tier, as plain Spark SQL over the landing zone
    raw = spark.read.parquet(args.landing)
    typed = parse_recentchange(raw).filter(F.col("rc_valid"))
    typed.select("rc.*", "event_time").createOrReplaceTempView("recentchange")

    print("\nTop wikis by edit volume:")
    spark.sql(
        """
        SELECT wiki, count(*) AS edits,
               sum(CASE WHEN bot THEN 1 ELSE 0 END) AS bot_edits
        FROM recentchange
        WHERE type = 'edit'
        GROUP BY wiki ORDER BY edits DESC LIMIT 10
        """
    ).show(truncate=False)

    print("Edits per minute:")
    spark.sql(
        """
        SELECT date_trunc('minute', event_time) AS minute, count(*) AS n
        FROM recentchange GROUP BY 1 ORDER BY 1
        """
    ).show(truncate=False)


if __name__ == "__main__":
    main()
