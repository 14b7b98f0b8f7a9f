"""Repo-wide rescan audit: execute every batch operator at sf0.001 and
count FileScan operators per table in the FINAL adaptive plan — the
detector for the AQE no-cross-stage-reuse trap (a relation feeding two
consumers silently recomputes when one consumer becomes a broadcast
stage; see SCALE.md "Named trap").

    python tools/plan_audit.py

Round-9 findings (all adjudicated):
  * q_attribution_linear showed 3 corpus windows -> FIXED (checkpointed
    bounded rollup; plan pin holds it at zero).
  * x_embed_outliers_approx recomputed the distance pipeline per
    consumer -> FIXED (checkpointed (vec_id, dist)).
  * The remaining >=3x ops are DOCUMENTED multi-pass algorithms:
    x_cms_heavy_hitters (sketch + candidate mining + per-source
    merge-consistency proof), x_perplexity_filter (LM build + scoring),
    the power-iteration family (one scan per unrolled step is the
    algorithm), q_agg_mad / x_length_outliers (median-then-deviation
    two-pass with column-pruned scans), q_ts_gapfill (bounds + spine +
    daily).  2x ops are two-branch reads by construction (set ops,
    query-vs-candidate similarity, mergeable-sketch halves).
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from kafka_connect_sse_spark.registry import queries  # noqa: E402
from kafka_connect_sse_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    for name, fn in queries().items():
        if name[:2] == "s_" or name[:4] in ("snk_", "src_"):
            continue  # streaming/sink ops drive their own execution
        try:
            df = fn(spark, SF)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            cut = plan.find("== Initial Plan ==")
            plan = plan if cut == -1 else plan[:cut]
            c: Counter = Counter()
            for line in plan.splitlines():
                if "FileScan parquet" in line:
                    m = re.search(r"(\w+)\.parquet", line)
                    if m:
                        c[m.group(1)] += 1
            multi = {t: n for t, n in c.items() if n >= 2}
            if multi:
                flagged.append((name, multi))
        except Exception as e:  # pragma: no cover - audit tool
            print("ERR", name, str(e)[:80])
    print("ops with >=2 FileScans of one table (see docstring triage):")
    for name, multi in sorted(flagged, key=lambda x: -max(x[1].values())):
        print(" ", name, multi)


if __name__ == "__main__":
    main()
