"""Operator/query registry: pairs every implemented operator with an ANSI-SQL
DuckDB oracle (where expressible) for the driver's correctness gate.

Every operator from SURVEY.md §2.4 lands here via the @register decorator:

    @register("<op_id>", oracle="SELECT ...")
    def <op_id>(spark, sf_dir): ...

Conventions that keep the cross-engine value-hash stable (FIXTURES.md §6):
  * every computed column is aliased identically in Spark and oracle SQL;
  * money-style double aggregates go through DECIMAL(18,2) so partial-sum
    order cannot perturb low bits (exact in both engines);
  * non-exact float aggregates (stddev/corr/cosine) are rounded explicitly;
  * timestamps are emitted as DATE or as formatted strings — never raw
    timestamps — so session-timezone handling can't skew the comparison;
  * top-k orderings always carry a unique tiebreak key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# submodules that register queries on import
_MODULES = (
    "kafka_connect_sse_spark.operators.relational",
    "kafka_connect_sse_spark.operators.joins",
    "kafka_connect_sse_spark.operators.aggregates",
    "kafka_connect_sse_spark.operators.windows",
    "kafka_connect_sse_spark.operators.setops",
    "kafka_connect_sse_spark.functions.scalar",
    "kafka_connect_sse_spark.operators.dedup",
    "kafka_connect_sse_spark.operators.similarity",
    "kafka_connect_sse_spark.operators.text",
    "kafka_connect_sse_spark.operators.multimodal",
    "kafka_connect_sse_spark.operators.pipeline",
    "kafka_connect_sse_spark.operators.udfs",
    "kafka_connect_sse_spark.streaming.queries",
    "kafka_connect_sse_spark.streaming.landing",
    "kafka_connect_sse_spark.operators.sinks",
)

# Operators that register only when an optional dependency imports
# (streaming/queries.py gates s_transform_with_state on protobuf).  They
# are EXCLUDED from SURVEY.md's declared total, the COVERAGE.md
# inventory, and the sf1 gate's completeness compare — one constant so
# all three consumers (tools/gen_coverage.py, tools/sf1_gate.py,
# tests/test_operators.py) cannot drift (ADVICE r7 item 1).
CONDITIONAL_OPS = frozenset({"s_transform_with_state"})

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # driver hands us its own session; pin runtime-settable conf
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's correctness gate checks a bounded 50-entry prefix of the
# registry.  Every registered operator holds a driver-green CORRECTNESS
# row, so the window's job is EVIDENCE FRESHNESS (rotation policy,
# VERDICT r4 item 1): new/modified operators lead (their old records
# cover old code), then the operators holding the OLDEST driver record,
# topped up from the next-oldest cohort — so no record ages past ~3
# rounds.
#
# Round-7 window composition (50 entries) — VERDICT r6 items 1-3: the
# r3 cohort rotates through, led by the three ops whose CODE changed
# this round (the two de-hinted joins + the materialized ANN index —
# VERDICT r6 item 2 explicitly requires both de-hinted ops green in the
# r7 driver window, so they take slots even though their records are
# r6-fresh).  That leaves 47 slots for the 50-op r3 cohort; the 3
# deferred rows are the cohort members with the strongest independent
# current-code evidence — q_sessionize
# (tests/test_sessionize_property.py), x_seq_pack
# (tests/test_pack_property.py), x_corpus_prep
# (tests/test_pipeline_ops.py), each also green in this round's
# builder-side full sf0.01 + sf1 sweeps — and LEAD ROUND 8's window
# ahead of the r4 cohort.
#   1-3    code modified this round: x_containment_dedup +
#          x_tfidf_top_term (unbounded broadcast hints dropped — AQE
#          now decides), x_ann_pipeline (reads the materialized
#          array<tinyint> index instead of re-quantizing inline)
#   4-50   the r3 cohort minus the 3 deferred rows: the r3 sinks, the
#          percentile/histogram/mode aggregate tier, the relational
#          composites, bucketed join, top-k limit, the 6-op set-ops
#          tier, the 14-op scalar-function tier,
#          s_dedup_within_watermark, and the r3-era x_* corpus ops
_PRIORITY = (
    # modified this round — re-attest current code
    "x_containment_dedup",
    "x_tfidf_top_term",
    "x_ann_pipeline",
    # -- r3 cohort: sources / sinks --
    "snk_compact_small_files",
    "snk_csv",
    "snk_parquet_pruned",
    # -- r3 cohort: aggregates --
    "q_agg_bool_bit",
    "q_agg_histogram",
    "q_agg_median_mode",
    "q_agg_percentile_approx",
    # -- r3 cohort: relational composites / CDC / time-series --
    "q_compact_latest",
    "q_exists_correlated",
    "q_incremental_merge",
    "q_lateral_explode",
    "q_merge_upsert",
    "q_not_in_nullaware",
    "q_ts_gapfill",
    # -- r3 cohort: joins / limits --
    "q_join_bucketed",
    "q_limit_topk",
    # -- r3 cohort: set operations --
    "q_set_except",
    "q_set_except_all",
    "q_set_intersect",
    "q_set_union_all",
    "q_set_union_by_name",
    "q_set_union_distinct",
    # -- r3 cohort: scalar functions --
    "q_fn_array",
    "q_fn_bitwise",
    "q_fn_cast",
    "q_fn_conditional",
    "q_fn_datetime",
    "q_fn_hash",
    "q_fn_higher_order",
    "q_fn_json",
    "q_fn_json_struct",
    "q_fn_map",
    "q_fn_math",
    "q_fn_string",
    "q_fn_string2",
    "q_fn_struct",
    # -- r3 cohort: streaming --
    "s_dedup_within_watermark",
    # -- r3 cohort: x_* corpus ops --
    "x_dedup_near_embedding_lsh",
    "x_doc_chunk",
    "x_doc_concat",
    "x_lang_balance",
    "x_multimodal_features",
    "x_pii_scrub",
    "x_repetition_score",
    "x_sample_stratified",
    "x_sim_topk_ivf",
    "x_sim_topk_lsh_multiprobe",
)


def _ordered(d: dict) -> dict:
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return _ordered(ORACLE)
