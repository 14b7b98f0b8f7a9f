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
# Round-6 window composition (50 entries) — VERDICT r5 item 1: the
# complete 43-op r2 cohort rotates through, led by this round's
# new/modified ops, topped up with the first two r3 rows in registry
# order.  After this round no record is older than r3.
#   1-3    new this round: u_grouped_map_batched (batch-the-keys grouped
#          map, the executable fix for the measured 94k rows/s per-key
#          pandas floor), x_ann_pipeline (IVF prefilter → int8
#          shortlist → fp64 re-rank, the composition the x_ann_rerank
#          attribution names as the scale lever), and
#          x_containment_dedup (asymmetric shingle containment — the
#          quoted-inside/boilerplate-wrapped duplication Jaccard-based
#          dedup structurally misses)
#   4-7    ops whose code changed this round: q_transitive_closure
#          (cap-fired RuntimeWarning), src_sse_multi + snk_sse_landing
#          (loud TimeoutError on landing-wait expiry),
#          s_join_stream_stream_outer (pid-keyed scratch dir)
#   8-50   the complete r2 cohort (43 ops: sources/sinks, the r2
#          aggregates, q_win_running_sum, the 10-op streaming tier, the
#          4-op UDF ladder, the 19 r2-era x_* text/dedup/similarity
#          ops) — the full r3 cohort is round 7's window
_PRIORITY = (
    # new this round
    "u_grouped_map_batched",
    "x_ann_pipeline",
    "x_containment_dedup",
    # modified this round — re-attest current code
    "q_transitive_closure",
    "src_sse_multi",
    "snk_sse_landing",
    "s_join_stream_stream_outer",
    # -- r2 cohort: sources / sinks --
    "src_jsonl_scan",
    "src_parquet_evolve",
    "snk_parquet",
    "snk_memory_topic",
    "snk_orc",
    # -- r2 cohort: aggregates / window --
    "q_agg_having",
    "q_agg_collect_sorted",
    "q_agg_approx_distinct",
    "q_agg_bytes_by_type",
    "q_win_running_sum",
    # -- r2 cohort: streaming tier --
    "s_window_tumbling",
    "s_window_sliding",
    "s_window_session",
    "s_watermark_late",
    "s_dedup_watermarked",
    "s_join_stream_static",
    "s_stateful_counter",
    "s_join_stream_stream",
    "s_foreachbatch_dlq",
    "s_observe_metrics",
    # -- r2 cohort: UDF ladder --
    "u_py_udf",
    "u_pandas_udf",
    "u_grouped_map",
    "u_sql_udtf",
    # -- r2 cohort: x_* text quality / vocab --
    "x_text_stats",
    "x_token_count_regex",
    "x_quality_score",
    "x_langid_ngram",
    "x_lang_like_filter",
    "x_tfidf_top_term",
    "x_text_top_bigrams",
    "x_decontaminate",
    # -- r2 cohort: x_* dedup family --
    "x_dedup_exact",
    "x_dedup_exact_hash",
    "x_dedup_simhash",
    "x_dedup_near_embedding",
    "x_dedup_clusters",
    "x_dedup_keep_best",
    "x_ngram_jaccard",
    # -- r2 cohort: x_* similarity / multimodal --
    "x_embed_norms",
    "x_sim_lsh_bucketed",
    "x_sim_topk_lsh",
    "x_multimodal_cols",
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
