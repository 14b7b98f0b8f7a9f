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
# registry.  After round 4, EVERY registered operator holds a driver-green
# CORRECTNESS row (188/188) — so from round 5 on the window's job is
# EVIDENCE FRESHNESS, executing the rotation policy VERDICT r4 item 1
# ordered: new/modified operators lead (their old records cover old code),
# then the operators holding the OLDEST driver record — all 38 r1-era rows
# first, then the oldest r2 rows — so no record ages past ~2 rounds.
#
# Round-5 window composition (50 entries):
#   1      src_sse_multi        — new this round (multi-stream SSE fan-in)
#   2-5    ops whose code changed this round (r2/r4 records now stale):
#          x_fingerprint (NULL guard), x_bpe_pair_counts (TakeOrdered
#          rewrite), q_transitive_closure (full-tuple anti-join parity),
#          s_join_stream_stream_outer (fixture-copy fix)
#   6-43   the complete r1 cohort (38 ops, green since round 1)
#   44-50  oldest/stalest remaining rows: six load-bearing r2 records
#          (ingest, landing sink, broadcast/multiway joins, minhash
#          dedup, ANN baseline) plus x_dedup_incremental, whose oracle
#          was rewritten this round (inverted-index ground truth) — the
#          rest of the r2 cohort rotates in round 6.
_PRIORITY = (
    # new this round
    "src_sse_multi",
    # modified this round — re-attest current code
    "x_fingerprint",
    "x_bpe_pair_counts",
    "q_transitive_closure",
    "s_join_stream_stream_outer",
    # -- r1 cohort: projection / filter --
    "q_project_computed",
    "q_filter_basic",
    "q_filter_in_between",
    "q_filter_null",
    "q_filter_like_regex",
    "q_coalesce_defaults",
    "q_distinct",
    "q_sort_multikey",
    # -- r1 cohort: joins --
    "q_join_inner_shuffle",
    "q_join_left_outer",
    "q_join_full_outer",
    "q_join_left_semi",
    "q_join_left_anti",
    "q_join_cross",
    "q_join_theta_range",
    "q_join_self",
    "q_join_asof",
    "q_join_salted_skew",
    "q_join_range_banded",
    "q_in_subquery",
    # -- r1 cohort: aggregates --
    "q_agg_count_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_unpivot",
    "q_agg_min_max_by",
    "q_agg_percentile",
    "q_agg_pivot",
    "q_scalar_subquery",
    "q_agg_stats",
    # -- r1 cohort: windows --
    "q_win_ranking",
    "q_win_lag_lead",
    "q_win_moving_avg",
    "q_win_range_frame",
    "q_win_first_last",
    "q_win_pct",
    "q_win_nth_value",
    "q_topk_per_group",
    # -- oldest r2 rows: the load-bearing seven --
    "src_sse_stream",
    "snk_sse_landing",
    "q_join_inner_broadcast",
    "q_join_multiway",
    # oracle rewritten round 5 (inverted-index ground truth) — re-attest
    # alongside its minhash twin; u_pandas_udf (r2, unchanged, exercised
    # by pytest + every bench run) yields its slot
    "x_dedup_incremental",
    "x_dedup_near_minhash",
    "x_sim_topk_cosine",
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
