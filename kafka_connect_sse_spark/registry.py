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
# registry.  Rounds 1-3 put 143 distinct operators on driver-green record
# (43 r1 + 50 r2 + 50 r3, zero failures).  The round-4 prefix lists exactly
# the 31 operators without a *current* driver record, per VERDICT r3 item 1:
#   * 3 stale-green aggregates — their r1 green predates the r2
#     DECIMAL->DOUBLE output-contract change (commit dc1eb57), so the driver
#     has never verified the shipping code;
#   * the 23 operators added in round 3 (registered past the r3 window);
#   * the 5 twins deliberately deferred from the r3 window.
# After this window goes green, every registered operator has a
# driver-attested CORRECTNESS row for its current contract (conditionals
# excepted).  Positions 32-50 hold round-4 additions, if any, so new
# surface never again outruns the driver window.
_PRIORITY = (
    # -- round-4 driver window --
    # stale-green aggregates (output contract changed r2; re-attest first)
    "q_agg_global",
    "q_agg_groupby",
    "q_agg_filtered",
    # round-3 additions in module order: dedup/similarity/text tier
    "x_dedup_prefix",
    "x_dedup_incremental",
    "x_contam_estimate",
    "x_embed_quantize",
    "x_word_entropy",
    # round-3 additions: pipeline/packing tier
    "x_seq_tensorize",
    # round-3 additions: multimodal real decoders
    "x_multimodal_decode",
    "x_multimodal_audio_decode",
    "x_multimodal_video_sample",
    # round-3 additions: relational/join/window/agg singles
    "q_join_asof_nearest",
    "q_cdc_scd2",
    "q_win_time_range",
    "q_win_count_distinct",
    "q_agg_hll_mergeable",
    "q_agg_kll_mergeable",
    "q_agg_listagg",
    "q_agg_bitmap_distinct",
    "q_agg_theta_overlap",
    # round-3 additions: scalar-function batteries
    "q_fn_url",
    "q_fn_try_arithmetic",
    "q_fn_variant",
    # round-3 additions: streaming + sinks
    "s_checkpoint_resume",
    "snk_jsonl",
    # the five twins deferred from the round-3 window
    "x_multimodal_resize",
    "x_multimodal_framesample",
    "q_fn_string3",
    "q_fn_datetime2",
    "q_set_intersect_all",
    # -- positions 32+: round-4 additions append here --
    # formerly conditional-absent; now real via the pure-Python OCF codec
    "snk_avro",
    # XML content-type tier (Spark 4 from_xml), new in round 4
    "q_fn_xml",
    # round-4 additions (positions 34-41): sampling/mixture/skew tier,
    # runtime pruning, recursive parity, resampling, Arrow map, layout sink
    "x_sample_reservoir",
    "x_interleave_sources",
    "x_skew_profile",
    "q_join_bloom_prune",
    "q_transitive_closure",
    "q_ts_downsample",
    "u_arrow_map",
    "snk_parquet_sorted",
    # round-4 additions (positions 42-43): two-stage ANN, join-driven pruning
    "x_ann_rerank",
    "q_join_dpp",
    # round-4 additions (positions 44-46): null-safe join semantics,
    # BPE-training pair counts, corpus data card
    "q_join_null_safe",
    "x_bpe_pair_counts",
    "x_data_card",
    # round-4 addition (position 47): watermark-evicted outer stream join
    "s_join_stream_stream_outer",
    # round-4 addition (position 48): contrastive-training negative mining
    "x_hard_negatives",
    # positions 49-50 deliberately left to the registration order: they
    # re-attest the two oldest r1 records (src_parquet_scan,
    # q_project_rename) under the current driver, closing the loop on the
    # oldest evidence in the record.
    #
    # After this window goes green, EVERY registered operator has a
    # driver-attested CORRECTNESS row for its current contract
    # (conditionals excepted).  Round-5 policy: if new operators are
    # added they lead the window as before; remaining slots rotate the
    # ops with the OLDEST driver record (r1 first) so the whole record
    # keeps refreshing instead of aging in place.
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
