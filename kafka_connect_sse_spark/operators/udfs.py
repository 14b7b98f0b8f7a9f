"""UDF / UDAF / UDTF surface (SURVEY.md §2.4 `u_*`).

The reference has no UDFs — Connect SMTs are its extension slot (Tier 2).
Here the full Spark extension ladder is exercised, slowest to fastest:
row-at-a-time Python UDF (u_py_udf, kept off hot paths), Arrow-vectorized
pandas UDF (u_pandas_udf), grouped-map applyInPandas (u_grouped_map), and a
Python UDTF (u_sql_udtf).  Each deterministic one carries a pure-SQL oracle
reimplementation so the check stays EXACT.  UDF objects are built inside
the query functions (registration needs an active SparkSession).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from ..io import load_table
from ..registry import register

MIX_MULT = 2654435761  # Knuth multiplicative-hash constant
MIX_MOD = 1000000007


def _key_mix(k: int) -> int:
    """Deterministic key mixer (python ints — no overflow)."""
    return (k * MIX_MULT) % MIX_MOD


@register(
    "u_py_udf",
    oracle=f"""
    SELECT o_orderkey,
           (o_orderkey * {MIX_MULT}) % {MIX_MOD} AS mixed
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def u_py_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path — bounded input on purpose;
    at scale this exact expression would be a built-in column expression)."""
    key_mix = udf(_key_mix, "long")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select("o_orderkey", key_mix("o_orderkey").alias("mixed"))


def _log1p_series(v: pd.Series) -> pd.Series:
    import numpy as np

    return pd.Series(np.log1p(v.values))


@register(
    "u_pandas_udf",
    oracle="""
    SELECT o_orderkey, ROUND(LN(1 + o_totalprice), 6) AS log_price
    FROM orders
    """,
)
def u_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (numpy batch math, ~10-100x the
    row-at-a-time path)."""
    log1p_price = pandas_udf(_log1p_series, "double")
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", F.round(log1p_price("o_totalprice"), 6).alias("log_price")
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    m = pdf["o_totalprice"].mean()
    s = pdf["o_totalprice"].std(ddof=1)
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "z": ((pdf["o_totalprice"] - m) / s).round(6),
        }
    )


@register(
    "u_grouped_map",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 6) AS z
    FROM orders
    WHERE o_custkey % 10 = 0
    WINDOW w AS (PARTITION BY o_custkey)
    QUALIFY COUNT(*) OVER w >= 2
    """,
)
def u_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (per-key pandas transform = the UDAF/UDTF
    slot); per-customer z-score, oracle re-expressed as SQL windows.

    Bounded input on purpose (the u_py_udf precedent): this is
    deliberately the slow rung of the ladder — applyInPandas pays a
    fixed per-GROUP Python cost, ~94k rows/s measured — and its
    scale-safe twin u_grouped_map_batched covers the FULL table with
    identical semantics.  The deterministic 10% customer sample (both
    sides, so the oracle gate's semantics are unchanged) bounds the
    sweep-tier checker cost (81.7 s -> ~8 s at sf1, VERDICT r8 item
    7) while still exercising thousands of real per-key groups."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    grouped = o.groupBy("o_custkey").applyInPandas(
        _zscore_group, "o_custkey long, o_orderkey long, z double"
    )
    # groups of 1 have NULL stddev → drop via count filter to match QUALIFY
    counts = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return grouped.join(counts.filter(F.col("n") >= 2), "o_custkey").select(
        "o_custkey", "o_orderkey", "z"
    )


def _zscore_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket z-score: one pandas frame per COARSE bucket,
    sub-grouped by the real key with cython groupby.transform — no
    per-key Python, no per-key frame construction."""
    g = pdf.groupby("o_custkey")["o_totalprice"]
    m = g.transform("mean")
    s = g.transform("std")  # ddof=1; NaN for singleton groups
    n = g.transform("count")
    out = pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "z": ((pdf["o_totalprice"] - m) / s).round(6),
        }
    )
    # groups of 1 have NULL stddev → drop to match the oracle's QUALIFY
    return out[n.values >= 2]


@register(
    "u_grouped_map_batched",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 6) AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    QUALIFY COUNT(*) OVER w >= 2
    """,
)
def u_grouped_map_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe grouped-map: the batch-the-keys pattern SCALE.md
    prescribes for `u_grouped_map`'s measured ~94k rows/s floor.

    Same semantics and EXACT oracle as `u_grouped_map` (per-customer
    z-score), but applyInPandas groups on a COARSE hash bucket of the
    key instead of the key itself, then sub-groups inside pandas with
    groupby.transform.  Why it wins: applyInPandas pays a fixed
    per-GROUP cost (Arrow slice → pandas frame → Python call), which
    dominates when keys are high-cardinality and groups tiny (150k
    groups of ~10 orders at sf1).  Bucketing turns 150k Python calls
    into `n_buckets` calls over large frames; the per-key work happens
    in pandas' cython groupby, which is vectorized across ALL keys in
    the bucket.  Hashing the key guarantees every row of a customer
    lands in the same bucket, so per-key results are bit-identical to
    the per-key form.

    Sizing: n_buckets trades parallelism against per-frame overhead —
    here 4× defaultParallelism (full cores, frames of rows/n_buckets);
    at 100 TB size it as total_rows / target_rows_per_frame (a few
    million rows ≈ a few hundred MB Arrow per frame) so frames stay
    executor-memory-safe while remaining large enough to amortize the
    Python boundary."""
    n_buckets = spark.sparkContext.defaultParallelism * 4
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    bucketed = o.withColumn(
        "bucket", F.pmod(F.hash("o_custkey"), F.lit(n_buckets))
    )
    return bucketed.groupBy("bucket").applyInPandas(
        _zscore_bucket, "o_custkey long, o_orderkey long, z double"
    )


@register(
    "u_sql_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l
               FROM documents WHERE doc_id < 50)
    SELECT doc_id, CAST(g.i AS INTEGER) AS pos, l[g.i] AS tok
    FROM t, UNNEST(generate_series(1, len(l))) AS g(i)
    """,
)
def u_sql_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one row per token, lateral-joined over
    a bounded document sample (cf. DuckDB UNNEST WITH ORDINALITY)."""

    class TokenizeUDTF:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, i + 1, tok

    tokenize = udtf(TokenizeUDTF, returnType="doc_id: bigint, pos: int, tok: string")
    spark.udtf.register("tokenize_udtf", tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.tok
        FROM udtf_docs, LATERAL tokenize_udtf(doc_id, text) t
        """
    )


def _revenue_batches(it):
    """Arrow-native batch transform: revenue = extendedprice * (1 - discount)
    computed by pyarrow.compute on the raw Arrow buffers — no pandas
    conversion at all (vs u_pandas_udf's Series round-trip)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_linenumber"), rev],
            names=["l_orderkey", "l_linenumber", "revenue"],
        )


@register(
    "u_arrow_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
)
def u_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the fastest Python extension point — RecordBatches in,
    RecordBatches out, zero per-row Python and zero pandas materialization
    (completes the ladder: u_py_udf < u_pandas_udf < u_arrow_map).  The
    float64 product is IEEE-identical in Spark, pyarrow, and DuckDB, so
    the oracle is EXACT without rounding.  Partition-preserving map-only
    pass; at 100 TB the only cost over a codegen'd expression is the
    Arrow IPC hop, which this shape bounds at one batch in flight per
    task."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    # declared schema must match the emitted Arrow types EXACTLY
    # (l_linenumber is int32 in the fixture parquet; no implicit widening)
    return li.mapInArrow(
        _revenue_batches, "l_orderkey long, l_linenumber int, revenue double"
    )


def _count_rows(v: pd.Series) -> int:
    """Series -> scalar row count (GROUPED_AGG inferred from the hints —
    a bare lambda would be treated as a SCALAR pandas UDF)."""
    return len(v)


def _weighted_mean_series(v: pd.Series, w: pd.Series) -> float:
    """Exact-integer weighted mean: dollars -> cents (int64; values are
    2-decimal so the cast is exact), integer num/den sums (associative,
    order-free), ONE double division at the end — the same fixed-order
    arithmetic the oracle performs, so the result is bit-identical.

    Rounding mode is pinned HALF-AWAY-FROM-ZERO for non-negative values
    (floor(x*100 + 0.5)) to match DuckDB ROUND — np.rint's half-to-even
    would diverge on any value whose *100 lands on an exact .5 (ADVICE
    r8 item 2; fixture values are non-negative 2-decimal doubles, and
    the guard below turns a contract break into a loud error, not a
    silent hash mismatch)."""
    import numpy as np

    if (v.values < 0).any():  # half-away via floor(+0.5) needs x >= 0
        raise ValueError("u_pandas_grouped_agg: negative value breaks "
                         "the pinned half-away-from-zero rounding")
    cents = np.floor(v.values * 100 + 0.5).astype("int64")
    wi = w.values.astype("int64")
    num = int((cents * wi).sum())
    den = int(wi.sum())
    return float(num) / float(den) / 100.0


@register(
    "u_pandas_grouped_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                          * (1 + user_id % 10)) AS DOUBLE)
                 / CAST(SUM(1 + user_id % 10) AS DOUBLE) / 100.0, 6)
               AS wmean_value
    FROM events GROUP BY event_type
    """,
)
def u_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas GROUPED_AGG UDAF (Series -> scalar): the fourth
    rung of the extension ladder — a custom aggregate the built-in
    surface lacks, executed as Arrow batches per group instead of
    row-at-a-time.  Semantics: engagement-weighted mean event value
    (weight = 1 + user_id % 10, computed JVM-side).

    Cross-engine exactness: the UDAF sums exact int64 cents*weight (no
    float accumulation order anywhere) and performs one double division;
    rounding happens JVM-side (F.round) like every other op.  int64
    headroom note: num is bounded by 1e6 * 10 * rows-per-group — exact
    past petabyte scale, and the partial-aggregation story at scale is
    to carry (num, den) pairs, exactly as this UDF's internals do.

    100 TB posture: ONE shuffle on event_type; Arrow transfer is the
    group's two float columns, nothing else (column-pruned scan)."""
    # GROUPED_AGG pandas UDFs cannot mix with built-in aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT) — the row count is a second
    # pandas aggregate over the same Arrow batch
    wmean = pandas_udf(_weighted_mean_series, "double")
    nrows = pandas_udf(_count_rows, "long")
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (1 + F.pmod(F.col("user_id"), F.lit(10))).alias("w"),
    )
    return e.groupBy("event_type").agg(
        nrows("value").alias("n"),
        F.round(wmean("value", "w"), 6).alias("wmean_value"),
    )


@register(
    "u_arrow_py_udf",
    oracle=f"""
    SELECT o_orderkey,
           (o_orderkey * {MIX_MULT}) % {MIX_MOD} AS mixed
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def u_arrow_py_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (`useArrow=True`, Spark 3.5+/4.x) —
    the missing rung between u_py_udf and u_pandas_udf on the UDF
    ladder: same row-at-a-time Python function as u_py_udf (the
    _key_mix exact-integer mixer, same oracle), but serialized over
    Arrow batches instead of pickled rows, which removes most of the
    (de)serialization cost while keeping the simple scalar-function
    authoring model (no pandas Series signature).  The ladder a user
    should climb: u_py_udf (pickle rows) < THIS (Arrow transport,
    Python loop) < u_pandas_udf (Arrow transport, vectorized numpy
    body) < u_arrow_map (raw RecordBatches, no per-row Python at all).

    Same bounded-input discipline as u_py_udf: Python-loop rungs stay
    on the 5% orderkey sample; at 100 TB this expression would be a
    built-in column expression anyway — the op exists to pin the
    API's semantics and transport."""
    key_mix = udf(_key_mix, "long", useArrow=True)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    )
    return o.select("o_orderkey", key_mix("o_orderkey").alias("mixed"))
