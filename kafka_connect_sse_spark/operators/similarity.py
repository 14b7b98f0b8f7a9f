"""Similarity search over the embeddings table (extension tier).

Two paths with identical semantics on fixture data:
  * x_sim_topk_cosine — brute-force top-k cosine for a bounded query set:
    O(|Q|·N) dot products, broadcast the queries, no N² blowup.  EXACT
    (DuckDB list_dot_product oracle; scores rounded before ranking so FP
    summation order can never flip a rank).
  * x_sim_lsh_bucketed — random-hyperplane LSH bucketing: each vector gets a
    sign-bit code from deterministic pseudo-random hyperplanes; candidates
    only within the same bucket.  This is the 100 TB path: the join key is
    the code, the shuffle is O(N), and recall is tuned by code width /
    multi-probe.  EXACT: the planes are literal constants generated
    driver-side (hashlib md5), identical in the DuckDB oracle.

Dot products run through `F.aggregate` over zipped arrays — JVM higher-order
functions — at small scans; above SIM_ARROW_MIN_BYTES the brute-force ops
hand Arrow batches to numpy instead (round 13, guide §4.2), accumulating in
the identical sequential fold order so results stay bit-for-bit equal.
"""

from __future__ import annotations

import hashlib
import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import fixture_bytes, load_table
from ..registry import register

N_QUERIES = 10  # bounded query set: vec_id < 10
TOP_K = 5
N_PLANES = 8  # LSH code width
EMB_DIM = 64  # fixture embedding dimensionality (gen_fixture.py)
# x_sim_topk_cosine path gate: below this input size the JVM fold beats
# the Arrow round-trip (measured: sf0.1 0.46 s fold vs 0.61 s Arrow;
# sf10 1.99 s fold vs 0.69 s Arrow) — at production scale the Arrow
# path always wins and is always selected
SIM_ARROW_MIN_BYTES = 4_000_000


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _batch_matrix(batch, col: str):
    """(ids int64[n], n×EMB_DIM float64) from an Arrow record batch of
    (vec_id, <col>: list<float>).  Zero-copy flatten + reshape; the cast
    to float64 is exact (every float32 is representable).  Raggedness or
    NULLs fail loudly — the fixture contract is dense 64-dim vectors,
    and a silent fallback here could diverge from the oracle."""
    import numpy as np

    ids = batch.column("vec_id").to_numpy()
    arr = batch.column(col)
    if arr.null_count:
        raise ValueError("NULL embedding in similarity scan")
    flat = arr.flatten().to_numpy()
    if flat.shape[0] != ids.shape[0] * EMB_DIM:
        raise ValueError("ragged embedding array in similarity scan")
    return ids, flat.astype(np.float64).reshape(ids.shape[0], EMB_DIM)


def _fold_dots(mat, qv):
    """Dot products of every row of `mat` (n×d float64) against the
    single query vector `qv` (d float64), accumulated in the SAME order
    as the engine's sequential fold (`dot()` below / DuckDB
    list_dot_product): acc = (((0 + x0·y0) + x1·y1) + ...).  Vectorized
    over rows, sequential over dimensions — every row's result is
    bit-identical to the JVM fold."""
    import numpy as np

    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(mat.shape[1]):
        acc = acc + qv[j] * mat[:, j]
    return acc


def _fold_sq_norms(mat):
    """sqrt of the sequential-fold self-dot per row (see _fold_dots)."""
    import numpy as np

    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(mat.shape[1]):
        acc = acc + mat[:, j] * mat[:, j]
    return np.sqrt(acc)


def dot(a, b):
    """Sequential fold over zipped arrays — same accumulation order as
    DuckDB's list_dot_product, so results match bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


@register(
    "x_sim_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v)
                        / (sqrt(list_dot_product(q.v, q.v))
                           * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
           FROM q JOIN c ON q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def x_sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a bounded query set (the correctness
    baseline; ship the queries to every scan task, scan candidates once).

    Round 13 (guide §4.2): above SIM_ARROW_MIN_BYTES of input the
    per-pair JVM higher-order fold — an interpreted lambda chain
    allocating a zipped array per pair — is replaced by ONE mapInArrow
    stage that hands each Arrow batch to numpy.  Exactness is preserved,
    not approximated: dots and norms accumulate in the engine's
    sequential fold order (see _fold_dots), so every cosine is
    bit-identical to the old plan's, and the final round(6)+rank runs in
    Spark exactly as before.  Each task emits only its provably-
    sufficient candidates: rows within 2e-6 of its k-th best unrounded
    cosine per query (rounding to 6dp is monotone with 1e-6 granularity,
    so anything further behind can never enter the global rounded
    top-k) — the ranking shuffle carries a few dozen rows per task
    instead of |batch|×|Q|.  Measured: sf10 noop 1.99 s → 0.69 s; below
    the gate the fold path stays (tiny scans pay more for the Python
    worker round-trip than the fold costs: sf0.1 0.46 s vs 0.61 s) —
    both paths emit bit-identical rows (oracle-green on each), and at
    production scale the Arrow path is always the one selected.

    The query matrix is N_QUERIES×64 doubles (~5 KB) collected on the
    driver — the bounded-literal precedent of q_join_bloom_prune's
    16 Ki-word bloom."""
    from ..plans import spread

    # spread(): parallelize the scoring off the single-split scan
    # (x_ann_rerank precedent; no-op at real scale)
    e = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    if fixture_bytes(sf_dir, "embeddings") < SIM_ARROW_MIN_BYTES:
        q = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qv"),
        ).withColumn("qnorm", F.sqrt(dot(F.col("qv"), F.col("qv"))))
        c = e.select(
            F.col("vec_id").alias("neighbor_id"),
            _as_double(F.col("embedding")).alias("cv"),
        ).withColumn("cnorm", F.sqrt(dot(F.col("cv"), F.col("cv"))))
        scored_jvm = (
            c.join(broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    dot(F.col("qv"), F.col("cv"))
                    / (F.col("qnorm") * F.col("cnorm")),
                    6,
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), "neighbor_id"
        )
        return (
            scored_jvm.select("*", F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= TOP_K)
        )
    qrows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    import numpy as np

    qids = [int(r["vec_id"]) for r in qrows]
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qnorms = []
    for qv in qmat:
        acc = 0.0
        for j in range(qmat.shape[1]):
            acc = acc + float(qv[j]) * float(qv[j])
        qnorms.append(acc ** 0.5)

    def score(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids, c64 = _batch_matrix(batch, "embedding")
            cnorm = _fold_sq_norms(c64)
            out_q, out_n, out_c = [], [], []
            for qi, qid in enumerate(qids):
                dots = _fold_dots(c64, qmat[qi])
                # dot / (qnorm * cnorm): same op order as the old plan
                cos = dots / (qnorms[qi] * cnorm)
                mask = ids != qid
                cm, im = cos[mask], ids[mask]
                if cm.shape[0] == 0:
                    continue
                if cm.shape[0] > TOP_K:
                    kth = np.partition(cm, cm.shape[0] - TOP_K)[
                        cm.shape[0] - TOP_K
                    ]
                    # 2e-6 margin: > one 6dp rounding grid step, so no
                    # row that could still enter the global rounded
                    # top-k is cut; NaN kept (Spark sorts NaN first
                    # under desc — cannot be dropped task-side)
                    keep = ~(cm < kth - 2e-6)
                    cm, im = cm[keep], im[keep]
                out_q.append(np.full(cm.shape[0], qid, dtype=np.int64))
                out_n.append(im.astype(np.int64))
                out_c.append(cm)
            if out_q:
                yield pa.record_batch(
                    [
                        pa.array(np.concatenate(out_q), type=pa.int64()),
                        pa.array(np.concatenate(out_n), type=pa.int64()),
                        pa.array(np.concatenate(out_c), type=pa.float64()),
                    ],
                    names=["query_id", "neighbor_id", "cos"],
                )

    scored = e.select("vec_id", "embedding").mapInArrow(
        score, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos"), 6).alias("cos_sim"),
        )
        .select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


def _plane_components(p: int, dim: int = 64) -> list[float]:
    """Component j of hyperplane p: first 4 hex chars of md5('p:j') mapped
    to [-1, 1].  Generated driver-side at plan-build time (hashlib — no
    engine hash needed), inlined as literals into BOTH the Spark plan and
    the DuckDB oracle, so bucket assignment is engine-independent.  The
    matrix is n_planes x dim doubles — trivially broadcastable at any
    scale; at 100 TB the codes shuffle O(N) on an 8-bit key."""
    return [
        int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:4], 16) / 32767.5
        - 1.0
        for j in range(dim)
    ]


def lsh_code(vec_col, n_planes: int = N_PLANES, dim: int = 64):
    """Sign-bit code from deterministic pseudo-random hyperplanes: bit p is
    the sign of the projection onto plane p.  Literal plane components keep
    the whole expression inside whole-stage codegen."""
    code = None
    for p in range(n_planes):
        comp = F.array(*[F.lit(x) for x in _plane_components(p, dim)])
        proj = F.aggregate(
            F.zip_with(vec_col, comp, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code


def _sql_code_expr(vec: str, n_planes: int = N_PLANES, dim: int = 64) -> str:
    """The DuckDB rendering of lsh_code over column `vec` — same literal
    planes, same left-to-right accumulation (list_dot_product), same sign
    rule, so codes match the Spark side bit-for-bit."""
    terms = []
    for p in range(n_planes):
        arr = "[" + ", ".join(repr(x) for x in _plane_components(p, dim)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec}, {arr}) >= 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "x_sim_lsh_bucketed",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    coded AS (SELECT vec_id, label, {_sql_code_expr('v')} AS code FROM e)
    SELECT code,
           COUNT(*) AS bucket_size,
           COUNT(DISTINCT label) AS n_labels,
           MIN(vec_id) AS min_vec_id
    FROM coded GROUP BY code
    """,
)
def x_sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: bucket stats + within-bucket candidate counts.
    EXACT since round 2 (literal hyperplanes make the code
    engine-independent); the scale path for x_sim_topk_cosine (shuffle on
    the 8-bit code instead of an N×Q cross)."""
    e = load_table(spark, sf_dir, "embeddings")
    coded = e.select(
        "vec_id",
        "label",
        lsh_code(_as_double(F.col("embedding"))).alias("code"),
    )
    return coded.groupBy("code").agg(
        F.count("*").alias("bucket_size"),
        F.countDistinct("label").alias("n_labels"),
        F.min("vec_id").alias("min_vec_id"),
    )


@register(
    "x_sim_topk_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, {_sql_code_expr('v')} AS code,
                 sqrt(list_dot_product(v, v)) AS nrm
          FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, code AS qcode, nrm AS qnorm
          FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, c.v) / (q.qnorm * c.nrm), 6)
                 AS cos_sim
      FROM n c JOIN q ON c.code = q.qcode AND c.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def x_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k through the LSH index: queries probe only their own code
    bucket, so the scored candidate set is O(bucket) instead of O(N).
    EXACT since round 2: the oracle replays bucketing + scoring with the
    same literal planes, so it checks the LSH path end-to-end (recall vs
    the exact twin x_sim_topk_cosine is pinned separately in
    tests/test_weak_ops.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    coded = e.select(
        "vec_id", _as_double(F.col("embedding")).alias("v"),
        lsh_code(_as_double(F.col("embedding"))).alias("code"),
    ).withColumn("vnorm", F.sqrt(dot(F.col("v"), F.col("v"))))
    q = coded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("code").alias("qcode"),
        F.col("vnorm").alias("qnorm"),
    )
    scored = (
        coded.join(broadcast(q), (F.col("code") == F.col("qcode"))
                   & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


@register(
    "x_embed_norms",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
               AS l2_norm,
           ROUND(list_aggregate(embedding::DOUBLE[], 'sum'), 6) AS comp_sum,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def x_embed_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene pass: L2 norm, component sum, dimension — the cheap
    full-scan validation stage before any ANN build."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    return e.select(
        "vec_id",
        "label",
        F.round(F.sqrt(dot(v, v)), 6).alias("l2_norm"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("comp_sum"),
        F.size("embedding").alias("dim"),
    )


@register(
    "x_dedup_near_embedding_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, {_sql_code_expr('v')} AS code,
                 sqrt(list_dot_product(v, v)) AS nrm
          FROM e)
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_sim
    FROM n a JOIN n b ON a.code = b.code AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.3
    """,
)
def x_dedup_near_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs through the LSH index — the 100 TB path
    that x_dedup_near_embedding's bounded all-pairs twin verifies: the
    self-join keys on the 8-bit code (one O(N) shuffle), pair scoring runs
    only within buckets, and the EXACT oracle replays bucketing + scoring
    with the same literal hyperplanes.  Threshold 0.3 sits under the
    fixture max-cosine (~0.46) so real pairs survive the gate."""
    e = load_table(spark, sf_dir, "embeddings")
    coded = e.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        lsh_code(_as_double(F.col("embedding"))).alias("code"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a = coded.select(
        F.col("vec_id").alias("doc_a"), F.col("v").alias("va"),
        F.col("code").alias("ca"), F.col("nrm").alias("na"),
    )
    b = coded.select(
        F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"),
        F.col("code").alias("cb"), F.col("nrm").alias("nb"),
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        a.join(b, (F.col("ca") == F.col("cb"))
               & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.3)
    )


_PROBE_MASKS = [0] + [1 << p for p in range(N_PLANES)]


@register(
    "x_sim_topk_lsh_multiprobe",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, {_sql_code_expr('v')} AS code,
                 sqrt(list_dot_product(v, v)) AS nrm
          FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, code AS qcode, nrm AS qnorm
          FROM n WHERE vec_id < {N_QUERIES}),
    probes AS (
      SELECT query_id, qv, qnorm, xor(qcode, m.m) AS pcode
      FROM q, UNNEST({_PROBE_MASKS}) AS m(m)),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(p.qv, c.v) / (p.qnorm * c.nrm), 6)
                 AS cos_sim
      FROM n c JOIN probes p ON c.code = p.pcode
                            AND c.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def x_sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN: each query probes its own bucket plus the
    N_PLANES buckets at Hamming distance 1 (flip one code bit) — the
    standard recall/cost dial for sign-bit LSH.  Candidate volume grows
    (1 + N_PLANES)x but stays O(bucket), far from the O(N) scan; a
    candidate matches at most one probe (codes differ by exactly one
    mask), so no dedup pass is needed.  EXACT: the oracle enumerates the
    same probe masks over the same literal hyperplanes."""
    e = load_table(spark, sf_dir, "embeddings")
    coded = e.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        lsh_code(_as_double(F.col("embedding"))).alias("code"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    probes = (
        coded.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("code").alias("qcode"),
            F.col("nrm").alias("qnorm"),
        )
        .withColumn(
            "pcode",
            F.explode(
                F.array(*[
                    F.col("qcode").bitwiseXOR(F.lit(m))
                    for m in _PROBE_MASKS
                ])
            ),
        )
    )
    scored = (
        coded.join(
            broadcast(probes),
            (F.col("code") == F.col("pcode"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("qnorm") * F.col("nrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


@register(
    "x_embed_quantize",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (SELECT vec_id, label, e,
                 list_max(list_transform(e, x -> abs(x))) AS scale
          FROM v)
    SELECT vec_id, label, scale,
           CASE WHEN scale = 0 THEN 0 ELSE
             CAST(list_sum(list_transform(e, x -> floor(x / scale * 127)))
                  AS BIGINT) END AS q_sum,
           CASE WHEN scale = 0 THEN 0.0 ELSE
             list_max(list_transform(
               e, x -> abs(x - floor(x / scale * 127) * scale / 127)))
           END AS max_abs_err
    FROM s
    """,
)
def x_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4x
    memory/IO compression every 100 TB ANN index build starts with.  Per
    vector: scale = max |component|, q_i = floor(x_i / scale * 127), and
    the max absolute reconstruction error |x_i - q_i * scale / 127| that
    a quantized index must budget for.  Map-only (zero shuffle); all
    higher-order array functions, no Python.  floor() (not round) keeps
    the quantizer identical in both engines — SQL round() tie-breaking
    differs between them, floor does not; float components are cast to
    double first, after which every step is exact IEEE arithmetic, so the
    outputs hash-match unrounded.  The checksum q_sum pins the full
    quantized vector without shipping it."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    d = e.select("vec_id", "label", v.alias("e"), scale.alias("scale"))
    q = F.transform(
        F.col("e"), lambda x: F.floor(x / F.col("scale") * 127)
    )
    err = F.array_max(
        F.transform(
            F.col("e"),
            lambda x: F.abs(
                x - F.floor(x / F.col("scale") * 127) * F.col("scale") / 127
            ),
        )
    )
    zero = F.col("scale") == 0
    return d.select(
        "vec_id",
        "label",
        "scale",
        F.when(zero, F.lit(0))
        .otherwise(F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x))
        .alias("q_sum"),
        F.when(zero, F.lit(0.0)).otherwise(err).alias("max_abs_err"),
    )


SHORTLIST = 4 * TOP_K  # stage-1 candidates re-ranked exactly per query


@register(
    "x_ann_rerank",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) AS scale
          FROM v),
    q8 AS (SELECT vec_id, e,
                  CASE WHEN scale = 0
                       THEN list_transform(e, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(
                              e, x -> CAST(floor(x / scale * 127) AS BIGINT))
                  END AS q
           FROM s),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_dot_product(a.q, b.q) AS BIGINT) AS iscore
      FROM (SELECT * FROM q8 WHERE vec_id < {N_QUERIES}) a
      JOIN q8 b ON a.vec_id <> b.vec_id),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY iscore DESC, neighbor_id) AS srn
        FROM pairs)
      WHERE srn <= {SHORTLIST}),
    exact AS (
      SELECT s.query_id, s.neighbor_id,
             ROUND(list_dot_product(qa.e, qb.e)
                   / (sqrt(list_dot_product(qa.e, qa.e))
                      * sqrt(list_dot_product(qb.e, qb.e))), 6) AS cos_sim
      FROM short s
      JOIN v qa ON qa.vec_id = s.query_id
      JOIN v qb ON qb.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM exact)
    WHERE rnk <= {TOP_K}
    """,
)
def x_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: int8-quantized shortlist scan + exact fp64 re-rank —
    the production pattern every large vector index uses (scan the 4x
    smaller quantized copy at memory-bandwidth speed, then re-rank the
    {SHORTLIST}-candidate shortlist at full precision).  Stage 1 carries
    ONLY (query_id, neighbor_id, iscore) through its ranking shuffle —
    vectors never ride the window exchange; stage 2 joins the shortlist
    back to full-precision vectors (neighbor side a key join, bounded
    query side broadcast).  Quantizer is x_embed_quantize's floor-based
    symmetric int8 (engine-identical); the integer dot (<= 64 * 127^2)
    and the double cosine are exact IEEE in both engines, so the oracle
    replicates the full two-stage pipeline EXACTLY — including any
    recall loss the shortlist introduces, which is the honest contract
    of a quantized first pass."""
    from ..plans import spread

    # spread() the single-row-group fixture scan so the Arrow scoring
    # stage gets parallel tasks (no-op at real scale)
    e = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    v = _as_double(F.col("embedding"))
    # Round 13 (guide §4.2): stage 1 — int8 quantization + the
    # |base|×|Q| integer dot scan — moves from a JVM higher-order-fold
    # broadcast join to ONE mapInArrow stage: per Arrow batch, numpy
    # quantizes (floor(x/scale·127), the exact engine arithmetic on the
    # same float64 inputs) and computes every iscore as an int64 GEMM —
    # exact integers, so the shortlist is IDENTICAL, and each task
    # pre-ranks so only its top-SHORTLIST per query rides the ranking
    # shuffle.  The query matrix (N_QUERIES×64, ~5 KB) is quantized on
    # the driver with the same ops.
    import numpy as np

    qrows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = [int(r["vec_id"]) for r in qrows]
    qraw = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qscale = np.abs(qraw).max(axis=1)
    qq = np.zeros_like(qraw)
    nz = qscale != 0
    qq[nz] = np.floor(qraw[nz] / qscale[nz, None] * 127)
    qmat = qq.astype(np.int64)

    def score(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids, c64 = _batch_matrix(batch, "embedding")
            cscale = np.abs(c64).max(axis=1)
            cq = np.zeros_like(c64)
            cnz = cscale != 0
            cq[cnz] = np.floor(c64[cnz] / cscale[cnz, None] * 127)
            ci = cq.astype(np.int64)
            iscores = ci @ qmat.T  # n×|Q|, exact int64
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(qids):
                s = iscores[:, qi]
                mask = ids != qid
                sm, im = s[mask], ids[mask]
                if sm.shape[0] == 0:
                    continue
                if sm.shape[0] > SHORTLIST:
                    # task-local top-SHORTLIST under the exact final
                    # order (iscore desc, neighbor_id asc): integer
                    # scores, no rounding surface — the global top-S
                    # is a subset of the per-task top-S union
                    order = np.lexsort((im, -sm))[:SHORTLIST]
                    sm, im = sm[order], im[order]
                out_q.append(np.full(sm.shape[0], qid, dtype=np.int64))
                out_n.append(im.astype(np.int64))
                out_s.append(sm.astype(np.int64))
            if out_q:
                yield pa.record_batch(
                    [
                        pa.array(np.concatenate(out_q), type=pa.int64()),
                        pa.array(np.concatenate(out_n), type=pa.int64()),
                        pa.array(np.concatenate(out_s), type=pa.int64()),
                    ],
                    names=["query_id", "neighbor_id", "iscore"],
                )

    pairs = e.select("vec_id", "embedding").mapInArrow(
        score, "query_id long, neighbor_id long, iscore long"
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), "neighbor_id"
    )
    short = (
        pairs.select("*", F.row_number().over(w1).alias("srn"))
        .filter(F.col("srn") <= SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    full = e.select("vec_id", v.alias("fv"))
    qfull = (
        full.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("fv").alias("qv"),
            F.sqrt(dot(F.col("fv"), F.col("fv"))).alias("qnorm"),
        )
    )
    exact = (
        short.join(full, short["neighbor_id"] == full["vec_id"])
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("fv"))
                / (F.col("qnorm") * F.sqrt(dot(F.col("fv"), F.col("fv")))),
                6,
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return exact.select("*", F.row_number().over(w2).alias("rnk")).filter(
        F.col("rnk") <= TOP_K
    )


@register(
    "x_ann_pipeline",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
               FROM embeddings),
    s AS (SELECT vec_id, label, e,
                 list_max(list_transform(e, x -> abs(x))) AS scale
          FROM v),
    q8 AS (SELECT vec_id, label, e,
                  CASE WHEN scale = 0
                       THEN list_transform(e, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(
                              e, x -> CAST(floor(x / scale * 127) AS BIGINT))
                  END AS q
           FROM s),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_dot_product(a.q, b.q) AS BIGINT) AS iscore
      FROM (SELECT * FROM q8 WHERE vec_id < {N_QUERIES}) a
      JOIN q8 b ON a.label = b.label AND a.vec_id <> b.vec_id),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY iscore DESC, neighbor_id) AS srn
        FROM pairs)
      WHERE srn <= {4 * TOP_K}),
    exact AS (
      SELECT s.query_id, s.neighbor_id,
             ROUND(list_dot_product(qa.e, qb.e)
                   / (sqrt(list_dot_product(qa.e, qa.e))
                      * sqrt(list_dot_product(qb.e, qb.e))), 6) AS cos_sim
      FROM short s
      JOIN v qa ON qa.vec_id = s.query_id
      JOIN v qb ON qb.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM exact)
    WHERE rnk <= {TOP_K}
    """,
)
def x_ann_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE production ANN pipeline in one operator (round 6):
    IVF prefilter → int8 quantized shortlist → exact fp64 re-rank —
    the composition PLANS.md's x_ann_rerank attribution names as the
    real scale lever (shrink N per query BEFORE the quantized scan).

    Stage 1 (prefilter): candidates restricted to the query's coarse
    cell (`label` = the stored IVF assignment, as in x_sim_topk_ivf) —
    at 100 TB this is what turns the per-query scan from O(N) into
    O(N/cells · probes), and it's a JOIN KEY, so the shuffle carries
    cell ids, not vectors.  Stage 2 (shortlist): integer dot over the
    4× smaller int8 copy (floor quantizer shared with x_embed_quantize /
    x_ann_rerank), ranking exchange carries only
    (query_id, neighbor_id, iscore).  Stage 3 (re-rank): the bounded
    {4 * TOP_K}-candidate shortlist joins back to full-precision
    vectors (neighbor side key join, query side broadcast) for the
    exact cosine.  EXACT oracle: cell membership is data, the int8
    quantizer and integer dot are engine-identical, and the double
    cosine is exact IEEE — recall loss from cell restriction AND
    quantization is replicated, which is the honest contract of an
    ANN index.

    Round 7: the int8 codes + cell assignments are MATERIALIZED — built
    once per (process, corpus) by `ann_index_path` (whose codes are
    exactly x_embed_quantize's: x_embed_quantize IS the build) and
    stored as parquet `(vec_id, label, q array<tinyint>)`; queries scan
    the stored index instead of re-quantizing the full fp base inline,
    which PLANS.md's r6 attribution identified as the remaining O(N)
    floor of the inline form.  That is the production index lifecycle:
    quantize once at ingest, amortize across every query; PLANS.md's
    A/B (tools/ab_ann.py) measures the difference with the build
    excluded."""
    return ann_pipeline(spark, sf_dir, use_stored_index=True)


_ANN_INDEX_BUILT: set[str] = set()
_ANN_INDEX_LOCK = threading.Lock()


def ann_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once storage of the IVF+int8 index: x_embed_quantize's
    floor-based symmetric codes, narrowed to array<tinyint> (the actual
    4× wire/storage compression — |q_i| <= 127 fits int8 exactly), plus
    the coarse-cell assignment (`label`).  Keyed by corpus dir and
    pid-keyed via scratch_dir so concurrent checker processes never
    clobber each other; within a process every query after the first
    reads the stored parquet.  At 100 TB this is a real table written by
    the ingest pipeline — the point is that queries are O(index scan),
    not O(re-quantize the fp64 base)."""
    import os

    from ..io import scratch_dir

    # cache key = corpus dir + a freshness fingerprint of the source
    # table (mtime_ns + size of every data file under
    # embeddings.parquet) — a fixture regenerated within the same
    # process must MISS, not silently serve the stale index
    # (ADVICE r7 item 3)
    src = os.path.join(sf_dir, "embeddings.parquet")
    fp = hashlib.md5(sf_dir.encode())
    if os.path.isdir(src):
        for root, _dirs, files in sorted(os.walk(src)):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                fp.update(f"{f}:{st.st_mtime_ns}:{st.st_size};".encode())
    elif os.path.exists(src):
        st = os.stat(src)
        fp.update(f"{st.st_mtime_ns}:{st.st_size}".encode())
    key = fp.hexdigest()[:10]

    d = scratch_dir(f"kcss_ann_index_{key}")
    path = os.path.join(d, "ann_index.parquet")
    with _ANN_INDEX_LOCK:
        if path not in _ANN_INDEX_BUILT:
            e = load_table(spark, sf_dir, "embeddings")
            v = _as_double(F.col("embedding"))
            scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
            q8 = F.when(
                scale == 0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))
            ).otherwise(
                F.transform(v, lambda x: F.floor(x / scale * 127).cast("tinyint"))
            )
            e.select("vec_id", "label", q8.alias("q")).write.mode(
                "overwrite"
            ).parquet(path)
            _ANN_INDEX_BUILT.add(path)
    return path


def ann_pipeline(
    spark: SparkSession, sf_dir: str, use_stored_index: bool = True
) -> DataFrame:
    """Parameterized body of x_ann_pipeline: use_stored_index=False keeps
    the r6 inline-quantization form for the A/B (tools/ab_ann.py); both
    forms produce identical rows (int8 codes are identical whether read
    back from parquet or computed in the plan)."""
    e = load_table(spark, sf_dir, "embeddings")
    if use_stored_index:
        base = spark.read.parquet(ann_index_path(spark, sf_dir))
    else:
        v_inline = _as_double(F.col("embedding"))
        scale = F.array_max(F.transform(v_inline, lambda x: F.abs(x)))
        q8 = F.when(
            scale == 0, F.transform(v_inline, lambda x: F.lit(0).cast("long"))
        ).otherwise(F.transform(v_inline, lambda x: F.floor(x / scale * 127)))
        base = e.select("vec_id", "label", q8.alias("q"))
    v = _as_double(F.col("embedding"))
    queries_q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("q").alias("qq"),
    )
    # cast inside the lambda: stored codes are tinyint, and byte*byte
    # must widen BEFORE the multiply (|q|<=127 so the long product and
    # sum are exact)
    iscore = F.aggregate(
        F.zip_with(
            F.col("qq"), F.col("q"), lambda a, b: a.cast("long") * b.cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = base.join(
        broadcast(queries_q),
        (F.col("q_label") == F.col("label"))
        & (F.col("query_id") != F.col("vec_id")),
    ).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), iscore.alias("iscore")
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), "neighbor_id"
    )
    short = (
        pairs.select("*", F.row_number().over(w1).alias("srn"))
        .filter(F.col("srn") <= 4 * TOP_K)
        .select("query_id", "neighbor_id")
    )
    full = e.select("vec_id", v.alias("fv"))
    qfull = full.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("fv").alias("qv"),
        F.sqrt(dot(F.col("fv"), F.col("fv"))).alias("qnorm"),
    )
    exact = (
        short.join(full, short["neighbor_id"] == full["vec_id"])
        .join(broadcast(qfull), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("fv"))
                / (F.col("qnorm") * F.sqrt(dot(F.col("fv"), F.col("fv")))),
                6,
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return exact.select("*", F.row_number().over(w2).alias("rnk")).filter(
        F.col("rnk") <= TOP_K
    )


@register(
    "x_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS negative_id,
                  c.label AS neg_label,
                  ROUND(list_dot_product(q.v, c.v)
                        / (sqrt(list_dot_product(q.v, q.v))
                           * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
           FROM q JOIN c ON q.label <> c.label)
    SELECT query_id, negative_id, neg_label, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, negative_id) AS rnk
      FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def x_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training: per query,
    the top-k most-similar examples of a DIFFERENT label — the negatives
    that actually move an embedding model (random negatives are trivially
    separable; hard ones define the decision boundary).  Same broadcast-
    queries / precomputed-norms shape as x_sim_topk_cosine with the label
    inequality replacing the self-exclusion; at 100 TB the mining pass
    runs per training epoch over the current checkpoint's embeddings, so
    keeping it one scan + one bounded ranking shuffle is what makes
    per-epoch re-mining affordable.  WindowGroupLimit caps per-task state
    at k rows per query."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    base = e.select("vec_id", "label", v.alias("v"))
    nrm = F.sqrt(dot(F.col("v"), F.col("v")))
    q = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            F.col("v").alias("qv"),
            nrm.alias("qnorm"),
        )
    )
    cand = base.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("neg_label"),
        F.col("v").alias("cv"),
        nrm.alias("cnorm"),
    )
    scored = cand.join(
        F.broadcast(q), F.col("q_label") != F.col("neg_label")
    ).select(
        "query_id",
        "negative_id",
        "neg_label",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "negative_id"
    )
    return scored.select("*", F.row_number().over(w).alias("rnk")).filter(
        F.col("rnk") <= TOP_K
    )


# embedding-space outlier detection: flag the top (1 - OUT_QUANT)
# fraction farthest from the global centroid (rank-based order
# statistic — no interpolated percentile for the engines to disagree on)
OUT_QUANT = 0.99

# shared centroid-distance pipeline (Spark helper + oracle CTE) — the
# exact rank form (x_embed_outliers) and the sketch-threshold scale twin
# (x_embed_outliers_approx) consume the SAME relation, so the two ops
# differ only in how the cut is assigned
_EMB_DIST_CTE = """
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    exd AS (SELECT g.i AS i, e[g.i] AS val
            FROM v, UNNEST(generate_series(1, len(e))) AS g(i)),
    cm AS (SELECT i, ROUND(AVG(val), 6) AS cv FROM exd GROUP BY i),
    c AS (SELECT list(cv ORDER BY i) AS c FROM cm),
    d AS (SELECT vec_id,
                 ROUND(SQRT(list_dot_product(v.e, v.e)
                            - 2 * list_dot_product(v.e, c.c)
                            + list_dot_product(c.c, c.c)), 6) AS dist
          FROM v, c)"""


def _centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dist): every vector's distance to the global centroid.
    Centroid coordinates are element-wise means rounded to 6 dp
    (x_dedup_semantic discipline); the distance uses the expanded form
    sqrt(x.x - 2 x.c + c.c) — three fixed-order list_dot_product folds,
    identical in both engines — rounded to 6."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    exd = v.select(F.posexplode("e").alias("i", "val"))
    cm = exd.groupBy("i").agg(F.round(F.avg("val"), 6).alias("cv"))
    c = cm.agg(
        F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("sc")
    ).select(F.col("sc.cv").alias("c"))
    return v.crossJoin(broadcast(c)).select(
        "vec_id",
        F.round(
            F.sqrt(
                dot(F.col("e"), F.col("e"))
                - 2 * dot(F.col("e"), F.col("c"))
                + dot(F.col("c"), F.col("c"))
            ),
            6,
        ).alias("dist"),
    )


@register(
    "x_embed_outliers",
    oracle=f"""
    WITH {_EMB_DIST_CTE},
    r AS (SELECT vec_id, dist,
                 ROW_NUMBER() OVER (ORDER BY dist, vec_id) AS rnk,
                 COUNT(*) OVER () AS n
          FROM d)
    SELECT vec_id, dist,
           rnk > CEIL({OUT_QUANT} * n) AS is_outlier
    FROM r
    """,
)
def x_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection: distance of every vector to the
    global centroid, with the farthest (1 - {OUT_QUANT}) fraction flagged
    — the embedding-hygiene filter that catches mis-encoded / off-
    distribution vectors before they poison ANN indexes or semantic
    dedup (complements x_embed_norms' per-vector hygiene with a
    DISTRIBUTIONAL check).

    Cross-engine exactness: centroid coordinates are element-wise means
    rounded to 6 dp (x_dedup_semantic discipline); the distance uses the
    expanded form sqrt(x.x - 2 x.c + c.c) — three fixed-order
    list_dot_product folds, identical in both engines — rounded to 6;
    the outlier cut is a RANK (rnk > ceil(q*n), ties on vec_id), never
    an interpolated percentile, so no FP boundary exists.

    100 TB posture: the centroid is a posexplode -> per-dimension
    partial agg (dim-bounded groups) that broadcasts back as one row;
    the rank window is global BUT over the embedding table (orders of
    magnitude smaller than the corpus) — at larger N the IMPLEMENTED
    swap is x_embed_outliers_approx (approx_percentile thresholding,
    no global sort), sharing this op's _centroid_distances pipeline."""
    d = _centroid_distances(spark, sf_dir)
    w = Window.partitionBy().orderBy("dist", "vec_id")
    r = d.select(
        "vec_id",
        "dist",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return r.select(
        "vec_id",
        "dist",
        (F.col("rnk") > F.ceil(OUT_QUANT * F.col("n"))).alias("is_outlier"),
    )


# sketch accuracy for the approx outlier threshold: rank error <= n/OUT_ACC
OUT_ACC = 10000


@register(
    "x_embed_outliers_approx",
    oracle=f"""
    WITH {_EMB_DIST_CTE}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           MAX(dist) AS max_dist,
           TRUE AS thr_rank_lo_ok,
           TRUE AS thr_rank_hi_ok
    FROM d
    """,
)
def x_embed_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-threshold scale twin of x_embed_outliers (VERDICT r8 item
    3, the q_agg_percentile -> q_agg_percentile_approx precedent): the
    outlier cut comes from a ONE-PASS mergeable quantile sketch
    (percentile_approx at accuracy {OUT_ACC}) instead of a global
    row_number sort — is_outlier(v) = dist(v) > thr, assigned in a
    map-side projection.  This is the form that survives 10⁹ vectors:
    no SinglePartition window exists anywhere in the plan.

    Like q_agg_percentile_approx, the sketch value itself is
    implementation-defined, so the EXACT check is error-bounded and
    TIE-ROBUST: the op emits the sketch's own rank guarantee as
    booleans — count(dist < thr) <= target + eps and
    count(dist <= thr) >= target - eps, target = ceil(q*n),
    eps = max(2, ceil(n/1000)) (10x the accuracy-{OUT_ACC} bound) —
    plus the exact n_vectors / max_dist the oracle reproduces from the
    shared _EMB_DIST_CTE distance pipeline.

    100 TB posture: _centroid_distances is a posexplode partial agg
    (dim-bounded) + one broadcast row; the sketch is one partial-agg
    pass (mergeable state, constant size); the check aggregate is a
    second map-side pass.  The (vec_id, dist) relation is
    localCheckpointed because BOTH the sketch aggregate and the check
    aggregate consume it (the AQE no-cross-stage-reuse trap — the
    round-9 plan audit caught the distance pipeline recomputing per
    branch); it is two narrow columns per vector, far smaller than the
    embedding table it derives from.  Nothing global, nothing
    sorted."""
    d = _centroid_distances(spark, sf_dir).localCheckpoint(eager=True)
    thr = d.agg(
        F.percentile_approx("dist", OUT_QUANT, OUT_ACC).alias("thr")
    )
    row = d.crossJoin(broadcast(thr)).agg(
        F.count("*").alias("n"),
        F.max("dist").alias("max_dist"),
        F.sum(
            F.when(F.col("dist") < F.col("thr"), 1).otherwise(0)
        ).alias("n_lt"),
        F.sum(
            F.when(F.col("dist") <= F.col("thr"), 1).otherwise(0)
        ).alias("n_le"),
    )
    target = F.ceil(F.lit(OUT_QUANT) * F.col("n"))
    eps = F.greatest(F.lit(2), F.ceil(F.col("n") / F.lit(1000)))
    return row.select(
        F.col("n").alias("n_vectors"),
        "max_dist",
        (F.col("n_lt") <= target + eps).alias("thr_rank_lo_ok"),
        (F.col("n_le") >= target - eps).alias("thr_rank_hi_ok"),
    )


# PCA power iteration: unrolled iterations, coordinates re-rounded to 6
# decimals between steps so both engines walk the same trajectory
PCA_ITERS = 2


def _pca_direction(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(base, v): the embedding relation and the PCA_ITERS-step power-
    iteration direction as a ONE-row array relation — shared by
    x_embed_pca_power (reports the direction) and x_embed_whiten
    (removes it).  Per step: score rows against the broadcast
    direction, accumulate per-dimension partial sums (dim-bounded
    groups, rounded to 6), renormalize (rounded to 6) — both engines
    walk the same trajectory."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    v = base.orderBy("vec_id").limit(1).select(
        F.transform(
            F.sequence(F.lit(1), F.size("e")),
            lambda i: F.when(i == 1, F.lit(1.0)).otherwise(F.lit(0.0)),
        ).alias("v")
    )
    wall = Window.partitionBy()
    for _ in range(PCA_ITERS):
        scored = base.crossJoin(broadcast(v)).select(
            "e", dot(F.col("e"), F.col("v")).alias("c")
        )
        s = (
            scored.select(F.posexplode("e").alias("i", "val"), "c")
            .groupBy("i")
            .agg(F.round(F.sum(F.col("val") * F.col("c")), 6).alias("s"))
        )
        nrm = F.sqrt(F.sum(F.col("s") * F.col("s")).over(wall))
        vn = s.select("i", F.round(F.col("s") / nrm, 6).alias("cv"))
        v = vn.agg(
            F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("sc")
        ).select(F.col("sc.cv").alias("v"))
    return base, v


def _pca_iter_sql(base: str, vprev: str, out: str) -> str:
    """One unrolled power-iteration step in DuckDB SQL: score every row
    against the previous direction, accumulate per-dimension (rounded),
    normalize (rounded)."""
    return f"""
    {out}_c AS (SELECT b.e, list_dot_product(b.e, v.v) AS c
                FROM {base} b, {vprev} v),
    {out}_s AS (SELECT g.i AS i, ROUND(SUM(e[g.i] * c), 6) AS s
                FROM {out}_c, UNNEST(generate_series(1, len(e))) AS g(i)
                GROUP BY g.i),
    {out} AS (SELECT list(ROUND(s / (SELECT SQRT(SUM(s * s))
                                     FROM {out}_s), 6) ORDER BY i) AS v
              FROM {out}_s)"""


@register(
    "x_embed_pca_power",
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
                  FROM embeddings),
    v0 AS (SELECT [CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END
                   for i in range(1, len(e) + 1)] AS v
           FROM base ORDER BY vec_id LIMIT 1),
    {_pca_iter_sql('base', 'v0', 'v1')},
    {_pca_iter_sql('base', 'v1', 'v2')},
    lam AS (SELECT ROUND(SUM(list_dot_product(b.e, v.v)
                             * list_dot_product(b.e, v.v)), 2) AS lambda_est
            FROM base b, v2 v)
    SELECT g.i AS dim, v2.v[g.i] AS loading, lam.lambda_est
    FROM v2, UNNEST(generate_series(1, len(v2.v))) AS g(i), lam
    """,
)
def x_embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud by POWER ITERATION
    ({PCA_ITERS} unrolled steps from a fixed unit start): the iterative
    linear-algebra primitive behind PCA whitening / anisotropy removal
    for embedding spaces (the all-but-the-top-component trick), run as
    pure DataFrame ops — each step scores rows against the current
    direction (broadcast), accumulates per-dimension partial sums
    (dim-bounded groups), and renormalizes.

    Cross-engine exactness: per-dimension accumulations and the
    normalized coordinates are rounded to 6 decimals at EVERY step, so
    both engines walk the same trajectory; the Rayleigh-quotient
    eigenvalue estimate rounds to 2 (it sums |rows| squared dots).

    100 TB posture: each iteration is one broadcast cross join (the
    direction is ONE row) + a posexplode partial agg onto dim groups —
    per-iteration cost is a single pass, state is O(dim); this is
    exactly how distributed power iteration / Lanczos steps shard."""
    base, v = _pca_direction(spark, sf_dir)
    lam = (
        base.crossJoin(broadcast(v))
        .select(dot(F.col("e"), F.col("v")).alias("c"))
        .agg(F.round(F.sum(F.col("c") * F.col("c")), 2).alias("lambda_est"))
    )
    return (
        v.select(F.posexplode("v").alias("i", "loading"))
        .select((F.col("i") + 1).alias("dim"), "loading")
        .crossJoin(broadcast(lam))
    )


@register(
    "x_embed_whiten",
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
                  FROM embeddings),
    v0 AS (SELECT [CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END
                   for i in range(1, len(e) + 1)] AS v
           FROM base ORDER BY vec_id LIMIT 1),
    {_pca_iter_sql('base', 'v0', 'v1')},
    {_pca_iter_sql('base', 'v1', 'v2')}
    SELECT b.vec_id,
           ROUND(list_dot_product(b.e, v.v), 6) AS proj,
           ROUND(SQRT(list_dot_product(b.e, b.e)), 6) AS norm_before,
           ROUND(SQRT(GREATEST(
               list_dot_product(b.e, b.e)
               - 2 * list_dot_product(b.e, v.v)
                   * list_dot_product(b.e, v.v)
               + list_dot_product(b.e, v.v) * list_dot_product(b.e, v.v)
                   * list_dot_product(v.v, v.v), 0.0)), 6) AS norm_after
    FROM base b, v2 v
    """,
)
def x_embed_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy removal (the all-but-the-top-component trick): project
    every embedding off the corpus' top principal direction — e' = e -
    (e·v)v — and report the projection plus the norm before/after.
    This is the embedding-hygiene transform published for sentence
    embeddings (dominant-direction removal makes cosine similarity
    discriminative again); it composes directly with x_embed_outliers /
    x_dedup_semantic, whose geometry a dominant direction distorts.

    The direction v comes from the SHARED power-iteration helper
    (_pca_direction — exactly x_embed_pca_power's trajectory, both
    engines re-rounded to 6 per step), so the whitened norms are
    pinned to the same direction the PCA op reports.

    Cross-engine exactness: norm_after uses the algebraic expansion
    e·e - 2c² + c²(v·v) with UNROUNDED c = e·v — every term is the
    same fixed-order fold in both engines — clamped at 0 (FP can dip
    an exact-zero residual negative) and rounded to 6.

    100 TB posture: the direction is ONE broadcast row; the whitening
    pass is a map-side projection per vector (three array folds), no
    shuffle at all beyond _pca_direction's dim-bounded iterations."""
    base, v = _pca_direction(spark, sf_dir)
    c = dot(F.col("e"), F.col("v"))
    return base.crossJoin(broadcast(v)).select(
        "vec_id",
        F.round(c, 6).alias("proj"),
        F.round(F.sqrt(dot(F.col("e"), F.col("e"))), 6).alias(
            "norm_before"
        ),
        F.round(
            F.sqrt(
                F.greatest(
                    dot(F.col("e"), F.col("e"))
                    - 2 * c * c
                    + c * c * dot(F.col("v"), F.col("v")),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("norm_after"),
    )


@register(
    "x_label_separation",
    oracle="""
    WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
    exd AS (SELECT label, g.i AS i, e[g.i] AS val
            FROM v, UNNEST(generate_series(1, len(e))) AS g(i)),
    cm AS (SELECT label, i, ROUND(AVG(val), 6) AS cv
           FROM exd GROUP BY label, i),
    c AS (SELECT label, list(cv ORDER BY i) AS c, COUNT(*) AS dim
          FROM cm GROUP BY label),
    n AS (SELECT label, COUNT(*) AS n_members FROM v GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           na.n_members AS n_a, nb.n_members AS n_b,
           ROUND(list_dot_product(a.c, b.c)
                 / (SQRT(list_dot_product(a.c, a.c))
                    * SQRT(list_dot_product(b.c, b.c))), 6)
               AS centroid_cosine
    FROM c a JOIN c b ON a.label < b.label
    JOIN n na ON na.label = a.label
    JOIN n nb ON nb.label = b.label
    """,
)
def x_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-class separation matrix: pairwise cosine between per-label
    embedding centroids — the labeled-data QA statistic that says
    whether classes are geometrically separable BEFORE training a
    classifier on them (near-1 centroid cosine between two labels =
    expect confusion; complements x_cluster_purity, which evaluates
    unsupervised cells against these same labels).

    Cross-engine exactness: per-label centroids are element-wise means
    rounded to 6 (the x_embed_outliers discipline, per label); the
    cosine is three fixed-order folds over the rounded centroids,
    rounded to 6.

    100 TB posture: one posexplode -> (label, dim) partial agg builds
    all centroids (|labels| x dim groups); the pair matrix is
    |labels|²-bounded — every relation after the one corpus-sized pass
    is label-bounded."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "label", _as_double(F.col("embedding")).alias("e")
    )
    exd = v.select("label", F.posexplode("e").alias("i", "val"))
    cm = exd.groupBy("label", "i").agg(
        F.round(F.avg("val"), 6).alias("cv")
    )
    c = cm.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("sc")
    ).select("label", F.col("sc.cv").alias("c"))
    n = v.groupBy("label").agg(F.count("*").alias("n_members"))
    a = c.alias("a")
    b = c.alias("b")
    na = n.alias("na")
    nb = n.alias("nb")
    return (
        a.join(b, F.col("a.label") < F.col("b.label"))
        .join(na, F.col("na.label") == F.col("a.label"))
        .join(nb, F.col("nb.label") == F.col("b.label"))
        .select(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            F.col("na.n_members").alias("n_a"),
            F.col("nb.n_members").alias("n_b"),
            F.round(
                dot(F.col("a.c"), F.col("b.c"))
                / (
                    F.sqrt(dot(F.col("a.c"), F.col("a.c")))
                    * F.sqrt(dot(F.col("b.c"), F.col("b.c")))
                ),
                6,
            ).alias("centroid_cosine"),
        )
    )


EMBED_DEAD_STD = 0.001  # a dimension with stddev below this is "dead"


@register(
    "x_embed_dim_stats",
    oracle=f"""
    WITH comp AS (
      SELECT g.i - 1 AS dim,
             CAST(ROUND(CAST(embedding[g.i] AS DOUBLE), 6)
                  AS DECIMAL(18,7)) AS x
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)),
    s AS (
      SELECT dim, COUNT(*) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx
      FROM comp GROUP BY dim)
    SELECT dim, CAST(n AS BIGINT) AS n_vecs,
           ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean,
           CASE WHEN n > 1 THEN
             ROUND(sqrt((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                        / (n - 1)), 6) END AS stddev,
           CASE WHEN n > 1 THEN
             sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                  / (n - 1)) < {EMBED_DEAD_STD}
           ELSE FALSE END AS is_dead
    FROM s
    """,
)
def x_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding profile: mean, stddev, and a dead-dim
    flag (σ < {EMBED_DEAD_STD}) for every coordinate — the collapsed /
    constant-dimension screen run before any whitening or quantization
    step trusts the space (a dead dim wastes an int8 code slot in
    x_embed_quantize and makes x_embed_whiten's covariance singular).

    Cross-engine exactness: each float32 component is rounded to 6 as
    a double (single-shot round of a generic value) and CARRIED AS
    DECIMAL(18,7), so the cross-row sums are associative and
    order-free at any parallelism — the corpus-sum analog of the
    per-row rounding the rest of the embedding family uses; the final
    mean/stddev are one double expression each, written identically
    in both engines, rounded 6.  The dead flag compares the UNROUNDED
    stddev expression — identical doubles both sides.

    100 TB posture: posexplode then ONE partial-agg shuffle onto
    |dims| groups carrying two DECIMAL accumulators — mergeable state,
    map-side combine absorbs the 64x row expansion; output is
    |dims| rows."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "dim",
        F.round(F.col("xf").cast("double"), 6)
        .cast("decimal(18,7)")
        .alias("x"),
    )
    s = comp.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    sd_expr = F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / F.col("n")
        )
        / (F.col("n") - 1)
    )
    # n > 1 guard, both engine sides (ADVICE r10 item 2): a single-row
    # group divides by n-1 = 0 — Spark's non-ANSI Divide yields NULL,
    # DuckDB yields inf; guard stddev to NULL/NULL.  The dead flag
    # stays a NON-NULL boolean (FALSE at n=1 — one row can't attest a
    # collapsed dim): a nullable boolean renders 'None' from Spark but
    # 'nan' from duckdb.df() and would hash-split the engines.
    one = F.col("n") > 1
    return s.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n").alias("n_vecs"),
        F.round(F.col("sx").cast("double") / F.col("n"), 6).alias("mean"),
        F.when(one, F.round(sd_expr, 6)).alias("stddev"),
        F.when(one, sd_expr < F.lit(EMBED_DEAD_STD))
        .otherwise(F.lit(False))
        .alias("is_dead"),
    )


KM_K = 4  # clusters
KM_SCALE = 1_000_000  # micro-unit grid for components and centroids


def _km_oracle() -> str:
    """Unrolled 2-iteration quantized-Lloyd oracle.  Each iteration's
    centroid is ROUND-half-away-from-zero of the member mean back onto
    the micro grid, so state stays integral (the q_ts_holt fold
    discipline applied to a 2-D iteration)."""
    assign = """
    {out} AS (
      SELECT vec_id, j FROM (
        SELECT c.vec_id, c.j,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id ORDER BY c.dist, c.j) AS rn
        FROM (
          SELECT comp.vec_id, cent.j,
                 SUM((comp.m - cent.c) * (comp.m - cent.c)) AS dist
          FROM comp JOIN {cent} cent ON cent.dim = comp.dim
          GROUP BY comp.vec_id, cent.j) c)
      WHERE rn = 1),
    {newcent} AS (
      SELECT a.j, comp.dim,
             CASE WHEN SUM(comp.m) >= 0
                  THEN (2 * SUM(comp.m) + COUNT(*)) // (2 * COUNT(*))
                  ELSE -((2 * (-SUM(comp.m)) + COUNT(*))
                         // (2 * COUNT(*)))
             END AS c
      FROM comp JOIN {out} a ON a.vec_id = comp.vec_id
      GROUP BY a.j, comp.dim)"""
    body = f"""
    WITH comp AS (
      SELECT vec_id, g.i - 1 AS dim,
             CAST(ROUND(CAST(embedding[g.i] AS DOUBLE) * {KM_SCALE})
                  AS BIGINT) AS m
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS g(i)),
    seeds AS (
      SELECT vec_id,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
      FROM embeddings QUALIFY j < {KM_K}),
    cent0 AS (
      SELECT s.j, comp.dim, comp.m AS c
      FROM comp JOIN seeds s ON s.vec_id = comp.vec_id),
    {assign.format(out="a1", cent="cent0", newcent="cent1")},
    {assign.format(out="a2", cent="cent1", newcent="cent2")},
    inert AS (
      SELECT a2.j,
             CAST(COUNT(DISTINCT comp.vec_id) AS BIGINT) AS n_members,
             SUM((comp.m - cent2.c) * (comp.m - cent2.c)) AS ss
      FROM comp
      JOIN a2 ON a2.vec_id = comp.vec_id
      JOIN cent2 ON cent2.j = a2.j AND cent2.dim = comp.dim
      GROUP BY a2.j),
    norm AS (
      SELECT j, SUM(CAST(c AS HUGEINT) * c) AS cc
      FROM cent2 GROUP BY j)
    SELECT i.j AS cluster, i.n_members,
           ROUND(CAST(i.ss AS DOUBLE) / {KM_SCALE} / {KM_SCALE}, 6)
             AS inertia,
           ROUND(SQRT(CAST(n.cc AS DOUBLE)) / {KM_SCALE}, 6)
             AS centroid_norm
    FROM inert i JOIN norm n ON n.j = i.j
    """
    return body


@register("x_kmeans_lloyd", oracle=_km_oracle())
def x_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized Lloyd k-means (k={KM_K}, 2 iterations) over the
    embedding table — the clustering tier the similarity family
    composes with (x_dedup_semantic consumes exactly this shape of
    cell assignment; x_sim_topk_ivf's cells are one Lloyd pass):
    deterministic md5-ranked seeds, assignment by exact integer
    squared distance, centroid update ROUNDED half-away-from-zero
    back onto the {KM_SCALE} micro grid.

    Cross-engine exactness — quantized-Lloyd IS the contract: float
    components land on the micro grid once (same double round both
    engines), every distance is an exact BIGINT Σ(m−c)², every
    centroid update is integer arithmetic ((2|S|+n) div 2n, signed),
    so the iteration CANNOT diverge between engines — the q_ts_holt
    exact-integer fold discipline lifted to a vector iteration.
    Ties in assignment break on cluster id (ORDER BY dist, j).

    100 TB posture: components explode map-side; each assignment pass
    is one shuffle of (vec, cluster) partial distance sums against a
    BROADCAST k×dims centroid relation (k·dims = {KM_K}·64 rows —
    always broadcastable); centroid update is a (cluster, dim)
    partial agg.  Iterations extend linearly; the comp relation is
    localCheckpointed once and reused by all passes (lineage
    truncation — the q_transitive_closure lesson).  No vector ever
    rides a shuffle as an array."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.select(
            "vec_id",
            F.posexplode(F.col("embedding")).alias("dim", "x"),
        )
        .select(
            "vec_id",
            "dim",
            F.round(F.col("x").cast("double") * KM_SCALE)
            .cast("long")
            .alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    # distributed top-k on the md5 rank (TakeOrderedAndProject), THEN
    # the row_number runs on the k-row result — never a global-sort
    # window over all vec ids
    picked = (
        emb.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(KM_K)
    )
    seeds = picked.select(
        "vec_id",
        (
            F.row_number().over(Window.orderBy("h", "vec_id")) - 1
        ).alias("j"),
    )
    cent = (
        comp.join(broadcast(seeds), "vec_id")
        .select("j", "dim", F.col("m").alias("c"))
        .localCheckpoint(eager=True)
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        d = (
            comp.join(broadcast(cent_df), "dim")
            .groupBy("vec_id", "j")
            .agg(
                F.sum(
                    (F.col("m") - F.col("c"))
                    * (F.col("m") - F.col("c"))
                ).alias("dist")
            )
        )
        return (
            d.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy("dist", "j")
                ),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", "j")
        )

    def update(a_df: DataFrame) -> DataFrame:
        s = comp.join(a_df, "vec_id").groupBy("j", "dim").agg(
            F.sum("m").alias("s"), F.count("*").alias("n")
        )
        # half-away-from-zero integer rounding of s/n onto the micro
        # grid: (2|s|+n) div (2n), re-signed — pure BIGINT, floor ==
        # truncation on the non-negative operands
        c = F.when(
            F.col("s") >= 0,
            F.expr("(2 * s + n) div (2 * n)"),
        ).otherwise(-F.expr("(2 * (-s) + n) div (2 * n)"))
        return s.select("j", "dim", c.cast("long").alias("c"))

    a1 = assign(cent)
    cent1 = update(a1).localCheckpoint(eager=True)
    a2 = assign(cent1).localCheckpoint(eager=True)
    cent2 = update(a2).localCheckpoint(eager=True)
    inert = (
        comp.join(a2, "vec_id")
        .join(broadcast(cent2), ["j", "dim"])
        .groupBy("j")
        .agg(
            F.count_distinct("vec_id").cast("long").alias("n_members"),
            F.sum(
                (F.col("m") - F.col("c")) * (F.col("m") - F.col("c"))
            ).alias("ss"),
        )
    )
    norm = cent2.groupBy("j").agg(
        F.sum(
            F.col("c").cast("decimal(18,0)")
            * F.col("c").cast("decimal(18,0)")
        ).alias("cc")
    )
    return inert.join(broadcast(norm), "j").select(
        F.col("j").alias("cluster"),
        "n_members",
        F.round(
            F.col("ss").cast("double") / KM_SCALE / KM_SCALE, 6
        ).alias("inertia"),
        F.round(
            F.sqrt(F.col("cc").cast("double")) / KM_SCALE, 6
        ).alias("centroid_norm"),
    )


SEM_DECON_N_EVAL = 20  # held-out eval set: vec_id < 20 (the
# x_decontaminate doc_id<20 convention, embedding-space edition)
SEM_DECON_THR = "0.35"  # flag threshold on max cosine to any eval
# vector (shared literal; sized to the fixture's similarity range so
# the op attests non-vacuously — corpus p99 vs evals is ~0.40)


@register(
    "x_decontaminate_semantic",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < {SEM_DECON_N_EVAL}),
    c AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id >= {SEM_DECON_N_EVAL}),
    scored AS (
      SELECT c.vec_id, q.vec_id AS eval_id,
             ROUND(list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
      FROM c, q),
    best AS (
      SELECT vec_id, eval_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, eval_id) AS rnk
      FROM scored)
    SELECT vec_id, eval_id AS nearest_eval_id, cos_sim AS max_cos
    FROM best
    WHERE rnk = 1 AND cos_sim >= {SEM_DECON_THR}
    """,
)
def x_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-SPACE decontamination: flag corpus vectors whose max
    cosine to any held-out eval vector reaches {SEM_DECON_THR} — the
    semantic sibling of x_decontaminate's exact 5-gram overlap.
    Paraphrased or translated benchmark leakage carries near-zero
    n-gram overlap but high embedding similarity, so a production
    pipeline runs BOTH screens; each flagged row names its nearest
    eval item for human triage (the survivor policy is downstream's).

    Cross-engine exactness: the x_sim_topk_cosine conventions —
    sequential-fold dot (bit-parity with list_dot_product), cosine
    ROUNDED TO 6 BEFORE ranking so the argmax order is identical,
    eval_id tiebreak.

    100 TB posture: the eval set is bounded and BROADCAST (norms
    precomputed per side, never per pair); the corpus is scanned once
    map-side, |evals| dots per vector; the per-vector argmax is a
    window over |evals| rows per key.  At billions of vectors the
    LSH-bucketed variant (x_dedup_near_embedding_lsh's index) replaces
    the dense sweep; the dense form here is the verify tier."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") < SEM_DECON_N_EVAL)
        .select(
            F.col("vec_id").alias("eval_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
        .withColumn("qnorm", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    )
    c = (
        e.filter(F.col("vec_id") >= SEM_DECON_N_EVAL)
        .select("vec_id", _as_double(F.col("embedding")).alias("cv"))
        .withColumn("cnorm", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    )
    scored = c.join(broadcast(q)).select(
        "vec_id",
        "eval_id",
        F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("qnorm") * F.col("cnorm")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), "eval_id"
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(
            (F.col("rnk") == 1)
            & (F.col("cos_sim") >= float(SEM_DECON_THR))
        )
        .select(
            "vec_id",
            F.col("eval_id").alias("nearest_eval_id"),
            F.col("cos_sim").alias("max_cos"),
        )
    )


@register(
    "x_decontaminate_semantic_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, {_sql_code_expr('v')} AS code,
                 sqrt(list_dot_product(v, v)) AS nrm
          FROM e),
    q AS (SELECT vec_id AS eval_id, v AS qv, code AS qcode, nrm AS qnorm
          FROM n WHERE vec_id < {SEM_DECON_N_EVAL}),
    probes AS (
      SELECT DISTINCT eval_id, qv, qnorm, xor(qcode, m.m) AS pcode
      FROM q, UNNEST({_PROBE_MASKS}) AS m(m)),
    scored AS (
      SELECT c.vec_id, p.eval_id,
             ROUND(list_dot_product(p.qv, c.v) / (p.qnorm * c.nrm), 6)
                 AS cos_sim
      FROM n c JOIN probes p ON c.code = p.pcode
      WHERE c.vec_id >= {SEM_DECON_N_EVAL}),
    best AS (
      SELECT vec_id, eval_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, eval_id) AS rnk
      FROM scored)
    SELECT vec_id, eval_id AS nearest_eval_id, cos_sim AS max_cos
    FROM best
    WHERE rnk = 1 AND cos_sim >= {SEM_DECON_THR}
    """,
)
def x_decontaminate_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-INDEX path of x_decontaminate_semantic — the
    billion-vector plan its docstring names (VERDICT r12 item 5), now
    registered and gated: the eval set expands into multi-probe
    hyperplane buckets (own code + every Hamming-1 neighbor, the
    x_sim_topk_lsh_multiprobe dial), the corpus joins on the 8-bit
    code, and the EXACT cosine runs on CANDIDATES ONLY — the dense
    |corpus|x|evals| sweep is gone.  Flags a corpus vector when its max
    candidate cosine reaches {SEM_DECON_THR}; precision is exact (every
    flag is a true ≥-threshold cosine), recall is the sign-LSH
    collision probability AT THE TARGET SIMILARITY: p = 1 − θ/π per
    bit, P(Hamming ≤ 1) = p⁸ + 8p⁷(1−p).  At contamination-level
    similarity (paraphrase, cos ≥ 0.95, θ ≤ 18°: p ≈ 0.90 → ~80%; one
    more table or probe ring takes it >95%) the index recalls what the
    screen exists to catch; at the FIXTURE's deliberately weak
    threshold ({SEM_DECON_THR}, θ ≈ 69°, p ≈ 0.61) recall vs the dense
    twin is ~17% — documented honestly, pinned with a
    planted-contamination recall test and a flags-⊆-dense precision
    test in tests/test_round13_ops.py.  Production dial: more tables
    (independent plane sets, OR of flags) or a wider probe ring.

    Cross-engine exactness: the oracle replays bucketing with the SAME
    literal hyperplanes and probe masks, cosines rounded-6 before the
    argmax (eval_id tiebreak) — the x_sim_topk_lsh convention.  A
    (corpus, eval) pair matches AT MOST ONE probe (probe codes of one
    eval are pairwise distinct), so no candidate dedup pass exists to
    diverge.

    100 TB posture: probe relation ≤ |evals|·(1+N_PLANES) rows,
    BROADCAST; the corpus is scanned once and shuffles NOTHING for the
    join (map-side hash against the broadcast); scored candidates are
    bucket-bounded (E[|bucket|] = N/2^{N_PLANES}), and the per-vector
    argmax window partitions on vec_id over ≤|evals| rows per key.  At
    1B vectors the dense twin scores 20B pairs; this scores only the
    probed buckets — the scan cost IS the whole cost."""
    e = load_table(spark, sf_dir, "embeddings")
    coded = e.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        lsh_code(_as_double(F.col("embedding"))).alias("code"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    probes = (
        coded.filter(F.col("vec_id") < SEM_DECON_N_EVAL)
        .select(
            F.col("vec_id").alias("eval_id"),
            F.col("v").alias("qv"),
            F.col("code").alias("qcode"),
            F.col("nrm").alias("qnorm"),
        )
        .withColumn(
            "pcode",
            F.explode(
                F.array(*[
                    F.col("qcode").bitwiseXOR(F.lit(m))
                    for m in _PROBE_MASKS
                ])
            ),
        )
    )
    scored = (
        coded.filter(F.col("vec_id") >= SEM_DECON_N_EVAL)
        .join(broadcast(probes), F.col("code") == F.col("pcode"))
        .select(
            "vec_id",
            "eval_id",
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("qnorm") * F.col("nrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), "eval_id"
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(
            (F.col("rnk") == 1)
            & (F.col("cos_sim") >= float(SEM_DECON_THR))
        )
        .select(
            "vec_id",
            F.col("eval_id").alias("nearest_eval_id"),
            F.col("cos_sim").alias("max_cos"),
        )
    )


ECE_BINS = 10  # reliability-diagram bins over confidence in [0, 1]


@register(
    "x_ece_calibration",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
               FROM embeddings),
    exd AS (SELECT label, g.i AS i, e[g.i] AS val
            FROM v, UNNEST(generate_series(1, len(e))) AS g(i)),
    cm AS (SELECT label, i, ROUND(AVG(val), 6) AS cv
           FROM exd GROUP BY label, i),
    c AS (SELECT label AS clabel, list(cv ORDER BY i) AS cvec
          FROM cm GROUP BY label),
    scored AS (
      SELECT v.vec_id, v.label, c.clabel,
             ROUND(list_dot_product(v.e, c.cvec)
                   / (SQRT(list_dot_product(v.e, v.e))
                      * SQRT(list_dot_product(c.cvec, c.cvec))), 6)
               AS cos
      FROM v CROSS JOIN c),
    pred AS (
      SELECT vec_id, label, clabel AS predicted, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, clabel) AS rn
      FROM scored),
    conf AS (
      SELECT vec_id, label, predicted,
             ROUND((1.0 + cos) / 2.0, 7) AS conf,
             CAST(LEAST(FLOOR(CAST(ROUND((1.0 + cos) / 2.0, 7)
                                   AS DECIMAL(11,7)) * {ECE_BINS}),
                        {ECE_BINS} - 1) AS BIGINT) AS bin
      FROM pred WHERE rn = 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM conf),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN predicted = label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct,
             SUM(CAST(conf AS DECIMAL(11,7))) AS sum_conf
      FROM conf GROUP BY bin)
    SELECT b.bin,
           ROUND(CAST(b.bin AS DOUBLE) / {ECE_BINS}, 6) AS conf_lo,
           b.n, b.n_correct,
           ROUND(CAST(b.n_correct AS DOUBLE) / b.n, 6) AS acc,
           ROUND(CAST(b.sum_conf AS DOUBLE) / b.n, 6) AS avg_conf,
           ROUND(ABS(CAST(b.n_correct AS DOUBLE) / b.n
                     - CAST(b.sum_conf AS DOUBLE) / b.n), 6) AS gap,
           ROUND(CAST(b.n AS DOUBLE) / tot.nt, 6) AS weight,
           CAST(SUM(CAST(ROUND(
                  ABS(CAST(b.n_correct AS DOUBLE) / b.n
                      - CAST(b.sum_conf AS DOUBLE) / b.n)
                  * b.n / tot.nt, 9) AS DECIMAL(12,9)))
                OVER () AS DOUBLE) AS ece
    FROM bins b, tot
    """,
)
def x_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error of the nearest-centroid classifier
    over the embeddings table — the reliability diagram (per-bin
    accuracy vs mean confidence) plus the scalar ECE = Σ_b w_b·|acc_b −
    conf_b|.  The labeled-data QA layer ABOVE x_label_separation: the
    centroid geometry says classes are separable; this says whether the
    induced classifier's confidence can be TRUSTED as a probability —
    the statistic that decides if model-scored quality/filter labels
    (x_quality_classifier's world) can gate data by a confidence
    threshold at 100 TB.

    Mechanics: per-label centroids are the rounded-6 element-wise means
    (the x_label_separation discipline); every vector scores a rounded-6
    cosine against each centroid, argmax with label-ascending tiebreak
    (rounded BEFORE ranking, the x_sim_topk_cosine rule); confidence is
    the affine map (1+cos)/2 onto [0,1] (monotone, deterministic —
    documented as a calibration MAP choice, not a softmax); bins are
    floor(conf·10) clamped to 9, computed from the ROUNDED conf on the
    exact DECIMAL(11,7) grid so bin membership and the reported conf
    always agree at bin edges (ADVICE r12/1).

    Cross-engine exactness: cosines and conf are rounded-6 before any
    decision; (1+x)/2 of a 6-dp value is a 7-decimal-digit quantity, so
    conf rounds at 7 dp — NEVER back onto the 6-dp grid, whose halfway
    points are exactly where Spark's shortest-repr HALF_UP and DuckDB's
    binary rounding disagree (the BASELINE.md §18a class, caught live by
    the gate); ·10 and the floor ride the same double on both engines;
    per-bin conf sums ride DECIMAL(11,7) (order-free); acc and the gap are fixed-order expressions of exact
    integers/decimals; the ECE fold sums rounded-9 DECIMAL contributions
    over the ≤10-row bin relation.

    100 TB posture: centroids come from ONE posexplode partial-agg onto
    |labels|·dim groups and broadcast back (|labels| tiny); scoring is a
    map-side |labels|-way fan-out — no N² pair join; the bin rollup is a
    10-group partial agg.  Every post-scan relation is bounded."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("e")
    )
    exd = v.select("label", F.posexplode("e").alias("i", "val"))
    cm = exd.groupBy("label", "i").agg(
        F.round(F.avg("val"), 6).alias("cv")
    )
    c = (
        cm.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("sc"))
        .select(
            F.col("label").alias("clabel"), F.col("sc.cv").alias("cvec")
        )
    )
    scored = v.crossJoin(broadcast(c)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(
            dot(F.col("e"), F.col("cvec"))
            / (
                F.sqrt(dot(F.col("e"), F.col("e")))
                * F.sqrt(dot(F.col("cvec"), F.col("cvec")))
            ),
            6,
        ).alias("cos"),
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("clabel")
    )
    conf = (
        scored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("clabel").alias("predicted"),
            F.round((F.lit(1.0) + F.col("cos")) / 2.0, 7).alias("conf"),
            # bin from the ROUNDED conf on the exact decimal grid
            # (ADVICE r12/1): decimal x integer multiply is exact, so
            # bin membership always agrees with the reported conf even
            # when rounding crosses a bin edge; mirrored in the oracle
            F.least(
                F.floor(
                    F.round((F.lit(1.0) + F.col("cos")) / 2.0, 7).cast(
                        "decimal(11,7)"
                    )
                    * ECE_BINS
                ),
                F.lit(ECE_BINS - 1).cast("long"),
            )
            .cast("long")
            .alias("bin"),
        )
        .localCheckpoint(eager=True)
    )
    tot = conf.agg(F.count("*").cast("long").alias("nt"))
    bins = conf.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(F.col("predicted") == F.col("label"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
        F.sum(F.col("conf").cast("decimal(11,7)")).alias("sum_conf"),
    )
    acc = F.col("n_correct").cast("double") / F.col("n")
    avgc = F.col("sum_conf").cast("double") / F.col("n")
    contrib = F.round(
        F.abs(acc - avgc) * F.col("n") / F.col("nt"), 9
    ).cast("decimal(12,9)")
    return bins.crossJoin(tot).select(
        "bin",
        F.round(F.col("bin").cast("double") / ECE_BINS, 6).alias(
            "conf_lo"
        ),
        "n",
        "n_correct",
        F.round(acc, 6).alias("acc"),
        F.round(avgc, 6).alias("avg_conf"),
        F.round(F.abs(acc - avgc), 6).alias("gap"),
        F.round(F.col("n").cast("double") / F.col("nt"), 6).alias(
            "weight"
        ),
        F.sum(contrib)
        .over(Window.partitionBy())
        .cast("double")
        .alias("ece"),
    )


MMR_K = 5        # diversified picks
MMR_POOL = 20    # relevance-ranked candidate pool fed to the greedy
MMR_LAMBDA = "0.7"  # textual literal: score = 0.7*rel - 0.3*max_sim


def _mmr_oracle() -> str:
    """Generated MATERIALIZED CTEs for the unrolled greedy — the same
    fixed schedule the Spark loop builds (the q_graph_kcore pattern)."""
    lam = MMR_LAMBDA
    parts = [
        "v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e"
        " FROM embeddings)",
        "qv AS MATERIALIZED (SELECT e FROM v WHERE vec_id = 0)",
        "rel AS MATERIALIZED ("
        "SELECT v.vec_id, ROUND(list_dot_product(v.e, qv.e)"
        " / (SQRT(list_dot_product(v.e, v.e))"
        " * SQRT(list_dot_product(qv.e, qv.e))), 6) AS rel"
        " FROM v, qv WHERE v.vec_id <> 0)",
        f"pool AS MATERIALIZED (SELECT vec_id, rel FROM ("
        f"SELECT vec_id, rel, ROW_NUMBER() OVER"
        f" (ORDER BY rel DESC, vec_id) AS rn FROM rel)"
        f" WHERE rn <= {MMR_POOL})",
        "sims AS MATERIALIZED ("
        "SELECT a.vec_id AS ca, b.vec_id AS cb,"
        " ROUND(list_dot_product(va.e, vb.e)"
        " / (SQRT(list_dot_product(va.e, va.e))"
        " * SQRT(list_dot_product(vb.e, vb.e))), 6) AS sim"
        " FROM pool a JOIN v va ON va.vec_id = a.vec_id"
        " JOIN pool b ON a.vec_id <> b.vec_id"
        " JOIN v vb ON vb.vec_id = b.vec_id)",
        "pick1 AS MATERIALIZED ("
        "SELECT vec_id, rel, rel AS mmr_score, 1 AS pick"
        " FROM pool ORDER BY rel DESC, vec_id LIMIT 1)",
        "sel1 AS MATERIALIZED (SELECT vec_id FROM pick1)",
    ]
    for i in range(2, MMR_K + 1):
        p = i - 1
        parts += [
            f"cand{i} AS MATERIALIZED ("
            f"SELECT p.vec_id, p.rel, MAX(s.sim) AS ms"
            f" FROM pool p JOIN sims s ON s.ca = p.vec_id"
            f" JOIN sel{p} t ON t.vec_id = s.cb"
            f" WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{p})"
            f" GROUP BY p.vec_id, p.rel)",
            f"pick{i} AS MATERIALIZED ("
            f"SELECT vec_id, rel,"
            f" ROUND({lam} * rel - (1 - {lam}) * ms, 7) AS mmr_score,"
            f" {i} AS pick FROM cand{i}"
            f" ORDER BY ROUND({lam} * rel - (1 - {lam}) * ms, 7) DESC,"
            f" vec_id LIMIT 1)",
            f"sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{p}"
            f" UNION ALL SELECT vec_id FROM pick{i})",
        ]
    union = " UNION ALL ".join(
        f"SELECT * FROM pick{i}" for i in range(1, MMR_K + 1)
    )
    return f"""
    WITH {",".join(parts)}
    SELECT CAST(pick AS BIGINT) AS pick, vec_id, rel, mmr_score
    FROM ({union})
    """


@register("x_embed_mmr_diversify", oracle=_mmr_oracle())
def x_embed_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): pick {MMR_K} results for query vec 0 that are RELEVANT but
    not redundant — greedy argmax of λ·rel(c) − (1−λ)·max sim(c, s)
    over already-selected s, λ = {MMR_LAMBDA}.  The diversification
    layer the retrieval tier was missing: x_sim_topk_cosine returns the
    k most-similar vectors even if they are near-duplicates of each
    other; MMR is how a retrieval-augmented or few-shot-selection
    pipeline avoids paying its context budget for the same passage
    five times.

    Mechanics: the pool is the top-{MMR_POOL} by rounded relevance
    (bounded — the greedy never touches the corpus again), its pairwise
    cosine matrix is computed ONCE, and the {MMR_K}-step greedy is
    unrolled with the SAME fixed schedule on both engines (generated
    MATERIALIZED CTEs / a localCheckpointed plan loop — the
    q_graph_kcore discipline).  Every relevance and similarity rounds
    to 6 dp BEFORE any argmax (the x_sim_topk_cosine rule); MMR scores
    round at 7 dp — λ·(6-dp) products are 7-decimal-digit quantities,
    so 7 is the grid OFF the halfway points (the x_ece_calibration
    lesson); all ties break by vec_id ascending.

    100 TB posture: relevance scoring is the one corpus-sized pass
    (map-side vs a broadcast query, the x_sim_topk_cosine plan); the
    pool row_number, the {MMR_POOL}²-cell sim matrix and the greedy all
    ride broadcast-sized relations.  At billions of vectors the pool
    feed swaps to x_sim_topk_lsh's bucketed candidates — the greedy is
    feed-agnostic."""
    lam = float(MMR_LAMBDA)
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    qv = v.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    rel = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(broadcast(qv))
        .select(
            "vec_id",
            "e",
            F.round(
                dot(F.col("e"), F.col("qe"))
                / (
                    F.sqrt(dot(F.col("e"), F.col("e")))
                    * F.sqrt(dot(F.col("qe"), F.col("qe")))
                ),
                6,
            ).alias("rel"),
        )
    )
    wp = Window.orderBy(F.col("rel").desc(), F.col("vec_id"))
    pool = (
        rel.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= MMR_POOL)
        .select("vec_id", "rel", "e")
        .localCheckpoint(eager=True)
    )
    a = pool.select(
        F.col("vec_id").alias("ca"), F.col("e").alias("ea")
    )
    b = pool.select(
        F.col("vec_id").alias("cb"), F.col("e").alias("eb")
    )
    sims = (
        a.join(b, F.col("ca") != F.col("cb"))
        .select(
            "ca",
            "cb",
            F.round(
                dot(F.col("ea"), F.col("eb"))
                / (
                    F.sqrt(dot(F.col("ea"), F.col("ea")))
                    * F.sqrt(dot(F.col("eb"), F.col("eb")))
                ),
                6,
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    pool_slim = pool.select("vec_id", "rel")
    pick1 = (
        pool_slim.orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("pick"),
            "vec_id",
            "rel",
            F.col("rel").alias("mmr_score"),
        )
        .localCheckpoint(eager=True)
    )
    picks = [pick1]
    sel = pick1.select("vec_id").localCheckpoint(eager=True)
    for i in range(2, MMR_K + 1):
        cand = (
            pool_slim.join(sel, "vec_id", "left_anti")
            .join(sims, F.col("ca") == F.col("vec_id"))
            .join(sel.withColumnRenamed("vec_id", "cb"), "cb")
            .groupBy("vec_id", "rel")
            .agg(F.max("sim").alias("ms"))
        )
        score = F.round(
            F.lit(lam) * F.col("rel")
            - (F.lit(1.0) - F.lit(lam)) * F.col("ms"),
            7,
        )
        pick = (
            cand.withColumn("mmr_score", score)
            .orderBy(F.col("mmr_score").desc(), F.col("vec_id"))
            .limit(1)
            .select(
                F.lit(i).cast("long").alias("pick"),
                "vec_id",
                "rel",
                "mmr_score",
            )
            .localCheckpoint(eager=True)
        )
        picks.append(pick)
        sel = sel.unionAll(pick.select("vec_id")).localCheckpoint(
            eager=True
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out
