"""Training-data pipeline operators beyond the dedup/similarity/text core
(extension tier, SURVEY.md §2.4b): PII scrubbing, document chunking,
deterministic stratified sampling, IVF-style ANN, and sequence packing.

Everything is JVM-side built-ins (regex, higher-order array functions,
windows) — no Python in the hot path — and every op carries a DuckDB
oracle, so the whole tier is EXACT-checked like the relational surface.

100 TB posture per op is in its docstring; the common thread: each is a
single scan plus at most one key-partitioned shuffle, no driver-side
loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load_table
from ..registry import register
from .similarity import N_QUERIES, TOP_K, _as_double, dot

# chunking parameters: 50-token windows, stride 25 (50% overlap)
CHUNK_TOKENS = 50
CHUNK_STRIDE = 25

# sequence packing: token budget per packed training sequence
PACK_BUDGET = 256

# sequence packing: hash-shards per language.  Packing runs within
# (lang, shard) so no single task ever sorts a whole language; 16 here
# (one md5 nibble), thousands at cluster scale.
PACK_SHARDS = 16

# deterministic cross-engine shard: first hex nibble of md5(doc_id) as an
# int in [0, 16).  Spark locate() and DuckDB strpos() are both 1-based.
_SHARD_SPARK = (
    "locate(substring(md5(cast(doc_id as string)), 1, 1), "
    "'0123456789abcdef') - 1"
)
_SHARD_DUCK = (
    "strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1"
)


def _pack_local(sized: DataFrame) -> DataFrame:
    """Two-level packing, level 1: contiguous-fill pack assignment within
    (lang, shard) from a `sized` frame carrying doc_id/lang/shard/n_tokens
    (plus any payload columns, preserved).  Adds `local_pack`.

    Id contract: local packs are monotone in doc_id and dense from 0
    *when every doc fits the budget*.  A doc longer than PACK_BUDGET
    spans several budget boundaries, so the doc AFTER it skips the ids
    covered by the overrun (e.g. tokens 250/296/10 at budget 256 yields
    local packs {0, 0, 2} — id 1 is empty).  Ids never collide; density
    holds only in the all-docs-<=-budget regime (long docs are chunked
    by x_doc_chunk upstream in x_corpus_prep)."""
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    # floor division on longs (DuckDB CAST(double AS BIGINT) ROUNDS — the
    # oracle must use // so both engines floor)
    return cum.withColumn(
        "local_pack",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / PACK_BUDGET).cast(
            "long"
        ),
    ).drop("cum_tokens")


def _pack_offsets(sized: DataFrame) -> DataFrame:
    """Two-level packing, level 2: global pack numbering.  With contiguous
    fill, a shard's local id space needs no window: its last pack id is
    (total_tokens - last_doc_tokens) // budget, so

        n_packs = (sum(n_tokens) - max_by(n_tokens, doc_id)) // budget + 1

    n_packs is the size of the shard's local ID SPACE (max id + 1), not
    its count of non-empty packs — an over-budget doc leaves empty ids
    behind it (see _pack_local).  Offsets built from id-space sizes keep
    every shard's global range disjoint, so global ids never collide;
    they are additionally dense whenever every doc fits the budget.

    This is a plain aggregate with map-side partials, so this branch shuffles
    only |lang| x PACK_SHARDS tiny partial rows per input partition, never
    the corpus (the level-1 window is NOT recomputed here).  A prefix sum
    over shards within each lang then yields each shard's starting offset;
    the result broadcasts back onto the big side."""
    per_shard = sized.groupBy("lang", "shard").agg(
        (
            F.floor(
                (F.sum("n_tokens") - F.max_by("n_tokens", "doc_id"))
                / PACK_BUDGET
            )
            + F.lit(1)
        ).alias("n_packs")
    )
    wo = (
        Window.partitionBy("lang")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_shard.select(
        "lang",
        "shard",
        F.coalesce(F.sum("n_packs").over(wo), F.lit(0)).alias("pack_off"),
    )


# shared CTE prefix for the two packing oracles: level-1 local packing and
# the per-shard prefix-sum offsets, mirroring _pack_local/_pack_offsets.
_PACK_ORACLE_CTES = f"""
    sized AS (
      SELECT doc_id, lang, text, len(str_split(text, ' ')) AS n_tokens,
             {_SHARD_DUCK} AS shard
      FROM documents),
    cum AS (
      SELECT doc_id, lang, text, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM sized),
    local AS (
      SELECT doc_id, lang, text, shard, n_tokens,
             CAST((cum_tokens - n_tokens) // {PACK_BUDGET} AS BIGINT)
                 AS local_pack
      FROM cum),
    offsets AS (
      SELECT lang, shard,
             COALESCE(SUM(n_packs) OVER (PARTITION BY lang ORDER BY shard
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS pack_off
      FROM (SELECT lang, shard,
                   (SUM(n_tokens) - arg_max(n_tokens, doc_id))
                       // {PACK_BUDGET} + 1 AS n_packs
            FROM sized GROUP BY lang, shard))
"""


@register(
    "x_pii_scrub",
    oracle="""
    SELECT doc_id,
           length(regexp_replace(
             regexp_replace(text, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
             '[0-9]+', '<NUM>', 'g')) AS scrubbed_len,
           len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.-]+'))
               AS n_emails,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers
    FROM documents
    """,
)
def x_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact email-shaped spans then digit runs, and count
    what was redacted (the audit trail a compliance pass needs).  Pure
    codegen'd regexp_replace — at 100 TB this is a map-only pass with no
    shuffle at all; emitting lengths keeps the oracle comparison compact
    while still pinning every replacement (a single missed span shifts
    the length)."""
    d = load_table(spark, sf_dir, "documents")
    email = "[a-z0-9._]+@[a-z0-9.-]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), email, "<EMAIL>"),
        "[0-9]+",
        "<NUM>",
    )
    return d.select(
        "doc_id",
        F.length(scrubbed).alias("scrubbed_len"),
        F.size(F.regexp_extract_all("text", F.lit(email), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias(
            "n_numbers"
        ),
    )


@register(
    "x_doc_chunk",
    oracle=f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    starts AS (
      SELECT doc_id, l, g.s
      FROM t, UNNEST(generate_series(1, len(l), {CHUNK_STRIDE})) AS g(s))
    SELECT doc_id,
           CAST((s - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           len(list_slice(l, s, s + {CHUNK_TOKENS} - 1)) AS chunk_tokens,
           md5(array_to_string(list_slice(l, s, s + {CHUNK_TOKENS} - 1), ' '))
               AS chunk_md5
    FROM starts
    """,
)
def x_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({CHUNK_TOKENS}-token windows,
    stride {CHUNK_STRIDE}) — the context-window prep stage of a training
    pipeline.  Chunk content is pinned by md5 so the oracle checks the
    exact text of every chunk without shipping it.  Explode + projection
    only: map-side, no shuffle; at 100 TB chunk rows inherit the input
    partitioning and flow straight into the tokenizer."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    chunked = d.select(
        "doc_id",
        toks.alias("l"),
        F.explode(starts).alias("s0"),
    )
    chunk = F.slice(F.col("l"), F.col("s0") + 1, CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        (F.col("s0") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.size(chunk).alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "x_sample_stratified",
    oracle="""
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                           IN ('0','1','2','3') THEN 1 END) AS n_sampled
    FROM documents
    GROUP BY source
    """,
)
def x_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: a content-independent hash of the
    stable key (md5 of doc_id) selects ~4/16 = 25% per source stratum.
    Unlike df.sample(), the decision is reproducible across runs, engines
    and partitionings — the property an incremental 100 TB pipeline needs
    so re-runs keep the same sample.  One partial-agg shuffle on source."""
    d = load_table(spark, sf_dir, "documents")
    picked = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(picked, F.lit(1))).alias("n_sampled"),
    )


@register(
    "x_sim_topk_ivf",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v)
                        / (sqrt(list_dot_product(q.v, q.v))
                           * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
           FROM q JOIN c ON q.label = c.label AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def x_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell instead of the
    full corpus.  The `label` column stands in for the coarse-quantizer
    assignment (in a real IVF index the assignment is computed once at
    index build and stored exactly like this).  The join key is the cell
    id, so the shuffle is O(N) and each query scans ~N/cells candidates —
    the standard recall/cost trade against x_sim_topk_cosine's O(|Q|·N).
    EXACT: cell membership is data, so DuckDB reproduces it verbatim."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            _as_double(F.col("embedding")).alias("qv"),
        )
        .withColumn("qnorm", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        _as_double(F.col("embedding")).alias("cv"),
    ).withColumn("cnorm", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    scored = (
        c.join(
            broadcast(q),
            (F.col("q_label") == F.col("c_label"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return scored.select("*", F.row_number().over(w).alias("rnk")).filter(
        F.col("rnk") <= TOP_K
    )


@register(
    "x_seq_pack",
    oracle=f"""
    WITH {_PACK_ORACLE_CTES}
    SELECT l.lang,
           CAST(o.pack_off + l.local_pack AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(l.n_tokens) AS BIGINT) AS tokens_in_pack
    FROM local l JOIN offsets o ON l.lang = o.lang AND l.shard = o.shard
    GROUP BY 1, 2
    """,
)
def x_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sequence packing: fill {PACK_BUDGET}-token training
    sequences with consecutive documents per (lang, shard), where shard is
    a deterministic hash nibble of doc_id (contiguous-fill packing — a doc
    starts a new pack when the running total crosses the budget, so a pack
    can overflow by at most one document; the deterministic SQL-expressible
    variant of greedy bin packing).  Pack ids are then renumbered globally
    per language by adding each shard's starting offset, a prefix sum over
    the tiny (|lang| x {PACK_SHARDS}-row) per-shard pack-count frame that
    broadcasts back onto the corpus.

    100 TB posture: the level-1 window partitions by (lang, shard) — never
    a whole language in one task, unlike a naive partitionBy(lang) running
    sum, which would sort the entire English corpus through a single
    task.  The offset frame is O(|lang| x shards) regardless of corpus
    size, its window is equally tiny, and the broadcast join adds no
    shuffle.  Numbering is a pure function of the data (not of cluster
    layout), so reruns and the oracle agree bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.expr(_SHARD_SPARK).cast("int").alias("shard"),
    )
    local = _pack_local(sized)
    return (
        local.join(broadcast(_pack_offsets(sized)), ["lang", "shard"])
        .withColumn("pack_id", F.col("pack_off") + F.col("local_pack"))
        .groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens_in_pack"),
        )
    )


LANG_QUOTA = 50  # per-language document cap for balanced sampling


@register(
    "x_lang_balance",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rk
      FROM documents)
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_ids_sum
    FROM ranked
    WHERE rk <= {LANG_QUOTA}
    GROUP BY lang
    """,
)
def x_lang_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced corpus capping: keep at most LANG_QUOTA documents
    per language, chosen by rank over a content-independent hash of the
    stable key (md5, identical in both engines) — the deterministic,
    repartition-proof version of per-stratum downsampling that corpus
    mixture tuning needs.  One window shuffle on lang; the kept-ids
    checksum pins that both engines selected the SAME documents, not just
    the same counts."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= LANG_QUOTA)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("kept_ids_sum"),
        )
    )


@register(
    "x_doc_concat",
    oracle=f"""
    WITH {_PACK_ORACLE_CTES}
    SELECT l.lang,
           CAST(o.pack_off + l.local_pack AS BIGINT) AS pack_id,
           md5(string_agg(l.text, '<|endoftext|>' ORDER BY l.doc_id))
               AS sequence_md5,
           CAST(SUM(l.n_tokens) AS BIGINT) AS n_tokens
    FROM local l JOIN offsets o ON l.lang = o.lang AND l.shard = o.shard
    GROUP BY 1, 2
    """,
)
def x_doc_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the packed training sequences that x_seq_pack plans:
    concatenate each pack's documents in deterministic (doc_id) order with
    an end-of-text separator.  The sequence content is pinned by md5 so
    the oracle checks byte-exact sequence construction without shipping
    the text.

    Shares x_seq_pack's two-level scheme — pack within (lang, shard),
    renumber via the broadcast per-shard prefix-sum offsets — so the big
    window never keys on bare lang; the ordered concat then runs inside
    the per-pack aggregate and sequences stream straight to the
    tokenizer.  A pack never spans shards, so the concat needs no
    cross-shard order."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.expr(_SHARD_SPARK).cast("int").alias("shard"),
    )
    local = _pack_local(sized)
    return (
        local.join(broadcast(_pack_offsets(sized.drop("text"))), ["lang", "shard"])
        .withColumn("pack_id", F.col("pack_off") + F.col("local_pack"))
        .groupBy("lang", "pack_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "text"))
                        ),
                        lambda s: s.getField("text"),
                    ),
                    "<|endoftext|>",
                )
            ).alias("sequence_md5"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


PREP_QUOTA = 100  # per-language cap in the composite prep pipeline


@register(
    "x_corpus_prep",
    oracle=f"""
    WITH filtered AS (
      SELECT doc_id, lang, text,
             len(str_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE n_chars >= 100 AND lang IN ('en', 'fr', 'de', 'es', 'ja')),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS dup_rk
        FROM filtered)
      WHERE dup_rk = 1),
    balanced AS (
      SELECT * FROM (
        SELECT doc_id, lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rk
        FROM deduped)
      WHERE rk <= {PREP_QUOTA})
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(CEIL(SUM(n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS n_packs,
           CAST(SUM(doc_id) AS BIGINT) AS kept_ids_sum
    FROM balanced
    GROUP BY lang
    """,
)
def x_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composite: the full corpus-prep chain a training-data run
    executes — quality gate (length + language allowlist, pushed into the
    scan) -> exact dedup (md5 content hash, 32-byte shuffle key) ->
    language-balanced capping (content-independent md5 rank) -> packing
    stats (sequences of PACK_BUDGET tokens).  Each stage is the already-
    verified standalone operator (x_lang_like_filter / x_dedup_exact_hash /
    x_lang_balance / x_seq_pack) fused into ONE lazy plan: Catalyst
    collapses the projections, the dedup and balance windows are the only
    wide stages, and the final aggregate is partial+final.  The kept-ids
    checksum pins that both engines selected the SAME documents."""
    d = load_table(spark, sf_dir, "documents")
    # the content digest is computed BEFORE the dedup shuffle and the raw
    # text is dropped, so the wide stages move 32-byte keys, not documents
    filtered = d.filter(
        (F.col("n_chars") >= 100)
        & F.col("lang").isin("en", "fr", "de", "es", "ja")
    ).select(
        "doc_id",
        "lang",
        F.md5("text").alias("content_h"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    dup_w = Window.partitionBy("content_h").orderBy("doc_id")
    deduped = (
        filtered.withColumn("dup_rk", F.row_number().over(dup_w))
        .filter(F.col("dup_rk") == 1)
    )
    bal_w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    balanced = (
        deduped.select(
            "doc_id", "lang", "n_tokens",
            F.row_number().over(bal_w).alias("rk"),
        )
        .filter(F.col("rk") <= PREP_QUOTA)
    )
    return balanced.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / PACK_BUDGET).alias("n_packs"),
        F.sum("doc_id").alias("kept_ids_sum"),
    )


# "tokenizer" for the tensorization demo: a 16-bit hash-vocab token id
# derived from the first 4 md5 hex nibbles — NOT a real BPE vocab, but
# deterministic and IDENTICAL in Spark and DuckDB, which is what lets the
# packed tensor content carry an EXACT oracle.  PAD sits outside the
# 0..65535 vocab.
PAD_ID = 65536

# The id of token t is built from the first 4 hex digits of md5(t),
# little-endian (digit j weighted 16^(j-1)).  md5 is bound ONCE per
# token by an inner transform (h = md5(t)); the nibble extractions then
# operate on the lambda variable — the naive form inlined md5(t) into
# all four nibble expressions and Catalyst's interpreted lambda path
# re-hashed every token 4x (round-8 continuation; same family as the
# outer-expression re-evaluation trap in SCALE.md).
_NIBBLE_SPARK = "(locate(substring(h, {j}, 1), '0123456789abcdef') - 1)"
_NIBBLE_DUCK = "(strpos('0123456789abcdef', substr(h, {j}, 1)) - 1)"


def _tok_ids_csv(nibble_tmpl: str, split_expr: str, transform_fn: str,
                 join_fn: str) -> str:
    id_expr = " + ".join(
        f"{nibble_tmpl.format(j=j + 1)} * {16 ** j}" for j in range(4)
    )
    return (
        f"{join_fn}({transform_fn}({transform_fn}({split_expr}, "
        f"t -> md5(t)), "
        f"h -> CAST({id_expr} AS VARCHAR)), ',')"
    )


_IDS_SPARK = _tok_ids_csv(
    _NIBBLE_SPARK, "split(text, ' ')", "transform", "array_join"
).replace("VARCHAR", "string")
_IDS_DUCK = _tok_ids_csv(
    _NIBBLE_DUCK, "str_split(text, ' ')", "list_transform", "array_to_string"
)


@register(
    "x_seq_tensorize",
    oracle=f"""
    WITH {_PACK_ORACLE_CTES},
    idd AS (
      SELECT doc_id, lang, shard, n_tokens, local_pack,
             {_IDS_DUCK} AS ids_csv
      FROM local)
    SELECT l.lang,
           CAST(o.pack_off + l.local_pack AS BIGINT) AS pack_id,
           md5(string_agg(l.ids_csv, ',' ORDER BY l.doc_id)
               || repeat(',{PAD_ID}',
                         GREATEST({PACK_BUDGET}
                                  - CAST(SUM(l.n_tokens) AS INT), 0)))
               AS seq_md5,
           CAST(GREATEST({PACK_BUDGET} - SUM(l.n_tokens), 0) AS BIGINT)
               AS n_pad
    FROM idd l JOIN offsets o ON l.lang = o.lang AND l.shard = o.shard
    GROUP BY 1, 2
    """,
)
def x_seq_tensorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tensorization step after x_seq_pack / x_doc_concat: map each
    document to token ids (here a 16-bit md5-nibble hash vocab — the
    deterministic cross-engine stand-in for a real BPE tokenizer, whose
    vocab would ship as a broadcast map), concatenate each pack's id
    sequences in doc_id order, right-pad to the {PACK_BUDGET}-token
    budget with PAD={PAD_ID}, and emit the pad count (= attention-mask
    complement) plus the md5 of the padded id sequence, which pins the
    exact tensor content without shipping it.  Same two-level
    (lang, shard) scheme as the other packing ops — tokenization is
    map-side, the only corpus shuffle is the pack window, and the padded
    sequences would stream straight to training-shard files.  Packs that
    overflow the budget (by at most their final document) get n_pad=0,
    not truncation."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.expr(_IDS_SPARK).alias("ids_csv"),
        F.expr(_SHARD_SPARK).cast("int").alias("shard"),
    )
    local = _pack_local(sized)
    packed = (
        local.join(broadcast(_pack_offsets(sized.drop("ids_csv"))), ["lang", "shard"])
        .withColumn("pack_id", F.col("pack_off") + F.col("local_pack"))
        .groupBy("lang", "pack_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "ids_csv"))),
                    lambda s: s.getField("ids_csv"),
                ),
                ",",
            ).alias("seq_csv"),
            F.sum("n_tokens").alias("tok"),
        )
    )
    n_pad = F.greatest(F.lit(PACK_BUDGET) - F.col("tok"), F.lit(0))
    return packed.select(
        "lang",
        "pack_id",
        F.md5(
            F.concat(
                F.col("seq_csv"),
                F.expr(
                    f"repeat(',{PAD_ID}', greatest({PACK_BUDGET} "
                    "- cast(tok as int), 0))"
                ),
            )
        ).alias("seq_md5"),
        n_pad.cast("long").alias("n_pad"),
    )


RESERVOIR_K = 200  # uniform-sample size drawn by x_sample_reservoir


@register(
    "x_sample_reservoir",
    oracle=f"""
    SELECT event_id, event_type, md5(CAST(event_id AS VARCHAR)) AS h
    FROM events
    ORDER BY h, event_id
    LIMIT {RESERVOIR_K}
    """,
)
def x_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed reservoir-equivalent uniform sample: take the K rows
    with the smallest content-independent hash of the stable key.  This
    is the bottom-k sketch formulation of reservoir sampling — identical
    output for any partitioning, executor count, or arrival order, which
    a restartable 100 TB pipeline needs (a true streaming reservoir is
    order-dependent and irreproducible).  Spark executes orderBy+limit as
    TakeOrderedAndProject: each task keeps a K-row heap and the driver
    merges 32 heaps — no global sort, no full shuffle."""
    e = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    return (
        e.select("event_id", "event_type", h.alias("h"))
        .orderBy("h", "event_id")
        .limit(RESERVOIR_K)
    )


# training-mixture weights per language and total sample size.  Quotas are
# FIXED counts (weight * K) so the mixture is exact by construction; a
# source whose corpus is smaller than its quota contributes everything it
# has (both engines truncate identically).
MIX_K = 100
MIX_WEIGHTS = (("en", 0.50), ("de", 0.20), ("fr", 0.15), ("es", 0.10), ("zh", 0.05))


@register(
    "x_interleave_sources",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS r
      FROM documents),
    picked AS (
      SELECT * FROM ranked
      WHERE r <= CASE lang
          {' '.join(f"WHEN '{lang}' THEN {int(w * MIX_K)}" for lang, w in MIX_WEIGHTS)}
          ELSE 0 END)
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS mix_pos
    FROM picked
    """,
)
def x_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture interleaving: draw a fixed-quota sample per corpus
    (language stands in for the corpus axis) matching declared mixture
    weights, then assign a deterministic global training order.  The
    per-corpus draw is a hash-rank window (one shuffle on lang, state
    bounded per stratum); the global ordering runs over only the K
    selected rows, so the single-partition final window touches K rows,
    never the corpus.  Reweighting a 100 TB corpus re-runs only the
    rank-filter — the draw is reproducible because the hash depends on
    doc_id alone, so adding new documents never evicts previously chosen
    ones ahead of them in hash order (monotone-sample property)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    expr = None
    for lang, wt in reversed(MIX_WEIGHTS):
        n = int(wt * MIX_K)
        expr = (
            F.when(F.col("lang") == lang, F.lit(n))
            if expr is None
            else F.when(F.col("lang") == lang, F.lit(n)).otherwise(expr)
        )
    picked = (
        d.select("doc_id", "lang", h.alias("h"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= F.coalesce(expr, F.lit(0)))
    )
    wg = Window.orderBy("h", "doc_id")
    return picked.select(
        "doc_id",
        "lang",
        F.row_number().over(wg).cast("long").alias("mix_pos"),
    )


SKEW_TOP = 10  # hot keys reported by x_skew_profile


@register(
    "x_skew_profile",
    oracle=f"""
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
         t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM events)
    SELECT user_id, n, ROUND(n / total, 6) AS share
    FROM c, t
    ORDER BY n DESC, user_id
    LIMIT {SKEW_TOP}
    """,
)
def x_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key profiling: per-key frequency with share-of-total for the
    heaviest keys — the diagnostic that decides WHICH keys q_join_salted_skew
    salts and how wide.  One partial-agg shuffle on the key (map-side
    combine means the shuffle carries one row per key per task, not per
    event), a 1-row total broadcast-joined in, and TakeOrderedAndProject
    for the top-N — at 100 TB this is the cheapest query that can be run
    against a new fact table before choosing its join strategy."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("n"))
    total = e.agg(F.count("*").cast("double").alias("total"))
    return (
        counts.crossJoin(broadcast(total))
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(SKEW_TOP)
    )


@register(
    "x_data_card",
    oracle="""
    WITH lc AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang),
    top AS (
      SELECT source, lang AS top_lang FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n DESC, lang) AS rk
        FROM lc)
      WHERE rk = 1)
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(str_split(d.text, ' '))) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT d.lang) AS n_langs,
           MAX(t.top_lang) AS top_lang,
           median(d.n_chars) AS median_chars
    FROM documents d JOIN top t ON d.source = t.source
    GROUP BY d.source
    """,
)
def x_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datasheet ('data card') in one pass: per source — document
    count, total whitespace tokens, language diversity, DETERMINISTIC
    dominant language (count desc, lang asc — engine mode() breaks ties
    arbitrarily), exact median document length.  This is the profile a
    training-data release ships alongside the corpus; at 100 TB it is
    two partial-agg shuffles on source (the main rollup and the
    lang-mode sub-aggregate, which is dims-sized and broadcast back)
    plus exact median per group.  n_chars is integral so the median's
    .5 midpoints are exact in both engines (q_agg_median_mode
    convention)."""
    d = load_table(spark, sf_dir, "documents")
    lc = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    wr = Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
    top = (
        lc.select("*", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    card = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.median("n_chars").alias("median_chars"),
    )
    return card.join(broadcast(top), "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "n_langs",
        "top_lang",
        "median_chars",
    )


# leakage-safe split: md5 first hex nibble of the CLUSTER id -> split.
# 12/16 train, 2/16 val, 2/16 test.
_SPLIT_VAL = ("c", "d")
_SPLIT_TEST = ("e", "f")


@register(
    "x_split_leakage_safe",
    oracle="""
    WITH RECURSIVE
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e
          FROM embeddings WHERE vec_id < 300),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.e, b.e)
                  / (sqrt(list_dot_product(a.e, a.e))
                     * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.35),
    edges AS (SELECT src, dst FROM pairs
              UNION ALL SELECT dst, src FROM pairs),
    reach (id, lbl) AS (
      SELECT vec_id, vec_id FROM v
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
    clusters AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
    assigned AS (
      SELECT d.doc_id,
             len(str_split(d.text, ' ')) AS n_tokens,
             COALESCE(c.cluster_id, d.doc_id) AS cl
      FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id),
    labeled AS (
      SELECT *,
             CASE WHEN substr(md5(CAST(cl AS VARCHAR)), 1, 1) IN ('c','d')
                    THEN 'val'
                  WHEN substr(md5(CAST(cl AS VARCHAR)), 1, 1) IN ('e','f')
                    THEN 'test'
                  ELSE 'train' END AS split
      FROM assigned)
    SELECT split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT cl) AS n_clusters,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM labeled GROUP BY split
    """,
)
def x_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate CLUSTERS — not
    documents — are the unit of assignment, so two near-dup documents can
    never straddle train and eval (the benchmark-contamination failure
    mode of naive per-document hashing).  Pipeline shape: pairwise
    near-dup evidence -> connected components (x_dedup_clusters) -> every
    document adopts its cluster id (its own id when unclustered) -> the
    split is a pure function of md5(cluster_id): 12/16 train, 2/16 val,
    2/16 test.

    100 TB posture: the cluster relation is dup-evidence-sized (bounded
    by documents that HAVE a near-dup, a small fraction of the corpus) so
    its join is UNHINTED here via broadcast() only because the sample is
    tiny; at scale AQE decides, and the split assignment itself is a
    map-side md5 projection — one partial-agg shuffle on split plus the
    distinct-cluster count produce the report.  Assignment depends only
    on content-derived cluster ids: re-runs, engine swaps, and corpus
    appends never move a previously split cluster."""
    from .dedup import x_dedup_clusters

    clusters = x_dedup_clusters(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    assigned = d.join(
        broadcast(clusters), d.doc_id == clusters.vec_id, "left"
    ).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cl"),
    )
    nib = F.substring(F.md5(F.col("cl").cast("string")), 1, 1)
    labeled = assigned.withColumn(
        "split",
        F.when(nib.isin(*_SPLIT_VAL), F.lit("val"))
        .when(nib.isin(*_SPLIT_TEST), F.lit("test"))
        .otherwise(F.lit("train")),
    )
    return labeled.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cl").alias("n_clusters"),
        F.sum("n_tokens").alias("n_tokens"),
    )


MIX_WEIGHT_CAP = 5.0  # max upsampling factor per source (DoReMi-style cap)


@register(
    "x_domain_mix",
    oracle=f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens,
                   CAST(COUNT(*) AS DOUBLE) AS n_sources
            FROM per_src),
    w AS (
      SELECT p.source, p.n_docs, p.n_tokens,
             p.n_tokens / t.total_tokens AS actual_share,
             LEAST((1.0 / t.n_sources) / (p.n_tokens / t.total_tokens),
                   {MIX_WEIGHT_CAP}) AS weight
      FROM per_src p, tot t),
    r AS (
      SELECT *, CAST(FLOOR(weight * n_tokens) AS BIGINT) AS resampled_tokens
      FROM w),
    rt AS (SELECT CAST(SUM(resampled_tokens) AS DOUBLE) AS total_resampled
           FROM r)
    SELECT r.source, r.n_docs, r.n_tokens,
           ROUND(r.actual_share, 6) AS actual_share,
           ROUND(r.weight, 6) AS mix_weight,
           r.resampled_tokens,
           ROUND(r.resampled_tokens / rt.total_resampled, 6) AS resampled_share
    FROM r, rt
    """,
)
def x_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting (DoReMi-lite, deterministic): per-source
    token shares are pulled toward a uniform target by weight =
    target_share / actual_share, capped at MIX_WEIGHT_CAP so a tiny
    domain is never upsampled into dominance.  resampled_tokens =
    floor(weight x tokens) is the post-reweight token budget per source
    (floor keeps it an exact integer, so the resampled shares divide
    exact BIGINTs — no order-dependent double sums cross the engines).

    100 TB posture: ONE partial-agg shuffle on source builds the
    per-domain profile; everything after runs on the |sources|-row
    relation — the totals are single-row broadcast cross joins, the
    weight math is a map-side projection.  The output is the sampling
    table a mixture-weighted dataloader consumes."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    # totals as unpartitioned windows over the |sources|-row relation:
    # cross-join formulations re-aggregate the corpus once per total
    # (Catalyst can't reuse the exchange across differently-pruned
    # branches), while the windows share ONE SinglePartition exchange of
    # a domains-count-sized relation — the corpus is scanned exactly once.
    wall = Window.partitionBy()
    w = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(wall).cast("double").alias("total_tokens"),
        F.count("*").over(wall).cast("double").alias("n_sources"),
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("total_tokens")).alias("actual_share"),
        F.least(
            (F.lit(1.0) / F.col("n_sources"))
            / (F.col("n_tokens") / F.col("total_tokens")),
            F.lit(MIX_WEIGHT_CAP),
        ).alias("weight"),
    )
    r = w.withColumn(
        "resampled_tokens", F.floor(F.col("weight") * F.col("n_tokens"))
    ).withColumn(
        "total_resampled",
        F.sum("resampled_tokens").over(wall).cast("double"),
    )
    return r.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("actual_share"), 6).alias("actual_share"),
        F.round(F.col("weight"), 6).alias("mix_weight"),
        "resampled_tokens",
        F.round(
            F.col("resampled_tokens") / F.col("total_resampled"), 6
        ).alias("resampled_share"),
    )


CURRICULUM_STAGES = 4  # difficulty quartiles per language


@register(
    "x_curriculum_order",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(str_split(text, ' ')) AS n_tokens,
             ROUND(CAST(n_chars AS DOUBLE)
                   / len(str_split(text, ' ')), 6) AS difficulty
      FROM documents),
    staged AS (
      SELECT *,
             CAST(NTILE({CURRICULUM_STAGES}) OVER (
               PARTITION BY lang
               ORDER BY difficulty, md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS stage
      FROM scored)
    SELECT lang, stage,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS stage_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS ids_sum,
           ROUND(AVG(difficulty), 6) AS avg_difficulty
    FROM staged GROUP BY lang, stage
    """,
)
def x_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: rank documents per language by a difficulty
    proxy (mean word length = chars/token) and cut the ranking into
    CURRICULUM_STAGES equal-count stages with ntile — the deterministic,
    rank-based schedule an easy-to-hard training curriculum consumes.
    Ties break on a content-independent hash then doc_id, so stage
    membership is exact in both engines (no FP boundary to disagree on).
    The ids_sum checksum pins that both engines staged the SAME documents.

    100 TB posture: one window shuffle on lang (x_lang_balance precedent);
    for heavy-tail languages the scale path swaps ntile for stage
    assignment against percentile boundaries computed by a partial-agg
    sketch (SCALE.md) — the output contract is identical."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    scored = d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 6).alias(
            "difficulty"
        ),
    )
    w = Window.partitionBy("lang").orderBy(
        "difficulty", F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    staged = scored.withColumn(
        "stage", F.ntile(CURRICULUM_STAGES).over(w).cast("long")
    )
    return staged.groupBy("lang", "stage").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("stage_tokens"),
        F.sum("doc_id").alias("ids_sum"),
        F.round(F.avg("difficulty"), 6).alias("avg_difficulty"),
    )


# DSIR-style importance resampling: hashed-unigram bucket count
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling").  256 buckets = first two hex chars of md5(token); the
# per-bucket log importance ratio is rounded to 6 decimals and carried
# as DECIMAL so the per-document weight is an exact associative decimal
# sum — no order-dependent double accumulation crosses the engines.
DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"
DSIR_TOP = 100


def _dsir_doc_bucket_counts(d):
    """(doc_id, lang, b, cnt) hashed-unigram bucket histogram per
    document via ONE mapInArrow stage (see x_importance_resample's
    inline note).  `d` must carry doc_id, lang, text; a document's text
    is a single row, so every emitted count is final — no downstream
    re-aggregation needed.  Emits nothing for NULL text (explode-of-
    split(NULL) semantics)."""

    def count_batches(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        bucket_of: dict[str, int] = {}  # md5 once per DISTINCT token/task

        def bkt(tok: str) -> int:
            b = bucket_of.get(tok)
            if b is None:
                b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:2], 16)
                bucket_of[tok] = b
            return b

        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            langs = batch.column("lang").to_pylist()
            texts = batch.column("text").to_pylist()
            out_id, out_lang, out_b, out_c = [], [], [], []
            for did, lang, text in zip(ids, langs, texts):
                if text is None:
                    continue
                # Python str.split(' ') == Java split(" ", -1): empty
                # tokens kept at every position, "" -> [""]
                bids = [bkt(t) for t in text.split(" ")]
                cnts = np.bincount(bids, minlength=DSIR_BUCKETS)
                nz = np.flatnonzero(cnts)
                out_id.extend([did] * nz.shape[0])
                out_lang.extend([lang] * nz.shape[0])
                out_b.extend(nz.tolist())
                out_c.extend(cnts[nz].tolist())
            if out_id:
                yield pa.record_batch(
                    [
                        pa.array(out_id, type=pa.int64()),
                        pa.array(out_lang, type=pa.string()),
                        pa.array(out_b, type=pa.int32()),
                        pa.array(out_c, type=pa.int64()),
                    ],
                    names=["doc_id", "lang", "b", "cnt"],
                )

    return d.select("doc_id", "lang", "text").mapInArrow(
        count_batches, "doc_id long, lang string, b int, cnt long"
    )


@register(
    "x_importance_resample",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS l
               FROM documents),
    ex AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(g), 1, 2))::INT AS b
           FROM (SELECT doc_id, lang, UNNEST(l) AS g FROM t)),
    doc AS (SELECT doc_id, lang, b, COUNT(*) AS cnt
            FROM ex GROUP BY doc_id, lang, b),
    prof AS (SELECT b, SUM(cnt) AS cr,
                    COALESCE(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                                      THEN cnt END), 0) AS ct
             FROM doc GROUP BY b),
    lw AS (SELECT b,
                  CAST(ROUND(LN(((ct + 1.0)
                                 / (SUM(ct) OVER () + {DSIR_BUCKETS}.0))
                                / ((cr + 1.0)
                                   / (SUM(cr) OVER () + {DSIR_BUCKETS}.0))),
                             6) AS DECIMAL(12,6)) AS lw
           FROM prof)
    SELECT d.doc_id,
           CAST(SUM(d.cnt) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(d.cnt * l.lw) AS DOUBLE), 6) AS log_weight
    FROM doc d JOIN lw l ON l.b = d.b
    GROUP BY d.doc_id
    ORDER BY log_weight DESC, d.doc_id
    LIMIT {DSIR_TOP}
    """,
)
def x_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: rank raw documents by how much their
    hashed-unigram profile looks like a target domain (here: the corpus's
    `{en}` slice) relative to the raw pool — the data-selection statistic
    of Xie et al. 2023.  Per-bucket importance ratio = smoothed
    P_target(bucket) / P_raw(bucket); a document's log weight is the sum
    of its token-occurrence log ratios; the top-{100} weighted documents
    are the selected training subset.

    Cross-engine exactness: each bucket's log ratio is rounded to 6
    decimals and cast to DECIMAL(12,6) BEFORE the per-document sum, so
    the sum is exact decimal arithmetic — associative, order-free — in
    both engines; the REPORTED weight is that exact decimal cast to
    double (deterministic nearest) and ties break on doc_id.

    100 TB posture: ONE corpus scan/explode feeds a map-side-combined
    (doc_id, bucket) count whose fan-in is bounded by 256 buckets per
    document; the bucket profile rolls up from that relation (256 rows,
    windowed totals — x_domain_mix pattern), broadcasts back onto it,
    and the ranking is TakeOrderedAndProject (per-task heaps).  The
    hashed feature space is fixed at 256 buckets at ANY corpus size —
    that dimensionality independence is the point of DSIR's hashing."""
    from ..plans import spread

    # spread() before the tokenize stage: single-row-group fixture scans
    # would otherwise run the per-token hashing on one core (bootstrap_ci
    # precedent; no-op at real scale)
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    # Round 13 (guide §4.2): the (doc, bucket) counts used to be an
    # explode + per-OCCURRENCE JVM md5 + corpus-sized hash aggregate
    # (60M intermediate rows at sf10).  One mapInArrow stage now
    # tokenizes each document in Python and memoizes md5→bucket per
    # DISTINCT token per task — the fixture corpora are Zipfian, so the
    # md5 count collapses by orders of magnitude — and np.bincount
    # yields each document's final bucket histogram directly (a doc's
    # text is one row, so per-row counts are complete: the downstream
    # shuffle starts from ≤256 rows/doc, exactly the old aggregate's
    # output).  Bucketing is bit-identical: int(md5(token)[:2], 16) on
    # UTF-8 bytes, the same arithmetic F.conv(substring(md5,1,2),16,10)
    # performed.  Split semantics mirror F.split(text, " ") (Java
    # limit=-1: empty tokens kept everywhere, NULL text -> no rows).
    doc = _dsir_doc_bucket_counts(d).persist()
    prof = doc.groupBy("b").agg(
        F.sum("cnt").alias("cr"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("cnt"))),
            F.lit(0),
        ).alias("ct"),
    )
    wall = Window.partitionBy()
    lw = prof.select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1.0) / (F.sum("ct").over(wall) + float(DSIR_BUCKETS)))
                / ((F.col("cr") + 1.0) / (F.sum("cr").over(wall) + float(DSIR_BUCKETS)))
            ),
            6,
        )
        .cast("decimal(12,6)")
        .alias("lw"),
    )
    out = (
        doc.join(broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.round(
                F.sum(F.col("cnt") * F.col("lw")).cast("double"), 6
            ).alias("log_weight"),
        )
        .orderBy(F.col("log_weight").desc(), "doc_id")
        .limit(DSIR_TOP)
    )
    try:
        # eager localCheckpoint materializes the DSIR_TOP-row result so the
        # persisted bucket counts release before returning (minhash pattern)
        return out.localCheckpoint(eager=True)
    finally:
        doc.unpersist()


DSIR_SAMPLE_MOD = 16  # x_importance_resample_sampled profiles docs where
#                       doc_id % 16 == 0 — deterministic, oracle-mirrored


@register(
    "x_importance_resample_sampled",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS l
               FROM documents),
    ex AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(g), 1, 2))::INT AS b
           FROM (SELECT doc_id, lang, UNNEST(l) AS g FROM t
                 WHERE doc_id % {DSIR_SAMPLE_MOD} = 0)),
    prof AS (SELECT b, COUNT(*) AS cr,
                    COALESCE(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                                      THEN 1 END), 0) AS ct
             FROM ex GROUP BY b),
    spine AS (SELECT g.i AS b
              FROM UNNEST(generate_series(0, {DSIR_BUCKETS} - 1)) g(i)),
    fp AS (SELECT s.b, COALESCE(p.cr, 0) AS cr, COALESCE(p.ct, 0) AS ct
           FROM spine s LEFT JOIN prof p ON p.b = s.b),
    lw AS (SELECT b,
                  CAST(ROUND(LN(((ct + 1.0)
                                 / (SUM(ct) OVER () + {DSIR_BUCKETS}.0))
                                / ((cr + 1.0)
                                   / (SUM(cr) OVER () + {DSIR_BUCKETS}.0))),
                             6) AS DECIMAL(12,6)) AS lw
           FROM fp),
    lwm AS (SELECT b, CAST(lw * 1000000 AS BIGINT) AS lw_micros FROM lw),
    exall AS (SELECT doc_id,
                     ('0x' || substr(md5(g), 1, 2))::INT AS b
              FROM (SELECT doc_id, UNNEST(l) AS g FROM t))
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(CAST(SUM(l.lw_micros) AS BIGINT) AS DOUBLE) / 1000000.0
             AS log_weight
    FROM exall e JOIN lwm l ON l.b = e.b
    GROUP BY e.doc_id
    ORDER BY log_weight DESC, e.doc_id
    LIMIT {DSIR_TOP}
    """,
)
def x_importance_resample_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR importance resampling, the SCALE twin of
    x_importance_resample (VERDICT r10 item 4: the steepest measured
    riser — b=0.48, 8.7x sf1->sf10, dominated by the corpus-side token
    explode + (doc, bucket) shuffle).  Two structural changes, per the
    exact op's own documented posture:

    1. SAMPLED PROFILE BUILD: the 256-bucket raw/target profile is
       estimated from the deterministic 1/{DSIR_SAMPLE_MOD} document
       sample (doc_id % {DSIR_SAMPLE_MOD} = 0) — the profile is a
       corpus-level density ratio, so a fixed-fraction sample estimates
       it with error O(1/sqrt(sample tokens)) while cutting the explode
       that feeds the profile shuffle {DSIR_SAMPLE_MOD}x.  The rule is
       mirrored verbatim in the oracle, so the gate stays EXACT on the
       twin's own contract (same estimator, both engines).
    2. ZERO-SHUFFLE WEIGHT PASS: the per-document weight no longer
       round-trips a corpus-sized (doc, bucket, cnt) relation through a
       shuffle + persist + broadcast-back join.  The bucket log-ratio
       table is DENSIFIED onto a 0..255 spine, quantized to LONG
       micro-units (exact-integer fold state, the q_ts_holt
       discipline), collected as ONE 256-element array, broadcast, and
       each document folds its own token array against it map-side
       (F.aggregate over element_at) — the only remaining exchange is
       the DSIR_TOP TakeOrderedAndProject heap merge.  Integer
       addition is associative and allocation-free, and both engines
       divide the IDENTICAL micro-unit sum by 1e6, so log_weight is
       bit-identical with no terminal rounding.

    100 TB posture: profile pass = 1/{DSIR_SAMPLE_MOD} of a corpus
    explode feeding a 256-key partial agg; weight pass = one corpus
    scan, no exchange wider than top-{DSIR_TOP} rows.  No persist, no
    AQE cross-stage recompute surface."""
    d = load_table(spark, sf_dir, "documents")
    sampled = d.filter(F.col("doc_id") % DSIR_SAMPLE_MOD == 0)
    ex = sampled.select(
        "lang",
        F.explode(F.split(F.col("text"), " ")).alias("g"),
    ).select(
        "lang",
        F.conv(F.substring(F.md5(F.col("g")), 1, 2), 16, 10)
        .cast("int")
        .alias("b"),
    )
    prof = ex.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, F.lit(1))),
            F.lit(0),
        ).alias("ct"),
    )
    spine = spark.range(DSIR_BUCKETS).select(F.col("id").cast("int").alias("b"))
    fp = spine.join(prof, "b", "left").select(
        "b",
        F.coalesce("cr", F.lit(0)).alias("cr"),
        F.coalesce("ct", F.lit(0)).alias("ct"),
    )
    wall = Window.partitionBy()
    lw = fp.select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1.0) / (F.sum("ct").over(wall) + float(DSIR_BUCKETS)))
                / ((F.col("cr") + 1.0) / (F.sum("cr").over(wall) + float(DSIR_BUCKETS)))
            ),
            6,
        )
        .cast("decimal(12,6)")
        .alias("lw"),
    )
    # densified -> one 256-element LONG array (micro-units, position =
    # bucket id): the fold state is an exact integer (the q_ts_holt
    # lesson — decimal folds allocate a BigDecimal per step; long adds
    # don't), and both engines derive log_weight from the IDENTICAL
    # integer, so the final double is bit-identical with no rounding
    lw_arr = lw.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "b", (F.col("lw") * 1000000).cast("long").alias("m")
                )
            )
        ).alias("s")
    ).select(F.col("s.m").alias("lws"))
    toks = F.split(F.col("text"), " ")
    bs = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 2), 16, 10).cast("int"),
    )
    return (
        d.crossJoin(broadcast(lw_arr))
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            (
                F.aggregate(
                    bs,
                    F.lit(0).cast("long"),
                    lambda acc, b: acc
                    + F.element_at(F.col("lws"), b + F.lit(1)),
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("log_weight"),
        )
        .orderBy(F.col("log_weight").desc(), "doc_id")
        .limit(DSIR_TOP)
    )


# pack-efficiency bins: pow-2 token-length buckets (fixture docs are
# 10..99 whitespace tokens; 256 is the open-top catch-all)
PACK_BINS = (16, 32, 64, 128, 256)
PACK_BIN_TOP = 256


@register(
    "x_pack_efficiency",
    oracle=f"""
    WITH t AS (SELECT doc_id, len(str_split(text, ' ')) AS n
               FROM documents),
    b AS (SELECT doc_id, n,
                 CASE WHEN n <= 16 THEN 16
                      WHEN n <= 32 THEN 32
                      WHEN n <= 64 THEN 64
                      WHEN n <= 128 THEN 128
                      ELSE {PACK_BIN_TOP} END AS bin_cap
          FROM t),
    g AS (SELECT bin_cap, COUNT(*) AS n_docs,
                 CAST(SUM(n) AS BIGINT) AS sum_tokens
          FROM b GROUP BY bin_cap)
    SELECT bin_cap, n_docs, sum_tokens,
           CAST(n_docs * bin_cap AS BIGINT) AS padded_tokens,
           ROUND(1.0 - CAST(sum_tokens AS DOUBLE) / (n_docs * bin_cap), 6)
               AS pad_waste,
           ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6)
               AS doc_share
    FROM g
    """,
)
def x_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-shape planning statistic: bucket documents into power-of-two
    token-length bins and measure the padding waste of pad-to-bin
    batching per bin — the histogram a training dataloader consults to
    pick bucketed-batching boundaries (versus the concat-and-chunk
    packing that x_seq_pack materializes).  pad_waste = 1 - sum_tokens /
    (n_docs * bin_cap): the fraction of every padded batch that would be
    pad tokens if this bin were padded to its cap.

    100 TB posture: one map-side token count + one partial-agg shuffle
    onto |bins| (= {len(PACK_BINS)}) groups; the share column is a window
    over the |bins|-row relation.  No explode — the token count is
    len(split), a codegen'd projection."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    bin_cap = (
        F.when(n <= 16, 16)
        .when(n <= 32, 32)
        .when(n <= 64, 64)
        .when(n <= 128, 128)
        .otherwise(PACK_BIN_TOP)
    )
    g = d.select(n.alias("n"), bin_cap.alias("bin_cap")).groupBy("bin_cap").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("sum_tokens"),
    )
    wall = Window.partitionBy()
    return g.select(
        "bin_cap",
        "n_docs",
        "sum_tokens",
        (F.col("n_docs") * F.col("bin_cap")).cast("long").alias("padded_tokens"),
        F.round(
            F.lit(1.0)
            - F.col("sum_tokens").cast("double")
            / (F.col("n_docs") * F.col("bin_cap")),
            6,
        ).alias("pad_waste"),
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(wall), 6
        ).alias("doc_share"),
    )


TOKEN_BUDGET = 100_000


@register(
    "x_token_budget",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS total FROM s),
    q AS (
      SELECT source, t,
             ({TOKEN_BUDGET} * t) // tot.total AS fl,
             ({TOKEN_BUDGET} * t) % tot.total AS rem
      FROM s, tot),
    k AS (SELECT {TOKEN_BUDGET} - CAST(SUM(fl) AS BIGINT) AS extra FROM q),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
          FROM q)
    SELECT r.source, r.t AS n_tokens,
           CAST(r.fl + CASE WHEN r.rk <= k.extra THEN 1 ELSE 0 END
                AS BIGINT) AS quota,
           r.rk <= k.extra AS got_remainder
    FROM r, k
    """,
)
def x_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional token-budget allocation across sources by LARGEST
    REMAINDER (Hamilton apportionment): each source's quota is
    floor(B·t_s/T) plus one extra token for the sources with the
    largest integer remainders until the budget is exactly exhausted —
    the deterministic answer to "give me a {TOKEN_BUDGET}-token mix at
    the corpus' natural proportions" that plain floor() (undershoots)
    or round() (over/undershoots unpredictably) cannot give.  Σ quota
    == B exactly, by construction, in integers.

    Cross-engine exactness: EVERYTHING is 64-bit integer arithmetic —
    B·t_s fits bigint past petabyte corpora; remainder ties rank on
    source so the extra-token set is deterministic.

    100 TB posture: token counting is len(split) (Generate-free,
    map-side) into a |sources|-group partial agg; the total, the
    remainder rank, and the extras all ride windows over the
    |sources|-row relation through one SinglePartition exchange (the
    x_domain_mix plan discipline)."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    )
    wall = Window.partitionBy()
    total = F.sum("t").over(wall)
    # floor division in EXACT 64-bit integer arithmetic end to end:
    # SQL `div` is integral division on longs, so B·t_s div T matches
    # the oracle's integer `//` for every bigint-representable corpus —
    # no double round-trip anywhere (a double-rounded numerator past
    # 2^53 could misfloor one ulp; ADVICE r9 item 1)
    q = s.select(
        "source",
        "t",
        (F.lit(TOKEN_BUDGET) * F.col("t")).alias("bt"),
        total.alias("tot"),
    ).select(
        "source",
        "t",
        F.expr("bt div tot").alias("fl"),
        (F.col("bt") % F.col("tot")).alias("rem"),
    )
    r = q.select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.col("rem").desc(), "source"))
        .alias("rk"),
        (F.lit(TOKEN_BUDGET) - F.sum("fl").over(wall)).alias("extra"),
    )
    return r.select(
        "source",
        F.col("t").alias("n_tokens"),
        (
            F.col("fl")
            + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
        ).alias("quota"),
        (F.col("rk") <= F.col("extra")).alias("got_remainder"),
    )


TEMP_EPOCH_TOKENS = 100_000  # x_sample_temperature per-epoch budget


@register(
    "x_sample_temperature",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS total FROM s),
    w AS (
      SELECT lang, t,
             CAST(ROUND(sqrt(CAST(t AS DOUBLE) / tot.total), 12)
                  AS DECIMAL(20,12)) AS sw
      FROM s, tot),
    z AS (SELECT CAST(SUM(sw) AS DECIMAL(24,12)) AS zsum FROM w)
    SELECT w.lang, w.t AS n_tokens,
           ROUND(CAST(w.t AS DOUBLE) / tot.total, 6) AS p_raw,
           ROUND(CAST(w.sw AS DOUBLE) / CAST(z.zsum AS DOUBLE), 6)
             AS p_sampled,
           CAST(FLOOR({TEMP_EPOCH_TOKENS}
                      * (CAST(w.sw AS DOUBLE)
                         / CAST(z.zsum AS DOUBLE))) AS BIGINT)
             AS epoch_tokens,
           ROUND((CAST(w.sw AS DOUBLE) / CAST(z.zsum AS DOUBLE))
                 / (CAST(w.t AS DOUBLE) / tot.total), 6) AS upsample_x
    FROM w, tot, z
    """,
)
def x_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling (the mT5/XLM-R mixture
    rule): sampling weight ∝ p_l^(1/τ) with τ=2, i.e. sqrt(p_l)
    renormalized — boosting tail languages relative to their raw
    token share without flattening the mixture entirely.  Emits the
    raw share, the temperature-scaled share, the per-epoch token
    allocation under a fixed budget, and the up/down-sampling factor
    each language experiences.  Complements x_token_budget (exact
    proportional apportionment) and x_lang_balance (hard quotas) as
    the third — and in practice most used — mixture policy.

    Cross-engine exactness: per-language token counts and the total
    are exact BIGINTs; p_l = t/total is one IEEE division, sqrt is
    correctly rounded, and the per-language weight is then ROUNDed to
    the 12-dp grid and summed as DECIMAL so the normalizer is
    ORDER-FREE (the x_char_ngram_entropy discipline — a 5-row sum of
    raw doubles would already be partition-order-sensitive in Spark).
    τ=2 is chosen deliberately: p^(1/τ) becomes IEEE sqrt, which is
    bit-identical across engines, where a general pow(p, 0.3) is
    merely faithfully rounded and could split an ulp (the q_ts_holt
    binary-exact-coefficient lesson applied to exponents).

    100 TB posture: one corpus-sized map-side token count partial-agg
    to a |langs|-row relation; everything after is constant-size.
    The weight table is what a 1000-executor training-data sampler
    broadcasts; the epoch_tokens column is floor'd (never rounds up)
    so the summed allocation never exceeds the budget."""
    d = load_table(spark, sf_dir, "documents")
    s = (
        d.groupBy("lang")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("t")
        )
        # |langs| rows feed both the normalizer aggs and the weight
        # projection — localCheckpoint so the corpus token count runs
        # ONCE (the theil_sen bounded-relation rule).
        .localCheckpoint(eager=True)
    )
    tot = s.agg(F.sum("t").cast("long").alias("total"))
    w = s.crossJoin(tot).select(
        "lang",
        "t",
        "total",
        F.round(F.sqrt(F.col("t").cast("double") / F.col("total")), 12)
        .cast("decimal(20,12)")
        .alias("sw"),
    )
    z = w.agg(F.sum("sw").cast("decimal(24,12)").alias("zsum"))
    p_sampled = F.col("sw").cast("double") / F.col("zsum").cast("double")
    p_raw = F.col("t").cast("double") / F.col("total")
    return w.crossJoin(z).select(
        "lang",
        F.col("t").alias("n_tokens"),
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_sampled, 6).alias("p_sampled"),
        F.floor(TEMP_EPOCH_TOKENS * p_sampled)
        .cast("long")
        .alias("epoch_tokens"),
        F.round(p_sampled / p_raw, 6).alias("upsample_x"),
    )


SPAN_CORRUPT_RATE = 15  # percent of tokens budgeted for corruption
SPAN_LEN = 3            # fixed span length (T5 mean span length)
SPAN_MIN_TOKENS = 10    # docs shorter than this get no plan


@register(
    "x_span_corruption_plan",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(str_split(text, ' ')) AS n
      FROM documents),
    plan AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             GREATEST(1, ({SPAN_CORRUPT_RATE} * n) // 100
                         // {SPAN_LEN}) AS n_spans
      FROM t WHERE n >= {SPAN_MIN_TOKENS}),
    spans AS (
      SELECT doc_id, n_tokens, n_spans, g.i AS span_idx,
             CAST(CAST('0x' || substr(md5(doc_id || '-' || g.i), 1, 8)
                       AS BIGINT)
                  % (n_tokens - {SPAN_LEN} + 1) + 1 AS BIGINT)
               AS span_start
      FROM plan, UNNEST(generate_series(1, n_spans)) AS g(i))
    SELECT doc_id, n_tokens, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(span_idx AS BIGINT) AS span_idx, span_start,
           span_start + {SPAN_LEN} - 1 AS span_end
    FROM spans
    """,
)
def x_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLAN: per document, budget
    {SPAN_CORRUPT_RATE}% of tokens for corruption in fixed
    {SPAN_LEN}-token spans and emit each span's deterministic
    position — the denoising-objective preprocessing step (Raffel et
    al. 2020) run as a relational plan so the masking pass downstream
    is a pure map over (doc, span) rows.  Spans are RAW candidates
    (overlaps legal — merging is the applier's job, exactly as T5's
    noise-mask generator draws before merging).

    Cross-engine exactness: token counts and the span budget are
    exact integers (integral div, never a float rate); the span start
    is md5-derived — CONV(substr(md5(doc_id || '-' || i), 1, 8)) both
    engines, modulo the valid start range — so the "random" placement
    is deterministic, reproducible across engines, retries, and
    cluster sizes (the x_sample_stratified hash-sampling discipline
    applied to position sampling).  Short docs (< {SPAN_MIN_TOKENS}
    tokens) are excluded.

    100 TB posture: map-side arithmetic + one bounded explode of
    n_spans rows per doc (≤ 5% of token volume); no shuffle at all —
    the plan inherits the scan's partitioning for the downstream
    zip-with-mask application."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    plan = d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") >= SPAN_MIN_TOKENS).select(
        "doc_id",
        "n_tokens",
        F.greatest(
            F.lit(1),
            F.expr(
                f"(({SPAN_CORRUPT_RATE} * n_tokens) div 100)"
                f" div {SPAN_LEN}"
            ),
        ).alias("n_spans"),
    )
    spans = plan.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.explode(F.sequence(F.lit(1), F.col("n_spans"))).alias(
            "span_idx"
        ),
    )
    start = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("-"),
                        F.col("span_idx").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (F.col("n_tokens") - SPAN_LEN + 1)
        + 1
    )
    return spans.select(
        "doc_id",
        "n_tokens",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("span_idx").cast("long").alias("span_idx"),
        start.cast("long").alias("span_start"),
        (start + SPAN_LEN - 1).cast("long").alias("span_end"),
    )


SHARD_N = 8  # manifest shards


@register(
    "x_shard_manifest",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS h
      FROM documents),
    s AS (SELECT *, h % {SHARD_N} AS shard FROM d)
    SELECT CAST(shard AS INTEGER) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(h) AS BIGINT) AS content_checksum
    FROM s GROUP BY shard
    """,
)
def x_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: assign every document to one of
    {SHARD_N} shards by content-independent md5(doc_id) hash and emit
    the per-shard manifest row — doc/token/byte counts, id range,
    source spread, and an ORDER-FREE integer checksum (sum of the
    per-doc hash ints) — the writer-side bookkeeping a 100 TB corpus
    prep emits next to every shard file so a reader can verify
    completeness without rescanning text (x_data_card's corpus-level
    counterpart at shard granularity).

    Cross-engine exactness: the shard id and checksum derive from the
    same md5-prefix-through-'0x' integer on both engines (the
    x_span_corruption_plan mechanism); every manifest column is an
    exact integer; the checksum is addition-commutative so partial
    aggregation order cannot perturb it.

    100 TB posture: everything is computed MAP-SIDE from the row
    itself (hash, token count, byte count); the shuffle carries
    {SHARD_N} groups x seven integer accumulators.  The even md5
    split is also the skew argument: shard sizes concentrate at
    n/{SHARD_N} regardless of source or length skew."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), " "))
        .cast("long")
        .alias("n_tokens"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    s = d.withColumn("shard", (F.col("h") % SHARD_N).cast("int"))
    return s.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_bytes"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.sum("h").cast("long").alias("content_checksum"),
    )


CONTRACT_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
)


@register(
    "x_data_contract",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             o_orderpriority
      FROM orders),
    checks AS (
      SELECT 'orderkey_unique' AS check_name,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS n_violations
      FROM base
      UNION ALL
      SELECT 'totalprice_nonnegative',
             CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'priority_not_null',
             CAST(SUM(CASE WHEN o_orderpriority IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'priority_in_domain',
             CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                            AND o_orderpriority NOT IN
                                {CONTRACT_PRIORITIES!r}
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'orderdate_in_range',
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                             OR o_orderdate >= TIMESTAMP '2035-01-01'
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM base
      UNION ALL
      SELECT 'custkey_positive',
             CAST(SUM(CASE WHEN o_custkey IS NULL OR o_custkey <= 0
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM base)
    SELECT check_name, n_violations, n_violations = 0 AS passed
    FROM checks
    """,
)
def x_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation (the Deequ/Great-Expectations shape):
    six declarative constraints over the orders feed — key
    uniqueness, non-negativity, null-ness, domain membership, range,
    referential positivity — each reported as a (check, violations,
    passed) row, the landing-zone gate a pipeline runs BEFORE
    publishing a snapshot downstream (q_snapshot_diff then diffs
    published snapshots; x_shard_manifest seals them).

    Cross-engine exactness: every check is an exact integer count of
    an exact predicate.

    100 TB posture: ONE scan; every check is a map-side predicate
    feeding a global partial agg — six integer accumulators traverse
    the shuffle (the uniqueness check adds one distinct expansion on
    the key).  The UNION ALL report is six 1-row aggregates over the
    same cached base — Spark compiles each arm's predicate into the
    shared scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ).localCheckpoint(eager=True)

    def check(name, col):
        return o.agg(
            F.lit(name).alias("check_name"),
            col.cast("long").alias("n_violations"),
        )

    dup = o.agg(
        F.lit("orderkey_unique").alias("check_name"),
        (F.count("*") - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("n_violations"),
    )
    neg = check(
        "totalprice_nonnegative",
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)),
    )
    pnull = check(
        "priority_not_null",
        F.sum(
            F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
        ),
    )
    pdom = check(
        "priority_in_domain",
        F.sum(
            F.when(
                F.col("o_orderpriority").isNotNull()
                & ~F.col("o_orderpriority").isin(
                    *CONTRACT_PRIORITIES
                ),
                1,
            ).otherwise(0)
        ),
    )
    drange = check(
        "orderdate_in_range",
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2035-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        ),
    )
    ckey = check(
        "custkey_positive",
        F.sum(
            F.when(
                F.col("o_custkey").isNull() | (F.col("o_custkey") <= 0),
                1,
            ).otherwise(0)
        ),
    )
    rep = dup.union(neg).union(pnull).union(pdom).union(drange).union(
        ckey
    )
    return rep.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


DP_EPSILON = "1.0"  # per-release privacy budget (shared literal string
# so both engines parse the identical double)


@register(
    "x_dp_count_release",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    u AS (
      SELECT event_type, day, n,
             CAST(CAST('0x' || substr(md5(event_type || '|' || day
                                          || '|release1'), 1, 8)
                       AS BIGINT) AS DOUBLE) / 4294967296.0 AS uni
      FROM c)
    SELECT event_type, day,
           ROUND(n + CASE WHEN uni = 0.5 THEN 0.0
                          WHEN uni < 0.5 THEN
                            (1.0 / {DP_EPSILON})
                            * LN(1.0 - 2.0 * (0.5 - uni))
                          ELSE
                            -(1.0 / {DP_EPSILON})
                            * LN(1.0 - 2.0 * (uni - 0.5))
                     END, 6) AS noisy_count,
           CAST({DP_EPSILON} AS DOUBLE) AS epsilon
    FROM u
    """,
)
def x_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of the daily event-type counts:
    each true count + Laplace(1/ε) noise via the inverse CDF,
    noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) — the mechanism a
    training-data pipeline uses to publish corpus composition stats
    (domain mix, per-source volumes) without leaking any single
    record.  ε = {DP_EPSILON} per released cell (count sensitivity 1);
    the released relation is the ONLY thing downstream sees.

    DETERMINISTIC noise for the gate: u is the md5('type|day|release1')
    32-bit prefix over 2^32 — the q_agg_bootstrap_ci mechanism — so
    both engines draw the identical uniform and the identical
    Laplace deviate; a production release swaps the md5 tag for a
    fresh secret salt per release (same plan, secret seed).  The
    noisy count is ONE fixed-order double expression rounded to 6;
    u = ½ maps to exactly 0 noise on both engines.

    100 TB posture: map-side partial agg onto the |types|·|days|
    grid; noise is a per-cell scalar expression.  The privacy
    accounting is the release tag: one tag = one ε spend, composable
    by counting tags (x_data_card records them)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
    ).agg(F.count("*").cast("long").alias("n"))
    uni = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("event_type"),
                        F.col("day"),
                        F.lit("release1"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    eps = F.lit(float(DP_EPSILON))
    noise = (
        F.when(uni == 0.5, F.lit(0.0))
        .when(
            uni < 0.5,
            (F.lit(1.0) / eps)
            * F.log(F.lit(1.0) - F.lit(2.0) * (F.lit(0.5) - uni)),
        )
        .otherwise(
            -(F.lit(1.0) / eps)
            * F.log(F.lit(1.0) - F.lit(2.0) * (uni - F.lit(0.5)))
        )
    )
    return c.select(
        "event_type",
        "day",
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
        eps.alias("epsilon"),
    )


UNIMAX_EPOCH_CAP = 3  # max epochs any language may repeat (UniMax N)
UNIMAX_BUDGET_X = 2   # token budget as a multiple of the corpus total


@register(
    "x_unimax_mixture",
    oracle=f"""
    WITH s AS (
      SELECT lang, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY lang),
    g AS (SELECT CAST({UNIMAX_BUDGET_X} * SUM(t) AS BIGINT) AS b,
                 CAST(COUNT(*) AS BIGINT) AS l
          FROM s),
    r AS (
      SELECT lang, t,
             CAST({UNIMAX_EPOCH_CAP} * t AS BIGINT) AS cap,
             CAST(ROW_NUMBER() OVER (ORDER BY t, lang) AS BIGINT) AS rn,
             CAST(SUM({UNIMAX_EPOCH_CAP} * t)
                    OVER (ORDER BY t, lang
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
      FROM s),
    f AS (
      SELECT r.*, g.b, g.l,
             CASE WHEN cap * (g.l - rn + 1) <= g.b - (p - cap)
                  THEN 1 ELSE 0 END AS capped
      FROM r, g),
    k AS (SELECT COALESCE(MAX(CASE WHEN capped = 1 THEN rn END),
                          CAST(0 AS BIGINT)) AS kk,
                 COALESCE(MAX(CASE WHEN capped = 1 THEN p END),
                          CAST(0 AS BIGINT)) AS pk
          FROM f)
    SELECT f.lang, f.t AS n_tokens, f.cap AS cap_tokens,
           f.capped = 1 AS capped,
           CAST(CASE WHEN f.capped = 1 THEN f.cap
                     ELSE (f.b - k.pk) // (f.l - k.kk) END
                AS BIGINT) AS alloc_tokens,
           ROUND(CAST(CASE WHEN f.capped = 1 THEN f.cap
                           ELSE (f.b - k.pk) // (f.l - k.kk) END
                      AS DOUBLE) / f.b, 6) AS alloc_share,
           ROUND(CAST(CASE WHEN f.capped = 1 THEN f.cap
                           ELSE (f.b - k.pk) // (f.l - k.kk) END
                      AS DOUBLE) / f.t, 6) AS epochs
    FROM f, k
    """,
)
def x_unimax_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-mixture allocation (Chung et al. 2023): give every
    language an equal share of the token budget, EXCEPT that no language
    may repeat more than {UNIMAX_EPOCH_CAP} epochs — the waterfilling
    policy that dominates temperature sampling when tail languages are
    tiny (temperature still over-repeats them; UniMax caps the repeats
    and redistributes the freed budget uniformly).  Completes the
    mixture-policy tier: x_token_budget (proportional), x_lang_balance
    (hard quota), x_sample_temperature (τ-scaled), this (cap + uniform).

    Mechanics — the greedy loop has a CLOSED FORM over the cap-ascending
    order: with caps c_i = {UNIMAX_EPOCH_CAP}·t_i sorted ascending and
    prefix sums P_i, language i is capped iff
    c_i·(L−i+1) ≤ B − P_(i−1) (false is absorbing as i grows — proved
    by c_j ≥ c_i monotonicity), so ONE row_number + ONE prefix-sum
    window finds the switch point k, and every uncapped language gets
    the integer share (B − P_k) DIV (L − k).  No driver-side loop, no
    recursion — the same rank-then-threshold shape as x_token_budget's
    largest-remainder apportionment.

    Cross-engine exactness: token counts, caps, prefix sums, the capped
    predicate, and alloc_tokens are ALL BIGINT arithmetic (integer DIV,
    never a float divide); alloc_share and epochs are single IEEE
    divisions of those integers, rounded 6.

    100 TB posture: one corpus-sized map-side token-count partial agg
    onto |langs| rows; the windows and the k-scan run on that bounded
    relation (global window over |langs| is deliberate — the relation
    is mixture-table-sized).  The alloc table is what the sampler
    broadcasts; budget B = {UNIMAX_BUDGET_X}× corpus total and cap
    {UNIMAX_EPOCH_CAP} are sized so the fixture exercises BOTH branches
    (the smallest language caps, the rest split the remainder)."""
    d = load_table(spark, sf_dir, "documents")
    s = (
        d.groupBy("lang")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("t")
        )
        # |langs| rows feed the budget agg, the rank window and the
        # k-scan — localCheckpoint so the corpus pass runs ONCE (the
        # x_sample_temperature bounded-relation rule).
        .localCheckpoint(eager=True)
    )
    g = s.agg(
        (F.lit(UNIMAX_BUDGET_X) * F.sum("t")).cast("long").alias("b"),
        F.count("*").cast("long").alias("l"),
    )
    w = Window.orderBy("t", "lang")
    r = s.select(
        "lang",
        "t",
        (F.lit(UNIMAX_EPOCH_CAP) * F.col("t")).cast("long").alias("cap"),
        F.row_number().over(w).cast("long").alias("rn"),
    ).withColumn(
        "p",
        F.sum("cap").over(
            Window.orderBy("t", "lang").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).cast("long"),
    )
    f = r.crossJoin(g).withColumn(
        "capped",
        (
            F.col("cap") * (F.col("l") - F.col("rn") + 1)
            <= F.col("b") - (F.col("p") - F.col("cap"))
        ).cast("int"),
    ).localCheckpoint(eager=True)
    k = f.agg(
        F.coalesce(
            F.max(F.when(F.col("capped") == 1, F.col("rn"))), F.lit(0)
        )
        .cast("long")
        .alias("kk"),
        F.coalesce(
            F.max(F.when(F.col("capped") == 1, F.col("p"))), F.lit(0)
        )
        .cast("long")
        .alias("pk"),
    )
    alloc = F.when(F.col("capped") == 1, F.col("cap")).otherwise(
        F.expr("(b - pk) div (l - kk)")
    )
    return f.crossJoin(k).select(
        "lang",
        F.col("t").alias("n_tokens"),
        F.col("cap").alias("cap_tokens"),
        (F.col("capped") == 1).alias("capped"),
        alloc.cast("long").alias("alloc_tokens"),
        F.round(alloc.cast("double") / F.col("b"), 6).alias("alloc_share"),
        F.round(alloc.cast("double") / F.col("t"), 6).alias("epochs"),
    )


TENC_SMOOTH = 20  # pseudo-count m in enc = (sum_y + m·mu) / (n + m)


@register(
    "x_target_encoding",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    seg AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(y) AS sy
      FROM j GROUP BY segment),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tn,
             CAST(SUM(sy) AS DOUBLE) AS tsy
      FROM seg)
    SELECT seg.segment, seg.n AS n_orders,
           ROUND(CAST(seg.sy AS DOUBLE) / seg.n, 6) AS raw_mean,
           ROUND((CAST(seg.sy AS DOUBLE)
                  + {TENC_SMOOTH} * (tot.tsy / tot.tn))
                 / (seg.n + {TENC_SMOOTH}), 6) AS encoded,
           ROUND(CAST(seg.n AS DOUBLE) / (seg.n + {TENC_SMOOTH}), 6)
             AS shrink,
           ROUND(tot.tsy / tot.tn, 6) AS global_mean
    FROM seg, tot
    """,
)
def x_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (Micci-Barreca 2001): replace the
    categorical c_mktsegment with the shrunk mean of the target
    (o_totalprice) — enc = (Σy + m·μ)/(n + m) with pseudo-count
    m = {TENC_SMOOTH} — the standard high-cardinality categorical
    feature for tree/linear models.  A rare category's encoding shrinks
    toward the global mean μ instead of memorizing its few labels (the
    leakage failure mode of the unsmoothed per-category mean); `shrink`
    = n/(n+m) says how much each category trusts its own data.

    Cross-engine exactness: per-segment n and Σy are exact (BIGINT
    count, DECIMAL(18,2) money sum per the FIXTURES.md §6 discipline);
    μ and the encoding are ONE fixed-order double expression over those
    exact aggregates, rounded 6.

    100 TB posture: the only corpus-sized stage is the orders ⋈ customer
    key shuffle (both sides large at scale — AQE broadcasts the dim when
    it fits, q_join_inner_broadcast's pattern); the partial agg lands on
    |segments| rows and everything after is constant-size.  The encoding
    table is what the feature pipeline broadcasts back onto the fact
    table at apply time."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    seg = (
        j.groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").alias("sy"),
        )
        # |segments| rows feed both the global-mean agg and the final
        # projection — run the join once.
        .localCheckpoint(eager=True)
    )
    tot = seg.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sy").cast("double").alias("tsy"),
    )
    m = F.lit(float(TENC_SMOOTH))
    mu = F.col("tsy") / F.col("tn")
    return seg.crossJoin(tot).select(
        "segment",
        F.col("n").alias("n_orders"),
        F.round(F.col("sy").cast("double") / F.col("n"), 6).alias(
            "raw_mean"
        ),
        F.round(
            (F.col("sy").cast("double") + m * mu) / (F.col("n") + m), 6
        ).alias("encoded"),
        F.round(F.col("n").cast("double") / (F.col("n") + m), 6).alias(
            "shrink"
        ),
        F.round(mu, 6).alias("global_mean"),
    )


def tenc_bucketed_seg(spark: SparkSession) -> DataFrame:
    """Per-segment (n, Σy) over the custkey-bucketed orders⋈customer —
    the exchange-free join stage, factored out (pre-localCheckpoint) so
    tests/test_plans.py can pin its physical plan."""
    ob = spark.table("kcss_orders_by_cust").hint("merge")
    cb = spark.table("kcss_customer_by_cust")
    j = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    return j.groupBy("segment").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").alias("sy"),
    )


@register(
    "x_target_encoding_bucketed",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    seg AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(y) AS sy
      FROM j GROUP BY segment),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tn,
             CAST(SUM(sy) AS DOUBLE) AS tsy
      FROM seg)
    SELECT seg.segment, seg.n AS n_orders,
           ROUND(CAST(seg.sy AS DOUBLE) / seg.n, 6) AS raw_mean,
           ROUND((CAST(seg.sy AS DOUBLE)
                  + {TENC_SMOOTH} * (tot.tsy / tot.tn))
                 / (seg.n + {TENC_SMOOTH}), 6) AS encoded,
           ROUND(CAST(seg.n AS DOUBLE) / (seg.n + {TENC_SMOOTH}), 6)
             AS shrink,
           ROUND(tot.tsy / tot.tn, 6) AS global_mean
    FROM seg, tot
    """,
)
def x_target_encoding_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x_target_encoding on a BUCKETED layout (VERDICT r12 item 6):
    identical semantics and oracle, but orders and customer are written
    bucketed+sorted by the customer key first, so the fact⋈dim join —
    the only true large×large key shuffle among the round-12 ops
    (31.3 s at sf10, an honest 15M×1.5M AQE sort-merge) — reads buckets
    pairwise with ZERO exchange on either join side
    (tests/test_plans.py pins it, the q_join_bucketed precedent).

    This is the recurring-pipeline posture: a feature store recomputes
    target encodings every training run; paying the bucketing once at
    landing time converts every subsequent run's corpus shuffle into a
    co-located merge join.  The MERGE hint pins SortMergeJoin so the
    plan demonstrates the bucket path even at fixture scale where
    broadcast would win."""
    import os
    import shutil

    from ..io import scratch_dir

    base = scratch_dir("kcss_tenc_bucketed")
    shutil.rmtree(base, ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS kcss_orders_by_cust")
    spark.sql("DROP TABLE IF EXISTS kcss_customer_by_cust")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    (
        o.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", os.path.join(base, "orders"))
        .mode("overwrite")
        .saveAsTable("kcss_orders_by_cust")
    )
    (
        c.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", os.path.join(base, "customer"))
        .mode("overwrite")
        .saveAsTable("kcss_customer_by_cust")
    )
    seg = tenc_bucketed_seg(spark).localCheckpoint(eager=True)
    tot = seg.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sy").cast("double").alias("tsy"),
    )
    m = F.lit(float(TENC_SMOOTH))
    mu = F.col("tsy") / F.col("tn")
    return seg.crossJoin(tot).select(
        "segment",
        F.col("n").alias("n_orders"),
        F.round(F.col("sy").cast("double") / F.col("n"), 6).alias(
            "raw_mean"
        ),
        F.round(
            (F.col("sy").cast("double") + m * mu) / (F.col("n") + m), 6
        ).alias("encoded"),
        F.round(F.col("n").cast("double") / (F.col("n") + m), 6).alias(
            "shrink"
        ),
        F.round(mu, 6).alias("global_mean"),
    )


DPQ_EPSILON = 1.0   # exponential-mechanism privacy budget
QTY_DOMAIN = 50     # l_quantity candidate grid: 1..50 (public domain)


@register(
    "x_dp_quantile_release",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    flags AS (SELECT DISTINCT flag FROM h),
    grid AS (
      SELECT f.flag, g.v
      FROM flags f, (SELECT UNNEST(generate_series(1, {QTY_DOMAIN}))
                     AS v) g),
    r AS (
      SELECT grid.flag, grid.v,
             CAST(SUM(COALESCE(h.c, 0)) OVER (
                    PARTITION BY grid.flag ORDER BY grid.v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rank_le
      FROM grid LEFT JOIN h ON h.flag = grid.flag AND h.v = grid.v),
    nn AS (SELECT flag, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    ru AS (
      SELECT r.flag, r.v, nn.n, r.rank_le,
             -ABS(2 * r.rank_le - nn.n) AS u2,
             MAX(-ABS(2 * r.rank_le - nn.n))
               OVER (PARTITION BY r.flag) AS u2max
      FROM r JOIN nn ON nn.flag = r.flag),
    w AS (
      SELECT flag, v, n, rank_le,
             CAST(ROUND(EXP({DPQ_EPSILON} * (u2 - u2max) / 4.0), 12)
                  AS DECIMAL(16,12)) AS wt
      FROM ru),
    cw AS (
      SELECT flag, v, n, wt,
             SUM(wt) OVER (PARTITION BY flag ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(wt) OVER (PARTITION BY flag) AS tot
      FROM w),
    uni AS (
      SELECT flag,
             CAST(CAST('0x' || substr(md5(flag || '|dpq1'), 1, 8)
                       AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM flags),
    pick AS (
      SELECT cw.flag, MIN(cw.v) AS dp_q
      FROM cw JOIN uni ON uni.flag = cw.flag
      WHERE CAST(cw.cum AS DOUBLE)
            >= CAST(ROUND(uni.u * CAST(cw.tot AS DOUBLE), 12)
                    AS DECIMAL(18,12))
      GROUP BY cw.flag),
    med AS (
      SELECT flag, MIN(v) AS true_median
      FROM r JOIN nn USING (flag)
      WHERE 2 * rank_le >= n GROUP BY flag)
    SELECT p.flag AS l_returnflag, nn.n, p.dp_q AS dp_median,
           med.true_median,
           CAST({DPQ_EPSILON} AS DOUBLE) AS epsilon
    FROM pick p JOIN nn ON nn.flag = p.flag
    JOIN med ON med.flag = p.flag
    """,
)
def x_dp_quantile_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private median release via the EXPONENTIAL
    MECHANISM (McSherry–Talwar) over the public 1..{QTY_DOMAIN} quantity
    grid: candidate v scores utility u(v) = −|#(x ≤ v)·2 − n| (distance
    from the median rank, sensitivity 2), weight ∝ exp(ε·u/4), and the
    released value is the inverse-CDF pick at a deterministic
    md5-derived uniform — the x_dp_count_release bootstrap mechanism
    extended from noisy counts to a noisy ORDER STATISTIC, which the
    Laplace mechanism cannot release directly (rank queries have
    unbounded value sensitivity; the exponential mechanism needs only
    the utility's).

    Numerical discipline: weights are exp(ε·(u − u_max)/4) — the
    standard (and mechanism-invariant) max-utility shift, WITHOUT which
    every weight underflows the 12-dp rounding grid once n is large
    (observed live: n≈20k rounded ALL weights to zero and the pick
    degenerated to the grid minimum).  The shifted best candidate
    always weighs exactly 1.

    Cross-engine exactness: ranks over the completed candidate grid are
    BIGINT cumsums; each weight is exp of an EXACT quarter-integer
    argument, rounded to the 12-dp grid and accumulated as DECIMAL (the
    rounded-ln discipline of q_agg_entropy applied to exp), so the CDF
    is order-free; the uniform and the threshold are one double
    multiply rounded onto the same 12-dp grid; the pick is a MIN over
    an exact DECIMAL comparison.  true_median (exact, non-private) sits
    beside the release as the fixture's calibration column.

    100 TB posture: ONE corpus-sized partial-agg histogram onto
    (|flags| × {QTY_DOMAIN}) cells; every window after rides that
    bounded grid partitioned by flag.  The released table is
    |flags|-sized — the shape a privacy-gated metrics export publishes;
    ε accounting composes with x_dp_count_release's by release tag."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("v"),
        )
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    flags = h.select("flag").distinct()
    grid = flags.crossJoin(
        spark.range(1, QTY_DOMAIN + 1).select(F.col("id").alias("v"))
    )
    r = (
        grid.join(h, ["flag", "v"], "left")
        .select("flag", "v", F.coalesce("c", F.lit(0)).alias("c"))
        .withColumn(
            "rank_le",
            F.sum("c")
            .over(
                Window.partitionBy("flag")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("long"),
        )
    )
    nn = h.groupBy("flag").agg(F.sum("c").cast("long").alias("n"))
    ru = r.join(nn, "flag").select(
        "flag",
        "v",
        "n",
        "rank_le",
        (-F.abs(2 * F.col("rank_le") - F.col("n"))).alias("u2"),
    ).withColumn(
        "u2max", F.max("u2").over(Window.partitionBy("flag"))
    )
    w = ru.select(
        "flag",
        "v",
        "n",
        "rank_le",
        F.round(
            F.exp(
                F.lit(DPQ_EPSILON)
                * (F.col("u2") - F.col("u2max"))
                / F.lit(4.0)
            ),
            12,
        )
        .cast("decimal(16,12)")
        .alias("wt"),
    )
    cw = w.select(
        "flag",
        "v",
        "n",
        "wt",
        F.sum("wt")
        .over(
            Window.partitionBy("flag")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("wt").over(Window.partitionBy("flag")).alias("tot"),
    )
    uni = flags.select(
        "flag",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("flag"), F.lit("|dpq1"))), 1, 8),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    pick = (
        cw.join(uni, "flag")
        .filter(
            F.col("cum").cast("double")
            >= F.round(
                F.col("u") * F.col("tot").cast("double"), 12
            ).cast("decimal(18,12)").cast("double")
        )
        .groupBy("flag")
        .agg(F.min("v").alias("dp_q"))
    )
    med = (
        r.join(nn, "flag")
        .filter(2 * F.col("rank_le") >= F.col("n"))
        .groupBy("flag")
        .agg(F.min("v").alias("true_median"))
    )
    return (
        pick.join(nn, "flag")
        .join(med, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            "n",
            F.col("dp_q").alias("dp_median"),
            "true_median",
            F.lit(float(DPQ_EPSILON)).alias("epsilon"),
        )
    )


@register(
    "x_class_balance_weights",
    oracle="""
    WITH c AS (
      SELECT CAST(label AS BIGINT) AS label,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                 CAST(COUNT(*) AS BIGINT) AS k FROM c)
    SELECT c.label, c.n,
           ROUND(CAST(c.n AS DOUBLE) / t.nt, 6) AS share,
           ROUND(CAST(t.nt AS DOUBLE) / (t.k * c.n), 6) AS weight,
           ROUND(CAST(t.nt AS DOUBLE) / (t.k * c.n)
                 * c.n / t.nt * t.k, 6) AS weight_check
    FROM c, t
    """,
)
def x_class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights over the labeled embedding set —
    the sklearn `class_weight='balanced'` table (w_c = N/(K·n_c)) that
    every imbalanced-label training run broadcasts into its loss: a
    label with half the average frequency gets weight 2.  Emits the
    share alongside so the imbalance itself is visible, plus the
    sanity identity w_c·n_c·K/N = 1 as weight_check (a literal-1 column
    that catches any future formula drift on EITHER engine).

    Cross-engine exactness: counts exact; each weight is one double
    expression of exact integers, rounded 6.

    100 TB posture: one partial-agg count onto |labels| groups; the
    total is a 1-row rollup re-joined by broadcast (crossJoin of a
    single row).  The weight table is itself what gets broadcast at
    train time."""
    e = load_table(spark, sf_dir, "embeddings")
    c = e.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count("*").cast("long").alias("n")
    ).localCheckpoint(eager=True)  # feeds t + the weight projection
    t = c.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count("*").cast("long").alias("k"),
    )
    w = F.col("nt").cast("double") / (F.col("k") * F.col("n"))
    return c.crossJoin(broadcast(t)).select(
        "label",
        "n",
        F.round(F.col("n").cast("double") / F.col("nt"), 6).alias("share"),
        F.round(w, 6).alias("weight"),
        F.round(
            w * F.col("n") / F.col("nt") * F.col("k"), 6
        ).alias("weight_check"),
    )


SHUF_SEED = 20240816  # the run's shuffle epoch seed
SHUF_SHARDS = 64
# Knuth multiplicative constant; doc_id*K + seed stays < 2^63 for any
# doc_id < ~3.5e9, so the arithmetic is exact (no overflow surface) in
# both engines.  Production would use xxhash64(doc_id, seed); the
# linear-congruential form is chosen because BOTH engines can evaluate
# it exactly from the same text.
SHUF_MULT = 2654435761
SHUF_MOD = 2147483647


@register(
    "x_shard_shuffle_seeded",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             (doc_id * {SHUF_MULT} + {SHUF_SEED}) % {SHUF_MOD} AS hv
      FROM documents),
    p AS (
      SELECT doc_id, hv, hv % {SHUF_SHARDS} AS shard,
             ROW_NUMBER() OVER (PARTITION BY hv % {SHUF_SHARDS}
                                ORDER BY hv, doc_id) AS pos
      FROM h)
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum,
           CAST(MIN(hv) AS BIGINT) AS h_min,
           CAST(MAX(hv) AS BIGINT) AS h_max
    FROM p GROUP BY shard
    """,
)
def x_shard_shuffle_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle of the training corpus —
    the epoch-shuffle every data loader needs, done the distributed
    way: a seeded per-doc hash assigns each document a shard
    (hv % 64) and an intra-shard position (rank of hv within the
    shard), so the full corpus order is (shard, pos) WITHOUT any
    single-partition global sort; changing the seed constant re-deals
    the entire corpus.  Two-level order is exactly how packed training
    shards are consumed (reader i streams shard i in pos order), and
    re-running with the same seed reproduces the byte-identical epoch
    — the reproducibility contract shuffle=random() can never give.

    Cross-engine exactness: the hash is exact BIGINT arithmetic shared
    textually with the oracle, ties in hv break on doc_id, and the
    order_checksum Σ pos·doc_id pins every position assignment, not
    just the shard histogram.

    100 TB posture: one scan, one shuffle onto 64 shard partitions,
    per-shard window sort (the x_lang_balance window precedent) — the
    shard count is the parallelism knob, and no stage ever needs the
    global order materialized in one place."""
    d = load_table(spark, sf_dir, "documents")
    hv = (F.col("doc_id") * SHUF_MULT + SHUF_SEED) % SHUF_MOD
    h = d.select("doc_id", hv.alias("hv"))
    shard = (F.col("hv") % SHUF_SHARDS).alias("shard")
    w = Window.partitionBy(F.col("hv") % SHUF_SHARDS).orderBy(
        "hv", "doc_id"
    )
    p = h.select(
        "doc_id", "hv", shard, F.row_number().over(w).alias("pos")
    )
    return p.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("pos") * F.col("doc_id"))
        .cast("long")
        .alias("order_checksum"),
        F.min("hv").cast("long").alias("h_min"),
        F.max("hv").cast("long").alias("h_max"),
    )


LR_SCALE = 1_000_000  # micro-unit grid for features, gradients, betas
LR_XDIV = 3000  # n_chars / 3000: keeps z in sigmoid's active range
LR_ITERS = 3


def _lr_rhu(a: int, b: int) -> int:
    """Round-half-away-from-zero of a/b on exact ints (the
    x_kmeans_lloyd centroid formula, driver-side)."""
    if a >= 0:
        return (2 * a + b) // (2 * b)
    return -((2 * (-a) + b) // (2 * b))


def _lr_oracle() -> str:
    """Unrolled 3-iteration batch-gradient-descent oracle.  All
    iteration state (feature, gradient sums, betas) lives on the
    LR_SCALE integer grid — the x_kmeans_lloyd discipline — so the
    only FP surfaces are the per-row sigmoid/log terms, each rounded
    to the grid BEFORE exact integer summation (the q_agg_log_rank
    rounded-carry fold)."""
    sig = (
        "1.0 / (1.0 + exp(-(CAST(s.b0q AS DOUBLE) / 1000000.0"
        " + CAST(s.b1q AS DOUBLE) / 1000000.0"
        " * (CAST(d.xsq AS DOUBLE) / 1000000.0))))"
    )
    grad = """
    g{k} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND((t.y - t.sig) * 1000000) AS BIGINT))
                  AS BIGINT) AS g0,
             CAST(SUM(CAST(ROUND((t.y - t.sig)
                                 * (CAST(t.xsq AS DOUBLE) / 1000000.0)
                                 * 1000000) AS BIGINT))
                  AS BIGINT) AS g1
      FROM (SELECT d.y, d.xsq, {sig} AS sig
            FROM d CROSS JOIN b{prev} s) t),
    b{k} AS (
      SELECT s.b0q + (CASE WHEN g.g0 >= 0
                      THEN (2 * g.g0 + 2 * g.n) // (4 * g.n)
                      ELSE -((2 * (-g.g0) + 2 * g.n) // (4 * g.n))
                      END) AS b0q,
             s.b1q + (CASE WHEN g.g1 >= 0
                      THEN (2 * g.g1 + 2 * g.n) // (4 * g.n)
                      ELSE -((2 * (-g.g1) + 2 * g.n) // (4 * g.n))
                      END) AS b1q
      FROM b{prev} s CROSS JOIN g{k} g)"""
    parts = [
        f"""
    WITH d AS (
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             (2 * n_chars * {LR_SCALE} + {LR_XDIV})
               // (2 * {LR_XDIV}) AS xsq
      FROM documents),
    b0 AS (SELECT CAST(0 AS BIGINT) AS b0q, CAST(0 AS BIGINT) AS b1q)"""
    ]
    for k in range(1, LR_ITERS + 1):
        parts.append(grad.format(k=k, prev=k - 1, sig=sig))
    parts.append(f"""
    fin AS (
      SELECT d.y, d.xsq, {sig} AS sig, s.b0q, s.b1q
      FROM d CROSS JOIN b{LR_ITERS} s),
    met AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(ROUND(-(y * ln(sig)
                                   + (1.0 - y) * ln(1.0 - sig))
                                 * 1000000) AS BIGINT))
                  AS BIGINT) AS llq,
             CAST(SUM(CASE WHEN (CASE WHEN b0q * 1000000
                                           + b1q * xsq > 0
                                      THEN 1.0 ELSE 0.0 END) = y
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
             MIN(b0q) AS b0q, MIN(b1q) AS b1q
      FROM fin)
    SELECT n_docs,
           ROUND(CAST(b0q AS DOUBLE) / {LR_SCALE}, 6) AS beta0,
           ROUND(CAST(b1q AS DOUBLE) / {LR_SCALE}, 6) AS beta1,
           ROUND(CAST(llq AS DOUBLE) / {LR_SCALE} / n_docs, 6)
             AS log_loss,
           n_correct,
           ROUND(CAST(n_correct AS DOUBLE) / n_docs, 6) AS accuracy
    FROM met""")
    return ",".join(parts)


@register("x_logreg_train_gd", oracle=_lr_oracle())
def x_logreg_train_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression trainer (is-English from document length) by
    LR_ITERS unrolled batch gradient-descent steps — the quality-/
    language-classifier TRAINING loop every curation pipeline runs,
    done the distributed-determinism way: each step is ONE partial-agg
    scan whose per-row gradient terms are rounded onto the LR_SCALE
    integer grid before exact integer summation (q_agg_log_rank's
    rounded-carry fold), and the beta update itself is exact integer
    round-half-away arithmetic on that grid (x_kmeans_lloyd's centroid
    formula), so iteration state NEVER accumulates float error and
    both engines walk the identical beta trajectory.  Decision metric
    is sign-exact: predicted-English ⇔ b0q·1e6 + b1q·xsq > 0 in pure
    BIGINTs.

    Cross-engine exactness: the one FP surface per row (sigmoid / log
    terms off the same fixed-order double expression) is grid-rounded
    before any aggregation; betas, gradients, features are BIGINTs.

    100 TB posture: K map-side-combine scans (K=3 literal), one
    single-row driver collect per step — the canonical Spark ML loop
    shape (no per-row Python, no driver-side data); the 4th scan
    computes loss/accuracy with the final betas as literals."""
    d = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.expr(
            f"CAST((2 * n_chars * {LR_SCALE} + {LR_XDIV})"
            f" DIV (2 * {LR_XDIV}) AS BIGINT)"
        ).alias("xsq"),
    ).localCheckpoint(eager=True)
    b0q, b1q = 0, 0
    for _ in range(LR_ITERS):
        sig = 1.0 / (
            1.0
            + F.exp(
                -(
                    F.lit(float(b0q) / LR_SCALE)
                    + F.lit(float(b1q) / LR_SCALE)
                    * (F.col("xsq").cast("double") / LR_SCALE)
                )
            )
        )
        g = d.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.round((F.col("y") - sig) * LR_SCALE, 0).cast("long")
            )
            .cast("long")
            .alias("g0"),
            F.sum(
                F.round(
                    (F.col("y") - sig)
                    * (F.col("xsq").cast("double") / LR_SCALE)
                    * LR_SCALE,
                    0,
                ).cast("long")
            )
            .cast("long")
            .alias("g1"),
        ).first()
        b0q += _lr_rhu(int(g["g0"]), 2 * int(g["n"]))
        b1q += _lr_rhu(int(g["g1"]), 2 * int(g["n"]))
    sig = 1.0 / (
        1.0
        + F.exp(
            -(
                F.lit(float(b0q) / LR_SCALE)
                + F.lit(float(b1q) / LR_SCALE)
                * (F.col("xsq").cast("double") / LR_SCALE)
            )
        )
    )
    pred = F.when(
        F.lit(b0q).cast("long") * LR_SCALE
        + F.lit(b1q).cast("long") * F.col("xsq")
        > 0,
        1.0,
    ).otherwise(0.0)
    return d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.lit(round(b0q / LR_SCALE, 6)).alias("beta0"),
        F.lit(round(b1q / LR_SCALE, 6)).alias("beta1"),
        F.round(
            F.sum(
                F.round(
                    -(
                        F.col("y") * F.log(sig)
                        + (1.0 - F.col("y")) * F.log(1.0 - sig)
                    )
                    * LR_SCALE,
                    0,
                ).cast("long")
            )
            .cast("double")
            / LR_SCALE
            / F.count("*"),
            6,
        ).alias("log_loss"),
        F.sum(F.when(pred == F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.sum(F.when(pred == F.col("y"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("accuracy"),
    )
