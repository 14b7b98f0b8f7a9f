"""Text-analysis operators for LLM-data pipelines (extension tier,
SURVEY.md §2.4): token counting, quality scoring, language heuristics,
document fingerprinting.  All JVM-side built-ins — no Python UDFs in the hot
path — so they scale to 100 TB as ordinary codegen'd projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load_table
from ..registry import register

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = "['the','a','of','and','to','in']"


@register(
    "x_text_stats",
    oracle="""
    SELECT doc_id, lang, source,
           length(text) AS n_chars,
           len(str_split(text, ' ')) AS n_tokens,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(str_split(text, ' ')), 6) AS avg_tok_len,
           len(list_distinct(str_split(text, ' '))) AS n_vocab
    FROM documents
    """,
)
def x_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char stats (whitespace tokenizer)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks),
            6,
        ).alias("avg_tok_len"),
        F.size(F.array_distinct(toks)).alias("n_vocab"),
    )


@register(
    "x_token_count_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_num_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish
    FROM documents
    """,
)
def x_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (BPE-ish pre-tokenizer) token counting: words, numbers, and a
    GPT-style word|number|punct split."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias(
            "n_word_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias(
            "n_num_tokens"
        ),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("n_bpe_ish"),
    )


@register(
    "x_lang_like_filter",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE lang IN ('en', 'fr') AND regexp_matches(text, '(spark|query|stream)')
    """,
)
def x_lang_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language + content filter (the cheap pre-filter stage of a training-
    data pipeline; predicate pushdown prunes parquet row groups)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.col("lang").isin("en", "fr") & F.col("text").rlike("(spark|query|stream)")
    ).select("doc_id", "lang", "source")


@register(
    "x_quality_score",
    oracle=f"""
    SELECT doc_id,
           ROUND(LEAST(1.0, len(str_split(text, ' ')) / 100.0), 6) AS len_score,
           ROUND(CAST(len(list_filter(str_split(text, ' '),
                                      t -> list_contains({_STOP_SQL!s}, t)))
                      AS DOUBLE) / len(str_split(text, ' ')), 6) AS stop_ratio,
           ROUND(CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g'))
                      AS DOUBLE) / length(text), 6) AS punct_ratio
    FROM documents
    """,
)
def x_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: length score, stopword ratio, non-letter
    ratio — the standard C4/Gopher-style filters, all codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return d.select(
        "doc_id",
        F.round(F.least(F.lit(1.0), F.size(toks) / 100.0), 6).alias("len_score"),
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stop_ratio"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[^a-z ]", ""))
            ).cast("double")
            / F.length("text"),
            6,
        ).alias("punct_ratio"),
    )


@register(
    "x_langid_ngram",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN len(list_filter(str_split(text, ' '),
                                     t -> list_contains({_STOP_SQL!s}, t))) * 10
                     >= len(str_split(text, ' '))
                THEN 'en_like' ELSE 'other' END AS langid_pred
    FROM documents
    """,
)
def x_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-density rule (≥10% English stopwords
    → en_like).  A real n-gram profile model would be a broadcast-joined
    profile table; the shape — pure per-row expression — is identical."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return d.select(
        "doc_id",
        "lang",
        F.when(n_stop * 10 >= F.size(toks), "en_like")
        .otherwise("other")
        .alias("langid_pred"),
    )


@register(
    "x_tfidf_top_term",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    tf AS (
      SELECT doc_id, l[g.i] AS term, COUNT(*) AS tf
      FROM t, UNNEST(generate_series(1, len(l))) AS g(i)
      GROUP BY doc_id, l[g.i]),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term AS top_term, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored)
    WHERE rn = 1
    """,
)
def x_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top term per document (keyword extraction).  Two aggregations
    (term frequency, document frequency); ranking deterministic via
    (score desc, term).  N is a 1-row aggregate cross-joined in (NOT a
    driver-side .count() — the whole thing stays one lazy plan / one
    job); broadcasting that 1-row side is always safe.  The df join is
    deliberately UNHINTED: df is O(|vocab|) rows, and on a web-scale
    corpus the vocabulary (URLs, typos, IDs) is hundreds of millions of
    terms — a forced broadcast() there would OOM and override AQE's
    size check.  Unhinted, AQE broadcasts df when its measured size is
    small (every test SF) and falls back to a term-keyed shuffled join
    at corpus scale, where tf→df is a co-partitioned exchange on the
    same key the df aggregation already shuffled on."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    nd = d.agg(F.count("*").alias("n_docs"))
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        # unhinted: df is O(|vocab|); AQE broadcasts iff actually small
        tf.join(df, "term")
        .crossJoin(broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.select(
            "doc_id",
            F.col("term").alias("top_term"),
            "tfidf",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "x_decontaminate",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    sh AS (
      SELECT doc_id,
             l[g.i] || ' ' || l[g.i + 1] || ' ' || l[g.i + 2] || ' '
               || l[g.i + 3] || ' ' || l[g.i + 4] AS gram
      FROM t, UNNEST(generate_series(1, len(l) - 4)) AS g(i)),
    bench AS (SELECT DISTINCT gram FROM sh WHERE doc_id < 20)
    SELECT s.doc_id, COUNT(DISTINCT s.gram) AS n_hits
    FROM sh s JOIN bench b ON s.gram = b.gram
    WHERE s.doc_id >= 20
    GROUP BY s.doc_id
    """,
)
def x_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-gram with the held-out set (doc_id < 20 stands in for the benchmark).
    The canonical pretraining hygiene pass — at 100 TB the benchmark-gram
    set is small and broadcast, so the scan stays single-pass with no
    shuffle of the corpus side.

    Gram build (round-10 rewrite, measured at sf10 / 26M grams): ONE
    transform(sequence, i -> concat_ws(slice(toks, i, 5))) over a
    MATERIALIZED token column — 36.9 s vs the shared shingles() k=5
    zip_with chain's 59.8 s (four chained interpreted lambdas allocate
    three intermediate concat arrays per doc; one slice+concat lambda
    allocates none).  The round-8 objection to the transform form was
    its lambda RE-SPLITTING text per element — that applied to an
    outer split(text) expression, not to a materialized attribute,
    which re-reads for free (the x_word_entropy materialization rule).
    A posexplode+lead-window build measured 15.8 s but pays a FULL
    CORPUS token shuffle — the wrong trade at 100 TB, where shuffle-
    free map-side work beats network (A/B in SCALE.md).  Docs shorter
    than 5 tokens emit NO grams via the F.when(size >= 5) guard below
    (sequence(1, 0) would step DOWN to [1, 0], not empty), matching
    the oracle's empty generate_series."""
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("toks"))
    # guard BEFORE sequence(): Spark's sequence(1, 0) steps DOWN to
    # [1, 0] rather than yielding an empty array, which would emit a
    # truncated gram for a short doc
    grams = F.when(
        F.size("toks") >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 4),
            lambda i: F.concat_ws(" ", F.slice("toks", i, 5)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = base.select("doc_id", F.explode(grams).alias("gram"))
    bench = sh.filter(F.col("doc_id") < 20).select("gram").distinct()
    return (
        sh.filter(F.col("doc_id") >= 20)
        .join(broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hits"))
    )


@register(
    "x_text_top_bigrams",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    bg AS (
      SELECT l[g.i] || ' ' || l[g.i + 1] AS bigram
      FROM t, UNNEST(generate_series(1, len(l) - 1)) AS g(i))
    SELECT bigram, n FROM (
      SELECT bigram, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rn
      FROM bg GROUP BY bigram)
    WHERE rn <= 25
    """,
)
def x_text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-25 bigrams: n-gram explode → count → top-k.  The
    n-gram vocabulary pass of a tokenizer-training / contamination-check
    pipeline; partial aggregation absorbs the explode before the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counts = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), "bigram")
    return (
        counts.select("bigram", "n", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 25)
        .drop("rn")
    )


@register(
    "x_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents)
    SELECT doc_id,
           CAST(SUM((length(l[g.i]) * 31 + ascii(substr(l[g.i], 1, 1))) * g.i)
                AS BIGINT) AS fingerprint
    FROM t, UNNEST(generate_series(1, len(l))) AS g(i)
    GROUP BY doc_id
    """,
)
def x_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint (position-weighted rolling hash
    over tokens).  Integer arithmetic → exact in both engines.  Computed
    as a single higher-order fold (zip_with positions + aggregate) so the
    whole op is ONE codegen'd projection with ZERO shuffle — the round-4
    rewrite of the original posexplode+groupBy plan, whose exchange
    carried a row per token; at 100 TB that exchange was the entire cost
    of the operator.  NULL-text docs are dropped up front: the oracle's
    generate_series over a NULL token list yields no rows, and the fold
    would otherwise emit a NULL-fingerprint row the groupBy plan never
    produced."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    toks = F.split(F.col("text"), " ")
    terms = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda tok, i: ((F.length(tok) * 31 + F.ascii(tok)) * i).cast("long"),
    )
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "x_repetition_score",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    ex AS (SELECT doc_id, len(l) AS n, UNNEST(l) AS tok FROM t),
    cnt AS (SELECT doc_id, ANY_VALUE(n) AS n, tok, COUNT(*) AS c
            FROM ex GROUP BY doc_id, tok)
    SELECT doc_id,
           ROUND(CAST(MAX(c) AS DOUBLE) / ANY_VALUE(n), 6)
               AS top_tok_ratio,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n), 6)
               AS distinct_ratio
    FROM cnt
    GROUP BY doc_id
    """,
)
def x_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher-rules family): mass of the
    most frequent token and distinct-token ratio per document — high
    top-token mass or low distinct ratio flags boilerplate/spam.

    Round-8 rewrite (13.2 s → 2.5 s at sf1): the explode + double-groupBy
    form paid twice — `select(size(toks), explode(toks))` in one
    projection re-evaluates size(split(text)) per exploded OUTPUT row
    (60× amplification; see x_word_entropy), and both shuffles carried a
    row per distinct (doc, token).  The max token count of a document is
    just the LONGEST RUN in its sorted token array, so the whole op is
    now map-side: materialize array_sort(toks) + n + n_distinct in one
    projection, then a single run-length fold tracking (prev, run, max)
    — zero Exchange, O(n log n) per doc, exact integer counts so the
    oracle (which keeps the relational explode+groupBy form) matches
    bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id",
        F.array_sort(toks).alias("arr"),
        F.size(toks).cast("double").alias("nd"),
        F.size(F.array_distinct(toks)).cast("double").alias("n_distinct"),
    )
    max_run = F.aggregate(
        F.col("arr"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("mx"),
        ),
        lambda acc, w: F.when(
            w == acc["prev"],
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + F.lit(1)).cast("long").alias("run"),
                F.greatest(acc["mx"], (acc["run"] + F.lit(1)).cast("long")).alias("mx"),
            ),
        ).otherwise(
            F.struct(
                w.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                F.greatest(acc["mx"], F.lit(1).cast("long")).alias("mx"),
            )
        ),
        lambda acc: acc["mx"],
    )
    return base.select(
        "doc_id",
        F.round(max_run.cast("double") / F.col("nd"), 6).alias(
            "top_tok_ratio"
        ),
        F.round(F.col("n_distinct") / F.col("nd"), 6).alias(
            "distinct_ratio"
        ),
    )


@register(
    "x_word_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok,
             len(str_split(text, ' ')) AS n
      FROM documents),
    freq AS (
      SELECT doc_id, tok, n, COUNT(*) AS c
      FROM toks GROUP BY doc_id, tok, n)
    SELECT doc_id,
           ROUND(-SUM((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))),
                 6) AS word_entropy,
           CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM freq
    GROUP BY doc_id
    """,
)
def x_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-document word distribution — a
    vocabulary-free gibberish/repetition quality signal (low entropy =
    boilerplate or copy-spam; degenerate repeated-token docs score near
    0).  Computed entirely map-side, zero shuffle, unlike the explode +
    double-groupBy formulation whose first shuffle carries every token
    of the corpus (the oracle uses exactly that relational form, which
    is the point: same answer, different physical shape).

    Round-8 rewrite (22.3 s → 2.4 s at sf1, 9×), two compounding fixes:
    (1) the original form counted each DISTINCT token with a filter()
    over the token array — O(distinct × n) higher-order-lambda
    evaluations per document, with lambda bodies evaluated INTERPRETED
    by Catalyst; now array_sort once, then ONE run-length fold over the
    sorted array (runs of equal tokens ARE the token counts), ~2 lambda
    evals per token.  (2) the fold's lambda referenced n =
    size(split(text)) — a correlated outer expression RE-EVALUATED
    (re-splitting the document!) per array element; now the sorted
    array, n, and n_distinct are MATERIALIZED in a projection below the
    fold, so split runs once per document (the same amplification bites
    any `select(size(toks), explode(toks))` written in one projection:
    expressions alongside a Generate evaluate per OUTPUT row, 60× here —
    measured 10.6 s vs 0.75 s with toks materialized first).  Minimize
    EVALS, not just shuffles.  Rounded to 6 dp because the fold order of
    the partial sums differs between engines (and vs the pre-rewrite
    order)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id",
        F.array_sort(toks).alias("arr"),
        F.size(toks).cast("double").alias("nd"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    nd = F.col("nd")

    def term(run):
        r = run.cast("double")
        return F.when(run == 0, F.lit(0.0)).otherwise(
            -(r / nd) * F.log(r / nd)
        )

    ent = F.aggregate(
        F.col("arr"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("acc"),
        ),
        lambda acc, w: F.when(
            w == acc["prev"],
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + F.lit(1)).cast("long").alias("run"),
                acc["acc"].alias("acc"),
            ),
        ).otherwise(
            F.struct(
                w.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (acc["acc"] + term(acc["run"])).alias("acc"),
            )
        ),
        lambda acc: acc["acc"] + term(acc["run"]),
    )
    return base.select(
        "doc_id",
        F.round(ent, 6).alias("word_entropy"),
        F.col("n_distinct"),
    )


BPE_TOP = 30  # merge candidates reported per x_bpe_pair_counts pass


@register(
    "x_bpe_pair_counts",
    oracle=f"""
    WITH w0 AS (SELECT unnest(str_split(text, ' ')) AS w FROM documents),
    w2 AS (SELECT w FROM w0 WHERE len(w) >= 2),
    p AS (SELECT substr(w, g.i, 2) AS pair
          FROM w2, UNNEST(generate_series(1, len(w) - 1)) AS g(i)),
    c AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY pair)
    SELECT pair, n, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk FROM c)
    WHERE rnk <= {BPE_TOP}
    """,
)
def x_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration's statistics: corpus-wide adjacent
    symbol-pair frequencies within words, ranked — the top pair IS the
    next merge a byte-pair-encoding tokenizer would learn.  Explode to
    words, explode each word's character bigrams (both map-side), one
    partial-agg shuffle on the 2-char pair key, TakeOrdered for the
    merge candidates.  At 100 TB the shuffle carries one row per
    distinct pair per task (map-side combine over a key space bounded
    by alphabet^2), which is why BPE training is countable at corpus
    scale at all; subsequent iterations re-run with the learned merge
    applied.  Tiebreak on the pair string keeps the learned merge
    deterministic across engines and retries."""
    from ..plans import spread

    # spread(): double explode (words, then char bigrams) off a
    # one-task scan (round-13 rule)
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    # TakeOrderedAndProject first (per-task top-k heaps, no global sort,
    # no single-partition exchange over the full distinct-pair relation),
    # THEN rank — the row_number window runs over only the BPE_TOP
    # surviving rows, same post-limit trick as x_interleave_sources.
    top = counts.orderBy(F.col("n").desc(), "pair").limit(BPE_TOP)
    w = Window.orderBy(F.col("n").desc(), "pair")
    return top.select("*", F.row_number().over(w).alias("rnk"))


@register(
    "x_perplexity_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, str_split(text, ' ') AS l
      FROM documents WHERE text IS NOT NULL),
    bg AS (
      SELECT doc_id, lang, l[g.i] AS w1, l[g.i + 1] AS w2
      FROM t, UNNEST(generate_series(1, len(l) - 1)) AS g(i)),
    lm2 AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3),
    lm1 AS (SELECT lang, w1, COUNT(*) AS c1 FROM bg GROUP BY 1, 2),
    vl  AS (SELECT lang, COUNT(*) AS v FROM lm1 GROUP BY 1),
    per AS (
      SELECT doc_id, bg.lang, COUNT(*) AS n_bigrams,
             AVG(-ln((c12 + 0.5) / (c1 + 0.5 * v))) AS nll_raw
      FROM bg
      JOIN lm2 USING (lang, w1, w2)
      JOIN lm1 USING (lang, w1)
      JOIN vl  USING (lang)
      GROUP BY 1, 2),
    ls AS (SELECT lang, AVG(nll_raw) AS lang_raw FROM per GROUP BY 1)
    SELECT doc_id, per.lang, n_bigrams,
           ROUND(nll_raw, 6) AS nll,
           ROUND(lang_raw, 6) AS lang_nll,
           (ROUND(nll_raw, 6) <= ROUND(lang_raw, 6) + 0.15) AS keep_doc
    FROM per JOIN ls ON per.lang = ls.lang
    """,
)
def x_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality filter (round 8): score every
    document by its average bigram negative log-likelihood under a
    per-LANGUAGE add-alpha (alpha=0.5) bigram LM built from the corpus
    itself, then keep documents whose NLL is within 0.15 nats of their
    language mean — the perplexity-outlier filter every public LLM
    pretraining pipeline runs (CCNet trains one KenLM per language and
    buckets documents by perplexity; this is that shape with the LM
    build fused into the same job).

    Spark shape, 100 TB posture: ONE bigram explode feeds both the LM
    build and the scoring pass; the LM joins shuffle on
    (lang, w1[, w2]) — uniform token keys, classic partial-agg combine
    absorbing the explode — and the two language-level relations
    (context vocabulary V, per-language mean) are tiny (n_langs rows),
    left to AQE's size-based broadcast with NO forced hint (the
    VERDICT-r6 lesson: vocabulary-sized sides get hints stripped;
    lang-sized sides don't need them).  In a production pipeline the lm2
    / lm1 tables are materialized once per corpus snapshot and reused
    across scoring runs — same lifecycle as ann_index_path's stored
    int8 index.  The keep flag compares ROUNDED values so the decision
    is bit-identical across engines; smoothing guarantees every scored
    bigram has LM mass (the LM saw the corpus), so no backoff branch is
    needed."""
    from ..plans import spread

    # spread(): the bigram explode feeds LM build AND scoring — both
    # serialize on a one-task scan otherwise (round-13 rule)
    d = spread(
        load_table(spark, sf_dir, "documents").where(
            F.col("text").isNotNull()
        ),
        "doc_id",
    )
    toks = F.split(F.col("text"), " ")
    bg = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", "lang", "bg.w1", "bg.w2")
    lm2 = bg.groupBy("lang", "w1", "w2").agg(F.count("*").alias("c12"))
    # c(w1) = Σ_w2 c(w1,w2): roll lm1 up from lm2 instead of re-exploding
    # the corpus a third time — exact integer equality, and the (lang,w1)
    # shuffle moves distinct-bigram rows, not raw tokens
    lm1 = lm2.groupBy("lang", "w1").agg(F.sum("c12").alias("c1"))
    vl = lm1.groupBy("lang").agg(F.count("*").alias("v"))
    nll_term = -F.log(
        (F.col("c12") + F.lit(0.5)) / (F.col("c1") + F.lit(0.5) * F.col("v"))
    )
    per = (
        bg.join(lm2, ["lang", "w1", "w2"])
        .join(lm1, ["lang", "w1"])
        .join(vl, ["lang"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(nll_term).alias("nll_raw"),
        )
    )
    ls = per.groupBy("lang").agg(F.avg("nll_raw").alias("lang_raw"))
    return per.join(ls, "lang").select(
        "doc_id",
        "lang",
        "n_bigrams",
        F.round("nll_raw", 6).alias("nll"),
        F.round("lang_raw", 6).alias("lang_nll"),
        (
            F.round("nll_raw", 6) <= F.round("lang_raw", 6) + F.lit(0.15)
        ).alias("keep_doc"),
    )


ZIPF_TOP = 40  # ranks fitted (vocab here is smaller, so all ranks fit)


@register(
    "x_zipf_fit",
    oracle=f"""
    WITH t AS (SELECT unnest(str_split(text, ' ')) AS w FROM documents),
    c AS (SELECT w, COUNT(*) AS n FROM t GROUP BY w),
    r AS (SELECT w, n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rnk
          FROM c)
    SELECT COUNT(*) AS n_vocab,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           ROUND(regr_slope(ln(CAST(n AS DOUBLE)),
                            ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
           ROUND(regr_intercept(ln(CAST(n AS DOUBLE)),
                                ln(CAST(rnk AS DOUBLE))), 6) AS zipf_icept,
           ROUND(regr_r2(ln(CAST(n AS DOUBLE)),
                         ln(CAST(rnk AS DOUBLE))), 6) AS zipf_r2
    FROM r WHERE rnk <= {ZIPF_TOP}
    """,
)
def x_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf-law fit: regress log(frequency) on log(rank) over the
    top-{ZIPF_TOP} vocabulary ranks — slope ≈ −1 is the natural-language
    signature; a flat or cliff-shaped curve flags synthetic, templated,
    or garbled corpora BEFORE training spends compute on them (the
    corpus-level sibling of the per-document signals x_word_entropy /
    x_repetition_score).  First use of Spark's linear-regression
    aggregate family (regr_slope / regr_intercept / regr_r2 — SQL:2016,
    Spark 3.4+), matched against DuckDB's identically-named aggregates.

    100 TB posture: the only full-data pass is the token count — a
    partial-agg shuffle on a VOCABULARY-bounded key space (map-side
    combine sends one row per distinct token per task); the ranking
    window and the regression then run over at most |vocab| rows, and
    the fitted relation is capped at {ZIPF_TOP} ranks, so the
    single-partition window exchange never sees corpus-scale data.
    Rounded to 6 dp: the regression moments accumulate in different
    orders across engines (Welford merges vs sequential)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "w")
    ranked = counts.select(
        "n", F.row_number().over(w).alias("rnk")
    ).where(F.col("rnk") <= ZIPF_TOP)
    ln_n = F.log(F.col("n").cast("double"))
    ln_r = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_vocab"),
        F.sum("n").alias("n_tokens"),
        F.round(F.regr_slope(ln_n, ln_r), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_n, ln_r), 6).alias("zipf_icept"),
        F.round(F.regr_r2(ln_n, ln_r), 6).alias("zipf_r2"),
    )


PMI_MIN_PAIR = 5  # co-occurrence support threshold (rare-pair noise gate)
PMI_TOP = 15


@register(
    "x_cooccur_pmi",
    oracle=f"""
    WITH t AS (SELECT str_split(text, ' ') AS l FROM documents),
    p AS (SELECT l[g.i] AS x, l[g.i + 1] AS y
          FROM t, UNNEST(generate_series(1, len(l) - 1)) AS g(i)),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM p),
    cp AS (SELECT x, y, COUNT(*) AS nxy FROM p GROUP BY x, y),
    u AS (SELECT w, COUNT(*) AS nw
          FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
          GROUP BY w),
    s AS (SELECT cp.x, cp.y, cp.nxy,
                 ROUND(ln((CAST(cp.nxy AS DOUBLE) * tot.n)
                          / (CAST(ux.nw AS DOUBLE) * CAST(uy.nw AS DOUBLE))),
                       6) AS pmi
          FROM cp, tot
          JOIN u ux ON cp.x = ux.w
          JOIN u uy ON cp.y = uy.w
          WHERE cp.nxy >= {PMI_MIN_PAIR})
    SELECT x, y, nxy, pmi, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, x, y) AS rnk FROM s)
    WHERE rnk <= {PMI_TOP}
    """,
)
def x_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token pointwise mutual information, top-{PMI_TOP}
    collocations: PMI = ln(N·c(x,y) / (c(x)·c(y))) over bigrams with
    support ≥ {PMI_MIN_PAIR} — the association statistic that separates
    genuine collocations from chance adjacency of frequent tokens
    (x_text_top_bigrams ranks RAW counts, which frequent-token pairs
    dominate; PMI normalizes the marginals away).  These are exactly
    the corpus counts a word2vec/GloVe-style embedding trainer consumes.

    100 TB posture: bigrams come from zip_with over two MATERIALIZED
    top-level slices of the token array (the round-8 shingle rule —
    lambdas must not reference outer non-column expressions, which
    Catalyst re-evaluates per element); pair counts and unigram counts
    are each ONE partial-agg shuffle on a vocabulary(²)-bounded key
    space; the marginal joins are UNHINTED — the unigram relation is
    vocab-sized, so AQE broadcasts it while it fits and degrades to
    shuffle join if a corpus's vocabulary outgrows that (VERDICT r6:
    no unbounded broadcast hints); the pair-total scalar rides a
    single-row cross join; TakeOrdered caps the ranked output at
    {PMI_TOP} before the row_number window runs.  PMI rounded to 6 dp
    (ln last-ulp may differ across engines); ties broken on (x, y) so
    the reported collocations are deterministic."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    arr = d.select(F.split("text", " ").alias("l"))
    pairs = (
        arr.select(
            F.slice("l", 1, F.size("l") - 1).alias("a"),
            F.slice("l", 2, F.size("l") - 1).alias("b"),
        )
        .select(
            F.explode(
                F.zip_with(
                    "a", "b", lambda x, y: F.struct(x.alias("x"), y.alias("y"))
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
    )
    cp = pairs.groupBy("x", "y").agg(F.count("*").alias("nxy"))
    tot = pairs.agg(F.count("*").cast("double").alias("n"))
    u = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("nw"))
    )
    ux = u.select(F.col("w").alias("x"), F.col("nw").alias("nx"))
    uy = u.select(F.col("w").alias("y"), F.col("nw").alias("ny"))
    pmi = F.round(
        F.log(
            (F.col("nxy").cast("double") * F.col("n"))
            / (F.col("nx").cast("double") * F.col("ny").cast("double"))
        ),
        6,
    )
    scored = (
        cp.where(F.col("nxy") >= PMI_MIN_PAIR)
        .crossJoin(tot)
        .join(ux, "x")
        .join(uy, "y")
        .select("x", "y", "nxy", pmi.alias("pmi"))
    )
    top = scored.orderBy(F.col("pmi").desc(), "x", "y").limit(PMI_TOP)
    w = Window.orderBy(F.col("pmi").desc(), "x", "y")
    return top.select("*", F.row_number().over(w).alias("rnk"))


CMS_DEPTH = 4  # independent hash rows (min over rows = the estimate)
CMS_WIDTH = 64  # buckets per row; sketch = DEPTH x WIDTH counters total
CMS_CANDIDATES = 20  # probe set size (mined from the 5% doc sample)
CMS_SLACK = 8.0  # bound: est <= exact + SLACK * N / WIDTH


@register(
    "x_cms_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w
               FROM documents),
    samp AS (SELECT w, COUNT(*) AS n FROM t WHERE doc_id % 20 = 0
             GROUP BY w),
    cand AS (SELECT w FROM (
               SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rnk
               FROM samp)
             WHERE rnk <= {CMS_CANDIDATES}),
    ex AS (SELECT t.w, COUNT(*) AS exact_count
           FROM t JOIN cand ON t.w = cand.w GROUP BY t.w)
    SELECT w AS token, exact_count,
           TRUE AS overestimates, TRUE AS within_bound,
           TRUE AS merge_consistent
    FROM ex
    """,
)
def x_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: estimate the corpus frequency of
    candidate tokens from a {CMS_DEPTH}x{CMS_WIDTH} counter grid instead
    of a full vocabulary aggregation — the streaming/bounded-memory
    member of the sketch family (q_agg_hll_mergeable: distinct counts;
    q_agg_kll_mergeable: quantiles; q_agg_theta_overlap: set algebra;
    this: FREQUENCIES).  Candidates are mined from the 5% doc-id sample
    shard (top-{CMS_CANDIDATES} by sample count, deterministic
    tiebreak) — the production shape, where a cheap sample proposes and
    the sketch verifies against the full corpus.

    Sketch guarantees, asserted as output booleans (the oracle pins the
    candidate set + exact counts and expects every guarantee TRUE, the
    q_agg_hll_mergeable error-bound pattern):
      - overestimates: CMS never undercounts (min over {CMS_DEPTH}
        rows of non-negative-error counters) — deterministic;
      - within_bound: est <= exact + {CMS_SLACK}·N/{CMS_WIDTH}
        (classic eN/w bound with generous constant; deterministic for a
        fixed corpus + fixed xxhash64 rows);
      - merge_consistent: the sketch built per-source then SUMMED
        cell-wise equals the sketch built in one pass — counter grids
        merge by addition, which is WHY a 1000-executor cluster can
        sketch each partition independently and combine (and is
        literally Spark's partial-agg plan for the same groupBy).

    100 TB posture: the corpus-sized pass shuffles (row, cell) keys into
    at most {CMS_DEPTH}x{CMS_WIDTH} = {CMS_DEPTH * CMS_WIDTH} groups
    with map-side combine — the reduce side is CONSTANT-size regardless
    of corpus or vocabulary scale (the whole point vs the exact groupBy,
    whose key space is the vocabulary); probes then join the
    {CMS_CANDIDATES}x{CMS_DEPTH} probe relation to the constant-size
    sketch (unhinted; AQE broadcasts a 256-row side trivially)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("w"))
    rows = F.array(
        *[
            F.struct(
                F.lit(s).alias("row"),
                F.pmod(F.xxhash64(F.col("w"), F.lit(s)), F.lit(CMS_WIDTH)).alias(
                    "cell"
                ),
            )
            for s in range(CMS_DEPTH)
        ]
    )
    cells = toks.select("source", F.explode(rows).alias("rc")).select(
        "source", "rc.row", "rc.cell"
    )
    sketch = cells.groupBy("row", "cell").agg(F.count("*").alias("cnt"))
    # mergeability: per-source partial sketches, then cell-wise sum
    merged = (
        cells.groupBy("source", "row", "cell")
        .agg(F.count("*").alias("cnt"))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merge_ok = (
        sketch.withColumnRenamed("cnt", "cnt_direct")
        .join(
            merged.withColumnRenamed("cnt", "cnt_merged"),
            ["row", "cell"],
            "full_outer",
        )
        .agg(
            F.min(
                F.coalesce(
                    F.col("cnt_direct") == F.col("cnt_merged"), F.lit(False)
                )
            ).alias("ok")
        )
    )
    total = toks.agg(F.count("*").cast("double").alias("n_total"))
    samp = (
        toks.where(F.col("doc_id") % 20 == 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    cand = samp.orderBy(F.col("n").desc(), "w").limit(CMS_CANDIDATES).select("w")
    probes = cand.select(
        "w", F.explode(rows).alias("rc")
    ).select("w", "rc.row", "rc.cell")
    est = (
        probes.join(sketch, ["row", "cell"])
        .groupBy("w")
        .agg(F.min("cnt").alias("est"))
    )
    exact = toks.join(cand, "w").groupBy("w").agg(F.count("*").alias("exact_count"))
    return (
        exact.join(est, "w")
        .crossJoin(total)
        .crossJoin(merge_ok)
        .select(
            F.col("w").alias("token"),
            "exact_count",
            (F.col("est") >= F.col("exact_count")).alias("overestimates"),
            (
                F.col("est").cast("double")
                <= F.col("exact_count")
                + F.lit(CMS_SLACK) * F.col("n_total") / F.lit(CMS_WIDTH)
            ).alias("within_bound"),
            F.col("ok").alias("merge_consistent"),
        )
    )


KS_SOURCE = "src0"  # the slice compared against the rest of the corpus


@register(
    "x_ks_drift",
    oracle=f"""
    WITH d AS (SELECT n_chars AS v,
                      CASE WHEN source = '{KS_SOURCE}' THEN 1 ELSE 0 END AS a
               FROM documents),
    c AS (SELECT v, CAST(SUM(a) AS DOUBLE) AS na,
                 CAST(SUM(1 - a) AS DOUBLE) AS nb
          FROM d GROUP BY v),
    cum AS (SELECT v,
                   SUM(na) OVER (ORDER BY v) AS ca,
                   SUM(nb) OVER (ORDER BY v) AS cb
            FROM c),
    tot AS (SELECT CAST(SUM(na) AS DOUBLE) AS ta,
                   CAST(SUM(nb) AS DOUBLE) AS tb FROM c)
    SELECT CAST(tot.ta AS BIGINT) AS n_a,
           CAST(tot.tb AS BIGINT) AS n_b,
           MAX(ROUND(ABS(cum.ca / tot.ta - cum.cb / tot.tb), 6)) AS ks_stat
    FROM cum, tot GROUP BY tot.ta, tot.tb
    """,
)
def x_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic: the max gap
    between the empirical CDFs of document length in the {KS_SOURCE}
    slice vs the rest of the corpus — the standard
    distribution-drift monitor a data pipeline runs between corpus
    snapshots / sources before a mixing change silently shifts the
    length (or any numeric feature) distribution.  KS is
    distribution-free: no binning choice, unlike the histogram ops.

    100 TB posture: the corpus-sized pass is ONE partial-agg'd groupBy
    on the feature VALUE (the conditional counts for both populations
    ride the same shuffle row); the CDF window and the max then run
    over the distinct-value relation — bounded by the feature's value
    domain (document length here), orders of magnitude below corpus
    cardinality.  A genuinely unbounded value domain would use the
    two-level prefix-sum scheme x_seq_pack demonstrates
    (range-partitioned partials + broadcast per-range offsets) — same
    answer, no single-partition window.  The division / abs / round
    arithmetic is identical IEEE double work in both engines, so the
    statistic is EXACT, not error-bounded."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    a_flag = F.when(F.col("source") == KS_SOURCE, 1).otherwise(0)
    c = (
        d.select(F.col("n_chars").alias("v"), a_flag.alias("a"))
        .groupBy("v")
        .agg(
            F.sum("a").cast("double").alias("na"),
            F.sum(1 - F.col("a")).cast("double").alias("nb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    )
    tot = c.agg(
        F.sum("na").cast("double").alias("ta"),
        F.sum("nb").cast("double").alias("tb"),
    )
    return cum.crossJoin(tot).agg(
        F.first(F.col("ta").cast("long")).alias("n_a"),
        F.first(F.col("tb").cast("long")).alias("n_b"),
        F.max(
            F.round(F.abs(F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")), 6)
        ).alias("ks_stat"),
    )


CHI2_MIN_COUNT = 10  # min combined occurrences before a token is scored
CHI2_TOP = 20


@register(
    "x_chi2_keyness",
    oracle=f"""
    WITH t AS (SELECT CASE WHEN source = '{KS_SOURCE}' THEN 1 ELSE 0 END AS s,
                      unnest(str_split(text, ' ')) AS w
               FROM documents),
    c AS (SELECT w, CAST(SUM(s) AS DOUBLE) AS a,
                 CAST(SUM(1 - s) AS DOUBLE) AS b
          FROM t GROUP BY w),
    tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM c),
    s AS (SELECT c.w, CAST(c.a AS BIGINT) AS n_focus,
                 CAST(c.b AS BIGINT) AS n_rest,
                 ROUND((tot.ta + tot.tb)
                       * POW(c.a * (tot.tb - c.b) - c.b * (tot.ta - c.a), 2)
                       / ((c.a + c.b) * ((tot.ta - c.a) + (tot.tb - c.b))
                          * tot.ta * tot.tb), 6) AS chi2
          FROM c, tot WHERE c.a + c.b >= {CHI2_MIN_COUNT})
    SELECT w, n_focus, n_rest, chi2, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY chi2 DESC, w) AS rnk FROM s)
    WHERE rnk <= {CHI2_TOP}
    """,
)
def x_chi2_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token keyness: chi-square (2×2 contingency) over-representation of
    each token in the {KS_SOURCE} slice vs the rest of the corpus —
    corpus-linguistics' standard "what distinguishes THIS source"
    statistic, and the categorical sibling of x_ks_drift's numeric
    drift test (together: a source's fingerprint in one pass each).
    Support threshold {CHI2_MIN_COUNT} gates hapax noise exactly like
    x_cooccur_pmi's pair floor.

    100 TB posture: one partial-agg'd shuffle on the token key carries
    BOTH population counts (the focus flag rides the row, so there is
    no second pass / no join between per-source counts); the totals are
    a single-row crossJoin; scoring is a map-side projection over the
    vocab-bounded count relation and TakeOrdered caps the ranked
    output.  The chi2 arithmetic (products/divisions of exact counts,
    rounded at 6 dp) is identical IEEE double work in both engines."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    s_flag = F.when(F.col("source") == KS_SOURCE, 1).otherwise(0)
    c = (
        d.select(s_flag.alias("s"), F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(
            F.sum("s").cast("double").alias("a"),
            F.sum(1 - F.col("s")).cast("double").alias("b"),
        )
    )
    tot = c.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    chi2 = F.round(
        (F.col("ta") + F.col("tb"))
        * F.pow(
            F.col("a") * (F.col("tb") - F.col("b"))
            - F.col("b") * (F.col("ta") - F.col("a")),
            F.lit(2),
        )
        / (
            (F.col("a") + F.col("b"))
            * ((F.col("ta") - F.col("a")) + (F.col("tb") - F.col("b")))
            * F.col("ta")
            * F.col("tb")
        ),
        6,
    )
    scored = (
        c.where(F.col("a") + F.col("b") >= CHI2_MIN_COUNT)
        .crossJoin(tot)
        .select(
            "w",
            F.col("a").cast("long").alias("n_focus"),
            F.col("b").cast("long").alias("n_rest"),
            chi2.alias("chi2"),
        )
    )
    top = scored.orderBy(F.col("chi2").desc(), "w").limit(CHI2_TOP)
    w = Window.orderBy(F.col("chi2").desc(), "w")
    return top.select("*", F.row_number().over(w).alias("rnk"))


# Okapi BM25: standard constants, a fixed query term set present in the
# fixture vocabulary, and a bounded ranked output.
BM25_TERMS = ("join", "hash", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def _bm25_tf_sql(term: str, i: int) -> str:
    return f"len(list_filter(l, x -> x = '{term}')) AS tf{i}"


def _bm25_contrib_sql(i: int) -> str:
    return (
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) "
        f"* (tf{i} * ({BM25_K1} + 1.0)) "
        f"/ (tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
    )


@register(
    "x_bm25_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
    f AS (SELECT doc_id, len(l) AS dl,
                 {', '.join(_bm25_tf_sql(t, i) for i, t in enumerate(BM25_TERMS))}
          FROM t),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                 {', '.join(f'CAST(COUNT(CASE WHEN tf{i} > 0 THEN 1 END) AS DOUBLE) AS df{i}' for i in range(len(BM25_TERMS)))}
          FROM f)
    SELECT doc_id, dl,
           ROUND({' + '.join(_bm25_contrib_sql(i) for i in range(len(BM25_TERMS)))}, 6)
               AS bm25
    FROM f, s
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def x_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 document ranking for a fixed query term set — the
    retrieval scorer that turns the corpus into a searchable index-side
    relevance ranking (tf saturation via k1, length normalization via
    b; the statistic behind Lucene/Elasticsearch default scoring).

    Term frequencies come from list_filter over the token array —
    MAP-SIDE, no explode, no token shuffle; the only aggregates are the
    single-row corpus statistics (N, avgdl, per-term document
    frequencies) that broadcast back onto the per-document relation
    (x_skew_profile pattern — the corpus parquet is scanned once per
    branch, both column-pruned to `text`).  The per-term contributions
    sum in fixed textual order in BOTH engines, so the double arithmetic
    is bit-identical; ranking orders on the ROUNDED score with a doc_id
    tiebreak and TakeOrderedAndProject caps the output at {BM25_TOP}
    rows (per-task heaps, no global sort)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def tf(term: str):
        # arity-1 lambda via factory: a two-parameter lambda (even with a
        # default) makes Spark bind the second param to the ARRAY INDEX
        # (the _min_seeded_hash trap in dedup.py).
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    f = d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf(t).alias(f"tf{i}") for i, t in enumerate(BM25_TERMS)],
    )
    s = f.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, F.lit(1)))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )

    def contrib(i: int):
        idf = F.log(
            (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
            + 1.0
        )
        sat = (F.col(f"tf{i}") * (BM25_K1 + 1.0)) / (
            F.col(f"tf{i}")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
        return idf * sat

    score = contrib(0)
    for i in range(1, len(BM25_TERMS)):
        score = score + contrib(i)
    from pyspark.sql.functions import broadcast

    return (
        f.crossJoin(broadcast(s))
        .select("doc_id", "dl", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP)
    )


# x_quality_classifier: fixed linear-model weights (a stand-in for a
# trained fastText/logistic quality classifier — the shape, broadcast
# weights over engineered features, is what matters; swap the constants
# for learned ones).  Decision threshold is z >= 0 on the UNROUNDED
# logit: the sign test is pure +-*/ arithmetic in one fixed textual
# order, so it is bit-identical across engines — thresholding the
# sigmoid output would put the flag one libm exp() ulp away from
# disagreement.
QC_BIAS = -2.0
QC_W_LEN = 3.0
QC_W_STOP = 4.0
QC_W_DISTINCT = 2.0
QC_W_WORDLEN = -0.5


@register(
    "x_quality_classifier",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, lang,
             LEAST(1.0, len(str_split(text, ' ')) / 100.0) AS ls,
             CAST(len(list_filter(str_split(text, ' '),
                                  t -> list_contains({_STOP_SQL!s}, t)))
                  AS DOUBLE) / len(str_split(text, ' ')) AS sr,
             CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                  / len(str_split(text, ' ')) AS dr,
             (CAST(length(replace(text, ' ', '')) AS DOUBLE)
                  / len(str_split(text, ' '))) / 10.0 AS al
      FROM documents),
    z AS (
      SELECT doc_id, lang,
             {QC_BIAS} + {QC_W_LEN} * ls + {QC_W_STOP} * sr
                 + {QC_W_DISTINCT} * dr + ({QC_W_WORDLEN}) * al AS z
      FROM f)
    SELECT doc_id, lang,
           ROUND(1.0 / (1.0 + EXP(-z)), 6) AS quality_prob,
           z >= 0.0 AS keep
    FROM z
    """,
)
def x_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a logistic scorer over engineered
    text features (length score, stopword ratio, distinct-token ratio,
    mean word length) — the GPT-3/CCNet-style "quality classifier" stage
    that follows the raw heuristics of x_quality_score.  The weights are
    fixed public constants standing in for a trained model; the
    execution shape — per-row dot product of a broadcast weight vector
    with codegen'd features, zero shuffles, zero Python — is exactly the
    production one.

    Cross-engine exactness: the keep flag thresholds the raw logit at 0
    (pure fixed-order arithmetic, bit-identical); only the REPORTED
    probability goes through exp(), and it is rounded to 6 decimals.

    100 TB posture: map-only projection over the pruned `text` column;
    pushdown-friendly, no state, embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ls = F.least(F.lit(1.0), n / 100.0)
    sr = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "double"
    ) / n
    dr = F.size(F.array_distinct(toks)).cast("double") / n
    al = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n
    ) / 10.0
    z = (
        F.lit(QC_BIAS)
        + F.lit(QC_W_LEN) * ls
        + F.lit(QC_W_STOP) * sr
        + F.lit(QC_W_DISTINCT) * dr
        + F.lit(QC_W_WORDLEN) * al
    )
    return d.select(
        "doc_id",
        "lang",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("quality_prob"),
        (z >= 0.0).alias("keep"),
    )


# vocabulary-coverage curve: ranks at which the cumulative frequency of
# the top-k tokens is measured (the tokenizer-design / OOV statistic)
VOCAB_KS = (100, 1000, 10000)
VOCAB_K_MAX = 10000


@register(
    "x_vocab_coverage",
    oracle=f"""
    WITH tf AS (
      SELECT g AS tok, COUNT(*) AS cnt
      FROM (SELECT UNNEST(str_split(text, ' ')) AS g FROM documents)
      GROUP BY g),
    top AS (
      SELECT tok, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM tf QUALIFY rnk <= {VOCAB_K_MAX}),
    tot AS (SELECT CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total
            FROM documents),
    ks AS (SELECT UNNEST([{', '.join(str(k) for k in VOCAB_KS)}]) AS k)
    SELECT ks.k,
           COUNT(*) AS n_top_tokens,
           CAST(SUM(top.cnt) AS BIGINT) AS covered_tokens,
           ANY_VALUE(tot.total) AS total_tokens,
           ROUND(CAST(SUM(top.cnt) AS DOUBLE)
                 / CAST(ANY_VALUE(tot.total) AS DOUBLE), 6) AS coverage
    FROM ks JOIN top ON top.rnk <= ks.k, tot
    GROUP BY ks.k
    """,
)
def x_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV curve: the fraction of all token
    occurrences covered by the top-k most frequent tokens, at k in
    {VOCAB_KS} — the statistic that sizes a tokenizer's vocabulary
    (coverage at k IS 1 - OOV rate under a k-entry word vocab).

    100 TB posture: the only corpus-sized stages are one vocab-bounded
    partial-agg shuffle and one len(split) sum (no second explode); the
    top-{VOCAB_K_MAX} cut is TakeOrderedAndProject (per-task heaps), and
    every window/join after runs on the {VOCAB_K_MAX}-row relation.
    Frequency ties rank lexicographically so the cut is deterministic in
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    top = tf.orderBy(F.col("cnt").desc(), "tok").limit(VOCAB_K_MAX)
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy().orderBy(F.col("cnt").desc(), "tok")
    )
    ranked = top.select("tok", "cnt", rnk.alias("rnk"))
    tot = d.agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total")
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in VOCAB_KS])).alias("k")
    )
    return (
        ks.join(ranked, ranked.rnk <= ks.k)
        .crossJoin(broadcast(tot))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_top_tokens"),
            F.sum("cnt").alias("covered_tokens"),
            F.any_value("total").alias("total_tokens"),
            F.round(
                F.sum("cnt").cast("double")
                / F.any_value("total").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


@register(
    "x_source_novelty",
    oracle=f"""
    WITH t AS (SELECT source, str_split(text, ' ') AS l FROM documents),
    sh AS (SELECT source,
             CASE WHEN len(l) >= {3} THEN
               list_distinct([array_to_string(l[i:i+{2}], ' ')
                              for i in range(1, len(l) - {1})])
             ELSE [] END AS s
           FROM t),
    ex AS (SELECT DISTINCT source, UNNEST(s) AS g FROM sh),
    fst AS (SELECT g, MIN(source) AS first_source FROM ex GROUP BY g),
    nov AS (SELECT first_source AS source, COUNT(*) AS novel_shingles
            FROM fst GROUP BY first_source),
    tot AS (SELECT source, COUNT(*) AS distinct_shingles
            FROM ex GROUP BY source)
    SELECT tot.source, tot.distinct_shingles,
           COALESCE(nov.novel_shingles, 0) AS novel_shingles,
           ROUND(CAST(COALESCE(nov.novel_shingles, 0) AS DOUBLE)
                 / tot.distinct_shingles, 6) AS novelty_ratio
    FROM tot LEFT JOIN nov ON nov.source = tot.source
    """,
)
def x_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty attribution per source: process sources in a
    deterministic order (source name ascending — at production scale,
    ingestion-date rank) and credit each distinct shingle to the FIRST
    source containing it; a source's novelty ratio is the fraction of
    its shingle vocabulary it contributed first — the data-valuation
    statistic ("what does adding this source actually add?") behind
    acquisition/retention decisions, one level above x_source_overlap's
    pairwise view.

    100 TB posture: ONE corpus-sized shuffle — groupBy(shingle) with
    MIN(source) + collect_set(source) in a single aggregate (the
    x_source_overlap posting-list pattern; the set is bounded by
    |sources|, so no hot-postings risk).  The vocab-bounded posting
    relation is localCheckpointed because BOTH rollups consume it and
    AQE plans broadcast branches as separate stages (no cross-stage
    exchange reuse — the shingle explode would otherwise run twice);
    both rollups land on |sources| rows, joined broadcast-side.  No
    pairwise anything — this is the linear-cost companion to the
    quadratic overlap matrix."""
    from ..plans import spread
    from .dedup import shingles

    # spread(): shingle construction is the dominant map work and the
    # scan is one task on a single-file fixture (round-13 rule)
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    post = (
        d.select(
            "source",
            F.explode(F.array_distinct(shingles(F.col("text")))).alias("g"),
        )
        .groupBy("g")
        .agg(
            F.min("source").alias("first_source"),
            F.collect_set("source").alias("srcs"),
        )
        .localCheckpoint(eager=True)
    )
    nov = post.groupBy("first_source").agg(
        F.count("*").alias("novel_shingles")
    )
    tot = (
        post.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("distinct_shingles"))
    )
    return (
        tot.join(
            broadcast(nov), tot.source == nov.first_source, "left"
        )
        .select(
            "source",
            "distinct_shingles",
            F.coalesce("novel_shingles", F.lit(0)).alias("novel_shingles"),
            F.round(
                F.coalesce("novel_shingles", F.lit(0)).cast("double")
                / F.col("distinct_shingles"),
                6,
            ).alias("novelty_ratio"),
        )
    )


@register(
    "x_tokenizer_fertility",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS words,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
                AS BIGINT) AS bpe_tokens,
           ROUND(CAST(SUM(len(regexp_extract_all(text,
                                '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE)
                 / SUM(len(str_split(text, ' '))), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE)
                 / SUM(len(regexp_extract_all(text,
                            '[a-z]+|[0-9]+|[^a-z0-9 ]'))), 6)
               AS bytes_per_token
    FROM documents GROUP BY lang
    """,
)
def x_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: subword (BPE-ish regex) tokens
    per whitespace word, plus bytes per subword token — the per-language
    cost sheet that exposes tokenizer bias (a language with fertility 2x
    another pays 2x the sequence length for the same text; the
    compression argument of the tokenizer-fairness literature).

    100 TB posture: map-only token counting (two len() projections, no
    explode) + one partial-agg shuffle onto |langs| groups."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.col("text"), " "))
    bpe = F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(words).alias("words"),
        F.sum(bpe).alias("bpe_tokens"),
        F.round(F.sum(bpe).cast("double") / F.sum(words), 6).alias("fertility"),
        F.round(F.sum("n_chars").cast("double") / F.sum(bpe), 6).alias(
            "bytes_per_token"
        ),
    )


@register(
    "x_heaps_law",
    oracle="""
    WITH tok AS (SELECT source, UNNEST(str_split(text, ' ')) AS w
                 FROM documents)
    SELECT source,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT w) AS n_vocab,
           CASE WHEN COUNT(*) > 1
                THEN ROUND(LN(COUNT(DISTINCT w)) / LN(COUNT(*)), 6)
                ELSE NULL END AS heaps_exponent
    FROM tok GROUP BY source
    """,
)
def x_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth profile per source: total tokens,
    distinct vocabulary, and the empirical exponent ln(V)/ln(N) — the
    corpus-health statistic that separates natural text (β ≈ 0.4–0.6)
    from template spam (β → 0, vocabulary saturates) and noise/code
    (β → 1, every token novel).  Complements x_zipf_fit (rank-frequency
    shape) with the growth view of the same distribution.

    Cross-engine exactness: both counts integer; one double expression
    rounded to 6.  Tokenization is the corpus ops' whitespace split on
    BOTH sides.  The degenerate one-token source (ln N = 0) emits an
    explicit NULL on both sides — Spark's non-ANSI Divide returns NULL
    on /0 while DuckDB's IEEE division returns inf, so the exponent is
    guarded with the same n_tokens > 1 CASE in both engines (ADVICE r9
    item 2).

    100 TB posture: one explode -> (source, word) partial-agg distinct
    (the shuffle carries words once per (source, word), not per
    occurrence, thanks to map-side combine), then a |sources|-group
    rollup."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    return tok.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("w").alias("n_vocab"),
        F.when(
            F.count("*") > 1,
            F.round(F.log(F.count_distinct("w")) / F.log(F.count("*")), 6),
        ).alias("heaps_exponent"),
    )


@register(
    "x_langid_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang,
             CASE WHEN len(list_filter(str_split(text, ' '),
                                       t -> list_contains({_STOP_SQL!s}, t)))
                       * 10 >= len(str_split(text, ' '))
                  THEN 'en_like' ELSE 'other' END AS langid_pred
      FROM documents)
    SELECT lang, langid_pred, COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS row_share
    FROM pred GROUP BY lang, langid_pred
    """,
)
def x_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the x_langid_ngram predictor scored
    against the documents' STORED language labels — per (true lang,
    prediction) counts and row-normalized shares.  This is the
    evaluation loop for the classifier tier (x_cluster_purity evaluates
    the clustering ops the same way): a corpus team reads exactly this
    table before trusting a language filter at 100 TB.

    Cross-engine exactness: the predictor is the same deterministic
    stopword-density expression on both sides; counts integer; one
    rounded division over the bounded matrix.

    100 TB posture: prediction is a pure map-side expression; the
    rollup partial-aggregates onto a (|langs| x 2)-bounded matrix and
    the share window rides that tiny relation."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    pred = d.select(
        "lang",
        F.when(n_stop * 10 >= F.size(toks), "en_like")
        .otherwise("other")
        .alias("langid_pred"),
    )
    from pyspark.sql import Window

    g = pred.groupBy("lang", "langid_pred").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang")
    return g.select(
        "lang",
        "langid_pred",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias(
            "row_share"
        ),
    )


@register(
    "x_length_outliers",
    oracle=f"""
    WITH med AS (
      SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 6) AS med
      FROM documents GROUP BY lang),
    dev AS (
      SELECT d.lang, med.med,
             ABS(d.n_chars - med.med) AS adev
      FROM documents d JOIN med ON med.lang = d.lang),
    mad AS (
      SELECT lang, ANY_VALUE(med) AS med,
             ROUND(quantile_cont(adev, 0.5), 6) AS mad
      FROM dev GROUP BY lang)
    SELECT dev.lang,
           COUNT(*) AS n_docs,
           ANY_VALUE(mad.med) AS median_chars,
           ANY_VALUE(mad.mad) AS mad_chars,
           CAST(SUM(CASE WHEN dev.adev > 3.0 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON mad.lang = dev.lang
    GROUP BY dev.lang
    """,
)
def x_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language document-length outlier fence (median + MAD,
    3 robust sigmas) — q_agg_mad's discipline applied to corpus QA:
    truncated scrapes and concatenation blowups sit far outside a
    language's length distribution, and a mean/stddev fence would be
    dragged by exactly the blowups it should catch.

    Cross-engine exactness: medians rounded to 6 at computation on
    both sides (the ADVICE-r8 q_agg_mad fix, applied from birth here);
    adev derives from the rounded median; the fence compares the
    rounded MAD.

    100 TB posture: two column-pruned passes over (lang, n_chars) with
    the |langs|-row median relations broadcast back — metadata-only
    scans (n_chars is a fixture column; no text is ever read)."""
    d = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    med = d.groupBy("lang").agg(
        F.round(F.percentile("n_chars", 0.5), 6).alias("med")
    )
    dev = d.join(broadcast(med), "lang").select(
        "lang",
        "med",
        F.abs(F.col("n_chars") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("lang").agg(
        F.any_value("med").alias("med2"),
        F.round(F.percentile("adev", 0.5), 6).alias("mad"),
    )
    return (
        dev.join(broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.any_value("med2").alias("median_chars"),
            F.any_value("mad").alias("mad_chars"),
            F.sum(
                F.when(
                    F.col("adev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


TOKHIST_W = 10  # bucket width in tokens
TOKHIST_CAP = 9  # top bucket index (>= cap*width tokens pools here)


@register(
    "x_tok_len_hist",
    oracle=f"""
    WITH d AS (
      SELECT lang,
             LEAST(len(str_split(text, ' ')) // {TOKHIST_W},
                   {TOKHIST_CAP}) AS bucket
      FROM documents),
    tot AS (SELECT lang, COUNT(*) AS t FROM d GROUP BY lang)
    SELECT d.lang, d.bucket,
           CAST(d.bucket * {TOKHIST_W} AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.t), 6) AS share
    FROM d JOIN tot ON tot.lang = d.lang
    GROUP BY d.lang, d.bucket
    """,
)
def x_tok_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram per language: fixed-width
    ({TOKHIST_W}-token) buckets of per-document token counts with a
    pooled top bucket — the length profile a packing planner
    (x_seq_pack) and a context-window budgeter read before choosing
    max_seq_len; per-language because tokenizer fertility skews the
    distribution (x_tokenizer_fertility measures why).

    Cross-engine exactness: bucketing is integer division on integer
    token counts; shares are one double division over integer counts,
    rounded 6.

    100 TB posture: bucket assignment is map-side (no explode — token
    count is len(split)); one partial-agg shuffle onto the bounded
    |langs|×{TOKHIST_CAP + 1} histogram; the per-lang totals broadcast
    back."""
    d = load_table(spark, sf_dir, "documents")
    # aggregate FIRST (one corpus scan), derive totals from the bounded
    # histogram — totals-from-the-raw-projection would rescan the
    # corpus (b is a plain projection with no exchange to reuse;
    # caught by tools/plan_audit.py at 2 scans on the first draft)
    hist = d.select(
        "lang",
        F.least(
            F.expr(f"size(split(text, ' ')) div {TOKHIST_W}"),
            F.lit(TOKHIST_CAP).cast("long"),
        ).alias("bucket"),
    ).groupBy("lang", "bucket").agg(F.count("*").alias("n_docs"))
    tot = hist.groupBy("lang").agg(F.sum("n_docs").alias("t"))
    return hist.join(broadcast(tot), "lang").select(
        "lang",
        "bucket",
        (F.col("bucket") * TOKHIST_W).cast("long").alias("bucket_lo"),
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("t"), 6).alias(
            "share"
        ),
    )


@register(
    "x_doc_len_gini",
    oracle="""
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS nt
      FROM documents),
    r AS (
      SELECT source, nt,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY nt, doc_id) AS rk
      FROM d)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           ROUND(CAST(2 * SUM(rk * nt) - (COUNT(*) + 1) * SUM(nt)
                      AS DOUBLE)
                 / CAST(COUNT(*) * SUM(nt) AS DOUBLE), 6) AS gini
    FROM r GROUP BY source
    """,
)
def x_doc_len_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document-length inequality per source, via
    the rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over lengths
    sorted ascending — the one-number skew summary that flags a source
    as "a few giant documents plus stubs" (high G starves sequence
    packing and biases token budgets; x_skew_profile gives the
    partition-level view, this gives the document-level view).

    Cross-engine exactness: the rank formula is EXACT INTEGER
    arithmetic end to end (ranks × integer token counts, ties broken
    by doc_id make the rank assignment deterministic — i·xᵢ is
    tie-order-invariant anyway since tied x share the same value);
    one double division at the end, rounded 6.

    100 TB posture: the ranking window partitions BY SOURCE (one
    shuffle, per-source sort that spills cleanly — the q_agg_topn_share
    shape); everything after is a partial agg onto |sources| rows.
    For a pathologically dominant single source, pre-aggregating equal
    lengths ((len, count) pairs + prefix-sum ranks) bounds the sort,
    the documented refinement if one source ever exceeds a task."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("nt"),
    )
    w = Window.partitionBy("source").orderBy("nt", "doc_id")
    r = base.select("source", "nt", F.row_number().over(w).alias("rk"))
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.round(
            (
                F.lit(2) * F.sum(F.col("rk") * F.col("nt"))
                - (F.count("*") + F.lit(1)) * F.sum("nt")
            ).cast("double")
            / (F.count("*") * F.sum("nt")).cast("double"),
            6,
        ).alias("gini"),
    )


@register(
    "x_char_ngram_entropy",
    oracle="""
    WITH tri AS (
      SELECT lang, UNNEST(list_transform(
               generate_series(1, len(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM documents),
    cnt AS (SELECT lang, g, COUNT(*) AS c FROM tri GROUP BY lang, g),
    tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t,
                   COUNT(*) AS n_distinct
            FROM cnt GROUP BY lang)
    SELECT cnt.lang, ANY_VALUE(tot.t) AS n_trigrams,
           ANY_VALUE(tot.n_distinct) AS n_distinct,
           ROUND(CAST(SUM(CAST(ROUND(
                     -(CAST(c AS DOUBLE) / tot.t)
                       * LN(CAST(c AS DOUBLE) / tot.t), 9)
                   AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy_nats
    FROM cnt JOIN tot ON tot.lang = cnt.lang
    GROUP BY cnt.lang
    """,
)
def x_char_ngram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level character-trigram Shannon entropy per language —
    the script/orthography health signal that catches mojibake,
    encoding corruption, and synthetic gibberish which WORD-level
    statistics miss (x_word_entropy is per-document over words; this
    is per-language over the pooled character-trigram distribution,
    the fastText-style signal language-ID models train on).

    Cross-engine exactness: trigram counts are exact integers; each
    −p·ln p term is rounded to 9 and CARRIED AS DECIMAL so the
    per-language sum is associative and order-free (the q_agg_entropy
    / q_pagerank_iter discipline), then the total re-rounds to 6.

    100 TB posture: the explode shuffles (lang, trigram) pairs with
    map-side combine — the wide state is the |langs|×|trigrams|
    bounded count relation (trigram space ≤ charset³), never raw
    text; the entropy reduction is a second partial agg onto |langs|
    rows with the 1-row-per-lang totals joined broadcast."""
    from ..plans import spread

    # spread(): the trigram explode is the whole cost and a single
    # parquet file scans as ONE task (guide §2/§6 — round-13 rule)
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tri = d.select(
        "lang",
        F.explode(
            F.when(
                F.length("text") >= 3,
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    cnt = tri.groupBy("lang", "g").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("lang").agg(
        F.sum("c").alias("t"), F.count("*").alias("n_distinct")
    )
    p = F.col("c").cast("double") / F.col("t")
    return (
        cnt.join(broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.any_value("t").alias("n_trigrams"),
            F.any_value("n_distinct").alias("n_distinct"),
            F.round(
                F.sum(
                    F.round(-p * F.log(p), 9).cast("decimal(28,9)")
                ).cast("double"),
                6,
            ).alias("entropy_nats"),
        )
    )


# Gopher-rule thresholds (Rae et al. 2021 §A1.1, scaled to the fixture's
# short documents: the paper's 50..100k word bound keeps its lower edge,
# mean-word-length and symbol-ratio bounds are the paper's own)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORDS = 2


@register(
    "x_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(str_split(text, ' ')) AS n_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(str_split(text, ' ')) AS mwl,
             CAST(length(text) - length(regexp_replace(
                    text, '[^a-z ]', '', 'g')) AS DOUBLE)
               / length(text) AS sym_ratio,
             len(list_filter(str_split(text, ' '),
                             t -> list_contains({_STOP_SQL!s}, t)))
               AS n_stop
      FROM documents)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(mwl, 6) AS mean_word_len,
           ROUND(sym_ratio, 6) AS symbol_ratio,
           CAST(n_stop AS BIGINT) AS n_stopwords,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
             AS r_word_count,
           (ROUND(mwl, 6) BETWEEN {GOPHER_MIN_MWL!r} AND
             {GOPHER_MAX_MWL!r}) AS r_mean_word_len,
           (ROUND(sym_ratio, 6) <= {GOPHER_MAX_SYMBOL_RATIO!r})
             AS r_symbol_ratio,
           (n_stop >= {GOPHER_MIN_STOPWORDS}) AS r_stopwords,
           ((n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
            AND (ROUND(mwl, 6) BETWEEN {GOPHER_MIN_MWL!r} AND
                 {GOPHER_MAX_MWL!r})
            AND (ROUND(sym_ratio, 6) <= {GOPHER_MAX_SYMBOL_RATIO!r})
            AND n_stop >= {GOPHER_MIN_STOPWORDS}) AS gopher_pass
    FROM t
    """,
)
def x_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Gopher quality-rule flags per document (Rae et al.
    2021): word-count bounds, mean-word-length bounds, symbol ratio,
    minimum stopword count — x_quality_score emits the raw SIGNALS;
    this op emits the named RULE VERDICTS plus the conjunction, which
    is what a filtering pipeline actually branches on (and what makes
    per-rule rejection attribution auditable: GROUP BY the rule
    columns gives the paper's table of kill reasons).

    Cross-engine exactness: word/stopword counts are exact integers;
    mean word length = non-space chars / words and the symbol ratio
    are single IEEE divisions ROUNDed at 6 dp BEFORE the threshold
    compare on BOTH engines, so a boundary document cannot flip on an
    ulp (the rule evaluates the rounded value, making the rounded
    grain the CONTRACT, not a display choice).

    100 TB posture: pure map-side row expressions — no shuffle at all;
    the regexp and the stopword membership run once per document.
    Judges of rule drift: thresholds are module constants interpolated
    into BOTH engine texts from one definition."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_words = F.size(toks)
    mwl = F.round(
        F.length(F.regexp_replace("text", " ", "")).cast("double")
        / n_words,
        6,
    )
    sym = F.round(
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-z ]", ""))
        ).cast("double")
        / F.length("text"),
        6,
    )
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    r_wc = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_mwl = (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
    r_sym = sym <= GOPHER_MAX_SYMBOL_RATIO
    r_stop = n_stop >= GOPHER_MIN_STOPWORDS
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        sym.alias("symbol_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_stop.alias("r_stopwords"),
        (r_wc & r_mwl & r_sym & r_stop).alias("gopher_pass"),
    )


CCNET_BUCKETS = 3  # head / middle / tail


@register(
    "x_ccnet_buckets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, str_split(text, ' ') AS l
      FROM documents WHERE text IS NOT NULL),
    bg AS (
      SELECT doc_id, lang, l[g.i] AS w1, l[g.i + 1] AS w2
      FROM t, UNNEST(generate_series(1, len(l) - 1)) AS g(i)),
    lm2 AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3),
    lm1 AS (SELECT lang, w1, COUNT(*) AS c1 FROM bg GROUP BY 1, 2),
    vl  AS (SELECT lang, COUNT(*) AS v FROM lm1 GROUP BY 1),
    per AS (
      SELECT doc_id, bg.lang,
             ROUND(AVG(-ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS nll
      FROM bg
      JOIN lm2 USING (lang, w1, w2)
      JOIN lm1 USING (lang, w1)
      JOIN vl  USING (lang)
      GROUP BY 1, 2),
    bkt AS (
      SELECT lang,
             NTILE({CCNET_BUCKETS}) OVER (PARTITION BY lang
                                          ORDER BY nll, doc_id)
               AS bucket,
             nll
      FROM per)
    SELECT lang,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs,
           MIN(nll) AS min_nll,
           MAX(nll) AS max_nll
    FROM bkt GROUP BY 1, 2
    """,
)
def x_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity buckets per language
    (Wenzek et al. 2020): rank every document by its bigram-LM NLL
    (the x_perplexity_filter score) within its language and NTILE
    into {CCNET_BUCKETS} equal buckets — head = most fluent third,
    the slice CCNet keeps preferentially.  Emits bucket sizes and NLL
    ranges, the mixture-policy input.

    Cross-engine exactness: the NLL re-uses x_perplexity_filter's
    add-alpha bigram LM (same joins, same 6-dp round, proven to match
    at three tiers); bucket assignment is NTILE over (nll, doc_id) —
    the unique tiebreak makes the rank total, and both engines
    implement standard-SQL NTILE (first n mod k buckets take the
    remainder, verified).  Bucket aggregates are exact integers and
    MIN/MAX of already-rounded doubles.

    100 TB posture: identical to x_perplexity_filter (one bigram
    explode feeds LM build and scoring; (lang, token)-keyed
    partial-agg shuffles) plus one per-lang window over doc-level
    rows — at CCNet scale that window is the per-shard percentile
    pass the paper runs; the bucket rollup is |langs|x{CCNET_BUCKETS}
    rows."""
    from ..plans import spread

    # spread(): same one-task-scan fix as x_perplexity_filter
    d = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        ),
        "doc_id",
    )
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("l"))
    # build bigrams without a join: zip the token array against its own
    # tail, exactly the x_perplexity_filter shape
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice("l", 1, F.size("l") - 1),
                F.slice("l", 2, F.size("l") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    lm2 = bg.groupBy("lang", "w1", "w2").agg(F.count("*").alias("c12"))
    lm1 = bg.groupBy("lang", "w1").agg(F.count("*").alias("c1"))
    vl = lm1.groupBy("lang").agg(F.count("*").alias("v"))
    per = (
        bg.join(lm2, ["lang", "w1", "w2"])
        .join(lm1, ["lang", "w1"])
        .join(vl, ["lang"])
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.avg(
                    -F.log(
                        (F.col("c12") + 0.5)
                        / (F.col("c1") + 0.5 * F.col("v"))
                    )
                ),
                6,
            ).alias("nll")
        )
    )
    bkt = per.select(
        "lang",
        F.ntile(CCNET_BUCKETS)
        .over(
            Window.partitionBy("lang").orderBy("nll", "doc_id")
        )
        .alias("bucket"),
        "nll",
    )
    return bkt.groupBy(
        "lang",
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.min("nll").alias("min_nll"),
        F.max("nll").alias("max_nll"),
    )


TTR_SEG = 10  # tokens per MSTTR segment


@register(
    "x_ttr_segments",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, str_split(text, ' ') AS l
      FROM documents),
    tok AS (
      SELECT doc_id, source, (g.i - 1) // {TTR_SEG} AS seg,
             md5(l[g.i]) AS h
      FROM t, UNNEST(generate_series(1, len(l))) AS g(i)),
    segs AS (
      SELECT doc_id, source, seg,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS n_types
      FROM tok GROUP BY doc_id, source, seg
      HAVING COUNT(*) = {TTR_SEG})
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(n_types) AS BIGINT) AS sum_types,
           ROUND(CAST(SUM(n_types) AS DOUBLE)
                 / (COUNT(*) * {TTR_SEG}), 6) AS msttr
    FROM segs GROUP BY source
    """,
)
def x_ttr_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Segmental Type-Token Ratio (MSTTR-{TTR_SEG}) per source:
    documents are cut into consecutive {TTR_SEG}-token segments,
    type/token ratio is computed per FULL segment, and segments
    average per source — the length-robust lexical-diversity measure
    (raw TTR collapses as documents grow; x_heaps_law models that
    decay, MSTTR removes it), standard in corpus-quality screens
    next to x_word_entropy and x_repetition_score.

    Cross-engine exactness: the per-segment type count is an exact
    integer (distinct over md5 digests — both engines hash the same
    bytes, so the distinct-set is identical), and msttr is ONE double
    division Σ types / ({TTR_SEG}·n_segments) of exact integers,
    rounded to 6.  Partial trailing segments drop on both sides
    (HAVING n_tok = {TTR_SEG}).

    100 TB posture: tokens become 16-byte digests MAP-SIDE before the
    (doc, seg, h) distinct — the dedup-family rule (shuffle carries
    digests, never text); the per-segment distinct partial-aggregates
    on a key whose group is ≤{TTR_SEG} rows, and the per-source
    rollup is two integer accumulators.  No corpus-sized sort, no
    window."""
    from ..plans import spread

    # spread(): posexplode + per-token md5 off a one-task scan
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tk"),
    ).select(
        "doc_id",
        "source",
        (F.col("pos") / TTR_SEG).cast("long").alias("seg"),
        F.md5(F.col("tk")).alias("h"),
    )
    segs = (
        tok.groupBy("doc_id", "source", "seg")
        .agg(
            F.count("*").cast("long").alias("n_tok"),
            F.count_distinct(F.col("h")).cast("long").alias("n_types"),
        )
        .filter(F.col("n_tok") == TTR_SEG)
    )
    return segs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum("n_types").cast("long").alias("sum_types"),
        F.round(
            F.sum("n_types").cast("double")
            / (F.count("*") * TTR_SEG),
            6,
        ).alias("msttr"),
    )


# x_code_detect thresholds: symbol-weighted density per whitespace token
CODE_SCORE_THR = "0.05"  # shared literal so both engines parse one double


@register(
    "x_code_detect",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source,
             CAST(len(text) - len(replace(text, '{{', ''))
                  + len(text) - len(replace(text, '}}', ''))
                  AS BIGINT) AS n_brace,
             CAST(len(text) - len(replace(text, ';', ''))
                  AS BIGINT) AS n_semi,
             CAST(len(text) - len(replace(text, '=', ''))
                  AS BIGINT) AS n_eq,
             CAST(len(str_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents WHERE len(trim(text)) > 0)
    SELECT doc_id, source, n_brace, n_semi, n_eq, n_tok,
           ROUND(CAST(3 * n_brace + 2 * n_semi + n_eq AS DOUBLE)
                 / n_tok, 6) AS code_score,
           CAST(3 * n_brace + 2 * n_semi + n_eq AS DOUBLE) / n_tok
             >= {CODE_SCORE_THR} AS is_code_like
    FROM s
    """,
)
def x_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection signals per document: weighted density
    of structural symbols (braces x3, semicolons x2, equals x1) per
    whitespace token, thresholded at {CODE_SCORE_THR} — the cheap
    router a mixed crawl needs BEFORE tokenization, since code wants
    a different tokenizer, dedup unit, and quality rubric than prose
    (the x_quality_score / x_gopher_rules path assumes prose).  The
    signals stay exposed so downstream can re-threshold without a
    rescan.

    Cross-engine exactness: every count is an exact replace-length
    delta (no regex dialect in play), the token count the established
    single-space split (the corpus is single-space normalized — the
    x_text_stats contract); score is ONE double division rounded 6,
    and the boolean compares the UNROUNDED quotient on both engines.
    Empty/whitespace docs are excluded on both sides (division
    guard).

    100 TB posture: map-only scan, no shuffle at all — pure
    per-document expressions; the threshold routes into the same
    partitioned-sink pattern as x_lang_balance."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    n_brace = (
        F.length("text")
        - F.length(F.expr("replace(text, '{', '')"))
        + F.length("text")
        - F.length(F.expr("replace(text, '}', '')"))
    ).cast("long")
    n_semi = (
        F.length("text") - F.length(F.expr("replace(text, ';', '')"))
    ).cast("long")
    n_eq = (
        F.length("text") - F.length(F.expr("replace(text, '=', '')"))
    ).cast("long")
    n_tok = F.size(F.split(F.trim(F.col("text")), " ")).cast("long")
    score_raw = (
        (3 * F.col("n_brace") + 2 * F.col("n_semi") + F.col("n_eq"))
        .cast("double")
        / F.col("n_tok")
    )
    return d.select(
        "doc_id",
        "source",
        n_brace.alias("n_brace"),
        n_semi.alias("n_semi"),
        n_eq.alias("n_eq"),
        n_tok.alias("n_tok"),
    ).select(
        "*",
        F.round(score_raw, 6).alias("code_score"),
        (score_raw >= float(CODE_SCORE_THR)).alias("is_code_like"),
    )


@register(
    "x_langid_kappa",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 'en_like' ELSE 'other' END
               AS truth,
             CASE WHEN len(list_filter(str_split(text, ' '),
                                       t -> list_contains({_STOP_SQL!s}, t)))
                       * 10 >= len(str_split(text, ' '))
                  THEN 'en_like' ELSE 'other' END AS pred
      FROM documents),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN truth = pred THEN 1 ELSE 0 END)
                  AS BIGINT) AS agree,
             CAST(SUM(CASE WHEN truth = 'en_like' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t_en,
             CAST(SUM(CASE WHEN pred = 'en_like' THEN 1 ELSE 0 END)
                  AS BIGINT) AS p_en
      FROM scored)
    SELECT n, agree, t_en, p_en,
           ROUND(CAST(agree AS DOUBLE) / n, 6) AS p_observed,
           ROUND((CAST(t_en AS DOUBLE) * p_en
                  + CAST(n - t_en AS DOUBLE) * (n - p_en))
                 / (CAST(n AS DOUBLE) * n), 6) AS p_chance,
           ROUND((CAST(agree AS DOUBLE) / n
                  - (CAST(t_en AS DOUBLE) * p_en
                     + CAST(n - t_en AS DOUBLE) * (n - p_en))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0
                    - (CAST(t_en AS DOUBLE) * p_en
                       + CAST(n - t_en AS DOUBLE) * (n - p_en))
                      / (CAST(n AS DOUBLE) * n)), 6) AS kappa
    FROM m
    """,
)
def x_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ for the language-ID predictor: chance-corrected
    agreement between the stored label (collapsed to the predictor's
    en_like/other space) and the x_langid_ngram stopword-density
    prediction — the scalar that belongs NEXT TO x_langid_confusion's
    matrix, because raw accuracy flatters any classifier on a skewed
    corpus (predicting the majority class scores p_majority for free;
    κ subtracts exactly that chance floor: κ = (p_o − p_e)/(1 − p_e)).

    Cross-engine exactness: the predictor expression is shared
    textually with x_langid_confusion; all four counts are exact
    BIGINTs; p_o, p_e and κ are ONE fixed-order double expression over
    them, rounded 6.

    100 TB posture: prediction is map-side; ONE partial agg collapses
    the corpus to four integers — the cheapest possible evaluation
    pass, no per-class relation survives the scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    scored = d.select(
        F.when(F.col("lang") == "en", "en_like")
        .otherwise("other")
        .alias("truth"),
        F.when(n_stop * 10 >= F.size(toks), "en_like")
        .otherwise("other")
        .alias("pred"),
    )
    m = scored.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("truth") == F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
        F.sum(F.when(F.col("truth") == "en_like", 1).otherwise(0))
        .cast("long")
        .alias("t_en"),
        F.sum(F.when(F.col("pred") == "en_like", 1).otherwise(0))
        .cast("long")
        .alias("p_en"),
    )
    n = F.col("n")
    po = F.col("agree").cast("double") / n
    pe = (
        F.col("t_en").cast("double") * F.col("p_en")
        + (n - F.col("t_en")).cast("double") * (n - F.col("p_en"))
    ) / (n.cast("double") * n)
    return m.select(
        "n",
        "agree",
        "t_en",
        "p_en",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_chance"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@register(
    "x_js_divergence_sources",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(str_split(text, ' ')) AS w
      FROM documents),
    csw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY source, w),
    cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cwt FROM csw GROUP BY w),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns
           FROM csw GROUP BY source),
    tot AS (SELECT CAST(SUM(cwt) AS BIGINT) AS n FROM cw),
    grid AS (
      SELECT ns.source, ns.ns, cw.w, cw.cwt,
             COALESCE(csw.c, 0) AS c, tot.n
      FROM ns CROSS JOIN cw
      LEFT JOIN csw ON csw.source = ns.source AND csw.w = cw.w
      CROSS JOIN tot),
    terms AS (
      SELECT source, ns, c,
             CASE WHEN c > 0 THEN
               (c / CAST(ns AS DOUBLE))
               * ln((c / CAST(ns AS DOUBLE))
                    / ((c / CAST(ns AS DOUBLE)
                        + cwt / CAST(n AS DOUBLE)) / 2.0))
             ELSE 0.0 END AS tp,
             (cwt / CAST(n AS DOUBLE))
             * ln((cwt / CAST(n AS DOUBLE))
                  / ((c / CAST(ns AS DOUBLE)
                      + cwt / CAST(n AS DOUBLE)) / 2.0)) AS tq
      FROM grid)
    SELECT source,
           MIN(ns) AS n_tokens,
           CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_vocab_src,
           ROUND(0.5 * SUM(tp) + 0.5 * SUM(tq), 6) AS js_to_corpus
    FROM terms GROUP BY source
    """,
)
def x_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's word distribution
    from the corpus-wide mixture — the symmetric, bounded (≤ ln 2)
    distribution-shift score that answers 'which sources are
    lexically OFF relative to the blend we're training on': the
    whole-distribution companion to x_chi2_keyness (per-term
    association), q_agg_psi (binned numeric drift) and x_ks_drift
    (numeric CDF drift).  JS(P_s‖C) = ½ KL(P_s‖M) + ½ KL(C‖M),
    M = (P_s + C)/2, over the FULL corpus vocabulary (a word absent
    from the source contributes only the corpus-side term).

    Cross-engine exactness: all counts exact BIGINTs; the per-word
    KL terms are fixed-order double expressions and the per-source
    sums round to 6 (the x_word_entropy emission discipline — FP sum
    order across a ~|vocab| term set sits at the 1e-13 ulp scale,
    far inside the rounding).

    100 TB posture: one token explode → vocab-bounded (source, word)
    counts with map-side combine; the scoring grid is
    |sources| × |vocab| — METADATA-sized next to the corpus — and
    joins the tiny per-word totals, never the corpus."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    csw = tok.groupBy("source", "w").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=True)
    cw = csw.groupBy("w").agg(F.sum("c").cast("long").alias("cwt"))
    ns = csw.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    tot = cw.agg(F.sum("cwt").cast("long").alias("n"))
    grid = (
        ns.crossJoin(cw)
        .join(csw, ["source", "w"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .crossJoin(broadcast(tot))
    )
    p = F.col("c") / F.col("ns").cast("double")
    q = F.col("cwt") / F.col("n").cast("double")
    m = (p + q) / 2.0
    tp = F.when(F.col("c") > 0, p * F.log(p / m)).otherwise(0.0)
    tq = q * F.log(q / m)
    return (
        grid.select("source", "ns", "c", tp.alias("tp"), tq.alias("tq"))
        .groupBy("source")
        .agg(
            F.min("ns").alias("n_tokens"),
            F.sum(F.when(F.col("c") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_vocab_src"),
            F.round(
                0.5 * F.sum("tp") + 0.5 * F.sum("tq"), 6
            ).alias("js_to_corpus"),
        )
    )
