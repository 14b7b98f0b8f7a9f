"""Scalar-function surface (SURVEY.md §2.4 `q_fn_*`): string / datetime /
math / conditional / cast / array / map / json, each exercised as one
multi-function query with a DuckDB oracle.

The JSON tier is the heart of the reference's pipeline: the `FromJson` SMT
(config/kafka-connect-sse.properties:12-16) and `ExtractField` projection
become `get_json_object` / `from_json` here, JVM-side and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table
from ..registry import register


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 8) AS name8,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           length(p_name) AS name_len,
           trim('  ' || p_brand || ' ') AS brand_trim,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           replace(p_type, ' ', '_') AS type_us,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
           CASE WHEN p_type LIKE 'STANDARD%' THEN 1 ELSE 0 END AS is_std,
           CASE WHEN p_type LIKE '%STEEL' THEN 1 ELSE 0 END AS is_steel
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over `part`."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devowel"),
        F.when(F.col("p_type").startswith("STANDARD"), 1).otherwise(0).alias("is_std"),
        F.when(F.col("p_type").endswith("STEEL"), 1).otherwise(0).alias("is_steel"),
    )


@register(
    "q_fn_string2",
    oracle="""
    SELECT p_partkey,
           reverse(p_brand) AS brand_rev,
           repeat(substr(p_name, 1, 2), 3) AS rep2x3,
           strpos(p_name, 'a') AS a_pos,
           left(p_type, 4) AS type_l4,
           right(p_type, 4) AS type_r4,
           translate(p_brand, '#123456789', '-NNNNNNNNN') AS brand_masked,
           contains(p_name, 'ol') AS has_ol,
           split_part(p_type, ' ', 1) AS type_word1
    FROM part
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: reverse/repeat/locate/left/right/translate/
    contains/split_part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("rep2x3"),
        F.locate("a", F.col("p_name")).cast("long").alias("a_pos"),
        F.substring("p_type", 1, 4).alias("type_l4"),
        F.substring(F.col("p_type"), -4, 4).alias("type_r4"),
        F.translate("p_brand", "#123456789", "-NNNNNNNNN").alias("brand_masked"),
        F.contains("p_name", F.lit("ol")).alias("has_ol"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_word1"),
    )


@register(
    "q_fn_datetime2",
    oracle="""
    SELECT o_orderkey,
           last_day(o_orderdate)::DATE AS month_end,
           (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus3mo,
           CAST(EXTRACT(week FROM o_orderdate) AS INTEGER) AS wk,
           CAST(EXTRACT(isodow FROM o_orderdate) AS INTEGER) AS iso_dow,
           CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER) AS doy,
           make_date(CAST(EXTRACT(year FROM o_orderdate) AS INTEGER), 12, 31)
               AS year_end
    FROM orders
    """,
)
def q_fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second datetime battery: last_day/add_months/weekofyear/ISO
    day-of-week/day-of-year/make_date.  Day-of-week pinned to the ISO
    convention (Mon=1) — Spark's default dayofweek is Sun=1, DuckDB's is
    Sun=0; `weekday` in Spark is Mon=0, hence +1."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(od).alias("month_end"),
        F.add_months(od, 3).alias("plus3mo"),
        F.weekofyear(od).alias("wk"),
        (F.weekday(od) + 1).alias("iso_dow"),
        F.dayofyear(od).alias("doy"),
        F.make_date(F.year(od), F.lit(12), F.lit(31)).alias("year_end"),
    )


@register(
    "q_fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dom,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
               AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime battery over `orders` (ISO parsing/epoch mirror the reference
    payload's `meta.dt` ISO-8601 and `timestamp` epoch fields, FIXTURES §2)."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        od.cast("date").alias("od"),
        F.year(od).cast("long").alias("yr"),
        F.month(od).cast("long").alias("mo"),
        F.dayofmonth(od).cast("long").alias("dom"),
        F.quarter(od).cast("long").alias("qtr"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.date_add(od.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        F.date_format(od, "yyyy-MM").alias("ym"),
        F.unix_timestamp(od).alias("epoch_s"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS price_r2,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           ABS(o_totalprice - 100000.0) AS dist_100k,
           o_orderkey % 7 AS mod7,
           ROUND(LN(o_totalprice), 6) AS ln_price,
           ROUND(LOG10(o_totalprice), 6) AS log10_price,
           ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
           CAST(SIGN(o_totalprice - 100000.0) AS BIGINT) AS sign_v,
           CAST(POW(2, o_orderkey % 10) AS BIGINT) AS pow2
    FROM orders
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery; pow restricted to exact powers of two, transcendentals
    rounded to 6 (abs error across libm implementations ≪ rounding grain)."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        # grain 2 = the column's true precision (see q_project_computed note)
        F.round(tp, 2).alias("price_r2"),
        F.floor(tp).alias("price_floor"),
        F.ceil(tp).alias("price_ceil"),
        F.abs(tp - 100000.0).alias("dist_100k"),
        (F.col("o_orderkey") % 7).alias("mod7"),
        F.round(F.log(tp), 6).alias("ln_price"),
        F.round(F.log10(tp), 6).alias("log10_price"),
        F.round(F.sqrt(tp), 6).alias("sqrt_price"),
        F.signum(tp - 100000.0).cast("long").alias("sign_v"),
        F.pow(F.lit(2), F.col("o_orderkey") % 10).cast("long").alias("pow2"),
    )


@register(
    "q_fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS size_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_nv,
           LEAST(o_totalprice, 123456.78) AS capped,
           GREATEST(o_totalprice, 1000.0) AS floored,
           CASE WHEN o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
                THEN 1 ELSE 0 END AS urgent_done
    FROM orders
    """,
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / nullif+coalesce (nvl) / least / greatest."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp < 50000, "small")
        .when(tp < 150000, "medium")
        .otherwise("large")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_nv"
        ),
        F.least(tp, F.lit(123456.78)).alias("capped"),
        F.greatest(tp, F.lit(1000.0)).alias("floored"),
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"),
            1,
        )
        .otherwise(0)
        .alias("urgent_done"),
    )


@register(
    "q_fn_cast",
    oracle="""
    SELECT p_partkey,
           CAST(p_partkey AS VARCHAR) AS key_str,
           CAST(CAST(p_partkey AS VARCHAR) AS BIGINT) AS key_rt,
           TRY_CAST(p_type AS INTEGER) AS bad_int,
           TRY_CAST(substr(CAST(p_size AS VARCHAR), 1, 1) AS INTEGER) AS size_digit,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(p_size AS DOUBLE) AS size_d
    FROM part
    """,
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast / try_cast incl. failure→NULL (ANSI mode stays on; try_cast is
    the sanctioned lenient path)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_partkey").cast("string").alias("key_str"),
        F.col("p_partkey").cast("string").cast("long").alias("key_rt"),
        F.col("p_type").try_cast("int").alias("bad_int"),
        F.substring(F.col("p_size").cast("string"), 1, 1).try_cast("int").alias(
            "size_digit"
        ),
        # decimal cast exercised, double at the boundary (driver canon
        # renders DuckDB DECIMAL as float64 but Spark DECIMAL as Decimal)
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.col("p_size").cast("double").alias("size_d"),
    )


@register(
    "q_fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(CAST(doc_id AS VARCHAR) || ':' || source) AS key_md5
    FROM documents
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (content addressing for dedup/lineage);
    lowercase hex in both engines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
        ).alias("key_md5"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3
    FROM orders
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operations (the building blocks of the engine's own simhash/
    LSH operators, exposed as a query surface)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           len(str_split(text, ' ')) AS n_tokens,
           list_contains(str_split(text, ' '), 'spark') AS has_spark,
           array_to_string(
             list_sort(list_distinct(list_slice(str_split(text, ' '), 1, 5))),
             ',') AS first5_sorted,
           str_split(text, ' ')[1] AS first_tok,
           len(list_distinct(str_split(text, ' '))) AS n_distinct_tokens
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery over tokenized documents: size/contains/slice/distinct/
    sort/indexing.  The array result is emitted comma-joined (list cells
    are unhashable under the driver's pandas canon)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(
            F.sort_array(F.array_distinct(F.slice(toks, 1, 5))), ","
        ).alias("first5_sorted"),
        F.get(toks, 0).alias("first_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


@register(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           'type,uid' AS keys_sorted,
           event_type AS type_v,
           CAST(user_id AS VARCHAR) AS uid_v
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access; the map itself can't hash portably across
    engines, so the comparison surface is its sorted key list + extracted
    values (which fully pin create_map/map_keys/element_at semantics)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "type").alias("type_v"),
        F.element_at(m, "uid").alias("uid_v"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id, event_type,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 'hi' ELSE 'lo' END AS k_band
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the event payload — the reference's
    `FromJson`/`ExtractField` SMT tier (kafka-connect-sse.properties:9-16)
    as JVM-codegen'd expressions."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        "event_type",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
        F.when(k.cast("long") > 50, "hi").otherwise("lo").alias("k_band"),
    )


@register(
    "q_fn_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           event_type AS etype
    FROM events
    WHERE json_valid(props)
      AND json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def q_fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct + field access (schema-on-read, the
    Tier-B payload model of FIXTURES.md §2); invalid JSON rows drop out
    (PERMISSIVE null), mirroring the DLQ split predicate.  Both sides
    additionally require a non-null '$.k' so valid-JSON-without-k rows
    are treated identically (ADVICE r1)."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    j = F.from_json(F.col("props"), schema)
    return (
        e.withColumn("j", j)
        .filter(F.col("j").isNotNull() & F.col("j.k").isNotNull())
        .select(
            "event_id",
            F.col("j.k").alias("k_val"),
            F.col("event_type").alias("etype"),
        )
    )


@register(
    "q_fn_struct",
    oracle="""
    SELECT o_orderkey,
           struct_extract(struct_pack(v1 := o_orderstatus,
                                      v2 := o_totalprice), 'v1')
               AS st_status,
           struct_extract(struct_pack(v1 := o_orderstatus,
                                      v2 := o_totalprice), 'v2')
               AS st_price,
           struct_extract(
             struct_pack(status := o_orderstatus,
                         band := CASE WHEN o_totalprice > 100000
                                      THEN 'big' ELSE 'small' END),
             'band') AS named_band
    FROM orders
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field extraction (the nested-record surface
    of the reference's envelope payloads).  Struct columns themselves are
    unhashable under the driver canon, so the comparison surface is the
    extracted scalar fields — which fully pin struct/named_struct/
    getField semantics."""
    o = load_table(spark, sf_dir, "orders")
    anon = F.struct(
        F.col("o_orderstatus").alias("v1"), F.col("o_totalprice").alias("v2")
    )
    named = F.named_struct(
        F.lit("status"),
        F.col("o_orderstatus"),
        F.lit("band"),
        F.when(F.col("o_totalprice") > 100000, "big").otherwise("small"),
    )
    return o.select(
        "o_orderkey",
        anon.getField("v1").alias("st_status"),
        anon.getField("v2").alias("st_price"),
        named.getField("band").alias("named_band"),
    )


@register(
    "q_fn_string3",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS first_word,
           split_part(p_name, ' ', 2) AS second_word,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           rpad(p_brand, 12, '.') AS padded_brand,
           CAST(levenshtein(p_name, p_type) AS BIGINT) AS name_type_dist,
           contains(p_name, 'widget') AS has_widget,
           prefix(p_type, 'an') AS type_an,
           suffix(p_name, 'bolt') AS ends_bolt
    FROM part
    """,
)
def q_fn_string3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third string battery: tokenizing accessors (split_part), padding,
    edit distance, and containment predicates — all JVM codegen'd
    expressions, zero Python."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias(
            "first_word"
        ),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias(
            "second_word"
        ),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias(
            "padded_key"
        ),
        F.rpad("p_brand", 12, ".").alias("padded_brand"),
        F.levenshtein("p_name", "p_type").cast("long").alias(
            "name_type_dist"
        ),
        F.contains("p_name", F.lit("widget")).alias("has_widget"),
        F.startswith("p_type", F.lit("an")).alias("type_an"),
        F.endswith("p_name", F.lit("bolt")).alias("ends_bolt"),
    )


@register(
    "q_fn_higher_order",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS l
               FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           CAST(len(list_filter(l, x -> len(x) > 5)) AS BIGINT) AS n_long,
           CAST(list_aggregate(list_transform(l, x -> len(x)), 'sum')
                AS BIGINT) AS char_sum,
           CAST(list_aggregate(list_transform(l, x -> len(x)), 'max')
                AS BIGINT) AS max_len,
           len(list_filter(l, x -> contains(x, 'e'))) > 0 AS any_e,
           len(list_filter(l, x -> len(x) > 0)) = len(l) AS all_nonempty
    FROM t
    """,
)
def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate /
    exists / forall) — the lambda surface that keeps per-row collection
    logic inside JVM codegen instead of Python.  DuckDB has no
    exists/forall; the oracle states them as filtered-length predicates,
    which is their definition."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.col("text"), " ")
    lens = F.transform(toks, lambda x: F.length(x))
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5))
        .cast("long")
        .alias("n_long"),
        F.aggregate(lens, F.lit(0), lambda a, x: a + x)
        .cast("long")
        .alias("char_sum"),
        F.aggregate(
            lens, F.lit(0), lambda a, x: F.greatest(a, x)
        )
        .cast("long")
        .alias("max_len"),
        F.exists(toks, lambda x: x.contains("e")).alias("any_e"),
        F.forall(toks, lambda x: F.length(x) > 0).alias("all_nonempty"),
    )


@register(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
      FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing battery via Spark's dedicated parse_url (protocol /
    host / path / query / single query parameter) — the web-corpus
    metadata-extraction transform.  Deliberately checked against a
    DuckDB oracle that uses regexp instead (DuckDB has no parse_url):
    two entirely different implementations must produce byte-identical
    components, which pins parse_url's exact semantics rather than
    echoing them.  Pure codegen projection, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "q_fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(l_quantity AS DOUBLE) / (l_linenumber - 1) END
               AS qty_per_prev_line,
           CAST(l_extendedprice AS DOUBLE) / NULLIF(l_quantity, 0)
               AS unit_price,
           TRY_CAST(CASE WHEN l_quantity < 10 THEN 'not a number'
                         ELSE CAST(l_quantity AS VARCHAR) END AS DOUBLE)
               AS strict_qty
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q_fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic over dirty data: try_divide and try_to_number
    return NULL where strict evaluation would throw (division by zero,
    malformed numerics) — the ANSI-mode-compatible way to keep a 100 TB
    job from dying on one bad row.  The oracle expresses the same
    semantics with CASE/NULLIF/TRY_CAST, pinning that 'safe' means NULL,
    not 0 or skip."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_quantity").cast("double"), F.col("l_linenumber") - 1
        ).alias("qty_per_prev_line"),
        F.try_divide(
            F.col("l_extendedprice").cast("double"),
            F.nullif(F.col("l_quantity"), F.lit(0)),
        ).alias("unit_price"),
        F.when(F.col("l_quantity") < 10, F.lit("not a number"))
        .otherwise(F.col("l_quantity").cast("string"))
        .try_cast("double")
        .alias("strict_qty"),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(props::JSON ->> 'k' AS BIGINT) AS k,
           json_extract_string(props, '$.tag') AS tag,
           json_valid(props) AS is_valid
    FROM events
    WHERE event_id % 20 = 0
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: parse_json into the
    binary VARIANT encoding once, then variant_get typed extractions —
    the open-table-format answer to schema-on-read JSON (store VARIANT,
    extract late, no per-query string re-parsing).  At 100 TB this beats
    get_json_object precisely because the parse happens once at ingest
    and extractions are byte-offset lookups.  Oracle uses DuckDB's JSON
    operators — different engine, same typed answers.

    Extractions go through try_parse_json so a malformed props row
    degrades to NULL columns (like the oracle's JSON operators) instead
    of failing the query; is_valid is likewise NULL on NULL input to
    match DuckDB's json_valid(NULL) -> NULL."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    v = F.try_parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.tag", "string").alias("tag"),
        F.when(F.col("props").isNull(), F.lit(None).cast("boolean"))
        .otherwise(v.isNotNull())
        .alias("is_valid"),
    )


@register(
    "q_fn_xml",
    oracle="""
    SELECT event_id,
           '<ev id="' || event_id || '" type="' || event_type ||
           '"><user>' || user_id || '</user><value>' ||
           printf('%.3f', value) || '</value></ev>' AS xml_doc,
           event_id AS x_id,
           event_type AS x_type,
           user_id AS x_user,
           CAST(printf('%.3f', value) AS DOUBLE) AS x_value
    FROM events
    WHERE event_id % 25 = 0
    """,
)
def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML content-type tier (reference IMPROVEMENT_PLAN.md:65-68
    "Support for different content types (JSON, XML, etc.)" — declared,
    unimplemented there): build an XML envelope per event, then parse it
    back with Spark 4's native `from_xml` and extract typed fields —
    attributes (default `_` prefix) and child elements both.  JVM-side
    expression, codegen'd like the JSON tier; at 100 TB the parse happens
    once per row in the scan projection, no Python.  DuckDB has no XML
    reader, so the oracle rebuilds the document textually and derives the
    extracted fields from the base columns — EXACT because the round trip
    is lossless by construction.  The float element goes through %.3f on
    BOTH sides (Java format_string vs C printf agree on the fixture;
    exact-tie grids could diverge between the two runtimes — the grain is
    chosen so fixture values sit off-tie, same policy as FIXTURES.md §6's
    rounding rules)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    xml = F.concat(
        F.lit('<ev id="'),
        F.col("event_id"),
        F.lit('" type="'),
        F.col("event_type"),
        F.lit('"><user>'),
        F.col("user_id"),
        F.lit("</user><value>"),
        F.format_string("%.3f", F.col("value")),
        F.lit("</value></ev>"),
    )
    parsed = F.from_xml(
        xml, "struct<_id bigint, _type string, user bigint, value double>"
    )
    return e.select(
        "event_id",
        xml.alias("xml_doc"),
        parsed["_id"].alias("x_id"),
        parsed["_type"].alias("x_type"),
        parsed["user"].alias("x_user"),
        parsed["value"].alias("x_value"),
    )


@register(
    "q_fn_interval",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('week', ts) AS DATE) AS week_start,
           CAST(last_day(CAST(ts AS DATE)) AS DATE) AS month_end,
           quarter(ts) AS qtr,
           ((CAST(ts AS DATE) - DATE '2024-01-01') % 7 + 7) % 7 AS dow_mon0,
           CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
           (last_day(CAST(ts AS DATE))
            - CAST(date_trunc('month', ts) AS DATE) + 1) AS days_in_month
    FROM events
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar / interval arithmetic surface: week truncation, month
    end, quarter, month addition (end-of-month CLAMP parity with the
    oracle — Jan 31 + 1 month = Feb 29, verified both engines), and
    days-in-month.  Day-of-week is computed as days-since-a-known-Monday
    mod 7 — Spark's dayofweek (Sunday=1) and DuckDB's (Sunday=0)
    disagree, so the portable formula replaces both.  The modulo is
    PORTABLE on both sides: Spark F.pmod is always non-negative, and the
    oracle wraps DuckDB's sign-preserving % as ((x % 7 + 7) % 7), so
    timestamps BEFORE 2024-01-01 agree too (ADVICE r8 item 1 — parity no
    longer leans on the fixture's ts >= 2024-01-01 floor).

    All integer/date arithmetic — codegen'd map-only projection."""
    e = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return e.select(
        "event_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        F.last_day(d).alias("month_end"),
        F.quarter("ts").alias("qtr"),
        F.pmod(F.datediff(d, F.lit("2024-01-01").cast("date")), 7).alias(
            "dow_mon0"
        ),
        F.add_months(d, 2).alias("plus_2m"),
        (
            F.datediff(F.last_day(d), F.trunc(d, "month")) + 1
        ).alias("days_in_month"),
    )


@register(
    "q_fn_editdist",
    oracle="""
    WITH t AS (SELECT DISTINCT event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           levenshtein(a.event_type, b.event_type) AS edit_dist,
           ABS(len(a.event_type) - len(b.event_type)) AS len_diff,
           levenshtein(a.event_type, b.event_type)
             <= GREATEST(len(a.event_type), len(b.event_type)) // 2
               AS is_close
    FROM t a JOIN t b ON a.event_type < b.event_type
    """,
)
def q_fn_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance surface (Levenshtein) over the distinct event-type
    vocabulary, pairwise — the fuzzy-matching primitive behind schema
    reconciliation / typo-tolerant joins (at scale the same expression
    sits inside a band-filtered join, never all-pairs; the distinct
    relation here is |types|-bounded so the cross is metadata-sized).

    Cross-engine exactness: Levenshtein distance is a well-defined
    integer; the is_close band compares integers — Spark floors the
    quotient explicitly (F.floor), the oracle uses DuckDB's integer
    division `//` (plain `/` there is FLOAT division; ADVICE r9
    item 4 — the earlier `/ 2` only matched because an integer lev
    compared against 2.5 is equivalent to comparing against 2)."""
    e = load_table(spark, sf_dir, "events")
    t = e.select("event_type").distinct()
    a = t.select(F.col("event_type").alias("type_a"))
    b = t.select(F.col("event_type").alias("type_b"))
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.levenshtein("type_a", "type_b").alias("edit_dist"),
            F.abs(F.length("type_a") - F.length("type_b")).alias(
                "len_diff"
            ),
            (
                F.levenshtein("type_a", "type_b")
                <= F.floor(
                    F.greatest(F.length("type_a"), F.length("type_b")) / 2
                )
            ).alias("is_close"),
        )
    )
