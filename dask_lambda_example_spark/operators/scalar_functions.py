"""Scalar function battery (SURVEY.md §2.B "Scalar functions").

Covers the pandas-accessor surface dask defers to (``.str``, ``.dt``,
numpy ufuncs, ``json.loads``-per-row, hashlib) with JVM-side
``pyspark.sql.functions`` — zero Python in the row path. The reference's
own scalar ops are tiny: ``json.loads(...)["count"]``
(``layer/python/dask_processing.py:18``), ``key.replace("%3D", "=")``
(``src/lambda_consumer.py:62``), ``hashlib.md5``
(``src/lambda_consumer.py:134``) — all covered here by built-ins.

Scale posture: every expression below stays inside whole-stage codegen;
these are the fast path by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query


@query(
    "fn_string_battery",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                              AS name_lc,
           upper(p_brand)                             AS brand_uc,
           length(p_name)                             AS name_len,
           substr(p_name, 1, 5)                       AS name_pre,
           concat(p_brand, ':', p_type)               AS brand_type,
           trim(p_name)                               AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0')      AS size_pad,
           replace(p_type, ' ', '_')                  AS type_us,
           contains(p_name, 'red')                    AS has_red,
           starts_with(p_type, 'STANDARD')            AS is_std,
           split_part(p_type, ' ', 1)                 AS type_head
    FROM part
    """,
)
def fn_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dask ``.str.*`` accessor surface → Spark string built-ins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("STANDARD").alias("is_std"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '[a-z]+', 0)                  AS first_word,
           regexp_replace(text, '\\s+', '_', 'g')             AS squashed,
           regexp_matches(text, 'join|merge')                 AS mentions_join
    FROM documents WHERE doc_id < 100
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / global replace / match (dask ``.str.extract``/
    ``.str.replace``/``.str.contains(regex)``)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
        F.regexp_replace("text", r"\s+", "_").alias("squashed"),
        F.col("text").rlike("join|merge").alias("mentions_join"),
    )


@query(
    "fn_datetime_battery",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                    AS y,
           month(o_orderdate)                                   AS m,
           day(o_orderdate)                                     AS d,
           isodow(o_orderdate)                                  AS dow_iso,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)  AS month_start,
           strftime(o_orderdate, '%Y-%m')                       AS ym,
           o_orderdate + INTERVAL 90 DAY                        AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dask ``.dt.*`` surface → Spark datetime built-ins. Spark
    ``weekday`` is Mon=0 → ``+1`` aligns with ISO dow (explicit because
    engines disagree on week-start; SURVEY.md §5 float/time discipline).
    Interval arithmetic ≡ reference ``end - timedelta(days=count)``
    (``layer/python/dask_processing.py:30``)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.weekday("o_orderdate") + 1).alias("dow_iso"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"),
                   F.lit("1995-01-01").cast("timestamp")).alias("days_since"),
    )


@query(
    "fn_math_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)           AS abs_d,
           CAST(floor(l_quantity) AS BIGINT)          AS qty_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_quantity), 6)                 AS qty_sqrt,
           round(exp(l_discount), 6)                  AS disc_exp,
           round(ln(l_extendedprice), 6)              AS price_ln,
           round(pow(l_tax + 1, 2), 6)                AS tax_sq,
           round(l_extendedprice % 97, 6)             AS price_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE)    AS disc_sign
    FROM lineitem WHERE l_orderkey < 300
    """,
)
def fn_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy-ufunc surface → JVM math built-ins (round(6) absorbs
    last-ulp libm differences between JVM and C implementations).

    Oracle-parity note: the SQL casts DuckDB's floor/ceil (DOUBLE) to
    BIGINT and sign (TINYINT) to DOUBLE to match Spark's return types —
    the driver's value hash distinguishes int64 23 from float64 23.0."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.round(F.col("l_extendedprice") % 97, 6).alias("price_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'low' END                         AS bucket,
           greatest(o_totalprice, 100000.0)            AS floor_100k,
           least(o_totalprice, 100000.0)               AS cap_100k,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, greatest/least, coalesce/nullif (dask
    ``mask``/``where``/``np.where``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low").alias("bucket"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floor_100k"),
        F.least("o_totalprice", F.lit(100000.0)).alias("cap_100k"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open"))
        .alias("status_x"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing')           AS missing
    FROM events
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row JSON field extraction — the reference's
    ``json.loads(...)["count"]`` (``layer/python/dask_processing.py:18``)
    as a vectorized expression, not Python."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@query(
    "fn_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def fn_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema (never inference at scale),
    then struct-field access + predicate on the parsed value."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k BIGINT"))
    return (
        parsed.filter(F.col("p.k") > 50)
        .select("event_id", F.col("p.k").alias("k"))
    )


@query(
    "fn_hash_battery",
    oracle="""
    SELECT c_custkey,
           md5(c_name)            AS name_md5,
           sha256(c_name)         AS name_sha256
    FROM customer
    """,
)
def fn_hash_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5/sha256 — the reference fingerprints its software env with
    md5 (``src/lambda_consumer.py:134``); same digest, column-at-a-time."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "fn_url_decode",
    oracle="""
    SELECT c_custkey,
           replace(concat('data/key%3D', c_name), '%3D', '=') AS decoded
    FROM customer
    """,
)
def fn_url_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's S3-key un-escaping ``key.replace("%3D", "=")``
    (``src/lambda_consumer.py:62``) as a vectorized expression."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.replace(F.concat(F.lit("data/key%3D"), F.col("c_name")),
                  F.lit("%3D"), F.lit("=")).alias("decoded"),
    )


@query(
    "fn_array_hof",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                               AS n_tokens,
           list_contains(string_split(text, ' '), 'join')             AS has_join,
           array_to_string(string_split(text, ' ')[1:3], ',')         AS first3,
           array_to_string(
             list_transform(string_split(text, ' ')[1:3], x -> upper(x)),
             ',')                                                     AS first3_uc,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        x -> length(x))) AS BIGINT) AS char_sum
    FROM documents WHERE doc_id < 50
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (Spark superset over dask's
    object-dtype lists): transform / slice / contains / aggregate —
    codegen-friendly, no UDF.

    Oracle-parity note: array-typed output columns are joined to strings
    on both sides (array_join / array_to_string) — the driver's value
    hasher factorizes via pandas and cannot hash list values."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "join").alias("has_join"),
        F.array_join(F.slice(toks, 1, 3), ",").alias("first3"),
        F.array_join(F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)),
                     ",").alias("first3_uc"),
        F.aggregate(F.transform(toks, lambda x: F.length(x)),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("char_sum"),
    )


@query(
    "fn_explode_unnest",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 20
    """,
)
def fn_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding explode/unnest (dask ``.explode()``)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select("doc_id",
                    F.explode(F.split(F.col("text"), " ")).alias("token"))


@query(
    "fn_struct_access",
    oracle="""
    SELECT event_id, user_id AS uid, round(value, 6) AS val
    FROM events WHERE event_type = 'purchase'
    """,
)
def fn_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (dask dict-in-object columns
    → typed StructType; fields project back to plain columns)."""
    e = load_table(spark, sf_dir, "events")
    s = e.select(
        "event_type",
        F.struct(F.col("event_id").alias("id"), F.col("user_id").alias("uid"),
                 F.col("value").alias("val")).alias("rec"))
    return (
        s.filter(F.col("event_type") == "purchase")
        .select(F.col("rec.id").alias("event_id"),
                F.col("rec.uid").alias("uid"),
                F.round(F.col("rec.val"), 6).alias("val"))
    )


@query(
    "fn_levenshtein",
    oracle="""
    SELECT s_suppkey, levenshtein(s_name, 'Supplier#1') AS dist
    FROM supplier
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (fuzzy-match primitive for text pipelines)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.levenshtein(F.col("s_name"), F.lit("Supplier#1")).alias("dist"),
    )


@query(
    "fn_bitwise_battery",
    oracle="""
    SELECT event_id,
           event_id & 255                AS band,
           event_id | 4096               AS bor,
           xor(event_id, 1365)           AS bxor,
           event_id << 3                 AS shl,
           event_id >> 2                 AS shr,
           CAST(~event_id AS BIGINT)     AS bnot
    FROM events WHERE event_id < 2000
    """,
)
def fn_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator battery (&, |, xor, shifts, complement) — exact
    integer ops, codegen'd."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    i = F.col("event_id")
    return e.select(
        "event_id",
        i.bitwiseAND(F.lit(255)).alias("band"),
        i.bitwiseOR(F.lit(4096)).alias("bor"),
        i.bitwiseXOR(F.lit(1365)).alias("bxor"),
        F.shiftleft(i, 3).alias("shl"),
        F.shiftright(i, 2).alias("shr"),
        F.bitwise_not(i).alias("bnot"),
    )


@query(
    "fn_trig_battery",
    oracle="""
    SELECT event_id,
           round(sin(value), 6)            AS s,
           round(cos(value), 6)            AS c,
           round(atan2(value, 2.0), 6)     AS a2,
           round(degrees(value), 6)        AS deg,
           round(radians(value), 6)        AS rad,
           round(tan(value), 6)            AS t,
           round(atan(value), 6)           AS at
    FROM events WHERE event_id < 2000
    """,
)
def fn_trig_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric battery — libm doubles agree across
    engines well inside the round-6 tolerance."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.sin(v), 6).alias("s"),
        F.round(F.cos(v), 6).alias("c"),
        F.round(F.atan2(v, F.lit(2.0)), 6).alias("a2"),
        F.round(F.degrees(v), 6).alias("deg"),
        F.round(F.radians(v), 6).alias("rad"),
        F.round(F.tan(v), 6).alias("t"),
        F.round(F.atan(v), 6).alias("at"),
    )


@query(
    "fn_variant_semistructured",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT)
             BETWEEN 40 AND 60 AS mid_band
    FROM events WHERE event_id % 20 = 0
    """,
)
def fn_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` once into a binary variant, then typed
    ``variant_get`` path extractions. Against schemaless 100 TB JSON
    this is the right storage/access shape — the variant encodes paths
    as a binary tree, so repeated path reads skip re-tokenizing the
    JSON text (vs ``get_json_object``, which re-parses per call), and
    at rest the shredded encoding keeps untouched fields unscanned.
    The output extracts to concrete types — the variant itself never
    leaves the plan (it has no stable cross-engine surface to hash)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.k", "bigint").between(40, 60)
        .alias("mid_band"),
    )


@query(
    "fn_datetime_parse",
    oracle="""
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S')                      AS ts_parsed,
           strptime(strftime(o_orderdate, '%d/%m/%Y'),
                    '%d/%m/%Y')                               AS d_parsed,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S') = o_orderdate        AS roundtrip_ok
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_datetime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→temporal PARSING (pandas/dask ``to_datetime``) — the
    other half of the strftime battery: format each timestamp to text
    and parse it back with ``to_timestamp``/``to_date`` pattern
    parsing, asserting the round-trip inline. Pure projection; the
    round-trip flag makes silent format/locale drift (the classic
    ingestion bug) a value-hash failure instead of a latent wrong
    answer."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    od = F.col("o_orderdate").cast("timestamp")
    full = F.date_format(od, "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        F.to_timestamp(full, "yyyy-MM-dd HH:mm:ss").alias("ts_parsed"),
        F.to_date(F.date_format(od, "dd/MM/yyyy"), "dd/MM/yyyy")
        .cast("timestamp").alias("d_parsed"),
        (F.to_timestamp(full, "yyyy-MM-dd HH:mm:ss") == od)
        .alias("roundtrip_ok"),
    )


@query(
    "fn_xml_extract",
    oracle="""
    WITH x AS (
        SELECT o_orderkey,
               '<o><k>' || o_orderkey || '</k><s>' || o_orderstatus ||
               '</s><p>' || o_orderpriority || '</p></o>' AS xml
        FROM orders WHERE o_orderkey % 50 = 0)
    SELECT o_orderkey, xml,
           CAST(regexp_extract(xml, '<k>(-?\\d+)</k>', 1) AS BIGINT) AS k,
           regexp_extract(xml, '<s>(.*?)</s>', 1) AS s,
           regexp_extract(xml, '<p>(.*?)</p>', 1) AS p
    FROM x
    """,
)
def fn_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion battery (Spark 4 ``from_xml``): build a
    deterministic XML document per sampled order, parse it back with a
    pinned struct schema, and extract typed fields. The parse happens
    JVM-side in one projection — no UDF. The oracle recovers the same
    fields with regexes (DuckDB has no XML type), which also documents
    the fallback for engines without native XML."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 50 == 0)
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey"),
        F.lit("</k><s>"), F.col("o_orderstatus"),
        F.lit("</s><p>"), F.col("o_orderpriority"),
        F.lit("</p></o>")).alias("xml")
    x = o.select("o_orderkey", xml)
    parsed = F.from_xml("xml", "k BIGINT, s STRING, p STRING")
    return x.select(
        "o_orderkey", "xml",
        parsed.getField("k").alias("k"),
        parsed.getField("s").alias("s"),
        parsed.getField("p").alias("p"))


@query(
    "fn_csv_parse",
    oracle="""
    WITH lines AS (
        SELECT o_orderkey,
               o_orderkey || ',' || o_orderstatus || ',' ||
               o_orderpriority AS line
        FROM orders WHERE o_orderkey % 100 = 0)
    SELECT o_orderkey, line,
           CAST(string_split(line, ',')[1] AS BIGINT) AS k,
           string_split(line, ',')[2] AS s,
           string_split(line, ',')[3] AS p
    FROM lines
    """,
)
def fn_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-CSV parsing (``from_csv``): a delimited payload column
    parsed against a pinned schema in one JVM projection — the typed
    sibling of ``split()`` for CSV-in-a-column ingest (log lines,
    legacy exports). The oracle recovers the fields positionally with
    string_split, documenting the fallback when a schema-aware parser
    isn't available."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 100 == 0)
    line = F.concat_ws(",", "o_orderkey", "o_orderstatus",
                       "o_orderpriority").alias("line")
    x = o.select("o_orderkey", line)
    parsed = F.from_csv("line", F.lit("k BIGINT, s STRING, p STRING"))
    return x.select(
        "o_orderkey", "line",
        parsed.getField("k").alias("k"),
        parsed.getField("s").alias("s"),
        parsed.getField("p").alias("p"))


@query(
    "fn_url_parse_battery",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://host' || (doc_id % 7) || '.example.com/path/'
               || doc_id || '?lang=' || lang || '&src=' || source AS url
        FROM documents WHERE doc_id % 20 = 0)
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)
def fn_url_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (``parse_url``): host / path / single query
    parameter extracted JVM-side in one projection — the feed-ingest
    companion to ``fn_url_decode`` (URLs are the join key of web-corpus
    dedup and domain-level curation policies). The oracle recovers the
    same parts with regexes, documenting the engine-portable fallback."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0)
    url = F.concat(
        F.lit("https://host"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/path/"), F.col("doc_id").cast("string"),
        F.lit("?lang="), F.col("lang"), F.lit("&src="),
        F.col("source")).alias("url")
    u = d.select("doc_id", url)
    return u.select(
        "doc_id", "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang"))
        .alias("lang_param"))


@query(
    "fn_try_cast_battery",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                    ELSE 'n/a' END AS int_str,
               CASE WHEN doc_id % 4 = 0 THEN doc_id || '.5'
                    ELSE '' END AS dbl_str,
               CASE WHEN doc_id % 5 = 0 THEN '2024-01-'
                    || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                    ELSE 'not-a-date' END AS date_str
        FROM documents WHERE doc_id % 2 = 0)
    SELECT doc_id,
           TRY_CAST(int_str AS BIGINT) AS as_int,
           TRY_CAST(dbl_str AS DOUBLE) AS as_dbl,
           CAST(TRY_CAST(date_str AS DATE) AS VARCHAR) AS as_date,
           TRY_CAST(int_str AS BIGINT) IS NULL AS int_malformed
    FROM raw
    """,
)
def fn_try_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-ingest casting (``try_cast``): malformed strings become
    NULL instead of failing the job — the ANSI-mode-safe way to ingest
    dirty columns (the reference's JSON payloads arrive untyped;
    Spark 4 runs ANSI-strict by default, where a plain CAST on one bad
    row kills the stage). Mixed well-formed/malformed int, double, and
    date strings, all derived deterministically; identical TRY_CAST
    semantics in the oracle."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0)
    raw = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string"))
        .otherwise(F.lit("n/a")).alias("int_str"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.col("doc_id").cast("string"), F.lit(".5")))
        .otherwise(F.lit("")).alias("dbl_str"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("2024-01-"),
                        F.lpad((1 + F.col("doc_id") % 28).cast("string"),
                               2, "0")))
        .otherwise(F.lit("not-a-date")).alias("date_str"))
    return raw.select(
        "doc_id",
        F.expr("TRY_CAST(int_str AS BIGINT)").alias("as_int"),
        F.expr("TRY_CAST(dbl_str AS DOUBLE)").alias("as_dbl"),
        F.expr("TRY_CAST(date_str AS DATE)").cast("string")
        .alias("as_date"),
        F.expr("TRY_CAST(int_str AS BIGINT)").isNull()
        .alias("int_malformed"))


MASK_SALT = "corpus-v1"


@query(
    "fn_data_masking",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey, o_custkey,
               lpad(CAST(o_custkey * 7919 % 10000000000000000 AS VARCHAR),
                    16, '0') AS account_no
        FROM orders WHERE o_orderkey % 25 = 0)
    SELECT o_orderkey,
           sha256('{MASK_SALT}' || CAST(o_custkey AS VARCHAR))
               AS cust_surrogate,
           repeat('*', 12) || substr(account_no, 13, 4) AS account_masked,
           substr(account_no, 13, 4) AS account_last4
    FROM src
    """,
)
def fn_data_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-engineering masking battery: (1) salted-hash surrogate
    keys — joinable pseudonyms that survive across tables without
    exposing the raw key (the tokenization every shared corpus cut
    applies to user identifiers); (2) format-preserving partial
    masking (last-4 rule) of an account-number-shaped string. Both are
    pure projections; the salt is a pipeline constant, never a per-row
    secret. Complements ``text_pii_scrub`` (free-text redaction) with
    the structured-column half of the PII story."""
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 25 == 0))
    account = F.lpad(
        (F.col("o_custkey") * 7919 % F.lit(10_000_000_000_000_000))
        .cast("string"), 16, "0")
    src = o.select("o_orderkey", "o_custkey", account.alias("account_no"))
    return src.select(
        "o_orderkey",
        F.sha2(F.concat(F.lit(MASK_SALT),
                        F.col("o_custkey").cast("string")), 256)
        .alias("cust_surrogate"),
        F.concat(F.lit("*" * 12), F.substring("account_no", 13, 4))
        .alias("account_masked"),
        F.substring("account_no", 13, 4).alias("account_last4"))
