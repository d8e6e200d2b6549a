"""Scalar function families (SURVEY §2.2 'Scalar functions').

All built-in ``pyspark.sql.functions`` — JVM-side, inside whole-stage
codegen, no Python in the hot path. Cross-engine determinism notes:
- libm-backed functions (log/exp/pow) can differ in the last ulp between
  engines → rounded to 6 decimals;
- per-row +,-,*,/ and sqrt are IEEE-exact → compared raw;
- timestamps are projected as epoch seconds / date strings (§2.4.4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import dec, t
from .registry import query


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           trim(concat('  ', p_type, '  ')) AS type_trimmed,
           substring(p_name, 1, 5) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(length(p_name) AS INT) AS name_len,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
           regexp_replace(p_type, 'E', '3') AS type_l33t,
           lpad(p_brand, 12, '*') AS brand_padded
    FROM part
    """,
    tags=("fn", "string"),
)
def q_fn_string(spark, sf_dir):
    """upper/lower/trim/substring/concat/split/length/regexp_extract/
    regexp_replace/lpad."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("type_trimmed"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("int").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("int").alias("n_words"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "E", "3").alias("type_l33t"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(d) AS INT) AS yr,
           CAST(month(d) AS INT) AS mo,
           CAST(day(d) AS INT) AS dom,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', d) AS INT) AS days_since_95,
           CAST(d + INTERVAL 30 DAY AS DATE) AS d_plus_30,
           last_day(d) AS month_end
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
    """,
    tags=("fn", "date"),
)
def q_fn_date(spark, sf_dir):
    """year/month/day/date_trunc/datediff/date_add/last_day on o_orderdate."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    return o.select(
        "o_orderkey",
        F.year("d").cast("int").alias("yr"),
        F.month("d").cast("int").alias("mo"),
        F.dayofmonth("d").cast("int").alias("dom"),
        F.trunc("d", "month").alias("month_start"),
        F.datediff("d", F.lit("1995-01-01").cast("date")).cast("int").alias("days_since_95"),
        F.date_add("d", 30).alias("d_plus_30"),
        F.last_day("d").alias("month_end"),
    )


@query(
    "q_fn_timestamp",
    oracle="""
    SELECT event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_sec,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_bucket,
           CAST(hour(ts) AS INT) AS hr,
           CAST(minute(ts) AS INT) AS mi,
           CAST(epoch(TIMESTAMP '2024-01-15 12:30:00') AS BIGINT) AS parsed_epoch
    FROM events
    """,
    tags=("fn", "timestamp"),
)
def q_fn_timestamp(spark, sf_dir):
    """unix_timestamp (floor-to-second), hour bucketing via date_trunc,
    hour/minute extraction, to_timestamp parsing — all projected as epoch
    bigints per the ns-precision discipline (§2.4.4)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_sec"),
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_bucket"),
        F.hour("ts").cast("int").alias("hr"),
        F.minute("ts").cast("int").alias("mi"),
        F.unix_timestamp(F.to_timestamp(F.lit("2024-01-15 12:30:00"))).alias(
            "parsed_epoch"
        ),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           abs(l_discount - 0.05) AS disc_dev,
           l_quantity * l_quantity AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(exp(l_discount), 6) AS disc_exp,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
    tags=("fn", "math"),
)
def q_fn_math(spark, sf_dir):
    """floor/ceil/abs/pow/sqrt/log/exp/pmod/sign. Note Spark floor/ceil on
    double return bigint — DuckDB's return double, so the oracle relies on
    numeric (not type-tagged) comparison of integral values; ln/exp are
    rounded (libm ulp differences)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id, CAST(i AS INT) AS pos, CAST(embedding[i + 1] AS DOUBLE) AS val,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings, range(0, 8) r(i)
    WHERE vec_id < 50
    """,
    tags=("fn", "array"),
)
def q_fn_array(spark, sf_dir):
    """array slice + posexplode + size over the embedding column: unrolls
    the first 8 dimensions of each of the first 50 vectors. posexplode is
    the UDTF-shaped built-in (generator expression, stays in codegen)."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.posexplode(F.slice("embedding", 1, 8)),
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("col").cast("double").alias("val"),
        "dim",
    )


@query(
    "q_fn_map_struct",
    oracle="""
    SELECT n_nationkey AS a_val,
           n_regionkey AS b_val,
           CAST(2 AS INT) AS n_keys,
           'a,b' AS keys_joined,
           n_name AS struct_name,
           n_regionkey AS nested_rk
    FROM nation
    """,
    tags=("fn", "map_struct"),
)
def q_fn_map_struct(spark, sf_dir):
    """create_map / map_from_arrays / map_keys / element_at / struct /
    getField / nested struct access. The Spark side builds and destructures
    real map+struct values; the oracle states the expected scalar results
    directly (map internals are engine-specific, the semantics aren't)."""
    n = t(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")),
        F.array(F.col("n_nationkey"), F.col("n_regionkey")),
    )
    st = F.struct(
        F.col("n_name").alias("nm"),
        F.struct(F.col("n_regionkey").alias("rk")).alias("inner"),
    )
    return n.select(
        F.element_at(m, "a").alias("a_val"),
        F.element_at(m, "b").alias("b_val"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_joined"),
        st.getField("nm").alias("struct_name"),
        st.getField("inner").getField("rk").alias("nested_rk"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS VARCHAR) AS k_str,
           CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS INT) AS k_int,
           CASE WHEN k_parsed IS NULL THEN 0 ELSE 1 END AS parse_ok
    FROM (SELECT event_id, props,
                 TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed
          FROM events)
    """,
    tags=("fn", "json"),
)
def q_fn_json(spark, sf_dir):
    """get_json_object (path extract → string) + from_json (schema'd parse
    → typed struct) on events.props. Oracle cross-checks through DuckDB's
    JSON extension AND a regexp fallback so the comparison doesn't depend
    on either engine's JSON number formatting."""
    ev = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.when(parsed.getField("k").isNull(), 0).otherwise(1).alias("parse_ok"),
    )


@query(
    "q_fn_cast_decimal",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR)
             AS exact_revenue_str,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue_dbl,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_int_sum,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("fn", "cast"),
)
def q_fn_cast_decimal(spark, sf_dir):
    """Exact money aggregation through decimal(18,2) casts (SURVEY §2.4.1).
    The exact decimal sum is projected as a string so the comparison
    checks decimal semantics (scale-2 rendering) without depending on how
    decimals round-trip through each engine's pandas bridge."""
    li = t(spark, sf_dir, "lineitem")
    exact = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        exact.cast("string").alias("exact_revenue_str"),
        exact.cast("double").alias("revenue_dbl"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_int_sum"),
        F.count("*").alias("n"),
    )


@query(
    "q_fn_hash",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS h_md5,
           sha256(p_name) AS h_sha256,
           strlen(md5(p_name)) AS md5_len
    FROM part WHERE p_partkey <= 100
    """,
    tags=("fn", "hash"),
)
def q_fn_hash(spark, sf_dir):
    """Cryptographic hash family (md5 / sha-256): content-addressed ids
    and dedup fingerprints at scale; identical hex output in both
    engines."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
        F.length(F.md5("p_name")).cast("bigint").alias("md5_len"),
    )


@query(
    "q_fn_null_semantics",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_defaulted,
           (o_orderstatus IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'O')) AS nullsafe_eq,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open
    FROM orders WHERE o_orderkey <= 3000
    """,
    tags=("fn", "null"),
)
def q_fn_null_semantics(spark, sf_dir):
    """Null-handling semantics: nullif / coalesce / null-safe equality
    (Spark `eqNullSafe` ≡ SQL IS NOT DISTINCT FROM) / IS NULL — the
    three-valued-logic corners every engine must agree on."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("open")).alias("status_defaulted"),
        F.col("o_orderstatus").eqNullSafe(status_or_null).alias("nullsafe_eq"),
        status_or_null.isNull().alias("is_open"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_linenumber & 3 AS b_and,
           l_linenumber | 8 AS b_or,
           xor(l_linenumber, 5) AS b_xor,
           l_linenumber << 2 AS b_shl,
           l_linenumber >> 1 AS b_shr,
           ~l_linenumber AS b_not
    FROM lineitem WHERE l_orderkey <= 200
    """,
    tags=("fn", "bitwise"),
)
def q_fn_bitwise(spark, sf_dir):
    """Bitwise operator family (and/or/xor/shifts/not) — flag fields and
    bit-packed encodings; two's-complement semantics agree across
    engines."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    n = F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        n.bitwiseAND(F.lit(3)).alias("b_and"),
        n.bitwiseOR(F.lit(8)).alias("b_or"),
        n.bitwiseXOR(F.lit(5)).alias("b_xor"),
        F.shiftleft(n, 2).alias("b_shl"),
        F.shiftright(n, 1).alias("b_shr"),
        F.bitwise_not(n).alias("b_not"),
    )


@query(
    "q_fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(sin(l_quantity), 6) AS r_sin,
           ROUND(cos(l_quantity), 6) AS r_cos,
           ROUND(atan2(l_quantity, 10.0), 6) AS r_atan2,
           ROUND(degrees(atan(l_quantity)), 6) AS r_deg
    FROM lineitem WHERE l_orderkey <= 200
    """,
    tags=("fn", "trig"),
)
def q_fn_trig(spark, sf_dir):
    """Trigonometric family — both engines call libm; rounded to 6
    decimals to absorb any last-ulp platform difference (§2.4)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(q), 6).alias("r_sin"),
        F.round(F.cos(q), 6).alias("r_cos"),
        F.round(F.atan2(q, F.lit(10.0)), 6).alias("r_atan2"),
        F.round(F.degrees(F.atan(q)), 6).alias("r_deg"),
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT)
                      IS NOT NULL THEN 1 END) AS n_k,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS k_sum,
           MIN(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
    tags=("fn", "variant", "json"),
)
def q_fn_variant(spark, sf_dir):
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` turns the
    raw JSON string into the binary VARIANT type once at ingest, then
    every downstream extraction is ``variant_get`` on the pre-parsed
    value — at 100 TB this is the schema-on-read store-once/extract-many
    pattern (no per-query re-parse, and variant columns are shredded in
    parquet by recent writers). ``try_variant_get`` returns NULL on
    type/path misses instead of failing the job — the PERMISSIVE
    equivalent for point extraction. Results are projected back to plain
    BIGINT/INT aggregates so the oracle compares engine-neutral values
    (DuckDB reads the same JSON via its json extension)."""
    ev = t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(k).alias("n_k"),
        F.sum(k).cast("long").alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@query(
    "q_fn_try_safe",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(CASE WHEN l_quantity - 25 = 0 THEN 1 END) AS n_div_by_zero,
           ROUND(SUM(COALESCE(l_extendedprice / NULLIF(l_quantity - 25, 0), 0)), 2)
               AS sum_safe_ratio,
           COUNT(TRY_CAST(CASE WHEN l_linenumber % 3 = 0
                               THEN 'not-a-number'
                               ELSE CAST(l_linenumber AS VARCHAR) END AS INTEGER))
               AS n_parsed
    FROM lineitem
    GROUP BY 1
    """,
    tags=("fn", "try", "error-safe"),
)
def q_fn_try_safe(spark, sf_dir):
    """Error-safe expression surface (``try_divide`` / ``try_cast``):
    division by zero yields NULL instead of ANSI errors or ±Inf, and
    malformed casts yield NULL instead of failing the job — the
    semantics a 100 TB pipeline needs, where one bad row must not kill
    a stage. The oracle states the same algebra via NULLIF/TRY_CAST;
    NULL-safe aggregation (COUNT skips NULLs) then quantifies the bad
    rows — turning failures into a data-quality measure. The ratio sum
    stays a raw double rounded to 2dp: its ~1e-7 partition-order drift
    is 4 orders below the rounding step, while a per-term round→decimal
    chain double-rounds differently per engine at 4dp boundaries
    (measured: last-ulp hash mismatch)."""
    li = t(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)
    parse_src = F.when(F.col("l_linenumber") % 3 == 0, "not-a-number").otherwise(
        F.col("l_linenumber").cast("string")
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("l_quantity") - 25 == 0, 1)).alias("n_div_by_zero"),
        F.round(F.sum(F.coalesce(ratio, F.lit(0.0))), 2).alias("sum_safe_ratio"),
        F.count(parse_src.try_cast("int")).alias("n_parsed"),
    )


@query(
    "q_fn_collation",
    oracle="""
    WITH cased AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 2 = 0 THEN upper(s_name) ELSE s_name END
                   AS display_name
        FROM supplier
    )
    SELECT lower(display_name) AS name_key,
           COUNT(*) AS n_variants,
           MIN(s_suppkey) AS first_key
    FROM cased
    GROUP BY 1
    HAVING COUNT(*) >= 2
    """,
    tags=("fn", "collation", "case-insensitive"),
)
def q_fn_collation(spark, sf_dir):
    """Collation-aware grouping (Spark 4 ``collate``): case-insensitive
    semantics declared ON THE COLUMN (UTF8_LCASE) instead of smeared
    through lower() calls at every use site — grouping, joins, and
    comparisons on the collated column are case-insensitive by type.
    The fixture synthesizes mixed-case variants (even keys uppercased),
    groups them under one collated key, and projects the lower-cased
    form so the result is engine-neutral (DuckDB states the same
    semantics via lower()). Collation evaluates inside codegen — same
    one-shuffle aggregate plan as any groupBy."""
    s = t(spark, sf_dir, "supplier")
    display = F.when(
        F.col("s_suppkey") % 2 == 0, F.upper("s_name")
    ).otherwise(F.col("s_name"))
    cased = s.select("s_suppkey", display.alias("display_name"))
    return (
        cased.groupBy(
            F.lower(F.collate(F.col("display_name"), "UTF8_LCASE")).alias("name_key")
        )
        .agg(
            F.count("*").alias("n_variants"),
            F.min("s_suppkey").alias("first_key"),
        )
        .filter(F.col("n_variants") >= 2)
        .select(F.col("name_key").cast("string").alias("name_key"), "n_variants", "first_key")
    )


@query(
    "q_fn_xml",
    # Like q_scan_json_corrupt: the XML payload is a pure function of the
    # base table, so the oracle derives expected values straight from
    # orders without needing an XML parser in DuckDB.
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS price_cents
    FROM orders
    GROUP BY 1
    """,
    tags=("fn", "xml", "from_xml", "semi-structured"),
)
def q_fn_xml(spark, sf_dir):
    """XML ingest surface (``from_xml``, Spark 4): orders are rendered to
    XML documents (the shape B2B/EDI feeds arrive in), parsed back
    against an explicit schema, and aggregated from the PARSED struct —
    proving the round trip end-to-end. The parse is a codegen
    expression, so at 100 TB this is a map-only stage like any scalar
    projection; schema-on-read with an explicit schema (never inference)
    is the production contract, exactly as with the JSON/CSV scans. The
    oracle recomputes the aggregates from the base columns the XML was
    rendered from."""
    o = t(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<order><id>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</id><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><price>"),
        F.format_number(dec("o_totalprice"), 2),
        F.lit("</price></order>"),
    )
    rendered = o.select(xml.alias("payload"))
    parsed = rendered.select(
        F.expr(
            "from_xml(payload, 'id BIGINT, status STRING, price STRING')"
        ).alias("x")
    )
    return parsed.groupBy(F.col("x.status").alias("status")).agg(
        F.count("*").alias("n"),
        F.sum("x.id").alias("key_sum"),
        F.sum(
            (F.regexp_replace("x.price", ",", "").cast("decimal(18,2)") * 100).cast(
                "long"
            )
        ).alias("price_cents"),
    )


@query(
    "q_fn_url",
    # URLs are constructed from documents columns, so the oracle derives
    # the parsed parts from the same construction without a URL parser.
    oracle="""
    SELECT source || '.example.com' AS host,
           lang,
           COUNT(*) AS n_urls,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("fn", "url", "parse_url", "web"),
)
def q_fn_url(spark, sf_dir):
    """URL decomposition via the codegen ``parse_url`` expression
    (HOST / PATH / QUERY with a key) — the crawl-frontier primitive that
    q_text_url_canonical's regex pipeline builds on. URLs are rendered
    from document metadata (host from source, path from doc_id, lang as
    a query parameter), parsed back, and aggregated BY THE PARSED PARTS
    — the oracle recomputes from the source columns, so any parser
    disagreement (encoding, query extraction) breaks the hash. Pure
    map-side projection + one aggregate."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=crawler"),
    )
    parsed = d.select(
        F.col("doc_id"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang"),
    )
    return parsed.groupBy("host", "lang").agg(
        F.count("*").alias("n_urls"), F.sum("doc_id").alias("id_sum")
    )


@query(
    "q_fn_datetime_arith",
    oracle="""
    WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt FROM orders)
    SELECT o_orderkey, dt,
           CAST(dt + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(dt + INTERVAL '-1' MONTH AS DATE) AS minus_1m,
           last_day(dt) AS month_end,
           CAST(date_trunc('week', dt) AS DATE) AS week_start,
           dt + CAST((1 - isodow(dt) + 7) % 7
                     + CASE WHEN (1 - isodow(dt) + 7) % 7 = 0 THEN 7 ELSE 0 END
                     AS INTEGER) AS next_monday,
           CAST(quarter(dt) AS INT) AS qtr,
           CAST(dayofyear(dt) AS INT) AS doy
    FROM d
    """,
    tags=("functions", "datetime", "calendar"),
)
def q_fn_datetime_arith(spark, sf_dir):
    """Calendar-arithmetic function family — the month-boundary semantics
    that break naive date math: add_months CLAMPS to the last valid day
    (Jan 31 + 1m = Feb 29; Feb 29 + 12m = next Feb 28 — verified
    engine-identical against DuckDB's interval-month addition), last_day,
    ISO week truncation (Monday start in both engines), strictly-after
    next-Monday (expressed arithmetically in the oracle since DuckDB has
    no next_day), quarter, and day-of-year. Pure per-row codegen
    projection — completes the scalar datetime surface next to
    q_fn_date/q_fn_timestamp's extraction/epoch families."""
    o = t(spark, sf_dir, "orders")
    d = o.select("o_orderkey", F.col("o_orderdate").cast("date").alias("dt"))
    return d.select(
        "o_orderkey",
        "dt",
        F.add_months("dt", 3).alias("plus_3m"),
        F.add_months("dt", -1).alias("minus_1m"),
        F.last_day("dt").alias("month_end"),
        F.trunc("dt", "week").alias("week_start"),
        F.next_day("dt", "Mon").alias("next_monday"),
        F.quarter("dt").cast("int").alias("qtr"),
        F.dayofyear("dt").cast("int").alias("doy"),
    )


@query(
    "q_fn_sql_udf",
    # The SQL-language UDF bodies are pure SQL expressions, so the oracle
    # simply inlines them (same decimal discipline as q_tpch_q1: the
    # double product casts to DECIMAL(18,4) before summing).
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS gross_cents,
           CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         * 10000 AS BIGINT)) AS BIGINT) AS net_dmils,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("fn", "sql-udf", "create-function", "spark4"),
)
def q_fn_sql_udf(spark, sf_dir):
    """SQL-language user-defined functions (``CREATE FUNCTION ... RETURN
    <expr>``, the ANSI SQL-scalar-UDF surface Spark 4 ships): the user
    extends the engine with reusable scalar logic WITHOUT leaving the
    JVM — the function body is inlined into the plan by Catalyst at
    analysis time, so whole-stage codegen sees plain expressions (zero
    Python boundary, unlike a registered Python UDF). Exercised with two
    temp functions (exact-decimal cents conversion; net-of-discount
    tenth-mills following q_tpch_q1's decimal-cast discipline) applied
    in an aggregate over lineitem; the oracle inlines the same bodies,
    which is also what proves the engine really did inline rather than
    evaluate out-of-band.

    Scale shape: identical to writing the expressions by hand — one hash
    aggregate, codegen arithmetic; SQL UDFs add no per-row overhead."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION as_cents(x DECIMAL(18,2)) "
        "RETURNS BIGINT RETURN CAST(x * 100 AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_dmils(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(CAST(p * (1 - d) AS DECIMAL(18,4)) "
        "* 10000 AS BIGINT)"
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_sqludf_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               SUM(as_cents(CAST(l_extendedprice AS DECIMAL(18,2)))) AS gross_cents,
               SUM(net_dmils(l_extendedprice, l_discount)) AS net_dmils,
               COUNT(*) AS n_items
        FROM _sqludf_lineitem GROUP BY l_returnflag
        """
    )
