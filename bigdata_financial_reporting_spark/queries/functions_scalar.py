"""Scalar function families (SURVEY.md §2B.7): string, date/time, math,
array, map, JSON, struct, hash.

Cross-engine notes (verified against DuckDB 1.0):
- Spark ``dayofweek`` is 1-based Sunday=1; DuckDB ``dayofweek`` is
  0-based Sunday=0 -> oracle adds 1.
- Spark ``F.log`` is natural log; DuckDB ``log`` is log10 -> ``ln``.
- Spark ``months_between`` uses the (31-day-denominator) SQL rule ->
  oracle reproduces the formula explicitly.
- Map value extraction returns a bare value in Spark but a list in
  DuckDB -> map outputs are serialized via map_keys/map_values strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_brand) AS lo,
           trim('  ' || p_name || ' ') AS trimmed,
           lpad(p_type, 12, '.') AS padded_l,
           rpad(p_type, 12, '.') AS padded_r,
           substring(p_name, 2, 5) AS sub,
           concat_ws('|', p_name, p_brand, p_type) AS joined,
           length(p_name) AS len,
           instr(p_name, 'widget') AS pos,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           levenshtein(p_name, 'large widget') AS lev,
           split_part(p_name, ' ', 1) AS first_word,
           reverse(p_brand) AS rev,
           repeat('ab', 3) AS rep,
           translate(p_name, 'aeiou', 'AEIOU') AS trans
    FROM part
    """,
    category="functions",
)
def fn_string(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.lpad("p_type", 12, ".").alias("padded_l"),
        F.rpad("p_type", 12, ".").alias("padded_r"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.concat_ws("|", "p_name", "p_brand", "p_type").alias("joined"),
        F.length("p_name").alias("len"),
        F.instr(F.col("p_name"), "widget").alias("pos"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("noun"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.levenshtein(F.col("p_name"), F.lit("large widget")).alias("lev"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse("p_brand").alias("rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.translate("p_name", "aeiou", "AEIOU").alias("trans"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS d,
           strftime(l_shipdate, '%Y/%m/%d') AS formatted,
           strftime(l_shipdate + INTERVAL 30 DAY, '%Y-%m-%d') AS d_plus30,
           round((year(l_shipdate) - 1995) * 12 + (month(l_shipdate) - 1)
             + (day(l_shipdate) - 1) / 31.0, 6) AS months_since,
           datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS days_since,
           strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS month_start,
           year(l_shipdate) AS y, month(l_shipdate) AS m,
           dayofweek(l_shipdate) + 1 AS dow,
           strftime(last_day(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS eom,
           CAST(epoch(l_shipdate) AS BIGINT) AS unix_ts,
           strftime(to_timestamp(epoch(l_shipdate)), '%Y-%m-%d %H:%M:%S') AS from_unix
    FROM lineitem
    """,
    category="functions",
)
def fn_date(spark, sf_dir):
    """Date family (generalizes reference R21 date reformatting).
    months_since replicates Spark's months_between(d, 1995-01-01) rule
    in the oracle (31-day fraction denominator). Integer outputs are
    cast to BIGINT and floats rounded to 6dp on BOTH sides so typed
    renderings hash identically in the driver's Arrow/pandas path
    (round-1 hash fail was int-vs-float divergence, not values)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format(F.to_date(d), "yyyy-MM-dd").alias("d"),
        F.date_format(d, "yyyy/MM/dd").alias("formatted"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("d_plus30"),
        F.round(
            F.months_between(d, F.lit("1995-01-01").cast("timestamp")), 6
        ).alias("months_since"),
        F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        F.unix_timestamp(d).alias("unix_ts"),
        F.from_unixtime(F.unix_timestamp(d), "yyyy-MM-dd HH:mm:ss").alias("from_unix"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS rounded,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           abs(l_extendedprice - 50000) AS dist,
           round(pow(l_quantity, 2), 6) AS qty_sq,
           round(sqrt(l_extendedprice), 6) AS root,
           round(exp(l_discount), 6) AS e_disc,
           round(ln(l_extendedprice + 1), 6) AS log_price,
           round(log10(l_extendedprice + 1), 6) AS log10_price,
           greatest(l_quantity, 25.0) AS hi,
           least(l_quantity, 25.0) AS lo,
           CAST(sign(l_extendedprice - 50000) AS BIGINT) AS sgn,
           CAST(l_orderkey % 7 AS BIGINT) AS pm
    FROM lineitem
    """,
    category="functions",
)
def fn_math(spark, sf_dir):
    """Math family. floor/ceil/sign are cast to BIGINT on BOTH sides
    (DuckDB returns DOUBLE/INT8 where Spark returns BIGINT/DOUBLE) so
    the driver's typed value hash matches."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("rounded"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.abs(F.col("l_extendedprice") - 50000).alias("dist"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("root"),
        F.round(F.exp("l_discount"), 6).alias("e_disc"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log10_price"),
        F.greatest("l_quantity", F.lit(25.0)).alias("hi"),
        F.least("l_quantity", F.lit(25.0)).alias("lo"),
        F.signum(F.col("l_extendedprice") - 50000).cast("long").alias("sgn"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("pm"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vec_sum,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS vec_sq_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vmax,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
           round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS smallest,
           len(list_distinct(embedding)) AS n_distinct,
           round(CAST(list_aggregate(list_slice(embedding, 1, 3), 'sum') AS DOUBLE), 6) AS head3_sum
    FROM embeddings
    """,
    category="functions",
)
def fn_array(spark, sf_dir):
    """Array + higher-order functions over the embedding column. Sums
    are accumulated in double on both sides (float32 accumulation would
    diverge)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    dbl_sum = F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double"))
    sq_sum = F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(dbl_sum, 4).alias("vec_sum"),
        F.round(sq_sum, 4).alias("vec_sq_sum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(v).cast("double"), 6).alias("vmax"),
        F.round(F.element_at(v, 1).cast("double"), 6).alias("first_el"),
        F.round(F.element_at(F.sort_array(v), 1).cast("double"), 6).alias("smallest"),
        F.size(F.array_distinct(v)).alias("n_distinct"),
        F.round(
            F.aggregate(F.slice(v, 1, 3), F.lit(0.0), lambda a, x: a + x.cast("double")),
            6,
        ).alias("head3_sum"),
    )


@register(
    "fn_array_explode",
    oracle="""
    SELECT vec_id, CAST(pos - 1 AS INT) AS pos, round(CAST(el AS DOUBLE), 6) AS el
    FROM (
      SELECT vec_id, unnest(embedding) AS el,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings WHERE vec_id < 20
    )
    """,
    category="functions",
)
def fn_array_explode(spark, sf_dir):
    """posexplode — table-generating array expansion."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "el")).select(
        "vec_id", "pos", F.round(F.col("el").cast("double"), 6).alias("el")
    )


@register(
    "fn_explode_outer",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS mention
    FROM (
      SELECT doc_id, regexp_extract_all(text, 'data[a-z]*') AS l
      FROM documents WHERE doc_id < 50
    )
    """,
    category="functions",
)
def fn_explode_outer(spark, sf_dir):
    """explode_outer — rows with EMPTY match arrays survive with a NULL
    element (plain explode would drop them). Oracle emulates the outer
    behavior with a [NULL] substitution."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.explode_outer(
            F.regexp_extract_all(F.col("text"), F.lit("data[a-z]*"), 0)
        ).alias("mention"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT n_nationkey,
           array_to_string(map_keys(MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}), ',') AS mkeys,
           array_to_string(map_values(MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}), ',') AS mvals
    FROM nation
    """,
    category="functions",
)
def fn_map(spark, sf_dir):
    """Map construction + key/value extraction, serialized to strings
    (DuckDB map element access returns a list, so direct element
    comparison is not portable)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.concat_ws(",", F.map_keys(m)).alias("mkeys"),
        F.concat_ws(",", F.map_values(m)).alias("mvals"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           to_json(struct_pack(id := event_id, t := event_type)) AS as_json
    FROM events
    """,
    category="functions",
)
def fn_json(spark, sf_dir):
    """JSON family on events.props (a JSON string column)."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", schema).getField("k").alias("k_int"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("t"))
        ).alias("as_json"),
    )


@register(
    "fn_decimal_money",
    oracle="""
    WITH agg AS (
      SELECT o_orderpriority,
             count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n, CAST(total_cents AS BIGINT) AS total_cents,
           CASE WHEN total_cents < 0 THEN '-' ELSE '' END
             || CAST(abs(total_cents) // 100 AS VARCHAR)
             || '.'
             || lpad(CAST(abs(total_cents) % 100 AS VARCHAR), 2, '0') AS total_usd
    FROM agg
    """,
    category="functions",
)
def fn_decimal_money(spark, sf_dir):
    """Exact money arithmetic: prices become integer cents before
    summation, so the total is exact regardless of row count or
    aggregation order — the posture for financial columns at 100 TB,
    where double accumulation drift scales with data volume. The USD
    rendering is exact integer math on sign + absolute value (integer
    division and modulo disagree between engines for negatives). The
    oracle casts the sum back to BIGINT: DuckDB sum(BIGINT) is HUGEINT,
    which the driver's Arrow/pandas hashing renders as float64."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("total_cents")
    )
    a = F.abs(F.col("total_cents"))
    return agg.select(
        "o_orderpriority",
        "n",
        "total_cents",
        F.concat(
            F.when(F.col("total_cents") < 0, "-").otherwise(""),
            (a / 100).cast("long").cast("string"),
            F.lit("."),
            F.lpad((a % 100).cast("string"), 2, "0"),
        ).alias("total_usd"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT s_suppkey,
           struct_pack(name := s_name, nation := s_nationkey).name AS nested_name,
           struct_pack(name := s_name, nation := s_nationkey).nation AS nested_nation
    FROM supplier
    """,
    category="functions",
)
def fn_struct(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    st = F.struct(F.col("s_name").alias("name"), F.col("s_nationkey").alias("nation"))
    return s.select(
        "s_suppkey",
        st.getField("name").alias("nested_name"),
        st.getField("nation").alias("nested_nation"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           sha256(text) AS text_sha256,
           md5(text) AS text_md5
    FROM documents
    """,
    category="functions",
)
def fn_hash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text")).alias("text_md5"),
    )


@register(
    "fn_nondeterministic_ids",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS mono_unique,
           TRUE AS uuid_unique,
           TRUE AS mono_nonneg,
           TRUE AS rand_in_unit,
           CAST(count(DISTINCT text) AS BIGINT) AS xx64_distinct
    FROM documents
    """,
    category="functions",
)
def fn_nondeterministic_ids(spark, sf_dir):
    """xxhash64 / monotonically_increasing_id / uuid / rand(seed) —
    the raw values have no cross-engine twin, so the driver-facing
    output is the INVARIANTS the functions guarantee (uniqueness,
    ranges, hash-distinctness mirroring text-distinctness), which ARE
    exactly checkable: the oracle computes the expected values and the
    comparison proves the invariants held. Raw-value determinism
    (xxhash64 stability across runs) stays in test_tolerance.py."""
    d = load_table(spark, sf_dir, "documents")
    ids = d.select(
        "text",
        F.xxhash64("text").alias("xx64"),
        F.monotonically_increasing_id().alias("mono_id"),
        F.expr("uuid()").alias("uid"),
        F.rand(seed=42).alias("r"),
    )
    n = F.count(F.lit(1))
    return ids.agg(
        n.cast("long").alias("n_rows"),
        (F.count_distinct("mono_id") == n).alias("mono_unique"),
        (F.count_distinct("uid") == n).alias("uuid_unique"),
        (F.min("mono_id") >= 0).alias("mono_nonneg"),
        ((F.min("r") >= 0.0) & (F.max("r") < 1.0)).alias("rand_in_unit"),
        F.count_distinct("xx64").alias("xx64_distinct"),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k,
           (json_extract(props, '$.missing') IS NULL) AS missing_is_null,
           CAST(props->>'$.k' AS INT) % 10 AS k_mod
    FROM events
    """,
    category="functions",
)
def fn_variant_json(spark, sf_dir):
    """VARIANT semi-structured access (Spark 4): parse_json lifts the
    raw JSON string into the binary VARIANT encoding once, then
    variant_get extracts typed paths WITHOUT re-parsing per access —
    at 100 TB this is the difference between one parse per row and one
    parse per get_json_object call. try_variant_get on an absent path
    yields NULL rather than an error, mirroring the oracle's
    json_extract."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "int")
    return v.select(
        "event_id",
        k.alias("k"),
        F.try_variant_get("v", "$.missing", "string").isNull().alias(
            "missing_is_null"
        ),
        (k % 10).alias("k_mod"),
    )


@register(
    "fn_collated_groupby",
    oracle="""
    SELECT lower(source) AS src, count(*) AS n,
           round(avg(n_chars), 6) AS avg_chars
    FROM (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
               AS source,
             n_chars
      FROM documents
    )
    GROUP BY lower(source)
    """,
    category="functions",
)
def fn_collated_groupby(spark, sf_dir):
    """Collation-aware grouping (Spark 4): half the source labels are
    uppercased, then the group-by runs under the UTF8_LCASE collation
    — the engine-level answer to case-insensitive keys that previously
    required wrapping every reference in lower(). The aggregation
    itself is collation-native (hash agg on collation-aware keys); the
    output key is normalised with lower() on both engines because the
    representative casing within a collated group is not defined."""
    d = load_table(spark, sf_dir, "documents")
    mixed = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("source"),
        "n_chars",
    )
    g = mixed.groupBy(
        F.collate(F.col("source"), "UTF8_LCASE").alias("src_collated")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )
    return g.select(
        F.lower(F.col("src_collated").cast("string")).alias("src"),
        "n",
        "avg_chars",
    )


@register(
    "fn_listagg_within_group",
    oracle="""
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources
    FROM documents
    GROUP BY lang
    """,
    category="functions",
)
def fn_listagg_within_group(spark, sf_dir):
    """ANSI LISTAGG ... WITHIN GROUP (Spark 4): ordered string
    aggregation as a first-class aggregate — the standard-SQL spelling
    of the collect_list+sort_array+concat_ws composition the registry
    already pins in agg_collect_sorted. DISTINCT + explicit ORDER BY
    makes the output deterministic on both engines."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("bdfr_docs_listagg")
    return spark.sql(
        """
        SELECT lang,
               listagg(DISTINCT source, ',') WITHIN GROUP (ORDER BY source)
                 AS sources
        FROM bdfr_docs_listagg
        GROUP BY lang
        """
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / nullif(l_discount, 0), 6) AS safe_div,
           CAST(NULL AS BIGINT) AS overflow_add,
           round(CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END, 6)
             AS safe_sqrt,
           CAST(trunc(l_extendedprice) AS BIGINT) AS to_long
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
    category="functions",
)
def fn_try_arithmetic(spark, sf_dir):
    """ANSI-safe arithmetic (try_* family): in ANSI mode (Spark 4's
    default) division by zero and numeric overflow RAISE — correct for
    a warehouse, fatal for a 100-TB batch job that dies at hour 9 on
    one bad row. try_divide/try_add return NULL on those rows instead,
    making error handling a data-quality column rather than a crashed
    stage. The overflow probe adds BIGINT-max to itself — NULL on
    every row, pinned by the oracle's typed NULL. Cross-engine gotcha
    pinned here: Spark's double→long cast TRUNCATES toward zero while
    DuckDB's rounds, so the oracle casts trunc()."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 1000
    )
    big = F.lit(9223372036854775807).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 6).alias(
            "safe_div"
        ),
        F.try_add(big, big).alias("overflow_add"),
        F.round(
            F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")), 6
        ).alias("safe_sqrt"),
        F.col("l_extendedprice").cast("long").alias("to_long"),
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc-'
               || doc_id || '?id=' || doc_id || '&lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id,
           'https' AS proto,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
    category="functions",
)
def fn_url_parse(spark, sf_dir):
    """URL component extraction (parse_url): protocol, host, path, and
    a named query parameter — the canonicalization primitives a
    web-corpus dedup runs before hashing. Spark's parse_url is a
    proper parser; the oracle re-derives the same components with
    regexes over the deterministically synthesized URLs. Map-only,
    zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?id="), F.col("doc_id").cast("string"),
        F.lit("&lang="), F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "fn_xml_xpath",
    oracle="""
    WITH x AS (
      SELECT doc_id,
             '<doc id="' || doc_id || '"><lang>' || lang || '</lang><chars>'
               || n_chars || '</chars><src>' || source || '</src></doc>' AS xml
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS lang_x,
           CAST(regexp_extract(xml, '<chars>([0-9]+)</chars>', 1) AS BIGINT)
             AS chars_x,
           regexp_extract(xml, 'id="([^"]*)"', 1) AS id_attr,
           regexp_extract(xml, '<src>([^<]*)</src>', 1) AS src_x
    FROM x
    """,
    category="functions",
)
def fn_xml_xpath(spark, sf_dir):
    """XPath extraction over XML payloads (xpath_string / xpath_long /
    attribute axis) — the legacy-feed ingestion surface: element text,
    numeric casts, and attribute access from a real XPath engine. The
    oracle re-derives each field with regexes over the same
    deterministic synthesis. Map-only, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit('<doc id="'), F.col("doc_id").cast("string"), F.lit('"><lang>'),
        F.col("lang"), F.lit("</lang><chars>"),
        F.col("n_chars").cast("string"), F.lit("</chars><src>"),
        F.col("source"), F.lit("</src></doc>"),
    )
    x = d.select("doc_id", xml.alias("xml"))
    return x.select(
        "doc_id",
        F.xpath_string("xml", F.lit("/doc/lang")).alias("lang_x"),
        F.xpath_long("xml", F.lit("/doc/chars")).alias("chars_x"),
        F.xpath_string("xml", F.lit("/doc/@id")).alias("id_attr"),
        F.xpath_string("xml", F.lit("/doc/src")).alias("src_x"),
    )


@register(
    "fn_higher_order_maps",
    oracle="""
    SELECT event_id,
           'A=' || round(value, 6) || ',B=' || round(value * 2, 6)
             AS upper_entries,
           'a=' || round(value * 10, 6) || ',b=' || round(value * 20, 6)
             AS scaled_entries,
           CASE WHEN value * 2 > 100 THEN
             CASE WHEN value > 100 THEN 'a,b' ELSE 'b' END
           ELSE CASE WHEN value > 100 THEN 'a' ELSE '' END
           END AS big_keys,
           round(value * 6, 6) AS zipped_sum
    FROM events
    WHERE event_id < 2000
    """,
    category="functions",
)
def fn_higher_order_maps(spark, sf_dir):
    """Higher-order MAP functions (transform_keys / transform_values /
    map_filter / map_zip_with) — the lambda surface over map columns
    that §2B.7's array row covers for lists. Outputs are serialized to
    sorted 'k=v' entry strings (maps are unordered and the driver
    canonicalizer rejects complex types); the oracle recomputes each
    transformed entry directly from the source column, so every lambda
    result is value-checked."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.create_map(
        F.lit("a"), F.col("value"), F.lit("b"), F.col("value") * 2
    )

    def entries(mp, key_fmt=lambda k: k):
        # sorted k=v serialization: keys here are constants 'a','b'
        ks = F.array_sort(F.map_keys(mp))
        return F.concat_ws(
            ",",
            F.transform(
                ks,
                lambda k: F.concat(
                    key_fmt(k), F.lit("="),
                    F.round(F.element_at(mp, k), 6).cast("string"),
                ),
            ),
        )

    upper_m = F.transform_keys(m, lambda k, v: F.upper(k))
    scaled_m = F.transform_values(m, lambda k, v: v * 10)
    big_m = F.map_filter(m, lambda k, v: v > 100)
    zipped = F.map_zip_with(m, m, lambda k, v1, v2: v1 + v2)
    return ev.select(
        "event_id",
        entries(upper_m).alias("upper_entries"),
        entries(scaled_m).alias("scaled_entries"),
        F.concat_ws(",", F.array_sort(F.map_keys(big_m))).alias("big_keys"),
        F.round(
            F.aggregate(
                F.map_values(zipped), F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("zipped_sum"),
    )


@register(
    "fn_regex_family",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS n_a_words,
           CAST(CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END
                AS BOOLEAN) AS has_spark,
           coalesce(regexp_extract(text, '([a-z]{6,})', 1), '') AS first_long,
           array_to_string(list_sort(list_distinct(
             regexp_extract_all(text, '[a-z]+a[a-z]*'))), ',') AS a_words,
           regexp_replace(text, '\\s+[a-z]\\s+', ' _ ', 'g') AS squashed
    FROM documents WHERE doc_id < 50
    """,
    category="functions",
)
def fn_regex_family(spark, sf_dir):
    """The modern regexp function family (Spark 3.4+): regexp_count,
    regexp_like, regexp_substr, regexp_extract_all, plus a global
    regexp_replace — all JVM-side codegen expressions (one compiled
    pattern per task, no Python). The extract_all result is sorted,
    deduped, and serialized to a scalar per the registry's
    no-complex-output rule. DuckDB's regexp dialect is POSIX-ish like
    Java's for this subset; the patterns avoid constructs the two
    engines disagree on (lazy quantifiers, lookaround)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"[a-z]+a[a-z]*")).cast("long").alias(
            "n_a_words"
        ),
        F.regexp_like(F.col("text"), F.lit("spark")).alias("has_spark"),
        F.coalesce(
            F.regexp_substr(F.col("text"), F.lit(r"[a-z]{6,}")),
            F.lit(""),
        ).alias("first_long"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.regexp_extract_all(F.col("text"), F.lit(r"([a-z]+a[a-z]*)"))
                )
            ),
            ",",
        ).alias("a_words"),
        F.regexp_replace(F.col("text"), r"\s+[a-z]\s+", " _ ").alias("squashed"),
    )


@register(
    "fn_exists_forall_filterpos",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(regexp_replace(lower(text),
               '[^a-z0-9 \\t\\n]', ' ', 'g'), '\\s+'), t -> t <> '') AS tok
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(list_filter(tok, t -> length(t) >= 6)) > 0 AS has_long,
           len(list_filter(tok, t -> length(t) < 3)) = 0 AS all_len3plus,
           len(list_filter(list_transform(generate_series(1, len(tok)),
                 i -> CASE WHEN i % 2 = 1 THEN tok[i] END),
               x -> x IS NOT NULL)) AS n_odd_positions,
           CAST(list_sum(list_transform(tok, t -> length(t))) AS BIGINT)
             AS total_chars
    FROM toks
    """,
    category="functions",
)
def fn_exists_forall_filterpos(spark, sf_dir):
    """The predicate higher-order functions: ``exists`` (any element
    matches), ``forall`` (all match), positional ``filter`` (the
    (element, index) lambda arity), and an ``aggregate`` fold — the
    quantifier surface on top of the transform/filter family already
    covered by fn_array. All codegen-adjacent interpreted lambdas
    over per-row arrays; no shuffle."""
    from bigdata_financial_reporting_spark.operators.text import tokenize

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = d.select("doc_id", tokenize(F.col("text")).alias("tok"))
    return toks.select(
        "doc_id",
        F.exists("tok", lambda t: F.length(t) >= 6).alias("has_long"),
        F.forall("tok", lambda t: F.length(t) >= 3).alias("all_len3plus"),
        F.size(
            F.filter("tok", lambda t, i: i % 2 == 0)
        ).cast("long").alias("n_odd_positions"),
        F.aggregate(
            "tok",
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t).cast("long"),
        ).alias("total_chars"),
    )


@register(
    "fn_bitwise_family",
    oracle="""
    SELECT o_orderkey,
           bit_count(o_orderkey) AS n_bits,
           ((o_orderkey >> 3) & 1) AS bit3,
           (o_orderkey << 2) AS shl2,
           (o_orderkey >> 2) AS shr2,
           xor(o_orderkey, 255) AS x255,
           (o_orderkey & 4095) AS lo12,
           (o_orderkey | 1) AS odd1
    FROM orders WHERE o_orderkey < 500
    """,
    category="functions",
)
def fn_bitwise_family(spark, sf_dir):
    """Scalar bitwise functions (bit_count, getbit, shifts, and the
    &/|/^ operators) — the toolkit under the engine's Bloom filter,
    bitmap-distinct, and Z-order operators, exposed as first-class
    scalars. All pure codegen arithmetic; the oracle uses DuckDB's
    operator spellings of the same two's-complement semantics."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.bit_count(k).cast("int").alias("n_bits"),
        F.getbit(k, F.lit(3)).cast("long").alias("bit3"),
        F.expr("shiftleft(o_orderkey, 2)").cast("long").alias("shl2"),
        F.expr("shiftright(o_orderkey, 2)").cast("long").alias("shr2"),
        k.bitwiseXOR(F.lit(255)).cast("long").alias("x255"),
        k.bitwiseAND(F.lit(4095)).cast("long").alias("lo12"),
        k.bitwiseOR(F.lit(1)).cast("long").alias("odd1"),
    )


@register(
    "fn_interval_family",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
             AS plus30,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d')
             AS plus2m,
           strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS mstart,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS mend,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS woy,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                AS INT) AS days_to_y2k
    FROM orders WHERE o_orderkey < 2000
    """,
    category="functions",
)
def fn_interval_family(spark, sf_dir):
    """Date/interval arithmetic family: day and month interval
    addition (add_months clamps to month end, matching DuckDB's
    month-interval semantics), month truncation, last_day, quarter,
    day-of-week (Spark's 1=Sunday convention; DuckDB's 0=Sunday is
    shifted in the oracle), ISO week-of-year, and signed day
    differences. All pure codegen date expressions — on a date-
    partitioned lake these are the functions partition expressions and
    retention predicates are made of. Date outputs render as
    yyyy-MM-dd STRINGS on both sides (the fn_date precedent): pandas
    materializes a Spark date as datetime.date (object kind) but a
    DuckDB DATE as datetime64, and the driver hashes the typed
    rendering."""
    d = F.to_date("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
            F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus2m"),
            F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("mstart"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("mend"),
            F.quarter(d).alias("q"),
            F.dayofweek(d).alias("dow"),
            F.weekofyear(d).alias("woy"),
            F.datediff(F.lit("2000-01-01").cast("date"), d).alias(
                "days_to_y2k"
            ),
        )
    )
