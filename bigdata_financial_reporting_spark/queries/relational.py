"""Projection / filter / predicate / sort / limit / set-op queries
(SURVEY.md §2B.2 + §2B.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.functions.exact import (
    duck_cents,
    duck_dec2d,
    duck_units,
    spark_cents_sql,
    spark_dec2d,
    spark_units_sql,
)
from bigdata_financial_reporting_spark.operators.topk import top_k_per_group
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "select_prune",
    oracle="SELECT c_custkey, c_name FROM customer",
    category="relational",
)
def select_prune(spark, sf_dir):
    """Column pruning: scan reads only two columns (check ReadSchema)."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")


@register(
    "derived_column",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS revenue,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem
    """,
    category="relational",
)
def derived_column(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(rev, 6).alias("revenue"),
        F.round(rev * (1 + F.col("l_tax")), 6).alias("charged"),
    )


@register(
    "rename_drop",
    oracle="""
    SELECT o_orderkey AS order_id, o_totalprice AS total, o_orderstatus AS status
    FROM orders
    """,
    category="relational",
)
def rename_drop(spark, sf_dir):
    """withColumnsRenamed + drop (reference R3 generalization)."""
    o = load_table(spark, sf_dir, "orders")
    return o.withColumnsRenamed(
        {"o_orderkey": "order_id", "o_totalprice": "total", "o_orderstatus": "status"}
    ).drop("o_custkey", "o_orderdate", "o_orderpriority")


@register(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_d, l_quantity
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      AND l_quantity >= 25
    """,
    category="relational",
)
def filter_range(spark, sf_dir):
    """Conjunctive range predicate (reference R8); pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") <= "1996-12-31")
        & (F.col("l_quantity") >= 25)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_d"),
        "l_quantity",
    )


@register(
    "filter_in_like_null",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#5', 'Brand#13')
      AND p_name LIKE '%widget%'
      AND p_name IS NOT NULL
      AND regexp_matches(p_name, '^(cold|small|large)')
    """,
    category="relational",
)
def filter_in_like_null(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#5", "Brand#13")
        & F.col("p_name").like("%widget%")
        & F.col("p_name").isNotNull()
        & F.col("p_name").rlike("^(cold|small|large)")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "boolean_combinators",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 50000) AND NOT (o_orderpriority = '5-LOW')
    """,
    category="relational",
)
def boolean_combinators(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 50000))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "case_when_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 30000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           NULLIF(o_orderstatus, 'O') AS status_or_null
    FROM orders
    """,
    category="relational",
)
def case_when_coalesce(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 30000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    )


@register(
    "null_fill_drop",
    oracle="""
    WITH w AS (
      SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS d
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, COALESCE(d, -1.0) AS d_filled
    FROM w WHERE l_orderkey IS NOT NULL
    """,
    category="relational",
)
def null_fill_drop(spark, sf_dir):
    """na.fill / na.drop (reference R7) on a synthesized-NULL column."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_orderkey", "l_linenumber", F.nullif(F.col("l_discount"), F.lit(0.0)).alias("d")
    )
    return (
        w.na.fill({"d": -1.0})
        .na.drop(subset=["l_orderkey"])
        .withColumnRenamed("d", "d_filled")
    )


@register(
    "cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS VARCHAR) AS ln_str,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(floor(l_quantity) AS BIGINT) AS qty_int,
           CAST(strftime(l_shipdate, '%Y-%m-%d') AS VARCHAR) AS ship_str
    FROM lineitem
    """,
    category="relational",
)
def cast_types(spark, sf_dir):
    """Casts chosen to have identical semantics in both engines
    (double->int cast itself differs: Spark truncates, DuckDB rounds —
    so the int path goes through an explicit floor)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("string").alias("ln_str"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        F.floor("l_quantity").cast("long").alias("qty_int"),
        F.date_format("l_shipdate", "yyyy-MM-dd").cast("string").alias("ship_str"),
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    category="relational",
)
def distinct_pairs(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    ).distinct()


@register(
    "dropdup_keys_pinned",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) = 1
    """,
    category="relational",
)
def dropdup_keys_pinned(spark, sf_dir):
    """dropDuplicates-by-key with a pinned survivor (lowest custkey) —
    the deterministic form of ``dropDuplicates([k])`` whose survivor
    otherwise depends on partitioning."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_name"
    )
    return top_k_per_group(c, ["c_nationkey"], [F.col("c_custkey").asc()], 1)


def _hash_uniform(salt: str, key_col):
    """Deterministic uniform draw in [0, 1): first 24 bits of
    md5(salt || key). A pure function of the key — stable across runs,
    engines, and partitionings, unlike Spark's ``df.sample(seed)``
    whose membership depends on partition-local XORShift streams.
    DuckDB mirror: ``_duck_uniform``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key_col.cast("string"))), 1, 6),
            16,
            10,
        ).cast("long")
        / F.lit(16777216.0)
    )


def _duck_uniform(salt: str, key_expr: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), "
        f"1, 6)) AS BIGINT) / 16777216.0"
    )


@register(
    "sample_seeded",
    oracle=f"""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE {_duck_uniform('seed42:', "l_orderkey * 8 + l_linenumber")} < 0.1
    """,
    category="relational",
)
def sample_seeded(spark, sf_dir):
    """Reproducible 10% Bernoulli sample via salted-md5 hash draw
    (pattern: mix_apply_sample) — the deterministic form of
    ``df.sample(0.1, seed)``: same keep-rate semantics, but membership
    is a pure function of the row key, so it is identical across
    engines and partitionings (exact oracle instead of the engine-
    private RNG that kept this key rows-only through round 3). The
    composite key (orderkey*8+linenumber) is unique per lineitem row."""
    li = load_table(spark, sf_dir, "lineitem")
    u = _hash_uniform(
        "seed42:", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    return li.filter(u < 0.1).select("l_orderkey", "l_linenumber")


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_duck_uniform('strat:', 'doc_id')} <
          CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3 WHEN 'fr' THEN 0.3
                    WHEN 'de' THEN 0.3 WHEN 'zh' THEN 0.1 ELSE 0.0 END
    """,
    category="relational",
)
def sample_stratified(spark, sf_dir):
    """Stratified (per-key fraction) sampling — rebalancing a skewed
    corpus by language is the canonical training-data use. Same
    hash-Bernoulli draw as sample_seeded with a per-stratum rate map
    (the deterministic form of ``df.sampleBy(fractions, seed)``); the
    fractions literal is a broadcast-free CASE expression, so the scan
    is a single filtered pass at any scale."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.3, "fr": 0.3, "de": 0.3, "zh": 0.1}
    rate = F.lit(0.0)
    for lang, frac in fractions.items():
        rate = F.when(F.col("lang") == lang, F.lit(frac)).otherwise(rate)
    u = _hash_uniform("strat:", F.col("doc_id"))
    return d.filter(u < rate).select("doc_id", "lang")


@register(
    "winsorize_by_group",
    oracle="""
    WITH bounds AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round(least(greatest(l_extendedprice, lo), hi), 6) AS price_w
    FROM lineitem JOIN bounds USING (l_returnflag)
    """,
    category="relational",
)
def winsorize_by_group(spark, sf_dir):
    """Winsorization: clip values to per-group exact [p05, p95] —
    outlier handling before training-data statistics. The bounds table
    is group-count-sized -> broadcast; the fact side never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    return li.join(F.broadcast(bounds), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(
            F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")), 6
        ).alias("price_w"),
    )


@register(
    "sort_multi_key_limit",
    oracle="""
    SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
    FROM lineitem
    ORDER BY l_returnflag ASC, l_extendedprice DESC NULLS LAST, l_orderkey, l_linenumber
    LIMIT 100
    """,
    category="relational",
)
def sort_multi_key_limit(spark, sf_dir):
    """Multi-key sort + limit under a total order (tie-broken) so the
    kept set is deterministic. Spark executes as TakeOrderedAndProject —
    no global sort materialization."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_extendedprice").desc_nulls_last(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 10
    """,
    category="relational",
)
def limit_offset(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.orderBy("o_orderkey").offset(10).limit(50)


@register(
    "topk_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    QUALIFY row_number() OVER (
      PARTITION BY l_returnflag
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) <= 3
    """,
    category="relational",
)
def topk_per_group_q(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return top_k_per_group(
        li,
        ["l_returnflag"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        3,
    )


@register(
    "union_all_distinct",
    oracle="""
    SELECT nk, count(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
    category="relational",
)
def union_all_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@register(
    "intersect_except",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT 'both' AS which, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
    UNION ALL
    SELECT 'cust_only' AS which, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
    """,
    category="relational",
)
def intersect_except(spark, sf_dir):
    cn = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    sn = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cn.intersect(sn).select(F.lit("both").alias("which"), "nk")
    only = cn.distinct().exceptAll(sn.distinct()).select(
        F.lit("cust_only").alias("which"), "nk"
    )
    return both.unionByName(only)


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT lang, count(*) AS n, round(avg(n_chars), 6) AS avg_chars
    FROM documents
    WHERE n_chars > 200 AND source <> 'src0'
    GROUP BY lang
    """,
    category="relational",
)
def sql_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4): the query written as a linear
    dataflow (FROM |> WHERE |> AGGREGATE) instead of inside-out ANSI
    nesting. Parses to the identical logical plan as the classic form
    — the oracle IS that classic form — so this pins that the new
    surface syntax changes nothing about planning or results."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("bdfr_docs_pipe")
    return spark.sql(
        """
        FROM bdfr_docs_pipe
        |> WHERE n_chars > 200 AND source <> 'src0'
        |> AGGREGATE count(*) AS n, round(avg(n_chars), 6) AS avg_chars
           GROUP BY lang
        """
    )


@register(
    "sql_session_variables",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n,
           {duck_dec2d("sum(" + duck_cents("o_totalprice") + ")")} / 100.0
             AS revenue
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 200000
    GROUP BY o_orderpriority
    """,
    category="relational",
)
def sql_session_variables(spark, sf_dir):
    """SQL session variables (Spark 4 DECLARE/SET VAR): parameterised
    queries without string interpolation — the variables resolve at
    plan time to foldable constants, so the filter still pushes into
    the scan exactly as a literal would. The oracle inlines the same
    constants; the revenue sum runs in exact integer cents."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("bdfr_orders_vars")
    spark.sql("DECLARE OR REPLACE VARIABLE bdfr_lo DOUBLE DEFAULT 50000.0")
    spark.sql("DECLARE OR REPLACE VARIABLE bdfr_hi DOUBLE DEFAULT 200000.0")
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(*) AS n,
               {spark_dec2d("sum(" + spark_cents_sql("o_totalprice") + ")")}
                 / 100.0 AS revenue
        FROM bdfr_orders_vars
        WHERE o_totalprice BETWEEN bdfr_lo AND bdfr_hi
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_recursive_cte_spine",
    oracle="""
    WITH RECURSIVE spine(day, last_day) AS (
      SELECT min(ts)::DATE, max(ts)::DATE FROM events
      UNION ALL
      SELECT day + INTERVAL 1 DAY, last_day FROM spine
      WHERE day < last_day
    ),
    daily AS (
      SELECT ts::DATE AS day, count(*) AS n,
             {v} / 1000000.0 AS v
      FROM events WHERE event_type = 'purchase' GROUP BY ts::DATE
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.n, 0) AS n_purchases,
           coalesce(d.v, 0.0) AS total_value
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """.format(v=duck_dec2d("sum(" + duck_units("value") + ")")),
    category="relational",
)
def sql_recursive_cte_spine(spark, sf_dir):
    """Recursive CTE (Spark 4.0, SPARK-24497) building a complete
    calendar spine from the observed min to max event date, then
    zero-filling the daily purchase rollup against it — the canonical
    gaps-in-time-series fix, previously impossible in pure Spark SQL
    without a driver-side date loop or sequence()+explode. The
    recursion depth equals the day span (bounded, ~30 here); each
    step is one row, the spine stays tiny, and the fact-table rollup
    is the usual map-side-combined aggregate joined against the
    broadcast spine. Both bounds are computed ONCE in the anchor and
    the upper bound rides along as a recursion column — a correlated
    ``WHERE day < (SELECT max(..) FROM events)`` re-scans the fact
    table on EVERY recursion step (30 full scans; cost 20 s at the
    10x corpus before this form). DuckDB runs the identical
    WITH RECURSIVE text."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("bdfr_events_rec")
    v = spark_dec2d("sum(" + spark_units_sql("value") + ")")
    return spark.sql(
        f"""
        WITH RECURSIVE spine(day, last_day) AS (
          SELECT min(CAST(ts AS DATE)), max(CAST(ts AS DATE))
          FROM bdfr_events_rec
          UNION ALL
          SELECT day + INTERVAL '1' DAY, last_day FROM spine
          WHERE day < last_day
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS n,
                 {v} / 1000000.0 AS v
          FROM bdfr_events_rec WHERE event_type = 'purchase'
          GROUP BY CAST(ts AS DATE)
        )
        SELECT date_format(s.day, 'yyyy-MM-dd') AS day,
               coalesce(d.n, 0) AS n_purchases,
               coalesce(d.v, 0.0) AS total_value
        FROM spine s LEFT JOIN daily d ON s.day = d.day
        """
    )


@register(
    "union_by_name_missing",
    oracle="""
    SELECT c_custkey AS id, c_acctbal AS bal, c_mktsegment AS segment,
           CAST(NULL AS DOUBLE) AS price
    FROM customer WHERE c_custkey < 200
    UNION ALL
    SELECT o_orderkey AS id, CAST(NULL AS DOUBLE) AS bal,
           CAST(NULL AS VARCHAR) AS segment, o_totalprice AS price
    FROM orders WHERE o_orderkey < 200
    """,
    category="relational",
)
def union_by_name_missing(spark, sf_dir):
    """``unionByName(allowMissingColumns=True)``: schema-tolerant
    concatenation — each side's missing columns null-fill, matched BY
    NAME (positional union silently mismatches when sources drift;
    by-name is the only safe form for evolving pipelines, cf. the
    schema-evolution parquet read). The oracle is the explicit
    NULL-padded UNION ALL the convenience expands to."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 200
    ).select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("segment"),
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 200
    ).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("price"),
    )
    return c.unionByName(o, allowMissingColumns=True)


@register(
    "sql_group_by_all",
    oracle=f"""
    SELECT r_name, n.n_name, count(*) AS n_sup,
           {duck_dec2d("sum(" + duck_cents("s_acctbal") + ")")} / 100.0 AS bal
    FROM region r
    JOIN nation n ON r.r_regionkey = n.n_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY ALL
    """,
    category="relational",
)
def sql_group_by_all(spark, sf_dir):
    """Spark 4 / modern-SQL GROUP BY ALL: every non-aggregate select
    item becomes a grouping key implicitly — the ergonomic form
    analysts actually write, and identical semantics in DuckDB. Runs
    through spark.sql over temp views so the SQL surface itself (not a
    DataFrame translation) is what's exercised."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("v_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier")
    return spark.sql(
        f"""
        SELECT r_name, n.n_name, count(*) AS n_sup,
               {spark_dec2d("sum(" + spark_cents_sql("s_acctbal") + ")")}
                 / 100.0 AS bal
        FROM v_region r
        JOIN v_nation n ON r.r_regionkey = n.n_regionkey
        JOIN v_supplier s ON s.s_nationkey = n.n_nationkey
        GROUP BY ALL
        """
    )


@register(
    "sql_named_parameters",
    oracle="""
    SELECT lang, count(*) AS n, CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    WHERE n_chars > 300 AND source <> 'src1'
    GROUP BY lang
    """,
    category="relational",
)
def sql_named_parameters(spark, sf_dir):
    """Spark 3.4+/4 parameterized SQL: named parameter markers
    (:min_chars, :skip) bound through spark.sql(..., args=...) — the
    injection-safe surface programs should use instead of f-string SQL.
    Parameters are bound as typed literals in the plan, so Catalyst
    constant-folds them and the parquet scan still receives the pushed
    n_chars filter (identical plan to the literal form)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "v_docs_param"
    )
    return spark.sql(
        """
        SELECT lang, count(*) AS n, max(n_chars) AS max_chars
        FROM v_docs_param
        WHERE n_chars > :min_chars AND source <> :skip
        GROUP BY lang
        """,
        args={"min_chars": 300, "skip": "src1"},
    )


@register(
    "sql_execute_immediate",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n,
           {duck_dec2d("sum(" + duck_cents("o_totalprice") + ")")} / 100.0
             AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    category="relational",
)
def sql_execute_immediate(spark, sf_dir):
    """Spark 4 EXECUTE IMMEDIATE: dynamic SQL runs a query held in a
    session VARIABLE — the building block of metadata-driven pipelines
    (the statement text itself may come from a config table), and the
    variable form sidesteps quote-escaping inside a string literal.
    The inner query plans exactly like its static form: same pushed
    filter, same single aggregate exchange."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_dyn"
    )
    stmt = (
        "SELECT o_orderpriority, count(*) AS n, "
        + spark_dec2d("sum(" + spark_cents_sql("o_totalprice") + ")")
        + " / 100.0 AS total "
        "FROM v_orders_dyn WHERE o_orderstatus = 'F' "
        "GROUP BY o_orderpriority"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE dyn_stmt STRING")
    spark.sql("SET VAR dyn_stmt = :s", args={"s": stmt})
    return spark.sql("EXECUTE IMMEDIATE dyn_stmt")
