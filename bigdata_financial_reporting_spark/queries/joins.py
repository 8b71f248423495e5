"""Join queries (SURVEY.md §2B.3) on the TPC-H-ish fixtures.

Scale notes baked into each query:
- dimension joins (region/nation/customer-sized) carry explicit
  ``F.broadcast`` hints — no shuffle of the fact side;
- fact-fact joins shuffle on their equi-keys and rely on AQE for skew;
- the as-of join is the union+window composite from
  ``operators.asof`` (one shuffle, no candidate blowup).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.asof import asof_join
from bigdata_financial_reporting_spark.queries.ops_tools import (
    DUCK_SCD2_DIM,
)
from bigdata_financial_reporting_spark.functions.exact import (
    cents,
    duck_cents,
    duck_dec2d,
    duck_half_div,
    duck_units,
    micro_units,
    spark_dec2d,
    spark_half_div,
)
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    category="joins",
)
def join_inner(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN (
      SELECT * FROM orders WHERE o_totalprice > 150000
    ) o ON c.c_custkey = o.o_custkey
    """,
    category="joins",
)
def join_left_outer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o_orderkey
    FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
    RIGHT JOIN orders ON c.c_custkey = o_custkey
    """,
    category="joins",
)
def join_right_outer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM (SELECT * FROM customer WHERE c_nationkey < 12) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
      ON c.c_custkey = o.o_custkey
    """,
    category="joins",
)
def join_full_outer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 12)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 180000)
    """,
    category="joins",
)
def join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 180000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 180000)
    """,
    category="joins",
)
def join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 180000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r_name, n_name, count(*) AS n_cust,
           {duck_dec2d("sum(" + duck_cents("c_acctbal") + ")")} / 100.0
             AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    category="joins",
)
def join_broadcast_dims(spark, sf_dir):
    """Star join: fact side never shuffles for the join — both dims are
    broadcast (the 100 TB pattern for small dimensions). The balance
    sum runs in exact integer cents (order-independent merge)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(cents(F.col("c_acctbal"))).alias("bal_c"),
        )
        .select(
            "r_name",
            "n_name",
            "n_cust",
            (F.expr(spark_dec2d("bal_c")) / 100.0).alias("acctbal_sum"),
        )
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    category="joins",
)
def join_cross(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_theta",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a JOIN nation b ON a.n_regionkey < b.n_regionkey
    """,
    category="joins",
)
def join_theta(spark, sf_dir):
    """Pure non-equi predicate -> broadcast nested loop (fine: one side
    is tiny; a large-large theta join would need banding first)."""
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return a.join(b, F.col("a.n_regionkey") < F.col("b.n_regionkey")).select(
        F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS k
      FROM documents WHERE doc_id < 100
    ),
    b AS (
      SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS k
      FROM documents WHERE doc_id < 100
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.k AS k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k AND a.doc_id < b.doc_id
    """,
    category="joins",
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — required for CDC diffs and dedup on nullable
    keys, where a plain equi-join silently drops every NULL row."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    a = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang")).alias("k"),
    ).alias("a")
    b = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("lang")).alias("k"),
    ).alias("b")
    return a.join(
        b,
        F.col("a.k").eqNullSafe(F.col("b.k"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.k").alias("k"),
    )


@register(
    "join_fuzzy_levenshtein",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
    """,
    category="joins",
)
def join_fuzzy_levenshtein(spark, sf_dir):
    """Fuzzy self-join: near-identical part names within edit distance
    3. Blocking (shared first char + length band <= 2) prunes the
    quadratic pair space BEFORE the expensive edit-distance compare —
    the standard entity-resolution shape; at scale the block key also
    drives the shuffle."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    a, b = p.alias("a"), p.alias("b")
    blocked = a.join(
        b,
        (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (
            F.substring(F.col("a.p_name"), 1, 1)
            == F.substring(F.col("b.p_name"), 1, 1)
        )
        & (
            F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))) <= 2
        ),
    )
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        blocked.withColumn("dist", dist)
        .filter(F.col("dist").between(1, 3))
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
        )
    )


@register(
    "join_interval_containment",
    oracle="""
    WITH w AS (
      SELECT o_orderkey, o_custkey,
             TIMESTAMP '2024-01-01' + (o_orderkey % 25) * INTERVAL 1 DAY AS w_start
      FROM orders
    )
    SELECT o_orderkey, count(*) AS n_events,
           CAST({vs} AS DOUBLE) / 10000.0 AS value_sum
    FROM w JOIN events
      ON user_id = o_custkey
     AND ts >= w_start AND ts < w_start + INTERVAL 2 DAY
    GROUP BY o_orderkey
    """.format(
        vs=duck_half_div("sum(" + duck_units("value") + ")", "100")
    ),
    category="joins",
)
def join_interval_containment(spark, sf_dir):
    """Equi-key + interval containment: Catalyst runs the equi part as
    a hash join and the range as a post-filter — no nested loop.

    The fixture's order dates (1995-2001) never overlap event
    timestamps (2024), so each order derives a deterministic 2-day
    window inside the events' range (orderkey-keyed offset from
    2024-01-01) — real containment matches, not a vacuous empty join.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "w_start",
        F.expr(
            "timestampadd(DAY, CAST(o_orderkey % 25 AS INT), TIMESTAMP '2024-01-01')"
        ),
    )
    e = load_table(spark, sf_dir, "events")
    cond = (
        (e.user_id == o.o_custkey)
        & (e.ts >= o.w_start)
        & (e.ts < F.col("w_start") + F.expr("INTERVAL 2 DAYS"))
    )
    return (
        o.join(e, cond)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micro_units(F.col("value"))).alias("s_u"),
        )
        .select(
            "o_orderkey",
            "n_events",
            (
                F.expr(spark_half_div("s_u", "100")).cast("double") / 10000.0
            ).alias("value_sum"),
        )
    )


@register(
    "join_asof",
    oracle="""
    WITH ranked AS (
      SELECT o.o_orderkey, e.event_id, e.value,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM (SELECT *, o_orderdate + INTERVAL 10600 DAY AS asof_ts FROM orders) o
      LEFT JOIN events e
        ON e.user_id = o.o_custkey AND e.ts <= o.asof_ts
    )
    SELECT o_orderkey, event_id AS last_event_id, round(value, 6) AS last_value
    FROM ranked WHERE rn = 1
    """,
    category="joins",
)
def join_asof_q(spark, sf_dir):
    """As-of join: latest event at or before each order's as-of time,
    per user. Uses the union+window composite (no native ASOF in
    Spark); oracle is the equivalent ranked range join."""
    # Orders are 1995-2001 and events 2024: shift order dates ~29 years
    # so as-of timestamps interleave with the event stream.
    o = load_table(spark, sf_dir, "orders").withColumn(
        "asof_ts", F.col("o_orderdate") + F.expr("INTERVAL 10600 DAYS")
    )
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        left=o.select("o_orderkey", F.col("o_custkey").alias("user_id"), "asof_ts"),
        right=e,
        on="user_id",
        left_ts="asof_ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_id="event_id",
    )
    return joined.select(
        "o_orderkey",
        F.col("event_id").alias("last_event_id"),
        F.round("value", 6).alias("last_value"),
    )


@register(
    "join_self",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
           round(a.l_extendedprice + b.l_extendedprice, 6) AS pair_price
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    """,
    category="joins",
)
def join_self(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    a, b = li.alias("a"), li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("ln_a"),
        F.col("b.l_linenumber").alias("ln_b"),
        F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 6).alias(
            "pair_price"
        ),
    )


@register(
    "join_range_banded",
    oracle="""
    WITH w AS (
      SELECT o_orderkey,
             TIMESTAMP '2024-01-01' + (o_orderkey % 25) * INTERVAL 1 DAY AS w_start,
             TIMESTAMP '2024-01-01' + (o_orderkey % 25) * INTERVAL 1 DAY
               + INTERVAL 2 DAY AS w_end
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey, count(*) AS n_events,
           CAST({vs} AS DOUBLE) / 10000.0 AS value_sum
    FROM w JOIN events ON ts >= w_start AND ts < w_end
    GROUP BY o_orderkey
    """.format(
        vs=duck_half_div("sum(" + duck_units("value") + ")", "100")
    ),
    category="joins",
)
def join_range_banded(spark, sf_dir):
    """PURE range containment with NO equi key — every event against
    every order window whose 2-day span contains it. Catalyst's only
    native plans for this are broadcast-nested-loop or a cartesian;
    operators/rangejoin.banded_range_join rewrites it as an equi-join
    on 1-day band buckets (each interval covers <= 3 buckets, each
    point exactly one, every match meets exactly once), so BOTH sides
    can be arbitrarily large — the large-to-large range join the
    docstring of join_theta defers to. A plan test pins the equi-join
    shape."""
    from bigdata_financial_reporting_spark.operators.rangejoin import (
        banded_range_join,
    )

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    w = o.select(
        "o_orderkey",
        F.expr(
            "timestampadd(DAY, CAST(o_orderkey % 25 AS INT), TIMESTAMP '2024-01-01')"
        ).alias("w_start"),
    ).withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 2 DAYS"))
    e = load_table(spark, sf_dir, "events").select("ts", "value")
    j = banded_range_join(e, w, "ts", "w_start", "w_end", band_seconds=86400)
    return (
        j.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micro_units(F.col("value"))).alias("s_u"),
        )
        .select(
            "o_orderkey",
            "n_events",
            (
                F.expr(spark_half_div("s_u", "100")).cast("double") / 10000.0
            ).alias("value_sum"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS a_key,
             TIMESTAMP '2024-01-01' + (o_orderkey % 25) * INTERVAL 1 DAY AS a_start,
             TIMESTAMP '2024-01-01' + (o_orderkey % 25) * INTERVAL 1 DAY
               + INTERVAL 2 DAY AS a_end
      FROM orders WHERE o_orderkey < 500
    ),
    b AS (
      SELECT o_orderkey AS b_key,
             TIMESTAMP '2024-01-01' + (o_orderkey % 20) * INTERVAL 1 DAY AS b_start,
             TIMESTAMP '2024-01-01' + (o_orderkey % 20) * INTERVAL 1 DAY
               + INTERVAL 3 DAY AS b_end
      FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 800
    )
    SELECT b_key, count(*) AS n_overlaps, min(a_key) AS first_a
    FROM a JOIN b ON a_start < b_end AND b_start < a_end
    GROUP BY b_key
    """,
    category="joins",
)
def join_interval_overlap(spark, sf_dir):
    """Interval-to-interval OVERLAP join with no equi key — two window
    sets meet wherever their half-open spans intersect.
    operators/rangejoin.banded_interval_join explodes BOTH sides into
    band buckets and keeps a pair only in the FIRST bucket the two
    spans share, so each overlapping pair is emitted exactly once with
    no distinct pass — large-to-large, both sides shuffled by bucket."""
    from bigdata_financial_reporting_spark.operators.rangejoin import (
        banded_interval_join,
    )

    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") < 500).select(
        F.col("o_orderkey").alias("a_key"),
        F.expr(
            "timestampadd(DAY, CAST(o_orderkey % 25 AS INT), TIMESTAMP '2024-01-01')"
        ).alias("a_start"),
    ).withColumn("a_end", F.col("a_start") + F.expr("INTERVAL 2 DAYS"))
    b = o.filter(
        (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 800)
    ).select(
        F.col("o_orderkey").alias("b_key"),
        F.expr(
            "timestampadd(DAY, CAST(o_orderkey % 20 AS INT), TIMESTAMP '2024-01-01')"
        ).alias("b_start"),
    ).withColumn("b_end", F.col("b_start") + F.expr("INTERVAL 3 DAYS"))
    j = banded_interval_join(
        a, b, "a_start", "a_end", "b_start", "b_end", band_seconds=86400
    )
    return j.groupBy("b_key").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.min("a_key").alias("first_a"),
    )


@register(
    "join_lateral_topn",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT c.c_custkey, r.o_orderkey,
           round(r.o_totalprice, 4) AS o_totalprice
    FROM customer c JOIN r ON r.o_custkey = c.c_custkey
    WHERE r.rn <= 2
    """,
    category="joins",
)
def join_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery (Spark 4 SQL): top-2 orders per
    customer expressed as a per-row dependent subquery — the ANSI
    spelling of top-k-per-group. Catalyst decorrelates the LATERAL
    into a ranked window + join (DomainJoin rewrite), so the executed
    plan is the same single-shuffle window the registry pins for
    topk_per_group — the lateral form adds parser/optimizer surface,
    not a nested-loop execution."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o.createOrReplaceTempView("bdfr_lat_orders")
    c.createOrReplaceTempView("bdfr_lat_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               round(t.o_totalprice, 4) AS o_totalprice
        FROM bdfr_lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM bdfr_lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


@register(
    "join_point_in_time_scd2",
    oracle="""
    WITH """
    + DUCK_SCD2_DIM
    + """
    SELECT f.user_id, d.state,
           strftime(d.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           count(*) AS n_events,
           CAST("""
    + duck_half_div("sum(" + duck_units("f.value") + ")", "100")
    + """ AS DOUBLE) / 10000.0 AS value_sum
    FROM events f
    JOIN scd2_dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    WHERE f.user_id < 100
    GROUP BY f.user_id, d.state, d.valid_from
    """,
    category="joins",
)
def join_point_in_time_scd2(spark, sf_dir):
    """Point-in-time (temporal validity) join: every fact row matches
    the SCD2 dimension version whose [valid_from, valid_to) interval
    contains its timestamp — the lookup every ML feature store and
    restated-financials query needs (no future leakage, no stale
    state). The dimension is the ops_scd2_build version table; the
    join carries the user_id equi-key so Spark hash-partitions on it
    and the interval predicate only filters WITHIN each key's few
    versions — never a banded all-pairs. Each fact matches exactly
    one version by construction (intervals partition the timeline),
    pinned by the grouped counts reconciling below."""
    from bigdata_financial_reporting_spark.operators.timeseries import (
        scd2_versions,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    dim = scd2_versions(ev, "user_id", "event_type", "ts", "event_id").select(
        F.col("user_id").alias("d_uid"), "state", "valid_from", "valid_to"
    )
    j = ev.join(
        dim,
        (F.col("user_id") == F.col("d_uid"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return (
        j.groupBy("user_id", "state", "valid_from")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micro_units(F.col("value"))).alias("s_u"),
        )
        .select(
            "user_id",
            "state",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
                "valid_from"
            ),
            "n_events",
            (
                F.expr(spark_half_div("s_u", "100")).cast("double") / 10000.0
            ).alias("value_sum"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH ranked AS (
      SELECT o.o_orderkey, o.asof_ts, e.event_id, e.value, e.ts,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM (SELECT *, o_orderdate + INTERVAL 10600 DAY AS asof_ts FROM orders) o
      LEFT JOIN events e
        ON e.user_id = o.o_custkey AND e.ts <= o.asof_ts
    )
    SELECT o_orderkey,
           CASE WHEN ts >= asof_ts - INTERVAL 2 DAY THEN event_id END
             AS last_event_id,
           round(CASE WHEN ts >= asof_ts - INTERVAL 2 DAY THEN value END, 6)
             AS last_value,
           coalesce(ts >= asof_ts - INTERVAL 2 DAY, FALSE) AS fresh
    FROM ranked WHERE rn = 1
    """,
    category="joins",
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a STALENESS TOLERANCE — the production variant
    of join_asof: the latest event at or before the as-of time only
    counts if it is at most 2 days old; older matches null out and the
    row is flagged stale. (A plain as-of join happily attaches a
    quote from last year; a tolerance bound is how real market-data /
    feature-store lookups are specified.) Same union+window composite
    as join_asof; the tolerance is a post-predicate on the matched
    timestamp, so the plan is unchanged."""
    from bigdata_financial_reporting_spark.operators.asof import asof_join

    o = load_table(spark, sf_dir, "orders").withColumn(
        "asof_ts", F.col("o_orderdate") + F.expr("INTERVAL 10600 DAYS")
    )
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        left=o.select(
            "o_orderkey", F.col("o_custkey").alias("user_id"), "asof_ts"
        ),
        right=e,
        on="user_id",
        left_ts="asof_ts",
        right_ts="ts",
        right_cols=["event_id", "value", "ts"],
        right_id="event_id",
    )
    fresh = F.col("ts") >= F.col("asof_ts") - F.expr("INTERVAL 2 DAYS")
    return joined.select(
        "o_orderkey",
        F.when(fresh, F.col("event_id")).alias("last_event_id"),
        F.round(F.when(fresh, F.col("value")), 6).alias("last_value"),
        F.coalesce(fresh, F.lit(False)).alias("fresh"),
    )


@register(
    "join_dim_snowflake",
    oracle="""
    WITH s AS (
      SELECT r_name,
             count(*) AS n_orders,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
    )
    SELECT r_name, n_orders, {c} / 100.0 AS revenue FROM s
    """.format(c=duck_dec2d("cents")),
    category="joins",
)
def join_dim_snowflake(spark, sf_dir):
    """Snowflake-schema rollup: fact -> customer -> nation -> region,
    three dimension hops. customer joins by shuffle (it is fact-sized
    at warehouse scale); nation and region broadcast (25 / 5 rows
    forever). Revenue sums exact integer cents in decimal(38,0) with
    one final int->double conversion — the tpch_q1 discipline."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents.cast("decimal(38,0)")).alias("__cents"),
        )
        .select(
            "r_name",
            "n_orders",
            # mirrored >2^53-safe decimal->double (functions/exact.py)
            (F.expr(spark_dec2d("__cents")) / 100.0).alias("revenue"),
        )
    )


@register(
    "join_exists_agg",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             count(*) AS n_orders,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_orders, {c} / 100.0 AS revenue FROM s
    """.format(c=duck_dec2d("cents")),
    category="joins",
)
def join_exists_agg(spark, sf_dir):
    """EXISTS + NOT EXISTS against the same fact (orders with a bulk
    line and no returned line) — the Q21 shape in miniature: the
    predicates compile to one LEFT SEMI and one LEFT ANTI join, both
    key-wise hash joins on l_orderkey with the filters pushed below
    the join (only qualifying lineitem rows shuffle). Revenue in
    exact integer cents."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bulk = li.filter(F.col("l_quantity") >= 45).select("l_orderkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.join(bulk, o.o_orderkey == bulk.l_orderkey, "left_semi")
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents.cast("decimal(38,0)")).alias("__cents"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            (F.expr(spark_dec2d("__cents")) / 100.0).alias("revenue"),
        )
    )


@register(
    "join_grid_neighbors",
    oracle="""
    WITH p AS (
      SELECT c_custkey AS id,
             (c_custkey * 40503) % 1000 AS x,
             (c_custkey * 69069) % 1000 AS y
      FROM customer
      WHERE c_custkey <= 20000
    ),
    cells AS (SELECT id, x, y, x // 8 AS cx, y // 8 AS cy FROM p),
    probe AS (
      SELECT c.id, c.x, c.y, c.cx + o.dx AS ncx, c.cy + o.dy AS ncy
      FROM cells c
      CROSS JOIN (VALUES (-1, -1), (-1, 0), (-1, 1),
                         (0, -1), (0, 0), (0, 1),
                         (1, -1), (1, 0), (1, 1)) o(dx, dy)
    )
    SELECT a.id AS a_id, b.id AS b_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
    FROM probe a JOIN cells b ON a.ncx = b.cx AND a.ncy = b.cy
    WHERE a.id < b.id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 64
    """,
    category="joins",
)
def join_grid_neighbors(spark, sf_dir):
    """Grid-blocked radius self-join (the spatial/geo join pattern):
    points on a 1000x1000 integer grid (deterministically synthesized
    from the customer key), all pairs within Euclidean distance 8.
    The naive form is an O(n^2) cross join — fatal at 100 TB.  The
    blocked plan buckets each point into an 8x8 cell, explodes ONE
    side into its 3x3 cell neighborhood (cell size >= radius makes
    candidates provably complete: |dx|<=8 can cross at most one cell
    boundary), and equi-joins on the cell key — a plain shuffle join
    whose candidate count is density-bounded, not corpus-bounded.
    Each qualifying pair is emitted exactly once (the single (dx,dy)
    that maps a's cell onto b's).  All-integer arithmetic; the exact
    dist^2 filter runs post-join on candidates only.  The point set
    is capped at 20k keys: the FIXTURE reuses one fixed 1000x1000
    grid at every scale factor, so an uncapped set densifies
    quadratically — a real geo corpus grows its extent with its size
    and keeps per-cell density flat, which is what the cap emulates."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 20000
    )
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 40503) % 1000).alias("x"),
        ((F.col("c_custkey") * 69069) % 1000).alias("y"),
    ).withColumns(
        {
            "cx": F.floor(F.col("x") / 8),
            "cy": F.floor(F.col("y") / 8),
        }
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        "id", "x", "y", "cx", "cy", F.explode(offsets).alias("o")
    ).select(
        F.col("id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    )
    b = pts.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        "cx",
        "cy",
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(
            b,
            (probe.ncx == b.cx) & (probe.ncy == b.cy),
        )
        .filter((F.col("a_id") < F.col("b_id")) & (dist2 <= 64))
        .select("a_id", "b_id", dist2.alias("dist2"))
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             TIMESTAMP '2023-12-24'
               + INTERVAL (o_orderkey % 1080) HOUR AS asof_ts
      FROM orders
    ),
    b AS (
      SELECT o.o_orderkey, e.event_id, e.value, e.ts,
             row_number() OVER (PARTITION BY o.o_orderkey
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM o JOIN events e
        ON e.user_id = o.o_custkey AND e.ts <= o.asof_ts
    ),
    f AS (
      SELECT o.o_orderkey, e.event_id, e.value, e.ts,
             row_number() OVER (PARTITION BY o.o_orderkey
                                ORDER BY e.ts ASC, e.event_id ASC) AS rn
      FROM o JOIN events e
        ON e.user_id = o.o_custkey AND e.ts > o.asof_ts
    ),
    bb AS (SELECT * FROM b WHERE rn = 1),
    ff AS (SELECT * FROM f WHERE rn = 1),
    j AS (
      SELECT o.o_orderkey,
             bb.event_id AS b_id, bb.value AS b_val,
             epoch_us(o.asof_ts) - epoch_us(bb.ts) AS dt_b,
             ff.event_id AS f_id, ff.value AS f_val,
             epoch_us(ff.ts) - epoch_us(o.asof_ts) AS dt_f
      FROM o
      LEFT JOIN bb ON bb.o_orderkey = o.o_orderkey
      LEFT JOIN ff ON ff.o_orderkey = o.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN b_id IS NOT NULL
                     AND (f_id IS NULL OR dt_b <= dt_f)
                THEN b_id ELSE f_id END AS nearest_event_id,
           round(CASE WHEN b_id IS NOT NULL
                           AND (f_id IS NULL OR dt_b <= dt_f)
                      THEN b_val ELSE f_val END, 6) AS nearest_value,
           CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                WHEN b_id IS NOT NULL AND (f_id IS NULL OR dt_b <= dt_f)
                THEN 'b' ELSE 'f' END AS direction,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR dt_b <= dt_f)
                THEN dt_b ELSE dt_f END AS dt_us
    FROM j
    """,
    category="joins",
)
def join_asof_nearest(spark, sf_dir):
    """NEAREST-direction as-of join (pandas merge_asof
    direction='nearest'): each order attaches the event closest to its
    as-of time in EITHER direction, ties to the backward side —
    completes the as-of family (backward `join_asof`, bounded
    `join_asof_tolerance`). Both candidates come from ONE
    key-partitioned ordered window pass over the tagged union
    (`operators/asof.py::asof_join_nearest`): `last` over the
    preceding frame is the backward candidate (equal-ts ties to the
    largest event_id, the backward convention), `first` over the
    strictly-following frame is the forward one (smallest id) — a
    single shuffle, no range-join candidate blowup on hot keys. The
    microsecond distance is exact integer arithmetic on both engines
    (unix_micros / epoch_us), so the direction choice can never be
    float-ambiguous. The oracle is the two ranked range joins
    composed with the same tie rule. The as-of times derive from the
    order key over 2023-12-24..2024-02-07 (the
    join_interval_containment trick), straddling the 30-day event
    window so BOTH directions and the no-match case all occur."""
    from bigdata_financial_reporting_spark.operators.asof import (
        asof_join_nearest,
    )

    o = load_table(spark, sf_dir, "orders").withColumn(
        "asof_ts",
        F.expr(
            "timestampadd(HOUR, CAST(o_orderkey % 1080 AS INT),"
            " TIMESTAMP '2023-12-24')"
        ),
    )
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join_nearest(
        left=o.select(
            "o_orderkey", F.col("o_custkey").alias("user_id"), "asof_ts"
        ),
        right=e,
        on="user_id",
        left_ts="asof_ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_id="event_id",
    )
    return joined.select(
        "o_orderkey",
        F.col("event_id").alias("nearest_event_id"),
        F.round("value", 6).alias("nearest_value"),
        F.col("__dir").alias("direction"),
        F.col("__dt_us").alias("dt_us"),
    )
