"""Window-function queries (SURVEY.md §2B.5).

Every window here is PARTITIONED (per order / per user) except the
explicitly-small global one — the reference's unpartitioned
``Window.orderBy`` (script.py:39) collapses to one task and is kept
only as a small-input compatibility shape (see reference_pipeline).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="windows",
)
def window_lag_lead(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_default"),
    )


@register(
    "window_ranks",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank() OVER w2 AS rnk,
           dense_rank() OVER w2 AS drnk,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderstatus)
    """,
    category="windows",
)
def window_ranks(spark, sf_dir):
    """The rank family. row_number/ntile run on a TOTAL order (tie-broken
    by the unique key); rank/dense_rank demonstrate peer handling on a
    genuinely tied order (o_orderstatus)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "window_running_agg",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events
    """,
    category="windows",
)
def window_running_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_sum"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mov_avg_7,
           round(min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS min_5_centered
    FROM events
    """,
    category="windows",
)
def window_moving_avg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(base.rowsBetween(-6, 0)), 6).alias("mov_avg_7"),
        F.round(F.min("value").over(base.rowsBetween(-2, 2)), 6).alias(
            "min_5_centered"
        ),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS sum_1h,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h
    FROM events
    """,
    category="windows",
)
def window_range_frame(spark, sf_dir):
    """Time-based RANGE frame (trailing 1 hour per user). Spark's
    rangeBetween needs a numeric order key -> epoch seconds; RANGE
    includes ts-peers on both engines so results align even with
    duplicate timestamps."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    category="windows",
)
def window_first_last(spark, sf_dir):
    """first/last/nth value over a full-partition frame. Ordered on
    (o_orderdate, o_orderkey) — a TOTAL order (o_orderkey unique);
    lineitem's l_linenumber is NOT unique per order in this fixture, so
    it cannot pin first/last deterministically."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_global_small",
    oracle="""
    SELECT n_nationkey, n_name,
           row_number() OVER (ORDER BY n_name, n_nationkey) AS rn,
           lag(n_name) OVER (ORDER BY n_name, n_nationkey) AS prev_name
    FROM nation
    """,
    category="windows",
)
def window_global_small(spark, sf_dir):
    """Reference R9 shape — global unpartitioned window. Permitted only
    for provably small inputs (25-row dimension); large tables must use
    the partitioned forms above."""
    n = load_table(spark, sf_dir, "nation")
    w = Window.orderBy("n_name", "n_nationkey")
    return n.select(
        "n_nationkey",
        "n_name",
        F.row_number().over(w).alias("rn"),
        F.lag("n_name").over(w).alias("prev_name"),
    )


@register(
    "window_zscore_anomaly",
    oracle="""
    WITH stats AS (
      SELECT event_id, user_id, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sigma
      FROM events
      WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id,
           round((value - mu) / sigma, 6) AS z,
           abs((value - mu) / sigma) > 2 AS is_anomaly
    FROM stats
    WHERE sigma > 0
    """,
    category="windows",
)
def window_zscore_anomaly(spark, sf_dir):
    """Per-key z-score anomaly flags: each event scored against its
    user's mean/stddev via an unordered (whole-partition frame) window
    — one shuffle on the key, no self-join with a stats subquery."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sigma = F.stddev_samp("value").over(w)
    z = (F.col("value") - mu) / sigma
    return (
        ev.select(
            "event_id",
            "user_id",
            z.alias("z_raw"),
            sigma.alias("sigma"),
        )
        .filter(F.col("sigma") > 0)
        .select(
            "event_id",
            "user_id",
            F.round("z_raw", 6).alias("z"),
            (F.abs("z_raw") > 2).alias("is_anomaly"),
        )
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round(l_extendedprice, 4) AS price,
           CAST(ntile(4) OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS INT)
             AS quartile
    FROM lineitem
    WHERE l_orderkey < 5000
    """,
    category="windows",
)
def window_ntile_quartiles(spark, sf_dir):
    """ntile(4) quartile assignment within each return-flag group —
    the remaining rank-family member (row_number/rank/dense_rank/
    percent_rank/cume_dist live in window_rank_family). Total order
    pinned by the unique (orderkey, linenumber) tie-break so bucket
    boundaries are engine-identical."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round("l_extendedprice", 4).alias("price"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_longest_streak",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value > lag(value) OVER w THEN 1 ELSE 0 END AS inc
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id,
             sum(1 - inc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS grp
      FROM o
    ),
    runs AS (
      SELECT user_id, grp, count(*) AS run_len
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id,
           max(run_len) AS longest_streak,
           count(*) AS n_runs
    FROM runs GROUP BY user_id
    """,
    category="windows",
)
def window_longest_streak(spark, sf_dir):
    """Longest strictly-increasing run per series — the gaps-and-
    islands pattern (lag → reset flag → cumulative group id → run
    lengths). A sequential scan in an imperative engine; here it is
    two ordered windows plus two aggregations, ALL keyed on the series
    id, so the whole pipeline rides one user_id shuffle. A run of
    length n means n consecutive ticks where each strictly exceeds the
    previous (the run includes its starting tick)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inc = F.when(
        F.col("value") > F.lag("value").over(w), F.lit(1)
    ).otherwise(F.lit(0))
    g = ev.select(
        "user_id", "ts", "event_id", inc.alias("inc")
    ).select(
        "user_id",
        F.sum(F.lit(1) - F.col("inc")).over(wc).alias("grp"),
    )
    runs = g.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_runs"),
    )


@register(
    "window_distinct_count_frame",
    oracle="""
    SELECT user_id, event_id,
           count(DISTINCT event_type) OVER w10 AS n_types_10,
           count(*) OVER w10 AS n_rows_10
    FROM events
    WINDOW w10 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
    category="windows",
)
def window_distinct_count_frame(spark, sf_dir):
    """Distinct count over a sliding frame — the behavioral-diversity
    signal (how many distinct actions in the last 10 events). Spark
    does not allow DISTINCT aggregates in windows, so the engine
    composes it: collect_list over the frame → array_distinct → size,
    all codegen, same single instrument-keyed shuffle as any frame
    aggregate. The oracle uses DuckDB's native count(DISTINCT) OVER."""
    ev = load_table(spark, sf_dir, "events")
    w10 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(
            F.array_distinct(F.collect_list("event_type").over(w10))
        ).cast("long").alias("n_types_10"),
        F.count(F.lit(1)).over(w10).alias("n_rows_10"),
    )


@register(
    "window_hampel_outliers",
    oracle="""
    WITH w7 AS (
      SELECT event_type, event_id, value,
             list_sort(list(value) OVER w) AS a
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    med AS (
      SELECT *,
             CASE WHEN len(a) % 2 = 1 THEN a[(len(a) + 1) // 2]
                  ELSE (a[len(a) // 2] + a[len(a) // 2 + 1]) / 2.0
             END AS m
      FROM w7
    ),
    mad_ AS (
      SELECT event_type, event_id, value, m,
             list_sort(list_transform(a, v -> abs(v - m))) AS d
      FROM med
    )
    SELECT event_type, event_id, round(m, 6) AS med,
           round(CASE WHEN len(d) % 2 = 1 THEN d[(len(d) + 1) // 2]
                      ELSE (d[len(d) // 2] + d[len(d) // 2 + 1]) / 2.0
                 END, 6) AS mad,
           (abs(value - m) > 3 * 1.4826 *
             CASE WHEN len(d) % 2 = 1 THEN d[(len(d) + 1) // 2]
                  ELSE (d[len(d) // 2] + d[len(d) // 2 + 1]) / 2.0
             END) AS is_outlier
    FROM mad_
    """,
    category="windows",
)
def window_hampel_outliers(spark, sf_dir):
    """Hampel filter: a point is an outlier when it deviates from the
    rolling 7-point median by more than 3 scaled rolling MADs — the
    robust despiking standard for sensor/tick streams (a moving
    z-score melts when the spike itself inflates the stddev; medians
    do not). One per-key window collects the 7-row frame; median and
    MAD are explicit sorted-array arithmetic IN the projection —
    deliberately not each engine's median() (DuckDB's list median is
    discrete, Spark's percentile interpolates; the explicit form is
    bit-identical on both). Frame shrinks at series edges, handled by
    the same even/odd arithmetic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    base = ev.select(
        "event_type",
        "event_id",
        "value",
        F.array_sort(F.collect_list("value").over(w)).alias("a"),
    )

    def arr_median(col):
        n = F.size(col)
        odd = F.element_at(col, ((n + 1) / 2).cast("int"))
        even = (
            F.element_at(col, (n / 2).cast("int"))
            + F.element_at(col, (n / 2 + 1).cast("int"))
        ) / 2.0
        return F.when(n % 2 == 1, odd).otherwise(even)

    med = base.withColumn("m", arr_median(F.col("a")))
    mad_arr = F.array_sort(
        F.transform(F.col("a"), lambda v: F.abs(v - F.col("m")))
    )
    out = med.withColumn("mad_v", arr_median(mad_arr))
    return out.select(
        "event_type",
        "event_id",
        F.round("m", 6).alias("med"),
        F.round("mad_v", 6).alias("mad"),
        (F.abs(F.col("value") - F.col("m")) > 3 * 1.4826 * F.col("mad_v")).alias(
            "is_outlier"
        ),
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM lineitem
    WHERE l_orderkey < 500
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
    category="windows",
)
def window_percent_rank_cume(spark, sf_dir):
    """Relative-position window functions: percent_rank ((rank-1)/
    (n-1)) and cume_dist (rows_at_or_below/n) of each line's quantity
    within its return-flag class. Both are quotients of exact
    integers computed by the SAME formula in both engines, emitted
    UNROUNDED — identical integer inputs give bit-identical doubles,
    and rounding a rational quotient would reintroduce the exact-half
    divergence (functions/exact.py)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 500
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_nth_value_frames",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           nth_value(value, 3) OVER w AS third_v,
           last_value(value) OVER w AS last_v,
           value
    FROM events
    WHERE user_id < 40
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    category="windows",
)
def window_nth_value_frames(spark, sf_dir):
    """first/nth/last value over the FULL-partition frame — the frame
    most people get wrong (the default frame stops at CURRENT ROW, so
    last_value degenerates to the current value; the explicit
    UNBOUNDED FOLLOWING bound is the fix, identical in both engines).
    Values pass through untouched (no arithmetic, no rounding);
    ordering is pinned by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.nth_value("value", 3).over(w).alias("third_v"),
        F.last("value").over(w).alias("last_v"),
        "value",
    )


@register(
    "window_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, ts::DATE AS day FROM events
    ),
    numbered AS (
      SELECT user_id, day,
             CAST(day - DATE '2024-01-01' AS INT)
             - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INT) AS island_key
      FROM days
    )
    SELECT user_id,
           strftime(min(day), '%Y-%m-%d') AS start_day,
           strftime(max(day), '%Y-%m-%d') AS end_day,
           count(*) AS n_days
    FROM numbered
    GROUP BY user_id, island_key
    """,
    category="windows",
)
def window_gaps_islands(spark, sf_dir):
    """Gaps-and-islands over activity DAYS: maximal runs of
    consecutive active days per user (the streak/retention primitive).
    The classic trick — day_number minus row_number is constant
    exactly within a consecutive run — needs only one per-user window
    over the DISTINCT (user, day) pairs (corpus-size-independent:
    at most users x days rows), then a keyed aggregation. Everything
    is exact integer/date arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    numbered = days.withColumn(
        "island_key",
        F.datediff("day", F.lit("2024-01-01")) - F.row_number().over(w),
    )
    return (
        numbered.groupBy("user_id", "island_key")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("start_day"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("island_key")
        .select("user_id", "start_day", "end_day", "n_days")
    )


@register(
    "window_running_median",
    oracle="""
    SELECT user_id, event_id,
           CAST(round(2 * quantile_cont(vq, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)) AS BIGINT)
             AS med2_micro
    FROM (
      SELECT user_id, event_id, ts,
             CAST(round(value * 1000000.0) AS BIGINT) AS vq
      FROM events
    )
    """,
    category="windows",
)
def window_running_median(spark, sf_dir):
    """Rolling 15-row median per user — the robust smoother a spike-
    laden metric needs where a moving AVERAGE chases outliers.  Frame-
    bounded (14 PRECEDING..CURRENT), so cost is O(rows x 15), never
    the O(rows x history) an expanding exact median would cost — at
    100 TB the per-user window shuffles keys once and each median
    sorts 15 values.  Exactness: the value is micro-quantized to
    integers FIRST, and both engines' even-count interpolation
    (lower + (upper-lower)*0.5 vs (lower+upper)/2) is exact on
    integers < 2^52 — identical rationals, identical doubles — so the
    emitted 2x-median is an exact BIGINT at any scale (the
    float-determinism discipline; a raw double median's lerp would be
    formula-dependent)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000.0).cast("long").alias("vq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.percentile("vq", F.lit(0.5)).over(w) * 2)
        .cast("long")
        .alias("med2_micro"),
    )
