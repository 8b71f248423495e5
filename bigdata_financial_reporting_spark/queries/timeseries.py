"""Time-series / product-analytics queries over events: batch
sessionization, forward fill, snapshot diff, cohort retention."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.timeseries import (
    backward_fill,
    cohort_retention,
    forward_fill,
    sessionize,
    snapshot_diff,
)
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "ts_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM ordered
    """,
    category="timeseries",
)
def ts_sessionize(spark, sf_dir):
    """Batch sessionization (30-min gap) — the same gaps-and-islands
    semantics as the streaming session_window query, as columns."""
    ev = load_table(spark, sf_dir, "events")
    out = sessionize(ev, "user_id", "ts", 30, order_tiebreak=["event_id"])
    return out.select("user_id", "event_id", "session_id")


@register(
    "ts_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING), 6) AS v_filled
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      FROM events
    )
    """,
    category="timeseries",
)
def ts_forward_fill(spark, sf_dir):
    """Forward fill: clicks have their value masked to NULL, then the
    last non-null observation per user carries forward."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_type") == "click", None).otherwise(F.col("value"))
    )
    out = forward_fill(ev, "user_id", "ts", ["v"], order_tiebreak=["event_id"])
    return out.select(
        "user_id", "event_id", F.round("v", 6).alias("v_filled")
    )


@register(
    "ts_snapshot_diff",
    oracle="""
    WITH old AS (SELECT user_id, count(*) AS n FROM events
                 WHERE ts < TIMESTAMP '2024-01-20 00:00:00' GROUP BY user_id),
         new AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    SELECT COALESCE(new.user_id, old.user_id) AS user_id,
           CASE WHEN old.user_id IS NULL THEN 'inserted'
                WHEN new.user_id IS NULL THEN 'deleted'
                WHEN old.n <> new.n THEN 'updated' END AS change_type,
           old.n AS old_n, new.n AS new_n
    FROM old FULL JOIN new ON old.user_id = new.user_id
    WHERE (old.user_id IS NULL OR new.user_id IS NULL OR old.n <> new.n)
    """,
    category="timeseries",
)
def ts_snapshot_diff(spark, sf_dir):
    """CDC between two snapshots of a per-user aggregate (counts up to
    Jan 20 vs full range): inserted / deleted / updated rows only."""
    ev = load_table(spark, sf_dir, "events")
    old = (
        ev.filter(F.col("ts") < "2024-01-20")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    new = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return snapshot_diff(old, new, ["user_id"])


@register(
    "ts_funnel",
    oracle="""
    WITH ev AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
         v AS (SELECT user_id, min(ts) AS t_view FROM ev
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t_click
               FROM ev e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t_view
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t_purchase
               FROM ev e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click
               GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
    category="timeseries",
)
def ts_funnel(spark, sf_dir):
    """Ordered funnel: users who viewed, then clicked AFTER the first
    view, then purchased AFTER that click. Each stage is a keyed min
    aggregation + join — no window over the full event stream and no
    per-user event collection, so the shuffle stays user-sized.
    Restricted to the first two days so the ordering filters actually
    discriminate (92 -> 41 -> 21 at sf0.01); over the full month every
    user completes and the stage conditions never bite."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts") < "2024-01-03")

    def stage(prior, etype, prior_ts, out_ts):
        e = ev.filter(F.col("event_type") == etype)
        if prior is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))
        return (
            e.join(prior, "user_id")
            .filter(F.col("ts") > F.col(prior_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    # Each non-final stage feeds TWO consumers (the next stage's join
    # and its own funnel count) — unpersisted, the final plan re-ran
    # the whole cascade per consumer (six raw scans per action,
    # round-14 audit). The per-stage frames are user-count-sized
    # (one min-timestamp row per user), so persisting them restores
    # the designed cost: one filtered scan per stage.
    v = track(
        stage(None, "view", None, "t_view").persist(StorageLevel.MEMORY_AND_DISK)
    )
    c = track(
        stage(v, "click", "t_view", "t_click").persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    p = stage(c, "purchase", "t_click", "t_purchase")
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@register(
    "ts_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS bucket FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_s,
           CAST(date_diff('day', f.cohort, a.bucket) / 7 AS BIGINT) AS age,
           count(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort, age
    """,
    category="timeseries",
)
def ts_cohort_retention(spark, sf_dir):
    """Weekly cohort retention over events: first-activity week defines
    the cohort; n_active distinct users per (cohort, week age)."""
    ev = load_table(spark, sf_dir, "events")
    out = cohort_retention(ev, "user_id", "ts", "week")
    return out.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_s"), "age", "n_active"
    )


@register(
    "ts_inter_event_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           count(*) + 1 AS n_events,
           count(*) AS n_gaps,
           round(avg(gap_us) / 1e6, 3) AS avg_gap_sec,
           max(gap_us) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    category="timeseries",
)
def ts_inter_event_gaps(spark, sf_dir):
    """Inter-event gap distribution per user — the arrival-cadence
    census that sizes sessionization thresholds and watermark delays.
    One partitioned lag window + one map-side-combined aggregation,
    both keyed on user_id, so the two stages reuse a single shuffle
    partitioning. Users with a single event carry no gaps and drop
    out, exactly as in the SQL form. The mean is reported in seconds
    at 3 decimals: microsecond gaps are ~1e10, where a 6-decimal
    rounding would sit below double-precision ulp and make the value
    summation-order-dependent across engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_us") / 1e6, 3).alias("avg_gap_sec"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "ts_event_rate_anomaly",
    oracle="""
    WITH daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    ),
    stats AS (
      SELECT user_id, avg(n_events) AS mu, stddev_samp(n_events) AS sd,
             count(*) AS n_days
      FROM daily GROUP BY user_id
    )
    SELECT d.user_id, d.day, d.n_events,
           round(s.mu, 6) AS mean_daily,
           CASE WHEN s.n_days > 1 AND s.sd > 0
                THEN round((d.n_events - s.mu) / s.sd, 6) END AS z,
           (s.n_days > 1 AND s.sd > 0
            AND d.n_events > s.mu + 2 * s.sd) AS is_spike
    FROM daily d JOIN stats s USING (user_id)
    """,
    category="timeseries",
)
def ts_event_rate_anomaly(spark, sf_dir):
    """Per-user daily event-rate anomaly flags (rate > mean + 2 sigma
    of that user's own daily history) — the ops-monitoring screen for
    bot bursts / pipeline replays. Daily counts are exact integers, so
    the per-user stats are engine-stable; z is emitted only where a
    sample stddev exists (> 1 active day) and is positive. One shuffle
    on user_id shared by the count and the stats window."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    mu = F.mean("n_events").over(w)
    sd = F.stddev_samp("n_events").over(w)
    n_days = F.count(F.lit(1)).over(w)
    ok = (n_days > 1) & (sd > 0)
    return daily.select(
        "user_id",
        "day",
        "n_events",
        F.round(mu, 6).alias("mean_daily"),
        F.when(ok, F.round((F.col("n_events") - mu) / sd, 6)).alias("z"),
        (ok & (F.col("n_events") > mu + 2 * sd)).alias("is_spike"),
    )


@register(
    "ts_calendar_features",
    oracle="""
    SELECT DISTINCT
           strftime(ts, '%Y-%m-%d') AS day,
           isodow(ts) AS dow_iso,
           (isodow(ts) >= 6) AS is_weekend,
           weekofyear(ts) AS week_iso,
           quarter(ts) AS qtr,
           (ts::DATE = last_day(ts::DATE)) AS is_month_end,
           CAST(date_diff('day', DATE '2024-01-01', ts::DATE) AS INT)
             AS day_index
    FROM events
    """,
    category="timeseries",
)
def ts_calendar_features(spark, sf_dir):
    """Calendar feature extraction for forecasting models — and a
    deliberate cross-engine numbering pin: Spark's dayofweek() is
    1=Sunday while DuckDB's is 0=Sunday (and Spark 3+ dropped the 'u'
    format pattern), so BOTH sides emit the unambiguous ISO numbering
    (Monday=1) — Spark via ((dayofweek+5) % 7)+1 arithmetic, DuckDB
    via isodow(). Weekend flags, ISO weeks, quarters, month-end
    flags, and an epoch-anchored day index are all pure expressions —
    map-only, distinct-collapsed to one row per day."""
    ev = load_table(spark, sf_dir, "events")
    dow_iso = ((F.dayofweek("ts") + 5) % 7 + 1).cast("long")
    return ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        dow_iso.alias("dow_iso"),
        (dow_iso >= 6).alias("is_weekend"),
        F.weekofyear("ts").cast("long").alias("week_iso"),
        F.quarter("ts").cast("long").alias("qtr"),
        (F.to_date("ts") == F.last_day("ts")).alias("is_month_end"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_index"),
    ).distinct()


@register(
    "ts_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS cnt
      FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
    ),
    lagged AS (
      SELECT event_type, CAST(cnt AS DOUBLE) AS cnt,
             lag(cnt, 1) OVER w AS l1,
             lag(cnt, 2) OVER w AS l2,
             lag(cnt, 3) OVER w AS l3
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           round(corr(cnt, l1), 6) AS acf_1,
           round(corr(cnt, l2), 6) AS acf_2,
           round(corr(cnt, l3), 6) AS acf_3,
           count(*) AS n_days
    FROM lagged GROUP BY event_type
    """,
    category="timeseries",
)
def ts_autocorrelation(spark, sf_dir):
    """Autocorrelation of the daily event-count series per event type
    at lags 1..3 — the standard seasonality probe a forecasting
    pipeline runs before model selection. Two-step plan: a map-side-
    combined daily rollup (only (type, day, cnt) rows cross the
    exchange — bounded by types x days regardless of input size),
    then lags + corr() over the tiny per-type series. The expensive
    pass over raw events is the aggregation Spark already does
    partially per partition; the window runs on the reduced panel."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        F.col("cnt").cast("double").alias("cnt"),
        F.lag("cnt", 1).over(w).cast("double").alias("l1"),
        F.lag("cnt", 2).over(w).cast("double").alias("l2"),
        F.lag("cnt", 3).over(w).cast("double").alias("l3"),
    )
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("cnt", "l1"), 6).alias("acf_1"),
        F.round(F.corr("cnt", "l2"), 6).alias("acf_2"),
        F.round(F.corr("cnt", "l3"), 6).alias("acf_3"),
        F.count(F.lit(1)).alias("n_days"),
    )


@register(
    "ts_minmax_downsample",
    oracle="""
    WITH ranked AS (
      SELECT event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) - 1 AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bucketed AS (
      SELECT *, CAST(floor(rn * 16.0 / n) AS BIGINT) AS bucket FROM ranked
    ),
    extremes AS (
      SELECT event_type, bucket, event_id, ts, value,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value ASC, ts, event_id) AS r_min,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value DESC, ts, event_id) AS r_max
      FROM bucketed
    )
    SELECT event_type, bucket,
           CASE WHEN r_min = 1 THEN 'min' ELSE 'max' END AS kind,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           round(value, 6) AS value
    FROM extremes
    WHERE r_min = 1 OR r_max = 1
    """,
    category="timeseries",
)
def ts_minmax_downsample(spark, sf_dir):
    """Min-max downsampling for visualization (the scalable stand-in
    for the reference's plotly rendering, controller/app.py:563-618 —
    you cannot ship 100 TB of points to a browser): each per-type
    series is cut into 16 equal-count buckets and only the bucket's
    extreme points survive, preserving the visual envelope. Plan: one
    row_number window to assign buckets, one window pair for the
    extremes — all deterministic (value, ts, event_id tie-breaks).
    A row that is BOTH the bucket min and max (constant bucket)
    surfaces once as 'min', matching the oracle's CASE priority."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_cnt = Window.partitionBy("event_type")
    bucketed = ev.select(
        "event_type",
        "event_id",
        "ts",
        "value",
        F.floor(
            (F.row_number().over(w_ord) - 1) * 16 / F.count(F.lit(1)).over(w_cnt)
        )
        .cast("long")
        .alias("bucket"),
    )
    w_min = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("value").asc(), "ts", "event_id"
    )
    w_max = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("value").desc(), "ts", "event_id"
    )
    extremes = bucketed.select(
        "event_type",
        "bucket",
        "ts",
        "value",
        F.row_number().over(w_min).alias("r_min"),
        F.row_number().over(w_max).alias("r_max"),
    )
    return extremes.filter((F.col("r_min") == 1) | (F.col("r_max") == 1)).select(
        "event_type",
        "bucket",
        F.when(F.col("r_min") == 1, "min").otherwise("max").alias("kind"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("value", 6).alias("value"),
    )


@register(
    "ts_mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                         WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT)
             AS s_stat,
           count(*) AS n_pairs,
           CASE WHEN sum(CASE WHEN b.cnt > a.cnt THEN 1
                              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) > 0
                THEN 'increasing'
                WHEN sum(CASE WHEN b.cnt > a.cnt THEN 1
                              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) < 0
                THEN 'decreasing' ELSE 'none' END AS direction
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.day < b.day
    GROUP BY a.event_type
    """,
    category="timeseries",
)
def ts_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall trend statistic per event type: S = sum of
    sign(x_j - x_i) over all ordered day pairs — the standard
    nonparametric monotone-trend test a monitoring pipeline runs on
    its daily panels. The pair join is over the AGGREGATED daily
    panel (days² per key, ~435 pairs here), not raw events — the
    classic bounded-pair-space discipline: the corpus-sized table is
    reduced by a map-side-combined rollup first, so the quadratic
    step is over a panel whose size is set by the calendar, not the
    data volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = daily.select(
        F.col("event_type"), F.col("day").alias("day_a"), F.col("cnt").alias("cnt_a")
    )
    b = daily.select(
        F.col("event_type"), F.col("day").alias("day_b"), F.col("cnt").alias("cnt_b")
    )
    pairs = a.join(b, "event_type").filter(F.col("day_a") < F.col("day_b"))
    sgn = F.when(F.col("cnt_b") > F.col("cnt_a"), 1).when(
        F.col("cnt_b") < F.col("cnt_a"), -1
    ).otherwise(0)
    agg = pairs.groupBy("event_type").agg(
        F.sum(sgn).cast("long").alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return agg.select(
        "event_type",
        "s_stat",
        "n_pairs",
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("none")
        .alias("direction"),
    )


@register(
    "ts_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2
    ),
    m AS (SELECT event_type, avg(cnt) AS mu FROM daily GROUP BY 1),
    c AS (
      SELECT d.event_type, d.day,
             round(abs(sum(d.cnt - m.mu) OVER (
               PARTITION BY d.event_type ORDER BY d.day)), 6) AS a
      FROM daily d JOIN m USING (event_type)
    ),
    r AS (
      SELECT event_type, day, a,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY a DESC, day) AS rn
      FROM c
    )
    SELECT event_type, day AS cp_day, a AS cusum_max
    FROM r WHERE rn = 1
    """,
    category="timeseries",
)
def ts_changepoint_cusum(spark, sf_dir):
    """CUSUM changepoint detection per event type: cumulative sum of
    deviations from the series mean; the day where |CUSUM| peaks is
    the most likely single changepoint (Page '54 / Pettitt-style
    screen). Deterministic argmax — rank by the ROUNDED |CUSUM| with
    a day tie-break on both engines (a bare arg_max over doubles
    would tie-break by engine whim). All windows run on the
    calendar-bounded daily panel; the mean rides along as a broadcast
    per-key join, so the raw table is touched exactly once by the
    rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    m = daily.groupBy("event_type").agg(F.avg("cnt").alias("mu"))
    cum = F.sum(F.col("cnt") - F.col("mu")).over(
        Window.partitionBy("event_type").orderBy("day")
    )
    c = daily.join(F.broadcast(m), "event_type").select(
        "event_type", "day", F.round(F.abs(cum), 6).alias("a")
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("a"), "day")
    )
    return (
        c.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("day").alias("cp_day"), F.col("a").alias("cusum_max"))
    )


@register(
    "ts_theil_sen_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', ts::DATE) AS DOUBLE) AS d,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           round(quantile_cont((b.cnt - a.cnt) / (b.d - a.d), 0.5), 6)
             AS ts_slope,
           count(*) AS n_pairs
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.d < b.d
    GROUP BY a.event_type
    """,
    category="timeseries",
)
def ts_theil_sen_slope(spark, sf_dir):
    """Theil-Sen robust trend slope per event type: the median of all
    pairwise day-slopes of the daily panel — outlier-resistant where
    OLS (agg_regression_family) is not, and the natural companion to
    the Mann-Kendall S test. Same bounded-pair-space plan: the raw
    table reduces to the calendar-bounded panel first, the quadratic
    pair join runs on days² rows per key, and the median uses the
    same exact interpolating percentile both engines share."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("double")
        .alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    a = daily.select(
        "event_type", F.col("d").alias("da"), F.col("cnt").alias("ca")
    )
    b = daily.select(
        "event_type", F.col("d").alias("db"), F.col("cnt").alias("cb")
    )
    pairs = a.join(b, "event_type").filter(F.col("da") < F.col("db"))
    slope = (F.col("cb") - F.col("ca")) / (F.col("db") - F.col("da"))
    return pairs.groupBy("event_type").agg(
        F.round(F.percentile(slope, F.lit(0.5)), 6).alias("ts_slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) AS phase,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    seas AS (
      SELECT phase, sum(cnt) AS ps, count(*) AS pn FROM daily GROUP BY phase
    ),
    grand AS (
      SELECT sum(cnt) AS gs, count(*) AS gn FROM daily
    ),
    tr AS (
      SELECT day, phase, cnt,
             sum(cnt) OVER w AS tsum, count(*) OVER w AS tn
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT strftime(t.day, '%Y-%m-%d') AS day, CAST(t.cnt AS BIGINT) AS cnt,
           round(CAST(s.ps AS DOUBLE) / s.pn
                 - CAST(g.gs AS DOUBLE) / g.gn, 6) + 0 AS seasonal,
           round(CAST(t.tsum AS DOUBLE) / t.tn, 6) AS trend,
           round(CAST(t.cnt AS DOUBLE)
                 - CAST(t.tsum AS DOUBLE) / t.tn
                 - (CAST(s.ps AS DOUBLE) / s.pn
                    - CAST(g.gs AS DOUBLE) / g.gn), 6) + 0 AS residual
    FROM tr t JOIN seas s ON t.phase = s.phase CROSS JOIN grand g
    """,
    category="timeseries",
)
def ts_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition of the daily event-count
    series: seasonal = day-of-week mean minus grand mean, trend =
    7-day centered moving average, residual = actual − trend −
    seasonal — the classical-decomposition baseline every
    anomaly-detection pipeline starts from. Every mean is an
    exact-integer sum divided once at the end (no float crosses a
    shuffle); the trend frame is a ROWS window over the day-grained
    aggregate, so its cost is bounded by #days, not events. The
    single unpartitioned trend window runs over the DAILY table
    (corpus-size-independent); '+ 0' guards DuckDB's −0.0 on
    near-zero seasonal/residual cells."""
    from pyspark.sql import Window

    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    ev = load_table(spark, sf_dir, "events")
    # daily feeds the seasonal means, the grand mean, and the trend
    # window — unpersisted, three raw scans per action (round-14
    # audit). Day-count-sized; persist it: one scan.
    daily = track(
        ev.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.dayofweek(F.to_date("ts")).alias("phase"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seas = daily.groupBy("phase").agg(
        F.sum("cnt").alias("ps"), F.count(F.lit(1)).alias("pn")
    )
    grand = daily.agg(
        F.sum("cnt").alias("gs"), F.count(F.lit(1)).alias("gn")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "phase",
        "cnt",
        F.sum("cnt").over(w).alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tn"),
    )
    seasonal = F.col("ps").cast("double") / F.col("pn") - F.col("gs").cast(
        "double"
    ) / F.col("gn")
    trend = F.col("tsum").cast("double") / F.col("tn")
    return (
        tr.join(F.broadcast(seas), "phase")
        .crossJoin(F.broadcast(grand))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(trend, 6).alias("trend"),
            F.round(
                F.col("cnt").cast("double") - trend - seasonal, 6
            ).alias("residual"),
        )
    )


@register(
    "ts_value_histogram2d",
    oracle="""
    WITH b AS (
      SELECT CAST(hour(ts) AS INT) AS hour_of_day,
             CAST(least(9, CAST(floor(value / 50.0) AS BIGINT)) AS INT)
               AS value_band
      FROM events
    )
    SELECT hour_of_day, value_band, count(*) AS n
    FROM b GROUP BY hour_of_day, value_band
    """,
    category="timeseries",
)
def ts_value_histogram2d(spark, sf_dir):
    """2-D histogram (hour-of-day x value band) — the density heatmap
    behind every ops dashboard. Bands are fixed-width integer buckets
    (floor(value/50), capped at band 9), so the whole query is one
    exact-integer groupBy with map-side combine; the shuffle carries
    at most 24x10 cells regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.hour("ts").alias("hour_of_day"),
            F.least(
                F.lit(9), F.floor(F.col("value") / 50.0)
            ).cast("int").alias("value_band"),
        )
        .groupBy("hour_of_day", "value_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ts_backward_fill",
    oracle="""
    SELECT user_id, event_id,
           round(first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6)
             AS v_bfilled
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      FROM events
    )
    """,
    category="timeseries",
)
def ts_backward_fill(spark, sf_dir):
    """Backward fill (bfill), ts_forward_fill's mirror: clicks have
    their value masked to NULL, then the NEXT non-null observation per
    user carries backward — the alignment used when a late-arriving
    benchmark print must back-propagate to the gap before it.
    Trailing NULLs stay NULL.  The filled value is CARRIED, not
    computed (no arithmetic), so cross-engine equality is exact; the
    per-user window shuffles keys once and sorts within partitions
    only."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v",
        F.when(F.col("event_type") == "click", None).otherwise(
            F.col("value")
        ),
    )
    out = backward_fill(ev, "user_id", "ts", ["v"], order_tiebreak=["event_id"])
    return out.select(
        "user_id", "event_id", F.round("v", 6).alias("v_bfilled")
    )
