"""Financial market-data rollups over the events tick stream (and
lineitem as a trades table): OHLC bars, VWAP, drawdown, windowed EMA,
calendar gap-fill with linear interpolation, and per-series beta
against the market aggregate.

The reference's analytics surface is a daily-return pipeline over a
closing-price series (reference controller/app.py:457-491,
controller/script.py:33-50); these queries extend that family to the
standard rollups a financial reporting engine serves. Every query is a
single-shuffle window/agg plan keyed on the series id (`user_id` as
the instrument) — the same partitioning a 100-TB tick store would
already be bucketed by, so at scale these run shuffle-free on a
bucketed table.

Determinism: ties inside a day are broken by (ts, event_id) exactly as
the reference pipeline does; every derived float is rounded at 6dp on
both engines; cumulative folds run in the same (ts, event_id) order on
both sides.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

# DuckDB's arg_min/arg_max take scalar keys only, so the (ts, event_id)
# tie-break is encoded as one HUGEINT: epoch_us(ts) * 1e7 + event_id.
# event_id < 1e7 at every shipped SF; 1.7e15 * 1e7 = 1.7e22 is far
# inside HUGEINT range. The Spark side orders by the real struct.
_DUCK_TICK_KEY = "epoch_us(ts)::HUGEINT * 10000000 + event_id"


@register(
    "fin_ohlc_bars",
    oracle=f"""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d') AS day,
           arg_min(value, {_DUCK_TICK_KEY}) AS open_px,
           max(value) AS high_px,
           min(value) AS low_px,
           arg_max(value, {_DUCK_TICK_KEY}) AS close_px,
           count(*) AS n_ticks
    FROM events
    GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    """,
    category="finance",
)
def fin_ohlc_bars(spark, sf_dir):
    """Daily OHLC candlestick bars per instrument: open/close are the
    first/last tick by (ts, event_id) within the day — one map-side-
    combinable min_by/max_by aggregation, no window, one shuffle on
    (instrument, day). At 100 TB this is the canonical downsample that
    turns a tick store into a bar store."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.min_by("value", key).alias("open_px"),
        F.max("value").alias("high_px"),
        F.min("value").alias("low_px"),
        F.max_by("value", key).alias("close_px"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@register(
    "fin_vwap",
    oracle="""
    SELECT l_partkey,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS vwap,
           round(sum(l_quantity), 6) AS volume,
           count(*) AS n_trades
    FROM lineitem
    GROUP BY l_partkey
    """,
    category="finance",
)
def fin_vwap(spark, sf_dir):
    """Volume-weighted average price per instrument, treating lineitem
    as a trade blotter (extendedprice = notional-ish price, quantity =
    size). Pure hash aggregation with map-side partial sums — the
    textbook one-shuffle rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity"),
            6,
        ).alias("vwap"),
        F.round(F.sum("l_quantity"), 6).alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )


@register(
    "fin_drawdown",
    oracle="""
    WITH eq AS (
      SELECT user_id, ts, event_id,
             sum(value - 50.0) OVER w AS equity
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    curve AS (
      SELECT user_id, ts, event_id, equity,
             max(equity) OVER w AS peak
      FROM eq
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id,
           count(*) AS n_events,
           round(arg_max(equity, epoch_us(ts)::HUGEINT * 10000000 + event_id), 6)
             AS final_equity,
           round(max(peak), 6) AS peak_equity,
           round(max(peak - equity), 6) AS max_drawdown
    FROM curve
    GROUP BY user_id
    """,
    category="finance",
)
def fin_drawdown(spark, sf_dir):
    """Maximum drawdown per instrument over the signed P&L curve
    (tick value centred at 50 so the curve actually goes down). The
    equity curve, its running peak, and the drawdown all come from ONE
    ordered window per instrument; the summary is a keyed agg that
    reuses the same user_id partitioning — two stages, one shuffle.
    The cumulative fold is order-pinned by (ts, event_id) so both
    engines sum in the identical sequence."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    equity = F.sum(F.col("value") - 50.0).over(w)
    curve = ev.select(
        "user_id",
        "ts",
        "event_id",
        equity.alias("equity"),
        F.max(equity).over(w).alias("peak"),
    )
    key = F.struct("ts", "event_id")
    return curve.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max_by("equity", key), 6).alias("final_equity"),
        F.round(F.max("peak"), 6).alias("peak_equity"),
        F.round(F.max(F.col("peak") - F.col("equity")), 6).alias("max_drawdown"),
    )


@register(
    "fin_ema_window",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id,
           round(0.2 * sum(b.value * pow(0.8, a.rn - b.rn))
                 / (1 - pow(0.8, least(a.rn, 20))), 6) AS ema
    FROM o a JOIN o b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
    GROUP BY a.user_id, a.event_id, a.rn
    """,
    category="finance",
)
def fin_ema_window(spark, sf_dir):
    """Exponential moving average (alpha = 0.2) per instrument as a
    FINITE 20-tick window, renormalised so the warm-up rows are
    unbiased: ema_t = alpha * sum_k w^k x_{t-k} / (1 - w^n). The
    infinite-history EMA is a sequential recurrence that cannot
    parallelise; truncating at 20 taps (weight below 1.2% beyond
    that) turns it into an embarrassingly parallel windowed dot
    product — collect_list over a 20-row frame folded by one
    aggregate() expression, fully codegen, one shuffle. The oracle
    computes the identical sum via a banded self-join on row numbers."""
    ev = load_table(spark, sf_dir, "events")
    w20 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    # newest tick first so weight w^k indexes age directly
    arr = F.reverse(F.collect_list("value").over(w20))
    num = F.aggregate(
        arr,
        F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("k")),
        lambda acc, x: F.struct(
            (acc["s"] + x * F.pow(F.lit(0.8), acc["k"])).alias("s"),
            (acc["k"] + F.lit(1.0)).alias("k"),
        ),
        lambda acc: acc["s"],
    )
    n = F.size(arr)
    ema = F.lit(0.2) * num / (F.lit(1.0) - F.pow(F.lit(0.8), n.cast("double")))
    return ev.select("user_id", "event_id", F.round(ema, 6).alias("ema"))


@register(
    "fin_gapfill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day, avg(value) AS v
      FROM events GROUP BY user_id, ts::DATE
    ),
    b AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM b
    ),
    g AS (
      SELECT s.user_id, s.day, d.v
      FROM spine s LEFT JOIN daily d USING (user_id, day)
    ),
    f AS (
      SELECT user_id, day, v,
             last_value(v IGNORE NULLS) OVER wp AS vp,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER wp AS dp,
             first_value(v IGNORE NULLS) OVER wn AS vn,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER wn AS dn
      FROM g
      WINDOW wp AS (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING),
             wn AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           round(CASE WHEN v IS NOT NULL THEN v
                      ELSE vp + (vn - vp)
                           * date_diff('day', dp, day)::DOUBLE
                           / date_diff('day', dp, dn) END, 6) AS v_filled,
           (v IS NOT NULL) AS is_observed
    FROM f
    """,
    category="finance",
)
def fin_gapfill_interpolate(spark, sf_dir):
    """Calendar gap-fill + linear interpolation per instrument — the
    hypertable `time_bucket_gapfill(..., interpolate(...))` operation:
    build a per-instrument date spine (sequence + explode over the
    observed [min, max] day range, so edges are always observed), left
    join the daily averages, then interpolate interior gaps from the
    bracketing observations via two IGNORE-NULLS windows (last
    non-null looking back, first non-null looking forward). The spine
    explode is keyed by instrument, so the join and both windows share
    one user_id shuffle; nothing is corpus-sized on the driver."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("v")
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    g = spine.join(daily, ["user_id", "day"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_obs = F.when(F.col("v").isNotNull(), F.col("day"))
    f = g.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("vp"),
        F.last(day_if_obs, ignorenulls=True).over(wp).alias("dp"),
        F.first("v", ignorenulls=True).over(wn).alias("vn"),
        F.first(day_if_obs, ignorenulls=True).over(wn).alias("dn"),
    )
    interp = F.col("vp") + (F.col("vn") - F.col("vp")) * (
        F.datediff("day", "dp").cast("double") / F.datediff("dn", "dp")
    )
    return f.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp), 6
        ).alias("v_filled"),
        F.col("v").isNotNull().alias("is_observed"),
    )


@register(
    "fin_beta_market",
    oracle="""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day, avg(value) AS r
      FROM events GROUP BY user_id, ts::DATE
    ),
    market AS (
      SELECT day, avg(r) AS m FROM daily GROUP BY day
    )
    SELECT d.user_id,
           count(*) AS n_days,
           CASE WHEN count(*) > 1 AND var_samp(m.m) > 0
                THEN round(covar_samp(d.r, m.m) / var_samp(m.m), 6) END AS beta,
           CASE WHEN count(*) > 1 AND var_samp(m.m) > 0 AND var_samp(d.r) > 0
                THEN round(corr(d.r, m.m), 6) END AS corr_mkt
    FROM daily d JOIN market m USING (day)
    GROUP BY d.user_id
    """,
    category="finance",
)
def fin_beta_market(spark, sf_dir):
    """CAPM-style beta per instrument against the equal-weight market
    return: cov(instrument, market) / var(market) over that
    instrument's active days. The market series is one row per day —
    broadcast to the daily frame (pinned tiny side), so the only
    shuffle is the per-(instrument, day) aggregation. Beta/corr are
    emitted only where the sample variance exists and is positive,
    identically gated on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("r")
    )
    market = daily.groupBy("day").agg(F.avg("r").alias("m"))
    j = daily.join(F.broadcast(market), "day")
    n = F.count(F.lit(1))
    var_m = F.var_samp("m")
    ok = (n > 1) & (var_m > 0)
    return j.groupBy("user_id").agg(
        n.alias("n_days"),
        F.when(ok, F.round(F.covar_samp("r", "m") / var_m, 6)).alias("beta"),
        F.when(
            ok & (F.var_samp("r") > 0), F.round(F.corr("r", "m"), 6)
        ).alias("corr_mkt"),
    )
