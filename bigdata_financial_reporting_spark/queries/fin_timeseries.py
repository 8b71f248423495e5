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

from bigdata_financial_reporting_spark.functions.exact import (
    duck_dec2d,
    duck_half_div,
    duck_units,
    spark_dec2d,
    spark_half_div,
)
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

# DuckDB's arg_min/arg_max take scalar keys only, so the (ts, event_id)
# tie-break is encoded as one HUGEINT: epoch_us(ts) * 1e7 + event_id.
# event_id < 1e7 at every shipped SF; 1.7e15 * 1e7 = 1.7e22 is far
# inside HUGEINT range. The Spark side orders by the real struct.
_DUCK_TICK_KEY = "epoch_us(ts)::HUGEINT * 10000000 + event_id"


def _ema_literals(alpha: float, taps: int) -> tuple[list[float], list[float]]:
    """EMA tap weights (1-alpha)^k, k=0..taps-1, and renormalization
    denominators 1-(1-alpha)^n, n=1..taps, as PLAIN DOUBLE VALUES
    computed once here and injected into BOTH engines as literals
    (Spark F.lit / DuckDB list literal via repr — shortest-roundtrip,
    parsed back to the identical IEEE double). Neither JVM Math.pow
    nor DuckDB std::pow is correctly rounded, so letting each engine
    raise (1-alpha)^k itself can differ by an ulp and flip a
    round(...,6) cell sitting on a 6dp boundary (round-7 ADVICE
    item 2 — the same divergence class as the dec2d casts)."""
    w = 1.0 - alpha
    weights = [w**k for k in range(taps)]
    denoms = [1.0 - w**n for n in range(1, taps + 1)]
    return weights, denoms


def _duck_list(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]"


_EMA20_W, _EMA20_D = _ema_literals(0.2, 20)
_MACD_W12, _MACD_D12 = _ema_literals(2.0 / 13.0, 26)
_MACD_W26, _MACD_D26 = _ema_literals(2.0 / 27.0, 26)
_MACD_W9, _MACD_D9 = _ema_literals(2.0 / 10.0, 9)


def _spark_ema_fold(arr, alpha: float, weights: list[float], denoms: list[float]):
    """alpha * (newest-first weighted fold of ``arr``) / (1 - w^n),
    with every weight an injected literal shared with the oracle —
    no pow() evaluated by either engine (see _ema_literals)."""
    warr = F.array(*[F.lit(v) for v in weights])
    darr = F.array(*[F.lit(v) for v in denoms])
    num = F.aggregate(
        arr,
        F.struct(F.lit(0.0).alias("s"), F.lit(1).alias("k")),
        lambda acc, x: F.struct(
            (acc["s"] + x * F.element_at(warr, acc["k"])).alias("s"),
            (acc["k"] + F.lit(1)).alias("k"),
        ),
        lambda acc: acc["s"],
    )
    return F.lit(alpha) * num / F.element_at(darr, F.size(arr))


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
    WITH c AS (
      SELECT l_partkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(round(l_quantity) AS BIGINT) AS qty_i
      FROM lineitem
    ),
    s AS (
      SELECT l_partkey,
             sum(price_c * qty_i) AS notional_cq,
             sum(qty_i) AS vol_i,
             count(*) AS n_trades
      FROM c GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST({q} AS DOUBLE) / 1000000.0 AS vwap,
           CAST(vol_i AS DOUBLE) AS volume,
           n_trades
    FROM s
    """.format(q=duck_half_div("notional_cq * 10000", "vol_i")),
    category="finance",
)
def fin_vwap(spark, sf_dir):
    """Volume-weighted average price per instrument, treating lineitem
    as a trade blotter (extendedprice = notional-ish price, quantity =
    size). Pure hash aggregation with map-side partial sums — the
    textbook one-shuffle rollup.

    Notional sums run in EXACT integer (cents x integral qty) in
    decimal(38,0): a raw double sum's merge order drifted 18/20000
    cells past the 6th decimal at the 10x corpus (round-6 at-scale
    red). The 6dp vwap then renders via pure-integer half-away
    division (see functions/exact.py: a float round() of the quotient
    lands on exact 6dp halves, where the engines' round() disagree) —
    no double forms until the single final conversion, mirrored
    verbatim in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty_i = F.round(F.col("l_quantity")).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.sum(dec(price_c * qty_i)).alias("notional_cq"),
            F.sum(dec(qty_i)).alias("vol_i"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            "l_partkey",
            (
                F.expr(spark_half_div("notional_cq * 10000", "vol_i")).cast(
                    "double"
                )
                / 1000000.0
            ).alias("vwap"),
            F.col("vol_i").cast("double").alias("volume"),
            "n_trades",
        )
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
    -- '+ 0' after each round: DuckDB's C++ round preserves the sign
    -- of zero (round(-1e-9, 6) -> -0.0) while Spark's BigDecimal
    -- round cannot emit -0.0; one such cell fails the driver's value
    -- hash (the emb_covariance_matrix r05 failure class — the 10x
    -- -0.0 sweep caught two here). IEEE: -0.0 + 0 = +0.0.
    SELECT user_id,
           count(*) AS n_events,
           round(arg_max(equity, epoch_us(ts)::HUGEINT * 10000000 + event_id), 6)
             + 0 AS final_equity,
           round(max(peak), 6) + 0 AS peak_equity,
           round(max(peak - equity), 6) + 0 AS max_drawdown
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
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id,
           round(0.2 * list_aggregate(
                   list(b.value * ({_duck_list(_EMA20_W)})[a.rn - b.rn + 1]
                        ORDER BY b.rn DESC), 'sum')
                 / ({_duck_list(_EMA20_D)})[least(a.rn, 20)], 6) AS ema
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
    ema = _spark_ema_fold(arr, 0.2, _EMA20_W, _EMA20_D)
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
    shuffle is the per-(instrument, day) aggregation. The daily panel
    feeds BOTH the market aggregate and the join probe, so it is
    persisted (tracked) — otherwise each consumer re-scans and
    re-aggregates the full tick stream. Beta/corr are emitted only
    where the sample variance exists and is positive, identically
    gated on both engines."""
    from bigdata_financial_reporting_spark.operators.cache import track

    ev = load_table(spark, sf_dir, "events")
    daily = track(
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("r"))
        .persist()
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


@register(
    "fin_rsi_window",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             value - lag(value) OVER w AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, ts, event_id,
             avg(CASE WHEN chg > 0 THEN chg ELSE 0 END) OVER w14 AS avg_gain,
             avg(CASE WHEN chg < 0 THEN -chg ELSE 0 END) OVER w14 AS avg_loss,
             count(chg) OVER w14 AS n_chg
      FROM d
      WINDOW w14 AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CASE WHEN n_chg >= 14 THEN
             round(CASE WHEN avg_loss = 0 THEN 100.0
                        ELSE 100.0 - 100.0 / (1 + avg_gain / avg_loss) END, 6)
           END AS rsi
    FROM g
    """,
    category="finance",
)
def fin_rsi_window(spark, sf_dir):
    """Relative Strength Index over a simple 14-tick window (Cutler's
    RSI — the simple-moving-average variant; Wilder's original smooths
    recursively and cannot parallelise, which is exactly why the SMA
    variant is the standard distributed form). Two stacked windows on
    one instrument-keyed shuffle; RSI is emitted only once 14 changes
    exist, and the all-gains edge case pins to 100 on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w14 = w.rowsBetween(-13, Window.currentRow)
    chg = F.col("value") - F.lag("value").over(w)
    d = ev.select("user_id", "ts", "event_id", chg.alias("chg"))
    avg_gain = F.avg(F.when(F.col("chg") > 0, F.col("chg")).otherwise(0.0)).over(w14)
    avg_loss = F.avg(F.when(F.col("chg") < 0, -F.col("chg")).otherwise(0.0)).over(w14)
    n_chg = F.count("chg").over(w14)
    rsi = F.when(
        F.col("avg_loss") == 0, F.lit(100.0)
    ).otherwise(F.lit(100.0) - F.lit(100.0) / (1 + F.col("avg_gain") / F.col("avg_loss")))
    g = d.select(
        "user_id", "event_id",
        avg_gain.alias("avg_gain"), avg_loss.alias("avg_loss"),
        n_chg.alias("n_chg"),
    )
    return g.select(
        "user_id", "event_id",
        F.when(F.col("n_chg") >= 14, F.round(rsi, 6)).alias("rsi"),
    )


@register(
    "fin_bollinger_bands",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER w20, 6) AS mid,
           CASE WHEN count(*) OVER w20 > 1 THEN
             round(avg(value) OVER w20 + 2 * stddev_samp(value) OVER w20, 6)
           END AS upper_band,
           CASE WHEN count(*) OVER w20 > 1 THEN
             round(avg(value) OVER w20 - 2 * stddev_samp(value) OVER w20, 6)
           END AS lower_band
    FROM events
    WINDOW w20 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    category="finance",
)
def fin_bollinger_bands(spark, sf_dir):
    """Bollinger bands: 20-tick moving mean ± 2 sample standard
    deviations, one sliding frame per instrument — mean, stddev, and
    count all share the single w20 frame, so Spark computes them in
    one window pass over one shuffle. Bands are NULL until a second
    observation exists (sample stddev undefined), identically gated
    in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    w20 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    mid = F.avg("value").over(w20)
    sd = F.stddev_samp("value").over(w20)
    has_sd = F.count(F.lit(1)).over(w20) > 1
    return ev.select(
        "user_id", "event_id",
        F.round(mid, 6).alias("mid"),
        F.when(has_sd, F.round(mid + 2 * sd, 6)).alias("upper_band"),
        F.when(has_sd, F.round(mid - 2 * sd, 6)).alias("lower_band"),
    )


@register(
    "fin_sharpe_by_instrument",
    oracle="""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day, avg(value) AS px
      FROM events GROUP BY user_id, ts::DATE
    ),
    rets AS (
      SELECT user_id,
             px / lag(px) OVER (PARTITION BY user_id ORDER BY day) - 1 AS r
      FROM daily
    )
    SELECT user_id,
           count(r) AS n_returns,
           round(avg(r), 6) AS mean_ret,
           CASE WHEN count(r) > 1 AND stddev_samp(r) > 0
                THEN round(avg(r) / stddev_samp(r) * sqrt(252), 6) END
             AS sharpe_ann
    FROM rets
    GROUP BY user_id
    """,
    category="finance",
)
def fin_sharpe_by_instrument(spark, sf_dir):
    """Annualised Sharpe ratio per instrument over daily simple
    returns (zero risk-free rate, sqrt-252 annualisation): daily
    close proxy → lag return → mean/stddev — the window and both
    aggregations share one user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("px")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    rets = daily.select(
        "user_id", (F.col("px") / F.lag("px").over(w) - 1).alias("r")
    )
    n = F.count("r")
    sd = F.stddev_samp("r")
    return rets.groupBy("user_id").agg(
        n.alias("n_returns"),
        F.round(F.avg("r"), 6).alias("mean_ret"),
        F.when(
            (n > 1) & (sd > 0),
            F.round(F.avg("r") / sd * F.lit(252.0) ** 0.5, 6),
        ).alias("sharpe_ann"),
    )


@register(
    "fin_return_corr_pairs",
    oracle="""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day, avg(value) AS r
      FROM events WHERE user_id < 20 GROUP BY user_id, ts::DATE
    )
    SELECT a.user_id AS id_a, b.user_id AS id_b,
           count(*) AS n_days,
           CASE WHEN count(*) > 1 AND var_samp(a.r) > 0 AND var_samp(b.r) > 0
                THEN round(corr(a.r, b.r), 6) END AS corr_ab
    FROM daily a JOIN daily b
      ON a.day = b.day AND a.user_id < b.user_id
    GROUP BY a.user_id, b.user_id
    """,
    category="finance",
)
def fin_return_corr_pairs(spark, sf_dir):
    """Pairwise daily-value correlation matrix for a basket of 20
    instruments (190 pairs) — the portfolio-risk input. The self-join
    keys on the day so a pair only aligns on shared days; the basket
    bound caps the pair space at #basket^2 REGARDLESS of corpus size
    (at 100 TB you choose the basket, never all-pairs — the same
    blocking discipline as the dedup family). One shuffle builds the
    daily panel, the day-keyed join aligns it, the pair aggregation
    reuses the join's output."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("r")
    )
    a = daily.select(
        F.col("user_id").alias("id_a"), "day", F.col("r").alias("ra")
    )
    b = daily.select(
        F.col("user_id").alias("id_b"), "day", F.col("r").alias("rb")
    )
    j = a.join(b, "day").filter(F.col("id_a") < F.col("id_b"))
    n = F.count(F.lit(1))
    ok = (n > 1) & (F.var_samp("ra") > 0) & (F.var_samp("rb") > 0)
    return j.groupBy("id_a", "id_b").agg(
        n.alias("n_days"),
        F.when(ok, F.round(F.corr("ra", "rb"), 6)).alias("corr_ab"),
    )


@register(
    "fin_hhi_concentration",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(l_shipdate) AS INT) AS yr, l_suppkey,
             sum(l_extendedprice) AS v
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT yr, sum(v) AS tv FROM vol GROUP BY yr)
    SELECT vol.yr, round(sum((v / tv) * (v / tv)), 6) AS hhi,
           count(*) AS n_suppliers
    FROM vol JOIN tot USING (yr)
    GROUP BY vol.yr
    """,
    category="finance",
)
def fin_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman index of supplier revenue concentration
    per year — the antitrust/market-structure metric (1/n when
    perfectly competitive, 1.0 for a monopoly). Two map-side-combined
    rollups: fact table → (year, supplier) volumes (the only pass
    over the big table), then year totals broadcast back to square
    the shares. The share space is |years| × |suppliers| however
    large the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = li.groupBy(
        F.year("l_shipdate").alias("yr"), "l_suppkey"
    ).agg(F.sum("l_extendedprice").alias("v"))
    tot = vol.groupBy("yr").agg(F.sum("v").alias("tv"))
    return (
        vol.join(F.broadcast(tot), "yr")
        .groupBy("yr")
        .agg(
            F.round(
                F.sum((F.col("v") / F.col("tv")) * (F.col("v") / F.col("tv"))), 6
            ).alias("hhi"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "fin_var_expected_shortfall",
    oracle="""
    WITH q AS (
      SELECT event_type, round(quantile_cont(value, 0.01), 6) AS var99
      FROM events GROUP BY 1
    )
    SELECT v.event_type, max(q.var99) AS var99,
           round(avg(CASE WHEN v.value <= q.var99 THEN v.value END), 6)
             AS es99,
           CAST(sum(CASE WHEN v.value <= q.var99 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tail
    FROM events v JOIN q USING (event_type)
    GROUP BY v.event_type
    """,
    category="finance",
)
def fin_var_expected_shortfall(spark, sf_dir):
    """Historical 99% value-at-risk and expected shortfall per
    instrument: the 1st percentile of the P&L proxy and the mean of
    the tail at or below it. The exact interpolating percentile runs
    in one pass; the tiny per-key VaR frame broadcasts back for the
    tail average. The tail membership test uses the ROUNDED VaR on
    both engines — filtering on the raw interpolated double would
    make boundary rows engine-dependent."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.01)), 6).alias("var99")
    )
    j = ev.join(F.broadcast(q), "event_type")
    in_tail = F.col("value") <= F.col("var99")
    return j.groupBy("event_type").agg(
        F.max("var99").alias("var99"),
        F.round(F.avg(F.when(in_tail, F.col("value"))), 6).alias("es99"),
        F.sum(F.when(in_tail, 1).otherwise(0)).cast("long").alias("n_tail"),
    )


# Shared DuckDB fragment: daily OHLC-ish bars per instrument (close by
# the (ts, event_id) tie-break key, like fin_ohlc_bars).
_DUCK_BARS = f"""
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             max(value) AS high, min(value) AS low,
             arg_max(value, {_DUCK_TICK_KEY}) AS close,
             count(*) AS n_ticks
      FROM events GROUP BY 1, 2
"""


@register(
    "fin_macd_daily",
    oracle=f"""
    WITH bars AS ({_DUCK_BARS}),
    o AS (
      SELECT user_id, day, close,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM bars
    ),
    ema AS (
      SELECT a.user_id, a.day, a.rn,
             (2.0 / 13.0) * list_aggregate(
               list(b.close * ({_duck_list(_MACD_W12)})[a.rn - b.rn + 1]
                    ORDER BY b.rn DESC), 'sum')
               / ({_duck_list(_MACD_D12)})[least(a.rn, 26)] AS ema12,
             (2.0 / 27.0) * list_aggregate(
               list(b.close * ({_duck_list(_MACD_W26)})[a.rn - b.rn + 1]
                    ORDER BY b.rn DESC), 'sum')
               / ({_duck_list(_MACD_D26)})[least(a.rn, 26)] AS ema26
      FROM o a JOIN o b
        ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 25 AND a.rn
      GROUP BY a.user_id, a.day, a.rn
    ),
    m AS (SELECT user_id, day, rn, ema12 - ema26 AS macd FROM ema),
    sig AS (
      SELECT a.user_id, a.day, a.macd,
             (2.0 / 10.0) * list_aggregate(
               list(b.macd * ({_duck_list(_MACD_W9)})[a.rn - b.rn + 1]
                    ORDER BY b.rn DESC), 'sum')
               / ({_duck_list(_MACD_D9)})[least(a.rn, 9)] AS signal
      FROM m a JOIN m b
        ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 8 AND a.rn
      GROUP BY a.user_id, a.day, a.rn, a.macd
    )
    SELECT user_id, day,
           round(macd, 6) + 0 AS macd,
           round(signal, 6) + 0 AS signal,
           round(macd - signal, 6) + 0 AS histogram
    FROM sig
    """,
    category="finance",
)
def fin_macd_daily(spark, sf_dir):
    """MACD on the daily close series per instrument: EMA(12) -
    EMA(26), with the 9-day signal line and histogram. EMAs use the
    house finite-window renormalized form (fin_ema_window): a
    26-tap windowed dot product, embarrassingly parallel instead of a
    sequential recurrence. Both the EMA and the signal fold their taps
    NEWEST-FIRST over an ordered list on BOTH engines (F.aggregate
    over the reversed frame ↔ list(... ORDER BY rn DESC) +
    list_aggregate), so even the float summation order is pinned.
    Two window passes over the tiny bar series; the tick->bar
    reduction is the only full scan."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bars = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    wday = Window.partitionBy("user_id").orderBy("day")

    arr26 = F.reverse(
        F.collect_list("close").over(wday.rowsBetween(-25, 0))
    )
    m = bars.select(
        "user_id",
        "day",
        (
            _spark_ema_fold(arr26, 2.0 / 13.0, _MACD_W12, _MACD_D12)
            - _spark_ema_fold(arr26, 2.0 / 27.0, _MACD_W26, _MACD_D26)
        ).alias("macd"),
    )
    arr9 = F.reverse(F.collect_list("macd").over(wday.rowsBetween(-8, 0)))
    sig = m.select(
        "user_id",
        "day",
        "macd",
        _spark_ema_fold(arr9, 2.0 / 10.0, _MACD_W9, _MACD_D9).alias("signal"),
    )
    return sig.select(
        "user_id",
        "day",
        F.round("macd", 6).alias("macd"),
        F.round("signal", 6).alias("signal"),
        F.round(F.col("macd") - F.col("signal"), 6).alias("histogram"),
    )


@register(
    "fin_atr_14",
    oracle=f"""
    WITH bars AS ({_DUCK_BARS}),
    tr AS (
      SELECT user_id, day,
             CAST(round(greatest(
               high - low,
               abs(high - coalesce(lag(close) OVER w, close)),
               abs(low - coalesce(lag(close) OVER w, close))
             ) * 1000000.0) AS BIGINT) AS tr_micro
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    roll AS (
      SELECT user_id, day, tr_micro,
             sum(tr_micro) OVER f AS s,
             count(*) OVER f AS c
      FROM tr
      WINDOW f AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day, tr_micro,
           CAST(s AS DOUBLE) / 1000000.0 / c AS atr
    FROM roll
    """,
    category="finance",
)
def fin_atr_14(spark, sf_dir):
    """14-day Average True Range per instrument on the daily bars:
    TR = max(high-low, |high-prev_close|, |low-prev_close|) (first bar
    falls back to high-low). TR micro-quantizes to an exact integer,
    the rolling sum runs in decimal(38,0) over a 14-row frame, and ATR
    renders with one fixed int->double division — no float round, so
    the cells are bit-identical at any scale."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bars = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
    )
    w = Window.partitionBy("user_id").orderBy("day")
    pc = F.coalesce(F.lag("close").over(w), F.col("close"))
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - pc),
        F.abs(F.col("low") - pc),
    )
    t = bars.select(
        "user_id",
        "day",
        F.round(tr * 1000000.0).cast("long").alias("tr_micro"),
    )
    f = w.rowsBetween(-13, 0)
    return t.select(
        "user_id",
        "day",
        "tr_micro",
        (
            F.sum(F.col("tr_micro").cast("decimal(38,0)")).over(f).cast("double")
            / 1000000.0
            / F.count(F.lit(1)).over(f)
        ).alias("atr"),
    )


@register(
    "fin_obv",
    oracle=f"""
    WITH bars AS ({_DUCK_BARS}),
    d AS (
      SELECT user_id, day, n_ticks,
             CASE WHEN lag(close) OVER w IS NULL THEN 0
                  WHEN close > lag(close) OVER w THEN 1
                  WHEN close < lag(close) OVER w THEN -1
                  ELSE 0 END AS direction
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    )
    SELECT user_id, day,
           CAST(sum(direction * n_ticks)
                OVER (PARTITION BY user_id ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
    FROM d
    """,
    category="finance",
)
def fin_obv(spark, sf_dir):
    """On-balance volume per instrument on the daily bars: volume
    (tick count) accumulates with the sign of the close-to-close move.
    Direction and volume are exact integers, the cumulative sum is an
    ordered integer window — nothing floats, exact at any scale. The
    classic accumulation/distribution signal."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bars = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.lag("close").over(w)
    direction = (
        F.when(prev.isNull(), 0)
        .when(F.col("close") > prev, 1)
        .when(F.col("close") < prev, -1)
        .otherwise(0)
    )
    d = bars.select(
        "user_id", "day", (direction * F.col("n_ticks")).alias("flow")
    )
    return d.select(
        "user_id",
        "day",
        F.sum("flow")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("obv"),
    )


@register(
    "fin_stochastic_k",
    oracle=f"""
    WITH bars AS ({_DUCK_BARS}),
    roll AS (
      SELECT user_id, day, close,
             min(low) OVER f AS l14,
             max(high) OVER f AS h14
      FROM bars
      WINDOW f AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day,
           (close - l14) / nullif(h14 - l14, 0) * 100.0 AS k_pct
    FROM roll
    """,
    category="finance",
)
def fin_stochastic_k(spark, sf_dir):
    """Stochastic oscillator %K per instrument: where today's close
    sits inside the 14-day high-low range. Rolling min/max are
    order-safe under any shuffle; the quotient is ONE fixed double
    expression mirrored verbatim (no rounding — identical inputs give
    identical bits), NULL when the 14-day range is degenerate."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bars = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
    )
    f = Window.partitionBy("user_id").orderBy("day").rowsBetween(-13, 0)
    l14 = F.min("low").over(f)
    h14 = F.max("high").over(f)
    return bars.select(
        "user_id",
        "day",
        (
            (F.col("close") - l14)
            / F.nullif(h14 - l14, F.lit(0.0))
            * 100.0
        ).alias("k_pct"),
    )


@register(
    "fin_kurtosis_returns",
    oracle=f"""
    WITH bars AS ({_DUCK_BARS}),
    r AS (
      -- explicit positivity guard: ln(0) RAISES in DuckDB while
      -- Spark's log() silently NULLs non-positive input — the guard
      -- makes "no return" identical on both engines
      SELECT user_id,
             CASE WHEN close > 0 AND lag(close) OVER w > 0
                  THEN CAST(round(ln(close / lag(close) OVER w)
                                  * 1000000.0) AS BIGINT)
             END AS rq
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    m AS (
      SELECT user_id, count(rq) AS n,
             sum(CAST(rq AS HUGEINT)) AS s1,
             sum(CAST(rq AS HUGEINT) * rq) AS s2,
             sum(CAST(rq AS HUGEINT) * rq * rq) AS s3,
             sum(CAST(rq AS HUGEINT) * rq * rq * rq) AS s4
      FROM r WHERE rq IS NOT NULL GROUP BY user_id
    ),
    d AS (
      SELECT user_id, n,
             {duck_dec2d("s1")} AS s1d, {duck_dec2d("s2")} AS s2d,
             {duck_dec2d("s3")} AS s3d, {duck_dec2d("s4")} AS s4d
      FROM m
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_returns,
           CAST(n AS DOUBLE)
           * (s4d
              - 4.0 * (s1d / n) * s3d
              + 6.0 * (s1d / n) * (s1d / n) * s2d
              - 3.0 * n * (s1d / n) * (s1d / n) * (s1d / n) * (s1d / n))
           / ((s2d - (s1d / n) * s1d) * (s2d - (s1d / n) * s1d))
           - 3.0 AS kurt_excess
    FROM d
    """,
    category="finance",
)
def fin_kurtosis_returns(spark, sf_dir):
    """Excess kurtosis of daily LOG returns per instrument — the
    fat-tail risk signal. Log returns (not raw ratios: a 0.01 -> 490
    close swing gives a 49,000x ratio whose 4th power overflows even
    decimal(38,0)/HUGEINT; ln bounds it at ~11) micro-quantize to
    exact integers; the four raw moments (Σr..Σr⁴) are exact
    decimal(38,0) sums (order-independent, r⁴ <= ~1.5e28 per row);
    kurtosis derives at the very end from ONE fixed double expression
    over the moments, mirrored token-for-token in the oracle.
    Unrounded — identical inputs, identical bits."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bars = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.max_by("value", key).alias("close"))
    w = Window.partitionBy("user_id").orderBy("day")
    # explicit positivity guard: ln(0) RAISES in DuckDB while Spark's
    # log() silently NULLs non-positive input — guard both engines
    prev = F.lag("close").over(w)
    rq = F.when(
        (F.col("close") > 0) & (prev > 0),
        F.round(F.log(F.col("close") / prev) * 1000000.0).cast("long"),
    )
    dec = "decimal(38,0)"
    r = bars.select("user_id", rq.alias("rq")).filter(F.col("rq").isNotNull())
    m = r.groupBy("user_id").agg(
        F.count("rq").alias("n"),
        F.sum(F.col("rq").cast(dec)).alias("s1"),
        F.sum(F.col("rq").cast(dec) * F.col("rq")).alias("s2"),
        F.sum(F.col("rq").cast(dec) * F.col("rq") * F.col("rq")).alias("s3"),
        F.sum(
            F.col("rq").cast(dec) * F.col("rq") * F.col("rq") * F.col("rq")
        ).alias("s4"),
    )
    nd = F.col("n").cast("double")
    # the >2^53 decimal moments convert to double via the MIRRORED
    # two-limb decomposition (spark_dec2d/duck_dec2d) — a plain CAST
    # is correctly rounded in Spark but double-rounded in DuckDB's
    # HUGEINT path, which flipped 2/15000 groups at the 10x corpus
    s1d, s2d = F.expr(spark_dec2d("s1")), F.expr(spark_dec2d("s2"))
    s3d, s4d = F.expr(spark_dec2d("s3")), F.expr(spark_dec2d("s4"))
    mean = s1d / F.col("n")
    m4 = (
        s4d
        - 4.0 * mean * s3d
        + 6.0 * mean * mean * s2d
        - 3.0 * F.col("n") * mean * mean * mean * mean
    )
    m2 = s2d - mean * s1d
    return m.select(
        "user_id",
        F.col("n").cast("long").alias("n_returns"),
        (nd * m4 / (m2 * m2) - 3.0).alias("kurt_excess"),
    )


@register(
    "fin_sortino",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day,
             {duck_half_div("sum(" + duck_units("value") + ")", "count(*)")}
               AS px_u
      FROM events GROUP BY user_id, ts::DATE
    ),
    rets AS (
      SELECT user_id,
             CAST(px_u AS DOUBLE)
               / CAST(lag(px_u) OVER (PARTITION BY user_id ORDER BY day)
                      AS DOUBLE) - 1 AS r
      FROM daily
    )
    SELECT user_id,
           count(r) AS n_returns,
           CAST(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down,
           round(avg(r), 6) AS mean_ret,
           CASE WHEN count(r) > 1
                 AND sum(CASE WHEN r < 0 THEN r * r ELSE 0 END) > 0
                THEN round(avg(r)
                           / sqrt(sum(CASE WHEN r < 0 THEN r * r
                                           ELSE 0 END) / count(r))
                           * sqrt(252.0), 6) END
             AS sortino_ann
    FROM rets
    GROUP BY user_id
    """,
    category="finance",
)
def fin_sortino(spark, sf_dir):
    """Annualised Sortino ratio per instrument: mean daily return over
    DOWNSIDE deviation (root mean square of the negative returns only,
    zero target) — the risk-adjusted metric that does not punish
    upside volatility, completing the Sharpe family
    (fin_sharpe_by_instrument). Same one-shuffle shape: daily close
    proxy → lag return → conditional moments in the same user_id
    aggregation. Instruments with no losing day emit NULL (no downside
    to normalise by), mirrored on both engines.

    The daily price is the EXACT integer mean (micro-unit decimal sum
    + half-away division), not a float avg: a raw avg's merge order
    drifts by an ulp at the 10x corpus and the r < 0 predicate sits on
    the boundary — the first 10x probe flipped n_down 11 vs 12 on one
    instrument. With integer px_u both engines divide the identical
    doubles, and r's sign equals an exact integer comparison."""
    from bigdata_financial_reporting_spark.functions.exact import (
        micro_units,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(micro_units(F.col("value"))).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "user_id",
            "day",
            F.expr(spark_half_div("s", "n")).alias("px_u"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    rets = daily.select(
        "user_id",
        (
            F.col("px_u").cast("double")
            / F.lag("px_u").over(w).cast("double")
            - 1
        ).alias("r"),
    )
    n = F.count("r")
    down_sq = F.sum(
        F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(0.0)
    )
    return rets.groupBy("user_id").agg(
        n.alias("n_returns"),
        F.sum(F.when(F.col("r") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        F.round(F.avg("r"), 6).alias("mean_ret"),
        F.when(
            (n > 1) & (down_sq > 0),
            F.round(
                F.avg("r") / F.sqrt(down_sq / n) * F.sqrt(F.lit(252.0)), 6
            ),
        ).alias("sortino_ann"),
    )


@register(
    "fin_momentum_rank",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day,
             {duck_half_div("sum(" + duck_units("value") + ")", "count(*)")}
               AS px_u
      FROM events GROUP BY user_id, ts::DATE
    ),
    feat AS (
      SELECT user_id, day,
             CAST(round((CAST(px_u AS DOUBLE)
                   / CAST(lag(px_u, 5) OVER w AS DOUBLE) - 1) * 1000000)
               AS BIGINT) AS mom_u,
             CAST(round((CAST(lead(px_u, 1) OVER w AS DOUBLE)
                   / CAST(px_u AS DOUBLE) - 1) * 1000000)
               AS BIGINT) AS fwd_u
      FROM daily
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    ranked AS (
      SELECT day, mom_u, fwd_u,
             ntile(5) OVER (PARTITION BY day
                            ORDER BY mom_u, user_id) AS quintile
      FROM feat
      WHERE mom_u IS NOT NULL AND fwd_u IS NOT NULL
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, quintile,
           count(*) AS n_instruments,
           CAST({duck_half_div("sum(mom_u)", "count(*)")} AS DOUBLE)
             / 1000000.0 AS mean_mom,
           CAST({duck_half_div("sum(fwd_u)", "count(*)")} AS DOUBLE)
             / 1000000.0 AS mean_fwd_ret
    FROM ranked
    GROUP BY day, quintile
    """,
    category="finance",
)
def fin_momentum_rank(spark, sf_dir):
    """Cross-sectional momentum portfolio table: each day, instruments
    rank into quintiles by trailing 5-day return (user_id tie-break so
    the buckets are deterministic), and the next day's realised return
    averages per bucket — the classic momentum-factor backtest shape.
    The signal and forward return micro-quantize to exact integers
    BEFORE the ranking, and the bucket means render via integer
    half-away division, so neither quintile boundaries nor the means
    can sit on an engine-dependent ulp or 6dp half. Two window passes over the per-instrument
    daily series, then one (day, quintile) rollup — each day's
    cross-section is tiny, the day count is what grows, and every
    stage keys on columns the tick store is already partitioned by."""
    from bigdata_financial_reporting_spark.functions.exact import (
        micro_units,
    )

    ev = load_table(spark, sf_dir, "events")
    # exact integer daily mean — same rationale as fin_sortino (the
    # signal rounds at 6dp BEFORE ranking, and a float avg's ulp drift
    # could flip a cell sitting exactly on a rounding boundary)
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(micro_units(F.col("value"))).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "user_id", "day", F.expr(spark_half_div("s", "n")).alias("px_u")
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    pxd = F.col("px_u").cast("double")
    # signal and forward return micro-quantize to integers straight
    # from the (identical-on-both-engines) double ratio: ranking and
    # the bucket means then run in exact integer space — a 6dp float
    # render + avg put the mean on exact 6dp halves, where the two
    # engines' round() disagree (first sf0.01 check caught one cell)
    feat = daily.select(
        "user_id",
        "day",
        F.round(
            (pxd / F.lag("px_u", 5).over(w).cast("double") - 1) * 1000000
        )
        .cast("long")
        .alias("mom_u"),
        F.round(
            (F.lead("px_u", 1).over(w).cast("double") / pxd - 1) * 1000000
        )
        .cast("long")
        .alias("fwd_u"),
    ).filter(F.col("mom_u").isNotNull() & F.col("fwd_u").isNotNull())
    wd = Window.partitionBy("day").orderBy("mom_u", "user_id")
    ranked = feat.withColumn("quintile", F.ntile(5).over(wd))
    # Group on the RAW date column, render yyyy-MM-dd after the agg:
    # distinct dates map 1:1 to their formatted strings, so the groups
    # are identical — but grouping on the raw column lets the
    # aggregation reuse the ntile window's hashpartitioning(day)
    # (grouping on the derived date_format forced a fourth exchange of
    # the cross-section; guide §2.4, optimization round 14).
    return (
        ranked.groupBy("day", "quintile")
        .agg(
            F.count(F.lit(1)).alias("n_instruments"),
            (
                F.expr(
                    spark_half_div("sum(cast(mom_u as decimal(38,0)))", "count(1)")
                ).cast("double")
                / 1000000.0
            ).alias("mean_mom"),
            (
                F.expr(
                    spark_half_div("sum(cast(fwd_u as decimal(38,0)))", "count(1)")
                ).cast("double")
                / 1000000.0
            ).alias("mean_fwd_ret"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "quintile",
            "n_instruments",
            "mean_mom",
            "mean_fwd_ret",
        )
    )


@register(
    "fin_jarque_bera",
    oracle=f"""
    WITH bars AS ({_DUCK_BARS}),
    r AS (
      SELECT user_id,
             CASE WHEN close > 0 AND lag(close) OVER w > 0
                  THEN CAST(round(ln(close / lag(close) OVER w)
                                  * 1000000.0) AS BIGINT)
             END AS rq
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    m AS (
      SELECT user_id, count(rq) AS n,
             sum(CAST(rq AS HUGEINT)) AS s1,
             sum(CAST(rq AS HUGEINT) * rq) AS s2,
             sum(CAST(rq AS HUGEINT) * rq * rq) AS s3,
             sum(CAST(rq AS HUGEINT) * rq * rq * rq) AS s4
      FROM r WHERE rq IS NOT NULL GROUP BY user_id
      HAVING count(rq) >= 4
    ),
    d AS (
      SELECT user_id, n,
             {duck_dec2d("s1")} AS s1d, {duck_dec2d("s2")} AS s2d,
             {duck_dec2d("s3")} AS s3d, {duck_dec2d("s4")} AS s4d
      FROM m
    ),
    c AS (
      SELECT user_id, n,
             s3d - 3.0 * (s1d / n) * s2d
                 + 2.0 * n * (s1d / n) * (s1d / n) * (s1d / n) AS m3s,
             s4d
             - 4.0 * (s1d / n) * s3d
             + 6.0 * (s1d / n) * (s1d / n) * s2d
             - 3.0 * n * (s1d / n) * (s1d / n) * (s1d / n) * (s1d / n)
               AS m4s,
             s2d - (s1d / n) * s1d AS m2s
      FROM d
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_returns,
           round(sqrt(CAST(n AS DOUBLE)) * m3s
                 / sqrt(m2s * m2s * m2s), 6) + 0 AS skew_g1,
           round(CAST(n AS DOUBLE) / 6.0
                 * ((CAST(n AS DOUBLE) * m3s * m3s / (m2s * m2s * m2s))
                    + (CAST(n AS DOUBLE) * m4s / (m2s * m2s) - 3.0)
                      * (CAST(n AS DOUBLE) * m4s / (m2s * m2s) - 3.0)
                      / 4.0), 6) + 0 AS jb
    FROM c
    """,
    category="finance",
)
def fin_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality test of daily LOG returns per instrument
    — JB = n/6 * (g1^2 + g2^2/4) from the population skewness g1 and
    excess kurtosis g2, the moment-based normality screen that
    completes the fin_kurtosis_returns family (same bars, same
    micro-quantized exact-integer return canon). The four raw moments
    (SUM r..r^4) accumulate in decimal(38,0) (order-independent,
    r^4 <= ~1.5e28 per row); central moment SUMS m2s/m3s/m4s and the
    g1/g2/JB renders are fixed double expressions over the mirrored
    two-limb dec2d renders, token-for-token identical in the oracle.
    Groups with n < 4 are dropped (moments below the test's df).
    Single shuffle on the instrument key; constant state per group."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bars = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.max_by("value", key).alias("close"))
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.lag("close").over(w)
    rq = F.when(
        (F.col("close") > 0) & (prev > 0),
        F.round(F.log(F.col("close") / prev) * 1000000.0).cast("long"),
    )
    dec = "decimal(38,0)"
    r = bars.select("user_id", rq.alias("rq")).filter(F.col("rq").isNotNull())
    m = r.groupBy("user_id").agg(
        F.count("rq").alias("n"),
        F.sum(F.col("rq").cast(dec)).alias("s1"),
        F.sum(F.col("rq").cast(dec) * F.col("rq")).alias("s2"),
        F.sum(F.col("rq").cast(dec) * F.col("rq") * F.col("rq")).alias("s3"),
        F.sum(
            F.col("rq").cast(dec) * F.col("rq") * F.col("rq") * F.col("rq")
        ).alias("s4"),
    ).filter(F.col("n") >= 4)
    nd = F.col("n").cast("double")
    s1d, s2d = F.expr(spark_dec2d("s1")), F.expr(spark_dec2d("s2"))
    s3d, s4d = F.expr(spark_dec2d("s3")), F.expr(spark_dec2d("s4"))
    mean = s1d / F.col("n")
    m3s = s3d - 3.0 * mean * s2d + 2.0 * F.col("n") * mean * mean * mean
    m4s = (
        s4d
        - 4.0 * mean * s3d
        + 6.0 * mean * mean * s2d
        - 3.0 * F.col("n") * mean * mean * mean * mean
    )
    m2s = s2d - mean * s1d
    g1 = F.sqrt(nd) * m3s / F.sqrt(m2s * m2s * m2s)
    g2 = nd * m4s / (m2s * m2s) - 3.0
    jb = nd / 6.0 * (nd * m3s * m3s / (m2s * m2s * m2s) + g2 * g2 / 4.0)
    return m.select(
        "user_id",
        F.col("n").cast("long").alias("n_returns"),
        F.round(g1, 6).alias("skew_g1"),
        F.round(jb, 6).alias("jb"),
    )


# The closest double to ln(2), written as the SAME 17-digit literal on
# both engines so the range-volatility constants are bit-identical
# (libm vs java.lang.Math could differ by 1 ulp on ln(2.0) computed at
# runtime).
_LN2 = "0.6931471805599453"


@register(
    "fin_parkinson_vol",
    oracle=f"""
    WITH bars AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             max(value) AS high, min(value) AS low,
             arg_min(value, {_DUCK_TICK_KEY}) AS open_px,
             arg_max(value, {_DUCK_TICK_KEY}) AS close_px
      FROM events GROUP BY 1, 2
    ),
    q AS (
      SELECT user_id,
             CAST(round(ln(high / low) * 1000000.0) AS BIGINT) AS hq,
             CAST(round(ln(close_px / open_px) * 1000000.0) AS BIGINT)
               AS cq
      FROM bars WHERE low > 0
    ),
    m AS (
      SELECT user_id, count(*) AS n,
             sum(CAST(hq AS HUGEINT) * hq) AS sh2,
             sum(CAST(cq AS HUGEINT) * cq) AS sc2
      FROM q GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_days,
           round({duck_dec2d("sh2")} / 1000000000000.0
                 / (4.0 * {_LN2} * CAST(n AS DOUBLE)), 6) AS parkinson_var,
           round((0.5 * {duck_dec2d("sh2")} / 1000000000000.0
                  - (2.0 * {_LN2} - 1.0)
                    * {duck_dec2d("sc2")} / 1000000000000.0)
                 / CAST(n AS DOUBLE), 6) + 0 AS garman_klass_var
    FROM m
    """,
    category="finance",
)
def fin_parkinson_vol(spark, sf_dir):
    """Parkinson and Garman-Klass range-based daily variance per
    instrument — the high-low volatility estimators that complete the
    close-to-close family (fin_kurtosis_returns / fin_jarque_bera use
    returns; these use the intraday RANGE, ~5-7x more efficient per
    day of data). Per day: hq = micro-quantized ln(high/low), cq =
    micro-quantized ln(close/open) (open/close by the (ts, event_id)
    tick key, the fin_ohlc_bars canon); days with low <= 0 are
    dropped (log-range undefined). Parkinson = E[hq^2]/(4 ln 2),
    Garman-Klass = E[0.5 hq^2 - (2 ln 2 - 1) cq^2]. The squared-range
    sums accumulate in decimal(38,0) (exact, order-independent); each
    estimator renders as ONE fixed double expression over the mirrored
    two-limb dec2d renders with ln 2 as the same 17-digit double
    literal on both engines. One shuffle on (instrument, day), one on
    instrument — both map-side combined; constant state per group.
    GK can legitimately go negative (its cq^2 term subtracts), hence
    the DuckDB-side -0.0 normalization; Parkinson is a scaled square,
    never negative."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bars = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min_by("value", key).alias("open_px"),
        F.max_by("value", key).alias("close_px"),
    )
    q = bars.filter(F.col("low") > 0).select(
        "user_id",
        F.round(F.log(F.col("high") / F.col("low")) * 1000000.0)
        .cast("long")
        .alias("hq"),
        F.round(F.log(F.col("close_px") / F.col("open_px")) * 1000000.0)
        .cast("long")
        .alias("cq"),
    )
    dec = "decimal(38,0)"
    m = q.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("hq").cast(dec) * F.col("hq")).alias("sh2"),
        F.sum(F.col("cq").cast(dec) * F.col("cq")).alias("sc2"),
    )
    nd = F.col("n").cast("double")
    ln2 = float(_LN2)
    sh2d = F.expr(spark_dec2d("sh2"))
    sc2d = F.expr(spark_dec2d("sc2"))
    return m.select(
        "user_id",
        F.col("n").cast("long").alias("n_days"),
        F.round(
            sh2d / 1000000000000.0 / (4.0 * ln2 * nd), 6
        ).alias("parkinson_var"),
        F.round(
            (
                0.5 * sh2d / 1000000000000.0
                - (2.0 * ln2 - 1.0) * sc2d / 1000000000000.0
            )
            / nd,
            6,
        ).alias("garman_klass_var"),
    )
