"""Exact (order-independent) float aggregation helpers.

The engine's correctness bar is cross-engine BITWISE float equality
under arbitrary partitioning (the external driver value-hashes rendered
cells).  A raw ``F.sum`` over doubles is merge-order-dependent: Spark's
partial/final aggregation and DuckDB's single-node sum agree to the
last ulp at small scale and drift apart as row counts grow — at the
10x staged corpus (~6M lineitem rows) the drift crosses ``round(x, 4)``
boundaries and flips rendered cells (round-6 at-scale findings:
agg_grouping_sets, fin_vwap, rollup_timeseries, stream_sliding_window,
udf_pandas_grouped_agg).

The house discipline (first applied to tpch_q1, round 6): quantize each
value to exact integer micro-units BEFORE the aggregation, sum in
``decimal(38,0)`` (order-independent, exact to ~1.7e38 like DuckDB's
HUGEINT), and derive the final double with ONE fixed conversion mirrored
verbatim in the oracle.  ``decimal(38,0)`` and not ``long`` because
ANSI-off Spark wraps int64 silently while DuckDB promotes to HUGEINT —
the round-6 Spearman moment-sum bug.

Fixture values are continuous doubles, so quantization is lossy in the
6th decimal; that is fine — BOTH engines quantize identically (their
``round`` is half-away-from-zero on the same input double), so the
compared quantity is exactly defined and scale-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default quantization: micro-units (6 fractional decimal digits)
MICRO = 1_000_000


def micro_units(col: Column, scale: int = MICRO) -> Column:
    """``col`` as exact integer units of 1/scale, in decimal(38,0).

    The per-row product ``col * scale`` and its rounding are
    deterministic (no order dependence); the decimal cast makes every
    downstream sum exact and order-independent.

    Domain: |col| <= ~9.2e12 at the default micro scale (the rounded
    product must fit int64). The guard below makes an out-of-domain
    value FAIL LOUDLY instead of wrapping — ANSI-off Spark's long cast
    wraps silently while the :func:`duck_units` mirror raises on its
    BIGINT cast, so an unguarded overflow would diverge silently on one
    engine and error on the other (round-7 ADVICE item 3). 9.2e18 is
    the largest comfortable double below 2^63-1.
    """
    r = F.round(col * F.lit(float(scale)))
    guarded = F.when(
        F.abs(r) <= F.lit(9.2e18), r
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"micro_units overflow: |value * {scale}| "),
                F.lit("exceeds int64 — value "),
                col.cast("string"),
            )
        )
    )
    return guarded.cast("long").cast("decimal(38,0)")


def exact_sum(col: Column, scale: int = MICRO) -> Column:
    """Order-independent sum of doubles: quantize -> exact decimal sum
    -> one final int->double conversion.  Mirror in DuckDB with
    :func:`duck_sum`."""
    return F.sum(micro_units(col, scale)).cast("double") / F.lit(float(scale))


def spark_half_div(num_sql: str, den_sql: str) -> str:
    """Spark-SQL fragment: round-half-away-from-zero integer division
    of exact integer/decimal expressions (``div`` is integral divide).

    Why not ``F.round(x, d)`` on the float quotient: a quotient of
    quantized integers frequently lands EXACTLY on a d-digit half, and
    there Spark (BigDecimal HALF_UP on the shortest decimal repr) and
    DuckDB (std::round on the float product x*10^d) disagree —
    measured 134/4000 divergences on 4dp halves, 28/4000 on 6dp
    (round 7 probe; the round-6 at-scale reds for fin_vwap /
    rollup_timeseries / udf_pandas_grouped_agg were exactly this).
    Integer half-away division has no float anywhere; integer zero has
    no sign (the round-5 -0.0 class cannot recur). Domain: the rounded
    QUOTIENT must fit int64 — Spark's decimal ``div`` yields LongType
    and wraps beyond it with ANSI off (the operands themselves may be
    full decimal(38,0))."""
    n, d = f"({num_sql})", f"({den_sql})"
    return (
        f"(case when {n} < 0 then -((2 * (-{n}) + {d}) div (2 * {d}))"
        f" else (2 * {n} + {d}) div (2 * {d}) end)"
    )


def duck_half_div(num_sql: str, den_sql: str) -> str:
    """DuckDB mirror of :func:`spark_half_div` (``//`` on HUGEINT)."""
    n, d = f"({num_sql})", f"({den_sql})"
    return (
        f"(CASE WHEN {n} < 0 THEN -((2 * (-{n}) + {d}) // (2 * {d}))"
        f" ELSE (2 * {n} + {d}) // (2 * {d}) END)"
    )


def spark_dec2d(expr_sql: str) -> str:
    """Spark-SQL fragment: decimal->double conversion that is
    bit-MIRRORED by :func:`duck_dec2d`.

    Why: a plain ``CAST(huge_int AS DOUBLE)`` is NOT the same operation
    on both engines once |x| exceeds 2^53 — Spark goes through
    BigDecimal (correctly rounded) while DuckDB's HUGEINT cast computes
    ``upper * 2^64 + lower`` in double arithmetic (double-rounded), and
    the two differ by an ulp on ~1e-3 of values (round-7 finding: 2 of
    15000 fin_kurtosis_returns groups flipped at the 10x corpus; the
    same class sits latent under every stats key casting big moment
    sums). The fix decomposes |x| = a*1e15 + b with BOTH limbs <= 2^53
    (each limb cast is exact), then rebuilds with the same two IEEE
    ops on both engines — identical sequence, identical bits.
    Valid for |x| < 9.2e33 (the limb quotient must fit a LongType)."""
    x = f"({expr_sql})"
    a = f"cast((abs({x}) div 1000000000000000) as double)"
    b = f"cast((abs({x}) % 1000000000000000) as double)"
    return (
        f"(case when {x} < 0 then -({a} * 1e15 + {b})"
        f" else ({a} * 1e15 + {b}) end)"
    )


def duck_dec2d(expr_sql: str) -> str:
    """DuckDB mirror of :func:`spark_dec2d`."""
    x = f"({expr_sql})"
    a = f"CAST((abs({x}) // 1000000000000000) AS DOUBLE)"
    b = f"CAST((abs({x}) % 1000000000000000) AS DOUBLE)"
    return (
        f"(CASE WHEN {x} < 0 THEN -({a} * 1e15 + {b})"
        f" ELSE ({a} * 1e15 + {b}) END)"
    )


def py_half_div(num: int, den: int) -> int:
    """Python mirror of :func:`spark_half_div` (arbitrary-precision
    ints; ``den`` must be positive)."""
    if num < 0:
        return -((2 * (-num) + den) // (2 * den))
    return (2 * num + den) // (2 * den)


def duck_units(expr: str, scale: int = MICRO) -> str:
    """DuckDB fragment mirroring :func:`micro_units` (sum promotes to
    HUGEINT, exact like decimal(38,0))."""
    return f"CAST(round(({expr}) * {float(scale)}) AS BIGINT)"


def cents(col: Column) -> Column:
    """Exact integer cents of a 2-decimal money double (TPC-H price /
    acctbal class), as decimal(38,0) so the sum merge is exact and
    order-independent. The fixture's money doubles are within 1e-9 of
    integral cents, so the per-row quantization is lossless; mirror
    with :func:`duck_cents`. Render a cents sum with
    ``spark_dec2d(...)/100.0`` (the plain decimal->double cast and
    DuckDB's HUGEINT cast round differently past 2^53).

    Same loud-overflow guard as :func:`micro_units` (round-10 advice):
    ANSI-off Spark's long cast wraps silently while the duck_cents
    BIGINT cast raises, so |col| beyond ~9.2e16 dollars must fail on
    BOTH engines rather than diverge on one."""
    r = F.round(col * 100)
    guarded = F.when(F.abs(r) <= F.lit(9.2e18), r).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cents overflow: |value * 100| exceeds int64 "),
                F.lit("— value "),
                col.cast("string"),
            )
        )
    )
    return guarded.cast("long").cast("decimal(38,0)")


def duck_cents(expr: str) -> str:
    """DuckDB mirror of :func:`cents` (HUGEINT sums are exact)."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def spark_cents_sql(expr: str) -> str:
    """Spark-SQL fragment form of :func:`cents` — for the queries whose
    surface IS a SQL string (session variables, EXECUTE IMMEDIATE,
    GROUP BY ALL). No overflow guard: 2dp money cents fit int64 to
    ~9.2e16 dollars per value."""
    return f"cast(cast(round(({expr}) * 100) as long) as decimal(38,0))"


def spark_units_sql(expr: str, scale: int = MICRO) -> str:
    """Spark-SQL fragment form of :func:`micro_units` (guard-free: for
    fixture-bounded value columns inside SQL-string queries)."""
    return (
        f"cast(cast(round(({expr}) * {float(scale)}) as long)"
        " as decimal(38,0))"
    )


def duck_sum(expr: str, scale: int = MICRO) -> str:
    """DuckDB fragment mirroring :func:`exact_sum` bitwise."""
    return f"(CAST(sum({duck_units(expr, scale)}) AS DOUBLE) / {float(scale)})"


