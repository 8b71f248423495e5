"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join handling (enabled in session.py) splits oversized
shuffle partitions at runtime, which covers moderate skew. These
operators are the EXPLICIT escape hatch for pathological keys — the
single user with 10^9 events, the empty-string join key — where you
want the skew handled by construction, not by runtime detection:

- ``salted_agg``: two-phase aggregation. Phase 1 groups on
  (key, salt) — the hot key's rows spread over ``n_salts`` reducers —
  phase 2 merges the partials per key. Works for any algebraic
  aggregate (sum/count/min/max, and avg via sum+count).
- ``salted_join``: replicate the SMALL side ``n_salts`` times (one copy
  per salt), salt the big side randomly-but-deterministically from a
  row hash, join on (key, salt). The hot key's big-side rows land on
  ``n_salts`` different reducers instead of one.

Both are pure DataFrame compositions — deterministic output, ordinary
Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic pseudo-random salt in [0, n_salts): hash of all
    columns — stable across runs, unlike rand()."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> "fn(col)" where fn is one of
    sum/count/min/max/avg. avg decomposes into sum+count so the merge
    phase stays algebraically exact.
    """
    import re

    parsed: dict[str, tuple[str, str]] = {}
    for out, spec in aggs.items():
        m = re.fullmatch(r"(sum|count|min|max|avg)\((\w+|\*)\)", spec.strip())
        if not m:
            raise ValueError(f"unsupported agg spec {spec!r}")
        parsed[out] = (m.group(1), m.group(2))

    salted = df.withColumn("__salt", _salt_col(df, n_salts))

    partial_exprs = []
    for out, (fn, col) in parsed.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{out}"))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__psum_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pcnt_{out}"))
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(f"__p_{out}"))
    phase1 = salted.groupBy(*keys, "__salt").agg(*partial_exprs)

    final_exprs = []
    for out, (fn, col) in parsed.items():
        if fn in ("sum", "count"):
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        else:  # avg = total sum / total count
            final_exprs.append(
                (F.sum(f"__psum_{out}") / F.sum(f"__pcnt_{out}")).alias(out)
            )
    return phase1.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Output equals ``big.join(small, on, how)`` for ``inner`` and
    ``left`` joins. The small side grows n_salts x (it must be
    replicable — dimension-sized, though too big to broadcast outright,
    or AQE would already have solved the problem).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    big_s = big.withColumn("__salt", _salt_col(big, n_salts))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_s = small.select("*", salts)
    joined = big_s.join(small_s, [on, "__salt"], how)
    return joined.drop("__salt")
