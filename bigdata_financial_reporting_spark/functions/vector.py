"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

Built from higher-order functions (``zip_with`` + ``aggregate``), so the
whole computation stays JVM-side inside whole-stage codegen: no Python
UDF, no Arrow transfer, no serialization of 100 TB of embeddings through
the Python worker. This is the hot path for similarity search.

Elements are cast to double before accumulation: float32 inputs summed
in float32 would drift from the DuckDB oracle (which sums in double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns (double)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column (double)."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, d / denom)
