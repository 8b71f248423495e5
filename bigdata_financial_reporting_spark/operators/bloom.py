"""Distributed Bloom filter as a DataFrame bitmap.

The filter is a tiny ``(word, bits)`` relation — ``m_bits/16`` rows of
16-bit words OR-merged with a map-side-combined ``bit_or`` — built
over an engine-neutral hash pair (h1, h2) and probed with standard
double hashing g_i = (h1 + i*h2) mod m. At scale this is the classic
shuffle-avoidance pattern: the bitmap is O(m) regardless of corpus
size, broadcasts to every executor, and prunes the probe side BEFORE
the expensive exact-dedup shuffle — a probe that misses any of its k
bits is provably absent from the corpus (no false negatives), so only
bloom-maybe rows pay the join. 16-bit words sidestep engine-specific
sign semantics of ``1 << 31`` (Spark ints are signed, DuckDB widens).

No analogue in the reference (its dedup surface is pandas
``drop_duplicates``, controller/script.py:60-64); this is the 100-TB
replacement for that step's semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 16384  # filter size (power of two, 1024 16-bit words)
K_PROBES = 4    # hash functions via double hashing


def _cells(prefix: str = "") -> Column:
    """array of k bit positions g_i = (h1 + i*h2) mod m."""
    return F.expr(
        f"transform(sequence(0, {K_PROBES - 1}), "
        f"i -> pmod({prefix}h1 + i * {prefix}h2, {M_BITS}))"
    )


def bloom_build(hashed: DataFrame) -> DataFrame:
    """``(word, bits)`` bitmap from a frame with BIGINT h1/h2 columns.

    One explode to k rows per key, then a map-side-combined bit_or —
    only <= m/16 rows cross the exchange however large the corpus.
    """
    return (
        hashed.select(F.explode(_cells()).alias("g"))
        .select(
            (F.col("g") / 16).cast("long").alias("word"),
            F.expr("cast(shiftleft(1, cast(g % 16 AS int)) AS int)").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(probes: DataFrame, bitmap: DataFrame, id_col: str) -> DataFrame:
    """Per-probe verdict: ``maybe`` = every one of the k probed bits
    is set. The bitmap side is broadcast (it is at most m/16 rows);
    a missing word row means those bits were never set."""
    cells = probes.select(
        F.col(id_col), F.explode(_cells()).alias("g")
    ).select(
        id_col,
        (F.col("g") / 16).cast("long").alias("word"),
        F.expr("cast(shiftleft(1, cast(g % 16 AS int)) AS int)").alias("m"),
    )
    joined = cells.join(F.broadcast(bitmap), "word", "left")
    hit = F.col("bits").isNotNull() & (
        F.expr("bits & m") == F.col("m")
    )
    return joined.groupBy(id_col).agg(F.bool_and(hit).alias("maybe"))
