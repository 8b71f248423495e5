"""SimHash near-duplicate detection.

64-bit SimHash: each token hashes to 64 bits (xxhash64, deterministic);
bit j of the fingerprint is the sign of sum over tokens of (+1 if bit j
set else -1). Near-duplicates = pairs within Hamming distance d.

Scale path: pigeonhole banding — split the 64 bits into ``d+1`` chunks;
any pair with Hamming <= d agrees exactly on at least one chunk, so a
groupBy/self-join per chunk finds ALL such pairs without an all-pairs
scan (exact recall, unlike MinHash banding).

All expression-level (bit ops + higher-order functions) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.text import tokenize


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash of the token multiset of ``text`` (long)."""
    toks = tokenize(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    out = F.lit(0).cast("long")
    for j in range(64):
        # count of tokens with bit j set, vs total
        set_cnt = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)),
        )
        bit_j = (set_cnt * 2 >= F.size(toks)).cast("long")
        out = out.bitwiseOR(F.shiftleft(bit_j, j))
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


#: Engine-neutral 62-bit token hash: two polynomial char folds (bases
#: 131/137, mod 2^31-1 — plain BIGINT arithmetic both engines
#: reproduce bit-for-bit, same family as operators/text.
#: winnow_fingerprints) packed as h1 * 2^31 + h2. Max value
#: (2^31-2)*2^31 + 2^31-2 < 2^62, so the packed hash and the 62-bit
#: fingerprint both stay positive in a signed 64-bit long.
NEUTRAL_BITS = 62


def _poly_fold(col: str, base: int) -> str:
    return (
        f"aggregate(transform(sequence(1, length({col})), "
        f"i -> cast(ascii(substring({col}, i, 1)) AS bigint)), "
        f"cast(0 AS bigint), (acc, c) -> (acc * {base} + c) % 2147483647)"
    )


def neutral_token_hash62(col: str = "t") -> str:
    """SQL expression: 62-bit engine-neutral hash of a token column."""
    return f"({_poly_fold(col, 131)} * cast(2147483648 AS bigint) + {_poly_fold(col, 137)})"


def simhash_frame(
    df: DataFrame, id_col: str, text_col: str, neutral: bool = False
) -> DataFrame:
    """``(id, fp)`` SimHash fingerprints, computed the distributed way.

    ``simhash64`` as a single column expression re-evaluates the token
    hash array inside 64 interpreted ``aggregate`` lambdas — O(64 x
    tokens x tokenize) per row. Here each token hashes once (explode ->
    hash) and the per-bit majorities are plain ``sum`` aggregates
    with map-side combine: the shuffle is one row of bit-sums per doc,
    and everything stays in whole-stage codegen.

    ``neutral=True`` swaps xxhash64 (JVM-private) for the 62-bit
    polynomial token hash, making the whole fingerprint reproducible in
    any engine with BIGINT arithmetic — the form the DuckDB oracle
    checks bit-exactly.
    """
    bits = NEUTRAL_BITS if neutral else 64
    hash_expr = neutral_token_hash62("t") if neutral else "xxhash64(t)"
    hashed = (
        df.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("__tok"))
        .select("id", F.explode("__tok").alias("t"))
        .select("id", F.expr(hash_expr).alias("h"))
    )
    # Single parsed SQL expressions for the bit-sums and the
    # fingerprint assembly — per-Column construction costs hundreds of
    # py4j round-trips (see operators/dedup.py for the measurement).
    bit_sums = ", ".join(
        f"sum(shiftright(h, {j}) & 1) AS b{j}" for j in range(bits)
    )
    sums = hashed.groupBy("id").agg(
        F.expr(f"struct(count(1) AS n, {bit_sums})").alias("s")
    )
    fp_assembly = " | ".join(
        f"shiftleft(cast(s.b{j} * 2 >= s.n AS long), {j})" for j in range(bits)
    )
    fp = sums.select("id", F.expr(fp_assembly).alias("fp"))
    # Token-less docs never reach the explode; under the majority rule
    # (set_cnt*2 >= 0) their fingerprint is all-ones over ``bits`` bits
    # (== -1 as a long in 64-bit mode).
    empty_fp = (1 << bits) - 1 if neutral else -1
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(fp, "id", "left").select(
        "id", F.coalesce("fp", F.lit(empty_fp).cast("long")).alias("fp")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
    neutral: bool = False,
) -> DataFrame:
    """Pairs (id_a < id_b) with SimHash Hamming distance <= max_distance.

    Exact under the pigeonhole banding: chunks = max_distance + 1.
    (With ``neutral`` fingerprints the 4 chunks of width 62//4 = 15
    leave the top 2 bits unbanded — still exact: <= 3 differing bits
    across 4 chunks always leave one chunk identical, whether or not
    some differing bits fall outside every chunk; uncovered bits can
    only ADD candidates, and the final exact-Hamming filter prunes
    them.) Returns ``id_a, id_b, hamming``.
    """
    chunks = max_distance + 1
    width = (NEUTRAL_BITS if neutral else 64) // chunks
    # The fingerprint frame feeds both sides of the banded self-join —
    # unpersisted, the tokenize+hash pipeline ran twice and the raw
    # table was scanned four times per action (round-14 audit). The
    # frame is two longs per doc; persist it, track()-scoped.
    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    fp = track(
        simhash_frame(df, id_col, text_col, neutral=neutral).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )

    mask = (1 << width) - 1
    entries = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("fp"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("piece"),
                    )
                    # last chunk takes any leftover high bits
                    for c in range(chunks)
                ]
            )
        ).alias("e"),
    ).select("id", "fp", F.col("e.chunk").alias("chunk"), F.col("e.piece").alias("piece"))

    a, b = entries.alias("a"), entries.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
