"""Text primitives: tokenize, n-grams/shingles, fingerprints.

All pure Catalyst expressions (regexp / split / higher-order array
functions) — no Python in the row path, so these vectorize inside
whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def tokenize(text: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, split on whitespace.

    Returns ``array<string>`` with empty tokens removed.
    """
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: t != "")


def word_ngrams(tokens: Column | str, n: int, sep: str = " ") -> Column:
    """Word n-grams of a token array: array of space-joined grams.

    Empty array when the document has fewer than ``n`` tokens.
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    idx = F.sequence(F.lit(0), F.size(t) - n)  # 0-based start positions
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingle_set(text: Column | str, n: int) -> Column:
    """Distinct word n-gram shingles of a raw text column."""
    return F.array_distinct(word_ngrams(tokenize(text), n))


def shingle_frame(df, id_col: str, text_col: str, n: int, extra=None):
    """``(id, sh)`` DataFrame of distinct word n-gram shingles.

    Two-step projection on purpose: higher-order-function lambdas run
    interpreted (outside whole-stage codegen), so an inlined
    ``word_ngrams(tokenize(text))`` re-evaluates the full tokenize
    regex for every ``element_at`` reference of every array element —
    a >10x slowdown measured at sf0.01. Binding the token array to a
    real column first makes each lambda reference a cheap column read
    (Catalyst's CollapseProject keeps non-cheap multi-referenced
    projections separate, so the barrier survives optimization).
    """
    toks = df.select(
        F.col(id_col).alias("id"), *(extra or []), tokenize(F.col(text_col)).alias("__tok")
    )
    keep = [c for c in toks.columns if c != "__tok"]
    return toks.select(
        *keep, F.array_distinct(word_ngrams(F.col("__tok"), n)).alias("sh")
    )


def shingle_rows(df, id_col: str, text_col: str, n: int, extra=None, distinct=True):
    """Word n-gram shingles as ROWS ``(id, [extra...], s)`` — distinct
    per doc by default; ``distinct=False`` keeps every occurrence (the
    repetition-scoring form, where the duplicate fraction IS the
    signal).

    The scale formulation: ``posexplode`` the token array (tokenize is
    referenced exactly once, so Generate evaluates it once per row),
    then build each n-gram with per-doc window ``lead``s — everything
    stays in whole-stage codegen, the shuffle payload is token-sized
    rows, and no array column ever crosses an exchange. Array-typed
    alternatives (``word_ngrams`` + ``explode``) get their lambdas
    collapsed into the Generate node, re-evaluating tokenize per output
    element — O(tokens^2) per doc, measured 20x slower at sf0.01.

    Docs with fewer than ``n`` tokens contribute no rows.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        *(extra or []),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "t"),
    )
    keep = [c for c in toks.columns if c not in ("pos", "t")]
    if n == 1:
        out = toks.select(*keep, F.col("t").alias("s"))
    else:
        w = Window.partitionBy("id").orderBy("pos")
        leads = toks.select(
            *keep,
            "t",
            *[F.lead("t", j).over(w).alias(f"__t{j}") for j in range(1, n)],
        )
        out = leads.filter(F.col(f"__t{n-1}").isNotNull()).select(
            *keep,
            F.concat_ws(" ", "t", *[f"__t{j}" for j in range(1, n)]).alias("s"),
        )
    return out.dropDuplicates(["id", "s"]) if distinct else out


def fingerprint(text: Column | str) -> Column:
    """Key-collision fingerprint (OpenRefine style): sort the distinct
    tokens, rejoin, hash. Two docs with the same bag of words collide.
    """
    toks = F.sort_array(F.array_distinct(tokenize(text)))
    return F.md5(F.concat_ws(" ", toks))


def winnow_fingerprints(df, id_col: str, text_col: str, k: int = 5, w: int = 4):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS plagiarism-detection algorithm): normalize to [a-z0-9],
    hash every char k-gram with a polynomial rolling hash (base 131
    mod 2^31-1 — plain BIGINT arithmetic, so any engine reproduces the
    values bit-for-bit), then keep the minimum hash of each window of
    ``w`` consecutive k-gram hashes. Any substring match of length
    >= w + k - 1 between two documents is guaranteed to share a
    fingerprint — the property bag-of-words hashing (``fingerprint``)
    lacks. Returns ``(id, n_kgrams, fps)`` with ``fps`` the distinct
    selected hashes; explode ``fps`` for the inverted fingerprint
    index that powers sub-string-level near-dup candidate generation
    at scale (same join shape as the shingle pipeline). Everything is
    one codegen projection per row — no shuffle, no Python."""
    kgram = (
        f"transform(sequence(1, length(__t) - {k - 1}), "
        f"i -> aggregate(transform(sequence(0, {k - 1}), "
        f"j -> cast(ascii(substring(__t, i + j, 1)) AS bigint)), "
        f"cast(0 AS bigint), (acc, c) -> (acc * 131 + c) % 2147483647))"
    )
    mins = ", ".join(f"element_at(__kh, i+{j})" for j in range(w))
    normed = df.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "").alias("__t"),
    )
    kg = normed.select(
        "id",
        F.expr(
            f"CASE WHEN length(__t) >= {k} THEN {kgram} ELSE array() END"
        ).alias("__kh"),
    )
    return kg.select(
        "id",
        F.size("__kh").cast("long").alias("n_kgrams"),
        F.expr(
            f"CASE WHEN size(__kh) >= {w} THEN "
            f"array_distinct(transform(sequence(1, size(__kh) - {w - 1}), "
            f"i -> least({mins}))) "
            f"ELSE array_distinct(__kh) END"
        ).alias("fps"),
    )


def poly_text_hash(col: str, base: int = 131) -> Column:
    """Engine-neutral polynomial hash of an (already normalized)
    string column: fold ``(acc * base + codepoint) mod 2^31-1`` over
    the characters — plain BIGINT arithmetic any engine reproduces
    bit-for-bit (same family as the winnowing k-gram hash above, over
    the whole string). Use two coprime bases (131, 137) for the
    independent hash pair double-hashing schemes (Bloom, count-min)
    need. Empty strings hash to 0 on both engines (Spark's
    ``sequence(1, 0)`` would descend, so the CASE guards it)."""
    return F.expr(
        f"CASE WHEN length({col}) >= 1 THEN "
        f"aggregate(transform(sequence(1, length({col})), "
        f"i -> cast(ascii(substring({col}, i, 1)) AS bigint)), "
        f"cast(0 AS bigint), (acc, c) -> (acc * {base} + c) % 2147483647) "
        f"ELSE cast(0 AS bigint) END"
    )
