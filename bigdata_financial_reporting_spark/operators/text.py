"""Text primitives: tokenize, n-grams/shingles, fingerprints.

All pure Catalyst expressions (regexp / split / higher-order array
functions) — no Python in the row path, so these vectorize inside
whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
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


def fingerprint(text: Column | str) -> Column:
    """Key-collision fingerprint (OpenRefine style): sort the distinct
    tokens, rejoin, hash. Two docs with the same bag of words collide.
    """
    toks = F.sort_array(F.array_distinct(tokenize(text)))
    return F.md5(F.concat_ws(" ", toks))
