"""Shared DuckDB-SQL fragments used by multiple oracle strings."""

from __future__ import annotations


def duck_cosine(a: str, b: str) -> str:
    """Exact-double cosine for DuckDB oracles. DuckDB's builtin
    ``list_cosine_similarity`` accumulates in float32 and diverges from
    the engine's double math in the 6th decimal; this inline expression
    reproduces the double-accumulated computation."""
    sq = "list_aggregate(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
    dot = (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )
    return f"({dot} / (sqrt({sq.format(v=a)}) * sqrt({sq.format(v=b)})))"


#: DuckDB mirror of operators.text.tokenize (lowercase, strip
#: non-alphanumerics, whitespace split, drop empties).
DUCK_TOKENIZE = (
    "list_filter(string_split_regex(regexp_replace(lower(text), "
    "'[^a-z0-9 \\t\\n]', ' ', 'g'), '\\s+'), t -> t <> '')"
)
