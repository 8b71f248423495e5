"""Deduplication queries (SURVEY.md §2B.9 + training-data operators):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Oracle strategy: the LSH pipelines re-check candidates with EXACT
similarity, so when recall is 1.0 at fixture scale (asserted in
tests/test_llm_ops.py) the output equals the exact all-pairs SQL the
oracle runs. SimHash has no SQL-expressible oracle (xxhash64-based
fingerprints) -> rows-only here, properties tested separately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from bigdata_financial_reporting_spark.operators.simhash import simhash_pairs
from bigdata_financial_reporting_spark.operators.similarity import (
    lsh_blocked_pairs,
)
from bigdata_financial_reporting_spark.queries.oracle_helpers import duck_cosine
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

# Exact pairwise Jaccard over word 3-gram shingle sets, as DuckDB SQL.
# Tokenization mirrors operators.text.tokenize: lowercase, strip
# non-alphanumerics, split on whitespace, drop empties.
_DUCK_SHINGLES = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               string_split_regex(regexp_replace(lower(text), '[^a-z0-9 \\t\\n]', ' ', 'g'), '\\s+'),
               t -> t <> '') AS tok
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(
               list_transform(generate_series(1, len(tok) - 2),
                              i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS s
      FROM toks WHERE len(tok) >= 3
    )
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY sha256(lower(trim(text))) ORDER BY doc_id) = 1
    """,
    category="dedup",
)
def dedup_exact_q(spark, sf_dir):
    """Exact dedup by normalized-text hash; survivor pinned to the
    lowest doc_id. Only (hash, id) shuffles — never the text payload."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select("doc_id", "lang", "source")


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT sha256(lower(trim(text))) AS text_hash,
           count(*) AS n_copies,
           min(doc_id) AS keeper
    FROM documents
    GROUP BY 1
    """,
    category="dedup",
)
def dedup_exact_groups(spark, sf_dir):
    """Duplicate-group census: hash-groupBy form of exact dedup."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_hash")
    ).agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))


@register(
    "dedup_minhash_pairs",
    oracle=_DUCK_SHINGLES
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s))
                 / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))
          / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.35
    """,
    category="dedup",
)
def dedup_minhash_pairs_q(spark, sf_dir):
    """MinHash+LSH near-dup pairs, exact-Jaccard re-checked at
    threshold 0.35. Oracle is exact all-pairs Jaccard — they agree when
    LSH recall is 1.0 (128 hashes / 64 bands => pair-miss probability
    (1 - s^2)^64 < 1e-4 at s=0.35; recall asserted in tests)."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", shingle_n=3, num_hashes=128, bands=64, threshold=0.35
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_DUCK_SHINGLES
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s))
                 / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    JOIN documents da ON da.doc_id = a.doc_id
    JOIN documents db ON db.doc_id = b.doc_id
    WHERE da.lang = db.lang
      AND len(list_intersect(a.s, b.s))
          / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.2
    """,
    category="dedup",
)
def dedup_ngram_jaccard_q(spark, sf_dir):
    """Exact n-gram Jaccard pairs, blocked by language (the blocking
    key bounds the quadratic pair space at scale)."""
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.2, block_col="lang"
    )


@register("dedup_simhash", oracle=None, category="dedup")
def dedup_simhash_q(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 3 on 64-bit fingerprints) via
    exact pigeonhole banding. xxhash64-based -> no SQL oracle;
    determinism + banding-exactness properties in test_llm_ops.py."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_distance=3)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({duck_cosine('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {duck_cosine('a.embedding', 'b.embedding')} >= 0.35
    """,
    category="dedup",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup: all pairs above a cosine threshold, via LSH
    banding + exact-cosine re-check (lsh_blocked_pairs) — no unblocked
    self-join in the plan; at (r=2, b=32) the per-pair miss probability
    at cosine 0.35 is < 3e-7 and the hyperplanes are deterministic, so
    the output equals the exact all-pairs oracle (equality also
    asserted against pairwise_above_threshold in test_llm_ops.py).
    Production near-dup thresholds are 0.9+; the fixture's random
    embeddings are near-orthogonal (max pairwise cosine ~0.47), so the
    demo threshold is 0.35 to exercise a NON-EMPTY result — an empty
    join would make the oracle comparison vacuous."""
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_blocked_pairs(e, "vec_id", "embedding", 0.35)
