"""Dedup clustering query: near-dup pairs -> connected components ->
survivor per cluster. Oracle = recursive-CTE minimum-label closure in
DuckDB over the exact same pair set (the minhash pair query's oracle
output, reused as a CTE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.components import dedup_clusters
from bigdata_financial_reporting_spark.operators.dedup import minhash_lsh_pairs
from bigdata_financial_reporting_spark.operators.text import tokenize
from bigdata_financial_reporting_spark.queries.dedup import _DUCK_PAIR_BASE
from bigdata_financial_reporting_spark.queries.oracle_helpers import (
    DUCK_TOKENIZE as _DUCK_TOKENIZE,
)
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

# Recursive min-label closure over the exact near-dup pair set; shared
# by both cluster queries below (recursive CTE needs the RECURSIVE
# keyword on the WITH clause). The pair set uses the bounded
# shared-shingle construction (_DUCK_PAIR_BASE — lossless; see
# queries/dedup.py) instead of the all-pairs self-join that timed out
# at sf0.1/10x.
_LABELS_CTE = (
    _DUCK_PAIR_BASE.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , pairs AS (
      SELECT id_a, id_b FROM jac WHERE j >= 0.35
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    walk AS (
      SELECT u AS id, u AS comp FROM edges
      UNION
      SELECT e.u AS id, w.comp
      FROM walk w JOIN edges e ON e.v = w.id
      WHERE w.comp < e.u
    ),
    labels AS (
      SELECT id, min(comp) AS component FROM walk GROUP BY id
    )
"""
)

_ORACLE = (
    _LABELS_CTE
    + """
    SELECT d.doc_id AS id,
           COALESCE(l.component, d.doc_id) AS component,
           COALESCE(l.component, d.doc_id) = d.doc_id AS is_survivor
    FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
    """
)


def _near_dup_pairs(d):
    """The ONE near-dup pair definition both cluster queries share —
    its LSH parameters must stay in lockstep with _LABELS_CTE's exact
    oracle closure, so it exists exactly once."""
    return minhash_lsh_pairs(
        d, "doc_id", "text", shingle_n=3, num_hashes=128, bands=64, threshold=0.35
    ).select("id_a", "id_b")


@register("dedup_clusters", oracle=_ORACLE, category="dedup")
def dedup_clusters_q(spark, sf_dir):
    """Full dedup pipeline ending: minhash pairs -> connected
    components (iterative min-label propagation) -> survivor = min id
    per cluster; singletons survive themselves. Oracle closes the same
    pair set with a recursive CTE."""
    d = load_table(spark, sf_dir, "documents")
    return dedup_clusters(_near_dup_pairs(d), d, "doc_id").select(
        "id", "component", "is_survivor"
    )

_SURVIVOR_ORACLE = (
    _LABELS_CTE
    + f"""
    , membered AS (
      SELECT d.doc_id AS id,
             COALESCE(l.component, d.doc_id) AS component,
             len({_DUCK_TOKENIZE}) AS n_tokens
      FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
    )
    SELECT component, id AS survivor_id, n_tokens AS survivor_tokens,
           n_members
    FROM (
      SELECT *,
             count(*) OVER (PARTITION BY component) AS n_members,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_tokens DESC, id) AS rn
      FROM membered
    )
    WHERE rn = 1
    """
)


@register("dedup_survivor_quality", oracle=_SURVIVOR_ORACLE, category="dedup")
def dedup_survivor_quality(spark, sf_dir):
    """Quality-aware survivor selection: near-dup pairs -> connected
    components -> per cluster keep the member with the MOST tokens
    (doc_id as the deterministic tiebreak), the RefinedWeb-style
    'keep the best duplicate' policy rather than min-id. Emits one row
    per cluster (singletons included) with the survivor and member
    count. Cluster labels come from the same bounded-iteration
    min-label propagation as dedup_clusters; the ranking is one
    partitioned window over cluster-sized groups — no global state."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(_near_dup_pairs(d), d, "doc_id").select(
        "id", "component"
    )
    toks = d.select(
        F.col("doc_id").alias("id"),
        F.size(tokenize(F.col("text"))).alias("n_tokens"),
    )
    m = clusters.join(toks, "id")
    by_comp = Window.partitionBy("component")
    ranked = (
        m.withColumn("n_members", F.count(F.lit(1)).over(by_comp))
        .withColumn(
            "rn",
            F.row_number().over(
                by_comp.orderBy(F.desc("n_tokens"), F.asc("id"))
            ),
        )
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component",
        F.col("id").alias("survivor_id"),
        F.col("n_tokens").alias("survivor_tokens"),
        "n_members",
    )
