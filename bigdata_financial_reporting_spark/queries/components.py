"""Dedup clustering query: near-dup pairs -> connected components ->
survivor per cluster. Oracle = recursive-CTE minimum-label closure in
DuckDB over the exact same pair set (the minhash pair query's oracle
output, reused as a CTE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.components import dedup_clusters
from bigdata_financial_reporting_spark.operators.dedup import minhash_lsh_pairs
from bigdata_financial_reporting_spark.queries.dedup import _DUCK_SHINGLES
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

_ORACLE = (
    # recursive CTE needs the RECURSIVE keyword on the WITH clause
    _DUCK_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))
            / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.35
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
    SELECT d.doc_id AS id,
           COALESCE(l.component, d.doc_id) AS component,
           COALESCE(l.component, d.doc_id) = d.doc_id AS is_survivor
    FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
    """
)


@register("dedup_clusters", oracle=_ORACLE, category="dedup")
def dedup_clusters_q(spark, sf_dir):
    """Full dedup pipeline ending: minhash pairs -> connected
    components (iterative min-label propagation) -> survivor = min id
    per cluster; singletons survive themselves. Oracle closes the same
    pair set with a recursive CTE."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", shingle_n=3, num_hashes=128, bands=64, threshold=0.35
    ).select("id_a", "id_b")
    return dedup_clusters(pairs, d, "doc_id").select(
        "id", "component", "is_survivor"
    )