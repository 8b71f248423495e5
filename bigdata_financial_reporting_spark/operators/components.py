"""Connected components over an edge list — dedup clustering.

Near-dup detection emits PAIRS (see operators/dedup.py); production
dedup needs CLUSTERS: the transitive closure groups every variant of a
document together so one survivor per cluster can be kept. This is
connected components on the similarity graph.

Algorithm: iterative minimum-label propagation (a relational HashMin /
"large-star" style loop). Every node starts labeled with its own id;
each round, every node adopts the smallest label among itself and its
neighbors; converged when no label changes. Rounds needed ≈ graph
diameter (dedup-similarity graphs are collections of small dense
clusters — diameter is tiny, a handful of rounds). Each round is ONE
join + ONE aggregation — ordinary shuffles, no driver-side graph state;
only the convergence check (a count) touches the driver.

Deterministic: the final label of a component is its minimum node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """``(id, component)`` for every node appearing in ``edges``;
    ``component`` = the smallest node id reachable from ``id``."""
    # undirected: symmetrize once; self-loops keep isolated correctness
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    for _ in range(max_iterations):
        # each node's candidate label: min over its own and neighbors'
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "old"), "id"
            )
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
) -> DataFrame:
    """Cluster near-dup pairs and pick survivors.

    Returns ``(id, component, is_survivor)`` for EVERY id in
    ``all_ids`` — docs in no pair form their own singleton cluster.
    Survivor = smallest id per cluster (deterministic).
    """
    comp = connected_components(pairs)
    ids = all_ids.select(F.col(id_col).alias("id"))
    full = ids.join(comp, "id", "left").withColumn(
        "component", F.coalesce("component", F.col("id"))
    )
    return full.withColumn(
        "is_survivor", (F.col("id") == F.col("component")).cast("boolean")
    )
