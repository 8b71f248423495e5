"""Similarity-search queries (SURVEY.md §2B.9): brute-force cosine
top-k (exact baseline), LSH-bucketed ANN (scale path), bounded pairwise
matrix."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
    pairwise_above_threshold,
)
from bigdata_financial_reporting_spark.queries.oracle_helpers import duck_cosine
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  {duck_cosine('q.qv', 'c.embedding')} AS cos_raw
           FROM embeddings c CROSS JOIN q
         )
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_cosine_topk(spark, sf_dir):
    """Exact brute-force cosine top-10 for 5 query vectors. Queries are
    broadcast; the corpus never shuffles until the k-row-per-query
    window (WindowGroupLimit keeps it tiny)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return cosine_topk(q, e, "vec_id", "vec_id", k=10)


@register(
    "sim_cosine_topk_vectorized",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  {duck_cosine('q.qv', 'c.embedding')} AS cos_raw
           FROM embeddings c CROSS JOIN q
         )
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_cosine_topk_vectorized(spark, sf_dir):
    """Same exact top-k, Arrow/numpy path: one BLAS matmul per corpus
    partition against the broadcast query matrix. Agrees with the
    expression path to 6 decimals (float64 accumulation both sides)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return cosine_topk(q, e, "vec_id", "vec_id", k=10, method="vectorized")


@register(
    "sim_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(x))) AS amax,
             embedding
      FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id,
           round(CAST(amax AS DOUBLE), 6) AS scale_amax,
           array_to_string(list_transform(embedding,
                          x -> CAST(round(x / amax * 127.0) AS INTEGER)), ',') AS q
    FROM scaled
    """,
    category="similarity",
)
def sim_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization of embeddings (absmax scaling) —
    the 4x memory/bandwidth cut before ANN at scale. Pure higher-order
    array expressions; the scale factor travels with the row for
    dequantization. The quantized vector is serialized to a comma
    string (registry convention — driver-facing schemas carry no
    complex types; cf. agg_collect_sorted)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    scaled = e.select(
        "vec_id",
        "embedding",
        F.array_max(F.transform("embedding", lambda x: F.abs(x))).alias("amax"),
    )
    return scaled.select(
        "vec_id",
        F.round(F.col("amax").cast("double"), 6).alias("scale_amax"),
        F.concat_ws(
            ",",
            F.transform(
                "embedding",
                lambda x: F.round(x / F.col("amax") * 127.0).cast("int").cast("string"),
            ),
        ).alias("q"),
    )


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT e.vec_id AS neighbor_id, e.embedding AS v, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (SELECT neighbor_id, v, cent_id AS cell FROM assigned WHERE rn = 1),
    probes AS (
      SELECT q.vec_id AS query_id, q.embedding AS qv, c.cent_id AS cell,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {duck_cosine('q.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5
    ),
    pcells AS (SELECT query_id, qv, cell FROM probes WHERE rn <= 4),
    scored AS (
      SELECT p.query_id, s.neighbor_id, {duck_cosine('p.qv', 's.v')} AS cos_raw
      FROM pcells p JOIN cells s USING (cell)
    )
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_ivf_topk(spark, sf_dir):
    """IVF-bucketed ANN: nearest-centroid cells, probe the top-4 of 16.
    Scores ~1/4 of the corpus per query; recall vs brute force measured
    in test_llm_ops.py. The pipeline is deterministic end-to-end
    (lowest-id coarse quantizer, cosine as an in-order double fold —
    identical fold order in DuckDB's list_aggregate — and cent_id/
    neighbor_id tie-breaks), so the ENTIRE candidate+score dataflow has
    an exact SQL oracle: assignment, probing, and re-rank are mirrored
    CTE-for-stage."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return ivf_topk(q, e, "vec_id", "vec_id", n_centroids=16, n_probe=4, k=10)


@register(
    "sim_lsh_topk",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xq
      FROM embeddings, generate_series(1, 64) g(i)
    ),
    hh AS (
      SELECT vec_id, p,
             xq * (CAST(concat('0x', substr(md5('plane:' || CAST(p AS VARCHAR)
                    || ':' || CAST(pos AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 2000001 - 1000000) AS term
      FROM ex, generate_series(0, 63) t(p)
    ),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN sum(term) >= 0 THEN 1 ELSE 0 END AS s
      FROM hh GROUP BY vec_id, p
    ),
    bkts AS (
      SELECT vec_id, p // 4 AS tbl,
             sum(s * (CAST(1 AS BIGINT) << (3 - (p % 4)))) AS bkt
      FROM signs GROUP BY vec_id, p // 4
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM bkts c JOIN bkts q ON c.tbl = q.tbl AND c.bkt = q.bkt
      WHERE q.vec_id < 5
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             {duck_cosine('qe.embedding', 'ce.embedding')} AS cos_raw
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_lsh_topk(spark, sf_dir):
    """ANN variant: multi-table random-hyperplane LSH (16 independent
    4-plane tables) — candidates from any table's bucket,
    deduplicated, scored exactly once. The planes are ENGINE-NEUTRAL
    (md5-derived integer components on a micro-quantized vector, so
    each per-plane sign is an exact BIGINT sum), which makes the whole
    candidate+score pipeline DuckDB-expressible: the oracle recomputes
    every bucket bit-for-bit and mirrors the exact-cosine re-rank.

    Parameters (round-4 verdict item 4): the old 6x4 config recalled
    only 0.20@10 on this fixture's near-orthogonal random embeddings
    with THESE neutral planes (the 0.30 the round-4 artifact reported
    was measured on the xxhash plane family the registry never ran —
    the old gen_sim_recall call omitted neutral_planes=True; fixed);
    4 planes x 16 tables measures 0.82@10 (deterministic — planes are
    hash-derived, no RNG), asserted as a floor in test_llm_ops.py and
    exported with the full recall-vs-candidate-cost curve in
    SIM_RECALL.json. On clustered production embeddings the same
    recall needs far fewer tables; the curve documents the trade."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return lsh_bucket_topk(
        q, e, "vec_id", "vec_id", n_planes=4, k=10, n_tables=16, neutral_planes=True
    )


@register(
    "sim_pairwise_matrix",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({duck_cosine('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.label = b.label AND a.label = 0
      AND {duck_cosine('a.embedding', 'b.embedding')} >= 0.3
    """,
    category="similarity",
)
def sim_pairwise_matrix(spark, sf_dir):
    """Bounded all-pairs cosine (one label block) — the blocking keeps
    the quadratic term bounded at scale. Threshold 0.3 because the
    fixture's random embeddings are near-orthogonal (label-0 max
    ~0.38); a higher cut would make the comparison vacuously empty."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("label") == 0)
    return pairwise_above_threshold(e, "vec_id", "embedding", 0.3)


@register(
    "sim_centroid_per_label",
    oracle="""
    WITH per AS (
      SELECT label, i AS pos,
             round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m,
             count(DISTINCT vec_id) AS nv
      FROM embeddings, generate_series(1, 64) t(i)
      GROUP BY label, i
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(max(nv) AS BIGINT) AS n_vectors,
           array_to_string(list_transform(list(m ORDER BY pos),
                           y -> CAST(round(y * 1000000) AS BIGINT)), ',') AS centroid_micro
    FROM per
    GROUP BY label
    """,
    category="similarity",
)
def sim_centroid_per_label(spark, sf_dir):
    """Per-label centroid (mean embedding) — the building block for
    IVF training, class prototypes, and drift monitoring. Scale form:
    posexplode to (label, pos, x) rows, ONE map-side-combined
    aggregation per (label, pos), then reassemble the vector ordered
    by position — no vector ever crosses the shuffle whole, and the
    output is |labels| x dim rows reduced to |labels|. The fixture
    dim (64) is pinned in the oracle's generate_series. The centroid is
    serialized as comma-joined micro-units (6-dp mean x 1e6 as BIGINT)
    so the driver-facing schema carries no array column and the string
    form is engine-neutral (integer formatting, not double repr)."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        F.col("label").cast("long").alias("label"),
        "vec_id",
        F.posexplode("embedding").alias("pos", "x"),
    )
    per = ex.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("m"),
        F.count_distinct("vec_id").alias("nv"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.max("nv").alias("n_vectors"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: F.round(s.getField("m") * 1000000)
                    .cast("long")
                    .cast("string"),
                ),
            ).alias("centroid_micro"),
        )
        .select("label", "n_vectors", "centroid_micro")
    )


@register(
    "sim_ivf_trained_topk",
    oracle=f"""
    WITH init AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
             embedding AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    a1 AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings e CROSS JOIN init c
    ),
    cell1 AS (SELECT vec_id, embedding, cent_id AS cell FROM a1 WHERE rn = 1),
    m1 AS (
      SELECT cell, i - 1 AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 9) AS m
      FROM cell1, generate_series(1, 64) g(i) GROUP BY cell, i
    ),
    nc1 AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS cv FROM m1 GROUP BY cell),
    c1 AS (
      SELECT i.cent_id, coalesce(n.cv, CAST(i.cv AS DOUBLE[])) AS cv
      FROM init i LEFT JOIN nc1 n USING (cent_id)
    ),
    a2 AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings e CROSS JOIN c1 c
    ),
    cell2 AS (SELECT vec_id, embedding, cent_id AS cell FROM a2 WHERE rn = 1),
    m2 AS (
      SELECT cell, i - 1 AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 9) AS m
      FROM cell2, generate_series(1, 64) g(i) GROUP BY cell, i
    ),
    nc2 AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS cv FROM m2 GROUP BY cell),
    c2 AS (
      SELECT i.cent_id, coalesce(n.cv, CAST(i.cv AS DOUBLE[])) AS cv
      FROM c1 i LEFT JOIN nc2 n USING (cent_id)
    ),
    assigned AS (
      SELECT e.vec_id AS neighbor_id, e.embedding AS v, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings e CROSS JOIN c2 c
    ),
    cells AS (SELECT neighbor_id, v, cent_id AS cell FROM assigned WHERE rn = 1),
    probes AS (
      SELECT q.vec_id AS query_id, q.embedding AS qv, c.cent_id AS cell,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {duck_cosine('q.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings q CROSS JOIN c2 c WHERE q.vec_id < 5
    ),
    pcells AS (SELECT query_id, qv, cell FROM probes WHERE rn <= 4),
    scored AS (
      SELECT p.query_id, s.neighbor_id, {duck_cosine('p.qv', 's.v')} AS cos_raw
      FROM pcells p JOIN cells s USING (cell)
    )
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_ivf_trained_topk(spark, sf_dir):
    """IVF ANN with REAL trained centroids: deterministic spherical
    k-means (lowest-id init, 2 Lloyd iterations, broadcast assignment,
    posexplode mean update) replaces the degenerate lowest-id coarse
    quantizer — the full IVF dataflow a production index build runs.
    Recall vs brute force and rerun-determinism asserted in
    test_llm_ops.py. Deterministic by construction (lowest-id init,
    9-dp rounded means, 2 unrollable Lloyd iterations, in-order double
    folds), so the TRAINING LOOP ITSELF is oracle-checked: the SQL
    unrolls both Lloyd iterations as CTE pairs (assign -> mean) with
    the same empty-cell fallback, then mirrors assignment/probing/
    re-rank."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        train_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    cents = train_centroids(e, "vec_id", n_centroids=16, iterations=2)
    return ivf_topk(q, e, "vec_id", "vec_id", n_probe=4, k=10, centroids=cents)


@register(
    "sim_random_projection",
    oracle="""
    WITH ex AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xq
      FROM embeddings, generate_series(1, 64) g(i)
      WHERE vec_id < 100
    ),
    rows_ AS (
      SELECT vec_id, pos, xq, d,
             CASE WHEN CAST(concat('0x', substr(md5('jl:' || CAST(d AS VARCHAR)
                    || ':' || CAST(pos AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM ex, generate_series(0, 15) t(d)
    ),
    per AS (
      SELECT vec_id, d, sum(xq * s) AS c FROM rows_ GROUP BY vec_id, d
    ),
    innorm AS (
      SELECT vec_id, sqrt(sum(CAST(xq AS DOUBLE) * xq)) AS xn
      FROM ex GROUP BY vec_id
    )
    SELECT p.vec_id,
           array_to_string(list(p.c ORDER BY p.d), ',') AS proj_micro,
           round(sqrt(sum(CAST(p.c AS DOUBLE) * p.c)) / (4.0 * max(i.xn)), 6)
             AS norm_ratio
    FROM per p JOIN innorm i USING (vec_id)
    GROUP BY p.vec_id
    """,
    category="similarity",
)
def sim_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss projection 64 -> 16 with engine-neutral
    ±1 signs (see operators/similarity.random_projection): the
    pre-ANN compression step of an embedding pipeline. Output is the
    projected vector (comma-joined exact integer micro-units — no
    complex types driver-facing) plus a norm-preservation witness
    ||proj|| / (sqrt(16)·||x||), which JL concentrates near 1; the
    distortion bound itself is asserted in test_llm_ops.py."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        random_projection,
    )

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    proj = random_projection(e, "vec_id", "embedding", out_dim=16)
    xq = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000000).cast("long")
    )
    innorm = e.select(
        F.col("vec_id").alias("id"),
        F.sqrt(
            F.aggregate(
                xq, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v
            )
        ).alias("xn"),
    )
    pn = F.sqrt(
        F.aggregate(
            "proj_micro", F.lit(0.0), lambda acc, v: acc + v.cast("double") * v
        )
    )
    return (
        proj.join(innorm, "id")
        .select(
            F.col("id").alias("vec_id"),
            F.concat_ws(
                ",", F.transform("proj_micro", lambda v: v.cast("string"))
            ).alias("proj_micro"),
            F.round(pn / (F.lit(4.0) * F.col("xn")), 6).alias("norm_ratio"),
        )
    )


@register(
    "sim_embedding_outliers",
    oracle="""
    WITH cent AS (
      SELECT label, i - 1 AS pos,
             round(avg(CAST(embedding[i] AS DOUBLE)), 9) AS m
      FROM embeddings, generate_series(1, 64) g(i)
      GROUP BY label, i
    ),
    cv AS (SELECT label, list(m ORDER BY pos) AS c FROM cent GROUP BY label),
    scored AS (
      SELECT e.vec_id, e.label,
             round(list_aggregate(list_transform(generate_series(1, 64),
                     i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i]), 'sum')
                   / (sqrt(list_aggregate(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                      * sqrt(list_aggregate(list_transform(c.c,
                        x -> x * x), 'sum'))), 9) AS cos9
      FROM embeddings e JOIN cv c USING (label)
    ),
    stats AS (
      SELECT label, avg(cos9) AS mu, stddev_samp(cos9) AS sd
      FROM scored GROUP BY label
    )
    SELECT s.vec_id, s.label,
           round(s.cos9, 6) AS cos_centroid,
           round((s.cos9 - t.mu) / t.sd, 6) AS z,
           (s.cos9 - t.mu) / t.sd < -1.5 AS is_outlier
    FROM scored s JOIN stats t USING (label)
    """,
    category="similarity",
)
def sim_embedding_outliers(spark, sf_dir):
    """Embedding QA: distance-to-class-centroid outlier flags — the
    screen for mislabeled / corrupted vectors before an index build.
    Centroids are the 9-dp-rounded per-(label, pos) means (posexplode +
    map-side-combined agg, vectors never cross the shuffle whole); each
    vector's cosine to its label centroid is rounded to 9 dp BEFORE the
    per-label z-score so both engines feed identical inputs to the
    stats. The centroid frame is label-dim-sized and broadcast."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = (
        e.select(F.col("label"), F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("x").cast("double")), 9).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("c")
        )
    )
    from bigdata_financial_reporting_spark.functions.vector import dot, l2_norm

    scored = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(
            dot(F.col("embedding"), F.col("c"))
            / (l2_norm(F.col("embedding")) * l2_norm(F.col("c"))),
            9,
        ).alias("cos9"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label")
    z = (F.col("cos9") - F.mean("cos9").over(w)) / F.stddev_samp("cos9").over(w)
    return scored.select(
        "vec_id",
        "label",
        F.round("cos9", 6).alias("cos_centroid"),
        F.round(z, 6).alias("z"),
        (z < -1.5).alias("is_outlier"),
    )


def _exact_gram_moments(spark, sf_dir):
    """Upper-triangle exact Gram moments of the micro-quantized
    embedding matrix: (i, j, sxy, sx, sy, n) with sxy/sx/sy exact
    decimal(38,0) sums and i <= j — the distributed-linear-algebra
    primitive shared by emb_covariance_matrix and
    emb_pca_power_iteration. One mapInPandas Gram pass whose
    shuffle carries #partitions x 2080 partial rows
    (corpus-size-independent), merged by an order-independent
    decimal aggregation."""
    import pandas as pd

    d = load_table(spark, sf_dir, "embeddings").select(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("xq")
    )

    # numpy int64 overflow WRAPS silently, so the per-slice Gram must
    # be bounded by construction, not by hoping the Arrow batch conf
    # stays at its 10k default. The slice size is derived from each
    # batch's OBSERVED magnitude bound m = max|xq| — rows*m^2 must stay
    # under 2^62 — rather than assuming unit-scaled embeddings: with
    # |xq| ~ 1.2e7 (components ~12) a fixed 65536-row slice would wrap
    # silently and the "exact under ANY batch size" claim would be
    # false exactly when it matters. For unit-scale inputs this
    # evaluates to the same 65536 cap; global exactness is the
    # decimal(38,0) merge below.
    CHUNK = 65536

    def partial_gram(batches):
        import numpy as np

        for pdf in batches:
            # an empty pdf yields an empty range -> no iterations
            start = 0
            while start < len(pdf):
                m = int(
                    np.abs(
                        np.concatenate(
                            pdf["xq"].iloc[start : start + CHUNK].to_numpy()
                        )
                    ).max(initial=1)
                )
                if m * m > (1 << 62):
                    # even a 1-row slice would wrap int64 — refuse
                    # rather than emit silently-wrapped partials
                    raise ValueError(
                        f"emb_covariance_matrix: |component| ~ {m / 1e6:g} "
                        "exceeds the exact-int64 Gram bound (~3e3); "
                        "rescale the embeddings first"
                    )
                safe = max(1, min(CHUNK, (1 << 62) // (m * m)))
                chunk = pdf["xq"].iloc[start : start + safe]
                start += safe
                X = np.stack(chunk.to_numpy()).astype("int64")
                n, dim = X.shape
                g = X.T @ X
                s = X.sum(axis=0)
                iu, ju = np.triu_indices(dim)
                yield pd.DataFrame(
                    {
                        "i": iu.astype("int32"),
                        "j": ju.astype("int32"),
                        "sxy": g[iu, ju],
                        "sx": s[iu],
                        "sy": s[ju],
                        "n": np.full(len(iu), n, dtype="int64"),
                    }
                )

    partials = d.mapInPandas(
        partial_gram, schema="i int, j int, sxy long, sx long, sy long, n long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("sxy").cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("sx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("sy").cast("decimal(38,0)")).alias("sy"),
        F.sum("n").alias("n"),
    )


@register(
    "emb_covariance_matrix",
    oracle="""
    WITH x AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS xq
      FROM embeddings, generate_series(1, 64) g(i)
    ),
    p AS (
      SELECT a.pos AS pos_i, b.pos AS pos_j,
             sum(a.xq * b.xq) AS sxy,
             sum(a.xq) AS sx, sum(b.xq) AS sy,
             count(*) AS n
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.pos <= b.pos
      GROUP BY a.pos, b.pos
    ),
    q AS (
      SELECT pos_i, pos_j, n,
             sxy * n - sx * sy AS num,
             CAST(n AS HUGEINT) * (n - 1) * 1000000 AS den
      FROM p
    )
    SELECT pos_i, pos_j,
           CAST(CASE WHEN num < 0
                     THEN -((2 * (-num) + den) // (2 * den))
                     ELSE (2 * num + den) // (2 * den)
                END AS BIGINT) AS cov_u,
           n
    FROM q
    """,
    category="similarity",
)
def emb_covariance_matrix(spark, sf_dir):
    """Distributed covariance matrix of the embedding columns (upper
    triangle, 64x65/2 = 2080 entries) — the input to PCA whitening and
    the classic distributed-linear-algebra pattern: each partition
    computes its LOCAL Gram sums with one vectorized numpy X^T X
    (mapInPandas, Arrow batches), emitting 2080 partial rows; a single
    keyed aggregation merges partials into exact global sums. The
    shuffle carries #partitions x 2080 rows — independent of corpus
    size — so the operator scales to any row count; only the dimension
    d^2 term matters.

    Determinism (the round-4 driver failure): double partial sums merge
    in shuffle order, and float addition is not associative, so entries
    near a 6-dp rounding boundary flipped between runs. Fixed with the
    sim_random_projection pattern — components micro-quantize to exact
    integers (round(x*1e6), Spark-side so both engines share HALF_UP),
    the Gram partials are exact int64, and the merge accumulates
    decimal(38,0) (order-independent).

    Rendering (the round-5 driver failure): even with exact sums, a
    final round(double, 6) disagrees on SIGNED ZERO — DuckDB's round is
    C++ std::round (round(-1e-9, 6) -> -0.0) while Spark's F.round goes
    through BigDecimal, which cannot represent -0.0 -> +0.0; one such
    cell fails the driver's value hash. So NO double ever enters the
    output: both engines emit the covariance as exact BIGINT micro-units
    cov_u = round_half_away((Sxy*n - Sx*Sy) / (n*(n-1)*1e6)), computed
    with pure-integer arithmetic — sign(num) * ((2|num| + den) div
    (2 den)) — where integer zero has no sign. Precision headroom:
    |num| <= ~2e12 * n^2 stays inside decimal(38,0)/HUGEINT up to
    n ~ 1e12 rows."""
    merged = _exact_gram_moments(spark, sf_dir)
    num = F.col("sxy") * F.col("n") - F.col("sx") * F.col("sy")
    den = (
        F.col("n").cast("decimal(38,0)")
        * (F.col("n") - F.lit(1))
        * F.lit(1000000)
    )
    # round-half-away-from-zero on exact integers: integer zero carries
    # no sign, so the signed-zero rendering divergence cannot recur.
    return (
        merged.withColumn("num", num)
        .withColumn("den", den)
        .selectExpr(
            "i as pos_i",
            "j as pos_j",
            "cast(case when num < 0 then -((2 * (-num) + den) div (2 * den))"
            "          else (2 * num + den) div (2 * den) end as bigint)"
            " as cov_u",
            "n",
        )
    )


def _duck_dot(a: str, b: str) -> str:
    """Double-accumulated dot product (mirror of functions.vector.dot)."""
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


@register(
    "sim_maxdot_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  {_duck_dot('q.qv', 'c.embedding')} AS dot_raw
           FROM embeddings c CROSS JOIN q
         )
    SELECT query_id, neighbor_id, round(dot_raw, 6) AS dot,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_raw DESC, neighbor_id) AS INT)
             AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_maxdot_topk(spark, sf_dir):
    """Maximum-inner-product search (MIPS) top-10 — the retrieval
    metric for recommender and dual-encoder models where magnitude
    carries signal (cosine discards it). Same broadcast-queries /
    corpus-never-shuffles plan as cosine: one dot per (query, corpus)
    pair locally, WindowGroupLimit keeps k per query."""
    from bigdata_financial_reporting_spark.functions.vector import dot

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    from pyspark.sql import Window

    scored = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id", dot(F.col("qv"), F.col("cv")).alias("d")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("d"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", F.round("d", 6).alias("dot"), "rank")
    )


@register(
    "sim_euclidean_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  sqrt(list_aggregate(list_transform(
                    generate_series(1, len(q.qv)),
                    i -> (CAST(q.qv[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
                         * (CAST(q.qv[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
                  ), 'sum')) AS dist_raw
           FROM embeddings c CROSS JOIN q
         )
    SELECT query_id, neighbor_id, round(dist_raw, 6) AS l2_dist,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist_raw, neighbor_id) AS INT)
             AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_euclidean_topk(spark, sf_dir):
    """Euclidean (L2) nearest-neighbor top-10 — the metric for
    distance-calibrated embeddings (k-means assignment, radius
    filters). The squared-difference fold runs as one zip_with +
    aggregate expression per pair; ordering ascends on distance with
    the id tie-break, same plan family as the other exact searches."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    diff2 = F.aggregate(
        F.zip_with(
            "qv", "cv",
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    scored = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id", F.sqrt(diff2).alias("dist")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id", "neighbor_id",
            F.round("dist", 6).alias("l2_dist"), "rank",
        )
    )


@register(
    "sim_pq_encode",
    oracle="""
    WITH lowest AS (
      SELECT embedding AS cv,
             row_number() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    cb AS (SELECT s, code, cv FROM lowest, generate_series(0, 7) t(s)),
    scored AS (
      SELECT e.vec_id, c.s, c.code,
             list_aggregate(list_transform(generate_series(1, 8),
               i -> (CAST(e.embedding[c.s*8+i] AS DOUBLE)
                     - CAST(c.cv[c.s*8+i] AS DOUBLE))
                  * (CAST(e.embedding[c.s*8+i] AS DOUBLE)
                     - CAST(c.cv[c.s*8+i] AS DOUBLE))), 'sum') AS d2
      FROM embeddings e CROSS JOIN cb c
    ),
    best AS (
      SELECT vec_id, s, code, d2,
             row_number() OVER (PARTITION BY vec_id, s
                                ORDER BY d2, code) AS rn
      FROM scored
    )
    SELECT vec_id AS id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY s) AS pq_code,
           round(list_aggregate(list(d2 ORDER BY s), 'sum') / 64, 6) AS mse
    FROM best WHERE rn = 1
    GROUP BY vec_id
    """,
    category="similarity",
)
def sim_pq_encode(spark, sf_dir):
    """Product-quantization encoding (the FAISS-style IVF-PQ
    compression step): each 64-dim vector becomes 8 sub-codes into
    16-entry per-subspace codebooks — 32x smaller, the representation
    billion-vector ANN indexes actually store. The degenerate
    lowest-id codebook keeps the whole dataflow (per-subspace squared
    L2 as an in-order fold, (d2, code)-ordered argmin, subspace-ordered
    reassembly) exactly reproducible in the SQL oracle; production
    passes per-subspace trained centroids via
    operators.similarity.pq_encode's codebook argument. Emits the
    packed code and the reconstruction MSE witness."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        pq_encode,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return pq_encode(e, "vec_id", "embedding", n_subspaces=8, n_codes=16)


_DUCK_PQ_D2 = (
    "list_aggregate(list_transform(generate_series(1, 8), "
    "i -> (CAST({a}[{s}*8+i] AS DOUBLE) - CAST({b}[{s}*8+i] AS DOUBLE)) "
    "   * (CAST({a}[{s}*8+i] AS DOUBLE) - CAST({b}[{s}*8+i] AS DOUBLE))), "
    "'sum')"
)


def _duck_pq_encode_ctes(src: str, mse_alias: str) -> str:
    """The sim_pq_encode oracle canon as named CTEs over source table
    ``src`` (degenerate lowest-16 codebook, per-subspace in-order d2,
    (d2, code) argmin, subspace-ordered reassembly) — reused by the
    OPQ rotation key over both the raw and the rotated vectors."""
    d2 = _DUCK_PQ_D2.format(a="e.embedding", b="c.cv", s="c.s")
    return f"""
    lowest_{src} AS (
      SELECT embedding AS cv,
             row_number() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT * FROM {src} ORDER BY vec_id LIMIT 16)
    ),
    cb_{src} AS (
      SELECT s, code, cv FROM lowest_{src}, generate_series(0, 7) t(s)
    ),
    scored_{src} AS (
      SELECT e.vec_id, c.s, c.code, {d2} AS d2
      FROM {src} e CROSS JOIN cb_{src} c
    ),
    best_{src} AS (
      SELECT vec_id, s, code, d2,
             row_number() OVER (PARTITION BY vec_id, s
                                ORDER BY d2, code) AS rn
      FROM scored_{src}
    ),
    enc_{src} AS (
      SELECT vec_id AS id,
             string_agg(CAST(code AS VARCHAR), ',' ORDER BY s) AS pq_code,
             round(list_aggregate(list(d2 ORDER BY s), 'sum') / 64, 6)
               AS {mse_alias}
      FROM best_{src} WHERE rn = 1
      GROUP BY vec_id
    )"""


@register(
    "sim_opq_rotation_encode",
    oracle=f"""
    WITH rot AS (
      SELECT vec_id, list_transform(generate_series(0, 63), i ->
        CAST(list_aggregate(list_transform(generate_series(0, 63), j ->
          CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 1000000)
               AS BIGINT)
          * CASE WHEN bit_count(CAST(i AS BIGINT) & CAST(j AS BIGINT))
                      % 2 = 1
                 THEN -1 ELSE 1 END), 'sum') AS DOUBLE) / 8000000.0
      ) AS embedding
      FROM embeddings
    ),
    {_duck_pq_encode_ctes('rot', 'mse_rot')},
    {_duck_pq_encode_ctes('embeddings', 'mse_raw')}
    SELECT r.id, r.pq_code, r.mse_rot, p.mse_raw
    FROM enc_rot r JOIN enc_embeddings p USING (id)
    """,
    category="similarity",
)
def sim_opq_rotation_encode(spark, sf_dir):
    """OPQ rotation step on the PQ path (round-11 verdict item 7): the
    corpus is rotated by the normalized Walsh-Hadamard matrix —
    Optimized Product Quantization's structured-rotation baseline
    (Ge et al. 2013; FAISS's OPQ/ROTATE pre-transform) — and then
    PQ-encoded; the key emits each vector's rotated code and BOTH
    reconstruction MSEs (rotated vs raw) so the rotation's effect on
    quantization error is a first-class, oracle-hashed witness.
    Exactness: the rotation is an integer matmul on half-away-rounded
    1e-6 units (order-free, both engines bit-identical; see
    operators.similarity.hadamard_rotate) rendered with ONE division
    by sqrt(64)*1e6, and both encodes are the pinned sim_pq_encode
    canon. At 100 TB the rotation is a pure scan-shaped map (Arrow
    numpy int64 product per partition, no shuffle) ahead of the
    unchanged PQ dataflow."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        hadamard_rotate,
        pq_encode,
    )

    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    e = load_table(spark, sf_dir, "embeddings")
    # The rotated frame feeds pq_encode's codebook derivation, its
    # dimension probe, and the encode scan — unpersisted, the Arrow
    # int64 matmul re-ran once per consumer (round-14 scan audit).
    # Persist the rotation output once, track()-scoped.
    rot = track(
        hadamard_rotate(e, "vec_id", "embedding", dim=64).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    enc_rot = pq_encode(rot, "vec_id", "embedding", n_subspaces=8, n_codes=16)
    enc_raw = pq_encode(
        e, "vec_id", "embedding", n_subspaces=8, n_codes=16
    ).select("id", F.col("mse").alias("mse_raw"))
    return enc_rot.select(
        "id", "pq_code", F.col("mse").alias("mse_rot")
    ).join(enc_raw, "id")


@register(
    "sim_ivf_probe_sweep",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT e.vec_id AS neighbor_id, e.embedding AS v, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (SELECT neighbor_id, v, cent_id AS cell FROM assigned WHERE rn = 1),
    probes AS (
      SELECT q.vec_id AS query_id, q.embedding AS qv, c.cent_id AS cell,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {duck_cosine('q.embedding', 'c.cv')} DESC, c.cent_id)
               AS cell_rank
      FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5
    ),
    ring AS (SELECT query_id, qv, cell, cell_rank FROM probes WHERE cell_rank <= 8),
    scored AS (
      SELECT p.query_id, s.neighbor_id, p.cell_rank,
             {duck_cosine('p.qv', 's.v')} AS cos_raw
      FROM ring p JOIN cells s USING (cell)
    ),
    plist(n_probe) AS (VALUES (1), (2), (4), (8)),
    swept AS (
      SELECT pl.n_probe, sc.query_id, sc.neighbor_id, sc.cos_raw
      FROM scored sc CROSS JOIN plist pl WHERE sc.cell_rank <= pl.n_probe
    ),
    cand AS (
      SELECT n_probe, count(*) AS candidates_scored FROM swept GROUP BY 1
    ),
    ak AS (
      SELECT n_probe, query_id, neighbor_id FROM (
        SELECT n_probe, query_id, neighbor_id,
               row_number() OVER (PARTITION BY n_probe, query_id
                 ORDER BY cos_raw DESC, neighbor_id) AS rank
        FROM swept
      ) WHERE rank <= 10
    ),
    ek AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {duck_cosine('q.embedding', 'c.embedding')} DESC,
                          c.vec_id) AS rank
        FROM embeddings c
        CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
      ) WHERE rank <= 10
    ),
    hits AS (
      SELECT n_probe, count(*) AS n_hits
      FROM ak JOIN ek USING (query_id, neighbor_id) GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT count(*) FROM embeddings WHERE vec_id < 5) AS nq,
             (SELECT count(*) FROM embeddings) AS nc
    )
    SELECT c.n_probe,
           COALESCE(h.n_hits, 0) AS n_hits,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / (t.nq * 10), 6)
             AS recall_at_k,
           c.candidates_scored,
           round(CAST(c.candidates_scored AS DOUBLE) / (t.nq * t.nc), 6)
             AS candidate_fraction
    FROM cand c LEFT JOIN hits h USING (n_probe) CROSS JOIN tot t
    """,
    category="similarity",
)
def sim_ivf_probe_sweep(spark, sf_dir):
    """IVF probe-count sweep — the recall/cost operating curve as an
    oracle-hashed first-class result (round-12 verdict item 8, the
    learned-IVF probe-count witness): for n_probe in (1, 2, 4, 8),
    recall@10 of the IVF selection vs exact brute force AND the
    candidates actually scored (count + corpus fraction). ONE pass:
    the corpus is cell-assigned once, candidates in the deepest ring
    are scored once with the pinned cosine, and each p-slice is a
    filter on the probed cell's rank — so every slice equals
    ivf_topk(n_probe=p) exactly, and the curve is the tuning artifact
    an ANN deployment reads. Recall/fraction are exact-integer
    divisions rounded 6 dp; both engines compute identical doubles.
    See operators.similarity.ivf_probe_sweep for the 100 TB posture
    (cost = one deepest-ring ivf_topk + count aggs)."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        ivf_probe_sweep,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return ivf_probe_sweep(
        q, e, "vec_id", "vec_id",
        n_centroids=16, probe_counts=(1, 2, 4, 8), k=10,
    )


@register(
    "sim_ivfpq_residual_encode",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding AS v, c.cent_id, c.cv,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    res AS (
      SELECT vec_id, cent_id AS cell,
             list_transform(generate_series(1, 64), i ->
               CAST(v[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)) AS embedding
      FROM assigned WHERE rn = 1
    ),
    {_duck_pq_encode_ctes('res', 'mse')}
    SELECT r.vec_id AS id, r.cell, e.pq_code, e.mse
    FROM res r JOIN enc_res e ON r.vec_id = e.id
    """,
    category="similarity",
)
def sim_ivfpq_residual_encode(spark, sf_dir):
    """IVF-PQ RESIDUAL encoding — what production IVF-PQ indexes
    (FAISS IndexIVFPQ) actually store: PQ quantizes x - centroid(cell)
    instead of x, concentrating the codebook's precision on the
    within-cell variation. The key emits (id, cell, pq_code, mse);
    the residual mse is directly comparable to sim_pq_encode's
    raw-vector mse on the same corpus — the standard witness for the
    residual-vs-raw trade (the win needs L2-tight trained cells; the
    degenerate quantizer on synthetic vectors makes the column an
    honest null result here). Exactness: pinned lowest-id/cosine
    cell assignment, exact per-component double subtraction (no fold),
    then the unchanged pq_encode canon over residuals with the
    lowest-id RESIDUAL codebook. At 100 TB the residual step is a
    pure map between the assignment join and the encode."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        ivf_residual_encode,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_residual_encode(
        e, "vec_id", "embedding",
        n_centroids=16, n_subspaces=8, n_codes=16,
    )


@register(
    "sim_ivfpq_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT e.vec_id AS neighbor_id, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id)
               AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (SELECT neighbor_id, cent_id AS cell FROM assigned WHERE rn = 1),
    probes AS (
      SELECT q.vec_id AS query_id, c.cent_id AS cell,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {duck_cosine('q.embedding', 'c.cv')} DESC, c.cent_id)
               AS rn
      FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5
    ),
    pcells AS (SELECT query_id, cell FROM probes WHERE rn <= 4),
    lowest AS (
      SELECT embedding AS cbv,
             row_number() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    cb AS (SELECT s, code, cbv FROM lowest, generate_series(0, 7) t(s)),
    code_scored AS (
      SELECT e.vec_id AS neighbor_id, c.s, c.code,
             {_DUCK_PQ_D2.format(a='e.embedding', b='c.cbv', s='c.s')} AS d2,
             row_number() OVER (PARTITION BY e.vec_id, c.s
               ORDER BY {_DUCK_PQ_D2.format(a='e.embedding', b='c.cbv', s='c.s')},
                        c.code) AS rn
      FROM embeddings e CROSS JOIN cb c
    ),
    codes AS (SELECT neighbor_id, s, code FROM code_scored WHERE rn = 1),
    qtable AS (
      SELECT q.vec_id AS query_id, c.s, c.code,
             {_DUCK_PQ_D2.format(a='q.embedding', b='c.cbv', s='c.s')} AS qd2
      FROM embeddings q CROSS JOIN cb c WHERE q.vec_id < 5
    ),
    cand AS (
      SELECT DISTINCT p.query_id, s.neighbor_id
      FROM pcells p JOIN cells s USING (cell)
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_aggregate(list(qt.qd2 ORDER BY k.s), 'sum') AS adc
      FROM cand
      JOIN codes k ON k.neighbor_id = cand.neighbor_id
      JOIN qtable qt ON qt.query_id = cand.query_id
                    AND qt.s = k.s AND qt.code = k.code
      GROUP BY cand.query_id, cand.neighbor_id
    )
    SELECT query_id, neighbor_id, round(adc, 6) AS adc_d2,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN (the FAISS composition billion-vector indexes run):
    IVF cells bound WHICH candidates are scored (4/16 probing), PQ
    codes bound WHAT scoring reads (8 ints per vector, raw vectors
    never touched at query time), asymmetric distance computed from a
    broadcast per-query 8x16 lookup table with a subspace-ordered
    fold. Degenerate lowest-id quantizers keep every stage exactly
    SQL-reproducible — assignment, probing, encoding, distance tables,
    ADC sum, and re-rank are mirrored CTE-for-stage; production swaps
    in train_centroids cells + train_pq_codebook entries. Recall vs
    the exact ranking is measured in test_llm_ops.py."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        ivfpq_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return ivfpq_topk(
        q, e, "vec_id", "vec_id",
        n_centroids=16, n_probe=4, n_subspaces=8, n_codes=16, k=10,
    )


#: subvector d2 on 8-element SUBVECTOR lists (1-based, unlike
#: _DUCK_PQ_D2 which indexes full-dim vectors at subspace offsets)
_DUCK_SUB_D2 = (
    "list_aggregate(list_transform(generate_series(1, 8), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')"
)

#: one unrolled per-subspace Lloyd iteration for the PQ training
#: oracle: assign every (vid, s) subvector to its min-d2 entry of
#: {prev} (ties to the lower code, NULLs last — DuckDB's ASC default),
#: recompute per-(s, code, pos) means rounded to 9 dp, carry empty
#: cells forward. Mirrors operators.similarity.train_pq_codebook's
#: iteration body stage for stage.
_DUCK_PQ_LLOYD = """
    asg{n} AS (
      SELECT vid, s, sv, code,
             row_number() OVER (PARTITION BY vid, s
               ORDER BY {d2}, code) AS rn
      FROM sub JOIN {prev} USING (s)
    ),
    mean{n} AS (
      SELECT s, code, i - 1 AS pos, round(avg(sv[i]), 9) AS m
      FROM (SELECT * FROM asg{n} WHERE rn = 1), generate_series(1, 8) g(i)
      GROUP BY s, code, i
    ),
    newcv{n} AS (
      SELECT s, code, list(m ORDER BY pos) AS cv FROM mean{n}
      GROUP BY s, code
    ),
    book{n} AS (
      SELECT p.s, p.code, coalesce(nc.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN newcv{n} nc USING (s, code)
    )"""


@register(
    "sim_ivfpq_trained_topk",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id AS vid, t.s,
             list_transform(generate_series(1, 8),
               i -> CAST(embedding[t.s * 8 + i] AS DOUBLE)) AS sv
      FROM embeddings, generate_series(0, 7) t(s)
    ),
    init AS (
      SELECT embedding AS v,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    book0 AS (
      SELECT t.s, code,
             list_transform(generate_series(1, 8),
               i -> CAST(v[t.s * 8 + i] AS DOUBLE)) AS cv
      FROM init, generate_series(0, 7) t(s)
    ),
    {_DUCK_PQ_LLOYD.format(n=1, prev='book0',
                           d2=_DUCK_SUB_D2.format(a='sv', b='cv'))},
    {_DUCK_PQ_LLOYD.format(n=2, prev='book1',
                           d2=_DUCK_SUB_D2.format(a='sv', b='cv'))},
    enc AS (
      SELECT vid AS neighbor_id, s, code,
             row_number() OVER (PARTITION BY vid, s
               ORDER BY {_DUCK_SUB_D2.format(a='sv', b='cv')}, code) AS rn
      FROM sub JOIN book2 USING (s)
    ),
    codes AS (SELECT neighbor_id, s, code FROM enc WHERE rn = 1),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    cassign AS (
      SELECT e.vec_id AS neighbor_id, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id)
               AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (SELECT neighbor_id, cent_id AS cell FROM cassign WHERE rn = 1),
    probes AS (
      SELECT q.vec_id AS query_id, c.cent_id AS cell,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {duck_cosine('q.embedding', 'c.cv')} DESC, c.cent_id)
               AS rn
      FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5
    ),
    pcells AS (SELECT query_id, cell FROM probes WHERE rn <= 4),
    qsub AS (
      SELECT vec_id AS query_id, t.s,
             list_transform(generate_series(1, 8),
               i -> CAST(embedding[t.s * 8 + i] AS DOUBLE)) AS sv
      FROM embeddings, generate_series(0, 7) t(s)
      WHERE vec_id < 5
    ),
    qtable AS (
      SELECT query_id, s, code,
             {_DUCK_SUB_D2.format(a='sv', b='cv')} AS qd2
      FROM qsub JOIN book2 USING (s)
    ),
    cand AS (
      SELECT DISTINCT p.query_id, s.neighbor_id
      FROM pcells p JOIN cells s USING (cell)
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_aggregate(list(qt.qd2 ORDER BY k.s), 'sum') AS adc
      FROM cand
      JOIN codes k ON k.neighbor_id = cand.neighbor_id
      JOIN qtable qt ON qt.query_id = cand.query_id
                    AND qt.s = k.s AND qt.code = k.code
      GROUP BY cand.query_id, cand.neighbor_id
    )
    SELECT query_id, neighbor_id, round(adc, 6) AS adc_d2,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
    category="similarity",
)
def sim_ivfpq_trained_topk(spark, sf_dir):
    """IVF-PQ with a TRAINED product-quantizer codebook — the
    production path `sim_ivfpq_topk`'s degenerate quantizer only
    stands in for (round-10 verdict item 3b): per-subspace Lloyd
    (lowest-id init, 2 iterations, broadcast assignment with
    lower-code tie-break, 9-dp-rounded means, empty-cell carry) trains
    the 8x16 codebook that then drives encoding, the per-query ADC
    tables, and the re-rank. The TRAINING LOOP ITSELF is
    oracle-checked: the SQL unrolls both Lloyd iterations stage for
    stage (the `sim_ivf_trained_topk` canon, applied to the subspace
    quantizer), so a drift anywhere in train_pq_codebook — tie-break,
    NULL ordering, empty-cell fallback, mean rounding — hash-fails.
    The 9-dp mean round is the pinned safe-residue float policy
    (SURVEY §7.5): engine-order avg noise is ~1e-13 relative on O(1)
    values, absorbed at 9 dp, as the trained-IVF key established.
    IVF cells stay the degenerate lowest-id coarse quantizer so this
    key isolates the PQ training path. At 100 TB the codebook is
    model-sized state (8x16x8 doubles collected between iterations);
    every data-sized pass is distributed — assignment is a broadcast
    join, means one map-side-combined aggregation, and query-time
    scoring reads only (id, cell, code_0..7)."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        ivfpq_topk,
        train_pq_codebook,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    cb = train_pq_codebook(
        e, "vec_id", "embedding", n_subspaces=8, n_codes=16, iterations=2
    )
    return ivfpq_topk(
        q, e, "vec_id", "vec_id",
        n_centroids=16, n_probe=4, n_subspaces=8, n_codes=16, k=10,
        codebook=cb,
    )


@register(
    "emb_pca_power_iteration",
    oracle="""
    WITH x AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS xq
      FROM embeddings, generate_series(1, 64) g(i)
    ),
    p AS (
      SELECT a.pos AS i, b.pos AS j,
             sum(a.xq * b.xq) AS sxy, sum(a.xq) AS sx, sum(b.xq) AS sy,
             count(*) AS n
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.pos <= b.pos
      GROUP BY a.pos, b.pos
    ),
    up AS (SELECT i, j, sxy * n - sx * sy AS num FROM p),
    sym AS (
      SELECT i, j, num FROM up
      UNION ALL
      SELECT j, i, num FROM up WHERE i <> j
    ),
    v1 AS (SELECT i, sum(num) AS v1 FROM sym GROUP BY i),
    t AS (
      SELECT s.i, s.j, CAST(s.num AS DOUBLE) * CAST(v.v1 AS DOUBLE) AS term
      FROM sym s JOIN v1 v ON v.i = s.j
    ),
    v2 AS (
      SELECT i, list_aggregate(list(term ORDER BY j), 'sum') AS v2
      FROM t GROUP BY i
    )
    SELECT v1.i AS pos,
           round(CAST(v1.v1 AS DOUBLE) / 1e12, 6) + 0 AS v1_s,
           round(v2.v2 / 1e30, 6) + 0 AS v2_s
    FROM v1 JOIN v2 USING (i)
    """,
    category="similarity",
)
def emb_pca_power_iteration(spark, sf_dir):
    """Two unrolled power-method iterations toward the top principal
    component of the embedding covariance — the building block of
    distributed PCA/whitening. The covariance numerator matrix M
    (exact integers from _exact_gram_moments) stays d x d =
    model-sized, so each iteration is a broadcast-scale matrix-vector
    product, never a corpus pass: v1 = M·1 is an exact decimal sum per
    row; v2 = M·v1 folds its 64 per-row terms in FIXED j order
    (array_sort + F.aggregate ↔ list(... ORDER BY j) +
    list_aggregate), so the only float additions happen in an ordered
    64-element fold — bit-identical across engines and layouts.
    Outputs are scaled by the quantization powers (1e12 / 1e30);
    '+ 0' guards tiny-negative components rounding to DuckDB's -0.0.
    Normalization and further iterations multiply the same broadcast
    matrix — per-iteration cost is O(d^2), independent of row count."""
    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    # The symmetrized moment frame feeds both iterations and v1 feeds
    # both the broadcast product and the final join — unpersisted,
    # every reference re-ran the full corpus Gram pass (six scans per
    # action, round-14 audit). All three frames are d x d model-sized
    # (<= 4096 rows at d=64), so the persists are free and the corpus
    # is scanned exactly once.
    merged = _exact_gram_moments(spark, sf_dir)
    num = (F.col("sxy") * F.col("n") - F.col("sx") * F.col("sy")).alias("num")
    up = merged.select("i", "j", num)
    sym = track(
        up.union(
            up.filter(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "num"
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    v1 = track(
        sym.groupBy("i")
        .agg(F.sum("num").alias("v1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    terms = sym.join(
        F.broadcast(v1.select(F.col("i").alias("j"), F.col("v1"))), "j"
    ).select(
        "i",
        "j",
        (F.col("num").cast("double") * F.col("v1").cast("double")).alias(
            "term"
        ),
    )
    v2 = terms.groupBy("i").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "term"))),
                lambda x: x["term"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("v2")
    )
    return v1.join(v2, "i").select(
        F.col("i").alias("pos"),
        F.round(F.col("v1").cast("double") / F.lit(1e12), 6).alias("v1_s"),
        F.round(F.col("v2") / F.lit(1e30), 6).alias("v2_s"),
    )


#: shared DuckDB fragment: embeddings micro-quantized to exact BIGINT
_DUCK_XQ = (
    "list_transform(embedding, x -> "
    "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)


@register(
    "emb_kmeans_lloyd_step",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {_DUCK_XQ} AS xq FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, xq AS cq FROM v WHERE vec_id < 8),
    d AS (
      SELECT v.vec_id, c.cid,
             list_aggregate(list_transform(generate_series(1, 64),
               i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i])), 'sum')
               AS dist2
      FROM v, c
    ),
    a AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist2, cid) AS rn
      FROM d
    ),
    asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
    pos AS (
      SELECT asg.cid AS cluster,
             unnest(generate_series(1, 64)) AS i,
             unnest(v.xq) AS x
      FROM asg JOIN v USING (vec_id)
    ),
    g AS (
      SELECT cluster, i - 1 AS pos,
             sum(CAST(x AS HUGEINT)) AS s, count(*) AS n
      FROM pos GROUP BY 1, 2
    )
    SELECT cluster, pos,
           CAST(CASE WHEN s < 0 THEN -((2 * (-s) + n) // (2 * n))
                     ELSE (2 * s + n) // (2 * n) END AS BIGINT)
             AS centroid_u,
           CAST(n AS BIGINT) AS n_members
    FROM g
    """,
    category="similarity",
)
def emb_kmeans_lloyd_step(spark, sf_dir):
    """One Lloyd (k-means) iteration, distributed and EXACT: assign
    every vector to the nearest of k=8 seed centroids (the first 8
    vectors — deterministic seeding), then recompute centroids as
    per-cluster means on micro-quantized integers, rendered via
    half-away division — no order-dependent float anywhere.

    Round-10 vectorization (the _lsh_band_buckets_arrow argument): the
    assignment pass previously evaluated k x 64 interpreted
    zip_with/aggregate lambdas per row and fed a posexplode into a
    64 x N-row shuffle. Now each Arrow batch computes every distance
    in ONE integer-valued float64 matmul — d = |x|^2 - 2 x.C^T + |c|^2,
    every term an exact integer below 2^53 (64 x (4e6)^2 ~ 1e15), so
    argmin is exact and batch-independent; ties break on the lowest
    centroid id because the seed rows are sorted by id and argmin
    returns the first minimum. Per-batch per-cluster column sums are
    exact int64 (<= 4e6 x batch), so the shuffle carries k x 64
    partial rows PER BATCH instead of 64 rows per vector — the
    mergeable-moments shape of emb_covariance_matrix; the final
    decimal(38,0) merge keeps the global sums exact at any scale.
    Full k-means = this step iterated from the emitted centroids."""
    import numpy as np

    from bigdata_financial_reporting_spark.functions.exact import (
        spark_half_div,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("xq"),
    )
    # bounded collect: the k=8 seed rows
    seeds = sorted(
        (r["vec_id"], r["xq"]) for r in emb.filter(F.col("vec_id") < 8).collect()
    )
    cids = np.array([cid for cid, _ in seeds], dtype=np.int64)
    cmat = np.array([list(cq) for _, cq in seeds], dtype=np.float64)
    c2 = (cmat * cmat).sum(axis=1)
    bc = spark.sparkContext.broadcast((cids, cmat, c2))

    def partial_moments(batches):
        import pandas as pd

        cids_, cmat_, c2_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            xi = np.stack(pdf["xq"].to_numpy()).astype(np.int64)
            xf = xi.astype(np.float64)
            # Loud exactness guard (round-10 advice): d combines three
            # integer-valued terms each bounded by 2*qmax^2*dim and the
            # distance itself by 4*qmax^2*dim; all must stay below 2^53
            # for the argmin to be exact, so fail loudly past that
            # instead of silently diverging from the HUGEINT oracle.
            qmax = max(
                float(np.abs(xf).max()) if xf.size else 0.0,
                float(np.abs(cmat_).max()) if cmat_.size else 0.0,
            )
            if 4.0 * qmax * qmax * xf.shape[1] >= 2.0**53:
                raise ValueError(
                    "emb_kmeans_lloyd_step: |x| too large for exact "
                    "integer distances (4 * qmax^2 * dim >= 2^53) — "
                    "rescale the embeddings first"
                )
            x2 = (xf * xf).sum(axis=1)
            d = x2[:, None] - 2.0 * (xf @ cmat_.T) + c2_[None, :]
            assign = np.argmin(d, axis=1)  # first min = lowest cid
            rows = {"cluster": [], "pos": [], "s": [], "n": []}
            dim = xi.shape[1]
            for ci in range(len(cids_)):
                mask = assign == ci
                n = int(mask.sum())
                if n == 0:
                    continue
                sums = xi[mask].sum(axis=0)  # int64, <= 4e6 * batch
                rows["cluster"].extend([int(cids_[ci])] * dim)
                rows["pos"].extend(range(dim))
                rows["s"].extend(int(v) for v in sums)
                rows["n"].extend([n] * dim)
            yield pd.DataFrame(rows)

    partials = emb.select("xq").mapInPandas(
        partial_moments, "cluster int, pos int, s long, n long"
    )
    g = partials.groupBy("cluster", "pos").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s"),
        F.sum("n").alias("n"),
    )
    return g.select(
        "cluster",
        "pos",
        F.expr(spark_half_div("s", "n")).cast("long").alias("centroid_u"),
        F.col("n").cast("long").alias("n_members"),
    )


@register(
    "emb_label_margin",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, {_DUCK_XQ} AS xq FROM embeddings
    ),
    cp AS (
      SELECT label, i - 1 AS pos,
             sum(CAST(x AS HUGEINT)) AS s, count(*) AS n
      FROM (SELECT label,
                   unnest(generate_series(1, 64)) AS i,
                   unnest(xq) AS x
            FROM v)
      GROUP BY 1, 2
    ),
    cent AS (
      SELECT label,
             list(CAST(CASE WHEN s < 0 THEN -((2 * (-s) + n) // (2 * n))
                            ELSE (2 * s + n) // (2 * n) END AS BIGINT)
                  ORDER BY pos) AS cq
      FROM cp GROUP BY label
    ),
    d AS (
      SELECT v.vec_id, v.label, cent.label AS clabel,
             list_aggregate(list_transform(generate_series(1, 64),
               i -> (v.xq[i] - cent.cq[i]) * (v.xq[i] - cent.cq[i])),
               'sum') AS dist2
      FROM v, cent
    ),
    own AS (
      SELECT vec_id, label, dist2 AS d_own FROM d WHERE label = clabel
    ),
    other AS (
      SELECT vec_id, clabel, dist2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist2, clabel) AS rn
      FROM d WHERE label <> clabel
    )
    SELECT o.vec_id, o.label,
           t.clabel AS nearest_other_label,
           CAST(t.dist2 - o.d_own AS BIGINT) AS margin_sq
    FROM own o JOIN other t ON o.vec_id = t.vec_id AND t.rn = 1
    """,
    category="similarity",
)
def emb_label_margin(spark, sf_dir):
    """Per-vector label margin — the embedding-quality audit: squared
    distance to the vector's OWN label centroid minus distance to the
    NEAREST other label's centroid (positive margin = correctly
    clustered, negative = the vector sits closer to a foreign class).
    Centroids come from exact integer micro-sums rendered with
    half-away division (10 labels x 64 dims — bounded training state,
    collected once and re-broadcast as literals); every distance is
    pure integer arithmetic with lowest-label tie-break. Flags the
    mislabeled / boundary vectors a curation pass should re-examine."""
    from bigdata_financial_reporting_spark.functions.exact import py_half_div

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("xq"),
    )
    cp = (
        emb.select("label", F.posexplode("xq").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    cents: dict[int, list[int]] = {}
    for r in cp:
        cents.setdefault(int(r["label"]), [0] * 64)[int(r["pos"])] = py_half_div(
            int(r["s"]), int(r["n"])
        )
    zero = F.lit(0).cast("long")

    def dist2_to(cq):
        arr = F.array(*[F.lit(int(x)).cast("long") for x in cq])
        return F.aggregate(
            F.zip_with(F.col("xq"), arr, lambda a, b: (a - b) * (a - b)),
            zero,
            lambda acc, x: acc + x,
        )

    dists = F.array(
        *[
            F.struct(F.lit(int(lbl)).alias("clabel"), dist2_to(cq).alias("d"))
            for lbl, cq in sorted(cents.items())
        ]
    )
    d_own = F.element_at(
        F.filter(dists, lambda s: s["clabel"] == F.col("label")), 1
    )["d"]
    best_other = F.array_min(
        F.transform(
            F.filter(dists, lambda s: s["clabel"] != F.col("label")),
            lambda s: F.struct(s["d"].alias("d"), s["clabel"].alias("clabel")),
        )
    )
    return emb.select(
        "vec_id",
        "label",
        best_other["clabel"].alias("nearest_other_label"),
        (best_other["d"] - d_own).cast("long").alias("margin_sq"),
    )


@register(
    "sim_knn_graph_mutual",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {_DUCK_XQ} AS xq FROM embeddings WHERE vec_id < 100
    ),
    d AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             list_aggregate(list_transform(generate_series(1, 64),
               i -> (a.xq[i] - b.xq[i]) * (a.xq[i] - b.xq[i])), 'sum')
               AS dist2
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst, dist2,
             row_number() OVER (PARTITION BY src
                                ORDER BY dist2, dst) AS rn
      FROM d
    ),
    k5 AS (SELECT src, dst, dist2 FROM knn WHERE rn <= 5)
    SELECT a.src, a.dst, CAST(a.dist2 AS BIGINT) AS dist2
    FROM k5 a JOIN k5 b ON a.src = b.dst AND a.dst = b.src
    WHERE a.src < a.dst
    """,
    category="similarity",
)
def sim_knn_graph_mutual(spark, sf_dir):
    """Mutual k-NN graph on a bounded vector slice: an edge survives
    only when each endpoint ranks the other inside its own top-5 —
    the symmetric filter that turns a noisy k-NN digraph into the
    graph clustering/dedup actually uses (one-sided neighbors of hub
    vectors drop out). Distances are exact integer micro-arithmetic
    with (dist, id) tie-break; the pairwise stage broadcasts the
    100-row slice (never a shuffled cartesian), and the mutual check
    is a self-join of the k-edge list on reversed endpoints."""
    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    # emb feeds both endpoints of the distance join and k5 feeds both
    # the mutual join and its reversal — unpersisted, four raw scans
    # per action (round-14 audit). Both frames are bounded (100-node
    # subgraph); persist them: one scan.
    emb = track(
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000000).cast("long"),
            ).alias("xq"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = emb.select(
        F.col("vec_id").alias("src"), F.col("xq").alias("xa")
    )
    b = emb.select(F.col("vec_id").alias("dst"), F.col("xq").alias("xb"))
    zero = F.lit(0).cast("long")
    dist2 = F.aggregate(
        F.zip_with(F.col("xa"), F.col("xb"), lambda p, q: (p - q) * (p - q)),
        zero,
        lambda acc, x: acc + x,
    )
    d = a.join(F.broadcast(b), F.col("src") != F.col("dst")).select(
        "src", "dst", dist2.alias("dist2")
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("src").orderBy("dist2", "dst")
    )
    k5 = track(
        d.withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .select("src", "dst", "dist2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rev = k5.select(
        F.col("src").alias("r_dst"), F.col("dst").alias("r_src")
    )
    return (
        k5.join(
            rev,
            (F.col("src") == F.col("r_src")) & (F.col("dst") == F.col("r_dst")),
        )
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", F.col("dist2").cast("long").alias("dist2"))
    )


@register(
    "emb_dims_variance_topk",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS xq
      FROM embeddings, generate_series(1, 64) g(i)
    ),
    p AS (
      SELECT pos, sum(xq * xq) AS sxx, sum(xq) AS sx, count(*) AS n
      FROM x GROUP BY pos
    ),
    q AS (
      SELECT pos, n, sxx * n - sx * sx AS num,
             CAST(n AS HUGEINT) * (n - 1) * 1000000 AS den
      FROM p
    ),
    r AS (
      SELECT pos, n,
             CAST(CASE WHEN num < 0 THEN -((2 * (-num) + den) // (2 * den))
                       ELSE (2 * num + den) // (2 * den) END AS BIGINT)
               AS var_u,
             row_number() OVER (ORDER BY num DESC, pos) AS rank
      FROM q
    )
    SELECT CAST(rank AS INT) AS rank, pos, var_u, CAST(n AS BIGINT) AS n
    FROM r WHERE rank <= 10
    """,
    category="similarity",
)
def emb_dims_variance_topk(spark, sf_dir):
    """Top-10 highest-variance embedding dimensions — the feature-
    selection / whitening-diagnostics cut over the exact Gram moments
    (shared _exact_gram_moments pass, diagonal only): variance
    numerators n*Σx² - (Σx)² are exact decimal(38,0) integers, the
    ranking compares INTEGERS (no float ordering), and the rendered
    variance uses the covariance-diagonal micro-unit half-away
    rendering. The top-k window runs over 64 rows."""
    merged = _exact_gram_moments(spark, sf_dir).filter(
        F.col("i") == F.col("j")
    )
    # on the diagonal the cross-moment sxy IS the squared-sum Σx²
    num = F.col("sxy") * F.col("n") - F.col("sx") * F.col("sx")
    den = (
        F.col("n").cast("decimal(38,0)")
        * (F.col("n") - F.lit(1))
        * F.lit(1000000)
    )
    from pyspark.sql import Window as W

    q = merged.select(
        F.col("i").alias("pos"),
        "n",
        num.alias("num"),
        den.alias("den"),
    )
    rn = F.row_number().over(W.orderBy(F.col("num").desc(), F.col("pos")))
    from bigdata_financial_reporting_spark.functions.exact import (
        spark_half_div,
    )

    return (
        q.withColumn("rank", rn)
        .filter(F.col("rank") <= 10)
        .select(
            F.col("rank").cast("int").alias("rank"),
            "pos",
            F.expr(spark_half_div("num", "den")).cast("long").alias("var_u"),
            F.col("n").cast("long").alias("n"),
        )
    )


@register(
    "emb_matryoshka_prefix_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, {_DUCK_XQ} AS xq FROM embeddings),
    q AS (SELECT vec_id AS query_id, xq AS qv FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             list_aggregate(list_transform(generate_series(1, 64),
               i -> q.qv[i] * v.xq[i]), 'sum') AS dot_full,
             list_aggregate(list_transform(generate_series(1, 16),
               i -> q.qv[i] * v.xq[i]), 'sum') AS dot_prefix
      FROM v CROSS JOIN q
      WHERE v.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot_full DESC, neighbor_id) AS rf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot_prefix DESC, neighbor_id) AS rp
      FROM scored
    )
    SELECT query_id,
           count(CASE WHEN rf <= 10 AND rp <= 10 THEN 1 END)
             AS n_overlap_at_10,
           max(CASE WHEN rp = 1 THEN neighbor_id END) AS prefix_top1
    FROM ranked
    GROUP BY query_id
    """,
    category="similarity",
)
def emb_matryoshka_prefix_topk(spark, sf_dir):
    """Matryoshka-truncation audit: for each query vector, how much of
    the FULL-dimension (64-d) dot-product top-10 survives when search
    runs on the 16-d PREFIX — the question a matryoshka-trained
    embedding pipeline answers before shipping truncated vectors to a
    4x-cheaper index.  One corpus scan computes both dot products
    (the prefix is a slice of the same zip_with product — no second
    pass), two per-query top-10 windows rank them (WindowGroupLimit
    prunes map-side), and the overlap reduces to one conditional
    count per query.  All arithmetic is exact integer micro-units
    (per-term |x| <= ~1e12, 64 terms — far inside int64), ties break
    on neighbor id — bit-reproducible at any scale.  The 5 queries
    broadcast; the corpus never shuffles until the ranked candidates
    (<= corpus rows, ~20 survive per query)."""
    from pyspark.sql import Window

    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    # The two rank passes are deliberately separate (each compiles to
    # a map-side WindowGroupLimit; one fused pass with an OR-filter
    # loses the pruning — see below), but both re-ran the scan +
    # micro-quantize transform. Persist the quantized frame once; the
    # query side reads the same cache (round-14 scan audit: 4 -> 1).
    emb = track(
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000000).cast("long"),
            ).alias("xq"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("xq").alias("qv")
    ).filter(F.col("query_id") < 5)
    zero = F.lit(0).cast("long")
    prods = F.zip_with("qv", "xq", lambda a, b: a * b)
    scored = (
        emb.join(F.broadcast(q), emb.vec_id != q.query_id)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(prods, zero, lambda acc, x: acc + x).alias(
                "dot_full"
            ),
            F.aggregate(
                F.slice(prods, 1, 16), zero, lambda acc, x: acc + x
            ).alias("dot_prefix"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("dot_full").desc(), "neighbor_id"
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("dot_prefix").desc(), "neighbor_id"
    )
    # rank<=k as a FILTER (not an aggregate CASE) so each window
    # compiles to WindowGroupLimit: every map partition keeps only its
    # local top-10 per query before the shuffle — the corpus-sized
    # sort never happens.  Two pruned scans beat one unpruned sort.
    top_f = (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(wf).alias("rf")
        ).filter(F.col("rf") <= 10)
    )
    top_p = (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(wp).alias("rp")
        ).filter(F.col("rp") <= 10)
    )
    j = top_f.join(top_p, ["query_id", "neighbor_id"], "full_outer")
    return j.groupBy("query_id").agg(
        F.count(
            F.when(F.col("rf").isNotNull() & F.col("rp").isNotNull(), 1)
        ).alias("n_overlap_at_10"),
        F.max(F.when(F.col("rp") == 1, F.col("neighbor_id"))).alias(
            "prefix_top1"
        ),
    )


@register(
    "emb_signbit_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT vec_id, label,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, 62),
                   i -> CAST(CASE WHEN embedding[i] >= 0
                                  THEN 1 ELSE 0 END AS BIGINT))),
               (acc, x) -> acc * 2 + x) AS sign_fp
      FROM embeddings
    )
    SELECT sign_fp,
           count(*) AS n_vectors,
           min(vec_id) AS first_vec,
           CAST(count(DISTINCT label) AS BIGINT) AS n_labels
    FROM fp GROUP BY sign_fp
    """,
    category="similarity",
)
def emb_signbit_fingerprint(spark, sf_dir):
    """Sign-bit fingerprint census over the embedding corpus: the
    62-bit pattern of coordinate signs (dims 1..62 — 62 so the BIGINT
    never touches the sign bit, same budget as the simhash
    fingerprint) is the cheapest possible semantic bucket — exact
    duplicates and strong near-duplicates share it, so the census
    (vectors per fingerprint, label spread) is the precursor an
    embedding-dedup pass uses to size its blocking BEFORE any pairwise
    work. The comparison v_i >= 0 is an exact float predicate and the
    fold is integer doubling in fixed dimension order on both engines
    (F.aggregate ↔ list_reduce) — no float arithmetic anywhere, so
    the fingerprint is bit-stable at any scale and partitioning. One
    codegen projection + one hash aggregation; the shuffle carries
    (64-bit fp, counts) only."""
    e = load_table(spark, sf_dir, "embeddings")
    sign_fp = F.aggregate(
        F.transform(
            F.slice("embedding", 1, 62),
            lambda x: F.when(x >= 0, 1).otherwise(0),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 2 + x,
    )
    return (
        e.select("vec_id", "label", sign_fp.alias("sign_fp"))
        .groupBy("sign_fp")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("first_vec"),
            F.countDistinct("label").cast("long").alias("n_labels"),
        )
    )


@register(
    "sim_hnsw_upper_graph",
    oracle="""
    WITH m AS (
      SELECT vec_id,
             ((vec_id % 1000000007) * 2654435761) % 4294967296 AS h,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
               AS qv
      FROM embeddings
    ),
    mn AS (
      SELECT vec_id, h, qv,
             list_aggregate(list_transform(qv, x -> x * x), 'sum') AS nq
      FROM m
    ),
    mem AS (
      SELECT l.layer, vec_id, qv, nq
      FROM (SELECT unnest([4, 5, 6]) AS layer) l
      JOIN mn ON mn.h % CAST(pow(2, l.layer) AS BIGINT) = 0
      WHERE mn.nq > 0
    ),
    pairs AS (
      SELECT a.layer, a.vec_id, b.vec_id AS neighbor_id,
             CAST(list_aggregate(
               list_transform(generate_series(1, len(a.qv)),
                              i -> a.qv[i] * b.qv[i]), 'sum') AS DOUBLE)
               / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
      FROM mem a JOIN mem b
        ON a.layer = b.layer AND a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT layer, vec_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY layer, vec_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT layer, vec_id, CAST(rank AS INT) AS rank, neighbor_id,
           round(cos, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """,
    category="similarity",
)
def sim_hnsw_upper_graph(spark, sf_dir):
    """HNSW upper-layer (routing) graph construction — the ANN
    graph-construction key the round-8 verdict sketched: geometric
    skip-list levels from the fixed odd-multiplier hash (id reduced
    mod 1000000007 first so the product never exceeds int64 on any
    id range; member of layer l iff hash % 2^l == 0, so populations
    halve per level), and
    for layers 4..6 each member links to its 3 nearest fellow members
    by EXACT micro-quantized integer cosine (dot and norms are exact
    integers < 2^53; the per-pair cosine is one identical IEEE
    sequence on both engines, so ranks and renders are bit-stable —
    the emb_covariance/_lsh_band_buckets_arrow argument). Per layer
    the member matrix broadcasts (cap-guarded) and the same members
    stream through one exact-integer BLAS scoring pass keeping top-3
    map-side — no pair shuffle, no cartesian; the oracle is the
    all-pairs-within-layer window form. At 100 TB min_layer rises
    until the routing layer fits the broadcast cap — exactly how HNSW
    keeps its hierarchy navigable."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        hnsw_upper_layer_graph,
    )

    e = load_table(spark, sf_dir, "embeddings")
    g = hnsw_upper_layer_graph(
        e, "vec_id", "embedding", min_layer=4, max_layer=6, k=3
    )
    return g.select(
        "layer",
        "vec_id",
        "rank",
        "neighbor_id",
        F.round("cosine", 6).alias("cosine"),
    )


def _hnsw_descent_oracle(
    min_layer: int = 4, max_layer: int = 6, steps: int = 3
) -> str:
    """Unrolled DuckDB mirror of hnsw_greedy_descent: one CTE per
    (layer, step), exactly the bounded-move grid the Spark walk runs.
    The cosine is the same exact-integer dot / sqrt(nq_a * nq_b)
    IEEE sequence as the hnsw_upper_graph oracle, so the
    strictly-greater move test is bit-identical across engines."""
    qcos = (
        "CAST(list_aggregate(list_transform(generate_series(1, "
        "len(q.qqv)), i -> q.qqv[i] * nb.qv[i]), 'sum') AS DOUBLE)"
        " / sqrt(CAST(q.qnq AS DOUBLE) * CAST(nb.nq AS DOUBLE))"
    )
    ctes = [
        f"""
    m AS (
      SELECT vec_id,
             ((vec_id % 1000000007) * 2654435761) % 4294967296 AS h,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
               AS qv
      FROM embeddings
    ),
    mm AS MATERIALIZED (
      SELECT vec_id, h, qv,
             list_aggregate(list_transform(qv, x -> x * x), 'sum') AS nq
      FROM m
      WHERE list_aggregate(list_transform(qv, x -> x * x), 'sum') > 0
    ),
    mem AS (
      SELECT l.layer, vec_id, qv, nq
      FROM (SELECT unnest([{", ".join(str(x) for x in range(min_layer, max_layer + 1))}]) AS layer) l
      JOIN mm ON mm.h % CAST(pow(2, l.layer) AS BIGINT) = 0
    ),
    pairs AS (
      SELECT a.layer, a.vec_id AS src, b.vec_id AS neighbor_id,
             CAST(list_aggregate(
               list_transform(generate_series(1, len(a.qv)),
                              i -> a.qv[i] * b.qv[i]), 'sum') AS DOUBLE)
               / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
      FROM mem a JOIN mem b
        ON a.layer = b.layer AND a.vec_id <> b.vec_id
    ),
    edges AS MATERIALIZED (
      -- MATERIALIZED (and on mm/q): each unrolled step CTE references
      -- edges again, and an inlined CTE would re-run the quadratic
      -- within-layer pair scoring once PER STEP — measured >10 min at
      -- the 10x corpus vs ~1 min materialized
      SELECT layer, src, neighbor_id FROM (
        SELECT layer, src, neighbor_id,
               row_number() OVER (PARTITION BY layer, src
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM pairs) WHERE rn <= 3
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS query_id, qv AS qqv, nq AS qnq
      FROM mm WHERE vec_id < 50
    ),
    s0 AS MATERIALIZED (
      SELECT q.query_id, nb.vec_id AS node, {qcos} AS cos
      FROM q
      CROSS JOIN (SELECT min(vec_id) AS e FROM mm
                  WHERE h % {2 ** max_layer} = 0) ent
      JOIN mm nb ON nb.vec_id = ent.e
    )"""
    ]
    i = 0
    for layer in range(max_layer, min_layer - 1, -1):
        for _ in range(steps):
            prev, i = f"s{i}", i + 1
            # MATERIALIZED: each step references its predecessor twice
            # (walk row + candidate subquery) — inlined, the chain
            # doubles per step (2^steps re-evaluations of everything
            # upstream, the same exponential the Spark plan hit)
            ctes.append(
                f"""
    s{i} AS MATERIALIZED (
      SELECT s.query_id,
             CASE WHEN b.c > s.cos THEN b.n ELSE s.node END AS node,
             CASE WHEN b.c > s.cos THEN b.c ELSE s.cos END AS cos
      FROM {prev} s LEFT JOIN (
        SELECT query_id, n, c FROM (
          SELECT s.query_id, e.neighbor_id AS n, {qcos} AS c
          FROM {prev} s
          JOIN q ON q.query_id = s.query_id
          JOIN edges e ON e.layer = {layer} AND e.src = s.node
          JOIN mm nb ON nb.vec_id = e.neighbor_id
        ) QUALIFY row_number() OVER (PARTITION BY query_id
                                     ORDER BY c DESC, n) = 1
      ) b ON b.query_id = s.query_id
    )"""
            )
    snaps = []
    for j, layer in enumerate(range(max_layer, min_layer - 1, -1)):
        snaps.append(
            f"""
    SELECT query_id, CAST({layer} AS INT) AS layer, node AS node_id,
           round(cos, 6) AS cosine
    FROM s{(j + 1) * steps}"""
        )
    return "WITH" + ",".join(ctes) + "\n    UNION ALL".join(snaps)


@register(
    "sim_hnsw_greedy_descent",
    oracle=_hnsw_descent_oracle(),
    category="similarity",
)
def sim_hnsw_greedy_descent(spark, sf_dir):
    """HNSW multi-layer greedy SEARCH over the routing hierarchy
    sim_hnsw_upper_graph constructs (round-13 verdict item 7's queued
    extension): 50 queries enter at the top layer's lowest-id member
    and take up to 3 strictly-improving greedy moves per layer down
    layers 6..4, emitting the per-layer local optimum — the routing
    trajectory an ANN serving tier caches. Deterministic end-to-end
    (skip-list hash levels, exact micro-quantized integer cosine,
    neighbor-id tie-breaks, strict-improvement move test), so the
    whole bounded walk has an exact unrolled-CTE SQL oracle."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        hnsw_greedy_descent,
    )

    e = load_table(spark, sf_dir, "embeddings")
    d = hnsw_greedy_descent(
        e,
        e.filter(F.col("vec_id") < 50),
        "vec_id",
        "embedding",
        min_layer=4,
        max_layer=6,
        k=3,
        steps=3,
    )
    return d.select(
        "query_id",
        "layer",
        "node_id",
        F.round("cosine", 6).alias("cosine"),
    )
