"""Round-13 guard closures (round-12 advice + verdict item 5):

- ivfpq_topk's wide index build must NOT let Catalyst prune the
  vector-length guards: a mixed-length corpus (probed dim 8, row dim
  16 — both divisible by n_subspaces) previously encoded the wrong
  slice silently because codes_wide never referenced sub_dim. The
  guard now lives inside the d2 expression itself, which every
  consumer references.
- ivfpq_topk's flat ADC map key s*n_codes + code is injective only
  for codes in [0, n_codes); a caller-supplied codebook outside that
  range must raise loudly, not collide across subspaces.
- hadamard_rotate's int64-matmul overflow headroom (|r| <= dim *
  max|q| < 2^63) is now an enforced per-batch guard, matching
  DuckDB's raising BIGINT fold — previously a docstring comment while
  numpy wrapped silently.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row


def _tiny_corpus(spark, dims):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i + 1)] * d) for i, d in enumerate(dims)],
        "vec_id long, embedding array<float>",
    )


def test_ivfpq_topk_rejects_mixed_divisible_lengths(spark):
    """Round-12 advice (medium): dim 8 probed, dim 16 row, n=4 — both
    divisible, so only the uniform-length guard stands between the
    unrolled d2 and a silent wrong-slice encode. The wide index build
    aggregates only code/d2; the guard must survive that pruning."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        ivfpq_topk,
    )

    corpus = _tiny_corpus(spark, [8, 8, 16])
    queries = _tiny_corpus(spark, [8])
    with pytest.raises(Exception, match="uniform"):
        ivfpq_topk(
            queries,
            corpus,
            "vec_id",
            "vec_id",
            "embedding",
            n_centroids=2,
            n_probe=2,
            n_subspaces=4,
            n_codes=2,
            k=3,
        ).collect()


def test_ivfpq_topk_rejects_out_of_range_codebook_codes(spark):
    """Round-12 advice (low): a custom codebook whose codes are not in
    [0, n_codes) makes the flat ADC key collide across subspaces —
    map_from_entries duplicate-key failure at best, a silently wrong
    lookup at worst. The key expression itself raises instead."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        ivfpq_topk,
    )

    corpus = _tiny_corpus(spark, [8] * 6)
    queries = _tiny_corpus(spark, [8])
    # codes {0, 2} with n_codes=2: code 2 is out of range and its key
    # 0*2+2 collides with subspace 1's code-0 key.
    cb = spark.createDataFrame(
        [
            Row(s=s, code=c, cv=[float(c + 1)] * 8)
            for s in range(4)
            for c in (0, 2)
        ],
        "s int, code int, cv array<double>",
    )
    with pytest.raises(Exception, match="codebook codes must be in"):
        ivfpq_topk(
            queries,
            corpus,
            "vec_id",
            "vec_id",
            "embedding",
            n_centroids=2,
            n_probe=2,
            n_subspaces=4,
            n_codes=2,
            k=3,
            codebook=cb,
        ).collect()


def test_hadamard_rotate_overflow_raises_both_engines(spark):
    """Verdict item 5 (round 12): |x|*scale ~ 2^57 means dim * max|q|
    reaches 2^63 — numpy int64 wraps silently where DuckDB's BIGINT
    fold raises; the Spark side must raise too, and with the same
    class of loud message, so an out-of-domain embedding can never
    surface as a bare oracle hash mismatch."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        hadamard_rotate,
    )

    big = float(2**57) / 1_000_000.0  # |q| = 2^57 = 2^63 / dim(64)
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[big] + [0.0] * 63)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="overflow"):
        hadamard_rotate(df, "vec_id", "embedding", dim=64).collect()

    # The oracle engine refuses the same input: the scaled BIGINT fold
    # overflows and DuckDB raises (out-of-range), never wraps.
    con = duckdb.connect()
    with pytest.raises(Exception, match="(?i)out of range|overflow"):
        con.execute(
            """
            WITH v(x) AS (
              SELECT list_transform(generate_series(0, 63), j ->
                CASE WHEN j = 0 THEN {}::DOUBLE ELSE 0.0 END)
            )
            SELECT list_aggregate(
              list_transform(generate_series(0, 63), j ->
                CAST(round(x[j + 1] * 1000000) AS BIGINT) * 64::BIGINT),
              'sum')
            FROM v
            """.format(big)
        ).fetchall()


def test_hadamard_rotate_in_domain_magnitude_still_passes(spark):
    """The guard must not reject the documented domain (|q| ~ 2^20):
    a max-magnitude-but-legal batch rotates exactly."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        hadamard_rotate,
    )

    x = 1000.0  # |q| = 1e9 ~ 2^30, far inside 2^63/64
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[x] * 64)],
        "vec_id long, embedding array<double>",
    )
    out = hadamard_rotate(df, "vec_id", "embedding", dim=64).collect()
    assert len(out) == 1
    # H's row 0 is all +1: component 0 = 64 * x / sqrt(64) = 8x.
    assert out[0]["embedding"][0] == pytest.approx(8 * x)


def test_probe_sweep_slices_equal_ivf_topk(spark, sf_dir):
    """Each n_probe slice of the one-pass sweep must select EXACTLY the
    neighbor set ivf_topk(n_probe=p) returns — the sweep is a witness
    over the real operator, not a parallel implementation allowed to
    drift. Also pins monotonicity: recall and candidates are
    non-decreasing in n_probe (probing more cells can only add
    candidates)."""
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.similarity import (
        ivf_probe_sweep,
        ivf_topk,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    sweep = {
        r["n_probe"]: r
        for r in ivf_probe_sweep(
            q, e, "vec_id", "vec_id", n_centroids=16,
            probe_counts=(1, 2, 4, 8), k=10,
        ).collect()
    }
    assert sorted(sweep) == [1, 2, 4, 8]
    recalls = [sweep[p]["recall_at_k"] for p in (1, 2, 4, 8)]
    cands = [sweep[p]["candidates_scored"] for p in (1, 2, 4, 8)]
    assert recalls == sorted(recalls), "recall must be monotone in n_probe"
    assert cands == sorted(cands), "candidate count must be monotone"
    assert 0.0 <= recalls[0] <= recalls[-1] <= 1.0

    # spot-check the p=2 slice against the operator itself: the hit
    # count the sweep reports must equal a direct recall computation
    from bigdata_financial_reporting_spark.operators.similarity import (
        cosine_topk,
    )

    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            q, e, "vec_id", "vec_id", n_centroids=16, n_probe=2, k=10
        ).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(q, e, "vec_id", "vec_id", k=10).collect()
    }
    assert sweep[2]["n_hits"] == len(approx & exact)


def test_residual_encode_is_pq_over_exact_residuals(spark, sf_dir):
    """The residual key must be EXACTLY pq_encode applied to the
    per-component residual x - centroid(cell) — no drift between the
    composed operator and its parts (same codebook convention: the 16
    lowest-id RESIDUAL vectors). Also pins cell validity (every cell
    is one of the 16 lowest vec_ids — the degenerate coarse
    quantizer) and rerun determinism. NOTE: on this near-orthogonal
    synthetic fixture the residual MSE is NOT asserted to beat the
    raw MSE — the degenerate cosine quantizer's centroids are not
    L2-tight, so subtracting one can grow the norm; the win shows up
    under trained, L2-tight cells (the mse column exists so a reader
    can see exactly that on any corpus)."""
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.similarity import (
        ivf_residual_encode,
        pq_encode,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    res = ivf_residual_encode(e, "vec_id", "embedding")
    rows1 = sorted(map(tuple, res.collect()))
    rows2 = sorted(map(tuple, ivf_residual_encode(e, "vec_id", "embedding").collect()))
    assert rows1 == rows2, "residual encode must be rerun-deterministic"
    assert len(rows1) == e.count()

    low16 = {
        r["vec_id"]
        for r in e.select("vec_id").orderBy("vec_id").limit(16).collect()
    }
    assert {r[1] for r in rows1} <= low16

    # decompose: recompute the residual frame by hand and pq_encode it;
    # (pq_code, mse) must be identical per id
    cents = e.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    ).orderBy("cid").limit(16)
    by_cell = {r["cid"]: r["cv"] for r in cents.collect()}
    import pandas as pd
    from pyspark.sql import Row

    cell_of = {r[0]: r[1] for r in rows1}
    manual = spark.createDataFrame(
        [
            Row(
                vec_id=r["vec_id"],
                res=[
                    float(a) - float(b)
                    for a, b in zip(r["embedding"], by_cell[cell_of[r["vec_id"]]])
                ],
            )
            for r in e.collect()
        ],
        "vec_id long, res array<double>",
    )
    enc = {
        r["id"]: (r["pq_code"], r["mse"])
        for r in pq_encode(manual, "vec_id", "res").collect()
    }
    for rid, cell, code, mse in rows1:
        assert enc[rid] == (code, mse), f"drift at id {rid}"
