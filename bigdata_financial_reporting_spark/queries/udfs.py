"""UDF / UDAF / UDTF surface (SURVEY.md §2B.8).

Each flavor computes something SQL-expressible so a DuckDB oracle can
verify the plumbing bit-for-bit. Performance posture: pandas
(Arrow-vectorized) variants are the production path; the row-at-a-time
Python UDF exists for API completeness and its docstring says so.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "udf_scalar_python",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'H' ELSE 'L' END || '-' || o_orderstatus
             AS coded
    FROM orders
    """,
    category="udfs",
)
def udf_scalar_python(spark, sf_dir):
    """Row-at-a-time Python UDF — the SLOW path (one Python call per
    row, pickled both ways). Kept for API parity; use pandas_udf in
    anything hot."""

    @udf("string")
    def code(price: float, status: str) -> str:
        return ("H" if price > 100000 else "L") + "-" + status

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", code(F.col("o_totalprice"), F.col("o_orderstatus")).alias("coded")
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, round(ln(1 + value), 6) AS log1p_value
    FROM events
    """,
    category="udfs",
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized scalar pandas UDF: whole Arrow batches, ~10-100x the
    row-at-a-time throughput."""

    @pandas_udf("double")
    def log1p(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(v)

    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", F.round(log1p(F.col("value")), 6).alias("log1p_value"))


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    WITH s AS (
      -- epoch_us // 1e6: integer FLOOR seconds, matching Spark's
      -- unix_timestamp truncation (CAST(epoch(ts) AS BIGINT) would
      -- ROUND the sub-second fraction and skew the weights)
      SELECT user_id,
             sum(CAST(round(value * 1000000.0) AS BIGINT)
                 * (epoch_us(ts) // 1000000)) AS num,
             sum(epoch_us(ts) // 1000000) AS den
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(CASE WHEN num < 0
                     THEN -((2 * (-num) + den) // (2 * den))
                     ELSE (2 * num + den) // (2 * den)
                END AS DOUBLE) / 1000000.0 AS weighted_avg
    FROM s
    """,
    category="udfs",
)
def udf_pandas_grouped_agg(spark, sf_dir):
    """Grouped-aggregate pandas UDF (UDAF): per-group arrays in, scalar
    out. Shuffles once on the group key like any hash agg.

    The weighted sum runs in EXACT integers: value quantizes to
    micro-units JVM-side (half-away round, matching DuckDB), and the
    UDF accumulates Python ints (arbitrary precision — v_micro*epoch
    ~1.7e17 per row would wrap an int64 partial at ~50 rows/group).
    A raw pandas float sum's order diverged from DuckDB in 10/15000
    cells at the 10x corpus (round-6 at-scale red), and a float
    round() of the quotient diverges on exact 6dp halves — so the 6dp
    result renders via pure-integer half-away division
    (functions/exact.py) with one final int->double conversion,
    mirrored verbatim in the oracle."""
    from bigdata_financial_reporting_spark.functions.exact import py_half_div

    @pandas_udf("double")
    def weighted_avg(v_micro: pd.Series, w: pd.Series) -> float:
        num = sum(int(a) * int(b) for a, b in zip(v_micro.tolist(), w.tolist()))
        den = sum(int(b) for b in w.tolist())
        return float(py_half_div(num, den)) / 1000000.0

    e = load_table(spark, sf_dir, "events").withColumn(
        "v_micro", F.round(F.col("value") * 1000000.0).cast("long")
    ).withColumn("w", F.unix_timestamp("ts"))
    return e.groupBy("user_id").agg(
        weighted_avg(F.col("v_micro"), F.col("w")).alias("weighted_avg")
    )


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT user_id, event_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS zscore
    FROM events
    """,
    category="udfs",
)
def udf_apply_in_pandas(spark, sf_dir):
    """Grouped-map (table-in/table-out per group): z-score within each
    user. The whole group materializes in one pandas frame — fine for
    bounded per-key cardinality, NOT for skewed giants (use window
    functions then)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "zscore": z.round(6)}
        )

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        zscore, schema="user_id long, event_id long, zscore double"
    )


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id, event_type, round(value * 2 + 1, 6) AS scaled
    FROM events WHERE event_type IN ('click', 'view')
    """,
    category="udfs",
)
def udf_map_in_pandas(spark, sf_dir):
    """Partition-wise table function (mapInPandas): streaming Arrow
    batches in/out, arbitrary row fan-in/out, no shuffle."""

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf["event_type"].isin(["click", "view"])]
            yield pd.DataFrame(
                {
                    "event_id": keep["event_id"],
                    "event_type": keep["event_type"],
                    "scaled": (keep["value"] * 2 + 1).round(6),
                }
            )

    e = load_table(spark, sf_dir, "events")
    return e.mapInPandas(transform, schema="event_id long, event_type string, scaled double")


@register(
    "udf_sql_registered",
    oracle="""
    SELECT p_partkey, upper(p_brand) || ':' || CAST(p_size * 2 AS VARCHAR) AS tagged
    FROM part
    """,
    category="udfs",
)
def udf_sql_registered(spark, sf_dir):
    """spark.udf.register: the Python function becomes callable from
    SQL text (the spark.sql surface)."""
    from bigdata_financial_reporting_spark.sources.catalog import register_views

    def tag(brand: str, size: int) -> str:
        return f"{brand.upper()}:{size * 2}"

    spark.udf.register("tag_part", tag, "string")
    register_views(spark, sf_dir, ["part"])
    return spark.sql(
        "SELECT p_partkey, tag_part(p_brand, p_size) AS tagged FROM part"
    )


@register(
    "udf_python_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(lang || '/' || source, '/')) AS piece
    FROM documents
    WHERE doc_id < 100
    """,
    category="udfs",
)
def udf_python_udtf(spark, sf_dir):
    """True Python UDTF (table function): one input row -> N output
    rows, registered and invoked via LATERAL in SQL. Arrow-batched by
    Spark 4; the table-in/table-out alternative for grouped data is
    applyInPandas (udf_apply_in_pandas)."""
    from pyspark.sql.functions import udtf

    from bigdata_financial_reporting_spark.sources.catalog import register_views

    @udtf(returnType="doc_id bigint, piece string")
    class SplitTag:
        def eval(self, doc_id: int, tag: str):
            for piece in (tag or "").split("/"):
                yield (doc_id, piece)

    spark.udtf.register("split_tag", SplitTag)
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT s.doc_id, s.piece
        FROM documents d,
             LATERAL split_tag(d.doc_id, d.lang || '/' || d.source) s
        WHERE d.doc_id < 100
        """
    )


@register(
    "udf_arrow_optimized_scalar",
    oracle="""
    SELECT doc_id,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END
             AS n_words,
           upper(substr(coalesce(text, ''), 1, 1)) AS first_upper
    FROM documents
    """,
    category="udfs",
)
def udf_arrow_optimized_scalar(spark, sf_dir):
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): same
    row-wise author experience as a classic Python UDF, but the
    executor transfers columns as Arrow batches instead of pickled
    rows — the ~2-10x serialization win without rewriting to a
    pandas_udf. Still the slow path vs codegen (the oracle IS the
    codegen formula); registered to pin the surface and its exact
    semantics."""
    d = load_table(spark, sf_dir, "documents")

    # NULL/empty guards mirror the oracle's CASE: ''.split() is [] in
    # Python but string_split_regex('') is [''] in SQL — the naive
    # forms disagree on empty/whitespace-only text and crash on NULL
    @F.udf("int", useArrow=True)
    def n_words(s: str) -> int:
        return len(s.split()) if s else 0

    @F.udf("string", useArrow=True)
    def first_upper(s: str) -> str:
        return s[:1].upper() if s else ""

    return d.select(
        "doc_id",
        n_words("text").alias("n_words"),
        first_upper("text").alias("first_upper"),
    )


@register(
    "udf_sql_function",
    oracle="""
    SELECT doc_id,
           round(CAST(n_chars AS DOUBLE)
                 / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
             AS density
    FROM documents
    """,
    category="udfs",
)
def udf_sql_function(spark, sf_dir):
    """SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr): a reusable
    scalar function defined IN SQL — unlike Python UDFs it inlines
    into the plan as a plain expression (whole-stage codegen, no
    serialization boundary), so it is the right tool for shared
    business formulas at 100 TB. The oracle repeats the expression
    body verbatim."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("bdfr_docs_sqludf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION bdfr_density(chars INT, t STRING)
        RETURNS DOUBLE
        RETURN CAST(chars AS DOUBLE)
               / greatest(size(split(trim(t), '\\\\s+')), 1)
        """
    )
    return spark.sql(
        """
        SELECT doc_id, round(bdfr_density(n_chars, text), 6) AS density
        FROM bdfr_docs_sqludf
        """
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
    category="udfs",
)
def udf_map_in_arrow(spark, sf_dir):
    """``mapInArrow``: the zero-copy sibling of mapInPandas — the UDF
    receives raw ``pyarrow.RecordBatch``es (no pandas conversion at
    all), the right surface when the payload is already columnar
    (embeddings) and the work is numpy-vectorizable. Computes the L2
    norm per embedding with one float64 accumulation, matching the
    oracle's double-accumulated fold. Map-only, no shuffle; Arrow
    batches stream through with constant memory."""
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            if batch.num_rows == 0:
                # mapInArrow delivers empty batches on sparse
                # partitions; np.asarray([]) is 1-D and the shape[1]
                # below would raise (ADVICE round 4)
                continue
            vecs = batch.column("embedding").to_pylist()
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            arr = np.asarray(vecs, dtype=np.float64)
            if arr.ndim != 2:
                raise ValueError(
                    "udf_map_in_arrow expects fixed-length embeddings; "
                    "got ragged lengths in one Arrow batch"
                )
            l2 = np.sqrt((arr * arr).sum(axis=1))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(np.round(l2, 6), pa.float64()),
                    pa.array([arr.shape[1]] * len(ids), pa.int64()),
                ],
                names=["vec_id", "l2_norm", "dim"],
            )

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "embedding").mapInArrow(
        norms, schema="vec_id long, l2_norm double, dim long"
    )


@register(
    "udf_udtf_arrow",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+'))
               AS word
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, word, CAST(length(word) AS INT) AS wlen
    FROM tok WHERE word <> '' AND length(word) >= 8
    """,
    category="udfs",
)
def udf_udtf_arrow(spark, sf_dir):
    """Arrow-optimized Python UDTF (Spark 4 ``useArrow=True``): the
    same table-function surface as udf_python_udtf, but rows cross the
    JVM<->Python boundary as Arrow batches instead of pickled rows —
    the throughput mode a production UDTF should run in. The function
    emits each long word of a document; output equals the pure-SQL
    explode, proving the Arrow serialization path changes nothing but
    the transport."""
    import re

    from pyspark.sql.functions import udtf

    from bigdata_financial_reporting_spark.sources.catalog import register_views

    @udtf(returnType="doc_id bigint, word string, wlen int", useArrow=True)
    class LongWords:
        def eval(self, doc_id: int, text: str):
            for w in re.split(r"[^a-z]+", (text or "").lower()):
                if len(w) >= 8:
                    yield (doc_id, w, len(w))

    spark.udtf.register("long_words_arrow", LongWords)
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT s.doc_id, s.word, s.wlen
        FROM documents d, LATERAL long_words_arrow(d.doc_id, d.text) s
        WHERE d.doc_id < 50
        """
    )
