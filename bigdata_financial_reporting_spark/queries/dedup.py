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


# Bounded exact-Jaccard pair construction (round-7 verdict item 4).
# Two LOSSLESS reductions replace the all-pairs
# `sh a JOIN sh b ON a.doc_id < b.doc_id` form whose O(n^2)
# list_intersect evaluations timed out in the sf0.1/10x sweeps:
# 1. candidates come from a self-join on SHARED shingles (the engine's
#    own relational formulation) — zero-overlap pairs have Jaccard 0
#    and can never pass a positive threshold;
# 2. docs are first grouped by their exact shingle SET (Jaccard is a
#    pure function of the two sets): the pair space is computed once
#    between group REPRESENTATIVES and expanded back to member pairs,
#    with within-group pairs exactly 1.0 = n/CAST(n AS DOUBLE). The
#    10x corpus replicates every doc 10x, so this collapses the
#    candidate space 100x (113M -> 1.13M rep pairs, 40 s -> 2.3 s).
# The rendered value is bit-identical to the old form: count(*) over
# shared distinct shingles == len(list_intersect), same CAST, same
# division.
_DUCK_PAIR_BASE = (
    _DUCK_SHINGLES
    + """
    , grp AS (
      SELECT list_sort(s) AS ss, min(doc_id) AS rep
      FROM sh GROUP BY list_sort(s)
    ),
    memb AS (
      SELECT sh.doc_id, g.rep FROM sh JOIN grp g ON list_sort(sh.s) = g.ss
    ),
    rshr AS (SELECT rep, len(ss) AS sz, unnest(ss) AS t FROM grp),
    rjac AS (
      SELECT a.rep AS rep_a, b.rep AS rep_b,
             count(*) / CAST(any_value(a.sz) + any_value(b.sz) - count(*) AS DOUBLE) AS j
      FROM rshr a JOIN rshr b ON a.t = b.t AND a.rep < b.rep
      GROUP BY a.rep, b.rep
    ),
    jac AS (
      SELECT least(ma.doc_id, mb.doc_id) AS id_a,
             greatest(ma.doc_id, mb.doc_id) AS id_b, j
      FROM rjac
      JOIN memb ma ON ma.rep = rep_a
      JOIN memb mb ON mb.rep = rep_b
      UNION ALL
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1.0 AS j
      FROM memb a JOIN memb b ON a.rep = b.rep AND a.doc_id < b.doc_id
    )
"""
)


@register(
    "dedup_minhash_pairs",
    oracle=_DUCK_PAIR_BASE
    + """
    SELECT id_a, id_b, round(j, 6) AS jaccard
    FROM jac WHERE j >= 0.35
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
    oracle=_DUCK_PAIR_BASE
    + """
    SELECT id_a, id_b, round(j, 6) AS jaccard
    FROM jac
    JOIN documents da ON da.doc_id = id_a
    JOIN documents db ON db.doc_id = id_b
    WHERE da.lang = db.lang AND j >= 0.2
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


@register(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(regexp_replace(lower(text),
                    '[^a-z0-9 \\t\\n]', ' ', 'g'), '\\s+'), t -> t <> '')) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(t)),
                 i -> CAST(unicode(substr(t, i, 1)) AS BIGINT))),
               (acc, c) -> (acc * 131 + c) % 2147483647)
             * CAST(2147483648 AS BIGINT)
             + list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(t)),
                 i -> CAST(unicode(substr(t, i, 1)) AS BIGINT))),
               (acc, c) -> (acc * 137 + c) % 2147483647) AS th
      FROM toks
    ),
    bits AS (
      SELECT doc_id, j,
             sum((th >> j) & 1) AS sc, count(*) AS n
      FROM h, generate_series(0, 61) g(j)
      GROUP BY doc_id, j
    ),
    fp0 AS (
      SELECT doc_id,
             sum(CASE WHEN sc * 2 >= n THEN (CAST(1 AS BIGINT) << j)
                      ELSE CAST(0 AS BIGINT) END) AS fp
      FROM bits GROUP BY doc_id
    ),
    fp AS (
      SELECT d.doc_id, coalesce(fp0.fp, 4611686018427387903) AS fp
      FROM documents d LEFT JOIN fp0 USING (doc_id)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """,
    category="dedup",
)
def dedup_simhash_q(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 3) via exact pigeonhole
    banding, on the 62-bit ENGINE-NEUTRAL fingerprint (two polynomial
    char folds per token, bases 131/137 mod 2^31-1 — same BIGINT-
    arithmetic family as the winnowing hash), so the full pipeline has
    a bit-exact DuckDB twin: the oracle recomputes every fingerprint
    and does the all-pairs Hamming join the banding avoids at scale.
    xxhash64-mode determinism + banding-exactness properties stay in
    test_llm_ops.py."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_distance=3, neutral=True)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(generate_series(1, len(embedding)),
               i -> CASE WHEN i = 1 THEN embedding[i] * 2
                         ELSE embedding[i] END)::FLOAT[]
      FROM embeddings WHERE vec_id % 100 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({duck_cosine('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.85
      AND {duck_cosine('a.embedding', 'b.embedding')} >= 0.9
    """,
    category="dedup",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup AT the production threshold (cosine >= 0.9,
    r=6 banding), via LSH banding + exact-cosine re-check
    (lsh_blocked_pairs) — no unblocked self-join in the plan, and at
    r=6 near-orthogonal random pairs collide per band w.p. 0.5^6 so
    the candidate set stays ~1.6% of all pairs (the r=2 low-threshold
    registration was the one engine-side 10x timeout of round 7:
    4 buckets/band is near-quadratic on random data). The fixture's
    random embeddings are near-orthogonal (max pairwise cosine ~0.47),
    so 1% of rows are re-planted as DETERMINISTIC near-dups — a copy
    re-keyed +1e6 with its first component doubled, which is exact in
    float32 on both engines and pins cosine(v, v') =
    (1+t)/sqrt(1+3t) for t = v0^2/|v|^2, i.e. in [0.9428, 1] for ANY
    vector — every planted pair clears the threshold and nothing else
    can. The at-threshold per-pair miss probability over 32 bands is
    < 1e-6 and the hyperplanes are deterministic, so the output equals
    the exact all-pairs oracle (the low-threshold τ=0.35 recall
    witness stays in test_llm_ops.py). The oracle prefilters the
    quadratic join with DuckDB's native float32 cosine at 0.85 (slack
    >> float32 error) before the exact double re-check, so the
    ground-truth SQL survives the 10x sweep's 90 s cap."""
    e = load_table(spark, sf_dir, "embeddings")
    planted = e.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * 2).otherwise(x),
        )
        .cast("array<float>")
        .alias("embedding"),
    )
    aug = e.select("vec_id", "embedding").unionByName(planted)
    # r=10 (vs the operator's r=6 default at τ=0.9): this key's true
    # pairs sit at cosine >= 0.9428 by construction (planted) or 1.0
    # (the 10x corpus replicates vectors exactly), never in
    # [0.90, 0.9428), so the worst-case per-pair miss over 32 bands is
    # (1 - (1-acos(0.9428)/pi)^10)^32 < 5e-6 while random
    # near-orthogonal candidates drop 0.5^10 per band — 6M candidates
    # at the 10x corpus instead of the 100M that r=6 yields on the
    # fixture's worst-case-for-LSH random data. Exact equality with the
    # all-pairs oracle is still asserted empirically at every scale.
    # method="arrow" (round 10): the 320-plane signature pass runs as
    # ONE exact-integer numpy matmul per Arrow batch instead of 320
    # interpreted HOF lambdas per row — the per-row constant that made
    # this key cost ~15 s at ANY scale factor; the miss-probability
    # bound is family-agnostic and equality with the all-pairs oracle
    # is re-asserted at every scale (test_llm_ops, SIM_RECALL, the 10x
    # sweep).
    return lsh_blocked_pairs(
        aug, "vec_id", "embedding", 0.9, planes_per_band=10, n_bands=32,
        method="arrow",
    )


@register(
    "dedup_incremental",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, sha256(lower(trim(text))) AS h FROM documents
    ),
    corpus AS (SELECT DISTINCT h FROM hashed WHERE doc_id < 400),
    batch AS (
      SELECT doc_id, h FROM hashed WHERE doc_id >= 400
      UNION ALL
      SELECT doc_id + 1000000000, h FROM hashed WHERE doc_id < 50
      UNION ALL
      SELECT doc_id + 2000000000, h FROM hashed
      WHERE doc_id BETWEEN 400 AND 419
    )
    SELECT b.doc_id,
           CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
                WHEN row_number() OVER (PARTITION BY b.h
                                        ORDER BY b.doc_id) > 1
                  THEN 'dup_in_batch'
                ELSE 'new' END AS status
    FROM batch b LEFT JOIN corpus c ON b.h = c.h
    """,
    category="dedup",
)
def dedup_incremental(spark, sf_dir):
    """Incremental exact dedup — the rolling-ingest shape: a new batch
    is checked against the already-ingested corpus (doc_id < 400), and
    batch-internal dups are separated from corpus dups so ingest stats
    stay honest. The fixture corpus has no exact duplicates, so the
    batch is built as a re-crawl: today's docs (doc_id >= 400) plus
    re-keyed copies of 50 corpus docs (fires dup_of_corpus) and of 20
    batch docs (fires dup_in_batch) — every status path executes and
    the oracle checks all three. Only (id, 32-byte hash) rows move:
    the corpus side reduces to its distinct hash set before the join
    (at 100 TB that set lives as a bucketed table or bloom filter; the
    join here IS the probe), and the batch-internal check is a window
    over the same hash partitioning the join just established."""
    from pyspark.sql import Window

    from bigdata_financial_reporting_spark.operators.dedup import (
        normalized_text_hash,
    )

    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    # d feeds the corpus census and three batch slices — unpersisted,
    # four raw scans + four normalize+hash passes per action (round-14
    # audit). Two longs per doc; persist it: one scan.
    d = track(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", normalized_text_hash("text").alias("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    corpus = (
        d.filter(F.col("doc_id") < 400).select("h").distinct()
        .withColumn("__hit", F.lit(1))
    )
    # Re-key offsets sit far above any fixture id range (sf0.1 reaches
    # doc_id 4999; the 10x staging replicates at +1e10) so synthetic
    # batch ids never collide with real batch docs at ANY scale factor.
    batch = (
        d.filter(F.col("doc_id") >= 400)
        .unionAll(
            d.filter(F.col("doc_id") < 50).select(
                (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "h"
            )
        )
        .unionAll(
            d.filter(F.col("doc_id").between(400, 419)).select(
                (F.col("doc_id") + 2_000_000_000).alias("doc_id"), "h"
            )
        )
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        batch.join(corpus, "h", "left")
        .withColumn("__rn", F.row_number().over(w))
        .select(
            "doc_id",
            F.when(F.col("__hit") == 1, "dup_of_corpus")
            .when(F.col("__rn") > 1, "dup_in_batch")
            .otherwise("new")
            .alias("status"),
        )
    )


# Engine-neutral polynomial text hash (base b, mod 2^31-1) in DuckDB —
# identical BIGINT arithmetic to operators/text.poly_text_hash.
def _duck_poly(col: str, base: int) -> str:
    return (
        f"CASE WHEN length({col}) >= 1 THEN "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length({col})), "
        f"i -> CAST(unicode(substr({col}, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * {base} + c) % 2147483647) "
        f"ELSE CAST(0 AS BIGINT) END"
    )


@register(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS tc,
             regexp_replace(lower(CASE WHEN doc_id % 2 = 1
                    THEN text || ' zz' || CAST(doc_id AS VARCHAR)
                    ELSE text END), '[^a-z0-9]', '', 'g') AS tp
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             {_duck_poly('tc', 131)} AS h1c, {_duck_poly('tc', 137)} AS h2c,
             {_duck_poly('tp', 131)} AS h1p, {_duck_poly('tp', 137)} AS h2p
      FROM base
    ),
    bitmap AS (
      SELECT (g // 16) AS word,
             bit_or(CAST(1 << CAST(g % 16 AS INT) AS INT)) AS bits
      FROM (
        SELECT unnest(list_transform(generate_series(0, 3),
                      i -> (h1c + i * h2c) % 16384)) AS g
        FROM hashed
      )
      GROUP BY (g // 16)
    ),
    probe_cells AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(0, 3),
                    i -> (h1p + i * h2p) % 16384)) AS g
      FROM hashed WHERE doc_id % 7 = 3
    ),
    verdict AS (
      SELECT pc.doc_id,
             bool_and(b.bits IS NOT NULL AND
                      (b.bits & CAST(1 << CAST(pc.g % 16 AS INT) AS INT))
                        = CAST(1 << CAST(pc.g % 16 AS INT) AS INT)) AS bloom_maybe
      FROM probe_cells pc
      LEFT JOIN bitmap b ON (pc.g // 16) = b.word
      GROUP BY pc.doc_id
    ),
    actual AS (
      SELECT p.doc_id, (c.h1 IS NOT NULL) AS actual_dup
      FROM (SELECT doc_id, h1p AS h1, h2p AS h2 FROM hashed
            WHERE doc_id % 7 = 3) p
      LEFT JOIN (SELECT DISTINCT h1c AS h1, h2c AS h2 FROM hashed) c
        USING (h1, h2)
    )
    SELECT v.doc_id, v.bloom_maybe, a.actual_dup,
           (v.bloom_maybe AND NOT a.actual_dup) AS false_positive
    FROM verdict v JOIN actual a USING (doc_id)
    """,
    category="dedup",
)
def dedup_bloom_prefilter(spark, sf_dir):
    """Broadcast-Bloom pre-filter for incremental dedup: a 16-kbit
    bitmap built over the corpus text hashes (engine-neutral double
    hashing, k=4) prunes a probe batch BEFORE the exact-match shuffle.
    The probe batch is docs with id % 7 = 3 — even ids unchanged (true
    duplicates of corpus rows), odd ids perturbed (novel). Emits per
    probe the Bloom verdict, the exact verdict, and the
    false-positive flag; no-false-negative is structural (every
    actual_dup row must be bloom_maybe — pinned in tests). At 100 TB
    the bitmap is O(m) however large the corpus, broadcasts to every
    executor, and only bloom-maybe rows pay the exact join — the
    standard shuffle-avoidance pattern Spark itself uses for
    runtime-filter joins. See operators/bloom.py."""
    from bigdata_financial_reporting_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )
    from bigdata_financial_reporting_spark.operators.text import poly_text_hash

    d = load_table(spark, sf_dir, "documents")
    probe_text = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(F.col("text"), F.lit(" zz"), F.col("doc_id").cast("string")),
    ).otherwise(F.col("text"))
    base = d.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "").alias("tc"),
        F.regexp_replace(F.lower(probe_text), "[^a-z0-9]", "").alias("tp"),
    )
    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    # hashed feeds four consumers (bitmap build, probe, exact-verdict
    # marked side, actual join) — unpersisted, the doc scan + four
    # polynomial text hashes re-ran per consumer (round-14 audit: 4
    # raw scans). Five longs per doc; persist it: one scan.
    hashed = track(
        base.select(
            "doc_id",
            poly_text_hash("tc", 131).alias("h1c"),
            poly_text_hash("tc", 137).alias("h2c"),
            poly_text_hash("tp", 131).alias("h1p"),
            poly_text_hash("tp", 137).alias("h2p"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    corpus_h = hashed.select(F.col("h1c").alias("h1"), F.col("h2c").alias("h2"))
    bitmap = bloom_build(corpus_h)
    probe_h = hashed.filter(F.col("doc_id") % 7 == 3).select(
        "doc_id", F.col("h1p").alias("h1"), F.col("h2p").alias("h2")
    )
    verdict = bloom_probe(probe_h, bitmap, "doc_id").withColumnRenamed(
        "maybe", "bloom_maybe"
    )
    marked = corpus_h.distinct().withColumn("__hit", F.lit(1))
    actual = probe_h.join(marked, ["h1", "h2"], "left").select(
        "doc_id", F.col("__hit").isNotNull().alias("actual_dup")
    )
    return verdict.join(actual, "doc_id").select(
        "doc_id",
        "bloom_maybe",
        "actual_dup",
        (F.col("bloom_maybe") & ~F.col("actual_dup")).alias("false_positive"),
    )


@register(
    "dedup_chunk_lines",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(regexp_replace(lower(text),
               '[^a-z0-9 \\t\\n]', ' ', 'g'), '\\s+'), t -> t <> '') AS tok
      FROM documents
    ),
    spread AS (
      SELECT doc_id, tok,
             unnest(generate_series(0,
               CAST(ceil(len(tok) / 16.0) AS BIGINT) - 1)) AS pos
      FROM toks WHERE len(tok) >= 1
    ),
    chunked AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(tok, pos * 16 + 1,
               least(pos * 16 + 16, len(tok))), ' ') AS chunk
      FROM spread
    ),
    ranked AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY chunk
                                ORDER BY doc_id, pos) AS rn
      FROM chunked
    )
    SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END,
                                   ' ' ORDER BY pos), '')) AS dedup_digest
    FROM ranked
    GROUP BY doc_id
    """,
    category="dedup",
)
def dedup_chunk_lines(spark, sf_dir):
    """Corpus-wide chunk-level (line-level) dedup, CCNet-style: split
    every document into 16-token chunks, keep only the globally FIRST
    occurrence of each distinct chunk (ordered by doc_id, position),
    and report per document how much text survives plus a digest of
    the reassembled deduplicated text. This removes boilerplate
    repeated across documents — the step exact doc-level dedup cannot
    do. Plan: one explode to chunk rows, one hash-partitioned window
    keyed on the chunk text (high-cardinality key — no low-cardinality
    funnel), one grouped reassembly; no all-pairs anywhere, shuffles
    keyed exactly like exact dedup so it scales the same way."""
    from pyspark.sql import Window

    from bigdata_financial_reporting_spark.operators.text import tokenize

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize(F.col("text")).alias("tok")).filter(
        F.size("tok") >= 1
    )
    chunked = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(tok) / 16.0) AS int) - 1), "
                "i -> array_join(slice(tok, i * 16 + 1, 16), ' '))"
            )
        ).alias("pos", "chunk"),
    )
    rn = F.row_number().over(
        Window.partitionBy("chunk").orderBy("doc_id", "pos")
    )
    ranked = chunked.withColumn("rn", rn)
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("pos"), F.col("chunk"))
    )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x.chunk,
                ),
                " ",
            )
        ).alias("dedup_digest"),
    )


@register(
    "dedup_semantic_semdedup",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding AS v, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {duck_cosine('e.embedding', 'c.cv')} DESC, c.cent_id)
               AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, v, cent_id AS cell FROM assigned WHERE rn = 1),
    dups AS (
      SELECT b.vec_id, min(a.vec_id) AS dup_of
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {duck_cosine('a.v', 'b.v')} >= 0.35
      GROUP BY b.vec_id
    )
    SELECT c.vec_id AS id, c.cell, d.vec_id IS NULL AS is_kept, d.dup_of
    FROM cells c LEFT JOIN dups d USING (vec_id)
    """,
    category="dedup",
)
def dedup_semantic_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (cluster-blocked embedding near-dup
    pruning, arXiv:2303.09540 — the canonical semantic-dedup recipe
    for pretraining corpora): coarse-quantize the embedding space,
    then drop rows similar (cosine >= 0.35) to a lower-id row of the
    SAME cluster only. The blocking bounds the quadratic term by the
    largest cell, which is what lets semantic dedup run at corpus
    scale; the degenerate lowest-id quantizer keeps the whole dataflow
    (assignment, intra-cell pairs, keep rule) exactly reproducible in
    the SQL oracle — production runs pass `train_centroids` cells
    into `operators.similarity.semantic_dedup` instead. Emits one row
    per vector with its cell, keep flag, and evicting duplicate."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        semantic_dedup,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding", n_clusters=16, threshold=0.35
    )


@register(
    "dedup_url_canonicalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id, doc_id // 2 AS base_id, source,
             unnest([
               'HTTPS://WWW.' || source || '.COM:443/Docs/'
                 || CAST(doc_id // 2 AS VARCHAR) || '/?utm_source=a&id=7#top',
               'https://www.' || source || '.com/docs/'
                 || CAST(doc_id // 2 AS VARCHAR) || '?id=7',
               'https://www.' || source || '.com/docs/'
                 || CAST(doc_id // 2 AS VARCHAR)
                 || '/index.html?utm_campaign=b&id=7'
             ]) AS url
      FROM documents WHERE doc_id < 100
    ),
    canon AS (
      SELECT doc_id, url,
             (
               WITH s AS (
                 SELECT rtrim(
                          regexp_replace(
                            regexp_replace(
                              regexp_replace(string_split(
                                string_split(lower(url), '#')[1], '?')[1],
                                '^(https://[^/]+?):443(/|$)', '\\1\\2'),
                              '^(http://[^/]+?):80(/|$)', '\\1\\2'),
                            '/index\\.html$', ''),
                          '/') AS path,
                        list_sort(list_filter(
                          string_split(
                            coalesce(string_split(
                              string_split(lower(url), '#')[1], '?')[2], ''),
                            '&'),
                          p -> p <> '' AND NOT p LIKE 'utm\\_%' ESCAPE '\\'))
                          AS params
               )
               SELECT path || CASE WHEN len(params) > 0
                                   THEN '?' || array_to_string(params, '&')
                                   ELSE '' END
               FROM s
             ) AS curl
      FROM raw
    )
    SELECT curl AS canonical, count(*) AS n_raw,
           count(DISTINCT doc_id) AS n_docs,
           min(doc_id) AS keeper_doc
    FROM canon GROUP BY curl
    """,
    category="dedup",
)
def dedup_url_canonicalize(spark, sf_dir):
    """URL canonicalization + exact dedup — the first dedup stage of
    any web-crawl pipeline: scheme/host lowercasing, default-port
    strip, fragment drop, /index.html collapse, trailing-slash trim,
    and QUERY-PARAM normalization done properly (split, drop utm_*
    tracking params, sort alphabetically, reassemble) — naive
    regex-only stripping breaks on '?utm_x=1&id=7'. Three styled
    variants per synthetic URL (the fixture has no URL column)
    collapse to one canonical form shared across a doc pair, and the
    group keeps the lowest doc id. Everything is codegen string/array
    HOFs — no UDF, no shuffle beyond the final canonical groupBy whose
    key is the deduped string."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    base = (F.col("doc_id") / 2).cast("long").cast("string")
    variants = F.array(
        F.concat(
            F.lit("HTTPS://WWW."), F.col("source"), F.lit(".COM:443/Docs/"),
            base, F.lit("/?utm_source=a&id=7#top"),
        ),
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".com/docs/"),
            base, F.lit("?id=7"),
        ),
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".com/docs/"),
            base, F.lit("/index.html?utm_campaign=b&id=7"),
        ),
    )
    from bigdata_financial_reporting_spark.operators.dedup import (
        canonical_url,
    )

    raw = d.select("doc_id", F.explode(variants).alias("url"))
    canonical = canonical_url(F.col("url"))
    return (
        raw.select("doc_id", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc"),
        )
    )
