"""Tests for the ops-grade operators: table profiling and small-file
compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.compact import (
    compact_parquet,
    dir_bytes,
)
from bigdata_financial_reporting_spark.operators.profile import profile_table
from bigdata_financial_reporting_spark.sources.catalog import load_table


def test_profile_table_matches_direct_stats(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    prof = {r.column: r for r in profile_table(o).collect()}

    assert set(prof) == set(o.columns)
    n = o.count()
    for r in prof.values():
        assert r.n_rows == n

    direct = o.agg(
        F.count(F.when(F.col("o_orderstatus").isNull(), 1)).alias("nulls"),
        F.countDistinct("o_orderstatus").alias("ndv"),
        F.min("o_orderstatus").cast("string").alias("mn"),
        F.max("o_orderstatus").cast("string").alias("mx"),
    ).first()
    p = prof["o_orderstatus"]
    assert p.n_nulls == direct.nulls
    assert abs(p.n_distinct - direct.ndv) <= max(1, int(direct.ndv * 0.05))
    assert p.min_s == direct.mn and p.max_s == direct.mx


def test_profile_single_scan(spark, sf_dir):
    """The profile must be ONE aggregation over one scan, not a
    per-column loop."""
    from bigdata_financial_reporting_spark.plans.inspect import physical_plan

    o = load_table(spark, sf_dir, "orders")
    plan = physical_plan(profile_table(o))
    assert plan.count("FileScan") == 1


def test_compact_parquet_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    path = os.path.join(str(tmp_path), "frag")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ev.repartition(40).write.mode("overwrite").parquet(path)
    files_before = [
        f for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    ]
    assert len(files_before) >= 40

    before_sum = spark.read.parquet(path).agg(F.sum("event_id")).first()[0]
    stats = compact_parquet(
        spark, path, target_file_bytes=max(1, dir_bytes(path))
    )
    files_after = [
        f for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    ]
    assert len(files_after) < len(files_before)
    assert stats["after_files"] < stats["before_files"]

    after = spark.read.parquet(path)
    assert after.agg(F.sum("event_id")).first()[0] == before_sum
    assert after.count() == ev.count()


def test_upsert_parquet_update_and_insert(spark, sf_dir, tmp_path):
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.upsert import upsert_parquet

    path = os.path.join(str(tmp_path), "t")
    spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    ).write.parquet(path)

    src = spark.createDataFrame([Row(k=2, v="B2"), Row(k=9, v="new")])
    stats = upsert_parquet(spark, path, src, ["k"])
    assert stats == {"updated": 1, "inserted": 1, "total_after": 4}

    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}


def test_upsert_rejects_duplicate_source_keys(spark, tmp_path):
    import pytest
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.upsert import upsert_parquet

    path = os.path.join(str(tmp_path), "t2")
    spark.createDataFrame([Row(k=1, v="a")]).write.parquet(path)
    dup = spark.createDataFrame([Row(k=5, v="x"), Row(k=5, v="y")])
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_parquet(spark, path, dup, ["k"])
    # target untouched after the refused merge
    assert spark.read.parquet(path).count() == 1


def test_upsert_rejects_schema_mismatch(spark, tmp_path):
    import pytest
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.upsert import upsert_parquet

    path = os.path.join(str(tmp_path), "t3")
    spark.createDataFrame([Row(k=1, v="a")]).write.parquet(path)
    bad = spark.createDataFrame([Row(k=1, other=2)])
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_parquet(spark, path, bad, ["k"])


def test_validate_catches_injected_violations(spark):
    """Each rule kind must count its violations exactly on a frame with
    known defects."""
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.quality import (
        accepted_values,
        in_range,
        matches,
        not_null,
        unique,
        validate,
    )

    df = spark.createDataFrame(
        [
            Row(k=1, v=10.0, s="ok"),
            Row(k=2, v=None, s="ok"),
            Row(k=2, v=-5.0, s="bad!"),   # dup k, out-of-range v, bad s
            Row(k=None, v=3.0, s=None),   # null k
        ],
        "k int, v double, s string",
    )
    out = {
        r.rule: r.n_violations
        for r in validate(
            df,
            [
                not_null("k"),
                unique("k"),
                in_range("v", 0, 100),
                matches("s", "^[a-z]+$"),
                accepted_values("s", ["ok"]),
            ],
        ).collect()
    }
    assert out["not_null:k"] == 1
    assert out["unique:k"] == 1          # one EXTRA duplicate row
    assert out["in_range:v(0,100)"] == 1  # NULL v does not violate
    assert out["matches:s(^[a-z]+$)"] == 1  # NULL s does not violate
    assert out["accepted_values:s(ok)"] == 1


def test_swap_directory_handles_file_uri(spark, tmp_path):
    """The staged-swap helper must accept explicit URIs (the hdfs://
    and s3a:// code path), not just bare local paths."""
    import os

    from bigdata_financial_reporting_spark.sources.fs import swap_directory

    target = os.path.join(str(tmp_path), "table")
    staged = target + ".merge_tmp"
    spark.range(3).write.parquet(target)
    spark.range(7).write.parquet(staged)
    swap_directory(spark, "file://" + staged, "file://" + target)
    assert spark.read.parquet(target).count() == 7
    assert not os.path.exists(staged)
    assert not os.path.exists(target + ".swap_old")


def test_incremental_refresh_leaves_untouched_partitions_alone(
    spark, sf_dir, tmp_path
):
    """Dynamic partition overwrite must rewrite ONLY the affected day
    partitions: after the late-batch refresh, an early-January
    partition's files carry the same names, sizes, AND mtimes as
    before the refresh — proof the refresh never touched them."""
    import glob
    import os

    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")

    def daily(df):
        return df.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )

    path = str(tmp_path / "events_daily")
    cutoff = "2024-01-28"
    daily(ev.filter(F.col("ts") < cutoff)).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(path)

    early = sorted(glob.glob(os.path.join(path, "day=2024-01-05", "*.parquet")))
    assert early, "expected an early-January partition"
    sig_before = [(f, os.path.getmtime(f), os.path.getsize(f)) for f in early]

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        days = [
            r.day
            for r in daily(ev.filter(F.col("ts") >= cutoff))
            .select("day")
            .distinct()
            .collect()
        ]
        daily(
            ev.filter(F.date_format("ts", "yyyy-MM-dd").isin(days))
        ).write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    sig_after = [
        (f, os.path.getmtime(f), os.path.getsize(f))
        for f in sorted(
            glob.glob(os.path.join(path, "day=2024-01-05", "*.parquet"))
        )
    ]
    assert sig_before == sig_after, "refresh rewrote an untouched partition"
    # and the affected partitions DID change (late days exist on disk)
    assert glob.glob(os.path.join(path, "day=2024-01-3*", "*.parquet"))


def test_manifest_time_travel_snapshot_isolation(spark, sf_dir, tmp_path):
    """A reader pinned to v1's manifest must see IDENTICAL content
    before and after later commits (append AND rewrite), and commits
    never mutate existing data files — the two invariants manifest
    versioning exists to provide."""
    import os

    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.manifest import (
        commit_version,
        files_of,
        latest_version,
        read_version,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    table = os.path.join(str(tmp_path), "versions")
    n = load_table(spark, sf_dir, "nation")
    v1 = commit_version(n.filter(F.col("n_nationkey") < 10), table)
    before = sorted(tuple(r) for r in read_version(spark, table, v1).collect())
    mtimes = {f: os.path.getmtime(f) for f in files_of(table, v1)}

    v2 = commit_version(
        n.filter(F.col("n_nationkey") >= 10), table,
        base_files=files_of(table, v1),
    )
    v3 = commit_version(n.filter(F.col("n_nationkey") % 2 == 0), table)  # rewrite

    after = sorted(tuple(r) for r in read_version(spark, table, v1).collect())
    assert before == after and len(before) == 10
    assert {f: os.path.getmtime(f) for f in files_of(table, v1)} == mtimes
    assert read_version(spark, table, v2).count() == 25
    assert read_version(spark, table, v3).count() == 13
    assert latest_version(table) == v3 == 3
    # v1's files are all still listed by v2 (logical append, no rewrite)
    assert set(files_of(table, v1)) <= set(files_of(table, v2))


def test_manifest_concurrent_append_conflict_merges_not_clobbers(
    spark, sf_dir, tmp_path
):
    """ADVICE round 4: a losing concurrent append must NOT republish its
    pre-race file list (silently dropping the winner's files). With an
    explicit base_version, a stale committer collides with the winner's
    manifest and re-resolves: append keeps the winner's files,
    compaction still retires exactly the files it compacted, and
    on_conflict='error' surfaces the conflict instead."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.manifest import (
        ManifestConflictError,
        commit_version,
        files_of,
        read_version,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    table = os.path.join(str(tmp_path), "race")
    n = load_table(spark, sf_dir, "nation")
    v1 = commit_version(n.filter(F.col("n_nationkey") < 10), table)
    stale_base = files_of(table, v1)

    # winner appends rows 10-19 against v1
    v2 = commit_version(
        n.filter((F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 20)),
        table, base_files=stale_base, base_version=v1,
    )
    assert v2 == 2

    # loser appends rows 20+ still against the STALE v1 base: must land
    # as v3 and keep the winner's v2 files (25 rows total, not 15)
    v3 = commit_version(
        n.filter(F.col("n_nationkey") >= 20),
        table, base_files=stale_base, base_version=v1,
    )
    assert v3 == 3
    assert set(files_of(table, v2)) <= set(files_of(table, v3))
    assert read_version(spark, table, v3).count() == 25

    # compaction racing an append retires exactly its compacted files
    # but keeps the concurrent append: drop v1's files, rewrite rows
    # <10 as one file, stale base v1 — winner v3 already exists.
    survivors = []  # compact ALL of v1's files away
    v4 = commit_version(
        n.filter(F.col("n_nationkey") < 10).coalesce(1),
        table, base_files=survivors, base_version=v1,
    )
    assert v4 == 4
    kept = set(files_of(table, v4))
    assert not (set(stale_base) & kept), "compacted files must be retired"
    assert read_version(spark, table, v4).count() == 25

    # error mode: stale base surfaces instead of auto-merging
    with pytest.raises(ManifestConflictError):
        commit_version(
            n.filter(F.col("n_nationkey") < 5), table,
            base_files=stale_base, base_version=v1, on_conflict="error",
        )


def test_scd2_versions_handles_null_states(spark):
    """ADVICE round 4: a non-NULL -> NULL transition must open a
    version (plain != drops it), consecutive NULLs must collapse, and
    a row after a NULL state is a change only if it differs."""
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.timeseries import (
        scd2_versions,
    )

    rows = [
        Row(k=1, state="A", ts=1, seq=1),
        Row(k=1, state=None, ts=2, seq=2),
        Row(k=1, state=None, ts=3, seq=3),   # collapses into the NULL version
        Row(k=1, state="A", ts=4, seq=4),    # change (NULL -> A)
        Row(k=1, state="A", ts=5, seq=5),    # not a change
        Row(k=1, state=None, ts=6, seq=6),   # change (A -> NULL)
    ]
    df = spark.createDataFrame(rows, "k long, state string, ts long, seq long")
    got = sorted(
        (
            (r.valid_from, r.state, r.valid_to)
            for r in scd2_versions(df, "k", "state", "ts", "seq").collect()
        ),
        key=lambda t: t[0],
    )
    assert got == [(1, "A", 2), (2, None, 4), (4, "A", 6), (6, None, None)]


def test_manifest_double_compaction_conflict_raises(spark, sf_dir, tmp_path):
    """Review finding: two concurrent compactions of the SAME base must
    not auto-merge (that would list both rewrites of the same rows —
    silent duplication); the loser gets a conflict error."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.manifest import (
        ManifestConflictError,
        commit_version,
        read_version,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    table = os.path.join(str(tmp_path), "double_compact")
    n = load_table(spark, sf_dir, "nation")
    v1 = commit_version(n.filter(F.col("n_nationkey") < 10), table)

    # compaction A wins: retires all of v1's files
    v2 = commit_version(
        n.filter(F.col("n_nationkey") < 10).coalesce(1),
        table, base_files=[], base_version=v1,
    )
    assert v2 == 2
    # compaction B raced A from the same base: its retired files are
    # no longer live in the winner's snapshot -> conflict, not merge
    with pytest.raises(ManifestConflictError, match="already removed"):
        commit_version(
            n.filter(F.col("n_nationkey") < 10).coalesce(1),
            table, base_files=[], base_version=v1,
        )
    assert read_version(spark, table, v2).count() == 10


def test_manifest_base_resolved_before_staging_write(spark, sf_dir, tmp_path):
    """ADVICE round 5: base_version must be resolved BEFORE the slow
    staging write. Resolved after, a commit landing mid-write becomes
    the 'base', the drop set is computed against the WINNER's snapshot
    and no collision fires — a silent history rewrite. This test lands
    a concurrent commit from inside the staging write itself (a UDF
    side effect) and asserts the interloper's file survives into the
    loser's merged manifest."""
    import json
    import os

    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.manifest import (
        commit_version,
        files_of,
        latest_version,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    table = os.path.join(str(tmp_path), "midwrite")
    n = load_table(spark, sf_dir, "nation")
    v1 = commit_version(n.filter(F.col("n_nationkey") < 5), table)
    base = files_of(table, v1)
    dummy = os.path.join(table, "interloper.parquet")

    def interlope(x):
        # executed on an executor DURING the loser's staging write;
        # idempotent under task retries (O_EXCL, losers pass)
        try:
            with open(os.path.join(table, "manifest-v2.json"), "x") as fh:
                json.dump({"version": 2, "files": sorted(base) + [dummy]}, fh)
        except FileExistsError:
            pass
        return x

    udf = F.udf(interlope, "int")
    loser_df = n.filter(F.col("n_nationkey") >= 20).withColumn(
        "n_nationkey", udf("n_nationkey")
    )
    v = commit_version(loser_df, table, base_files=base)
    assert v == 3, "loser must collide with the mid-write commit and re-resolve"
    assert dummy in files_of(table, v), (
        "interloper's file silently dropped — base was resolved after "
        "the staging write"
    )
    assert latest_version(table) == 3


def test_publish_manifest_is_atomic_and_single_winner(tmp_path):
    """The manifest must never be visible before its bytes are
    complete (ADVICE round 5: open('x') + json.dump exposes an empty
    file to a concurrently-merging loser). The hard-link publish keeps
    the O_EXCL single-winner point: second publish of the same version
    returns False, the winner's content is intact, and no temp files
    are left behind."""
    import os

    from bigdata_financial_reporting_spark.operators.manifest import (
        _publish_manifest,
        files_of,
    )

    d = str(tmp_path / "atomic")
    os.makedirs(d)
    assert _publish_manifest(d, 1, ["a.parquet"]) is True
    assert _publish_manifest(d, 1, ["b.parquet"]) is False
    assert files_of(d, 1) == ["a.parquet"]
    assert not [f for f in os.listdir(d) if f.startswith(".manifest-")]


def test_cow_reader_pinned_version_survives_concurrent_commit(
    spark, sf_dir, tmp_path
):
    """Round-6 advisory item 7: copy-on-write isolation — a reader
    pinned to version v keeps seeing EXACTLY v's rows even while a
    concurrent writer commits a DELETE rewrite on top. The pinned
    read resolves its file list from v's manifest, so later commits
    (which only add files + a new manifest) cannot perturb it."""
    from bigdata_financial_reporting_spark.operators.manifest import (
        commit_version,
        read_version,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    table_dir = str(tmp_path / "cow_iso")
    n = load_table(spark, sf_dir, "nation")
    v1 = commit_version(n, table_dir)
    before = sorted(tuple(r) for r in read_version(spark, table_dir, v1).collect())

    # concurrent COW DELETE: rewrite survivors as v2
    survivors = read_version(spark, table_dir, v1).filter(
        F.col("n_nationkey") % 2 == 0
    )
    v2 = commit_version(survivors, table_dir)
    assert v2 == v1 + 1

    after = sorted(tuple(r) for r in read_version(spark, table_dir, v1).collect())
    assert after == before, "pinned v1 read changed under a concurrent commit"
    got_v2 = read_version(spark, table_dir, v2).collect()
    assert all(r["n_nationkey"] % 2 == 0 for r in got_v2)
    assert len(got_v2) < len(before)
