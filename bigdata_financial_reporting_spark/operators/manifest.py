"""Manifest-based table versioning: snapshot isolation and time travel
on plain parquet, no table-format dependency.

A *version* is an immutable JSON manifest listing the exact data files
that make up the table at that version. Writers NEVER mutate existing
files or manifests: a commit writes new parquet files plus a new
manifest (v1, v2, ...), so readers pinned to a manifest see a
consistent snapshot regardless of concurrent commits — the core
mechanism under Iceberg/Delta, reduced to its portable essence. At
100 TB this is how you get reproducible training runs ("the corpus AS
OF v7") and safe concurrent compaction: the file list is the contract,
the directory is just storage.

No analogue in the reference (it overwrites CSVs in place,
controller/script.py:96-100); this is the versioned replacement for
that sink.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest-v{version}.json")


def _publish_manifest(table_dir: str, version: int, files: list[str]) -> bool:
    """Atomically publish ``manifest-v{version}.json``; False on collision.

    A plain ``open(path, 'x')`` + ``json.dump`` makes the manifest
    VISIBLE (and thus readable by a conflicting loser's ``files_of``)
    before its bytes are written — a tight race turns a recoverable
    conflict into a JSONDecodeError. Write the complete document to a
    temp file first, fsync it, then ``os.link(temp, final)``: the link
    either materializes the full content or fails with FileExistsError,
    preserving the O_EXCL single-winner commit point."""
    tmp = os.path.join(table_dir, f".manifest-{uuid.uuid4().hex[:12]}.tmp")
    try:
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": files}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.link(tmp, _manifest_path(table_dir, version))
        return True
    except FileExistsError:
        return False
    finally:
        # One try/finally spans BOTH the write and the link: a failed
        # json.dump/fsync (disk full, I/O error) must not strand the
        # uuid-named temp file next to the manifests forever.
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


def latest_version(table_dir: str) -> int:
    """Highest committed version, or 0 when the table does not exist."""
    if not os.path.isdir(table_dir):
        return 0
    vs = [
        int(f[len("manifest-v") : -len(".json")])
        for f in os.listdir(table_dir)
        if f.startswith("manifest-v") and f.endswith(".json")
    ]
    return max(vs, default=0)


class ManifestConflictError(RuntimeError):
    """A concurrent writer committed between the caller's base snapshot
    and this commit, and ``on_conflict='error'`` forbids auto-merge.
    Recompute ``base_files`` against the new latest version and retry."""


def commit_version(
    df: DataFrame,
    table_dir: str,
    base_files: list[str] | None = None,
    base_version: int | None = None,
    on_conflict: str = "merge",
) -> int:
    """Write ``df`` as new immutable data files and commit the next
    manifest. ``base_files``: files from the base version to KEEP
    (logical append keeps all of them; compaction passes the survivors;
    overwrite passes none). Returns the committed version number.

    Concurrency (Iceberg/Delta-style optimistic commit): the manifest
    is created with O_EXCL, so two writers racing for the same version
    number cannot clobber each other — the loser detects the collision.
    A losing (or merely stale — ``base_version`` older than the table's
    latest) commit must NOT republish its pre-race file list, or the
    winner's files silently vanish from history. Instead the base is
    RE-RESOLVED against the now-latest manifest:

    - ``on_conflict='merge'`` (default): keep every file the latest
      version lists except those this commit explicitly dropped
      relative to its own base (drops = base version's files minus
      ``base_files``), plus this commit's new files. An append keeps
      the winner's appends; a compaction still retires exactly the
      files it compacted.
    - ``on_conflict='error'``: raise :class:`ManifestConflictError` and
      let the caller recompute ``base_files`` itself.

    A full rewrite (``base_files=None``) depends on no base state and
    simply takes the next free version number.

    ``base_version``: the version ``base_files`` was computed from;
    defaults to the latest version visible now. Passing it explicitly
    closes the wider race where a concurrent commit lands between the
    caller's ``files_of(...)`` read and this call — without it only
    same-version-number collisions are detectable."""
    if on_conflict not in ("merge", "error"):
        raise ValueError(f"on_conflict must be 'merge' or 'error', got {on_conflict!r}")
    os.makedirs(table_dir, exist_ok=True)
    # Resolve the base BEFORE the (slow) staging write: resolving after
    # would let a commit that lands mid-write become the "base", so this
    # commit's drop set would be computed against the WINNER's snapshot
    # (marking the winner's new files as drops) with no version
    # collision to surface it — exactly the silent clobber the conflict
    # path exists to prevent. Resolved-first, any concurrent commit
    # makes this base stale and the O_EXCL collision below fires.
    if base_version is None:
        base_version = latest_version(table_dir)
    staging = os.path.join(table_dir, f"commit-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    new_files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    if base_files is None:
        dropped: set[str] = set()  # rewrite: no kept base state
    else:
        base_snapshot = files_of(table_dir, base_version) if base_version else []
        dropped = set(base_snapshot) - set(base_files)
    files = sorted(base_files or []) + new_files if base_files else new_files
    files = sorted(set(files))
    version = base_version + 1
    while True:
        if _publish_manifest(table_dir, version, files):
            return version
        # a concurrent writer owns this version number: re-resolve
        latest = latest_version(table_dir)
        if base_files is not None:
            if on_conflict == "error":
                raise ManifestConflictError(
                    f"{table_dir}: base v{base_version} is stale — "
                    f"latest is v{latest}; recompute base_files"
                )
            current = set(files_of(table_dir, latest))
            # Iceberg-style validation: merging is only sound if
            # every file this commit retires is still live in the
            # winner's snapshot. If the winner ALREADY removed some
            # of them (two compactions of the same base), merging
            # would list both rewrites of the same rows — silent
            # duplication. Surface the conflict instead.
            gone = dropped - current
            if gone:
                raise ManifestConflictError(
                    f"{table_dir}: files this commit retires were "
                    f"already removed by a concurrent commit "
                    f"(e.g. {sorted(gone)[:3]}); recompute "
                    f"base_files against v{latest}"
                )
            files = sorted((current - dropped) | set(new_files))
        version = max(latest, version) + 1


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Snapshot read AS OF ``version``: scan exactly the manifest's
    file list (Spark accepts a multi-path parquet load, so pruning and
    parallelism work as for any scan)."""
    with open(_manifest_path(table_dir, version)) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    if not files:
        raise ValueError(f"version {version} of {table_dir} lists no files")
    return spark.read.parquet(*files)


def files_of(table_dir: str, version: int) -> list[str]:
    with open(_manifest_path(table_dir, version)) as fh:
        return list(json.load(fh)["files"])


def vacuum_orphans(table_dir: str) -> list[str]:
    """Delete data files no surviving manifest references and return
    the deleted paths (sorted) — Delta's VACUUM / Iceberg's
    remove_orphan_files reduced to the manifest essence. Orphans come
    from two sources this module can create: an ABORTED commit (a
    crashed writer leaves its ``commit-*`` staging parquet with no
    manifest pointing at it) and an EXPIRED version whose files no
    younger manifest kept. Only ``*.parquet`` under ``commit-*``
    staging dirs are candidates; manifests themselves are never
    touched (that is :func:`ops_snapshot_expiry`'s job), so a pinned
    reader of a surviving version sees identical bytes before and
    after.

    Production caveat (why real VACUUM has a retention window): an
    IN-FLIGHT commit's staging files are indistinguishable from an
    aborted one's until its manifest publishes, so a concurrent vacuum
    must only reap files older than the longest plausible commit (the
    Delta default is 7 days). The engine keys call this on quiescent
    staged tables where the distinction is exact."""
    referenced: set[str] = set()
    for v in range(1, latest_version(table_dir) + 1):
        path = _manifest_path(table_dir, v)
        if os.path.exists(path):
            referenced.update(files_of(table_dir, v))
    present: set[str] = set()
    for entry in os.listdir(table_dir):
        staging = os.path.join(table_dir, entry)
        if entry.startswith("commit-") and os.path.isdir(staging):
            present.update(
                os.path.join(staging, f)
                for f in os.listdir(staging)
                if f.endswith(".parquet")
            )
    orphans = sorted(present - referenced)
    reaped_dirs = {os.path.dirname(f) for f in orphans}
    for f in orphans:
        os.remove(f)
    # drop staging dirs THIS reap emptied of parquet (writer _SUCCESS /
    # .crc markers go with them); dirs still holding live files stay.
    # Round-11 advice guards: only dirs the reap actually removed an
    # orphan from are candidates (a freshly created, still-empty
    # staging dir of an in-flight writer is not ours), and only plain
    # files are swept — a subdirectory (e.g. a live writer's
    # _temporary, or a partitioned layout) leaves that dir in place
    # instead of crashing the vacuum mid-delete on IsADirectoryError.
    for staging in sorted(reaped_dirs):
        remaining = os.listdir(staging)
        if any(f.endswith(".parquet") for f in remaining) or not all(
            os.path.isfile(os.path.join(staging, f)) for f in remaining
        ):
            continue
        for f in remaining:
            os.remove(os.path.join(staging, f))
        os.rmdir(staging)
    return orphans


def clone_table(src_dir: str, dst_dir: str, version: int | None = None) -> list[str]:
    """Zero-copy SHALLOW CLONE (Delta SHALLOW CLONE / Iceberg snapshot
    ref): publish a new table whose v1 manifest references the SOURCE
    table's data files at ``version`` (latest by default) — no byte of
    data moves. Because committed files are immutable (writers only
    ever add files + a new manifest), the clone is a consistent frozen
    snapshot: later commits to the source add new files under new
    manifests and are invisible to the clone, and the clone can evolve
    independently. The caveat is ownership: a VACUUM/expiry on the
    source does not know about the clone's references, which is why
    production formats track cross-table references or scope vacuum to
    retention windows (:func:`vacuum_orphans`). At 100 TB a shallow
    clone is O(manifest) — this is how you fork a corpus for an
    experiment without copying the corpus. Returns the referenced
    file list."""
    v = version if version is not None else latest_version(src_dir)
    files = files_of(src_dir, v)
    os.makedirs(dst_dir, exist_ok=True)
    if not _publish_manifest(dst_dir, 1, files):
        raise RuntimeError(
            f"clone_table: {dst_dir} already has a manifest-v1"
        )
    return files
