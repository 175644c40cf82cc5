"""Minimal snapshot-manifest table format over parquet ("snaptable").

The north-rule deployment target stores the pages table in Iceberg,
whose load-bearing semantics for this engine are (a) snapshot
isolation — a reader pinned to a snapshot sees a frozen file set no
matter what writers do, (b) time travel — any historical snapshot
stays readable, and (c) atomic commits — a failed write leaves no
half-table.  This sandbox ships no Iceberg runtime jar (documented in
``io/pages.py``), so those claims were config-swap only; this module
makes them REAL and testable locally with the same call shape:
``read_pages(spark, "snap:/path", snapshot_id=...)``.

Layout (all under one table root):

    data/<commit-uuid>-<part>.parquet   immutable data files
    snapshots/snap-<N>.json             manifest: file list + parent
    HEAD                                current snapshot id (atomic
                                        rename — the commit point)

A manifest lists the RELATIVE data files constituting the table at
snapshot N (Iceberg's manifest-list, flattened: at 10¹² rows you want
Iceberg's partition-pruned metadata tree; at sandbox scale a flat
list is the same semantics with one fewer indirection).  ``append``
writes new files then commits parent_files + new_files; ``overwrite``
commits only new_files; either way old snapshots keep their file
lists and data files are never deleted or rewritten, so a pinned read
is reproducible forever (compaction/GC would be a separate, explicit
expiry step, as in Iceberg's ``expire_snapshots``).

Commit protocol: data files land first (invisible until referenced),
the manifest is written, and HEAD is repointed by ``os.replace`` —
atomic on POSIX — so readers see the old or the new snapshot, never
a torn state.  Writer-writer races resolve by last-HEAD-wins
(single-writer assumption, documented; Iceberg's optimistic retry
loop slots in at the marked point).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _root(path: str) -> str:
    return path[len("snap:"):] if path.startswith("snap:") else path


def _manifest_path(root: str, sid: int) -> str:
    return os.path.join(root, "snapshots", f"snap-{sid:08d}.json")


def current_snapshot_id(path: str) -> int | None:
    """The table's HEAD snapshot id, or None for an empty table."""
    head = os.path.join(_root(path), "HEAD")
    if not os.path.exists(head):
        return None
    with open(head) as fh:
        return int(fh.read().strip())


def snapshots(path: str) -> list[dict]:
    """All snapshots oldest-first: [{snapshot_id, parent_id,
    operation, n_files, committed_at}] — the table's history."""
    root = _root(path)
    out = []
    for mf in sorted(glob.glob(os.path.join(root, "snapshots",
                                            "snap-*.json"))):
        with open(mf) as fh:
            m = json.load(fh)
        out.append({k: m[k] for k in ("snapshot_id", "parent_id",
                                      "operation", "committed_at")}
                   | {"n_files": len(m["files"])})
    return out


def _read_manifest(root: str, sid: int) -> dict:
    mf = _manifest_path(root, sid)
    if not os.path.exists(mf):
        raise ValueError(f"snaptable {root!r} has no snapshot {sid}")
    with open(mf) as fh:
        return json.load(fh)


def _file_stats(path: str) -> dict:
    """Per-column {col: [min, max]} for one parquet file, read from
    its footer (row-group statistics — O(KB) per file, no data scan).
    Only JSON-representable primitive columns (ints, floats, strings)
    get stats; anything else is simply absent, which ``plan_files``
    treats as "cannot prune" — always safe.

    At cluster scale this footer read rides the WRITER tasks (each
    task reports its own file's stats through the commit message, as
    Iceberg writers do); driver-side here because the sandbox writer
    is ``df.write.parquet`` which doesn't surface them.
    """
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    # A column's file-level range is sound only if EVERY row group
    # contributed usable min/max: a partial range understates the file
    # and would let plan_files skip a file that holds matching rows.
    # Any row group with absent/undecodable stats poisons the column
    # for this file (absent stats already mean "cannot prune" — safe).
    unusable: set = set()
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if name in unusable:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                unusable.add(name)
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    unusable.add(name)
                    continue
            if not isinstance(lo, (int, float, str)):
                unusable.add(name)  # timestamps/decimals: never unsafe
                continue
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    return {c: [mins[c], maxs[c]] for c in mins if c not in unusable}


def plan_files(path: str, snapshot_id: int | None = None,
               prune: list[tuple] | None = None) -> tuple[list[str], int]:
    """Manifest-level file planning with min/max data skipping —
    Iceberg's scan planning, flattened.  ``prune`` is a list of
    ``(col, lo, hi)`` closed intervals (``None`` bound = unbounded);
    a file is skipped iff its manifest stats PROVE no row can match
    (``max < lo`` or ``min > hi``).  Files with no stats for the
    column are always kept — skipping is an optimization, never a
    correctness bet.  Returns (absolute kept files, n_skipped); the
    skip count is metadata-only planning, the cluster never opens the
    skipped files — at 10¹² rows over ~10⁶ files this is the
    difference between a full scan and touching only the commits a
    predicate's key range lands in.
    """
    root = _root(path)
    sid = current_snapshot_id(root) if snapshot_id is None else snapshot_id
    if sid is None:
        raise ValueError(f"snaptable {root!r} is empty (no HEAD); "
                         "write before reading")
    m = _read_manifest(root, sid)
    stats = m.get("stats", {})
    kept, skipped = [], 0
    for rel in m["files"]:
        keep = True
        for col, lo, hi in (prune or []):
            s = stats.get(rel, {}).get(col)
            if s is None:
                continue
            fmin, fmax = s
            if (lo is not None and fmax < lo) or \
                    (hi is not None and fmin > hi):
                keep = False
                break
        if keep:
            kept.append(os.path.join(root, rel))
        else:
            skipped += 1
    return kept, skipped


def read_snaptable(spark: SparkSession, path: str,
                   snapshot_id: int | None = None,
                   prune: list[tuple] | None = None) -> DataFrame:
    """Read the table at HEAD, or time-travel to ``snapshot_id``.

    The returned plan scans exactly the files the manifest pins, so a
    reader holding a snapshot id is isolated from every later commit
    — the storage half of resumable runs (``ops/checkpoint.py`` is
    the compute half): a resumed job re-reads the SAME input bytes
    its checkpoint was built from.

    ``prune=[(col, lo, hi), ...]`` skips whole files via manifest
    min/max stats (see ``plan_files``) AND applies the same closed-
    interval predicates to the surviving rows, so the result is
    exactly ``WHERE col BETWEEN lo AND hi …`` regardless of how the
    data is laid out — stats only decide how little gets scanned.
    """
    root = _root(path)
    sid = current_snapshot_id(root) if snapshot_id is None else snapshot_id
    if sid is None:
        raise ValueError(f"snaptable {root!r} is empty (no HEAD); "
                         "write before reading")
    m = _read_manifest(root, sid)
    files, _ = plan_files(root, sid, prune)
    if not files:  # empty table, or every file pruned out
        from pyspark.sql.types import StructType
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(m["schema_json"])))
    df = spark.read.parquet(*files)
    for col, lo, hi in (prune or []):
        from pyspark.sql import functions as F
        c = F.col(col)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
    return df


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete data
    files no surviving snapshot references (Iceberg's
    ``expire_snapshots`` maintenance action).  This is the ONLY
    operation that deletes bytes — reads pinned to an expired
    snapshot fail loudly afterwards, which is the contract: expiry is
    an explicit retention decision, not a side effect of writing.

    Returns {"expired": [ids], "files_deleted": n} for audit logs.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be ≥ 1 (HEAD must survive)")
    root = _root(path)
    head = current_snapshot_id(root)
    if head is None:
        return {"expired": [], "files_deleted": 0}
    all_ids = sorted(int(os.path.basename(p)[5:-5]) for p in glob.glob(
        os.path.join(root, "snapshots", "snap-*.json")))
    keep = set(all_ids[-keep_last:]) | {head}
    live_files = set()
    for sid in keep:
        live_files.update(_read_manifest(root, sid)["files"])
    deleted = 0
    for sid in all_ids:
        if sid in keep:
            continue
        for f in _read_manifest(root, sid)["files"]:
            if f not in live_files:
                try:
                    os.remove(os.path.join(root, f))
                    deleted += 1
                except FileNotFoundError:
                    pass  # already collected by an earlier expiry
        os.remove(_manifest_path(root, sid))
    return {"expired": [s for s in all_ids if s not in keep],
            "files_deleted": deleted}


def write_snaptable(df: DataFrame, path: str,
                    mode: str = "append") -> int:
    """Commit ``df`` as a new snapshot; returns its snapshot id.

    ``append`` adds files to the parent's set; ``overwrite`` replaces
    the visible set (old snapshots stay readable — nothing is
    deleted).  Data files are written through Spark's parquet writer
    (distributed, one file per partition) into a scratch dir inside
    the table root, then renamed into ``data/`` — same filesystem, so
    the rename is metadata-only; on object stores this step is the
    copy-free multipart commit Iceberg does via its file IO.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported snaptable mode {mode!r}")
    root = _root(path)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    commit = uuid.uuid4().hex[:12]
    scratch = os.path.join(root, f".tmp-{commit}")
    df.write.mode("overwrite").parquet(scratch)
    new_files = []
    for i, part in enumerate(sorted(glob.glob(
            os.path.join(scratch, "part-*.parquet")))):
        rel = os.path.join("data", f"{commit}-{i:05d}.parquet")
        os.replace(part, os.path.join(root, rel))
        new_files.append(rel)
    shutil.rmtree(scratch, ignore_errors=True)

    # per-file min/max column stats for the NEW files (footer read,
    # no data scan); inherited files keep the parent's stats entries
    new_stats = {rel: _file_stats(os.path.join(root, rel))
                 for rel in new_files}

    # ---- commit point (single-writer; an optimistic CAS-on-HEAD
    # retry loop would slot in here for concurrent writers)
    parent = current_snapshot_id(root)
    if mode == "overwrite" or parent is None:
        files, stats = new_files, new_stats
    else:
        pm = _read_manifest(root, parent)
        files = pm["files"] + new_files
        stats = {**pm.get("stats", {}), **new_stats}
    sid = (parent or 0) + 1
    manifest = {
        "snapshot_id": sid, "parent_id": parent, "operation": mode,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime()),
        "schema_json": df.schema.json(),
        "files": files,
        "stats": stats,
    }
    tmp_mf = _manifest_path(root, sid) + f".{commit}.tmp"
    with open(tmp_mf, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp_mf, _manifest_path(root, sid))
    tmp_head = os.path.join(root, f"HEAD.{commit}.tmp")
    with open(tmp_head, "w") as fh:
        fh.write(str(sid))
    os.replace(tmp_head, os.path.join(root, "HEAD"))  # atomic commit
    return sid
