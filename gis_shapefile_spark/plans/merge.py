"""MERGE INTO-style upsert for the Iceberg-style table layer.

The checkpoint tables (``plans/checkpoint.py``) commit immutable stage
snapshots; a 10^12-row image table also needs in-place-SEMANTICS updates
(new crawl batches upserting by image_id, takedown tombstones). Real
Iceberg gets MERGE INTO from the format; this engine re-expresses it as
one declarative plan over (target ∪ updates):

    priority union -> per-key latest pick -> tombstone filter

Scale shape: ONE shuffle (hash partition by key for the row_number
window); both inputs stream through unmaterialized; no driver state. At
1000 executors this is the same cost as any keyed dedup pass. The window
per key is bounded by 1 target row + this batch's updates for that key —
no unbounded per-key state. Copy-on-write granularity is the OUTPUT
partitioning (write the merged result back through the checkpoint layer
for an atomic-commit new snapshot — merge-on-read compaction deferred,
like Iceberg's COW mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE semantics: rows in ``updates`` replace same-key rows in
    ``target`` (matched => UPDATE), new keys append (not matched =>
    INSERT), and — when ``delete_col`` names a boolean column on
    ``updates`` — true tombstones drop the key entirely (matched =>
    DELETE).

    Requires keys unique within each input (the usual MERGE precondition;
    duplicate update keys would make the result order-dependent).
    ``updates`` must carry the same schema as ``target`` (plus the
    optional tombstone column).
    """
    reserved = {"_tomb", "_src", "_rn"}
    clash = (set(target.columns) | set(updates.columns)) & reserved
    if clash or (delete_col in reserved):
        raise ValueError(
            f"merge_upsert reserves column names {sorted(reserved)}; "
            f"rename {sorted(clash) or [delete_col]} before merging"
        )
    tomb = F.col(delete_col) if delete_col else F.lit(False)
    u = updates.withColumn("_tomb", F.coalesce(tomb.cast("boolean"), F.lit(False)))
    if delete_col:
        u = u.drop(delete_col)
    t = target.withColumn("_tomb", F.lit(False)).withColumn("_src", F.lit(0))
    u = u.withColumn("_src", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(F.col("_src").desc())
    return (
        t.unionByName(u)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & ~F.col("_tomb"))
        .drop("_rn", "_src", "_tomb")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots of a keyed table (the
    read-side companion of ``merge_upsert``; with the checkpoint layer's
    manifest time travel this diffs any two committed versions).

    Returns (key_cols..., change_type) for every key that CHANGED:
    ``insert`` (key only in ``new``), ``delete`` (key only in ``old``),
    ``update`` (key in both, any compare column differs). Unchanged keys
    are dropped — at 10^12 rows the diff output is bounded by churn, not
    table size.

    Preconditions (same contract as ``merge_upsert``): keys unique
    within each snapshot — duplicate keys fan out the full-outer join
    into contradictory change rows. Default ``compare_cols`` is the
    INTERSECTION of non-key columns: a column that exists on only one
    side (schema evolution) is NOT treated as a change; pass
    ``compare_cols`` explicitly to control that.

    Scale shape: one full-outer hash equi-join on the keys (both sides
    shuffle once; AQE handles size asymmetry), then a codegen CASE over
    null-guarded column equality. Column comparison is exact per column
    (``eqNullSafe``) — no row hashing, so a NULL->value flip is a
    detected update and column order never matters.
    """
    reserved = {"_in_old", "_in_new"}
    clash = (set(old.columns) | set(new.columns)) & reserved
    if clash:
        raise ValueError(
            f"snapshot_diff reserves column names {sorted(reserved)}; "
            f"rename {sorted(clash)} before diffing"
        )
    compare_cols = (
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in key_cols and c in new.columns]
    )
    # presence flags are literal marker columns (the join COALESCES the
    # key columns, so key nullness can't detect side presence, and a
    # compare column may legitimately be NULL)
    o = old.withColumn("_in_old", F.lit(1)).alias("o")
    n = new.withColumn("_in_new", F.lit(1)).alias("n")
    joined = o.join(n, key_cols, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return (
        joined.select(*key_cols, change.alias("change_type"))
        .where(F.col("change_type").isNotNull())
    )


def _partition_dir_names(spark, part_col: str, value) -> list[str]:
    """Candidate on-disk directory names for one partition value.

    Spark Hive-escapes special characters in partition paths
    (``p=a%2Fb``) and renders values with its own formatting (booleans
    lowercase, NULL as ``__HIVE_DEFAULT_PARTITION__``). Where possible,
    ask Spark's own escaping util so the computed name matches what the
    writer produced; rendering-variant fallbacks cover the internal
    class moving.
    """
    if value is None:
        renders = ["__HIVE_DEFAULT_PARTITION__"]
    elif isinstance(value, bool):
        renders = [str(value).lower(), str(value)]
    else:
        renders = [str(value)]
    names = [f"{part_col}={r}" for r in renders]
    try:
        util = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        escaped = util.getPartitionPathString(part_col, renders[0])
        if escaped not in names:
            names.insert(0, escaped)
    except Exception:  # pragma: no cover - internal API moved
        pass
    return names


def _apply_merge_swap(path: str, staging: str, staged_dirs: list[str],
                      deleted_dirs: list[str], old_area: str) -> None:
    """Idempotent per-partition swap: safe to re-run from any crash point
    (``recover_merge`` does exactly that). For each staged partition dir,
    the current target dir (if any) moves into ``old_area`` (INSIDE the
    staging sibling — never a ``._old`` dir inside the table, which
    would corrupt partition discovery for concurrent readers), then the
    staged dir renames into place; a staged dir that no longer exists
    was already swapped by a previous attempt. Fully-deleted partition
    dirs move into ``old_area`` too, so nothing is destroyed until the
    journal is cleared."""
    import os
    import shutil

    for d in staged_dirs:
        tgt = os.path.join(path, d)
        staged = os.path.join(staging, d)
        if not os.path.isdir(staged):
            continue  # already swapped (recovery re-run)
        if os.path.isdir(tgt):
            moved_old = os.path.join(old_area, d)
            if os.path.isdir(moved_old):  # defensive: partial prior attempt
                shutil.rmtree(moved_old)
            os.rename(tgt, moved_old)
        os.rename(staged, tgt)
    for d in deleted_dirs:
        p = os.path.join(path, d)
        if os.path.isdir(p):
            os.rename(p, os.path.join(old_area, "deleted." + d))


def recover_merge(path: str) -> bool:
    """Complete (or clear) a partitioned-MERGE commit that crashed
    mid-swap. Returns True when a pending commit journal was found.

    The journal (``<path>._merge_commit.json``) is written after the
    merged output is DURABLY staged and before any target directory is
    touched, so re-applying the recorded swap plan is always safe: every
    partition ends fully new, old copies stay in the staging area until
    the journal is cleared. ``merge_upsert_partitioned`` calls this
    automatically before starting a new batch (single-writer layer)."""
    import json
    import os
    import shutil

    journal = f"{path.rstrip('/')}._merge_commit.json"
    if not os.path.exists(journal):
        return False
    with open(journal) as fh:
        j = json.load(fh)
    staging = j["staging"]
    if os.path.isdir(staging):
        old_area = os.path.join(staging, "_old")
        os.makedirs(old_area, exist_ok=True)
        _apply_merge_swap(path, staging, j["staged_dirs"],
                          j.get("deleted_dirs", []), old_area)
        shutil.rmtree(staging, ignore_errors=True)
    os.remove(journal)
    return True


def merge_upsert_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    part_col: str,
    delete_col: str | None = None,
    repartition_output: bool = True,
    check_moves: bool = False,
) -> list:
    """Partition-scoped COW MERGE into a hive-partitioned parquet table:
    only partitions that carry update keys are read, merged, and
    rewritten — the 10^12-row answer, where a churn batch touching 0.1%
    of partitions must not rewrite (or even read) the other 99.9%.

    ``updates`` must already carry ``part_col`` (for cell-partitioned
    layouts that is the same deterministic expression the layout writer
    used). Returns the sorted list of touched partition values.

    PRECONDITION — ``part_col`` is immutable per key: the scan prunes to
    the updates' (new) partition values, so a key that MOVES partitions
    would leave its old-partition row in place as a stale duplicate.
    Encode partition moves the way every partition-pruned MERGE
    (Hive/Iceberg COW alike) requires: a tombstone in the old partition
    plus an insert in the new one, in the same batch.
    ``check_moves=True`` enforces the churn-bounded half of that
    precondition: one extra equi-join of the update keys against the
    touched-partition target rows raises on any key whose stored
    partition differs from its update's partition. (A move arriving FROM
    an untouched partition is invisible to any partition-pruned MERGE
    without a full-table scan — that residual risk is inherent to the
    pruning and stays documented.)

    Commit protocol (crash-safe, no in-place overwrite): the merged
    output is staged to a fresh sibling directory first — DURABLE before
    any target file is disturbed, so a lost executor or evicted cache
    block can only ever recompute from still-intact source files — then
    an intent journal (``<path>._merge_commit.json``) records the full
    swap plan and each touched partition directory is swapped in via
    ``os.rename`` (atomic per dir on POSIX; displaced old copies move
    into the staging area, NEVER to a ``._old`` dir inside the table,
    which would corrupt partition discovery). A crash anywhere mid-swap
    is completed by ``recover_merge(path)`` — invoked automatically at
    the start of the next batch — by re-applying the journaled plan
    (the swap is idempotent); nothing old is destroyed until the
    journal clears. A failed staged WRITE leaves the target untouched
    and cleans its partial staging dir. Partition directory names are
    taken from the staged output itself (identical Hive escaping by
    construction); only fully-deleted partitions need a computed name
    (see ``_partition_dir_names``).

    Plan shape: touched partition values are collected driver-side
    (bounded by churn locality, metadata scale) and pushed as an IN
    filter -> static partition pruning at the scan; the merge window
    shuffles only touched-partition rows + the batch; the staged write
    IS the only materialization (no persist, no second pass).

    ``repartition_output=False`` skips the pre-write shuffle on
    ``part_col``: REQUIRED for tables with binary payload columns (image
    bytes must not cross an exchange — measured 10x, CLAUDE.md); the
    resulting per-task small files are ``CheckpointTable.compact``'s job.

    Single-writer, like every maintenance op in this layer.
    """
    import json
    import os
    import shutil
    import uuid

    recover_merge(path)  # complete any crashed prior commit first
    touched = sorted(
        (r[0] for r in updates.select(part_col).distinct().collect()),
        # None sorts first; str() breaks ties across mixed types without
        # ever comparing None to a value (TypeError on bare sorted())
        key=lambda v: (v is not None, str(v)),
    )
    if not touched:
        return []
    # isin() never matches NULL (SQL three-valued logic), so a NULL
    # partition value in the batch needs an explicit isNull arm — without
    # it the NULL partition's pre-existing rows are EXCLUDED from the
    # merge and the swap would replace the whole
    # __HIVE_DEFAULT_PARTITION__ dir with only the batch's rows
    non_null = [v for v in touched if v is not None]
    pred = F.col(part_col).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in touched):
        pred = pred | F.col(part_col).isNull()
    target = spark.read.parquet(path).where(pred)
    if check_moves:
        # a target row is safely addressed iff the batch carries SOME row
        # (update or tombstone) for its key IN ITS partition; a key whose
        # batch rows all sit in other partitions is an un-encoded move
        upd_parts = updates.groupBy(*key_cols).agg(
            F.collect_set(F.col(part_col)).alias("_new_parts")
        )
        moved = (
            target.select(*key_cols, part_col)
            .join(upd_parts, key_cols)
            .where(~F.array_contains(F.col("_new_parts"), F.col(part_col)))
            .limit(3)
            .collect()
        )
        if moved:
            raise ValueError(
                f"merge_upsert_partitioned: update keys change {part_col} "
                f"(first offenders: {[tuple(r) for r in moved]}); encode "
                "partition moves as tombstone(old partition) + insert(new "
                "partition) in the same batch"
            )
    # merge on (key, partition): a tombstone+insert move batch then has
    # UNIQUE merge keys (merge_upsert's precondition — on bare key_cols
    # the tombstone and the insert would tie in the pick window), normal
    # same-partition upserts behave identically, and a cross-partition
    # "update" can never silently re-home a row (the pruned scan couldn't
    # support that anyway — see PRECONDITION above)
    merged = merge_upsert(
        target, updates, key_cols + [part_col], delete_col=delete_col
    )
    out = merged
    if repartition_output:
        # without this every task writes a file into every touched
        # partition (tasks x partitions tiny files)
        out = merged.repartition(F.col(part_col))

    base = path.rstrip("/")
    staging = f"{base}._staging-{uuid.uuid4().hex[:12]}"
    journal = f"{base}._merge_commit.json"
    try:
        out.write.mode("overwrite").partitionBy(part_col).parquet(staging)
    except Exception:
        # partial staged write; the target is untouched — clean and rethrow
        shutil.rmtree(staging, ignore_errors=True)
        raise
    staged_dirs = sorted(
        d for d in os.listdir(staging)
        if d.startswith(f"{part_col}=")
        and os.path.isdir(os.path.join(staging, d))
    )
    # fully-deleted partitions (touched but no staged output), resolved
    # to on-disk names BEFORE any swap
    deleted_dirs = []
    for v in touched:
        names = _partition_dir_names(spark, part_col, v)
        if any(n in staged_dirs for n in names):
            continue
        deleted_dirs.extend(
            n for n in names if os.path.isdir(os.path.join(path, n))
        )
    old_area = os.path.join(staging, "_old")
    os.makedirs(old_area, exist_ok=True)
    # journal commit must be atomic: write-to-temp + fsync + rename, same
    # discipline as the checkpoint layer's manifest commit — an in-place
    # open(journal, "w") truncates first, so a crash mid-dump would leave
    # a 0-byte journal that bricks every later recover_merge()
    journal_tmp = f"{journal}.tmp-{uuid.uuid4().hex[:8]}"
    with open(journal_tmp, "w") as fh:
        json.dump(
            {"staging": staging, "staged_dirs": staged_dirs,
             "deleted_dirs": deleted_dirs,
             "touched": [str(v) for v in touched]},
            fh,
        )
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(journal_tmp, journal)
    # from here on, any crash/exception is completed by recover_merge()
    # (invoked automatically at the start of the next batch): the journal
    # + staging dir stay on disk for it — deliberately NO finally-cleanup
    _apply_merge_swap(path, staging, staged_dirs, deleted_dirs, old_area)
    os.remove(journal)
    shutil.rmtree(staging, ignore_errors=True)
    return touched


# ---------------------------------------------------------------------------
# Merge-on-read equality deletes (the Iceberg-v2 MoR shape)
# ---------------------------------------------------------------------------
#
# The COW MERGE above rewrites every touched partition to drop a handful
# of rows — correct, but the wrong cost model for takedown batches against
# a 10^12-row image table (a 1k-key DMCA/safety takedown must not rewrite
# terabytes). Merge-on-read inverts it: ``mor_delete`` commits ONLY the
# key batch as an equality-delete file (O(batch) write, data files
# untouched), ``mor_read`` applies the accumulated delete files at scan
# time as one broadcast anti-join (delete sets are key-only and tiny next
# to the data — the broadcast never exceeds takedown-batch scale), and
# ``mor_compact`` folds them into the data files on a schedule, amortizing
# the rewrite across many delete batches. This mirrors Iceberg v2
# equality deletes + background rewrite_data_files; the reference engine
# has no mutation story at all (its dataset is load-once —
# shapefile_reader.cpp reads the whole file at startup), so this layer is
# engine surface the 10^12-row target demands, not a port.
#
# Layout: delete files live under ``<table>/_deletes/delete-<uuid>/`` —
# Spark's file-source discovery treats underscore-prefixed paths as
# hidden, so a plain ``spark.read.parquet(table)`` still sees only data
# files (and would see not-yet-compacted deleted rows: always read
# through ``mor_read``). A ``_keycols.json`` sidecar pins the equality
# key so later batches can't silently commit a different key set.
# Single-writer for maintenance ops, like the rest of this layer.

_DELETES_DIR = "_deletes"


def _mor_journal(path: str) -> str:
    return f"{path.rstrip('/')}._mor_compact.json"


def _mor_delete_dirs(path: str) -> list[str]:
    """Sorted absolute paths of committed delete-file directories."""
    import os

    droot = os.path.join(path, _DELETES_DIR)
    if not os.path.isdir(droot):
        return []
    return sorted(
        os.path.join(droot, d)
        for d in os.listdir(droot)
        if d.startswith("delete-") and os.path.isdir(os.path.join(droot, d))
    )


def _mor_keycols(path: str) -> list[str] | None:
    import json
    import os

    sidecar = os.path.join(path, _DELETES_DIR, "_keycols.json")
    if not os.path.exists(sidecar):
        return None
    with open(sidecar) as fh:
        return json.load(fh)["key_cols"]


def mor_delete(spark, path: str, keys_df: DataFrame,
               key_cols: list[str], tag: str | None = None) -> str:
    """Commit one equality-delete file against the parquet table at
    ``path``; returns the committed delete-dir path.

    O(batch): the distinct key projection is staged to a hidden tmp dir
    inside ``_deletes`` and published with a single ``os.rename`` (atomic
    on POSIX), so readers only ever see complete delete files. No data
    file is read or written. Matching is by equality on ``key_cols`` —
    a key with no matching data row is a no-op (idempotent takedowns),
    and re-committing the same keys is harmless (anti-join semantics).

    ``tag`` names the delete file deterministically
    (``delete-<tag>``): when that dir already exists the commit is a
    NO-OP replay marker, the exactly-once primitive the streaming
    takedown sink builds on (an anonymous commit gets a uuid tag and
    always publishes). A marker consumed by an intervening
    ``mor_compact`` no longer short-circuits its replay — the re-applied
    delete file is then redundant-but-harmless (equality deletes of
    already-deleted keys are anti-join no-ops), so exactly-once here
    means "no duplicate backlog within a compaction window", not a
    correctness boundary.

    The first batch pins ``key_cols`` in ``_keycols.json``; later batches
    must use the same set (mixed-key delete files would union-read with
    nulled columns and silently stop matching).
    """
    import json
    import os
    import shutil
    import uuid

    recover_mor(path)  # complete any crashed prior compaction first
    pinned = _mor_keycols(path)
    if pinned is not None and sorted(pinned) != sorted(key_cols):
        raise ValueError(
            f"mor_delete: table {path} has delete files keyed on {pinned}; "
            f"a batch keyed on {key_cols} cannot be applied with them in "
            "one read — compact first, or use the pinned key set"
        )
    missing = [c for c in key_cols if c not in keys_df.columns]
    if missing:
        raise ValueError(f"mor_delete: keys_df lacks key columns {missing}")
    droot = os.path.join(path, _DELETES_DIR)
    os.makedirs(droot, exist_ok=True)
    tag = tag or uuid.uuid4().hex[:12]
    tmp = os.path.join(droot, f".tmp-{tag}")
    final = os.path.join(droot, f"delete-{tag}")
    if os.path.isdir(final):  # tagged replay: already committed
        return final
    # delete batches are key-only and takedown-scale: one file per batch
    # (mode=overwrite also clears a stale tmp from a crashed prior try)
    keys_df.select(*key_cols).distinct().coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    # pin the key set BEFORE the delete dir becomes visible: a crash
    # between the two must never leave committed delete files without a
    # sidecar (readers with key_cols=None would fail, and a later batch
    # could re-pin a DIFFERENT key set, nulling the orphan's columns in
    # the union read — the exact hazard the sidecar exists to prevent);
    # the inverse crash (sidecar without delete files) is merely strict
    # (it pins future batches' keys) and compaction drops it
    if pinned is None:
        sidecar_tmp = os.path.join(droot, f"._keycols.tmp-{tag}")
        with open(sidecar_tmp, "w") as fh:
            json.dump({"key_cols": list(key_cols)}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(sidecar_tmp, os.path.join(droot, "_keycols.json"))
    try:
        os.rename(tmp, final)
    except OSError:
        if not os.path.isdir(final):  # pragma: no cover - real rename error
            raise
        shutil.rmtree(tmp, ignore_errors=True)  # lost a same-tag race
    return final


def mor_read(spark, path: str, key_cols: list[str] | None = None,
             broadcast_deletes: bool = True) -> DataFrame:
    """Scan the table minus its accumulated equality deletes.

    Plan shape: data scan LEFT ANTI JOIN (broadcast) the union of delete
    files — zero shuffle on the data side, predicate/column pushdown on
    the scan untouched (the anti-join adds only the key columns to the
    read set it needs anyway). With no delete files this IS the plain
    scan (no join node at all, so post-compaction reads pay nothing).
    ``broadcast_deletes=False`` falls back to a shuffled anti-join for a
    pathological delete backlog bigger than executor memory — the real
    fix there is ``mor_compact``, which such a backlog is overdue for.
    """
    import os

    if os.path.exists(_mor_journal(path)):
        raise RuntimeError(
            f"mor_read: table {path} has a pending compaction journal; "
            "run recover_mor(path) (any maintenance op does) before reading"
        )
    data = spark.read.parquet(path)
    dirs = _mor_delete_dirs(path)
    if not dirs:
        return data
    cols = key_cols or _mor_keycols(path)
    deletes = spark.read.parquet(*dirs).select(*cols)
    right = F.broadcast(deletes) if broadcast_deletes else deletes
    return data.join(right, on=cols, how="left_anti")


def _apply_mor_compact(path: str, j: dict) -> None:
    """Idempotent journaled apply for ``mor_compact`` — safe to re-run
    from any crash point (every step is an existence-checked rename)."""
    import os
    import shutil

    staging = j["staging"]
    old_area = os.path.join(staging, "_old")
    os.makedirs(old_area, exist_ok=True)
    if j["mode"] == "flat":
        for f in j["old_files"]:
            src = os.path.join(path, f)
            if os.path.isfile(src):
                os.rename(src, os.path.join(old_area, f))
        for f in j["staged_files"]:
            src = os.path.join(staging, f)
            if os.path.isfile(src):
                os.rename(src, os.path.join(path, f))
    else:  # partitioned: same per-dir swap as the COW MERGE commit
        _apply_merge_swap(path, staging, j["staged_dirs"],
                          j.get("deleted_dirs", []), old_area)
    # consume the folded delete files last: if we crash before this, the
    # replay re-moves nothing above and re-consumes here; an anti-join of
    # already-deleted keys against the compacted data is a no-op anyway
    for d in j["consumed_deletes"]:
        src = os.path.join(path, _DELETES_DIR, d)
        if os.path.isdir(src):
            os.rename(src, os.path.join(old_area, "consumed." + d))
    sidecar = os.path.join(path, _DELETES_DIR, "_keycols.json")
    if j.get("drop_sidecar") and os.path.exists(sidecar):
        os.remove(sidecar)
    shutil.rmtree(staging, ignore_errors=True)


def recover_mor(path: str) -> bool:
    """Complete a ``mor_compact`` commit that crashed mid-apply; returns
    True when a pending journal was found. Invoked automatically at the
    start of every MoR maintenance op (``mor_delete`` / ``mor_compact``)."""
    import json
    import os

    journal = _mor_journal(path)
    if not os.path.exists(journal):
        return False
    with open(journal) as fh:
        j = json.load(fh)
    if os.path.isdir(j["staging"]) or any(
        os.path.isdir(os.path.join(path, _DELETES_DIR, d))
        for d in j["consumed_deletes"]
    ):
        _apply_mor_compact(path, j)
    os.remove(journal)
    return True


def _disk_partition_dirs(path: str) -> list[str]:
    import os

    return sorted(
        d for d in os.listdir(path)
        if "=" in d and not d.startswith(("_", "."))
        and os.path.isdir(os.path.join(path, d))
    )


def mor_compact(spark, path: str, part_col: str | None = None,
                prune: bool = True,
                repartition_output: bool = False) -> int:
    """Fold every committed delete file into the data files (one COW
    rewrite), leaving the table readable by a bare scan again; returns
    the number of delete files consumed.

    Flat (unpartitioned) tables rewrite wholesale: staged survivors swap
    in file-by-file under an intent journal — atomic-per-rename,
    replayable by ``recover_mor`` from any crash point, nothing
    destroyed until the journal clears (the same discipline as the
    partitioned MERGE commit).

    With ``part_col`` (hive-partitioned table) the rewrite is
    PARTITION-PRUNED: only partitions carrying delete keys are read,
    anti-joined, and swapped — the 10^12-row answer, requiring
    ``part_col`` to be part of the pinned equality key (a global delete
    key can match rows in unread partitions, which no pruned rewrite can
    honor; committing partition-scoped keys is how Iceberg's
    partition-granularity deletes work too). A backlog of GLOBAL keys on
    a partitioned table compacts with ``prune=False``: one full
    partition-preserving rewrite (every partition dir swaps), the price
    of having committed unscoped keys.

    ``repartition_output`` stays False by default: binary payload
    columns must not cross an exchange (CLAUDE.md, measured 10x) — the
    survivors stream scan→write; small-file cleanup belongs to the
    checkpoint layer's compaction.
    """
    import json
    import os
    import shutil
    import uuid

    recover_mor(path)
    dirs = _mor_delete_dirs(path)
    if not dirs:
        # an orphaned key pin (sidecar committed, delete dir's publish
        # crashed) has nothing to guard — drop it so future batches may
        # re-key
        sidecar = os.path.join(path, _DELETES_DIR, "_keycols.json")
        if os.path.exists(sidecar):
            os.remove(sidecar)
        return 0
    cols = _mor_keycols(path)
    deletes = spark.read.parquet(*dirs).select(*cols)
    base = path.rstrip("/")
    staging = f"{base}._mor_staging-{uuid.uuid4().hex[:12]}"
    j: dict = {
        "staging": staging,
        "consumed_deletes": [os.path.basename(d) for d in dirs],
        "drop_sidecar": True,
    }
    if part_col is None:
        if _disk_partition_dirs(path):
            raise ValueError(
                f"mor_compact: {path} is hive-partitioned; pass part_col "
                "(pruned rewrite for partition-scoped keys, prune=False "
                "for a global-key backlog)"
            )
        survivors = spark.read.parquet(path).join(
            F.broadcast(deletes), on=cols, how="left_anti"
        )
        if repartition_output:
            survivors = survivors.repartition(
                spark.sparkContext.defaultParallelism
            )
        try:
            survivors.write.mode("overwrite").parquet(staging)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        j.update(
            mode="flat",
            old_files=sorted(
                f for f in os.listdir(path)
                if os.path.isfile(os.path.join(path, f))
            ),
            # _SUCCESS is excluded: its name collides between old and
            # staged lists, so a crash-replay after the staged marker
            # moved in would re-move it out via the old_files arm
            staged_files=sorted(
                f for f in os.listdir(staging)
                if os.path.isfile(os.path.join(staging, f))
                and not f.startswith(("_", "."))
            ),
        )
    else:
        if prune and part_col not in cols:
            raise ValueError(
                f"mor_compact(part_col={part_col!r}): the pinned delete key "
                f"{cols} does not include the partition column, so deletes "
                "are global and the rewrite cannot prune — pass prune=False "
                "for a full partition-preserving rewrite, or commit "
                "partition-scoped delete keys"
            )
        scan = spark.read.parquet(path)
        if prune:
            touched = sorted(
                (r[0] for r in deletes.select(part_col).distinct().collect()),
                key=lambda v: (v is not None, str(v)),
            )
            non_null = [v for v in touched if v is not None]
            pred = (F.col(part_col).isin(non_null) if non_null
                    else F.lit(False))
            if any(v is None for v in touched):
                pred = pred | F.col(part_col).isNull()
            scan = scan.where(pred)
        survivors = scan.join(F.broadcast(deletes), on=cols, how="left_anti")
        if repartition_output:
            survivors = survivors.repartition(F.col(part_col))
        try:
            survivors.write.mode("overwrite").partitionBy(part_col).parquet(
                staging
            )
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        staged_dirs = sorted(
            d for d in os.listdir(staging)
            if d.startswith(f"{part_col}=")
            and os.path.isdir(os.path.join(staging, d))
        )
        if prune:
            deleted_dirs = []
            for v in touched:
                names = _partition_dir_names(spark, part_col, v)
                if any(n in staged_dirs for n in names):
                    continue
                deleted_dirs.extend(
                    n for n in names if os.path.isdir(os.path.join(path, n))
                )
        else:
            # full rewrite: every on-disk partition dir not re-staged was
            # fully deleted (names compare directly — same Hive escaping
            # on both sides by construction)
            deleted_dirs = [
                d for d in _disk_partition_dirs(path) if d not in staged_dirs
            ]
        j.update(mode="partitioned", staged_dirs=staged_dirs,
                 deleted_dirs=deleted_dirs)
    journal = _mor_journal(path)
    journal_tmp = f"{journal}.tmp-{uuid.uuid4().hex[:8]}"
    with open(journal_tmp, "w") as fh:
        json.dump(j, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(journal_tmp, journal)
    _apply_mor_compact(path, j)
    os.remove(journal)
    return len(dirs)
