"""Checkpoint/lineage layer: atomic commits, resume, lineage metrics."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gis_shapefile_spark.plans.checkpoint import CheckpointTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ckpt")


def _pipeline(spark, ck: CheckpointTable, calls: list, n: int = 100):
    s1 = ck.stage(
        "numbers", f"n={n}",
        lambda: (calls.append("numbers"), spark.range(n).withColumn(
            "v", F.col("id") * 2))[1],
    )
    s2 = ck.stage(
        "evens", f"n={n}",
        lambda: (calls.append("evens"), s1.where(F.col("id") % 2 == 0))[1],
    )
    s3 = ck.stage(
        "total", f"n={n}",
        lambda: (calls.append("total"), s2.agg(F.sum("v").alias("t")))[1],
    )
    return s3


def test_run_then_resume_skips_completed_stages(spark, root):
    calls: list = []
    out1 = _pipeline(spark, CheckpointTable(spark, root), calls).collect()
    assert calls == ["numbers", "evens", "total"]

    # "restart": fresh table object over the same root — nothing recomputes
    calls2: list = []
    out2 = _pipeline(spark, CheckpointTable(spark, root), calls2).collect()
    assert calls2 == []
    assert out1 == out2


def test_mid_pipeline_kill_and_resume(spark, root):
    """Run stages 1-2, 'die', restart the full pipeline: only stage 3 runs
    and the final output matches an uninterrupted run."""
    calls: list = []
    ck = CheckpointTable(spark, root)
    s1 = ck.stage("numbers", "n=100", lambda: (calls.append("numbers"),
                  spark.range(100).withColumn("v", F.col("id") * 2))[1])
    ck.stage("evens", "n=100", lambda: (calls.append("evens"),
             s1.where(F.col("id") % 2 == 0))[1])
    assert calls == ["numbers", "evens"]

    calls2: list = []
    out = _pipeline(spark, CheckpointTable(spark, root), calls2).collect()
    assert calls2 == ["total"]
    assert out[0]["t"] == sum(2 * i for i in range(100) if i % 2 == 0)


def test_fingerprint_change_invalidates_stage(spark, root):
    calls: list = []
    _pipeline(spark, CheckpointTable(spark, root), calls, n=100)
    calls2: list = []
    out = _pipeline(spark, CheckpointTable(spark, root), calls2, n=50).collect()
    assert calls2 == ["numbers", "evens", "total"]  # new inputs => rerun
    assert out[0]["t"] == sum(2 * i for i in range(50) if i % 2 == 0)


def test_manifest_commits_are_versioned_and_atomic(spark, root):
    ck = CheckpointTable(spark, root)
    calls: list = []
    _pipeline(spark, ck, calls)
    m = ck.manifest()
    assert m["version"] == 3
    assert set(m["stages"]) == {"numbers", "evens", "total"}
    for st in m["stages"].values():
        assert st["rows"] >= 1 and st["bytes"] > 0
        assert sum(st["partitions"].values()) == st["rows"]  # lineage adds up
    # every committed manifest on disk is complete, valid JSON
    mdir = os.path.join(root, "_manifests")
    for fn in os.listdir(mdir):
        assert fn.startswith("v")
        with open(os.path.join(mdir, fn)) as f:
            json.load(f)


def test_checkpointed_image_tiling_resumes(spark, root):
    from gis_shapefile_spark.plans.pipelines import checkpointed_image_tiling
    from gis_shapefile_spark.sources import fixtures as FX

    path = FX.images_parquet_path(n=300)
    tiles1, ck1 = checkpointed_image_tiling(
        spark, path, FX.make_grid_features(), root, res=6
    )
    total1 = tiles1.agg(F.sum("n_images")).collect()[0][0]
    assert total1 == 300
    v1 = ck1.manifest()["version"]
    assert v1 == 3

    # restart: same inputs -> zero new manifest versions, same output
    tiles2, ck2 = checkpointed_image_tiling(
        spark, path, FX.make_grid_features(), root, res=6
    )
    assert ck2.manifest()["version"] == v1  # nothing recomputed
    assert sorted(map(tuple, tiles2.collect()), key=str) == sorted(
        map(tuple, tiles1.collect()), key=str
    )

    # resolution change invalidates all chained stages
    _, ck3 = checkpointed_image_tiling(
        spark, path, FX.make_grid_features(), root, res=7
    )
    assert ck3.manifest()["version"] == v1 + 3


def test_lineage_table(spark, root):
    ck = CheckpointTable(spark, root)
    calls: list = []
    _pipeline(spark, ck, calls)
    rows = {r.stage: r for r in ck.lineage().collect()}
    assert rows["numbers"].rows == 100
    assert rows["evens"].rows == 50
    assert rows["total"].rows == 1
    assert all(r.bytes > 0 and r.n_partitions >= 1 for r in rows.values())


def test_cell_partitioned_layout_prunes(spark, tmp_path):
    """Partition pruning: a bbox-scoped read opens only intersecting parent
    cells — verified by both result correctness and the scan's partition
    count in the executed plan."""
    import re
    from pyspark.sql import functions as F
    from gis_shapefile_spark.plans import layout as L

    pts = spark.range(30000).select(
        F.col("id").alias("point_id"),
        (F.lit(-125.0) + ((F.col("id") * 2654435761) % 59000000) / 1000000.0).alias("lng"),
        (F.lit(24.0) + ((F.col("id") * 40503) % 26000000) / 1000000.0).alias("lat"),
    )
    path = str(tmp_path / "cellpart")
    L.write_cell_partitioned(pts, path, res=8, parent_res=3)

    bbox = (-100.0, 30.0, -95.0, 35.0)
    pruned = L.read_cells_pruned(spark, path, bbox, parent_res=3)
    # correctness: pruned read ⊇ exact bbox rows, and filtering the pruned
    # set by the bbox equals filtering the full set
    full = spark.read.parquet(path)
    in_box = (
        (F.col("lng") >= bbox[0]) & (F.col("lng") <= bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
    )
    assert pruned.where(in_box).count() == full.where(in_box).count() > 0
    assert pruned.count() < full.count()

    # plan: the partition filter reached the scan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*pcell.*\]", plan)


def test_time_travel_and_vacuum(spark, tmp_path):
    """Manifest snapshots are immutable (time travel) and vacuum removes
    only data unreachable from the kept versions."""
    import os
    import pytest as _pytest
    from gis_shapefile_spark.plans.checkpoint import CheckpointTable

    t = CheckpointTable(spark, str(tmp_path / "tt"))
    t.stage("s", "fp1", lambda: spark.range(10).selectExpr("id AS a"))
    t.stage("s", "fp2", lambda: spark.range(25).selectExpr("id AS a"))

    assert t.read_stage("s").count() == 25          # latest
    assert t.read_stage("s", version=1).count() == 10  # time travel
    with _pytest.raises(KeyError):
        t.manifest(version=99)

    removed = t.vacuum(keep_versions=1)
    assert len(removed) == 1  # the fp1 directory is orphaned
    assert t.read_stage("s").count() == 25  # current snapshot intact
    with _pytest.raises(KeyError):
        t.manifest(version=1)  # expired snapshot gone


def test_stage_observed_metrics_in_manifest(spark, tmp_path):
    """In-flight Observation metrics land in the committed manifest entry."""
    from pyspark.sql import functions as F
    from gis_shapefile_spark.plans.checkpoint import CheckpointTable

    t = CheckpointTable(spark, str(tmp_path / "obs"))
    t.stage(
        "q", "fp",
        lambda: spark.range(100).selectExpr("id", "id % 10 = 0 AS flagged"),
        metrics={
            "n_rows": F.count(F.lit(1)),
            "n_flagged": F.sum(F.col("flagged").cast("long")),
        },
    )
    st = t.manifest()["stages"]["q"]
    assert st["metrics"] == {"n_rows": 100, "n_flagged": 10}
    assert st["rows"] == 100


def test_corpus_curation_pipeline_runs_and_resumes(spark, tmp_path):
    """End-to-end curated corpus: quality/lang filter -> dedup components
    -> canonical -> split, with manifest metrics; a re-run is a no-op
    (every stage fingerprint-cached, same manifest version)."""
    from gis_shapefile_spark.plans.pipelines import checkpointed_corpus_curation

    root = str(tmp_path / "curate")
    out, ck = checkpointed_corpus_curation(
        spark, "/root/testdata/sf0.001/documents.parquet", root
    )
    rows = out.collect()
    assert len(rows) > 0
    assert {r.split for r in rows} <= {"train", "val", "test"}
    m = ck.manifest()
    assert m["stages"]["scored"]["metrics"]["n_docs"] > 0
    assert (m["stages"]["canonical"]["metrics"]["n_canonical"]
            <= m["stages"]["filtered"]["metrics"]["n_kept"])
    v1 = m["version"]

    out2, ck2 = checkpointed_corpus_curation(
        spark, "/root/testdata/sf0.001/documents.parquet", root
    )
    assert ck2.manifest()["version"] == v1  # all stages cache-hit
    assert out2.count() == len(rows)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two same-bucketed tables equi-join with ZERO exchanges (co-located
    join) — the 10^12-row enrichment-join layout."""
    import re
    from pyspark.sql import functions as F
    from gis_shapefile_spark.plans import layout as L

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pts = spark.range(50000).select(
            F.col("id").alias("point_id"),
            F.pmod(F.col("id") * 2654435761, 50000).alias("cell"),
        )
        enrich = spark.range(50000).select(
            F.pmod(F.col("id") * 40503, 50000).alias("cell"),
            (F.col("id") % 7).alias("tag"),
        )
        L.write_bucketed(pts, "t_pts_b", "cell", 4,
                         path=str(tmp_path / "pts_b"))
        L.write_bucketed(enrich, "t_enr_b", "cell", 4,
                         path=str(tmp_path / "enr_b"))
        j = spark.table("t_pts_b").join(spark.table("t_enr_b"), "cell")
        assert j.count() > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"\bExchange hash", plan)) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_pts_b")
        spark.sql("DROP TABLE IF EXISTS t_enr_b")


def test_merge_upsert_three_arms(spark):
    """MERGE semantics: update replaces, insert appends, tombstone deletes
    — and a key absent from updates passes through untouched."""
    from gis_shapefile_spark.plans.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "dead", True), (9, "new", False)],
        "k long, v string, _del boolean",
    )
    got = {
        r.k: r.v
        for r in merge_upsert(target, updates, ["k"], delete_col="_del").collect()
    }
    assert got == {1: "a", 2: "B", 3: "c", 9: "new"}

    # tombstone for a key that never existed is a no-op insert-suppress
    upd2 = spark.createDataFrame([(77, "x", True)], "k long, v string, _del boolean")
    got2 = {r.k for r in merge_upsert(target, upd2, ["k"], delete_col="_del").collect()}
    assert got2 == {1, 2, 3, 4}

    # without delete_col the same frame upserts everything
    upd3 = spark.createDataFrame([(1, "A")], "k long, v string")
    got3 = {r.k: r.v for r in merge_upsert(target, upd3, ["k"]).collect()}
    assert got3 == {1: "A", 2: "b", 3: "c", 4: "d"}

    # reserved metadata names are rejected, not silently clobbered
    import pytest as _pytest

    bad = spark.createDataFrame([(1, "x", 0)], "k long, v string, _src int")
    with _pytest.raises(ValueError, match="reserves column names"):
        merge_upsert(target, bad, ["k"])
    with _pytest.raises(ValueError, match="reserves column names"):
        merge_upsert(target, upd3, ["k"], delete_col="_tomb")


def test_snapshot_diff_classifies_churn_only(spark):
    """CDC: insert/update/delete classified; unchanged keys absent;
    a NULL->value flip IS an update (null-safe compare, no row hashing)."""
    from gis_shapefile_spark.plans.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, "c", 30), (4, "d", 40)],
        "k long, v string, n long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "filled", 20), (4, "d", 41), (9, "new", 90)],
        "k long, v string, n long",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "update", 3: "delete", 4: "update", 9: "insert"}

    # compare_cols restriction: diff only on v -> key 4 becomes unchanged
    got2 = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()
    }
    assert got2 == {2: "update", 3: "delete", 9: "insert"}

    import pytest as _pytest

    bad = old.withColumnRenamed("v", "_in_old")
    with _pytest.raises(ValueError, match="reserves column names"):
        snapshot_diff(bad, new, ["k"])


def test_compact_rewrites_small_files_preserving_content(spark, tmp_path):
    """Compaction: a stage written as many tiny files collapses to the
    computed file count, rows/content identical, new manifest version;
    time travel still reads the pre-compaction layout; resume still
    short-circuits on the original fingerprint."""
    from gis_shapefile_spark.plans.checkpoint import CheckpointTable

    t = CheckpointTable(spark, str(tmp_path / "cp"))
    t.stage(
        "many", "fp",
        lambda: spark.range(10000).repartition(32).selectExpr("id", "id * 3 AS v"),
    )
    st0 = t.manifest()["stages"]["many"]
    assert len(st0["partitions"]) == 32
    v0 = t.manifest()["version"]
    before = sorted(r.id for r in t.read_stage("many").collect())

    entry = t.compact("many", target_bytes=st0["bytes"])  # -> 1 file
    assert len(entry["partitions"]) == 1
    assert entry["rows"] == st0["rows"] == 10000
    assert t.manifest()["version"] == v0 + 1
    after = sorted(r.id for r in t.read_stage("many").collect())
    assert before == after

    # time travel to the pre-compaction snapshot still sees 32 files' rows
    assert t.read_stage("many", version=v0).count() == 10000
    # resume: same (name, fingerprint) does NOT recompute
    calls = []
    t.stage("many", "fp", lambda: (calls.append(1), spark.range(1))[1])
    assert calls == []

    import pytest as _pytest

    with _pytest.raises(KeyError):
        t.compact("missing")


def test_merge_upsert_partitioned_touches_only_churned_partitions(spark, tmp_path):
    """Partition-scoped COW MERGE: untouched partition files are not
    rewritten (byte-identical on disk), touched partitions merge
    correctly, and a fully-deleted partition's directory is removed."""
    import glob
    import os
    from gis_shapefile_spark.plans.merge import merge_upsert_partitioned

    path = str(tmp_path / "ptab")
    base = spark.createDataFrame(
        [(k, k % 4, f"v{k}") for k in range(100)], "k long, p long, v string"
    )
    base.repartition(F.col("p")).write.partitionBy("p").parquet(path)

    def files_with_mtime(p):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/p={p}/*.parquet")
        }

    untouched_before = files_with_mtime(0)
    # updates touch p=1 (update k=1, insert k=101), p=2 (delete ALL keys)
    upd = spark.createDataFrame(
        [(1, 1, "V1", False), (101, 1, "new", False)]
        + [(k, 2, "x", True) for k in range(100) if k % 4 == 2],
        "k long, p long, v string, _del boolean",
    )
    touched = merge_upsert_partitioned(
        spark, path, upd, ["k"], "p", delete_col="_del"
    )
    assert touched == [1, 2]

    after = spark.read.parquet(path)
    got = {r.k: r.v for r in after.collect()}
    assert got[1] == "V1" and got[101] == "new"
    assert all(k % 4 != 2 for k in got if k < 100)  # p=2 emptied
    assert not os.path.isdir(f"{path}/p=2")
    # p=0 and p=3 rows intact, p=0 files untouched on disk
    assert sum(1 for k in got if k < 100 and k % 4 == 0) == 25
    assert files_with_mtime(0) == untouched_before
    # row count: 100 - 25 (p=2) + 1 insert
    assert after.count() == 76


def test_merge_upsert_partitioned_null_partition(spark, tmp_path):
    """NULL partition values: isin() never matches NULL, so the NULL
    partition's bystander rows need the explicit isNull arm — without it
    they'd be silently destroyed by the swap. Also covers mixed
    None/value sorting of the touched list."""
    import os

    from gis_shapefile_spark.plans.merge import merge_upsert_partitioned

    path = str(tmp_path / "ntab")
    base = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b"), (3, 7, "c"), (4, 8, "d")],
        "k long, p long, v string",
    )
    base.coalesce(1).write.partitionBy("p").parquet(path)
    assert os.path.isdir(f"{path}/p=__HIVE_DEFAULT_PARTITION__")

    # batch upserts k=1 in the NULL partition AND k=3 in p=7 (mixed
    # None/non-None touched values — bare sorted() would TypeError)
    upd = spark.createDataFrame(
        [(1, None, "A"), (3, 7, "C")], "k long, p long, v string"
    )
    touched = merge_upsert_partitioned(spark, path, upd, ["k"], "p")
    assert touched == [None, 7]

    got = {r.k: (r.p, r.v) for r in spark.read.parquet(path).collect()}
    assert got[1] == (None, "A")  # updated
    assert got[2] == (None, "b")  # NULL-partition bystander SURVIVES
    assert got[3] == (7, "C")
    assert got[4] == (8, "d")
    assert len(got) == 4


def test_merge_commit_journal_is_atomic(spark, tmp_path):
    """The intent journal must never exist in a truncated state: it is
    written to a temp file, fsynced, then renamed — and recover_merge on
    a valid journal completes the swap."""
    import json
    import os

    from gis_shapefile_spark.plans import merge as M

    path = str(tmp_path / "jtab")
    spark.createDataFrame(
        [(1, 0, "a")], "k long, p long, v string"
    ).coalesce(1).write.partitionBy("p").parquet(path)

    # intercept: no .tmp- file may remain after a merge, and the journal
    # observed mid-protocol (simulated crash before swap) must parse
    upd = spark.createDataFrame([(2, 0, "b")], "k long, p long, v string")
    orig_swap = M._apply_merge_swap
    seen = {}

    def crash_swap(*a, **kw):
        journal = f"{path}._merge_commit.json"
        with open(journal) as fh:
            seen["journal"] = json.load(fh)  # parses => complete JSON
        raise RuntimeError("crash before swap")

    M._apply_merge_swap = crash_swap
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="crash before swap"):
            M.merge_upsert_partitioned(spark, path, upd, ["k"], "p")
    finally:
        M._apply_merge_swap = orig_swap
    assert seen["journal"]["staged_dirs"] == ["p=0"]
    assert not [f for f in os.listdir(str(tmp_path)) if ".tmp-" in f]
    # next batch auto-recovers the crashed commit
    assert M.recover_merge(path) is True
    got = {r.k for r in spark.read.parquet(path).collect()}
    assert got == {1, 2}
    assert not os.path.exists(f"{path}._merge_commit.json")


def test_merge_upsert_partitioned_rejects_partition_moves(spark, tmp_path):
    """check_moves=True (round-2 verdict item 7): an update whose key
    already lives in a DIFFERENT touched partition raises instead of
    silently leaving a stale duplicate behind."""
    import pytest as _pytest

    from gis_shapefile_spark.plans.merge import merge_upsert_partitioned

    path = str(tmp_path / "ptab")
    base = spark.createDataFrame(
        [(k, k % 4, f"v{k}") for k in range(40)], "k long, p long, v string"
    )
    base.repartition(F.col("p")).write.partitionBy("p").parquet(path)

    # k=5 lives in p=1; this batch re-addresses it to p=2 (a move) while
    # also touching p=1 (so both partitions are in the pruned scan)
    upd = spark.createDataFrame(
        [(5, 2, "moved", False), (1, 1, "ok", False)],
        "k long, p long, v string, _del boolean",
    )
    with _pytest.raises(ValueError, match="partition moves"):
        merge_upsert_partitioned(
            spark, path, upd, ["k"], "p", delete_col="_del", check_moves=True
        )
    # table untouched after the refused merge
    assert spark.read.parquet(path).count() == 40

    # the legal encoding of the same move passes the check
    legal = spark.createDataFrame(
        [(5, 1, "x", True), (5, 2, "moved", False)],
        "k long, p long, v string, _del boolean",
    )
    merge_upsert_partitioned(
        spark, path, legal, ["k"], "p", delete_col="_del", check_moves=True
    )
    got = {(r.k, r.p): r.v for r in spark.read.parquet(path).collect()}
    assert got[(5, 2)] == "moved" and (5, 1) not in got


def test_merge_upsert_partitioned_staging_is_cleaned(spark, tmp_path):
    """The stage-and-swap commit leaves no staging dir, no journal, and
    no ._old partition dirs behind; re-running the same batch is
    idempotent (the documented crash recovery)."""
    import os

    from gis_shapefile_spark.plans.merge import merge_upsert_partitioned

    path = str(tmp_path / "ptab")
    spark.createDataFrame(
        [(k, k % 2, k) for k in range(20)], "k long, p long, v long"
    ).repartition(F.col("p")).write.partitionBy("p").parquet(path)

    upd = spark.createDataFrame(
        [(3, 1, 333, False), (100, 0, 100, False)],
        "k long, p long, v long, _del boolean",
    )
    for _ in range(2):  # second run = crash-recovery rerun, same result
        merge_upsert_partitioned(
            spark, path, upd, ["k"], "p", delete_col="_del"
        )
        got = {r.k: r.v for r in spark.read.parquet(path).collect()}
        assert got[3] == 333 and got[100] == 100 and len(got) == 21
    parent = os.path.dirname(path)
    leftovers = [
        n for n in os.listdir(parent)
        if "._staging-" in n or n.endswith("._merge_commit.json")
    ]
    assert leftovers == []
    assert not any("._old" in n for n in os.listdir(path))


def test_merge_upsert_partitioned_escaped_partition_values(spark, tmp_path):
    """String partition values Hive-escape on disk (p=a%2Fb); the swap
    uses staged directory names so merges work, and a full-delete of an
    escaped partition removes the right directory."""
    from gis_shapefile_spark.plans.merge import merge_upsert_partitioned

    path = str(tmp_path / "ptab")
    spark.createDataFrame(
        [(1, "a/b", 10), (2, "a/b", 20), (3, "plain", 30)],
        "k long, p string, v long",
    ).repartition(F.col("p")).write.partitionBy("p").parquet(path)

    upd = spark.createDataFrame(
        [(1, "a/b", 11, False)], "k long, p string, v long, _del boolean"
    )
    merge_upsert_partitioned(spark, path, upd, ["k"], "p", delete_col="_del")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: 11, 2: 20, 3: 30}

    # delete every row of the escaped partition -> its dir must vanish
    kill = spark.createDataFrame(
        [(1, "a/b", 0, True), (2, "a/b", 0, True)],
        "k long, p string, v long, _del boolean",
    )
    merge_upsert_partitioned(spark, path, kill, ["k"], "p", delete_col="_del")
    left = spark.read.parquet(path)
    assert {r.k for r in left.collect()} == {3}


def test_merge_recover_completes_mid_swap_crash(spark, tmp_path):
    """A crash between 'move old dir aside' and 'rename staged dir in'
    leaves the partition directory missing, the old copy preserved in
    the staging area, and the journal on disk. recover_merge (invoked
    automatically by the next merge batch) must complete the swap from
    the journal — no ._old dirs ever appear inside the table, and no
    pre-existing rows are lost."""
    import json
    import os
    import shutil

    from gis_shapefile_spark.plans.merge import (
        merge_upsert_partitioned,
        recover_merge,
    )

    path = str(tmp_path / "ptab")
    spark.createDataFrame(
        [(k, k % 2, k) for k in range(20)], "k long, p long, v long"
    ).repartition(F.col("p")).write.partitionBy("p").parquet(path)

    # build a real staged output for an update batch by running the merge
    # against a COPY, then transplant its staging shape to simulate the
    # crash against the original
    shadow = str(tmp_path / "shadow")
    shutil.copytree(path, shadow)
    upd = spark.createDataFrame(
        [(3, 1, 333, False), (100, 0, 100, False)],
        "k long, p long, v long, _del boolean",
    )
    merge_upsert_partitioned(spark, shadow, upd, ["k"], "p", delete_col="_del")

    # simulate: staged output durable, journal written, crash after p=1's
    # old dir moved aside but BEFORE the staged dir renamed in
    staging = path + "._staging-deadbeef"
    old_area = os.path.join(staging, "_old")
    os.makedirs(old_area)
    for d in ("p=0", "p=1"):
        shutil.copytree(os.path.join(shadow, d), os.path.join(staging, d))
    os.rename(os.path.join(path, "p=1"), os.path.join(old_area, "p=1"))
    with open(path + "._merge_commit.json", "w") as fh:
        json.dump({"staging": staging, "staged_dirs": ["p=0", "p=1"],
                   "deleted_dirs": [], "touched": ["0", "1"]}, fh)

    assert recover_merge(path) is True
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[3] == 333 and got[100] == 100 and len(got) == 21
    assert not os.path.exists(path + "._merge_commit.json")
    assert not os.path.isdir(staging)
    assert not any("._old" in n or "_old" == n for n in os.listdir(path))
    # idempotent: nothing pending now
    assert recover_merge(path) is False


def test_merge_upsert_randomized_vs_dict_oracle(spark):
    """Sequential randomized MERGE batches vs a plain dict oracle: after
    every batch the Spark table equals the dict (upserts and tombstones
    in arbitrary interleavings, incl. delete-then-reinsert of a key)."""
    import random

    from gis_shapefile_spark.plans.merge import merge_upsert

    rng = random.Random(2026)
    state = {}
    table = spark.createDataFrame([], "k long, v long")
    for batch in range(5):
        keys = rng.sample(range(30), rng.randint(3, 10))
        rows = []
        for k in keys:
            if rng.random() < 0.3:
                rows.append((k, 0, True))  # tombstone
                state.pop(k, None)
            else:
                v = rng.randint(0, 10**6)
                rows.append((k, v, False))
                state[k] = v
        upd = spark.createDataFrame(rows, "k long, v long, _del boolean")
        table = merge_upsert(table, upd, ["k"], delete_col="_del").localCheckpoint()
        got = {r.k: r.v for r in table.collect()}
        assert got == state, f"batch {batch} diverged"


def test_checkpointed_batch_formation_resumes(spark, root):
    from gis_shapefile_spark.plans.pipelines import (
        checkpointed_batch_formation,
    )
    from gis_shapefile_spark.sources import fixtures as FX

    path = FX.varied_images_parquet_path(n=300)
    m1, ck1 = checkpointed_batch_formation(spark, path, root, capacity=16384)
    rows1 = m1.collect()
    assert sum(r.n_images for r in rows1) == 300
    assert all(r.n_bytes <= 16384 for r in rows1)  # hard capacity
    v1 = ck1.manifest()["version"]
    assert v1 == 4

    # restart, same inputs/params: nothing recomputes, identical output
    m2, ck2 = checkpointed_batch_formation(spark, path, root, capacity=16384)
    assert ck2.manifest()["version"] == v1
    assert sorted(map(tuple, m2.collect()), key=str) == sorted(
        map(tuple, rows1), key=str
    )

    # retuning shard capacity re-packs WITHOUT re-decoding: exactly the
    # two packing stages recompute (2 new versions, not 4)
    m3, ck3 = checkpointed_batch_formation(spark, path, root, capacity=8192)
    assert ck3.manifest()["version"] == v1 + 2
    rows3 = m3.collect()
    assert sum(r.n_images for r in rows3) == 300
    assert all(r.n_bytes <= 8192 for r in rows3)

    # the manifest carries the in-flight metrics of every stage
    stages = ck3.manifest()["stages"]
    assert int(stages["verified"]["metrics"]["n_phash_ok"]) == 300
    assert int(stages["shard_manifest"]["metrics"]["n_shards"]) == len(rows3)
    assert int(stages["assigned"]["metrics"]["n_assigned"]) == 300
