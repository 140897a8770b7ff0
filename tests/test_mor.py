"""Merge-on-read equality deletes (plans/merge.py MoR section).

The COW MERGE path rewrites touched partitions; MoR commits O(batch)
delete files instead and defers the rewrite to ``mor_compact``. These
tests pin: anti-join read semantics (idempotent / no-op unknown keys),
the broadcast-anti-join plan shape, journaled crash-safe compaction
(flat and partition-pruned), key-set pinning, and that untouched
partitions are not rewritten by a pruned compaction.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gis_shapefile_spark.plans import merge as M


def _mk_flat(spark, path, n=50):
    spark.createDataFrame(
        [(k, f"v{k}") for k in range(n)], "k long, v string"
    ).write.parquet(path)


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "k long")


def test_mor_delete_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_flat(spark, path)
    M.mor_delete(spark, path, _keys(spark, [3, 7, 999]), ["k"])  # 999 absent
    got = sorted(r.k for r in M.mor_read(spark, path).collect())
    assert got == sorted(set(range(50)) - {3, 7})
    # bare scan still sees the deleted rows (documented hazard)
    assert spark.read.parquet(path).count() == 50
    # second batch stacks; duplicate keys across batches are harmless
    M.mor_delete(spark, path, _keys(spark, [7, 11]), ["k"])
    got = sorted(r.k for r in M.mor_read(spark, path).collect())
    assert got == sorted(set(range(50)) - {3, 7, 11})


def test_mor_read_no_deletes_is_plain_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=10)
    plan = M.mor_read(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no delete files -> no anti-join node


def test_mor_read_plan_is_broadcast_anti_join(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=10)
    M.mor_delete(spark, path, _keys(spark, [1]), ["k"])
    plan = M.mor_read(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_mor_keycol_pinning(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=10)
    M.mor_delete(spark, path, _keys(spark, [1]), ["k"])
    other = spark.createDataFrame([("v1",)], "v string")
    with pytest.raises(ValueError, match="keyed on"):
        M.mor_delete(spark, path, other, ["v"])
    with pytest.raises(ValueError, match="lacks key columns"):
        M.mor_delete(spark, path, other, ["k"])


def test_mor_compact_flat(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_flat(spark, path)
    M.mor_delete(spark, path, _keys(spark, [0, 1, 2]), ["k"])
    M.mor_delete(spark, path, _keys(spark, [40]), ["k"])
    assert M.mor_compact(spark, path) == 2
    # bare scan now equals the MoR view; delete files consumed
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == sorted(
        set(range(50)) - {0, 1, 2, 40}
    )
    assert M._mor_delete_dirs(path) == []
    plan = M.mor_read(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # no staging/journal leftovers; key pin dropped so a future batch may
    # re-key
    parent = os.path.dirname(path)
    assert not any("._mor_" in n for n in os.listdir(parent))
    assert M._mor_keycols(path) is None
    assert M.mor_compact(spark, path) == 0  # nothing left to fold


def test_mor_compact_partitioned_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(k, k % 4, f"v{k}") for k in range(80)], "k long, p long, v string"
    ).repartition(F.col("p")).write.partitionBy("p").parquet(path)
    untouched = os.path.join(path, "p=3")
    before = sorted(os.listdir(untouched))
    mtimes = {f: os.stat(os.path.join(untouched, f)).st_mtime_ns for f in before}

    # partition-scoped delete keys: (k, p)
    dels = spark.createDataFrame(
        [(4, 0), (5, 1), (9, 1)], "k long, p long"
    )
    M.mor_delete(spark, path, dels, ["k", "p"])
    assert M.mor_compact(spark, path, part_col="p") == 1
    got = sorted(r.k for r in spark.read.parquet(path).collect())
    assert got == sorted(set(range(80)) - {4, 5, 9})
    # untouched partition dir was not rewritten (same files, same mtimes)
    assert sorted(os.listdir(untouched)) == before
    assert all(
        os.stat(os.path.join(untouched, f)).st_mtime_ns == mtimes[f]
        for f in before
    )


def test_mor_compact_partitioned_full_partition_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(k, k % 2) for k in range(10)], "k long, p long"
    ).repartition(F.col("p")).write.partitionBy("p").parquet(path)
    dels = spark.createDataFrame(
        [(k, 1) for k in range(10) if k % 2 == 1], "k long, p long"
    )
    M.mor_delete(spark, path, dels, ["k", "p"])
    M.mor_compact(spark, path, part_col="p")
    assert not os.path.isdir(os.path.join(path, "p=1"))
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == [
        0, 2, 4, 6, 8,
    ]


def test_mor_compact_partitioned_requires_scoped_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(k, k % 2) for k in range(10)], "k long, p long"
    ).repartition(F.col("p")).write.partitionBy("p").parquet(path)
    M.mor_delete(spark, path, _keys(spark, [1]), ["k"])  # global key
    with pytest.raises(ValueError, match="cannot prune"):
        M.mor_compact(spark, path, part_col="p")
    with pytest.raises(ValueError, match="hive-partitioned"):
        M.mor_compact(spark, path)  # flat mode refuses partitioned tables
    # a global-key backlog compacts with the full partition-preserving
    # rewrite
    assert M.mor_compact(spark, path, part_col="p", prune=False) == 1
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == [
        0, 2, 3, 4, 5, 6, 7, 8, 9,
    ]
    assert sorted(os.listdir(path))[-2:] == ["p=0", "p=1"]


def test_mor_compact_crash_before_apply_recovers(spark, tmp_path, monkeypatch):
    """Crash after the journal commits but before any rename: the journal
    must parse, mor_read must refuse the half-committed table, and
    recover_mor must complete the fold idempotently."""
    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=20)
    M.mor_delete(spark, path, _keys(spark, [2, 4]), ["k"])

    seen = {}

    def crash_apply(p, j):
        with open(M._mor_journal(path)) as fh:
            seen["journal"] = json.load(fh)  # parses => complete JSON
        raise RuntimeError("crash before apply")

    monkeypatch.setattr(M, "_apply_mor_compact", crash_apply)
    with pytest.raises(RuntimeError, match="crash before apply"):
        M.mor_compact(spark, path)
    monkeypatch.undo()

    assert seen["journal"]["mode"] == "flat"
    with pytest.raises(RuntimeError, match="pending compaction journal"):
        M.mor_read(spark, path)
    assert M.recover_mor(path) is True
    assert M.recover_mor(path) is False  # idempotent
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == sorted(
        set(range(20)) - {2, 4}
    )
    assert M._mor_delete_dirs(path) == []


def test_mor_compact_crash_mid_swap_recovers(spark, tmp_path):
    """Replay from a journal whose swap already part-ran (old files moved
    out, staged files not yet in) must still converge to the folded
    table — every apply step is an existence-checked rename."""
    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=20)
    M.mor_delete(spark, path, _keys(spark, [0]), ["k"])

    real_apply = M._apply_mor_compact
    state = {}

    def partial_apply(p, j):
        # simulate: move ONE old data file out, then crash
        staging = j["staging"]
        old_area = os.path.join(staging, "_old")
        os.makedirs(old_area, exist_ok=True)
        f = j["old_files"][0]
        src = os.path.join(p, f)
        if os.path.isfile(src):
            os.rename(src, os.path.join(old_area, f))
        state["j"] = j
        raise RuntimeError("crash mid swap")

    M._apply_mor_compact = partial_apply
    try:
        with pytest.raises(RuntimeError, match="crash mid swap"):
            M.mor_compact(spark, path)
    finally:
        M._apply_mor_compact = real_apply

    assert M.recover_mor(path) is True
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == list(
        range(1, 20)
    )


def test_mor_delete_tagged_replay_short_circuits(spark, tmp_path):
    """A tagged delete commit is idempotent: the second commit with the
    same tag publishes nothing new, even with DIFFERENT keys (the marker
    dir is the replay guard, mirroring a foreachBatch retry that re-runs
    with the same batch id)."""
    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=20)
    p1 = M.mor_delete(spark, path, _keys(spark, [1, 2]), ["k"], tag="b1")
    p2 = M.mor_delete(spark, path, _keys(spark, [3, 4]), ["k"], tag="b1")
    assert p1 == p2
    assert len(M._mor_delete_dirs(path)) == 1
    got = sorted(r.k for r in M.mor_read(spark, path).collect())
    assert got == sorted(set(range(20)) - {1, 2})  # first commit wins


def test_streaming_takedown_sink(spark, tmp_path):
    """Three stream runs over a growing takedown feed: survivors via
    mor_read match the cumulative key set after each run, a no-new-files
    rerun commits no new delete file, mid-stream compaction folds the
    backlog without disturbing later batches, and a replayed batch id
    short-circuits on its marker."""
    import os

    from gis_shapefile_spark.streaming.takedown_stream import (
        streaming_takedown_sink,
    )

    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=60)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed, exist_ok=True)

    def push(ks, part):
        _keys(spark, ks).coalesce(1).write.parquet(
            f"{feed}/part={part}", mode="overwrite"
        )

    def run():
        stream = spark.readStream.schema("k long").option(
            "recursiveFileLookup", "true"
        ).parquet(feed)
        streaming_takedown_sink(spark, stream, path, ["k"], ckpt)

    gone: set[int] = set()
    for i, ks in enumerate([[1, 2, 3], [10, 11], [30]]):
        push(ks, i)
        run()
        gone.update(ks)
        got = sorted(r.k for r in M.mor_read(spark, path).collect())
        assert got == sorted(set(range(60)) - gone), f"after run {i}"
        if i == 1:
            # mid-stream maintenance: fold the backlog; later batches
            # keep committing against the compacted table
            assert M.mor_compact(spark, path) == 2
            assert spark.read.parquet(path).count() == 60 - len(gone)

    n_files = len(M._mor_delete_dirs(path))
    run()  # no new feed files -> no new delete file
    assert len(M._mor_delete_dirs(path)) == n_files


def test_streaming_takedown_survives_checkpoint_wipe(spark, tmp_path):
    """A wiped-and-recreated stream checkpoint restarts batch ids at 0;
    the marker tag must follow the checkpoint's persisted query id (new
    lineage => new tags) so the fresh run's keys are NOT silently
    swallowed by the old run's batch-0 marker."""
    import os
    import shutil

    from gis_shapefile_spark.streaming.takedown_stream import (
        streaming_takedown_sink,
    )

    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=30)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed, exist_ok=True)

    def run():
        stream = spark.readStream.schema("k long").option(
            "recursiveFileLookup", "true"
        ).parquet(feed)
        streaming_takedown_sink(spark, stream, path, ["k"], ckpt)

    _keys(spark, [1]).coalesce(1).write.parquet(f"{feed}/part=0")
    run()
    assert sorted(r.k for r in M.mor_read(spark, path).collect()) == sorted(
        set(range(30)) - {1}
    )
    # wipe the checkpoint; add NEW takedown keys; the fresh lineage's
    # batch 0 re-reads everything and MUST apply (old marker must not
    # short-circuit it)
    shutil.rmtree(ckpt)
    _keys(spark, [5, 6]).coalesce(1).write.parquet(f"{feed}/part=1")
    run()
    got = sorted(r.k for r in M.mor_read(spark, path).collect())
    assert got == sorted(set(range(30)) - {1, 5, 6})


def test_mor_random_op_sequence_matches_set_oracle(spark, tmp_path):
    """Model-based check of the whole MoR protocol: a deterministic
    pseudo-random interleaving of delete batches (known, unknown, and
    repeated keys), compactions, and reads must always equal a plain
    python set mirror — and a bare scan must equal it right after every
    compaction."""
    import random

    rng = random.Random(42)
    path = str(tmp_path / "t")
    n = 40
    _mk_flat(spark, path, n=n)
    alive = set(range(n))
    for step in range(12):
        op = rng.choice(["delete", "delete", "delete", "compact"])
        if op == "delete":
            ks = rng.sample(range(n + 10), rng.randint(1, 5))  # some absent
            M.mor_delete(spark, path, _keys(spark, ks), ["k"])
            alive -= set(ks)
        else:
            M.mor_compact(spark, path)
            assert sorted(
                r.k for r in spark.read.parquet(path).collect()
            ) == sorted(alive), f"bare scan after compact, step {step}"
            assert M._mor_delete_dirs(path) == []
        got = sorted(r.k for r in M.mor_read(spark, path).collect())
        assert got == sorted(alive), f"mor_read at step {step} ({op})"
    M.mor_compact(spark, path)
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == sorted(
        alive
    )


def test_mor_delete_is_atomic_publish(spark, tmp_path):
    """No .tmp- delete dir may remain after a commit, and the published
    dir name carries the delete- prefix the reader globs."""
    path = str(tmp_path / "t")
    _mk_flat(spark, path, n=5)
    out = M.mor_delete(spark, path, _keys(spark, [1]), ["k"])
    droot = os.path.join(path, M._DELETES_DIR)
    names = os.listdir(droot)
    assert os.path.basename(out) in names
    assert not any(n.startswith(".tmp-") for n in names)
    # the hidden _deletes dir is invisible to a bare recursive scan
    assert spark.read.parquet(path).columns == ["k", "v"]
