"""WebDataset-style tar shard sink + source for image+caption samples.

WebDataset (sequential .tar shards, one sample = same-key members like
``000017.img`` / ``000017.txt`` / ``000017.json``) is the de-facto
training-data format for image-text corpora: loaders stream shards
sequentially, so the TABLE → SHARD step is the last stage of every
curation pipeline, and SHARD → TABLE is how existing corpora enter it.
This module is that boundary, built on stdlib ``tarfile`` only.

Scale shape — both directions avoid moving image bytes through any
exchange (CLAUDE.md: binary payloads must not be repartitioned, measured
10x):

* ``write_shards``: one shard PER INPUT PARTITION via ``mapInPandas`` —
  rows stream from the scan straight into a tar on disk; no shuffle, no
  driver collection; parallelism = source splits (how the image table is
  already laid out). The emitted frame is the shard MANIFEST (shard
  path, sample/byte counts) — batch-bounded, collectable. Upstream
  stages control shard sizing by sizing the source partitions
  (``spark.sql.files.maxPartitionBytes`` / the checkpoint layer's
  compaction), which is where byte-based sizing belongs.
* ``read_shards_df``: the shard list parallelizes (one task per shard —
  the WebDataset contract makes the shard the unit of parallel I/O) and
  each task streams its tar's members back into Arrow batches.

Determinism: members are written in input order with pinned metadata
(mtime=0, uid/gid=0, no compression), so re-writing the same partition
yields byte-identical shards — the property the checkpoint layer's
fingerprint resume needs from any sink it guards.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession

_META_COLS = ("w", "h", "fmt", "phash")


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0  # pinned: byte-identical re-writes
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    return ti


def write_shards(
    images: DataFrame,
    out_dir: str,
    prefix: str = "shard",
) -> DataFrame:
    """Write one ``<prefix>-<partition:05d>.tar`` per input partition;
    returns the manifest DataFrame (shard string, n_samples long,
    n_bytes long) — execute it (collect/write) to run the export.

    Each sample ``<image_id>.img`` carries the encoded payload bytes
    verbatim (no re-encode — the sink must not touch pixel data),
    ``<image_id>.txt`` the caption (UTF-8), ``<image_id>.json`` the
    typed metadata (w, h, fmt, phash). Shards land via write-to-tmp +
    atomic rename, so a killed task (Spark re-runs it) never leaves a
    readable partial shard; a re-run task rewrites the SAME shard name
    with identical bytes (pinned tar metadata), so speculative/retried
    tasks are safe.
    """
    os.makedirs(out_dir, exist_ok=True)

    def pack(pdf_iter):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}.tar")
        # tmp is unique PER ATTEMPT: with speculation, two live attempts
        # of the same task sharing one tmp would interleave writes (and
        # the loser would keep writing into the published inode after
        # the winner's rename); per-attempt tmps + last-wins os.replace
        # of byte-identical output are race-free
        tmp = f"{path}.tmp-{ctx.taskAttemptId()}"
        n = 0
        nb = 0
        with tarfile.open(tmp, "w") as tar:
            for pdf in pdf_iter:
                for row in pdf.itertuples(index=False):
                    key = row.image_id
                    if "." in key:
                        raise ValueError(
                            f"write_shards: image_id {key!r} contains '.' — "
                            "WebDataset keys split on the last dot, so "
                            "dotted ids would mis-key on read; sanitize "
                            "ids before export"
                        )
                    payload = bytes(row.bytes)
                    cap = row.caption.encode("utf-8")
                    meta = json.dumps(
                        {c: _json_safe(getattr(row, c)) for c in _META_COLS},
                        sort_keys=True,
                    ).encode("utf-8")
                    for suffix, data in (
                        (".img", payload), (".txt", cap), (".json", meta)
                    ):
                        tar.addfile(
                            _tarinfo(key + suffix, len(data)),
                            io.BytesIO(data),
                        )
                    n += 1
                    nb += len(payload)
        if n == 0:
            os.remove(tmp)  # empty partition -> no shard
            return
        os.replace(tmp, path)
        yield pd.DataFrame(
            {"shard": [path], "n_samples": [n], "n_bytes": [nb]}
        )

    return images.mapInPandas(
        pack, schema="shard string, n_samples long, n_bytes long"
    )


def _json_safe(v):
    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def list_shards(out_dir: str, prefix: str = "shard") -> list[str]:
    if not os.path.isdir(out_dir):
        return []
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith(f"{prefix}-") and f.endswith(".tar")
    )


def read_shards_df(
    spark: SparkSession, out_dir: str, prefix: str = "shard"
) -> DataFrame:
    """Read WebDataset shards back as the image table (image_id, bytes,
    w, h, fmt, phash, caption) — one task per shard, streaming the tar;
    bytes and caption round-trip EXACTLY (asserted by the oracle query
    and the round-trip test: the sink/source pair must be lossless)."""
    shards = list_shards(out_dir, prefix)
    if not shards:
        raise FileNotFoundError(f"no {prefix}-*.tar shards under {out_dir}")
    # one shard per task: the shard IS the parallel I/O unit — built via
    # parallelize(numSlices=len(shards)), which slices the list exactly
    # one-per-partition (a hash repartition on the path string would
    # routinely double up shards in one task and leave others empty)
    paths = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(p,) for p in shards], len(shards)
        ),
        "path string",
    )

    def unpack(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for path in pdf["path"]:
                recs: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(path, "r") as tar:
                    for m in tar:
                        key, suffix = os.path.splitext(m.name)
                        if key not in recs:
                            recs[key] = {}
                            order.append(key)
                        recs[key][suffix] = tar.extractfile(m).read()
                rows = []
                for key in order:
                    r = recs[key]
                    missing = {".img", ".txt", ".json"} - set(r)
                    if missing:
                        raise ValueError(
                            f"read_shards_df: sample {key!r} in {path} is "
                            f"missing members {sorted(missing)} — not a "
                            "shard this sink wrote (foreign WebDataset "
                            "layouts need their own member mapping)"
                        )
                    meta = json.loads(r[".json"].decode("utf-8"))
                    rows.append(
                        {
                            "image_id": key,
                            "bytes": r[".img"],
                            "w": int(meta["w"]),
                            "h": int(meta["h"]),
                            "fmt": meta["fmt"],
                            "phash": int(meta["phash"]),
                            "caption": r[".txt"].decode("utf-8"),
                        }
                    )
                if rows:
                    yield pd.DataFrame(rows)

    return paths.mapInPandas(
        unpack,
        schema=(
            "image_id string, bytes binary, w int, h int, fmt string, "
            "phash long, caption string"
        ),
    )
