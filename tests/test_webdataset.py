"""WebDataset tar shard sink/source (sources/webdataset.py).

Pins: lossless round-trip (payload bytes, caption, typed metadata),
byte-identical re-writes (the determinism the fingerprint-resume layer
needs), one-shard-per-partition with no exchange in the write plan, and
atomic publish (no .tmp leftovers).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from gis_shapefile_spark.sources import fixtures as FX
from gis_shapefile_spark.sources import webdataset as W


def _images(spark, n=300):
    return spark.read.parquet(FX.images_parquet_path(n=n))


def test_roundtrip_exact(spark, tmp_path):
    out = str(tmp_path / "wds")
    src = _images(spark)
    manifest = W.write_shards(src, out).collect()
    assert sum(r.n_samples for r in manifest) == src.count()
    back = W.read_shards_df(spark, out)
    a = src.select(
        "image_id", F.sha2(F.col("bytes"), 256).alias("bsha"),
        "w", "h", "fmt", "phash", "caption",
    ).toPandas().sort_values("image_id").reset_index(drop=True)
    b = back.select(
        "image_id", F.sha2(F.col("bytes"), 256).alias("bsha"),
        "w", "h", "fmt", "phash", "caption",
    ).toPandas().sort_values("image_id").reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_rewrite_is_byte_identical(spark, tmp_path):
    """Same input partitioning -> same shard bytes (pinned tar metadata:
    mtime/uid/gid zeroed); a retried/speculative task is therefore safe."""
    o1, o2 = str(tmp_path / "a"), str(tmp_path / "b")
    src = _images(spark)
    W.write_shards(src, o1).collect()
    W.write_shards(src, o2).collect()
    s1, s2 = W.list_shards(o1), W.list_shards(o2)
    assert [os.path.basename(p) for p in s1] == [
        os.path.basename(p) for p in s2
    ] and s1
    for p1, p2 in zip(s1, s2):
        h1 = hashlib.sha256(open(p1, "rb").read()).hexdigest()
        h2 = hashlib.sha256(open(p2, "rb").read()).hexdigest()
        assert h1 == h2, os.path.basename(p1)


def test_one_shard_per_partition_no_exchange(spark, tmp_path):
    out = str(tmp_path / "wds")
    src = _images(spark)
    n_parts = src.rdd.getNumPartitions()
    manifest = W.write_shards(src, out)
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bytes never cross a shuffle
    rows = manifest.collect()
    assert len(rows) <= n_parts
    assert len(W.list_shards(out)) == len(rows)
    assert not any(".tmp" in f for f in os.listdir(out))
    # the read side assigns exactly one shard per task (parallelize
    # slicing, not hash repartition — which would double up shards)
    back = W.read_shards_df(spark, out)
    assert back.rdd.getNumPartitions() == len(rows)


def test_dotted_image_id_rejected(spark, tmp_path):
    """Ids containing '.' would mis-key on the read side (WebDataset
    splits member names on the last dot) — the writer must refuse."""
    import pytest

    df = spark.createDataFrame(
        [("bad.id", b"x", 1, 1, "raw", 0, "c")],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "phash long, caption string",
    )
    with pytest.raises(Exception, match="contains '\\.'"):
        W.write_shards(df, str(tmp_path / "w")).collect()


def test_streaming_wds_sink_exactly_once(spark, tmp_path):
    """Continuous shard export: 2 stream runs over a growing image feed
    — after each, reading ALL shards returns exactly the samples seen so
    far (no duplicates); a no-new-files rerun publishes nothing; a
    replayed batch id short-circuits on its existing shards."""
    from gis_shapefile_spark.streaming.wds_stream import streaming_wds_sink

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "wds_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed, exist_ok=True)
    src = _images(spark, n=120)

    def push(lo, hi, part):
        src.where(
            (F.expr("CAST(substr(image_id, 5) AS BIGINT)") >= lo)
            & (F.expr("CAST(substr(image_id, 5) AS BIGINT)") < hi)
        ).coalesce(1).write.parquet(f"{feed}/part={part}")

    def run():
        stream = spark.readStream.schema(src.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(feed)
        streaming_wds_sink(spark, stream, out, ckpt)

    push(0, 80, 0)
    run()
    back = W.read_shards_df(spark, out)
    assert back.count() == 80
    push(80, 120, 1)
    run()
    back = W.read_shards_df(spark, out).toPandas()
    assert len(back) == 120
    assert back.image_id.nunique() == 120  # no duplicate samples
    n_shards = len(W.list_shards(out))
    run()  # no new feed files -> nothing published
    assert len(W.list_shards(out)) == n_shards
    # full content parity with the source
    a = src.select("image_id", "caption").toPandas().sort_values(
        "image_id").reset_index(drop=True)
    b = back[["image_id", "caption"]].sort_values(
        "image_id").reset_index(drop=True)
    assert a.equals(b)


def test_read_missing_dir_raises(spark, tmp_path):
    import pytest

    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="no shard"):
        W.read_shards_df(spark, str(tmp_path / "empty"))
