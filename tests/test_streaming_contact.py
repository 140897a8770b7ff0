"""Continuous contact mining (streaming/contact_stream.py): streamed
micro-batches must converge to EXACTLY the batch ``co_movement``
answer, including out-of-order arrival within a bucket, and replay must
be a no-op (manifest-level exactly-once)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from gis_shapefile_spark.operators import trajectory as TJ
from gis_shapefile_spark.plans.checkpoint import CheckpointTable
from gis_shapefile_spark.streaming import contact_stream as CS

SRC = "/root/testdata/sf0.001/events.parquet"
DIST = 2.0
BUCKET_S = 86400
MIN_BUCKETS = 2

POS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def pos_dir(spark, tmp_path_factory):
    """Geotagged fixes split into 4 files => 4 micro-batches; the
    repartition scatters a bucket's fixes ACROSS batches, so the
    rep-merge min rule is genuinely exercised."""
    from gis_shapefile_spark import entry_queries_pipeline as EQP

    d = str(tmp_path_factory.mktemp("contact_stream") / "pos")
    (
        spark.read.parquet(SRC)
        .select(
            F.col("user_id").cast("long"),
            F.col("event_id").cast("long"),
            "ts",
            F.expr(EQP.TRAJ_LNG_SQL).alias("lng"),
            F.expr(EQP.TRAJ_LAT_SQL).alias("lat"),
        )
        .repartition(4)
        .write.parquet(d)
    )
    return d


def _stream(spark, pos_dir):
    return (
        spark.readStream.schema(POS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pos_dir)
    )


def _key(rows):
    return {
        (r.user_1, r.user_2): (r.n_buckets, r.min_dist_u, r.max_dist_u)
        for r in rows
    }


def test_streamed_contacts_equal_batch_and_replay_is_noop(spark, pos_dir, tmp_path):
    table = CheckpointTable(spark, str(tmp_path / "tbl"))
    ck = str(tmp_path / "ck")
    CS.streaming_contact_sink(
        spark, _stream(spark, pos_dir), table, "contacts",
        distance=DIST, bucket_s=BUCKET_S, checkpoint_dir=ck,
    )
    got = _key(
        CS.contact_rollup(table, "contacts", MIN_BUCKETS).collect()
    )
    static = spark.read.parquet(pos_dir)
    exp = _key(
        TJ.co_movement(
            static, distance=DIST, bucket_s=BUCKET_S,
            min_buckets=MIN_BUCKETS,
        ).collect()
    )
    assert got == exp
    assert len(got) > 0  # non-trivial on the sf0.001 fixture

    # replay with the SAME stream checkpoint: availableNow sees no new
    # files; state must be byte-identical (no double-merge)
    CS.streaming_contact_sink(
        spark, _stream(spark, pos_dir), table, "contacts",
        distance=DIST, bucket_s=BUCKET_S, checkpoint_dir=ck,
    )
    again = _key(
        CS.contact_rollup(table, "contacts", MIN_BUCKETS).collect()
    )
    assert again == got
