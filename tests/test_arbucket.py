"""Aspect-ratio bucketing (operators/arbucket.py).

The assignment must (a) equal the pure-Python integer oracle row-for-row
on the varied-dims fixture, (b) equal the float log-ratio argmin wherever
the 1e6-scale floor leaves no tie (the mathematical definition it
integerizes), and (c) stay a zero-exchange scan-side projection.
"""

import math

import numpy as np
import pytest

from gis_shapefile_spark.operators import arbucket as AR
from gis_shapefile_spark.sources import fixtures as FX


def test_ladder_shape():
    ids = [b[0] for b in AR.LADDER]
    assert ids == list(range(1, 14))
    # constant-ish pixel budget: every bucket within 2^20 +- 13%
    for _, bw, bh in AR.LADDER:
        assert abs(bw * bh - 1024 * 1024) / (1024 * 1024) < 0.13


def test_assignment_matches_python_oracle(spark):
    path = FX.varied_images_parquet_path(n=300)
    images = spark.read.parquet(path)
    got = {
        r["image_id"]: (r["bucket_id"], r["bw"], r["bh"], r["cost_u"])
        for r in AR.assign_ar_buckets(images).collect()
    }
    pdf = FX.make_varied_images(300)
    assert len(got) == 300
    for _, row in pdf.iterrows():
        assert got[row["image_id"]] == AR.assign_ar_buckets_py(
            int(row["w"]), int(row["h"])
        ), (row["image_id"], int(row["w"]), int(row["h"]))


def test_integer_argmin_equals_log_argmin():
    # sweep a dense grid of dims; wherever the integerized costs have a
    # UNIQUE min, it must pick the same bucket as |log(ar) - log(bar)|
    rng = np.random.default_rng(7)
    for _ in range(500):
        w = int(rng.integers(8, 4097))
        h = int(rng.integers(8, 4097))
        bid, _, _, _ = AR.assign_ar_buckets_py(w, h)
        costs = [
            (AR._SCALE * max(w * bh, h * bw)) // min(w * bh, h * bw)
            for _, bw, bh in AR.LADDER
        ]
        if costs.count(min(costs)) > 1:
            continue  # floor tie: ladder-order break is the contract
        logd = [
            abs(math.log(w / h) - math.log(bw / bh)) for _, bw, bh in AR.LADDER
        ]
        assert AR.LADDER[int(np.argmin(logd))][0] == bid, (w, h)


def test_tie_break_and_extremes():
    assert AR.assign_ar_buckets_py(512, 512)[0] == 1  # square
    assert AR.assign_ar_buckets_py(4096, 512)[0] == 12  # AR 8 clamps wide
    assert AR.assign_ar_buckets_py(512, 4096)[0] == 13  # AR 1/8 clamps tall
    # exact ladder ratios map to themselves
    for bid, bw, bh in AR.LADDER:
        assert AR.assign_ar_buckets_py(bw, bh)[0] == bid


def test_zero_exchange_plan(spark):
    path = FX.varied_images_parquet_path(n=300)
    images = spark.read.parquet(path)
    plan = (
        AR.assign_ar_buckets(images)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # "*(1)" prefixes are whole-stage-codegen stage markers in this form
    assert "*(1) Project" in plan
    # column pruning: the scan must not read the binary payload
    assert "bytes" not in plan.split("ReadSchema")[1][:400]


def test_bucket_shard_composition(spark):
    """The claimed downstream stage: ar_bucket -> per-bucket hard-capacity
    shard packing via shard_pack(source_col="bucket_id") — training shards
    that never mix aspect buckets and never exceed the byte cap."""
    from pyspark.sql import functions as F

    from gis_shapefile_spark.operators.splits import shard_pack

    path = FX.varied_images_parquet_path(n=300)
    images = spark.read.parquet(path).withColumn("n_bytes", F.length("bytes"))
    assigned = AR.assign_ar_buckets(images, carry=("n_bytes",))
    capacity = 16384
    packed = shard_pack(
        assigned,
        size_col="n_bytes",
        order_col="image_id",
        source_col="bucket_id",
        capacity=capacity,
    ).toPandas()
    assert len(packed) == 300
    by_shard = packed.groupby(["bucket_id", "pack_block", "shard"])
    assert (by_shard["n_bytes"].sum() <= capacity).all()
    # a shard never mixes buckets (by construction of the grouping key)
    assert by_shard["bucket_id"].nunique().max() == 1


def test_resize_to_bucket_target(spark):
    """The stage after assignment: every image resizes to ITS OWN row's
    bucket dims (ladder scaled 1/32 so the fixture stays small; every
    ladder dim is divisible by 32, ratios preserved exactly). The output
    must land on the per-row targets with the stored-phash invariant
    intact and captions byte-exact."""
    from pyspark.sql import functions as F

    from gis_shapefile_spark.operators import multimodal as MM
    from gis_shapefile_spark.sources import fixtures as FXS

    path = FX.varied_images_parquet_path(n=120)
    images = spark.read.parquet(path)
    assigned = AR.assign_ar_buckets(images).select(
        "image_id",
        (F.col("bw") / 32).cast("int").alias("bw"),
        (F.col("bh") / 32).cast("int").alias("bh"),
    )
    with_targets = images.join(assigned, "image_id")
    out = MM.resize_to_target(with_targets).toPandas()
    assert len(out) == 120
    targets = {
        r["image_id"]: (r["bw"], r["bh"]) for r in assigned.collect()
    }
    src = FXS.make_varied_images(120).set_index("image_id")
    for _, row in out.iterrows():
        tw, th = targets[row["image_id"]]
        assert (row["w"], row["h"]) == (tw, th)
        dec = FXS.decode_image(row["bytes"], row["w"], row["h"], row["fmt"])
        assert dec.shape == (th, tw, 3)
        # stored-phash invariant survives the resize re-encode
        assert FXS.phash64(dec) == row["phash"]
        # nearest-pixel oracle against the original pixels
        s = src.loc[row["image_id"]]
        orig = FXS.decode_image(s["bytes"], int(s["w"]), int(s["h"]), s["fmt"])
        yi = (np.arange(th) * int(s["h"]) // th)
        xi = (np.arange(tw) * int(s["w"]) // tw)
        expect = orig[yi][:, xi]
        if s["fmt"] == "qz":  # lossy re-encode: 6-bit quantized match
            assert np.array_equal(dec >> 2 << 2, (expect >> 2 << 2))
        else:
            assert np.array_equal(dec, expect)
        assert row["caption"] == s["caption"]


def test_carry_columns(spark):
    path = FX.varied_images_parquet_path(n=300)
    images = spark.read.parquet(path)
    out = AR.assign_ar_buckets(images, carry=("fmt",))
    assert out.columns == ["image_id", "fmt", "bucket_id", "bw", "bh", "cost_u"]
