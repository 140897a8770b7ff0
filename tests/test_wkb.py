"""WKB codec: known-vector checks against the public OGC byte layout, exact
round-trips over the 51-state fixture (driver kernels AND the Spark
mapInPandas stages), and big-endian/multi-geometry decode acceptance."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gis_shapefile_spark.functions import wkb as W
from gis_shapefile_spark.sources import fixtures as FX


# ---------------------------------------------------------------------------
# known vectors (hand-assembled from the OGC 06-103r4 layout)
# ---------------------------------------------------------------------------

def test_point_known_hex():
    # POINT(1 2) little-endian: 01 01000000 + f8(1.0) + f8(2.0)
    expect = bytes.fromhex("0101000000") + struct.pack("<dd", 1.0, 2.0)
    got = W.encode_row(W.SHAPE_POINT, [1.0], [2.0], [1])
    assert got == expect
    st, xs, ys, sizes = W.decode_row(expect)
    assert st == W.SHAPE_POINT and xs[0] == 1.0 and ys[0] == 2.0 and sizes == [1]


def test_polygon_known_bytes():
    # 1-ring square: header 01 03000000 01000000, ring count 5, 5 coord pairs
    xs = [0.0, 4.0, 4.0, 0.0, 0.0]
    ys = [0.0, 0.0, 4.0, 4.0, 0.0]
    buf = W.encode_row(W.SHAPE_POLYGON, xs, ys, [5])
    assert buf[:9] == bytes.fromhex("010300000001000000")
    assert struct.unpack_from("<I", buf, 9)[0] == 5
    assert len(buf) == 9 + 4 + 5 * 16


def test_polyline_encodes_multilinestring():
    buf = W.encode_row(W.SHAPE_POLYLINE, [0, 1, 5, 6], [0, 1, 5, 7], [2, 2])
    assert buf[:4] == bytes.fromhex("01050000")  # little-endian MultiLineString
    st, xs, ys, sizes = W.decode_row(buf)
    assert st == W.SHAPE_POLYLINE and sizes == [2, 2]
    assert list(xs) == [0, 1, 5, 6] and list(ys) == [0, 1, 5, 7]


def test_bigendian_point_decode():
    buf = b"\x00" + struct.pack(">I", W.WKB_POINT) + struct.pack(">dd", 3.5, -7.25)
    st, xs, ys, _ = W.decode_row(buf)
    assert st == W.SHAPE_POINT and xs[0] == 3.5 and ys[0] == -7.25


def test_bare_linestring_and_multipolygon_decode():
    ls = struct.pack("<BII", 1, W.WKB_LINESTRING, 3) + struct.pack(
        "<6d", 0, 0, 1, 1, 2, 0
    )
    st, xs, _, sizes = W.decode_row(ls)
    assert st == W.SHAPE_POLYLINE and sizes == [3] and list(xs) == [0, 1, 2]

    poly = W.encode_row(W.SHAPE_POLYGON, [0, 1, 1, 0], [0, 0, 1, 0], [4])
    mp = struct.pack("<BII", 1, W.WKB_MULTIPOLYGON, 2) + poly + poly
    st, xs, ys, sizes = W.decode_row(mp)
    assert st == W.SHAPE_POLYGON and sizes == [4, 4] and len(xs) == 8


def test_null_and_unsupported():
    assert W.decode_row(None)[0] == 0
    assert W.encode_row(0, [], [], []) is None
    with pytest.raises(ValueError):
        W.decode_row(struct.pack("<BI", 1, 7))  # GeometryCollection


# ---------------------------------------------------------------------------
# fixture round-trips (driver kernel + Spark stages)
# ---------------------------------------------------------------------------

def test_roundtrip_states_driver():
    feats = FX.make_features()
    for _, row in feats.iterrows():
        if row["shape_type"] != W.SHAPE_POLYGON:
            continue
        buf = W.encode_row(
            row["shape_type"], row["xs"], row["ys"], row["ring_sizes"]
        )
        st, xs, ys, sizes = W.decode_row(buf)
        assert st == row["shape_type"]
        assert sizes == [int(s) for s in row["ring_sizes"]]
        np.testing.assert_array_equal(xs, np.asarray(row["xs"], np.float64))
        np.testing.assert_array_equal(ys, np.asarray(row["ys"], np.float64))


def test_spark_roundtrip_stages(spark):
    feats = spark.read.parquet(FX.features_parquet_path())
    tagged = W.with_wkb(feats)
    back = W.from_wkb(
        tagged.select("record_number", "wkb"), keep=["record_number"]
    )
    orig = {
        r["record_number"]: r
        for r in feats.select(
            "record_number", "shape_type", "xs", "ys", "ring_sizes",
            "minx", "miny", "maxx", "maxy",
        ).collect()
    }
    got = back.collect()
    assert len(got) == len(orig)
    for r in got:
        o = orig[r["record_number"]]
        if not o["xs"]:
            # null-shape rows carry no WKB; decode maps them to shape_type 0
            assert r["shape_type"] == 0 and r["minx"] is None
            continue
        assert r["shape_type"] == o["shape_type"]
        assert list(r["ring_sizes"]) == list(o["ring_sizes"])
        np.testing.assert_array_equal(np.array(r["xs"]), np.array(o["xs"]))
        np.testing.assert_array_equal(np.array(r["ys"]), np.array(o["ys"]))
        assert r["minx"] == o["minx"] and r["maxy"] == o["maxy"]


# ---------------------------------------------------------------------------
# property: encode∘decode == identity for arbitrary geometries
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

finite = st.floats(-1e9, 1e9, allow_nan=False, width=64)


@given(
    shape=st.sampled_from([W.SHAPE_POLYLINE, W.SHAPE_POLYGON]),
    rings=st.lists(
        st.lists(st.tuples(finite, finite), min_size=2, max_size=12),
        min_size=1,
        max_size=5,
    ),
)
@settings(max_examples=200, deadline=None)
def test_property_roundtrip_multi_part(shape, rings):
    xs = np.array([p[0] for r in rings for p in r])
    ys = np.array([p[1] for r in rings for p in r])
    sizes = [len(r) for r in rings]
    buf = W.encode_row(shape, xs, ys, sizes)
    st2, xs2, ys2, sizes2 = W.decode_row(buf)
    assert st2 == shape and sizes2 == sizes
    np.testing.assert_array_equal(xs2, xs)
    np.testing.assert_array_equal(ys2, ys)


@given(x=finite, y=finite)
@settings(max_examples=100, deadline=None)
def test_property_roundtrip_point(x, y):
    st2, xs2, ys2, sizes = W.decode_row(W.encode_row(W.SHAPE_POINT, [x], [y], [1]))
    assert st2 == W.SHAPE_POINT and xs2[0] == x and ys2[0] == y and sizes == [1]


def test_truncated_wkb_raises_valueerror():
    buf = W.encode_row(W.SHAPE_POLYGON, [0, 1, 1, 0], [0, 0, 1, 0], [4])
    with pytest.raises(ValueError, match="truncated|malformed"):
        W.decode_row(buf[:20])
    with pytest.raises(ValueError, match="unsupported WKB"):
        W.decode_row(struct.pack("<BI", 1, 0x80000002) + b"\x00" * 48)
