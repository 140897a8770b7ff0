"""Round-trip test of the vectorized shapefile source (SURVEY.md §5.5).

Writer -> reader -> original equality covers endianness (.shp/.shx
big-endian headers, little-endian payloads), part/ring offset splitting,
deleted-record semantics, and the reference's DBF coercion quirks
(0.0-on-empty numeric, T/t/Y/y logicals, trimmed strings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gis_shapefile_spark.sources import fixtures as FX
from gis_shapefile_spark.sources import shapefile as SHP

FIELDS = [
    ("NAME_1", "C", 32, 0),
    ("NUM_A", "N", 12, 3),
    ("FLAG_A", "L", 1, 0),
    ("DATE_A", "D", 8, 0),
]


def _attr(row, name):
    return {
        "NAME_1": str(row.get("NAME_1", "")),
        "NUM_A": row.get("num_raw", ""),
        "FLAG_A": row.get("flag_raw", "F"),
        "DATE_A": row.get("date_raw", ""),
    }[name]


@pytest.fixture(scope="module")
def shp_base(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("shp") / "states")
    pdf = FX.make_features()
    # raw DBF values exercising every coercion path
    raws_num = ["", "  12.5 ", "xx", "3"] * 14
    raws_flag = ["T", "t", "Y", "y", "F", "n", "0", " "] * 7
    raws_date = ["20240101", " 2024 ", ""] * 18
    pdf = pdf.assign(
        num_raw=raws_num[: len(pdf)],
        flag_raw=raws_flag[: len(pdf)],
        date_raw=raws_date[: len(pdf)],
    )
    SHP.write_shapefile(pdf, base, FIELDS, _attr)
    return base, pdf


def test_headers_and_info(shp_base):
    base, pdf = shp_base
    ds = SHP.ShapefileDataset(base)
    info = ds.info()
    assert info["n_records"] == len(pdf)
    assert info["shape_type"] == 5
    assert [f[0] for f in info["fields"]] == [f[0] for f in FIELDS]
    polys = pdf[pdf["shape_type"] > 0]
    assert info["bbox"][0] == pytest.approx(min(min(r) for r in polys["xs"]))


def test_roundtrip_geometry_exact(shp_base):
    base, pdf = shp_base
    got = SHP.ShapefileDataset(base).read_all()
    assert len(got) == len(pdf)
    for (_, a), (_, b) in zip(pdf.iterrows(), got.iterrows()):
        assert a["record_number"] == b["record_number"]
        assert a["shape_type"] == b["shape_type"]
        assert list(a["ring_sizes"]) == list(b["ring_sizes"])
        np.testing.assert_array_equal(
            np.asarray(a["xs"], float), np.asarray(b["xs"], float)
        )  # doubles survive bit-exact
        np.testing.assert_array_equal(
            np.asarray(a["ys"], float), np.asarray(b["ys"], float)
        )


def test_dbf_coercions(shp_base):
    base, pdf = shp_base
    got = SHP.ShapefileDataset(base).read_all()
    live = ~got["deleted"].values
    # Numeric: stod with 0.0 fallback on empty/parse error (341-351)
    exp_num = [
        0.0 if r.strip() in ("", "xx") else float(r) for r in pdf["num_raw"]
    ]
    np.testing.assert_allclose(got["NUM_A"].values[live], np.array(exp_num)[live])
    # Logical: true iff in {T,t,Y,y} (353-354)
    exp_flag = [r in ("T", "t", "Y", "y") for r in pdf["flag_raw"]]
    assert list(got["FLAG_A"].values[live]) == list(np.array(exp_flag)[live])
    # Date: trimmed string passthrough (356-358)
    exp_date = [r.strip() for r in pdf["date_raw"]]
    assert list(got["DATE_A"].values[live]) == list(np.array(exp_date)[live])
    # Character: trimmed
    assert list(got["NAME_1"].values[live]) == [
        s.strip() for s in pdf["NAME_1"].astype(str).values[live]
    ]


def test_deleted_record_semantics(shp_base):
    """Deletion flag '*': attributes emptied, geometry still emitted
    (shapefile_reader.cpp:320-323 + records loop 187-199)."""
    base, pdf = shp_base
    got = SHP.ShapefileDataset(base).read_all()
    del_rows = got[got["deleted"]]
    assert len(del_rows) == int(pdf["deleted"].sum()) > 0
    r = del_rows.iloc[0]
    assert len(r["xs"]) > 0  # geometry kept
    assert r["NAME_1"] == "" and r["NUM_A"] == 0.0 and not r["FLAG_A"]


def test_null_shape_row(shp_base):
    base, _ = shp_base
    got = SHP.ShapefileDataset(base).read_all()
    null_row = got[got["shape_type"] == 0].iloc[0]
    assert null_row["xs"] == [] and null_row["ring_sizes"] == []


def test_distributed_scan_matches_driver(spark, shp_base):
    base, pdf = shp_base
    df = SHP.read_shapefile_df(spark, base, batch_records=16)
    got = df.toPandas().sort_values("record_number").reset_index(drop=True)
    ref = (
        SHP.ShapefileDataset(base)
        .read_all()
        .sort_values("record_number")
        .reset_index(drop=True)
    )
    assert len(got) == len(ref) == len(pdf)
    for col in ("record_number", "shape_type", "deleted", "NAME_1", "DATE_A"):
        assert list(got[col]) == list(ref[col]), col
    np.testing.assert_allclose(got["NUM_A"].values, ref["NUM_A"].values)
    for a, b in zip(got["xs"], ref["xs"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bbox columns power S6 filtered scans via plain column predicates
    q = df.where(
        (df.minx <= -100.0) & (df.maxx >= -125.0)
        & (df.miny <= 50.0) & (df.maxy >= 24.0)
    )
    assert q.count() == int(
        (
            (ref["minx"] <= -100.0) & (ref["maxx"] >= -125.0)
            & (ref["miny"] <= 50.0) & (ref["maxy"] >= 24.0)
        ).sum()
    )


def test_reader_rejects_corrupt_inputs(tmp_path):
    """Corrupt/truncated shapefile sets fail with clean ValueError/IOError —
    never a hang, wrong data, or uncontrolled exception type (hypothesis
    byte fuzz over header and body mutations)."""
    import struct
    from hypothesis import given, settings, strategies as st
    from gis_shapefile_spark.sources import fixtures as FX
    from gis_shapefile_spark.sources.shapefile import ShapefileDataset

    base = str(tmp_path / "good")
    SHP.write_shapefile(FX.make_features().head(5), base, FIELDS, _attr)
    goods = {ext: open(base + ext, "rb").read() for ext in (".shp", ".shx", ".dbf")}

    @given(
        ext=st.sampled_from([".shp", ".shx", ".dbf"]),
        mode=st.sampled_from(["truncate", "flip"]),
        pos=st.integers(0, 99),
        byte=st.integers(0, 255),
    )
    @settings(max_examples=60, deadline=None)
    def fuzz(ext, mode, pos, byte):
        b2 = str(tmp_path / "fuzz")
        for e, data in goods.items():
            if e == ext:
                if mode == "truncate":
                    data = data[: min(pos, len(data) - 1)]
                else:
                    p = min(pos, len(data) - 1)
                    data = data[:p] + bytes([byte]) + data[p + 1:]
            with open(b2 + e, "wb") as f:
                f.write(data)
        try:
            ds = ShapefileDataset(b2)
            ds.read_all()
        except (ValueError, IOError):
            pass  # the reader's documented failure modes — nothing rawer
        # anything else (segfault would kill the process; wrong exception
        # types propagate and fail the test)

    fuzz()
