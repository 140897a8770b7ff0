"""Parse the REAL reference data files (external-bytes validation).

/root/reference/data ships genuine GADM 4.1 USA shapefile sets
(gadm41_USA_{0,1,2}.dbf/.shx/.prj/.cpg — only the .shp payloads are
stripped). Every other reader test round-trips through the repo's own
synthetic writer (sources/fixtures.py), and a writer/reader pair can
share a wrong assumption; these tests anchor the .shx and .dbf paths
(S2/S3/S11) to bytes the repo did not produce:

- record counts 1 / 51 / 3148 — the level-2 count is the reference
  README's own golden number (/root/reference/README.md:82 "Total
  Records: 3148", printed by its geocoder_stats over this exact file);
- the 51 NAME_1 values are the actual US state names the reference
  geocoder indexes (geocoder.cpp builds its key index from NAME_1);
- the geocode key dimension builds from the REAL NAME_1 column.

No SparkSession needed — header/DBF decode is driver-side planning work.
"""

import os
import struct

import numpy as np
import pytest

from gis_shapefile_spark.operators import geocode as GC
from gis_shapefile_spark.sources import fixtures as FX
from gis_shapefile_spark.sources.shapefile import ShapefileDataset

DATA = "/root/reference/data"
pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/gadm41_USA_1.shx"),
    reason="reference data files not present",
)


def test_real_shx_headers_and_golden_counts():
    expected = {0: 1, 1: 51, 2: 3148}  # 3148 = README.md:82 golden count
    for lvl, n in expected.items():
        ds = ShapefileDataset(f"{DATA}/gadm41_USA_{lvl}")
        info = ds.info()
        assert info["n_records"] == n
        assert info["shape_type"] == 5  # polygon
        # GADM USA bbox: Aleutians cross the antimeridian westward and
        # eastward, Key West to Point Barrow north-south
        minx, miny, maxx, maxy = info["bbox"]
        assert -180.0 < minx < -179.0 and 179.0 < maxx < 180.0
        assert 18.0 < miny < 19.0 and 72.0 < maxy < 73.0
        # offset table sanity: strictly increasing, positive lengths,
        # first record right after the 100-byte header
        assert ds.offsets[0] == 100
        assert (np.diff(ds.offsets) > 0).all()
        assert (ds.lengths > 0).all()


def test_real_dbf_level1_schema_and_state_names():
    ds = ShapefileDataset(f"{DATA}/gadm41_USA_1")
    field_names = [f[0] for f in ds.fields]
    assert field_names == [
        "GID_1", "GID_0", "COUNTRY", "NAME_1", "VARNAME_1", "NL_NAME_1",
        "TYPE_1", "ENGTYPE_1", "CC_1", "HASC_1", "ISO_1",
    ]
    assert all(f[1] == "C" for f in ds.fields)  # all character fields
    pdf = ds.decode_dbf_batch(0, ds.n_records)
    assert len(pdf) == 51
    assert not pdf["deleted"].any()
    assert (pdf["GID_0"] == "USA").all()
    assert (pdf["COUNTRY"] == "United States").all()
    # the 51 real NAME_1 values ARE the engine's state-name universe
    # (50 states + DC) — the synthetic fixture list matches reality
    assert sorted(pdf["NAME_1"]) == FX.STATE_NAMES
    assert set(FX.STATE_ABBREV.values()) == set(pdf["NAME_1"])


def test_real_dbf_level2_counts_partition_by_state():
    ds = ShapefileDataset(f"{DATA}/gadm41_USA_2")
    pdf = ds.decode_dbf_batch(0, ds.n_records)
    assert len(pdf) == 3148
    assert pdf["NAME_1"].nunique() == 51  # every county rolls to a state
    assert (pdf["NAME_2"].str.len() > 0).all()
    # spot-check well-known county counts against public GADM facts
    by_state = pdf.groupby("NAME_1").size()
    assert by_state["Texas"] == 254
    assert by_state["Delaware"] == 3
    assert by_state["District of Columbia"] == 1


def test_real_dbf_batched_reads_match_full_scan():
    """Random-access batch decode (S4) over real bytes: stitching
    arbitrary [start, stop) windows equals the full scan."""
    import pandas as pd

    ds = ShapefileDataset(f"{DATA}/gadm41_USA_2")
    full = ds.decode_dbf_batch(0, ds.n_records)
    cuts = [0, 7, 512, 513, 2000, ds.n_records]
    parts = [ds.decode_dbf_batch(a, b) for a, b in zip(cuts, cuts[1:])]
    stitched = pd.concat(parts, ignore_index=True)
    pd.testing.assert_frame_equal(stitched, full)


def test_geocode_dimension_builds_from_real_name1():
    """The forward-geocode key dimension (geocoder.cpp key index) built
    from the REAL NAME_1 attribute column: every state name and every
    2-letter abbreviation expansion resolves to exactly one record."""
    ds = ShapefileDataset(f"{DATA}/gadm41_USA_1")
    pdf = ds.decode_dbf_batch(0, ds.n_records)
    feats = pdf.copy()
    feats["record_number"] = range(1, len(feats) + 1)
    feats["shape_type"] = 5
    # .shp payloads are stripped upstream: bbox placeholders — the key
    # dimension's text index is what's under test, not the centroids
    for c in ("minx", "miny", "maxx", "maxy"):
        feats[c] = 0.0
    dim = GC.build_key_dimension(feats)
    assert dim["record_number"].nunique() == 51
    norm_keys = set(dim["key"])
    for name in FX.STATE_NAMES:
        assert GC._normalize_py(name) in norm_keys
    # a real lookup the reference README demos: "California"
    cal = dim[dim["key"] == GC._normalize_py("California")]
    assert len(cal) == 1 and cal.iloc[0]["name_1"] == "California"
