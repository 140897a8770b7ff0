"""Z-order clustered writes: file-level min/max footprints must shrink to
small rectangles (the data-skipping property), content round-trips, and
the sort key validates its ranges."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pytest

from gis_shapefile_spark.plans import layout as L

N = 40_000
FILES = 16


def _pdf(rng):
    return pd.DataFrame(
        {
            "rid": np.arange(N, dtype=np.int64),
            "x": rng.uniform(0.0, 100.0, N),
            "y": rng.uniform(0.0, 100.0, N),
        }
    )


def _file_boxes(path):
    """Per-file (xmin, xmax, ymin, ymax) from parquet footer statistics."""
    import pyarrow.parquet as pq

    boxes = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for g in range(md.num_row_groups):
            sx = md.row_group(g).column(names["x"]).statistics
            sy = md.row_group(g).column(names["y"]).statistics
            xmin, xmax = min(xmin, sx.min), max(xmax, sx.max)
            ymin, ymax = min(ymin, sy.min), max(ymax, sy.max)
        boxes.append((xmin, xmax, ymin, ymax))
    return boxes


def _overlapping(boxes, q):
    qx0, qx1, qy0, qy1 = q
    return sum(
        1
        for x0, x1, y0, y1 in boxes
        if x1 >= qx0 and x0 <= qx1 and y1 >= qy0 and y0 <= qy1
    )


def test_zorder_write_shrinks_file_footprints(spark, tmp_path):
    rng = np.random.default_rng(83)
    pdf = _pdf(rng)
    df = spark.createDataFrame(pdf)
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "rand")
    L.write_zordered(df, zpath, "x", "y", num_files=FILES)
    # baseline: hash-partitioned on the row id — value-agnostic layout
    df.repartition(FILES, "rid").write.parquet(rpath)

    zb = _file_boxes(zpath)
    rb = _file_boxes(rpath)
    assert len(zb) == FILES
    # every value-agnostic file spans ~the whole domain; z-ordered files
    # cover small rectangles: total z-order footprint area far below
    # baseline (the data-skipping property, measured from real footers)
    def area(boxes):
        return sum((x1 - x0) * (y1 - y0) for x0, x1, y0, y1 in boxes)

    assert area(zb) < area(rb) / 3
    # a selective box query overlaps a minority of z-ordered files but
    # essentially all baseline files
    q = (10.0, 20.0, 60.0, 70.0)  # 1% of the domain
    assert _overlapping(rb, q) >= FILES - 1
    assert _overlapping(zb, q) <= FILES // 2

    # content round-trips exactly
    got = (
        spark.read.parquet(zpath)
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["rid", "x", "y"]], pdf)


def test_zorder_measured_ranges_match_explicit(spark, tmp_path):
    rng = np.random.default_rng(89)
    pdf = _pdf(rng)
    df = spark.createDataFrame(pdf)
    p1 = str(tmp_path / "auto")
    p2 = str(tmp_path / "explicit")
    L.write_zordered(df, p1, "x", "y", num_files=4)
    L.write_zordered(
        df, p2, "x", "y",
        x_range=(float(pdf.x.min()), float(pdf.x.max())),
        y_range=(float(pdf.y.min()), float(pdf.y.max())),
        num_files=4,
    )
    a = spark.read.parquet(p1).toPandas().sort_values("rid").reset_index(drop=True)
    b = spark.read.parquet(p2).toPandas().sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_zorder_col_validates_ranges():
    with pytest.raises(ValueError):
        L.zorder_col("x", "y", (1.0, 1.0), (0.0, 1.0))


# ---------------------------------------------------------------------------
# Hilbert-curve clustered writes
# ---------------------------------------------------------------------------

def test_hilbert_unit_step_property():
    """The defining Hilbert invariant: consecutive indices are GRID
    NEIGHBORS (|dx| + |dy| == 1) — exhaustively at res 2-5, and the
    index is a bijection onto [0, 4^res)."""
    from gis_shapefile_spark.plans.layout import hilbert_d_numpy

    for res in (2, 3, 4, 5):
        n = 1 << res
        gx, gy = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_d_numpy(gx.ravel(), gy.ravel(), res)
        assert sorted(d.tolist()) == list(range(n * n))  # bijection
        order = np.argsort(d)
        xs, ys = gx.ravel()[order], gy.ravel()[order]
        steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
        assert (steps == 1).all()  # never a Z-curve diagonal jump


def test_hilbert_write_shrinks_file_footprints(spark, tmp_path):
    """Same data-skipping evidence as z-order, from real footers; the
    curve key is Arrow-batched at write time, the layout plain parquet."""
    rng = np.random.default_rng(83)
    pdf = _pdf(rng)
    df = spark.createDataFrame(pdf)
    hpath = str(tmp_path / "hilbert")
    rpath = str(tmp_path / "rand2")
    L.write_hilbert(df, hpath, "x", "y", num_files=FILES)
    df.repartition(FILES, "rid").write.parquet(rpath)

    hb = _file_boxes(hpath)
    rb = _file_boxes(rpath)
    assert len(hb) == FILES

    def area(boxes):
        return sum((x1 - x0) * (y1 - y0) for x0, x1, y0, y1 in boxes)

    assert area(hb) < area(rb) / 3
    q = (10.0, 20.0, 60.0, 70.0)
    assert _overlapping(rb, q) >= FILES - 1
    assert _overlapping(hb, q) <= FILES // 2

    got = (
        spark.read.parquet(hpath)
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["rid", "x", "y"]], pdf)
