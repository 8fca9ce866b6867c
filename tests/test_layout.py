"""Z-order layout planning (operators/layout.py)."""

import pytest

from pyspark.sql import functions as F

from ocr_spark.operators.layout import zorder_code, zorder_layout


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_code_matches_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200),
           (128, 127), (42, 42)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = df.select("x", "y", zorder_code("x", "y").alias("z")).collect()
    for r in rows:
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_layout_bounds_both_dims(spark):
    # full 64x64 grid scaled into the 8-bit domain: every file under
    # z-order is a rectangle (span <= 64 on both dims with 16 files);
    # the linear layout leaves dim y at full width in every file
    pts = [(x * 4, y * 4) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = zorder_layout(df, "x", "y", bits=8, n_files=16).collect()
    z = [r for r in rows if r["layout"] == "zorder"]
    lin = [r for r in rows if r["layout"] == "linear"]
    assert len(z) == 16 and len(lin) == 16
    assert sum(r["n_rows"] for r in z) == 64 * 64
    # z-order: every file is a bounded 64x64 rectangle in BOTH dims
    assert all(r["span_x"] <= 63 and r["span_y"] <= 63 for r in z)
    # linear: y is unclustered — full-width span in every file
    assert all(r["span_y"] == 252 for r in lin)
    # the data-skipping payoff: a point predicate on y alone prunes
    # (via min/max footer stats) 12 of 16 z-order files and ZERO
    # linear files
    hit = lambda rows: sum(1 for r in rows
                           if r["min_y"] <= 100 <= r["max_y"])
    assert hit(z) == 4
    assert hit(lin) == 16


def test_zorder_layout_rejects_bad_n_files(spark):
    df = spark.createDataFrame([(1, 1)], "x int, y int")
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", bits=2, n_files=12)
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", bits=2, n_files=32)
