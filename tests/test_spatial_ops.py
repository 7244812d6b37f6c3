"""r9 wave-3 operators: Hilbert clustering key, geohash encoding, and the
grid-bucketed spatial join — curve invariants, the textbook-bisection
equivalence, and brute-force containment."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_hilbert_reference_is_a_true_hilbert_curve():
    # bijective over the grid AND every consecutive d moves exactly one
    # cell — the locality property Z-order lacks (its seams jump)
    from stackstac_spark.operators.storage import _hilbert_xy2d_py

    n = 16
    cells = {}
    for x in range(n):
        for y in range(n):
            cells[_hilbert_xy2d_py(4, x, y)] = (x, y)
    assert sorted(cells) == list(range(n * n))
    for d in range(n * n - 1):
        x1, y1 = cells[d]
        x2, y2 = cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_key_matches_reference(spark):
    from stackstac_spark.operators.storage import _hilbert_xy2d_py, hilbert_key

    # pin ranges so quantization is the identity on [0, 15]
    rows = [(i, float(i % 16), float((i * 7) % 16)) for i in range(256)]
    df = spark.createDataFrame(rows, ["rid", "x", "y"])
    out = hilbert_key(
        df, ["x", "y"], bits=4, ranges={"x": (0.0, 16.0), "y": (0.0, 16.0)}
    ).collect()
    for r in out:
        qx, qy = int(r["x"] * 16 / 16), int(r["y"] * 16 / 16)
        assert r["hilbert"] == _hilbert_xy2d_py(4, qx, qy), (r["x"], r["y"])


def test_hilbert_key_validation(spark):
    from stackstac_spark.operators.storage import hilbert_key

    df = spark.createDataFrame([(1.0, 2.0, 3.0)], ["a", "b", "c"])
    with pytest.raises(ValueError):
        hilbert_key(df, ["a", "b", "c"])
    with pytest.raises(ValueError):
        hilbert_key(df, ["a", "b"], bits=0)


def _geohash_bisect(lat, lon, precision):
    """Textbook bisection reference."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = [], [], True
    while len(bits) < 5 * precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            bits.append(1)
            rng[0] = mid
        else:
            bits.append(0)
            rng[1] = mid
        even = not even
    for k in range(precision):
        idx = 0
        for m in range(5):
            idx = (idx << 1) | bits[5 * k + m]
        out.append(alpha[idx])
    return "".join(out)


def test_geohash_known_vector(spark):
    from stackstac_spark.operators.spatial import geohash_encode

    df = spark.createDataFrame([(57.64911, 10.40744)], ["lat", "lon"])
    got = df.select(geohash_encode(F.col("lat"), F.col("lon"), 11).alias("g")).first()["g"]
    assert got == "u4pruydqqvj"  # the classic geohash.org example


def test_geohash_matches_bisection_reference(spark):
    import random

    from stackstac_spark.operators.spatial import geohash_encode

    rng = random.Random(31)
    rows = [(rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9)) for _ in range(200)]
    df = spark.createDataFrame(rows, ["lat", "lon"])
    got = df.select(
        "lat", "lon", geohash_encode(F.col("lat"), F.col("lon"), 6).alias("g")
    ).collect()
    for r in got:
        assert r["g"] == _geohash_bisect(r["lat"], r["lon"], 6), (r["lat"], r["lon"])


def test_grid_spatial_join_vs_brute(spark):
    import random

    from stackstac_spark.operators.spatial import grid_spatial_join

    rng = random.Random(13)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(300)]
    rects = [
        (j, x0, y0, x0 + rng.uniform(1, 25), y0 + rng.uniform(1, 25))
        for j, (x0, y0) in enumerate(
            (rng.uniform(0, 80), rng.uniform(0, 80)) for _ in range(12)
        )
    ]
    p = spark.createDataFrame(pts, ["point_id", "x", "y"])
    r = spark.createDataFrame(rects, ["rect_id", "xmin", "ymin", "xmax", "ymax"])
    got = {
        (row["rect_id"], row["point_id"])
        for row in grid_spatial_join(p, r, cell_size=7.0).collect()
    }
    want = {
        (j, i)
        for j, xmin, ymin, xmax, ymax in rects
        for i, x, y in pts
        if xmin <= x <= xmax and ymin <= y <= ymax
    }
    assert got == want
    # edges are inclusive
    p2 = spark.createDataFrame([(1, 5.0, 5.0)], ["point_id", "x", "y"])
    r2 = spark.createDataFrame([(9, 5.0, 5.0, 10.0, 10.0)], ["rect_id", "xmin", "ymin", "xmax", "ymax"])
    assert grid_spatial_join(p2, r2, cell_size=3.0).count() == 1


def test_grid_spatial_join_guards(spark):
    from stackstac_spark.operators.spatial import grid_spatial_join

    p = spark.createDataFrame([(1, 0.0, 0.0)], ["point_id", "x", "y"])
    bad = spark.createDataFrame([(1, 5.0, 5.0, 1.0, 9.0)], ["rect_id", "xmin", "ymin", "xmax", "ymax"])
    with pytest.raises(ValueError, match="min > max"):
        grid_spatial_join(p, bad, cell_size=1.0)
    wide = spark.createDataFrame([(1, 0.0, 0.0, 1e6, 1e6)], ["rect_id", "xmin", "ymin", "xmax", "ymax"])
    with pytest.raises(ValueError, match="grid cells"):
        grid_spatial_join(p, wide, cell_size=1.0)
    with pytest.raises(ValueError):
        grid_spatial_join(p, wide, cell_size=0.0)
