"""r8 wave-3 operators: histogram-CDF percentile calibration, terrain
slope/aspect, LSH S-curve tuning."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_histogram_cdf_monotone_and_bounded(spark):
    from stackstac_spark.operators.textstats import histogram_cdf

    df = spark.createDataFrame([(i, float(i)) for i in range(200)], ["id", "s"])
    out = histogram_cdf(df, "s", bins=16).orderBy("s").collect()
    pcts = [r["pct_est"] for r in out]
    assert all(0.0 <= p <= 1.0 + 1e-12 for p in pcts)
    assert pcts == sorted(pcts)  # monotone in the score
    # uniform data: histogram CDF is near-exact
    for r in out:
        exact = (r["s"] - 0.0) / 199.0
        assert abs(r["pct_est"] - exact) < 0.08


def test_histogram_cdf_nulls_and_constant(spark):
    from pyspark.sql import types as T

    from stackstac_spark.operators.textstats import histogram_cdf

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.DoubleType())]
    )
    df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, None)], schema)
    rows = {r["id"]: r["pct_est"] for r in histogram_cdf(df, "s", bins=4).collect()}
    assert rows[3] is None
    assert rows[1] == rows[2] == 1.0  # constant column -> everything at 100%


def test_histogram_cdf_plan_free_of_windows_and_bnlj(spark):
    from stackstac_spark.operators.textstats import histogram_cdf
    from stackstac_spark.plans import audit

    df = spark.createDataFrame([(i, float(i % 7)) for i in range(50)], ["id", "s"])
    rep = audit.report(histogram_cdf(df, "s"))
    assert not rep["has_cartesian"]
    assert not rep["partitionless_windows"]


def test_slope_aspect_planes(spark):
    from stackstac_spark.operators.composite import slope_aspect

    # plane z = 2*col: dz/dx = 2, dz/dy = 0 -> slope atan(2), aspect west-ish
    px = spark.createDataFrame(
        [(0, 0, r, c, float(2 * c)) for r in range(5) for c in range(5)],
        ["item_idx", "band_idx", "row", "col", "value"],
    )
    out = slope_aspect(px).collect()
    assert len(out) == 9  # interior 3x3 only (full stencils)
    want_slope = round(math.degrees(math.atan(2.0)), 4)
    for r in out:
        assert r["slope_deg"] == want_slope
        # dzdx=2, dzdy=0 -> raw atan2(0, -2) = 180 -> GDAL compass
        # 450 - 180 = 270: downslope faces WEST (z grows eastward),
        # matching gdaldem, not the math convention's 180
        assert r["aspect_deg"] == 270.0

    # z = 2*row: dzdy = 2, dzdx = 0 -> raw = 90 -> compass 0 (north):
    # z grows with row (southward), downslope faces north
    py = spark.createDataFrame(
        [(0, 0, r, c, float(2 * r)) for r in range(5) for c in range(5)],
        ["item_idx", "band_idx", "row", "col", "value"],
    )
    for r in slope_aspect(py).collect():
        assert r["aspect_deg"] == 0.0

    # flat plane -> slope 0, aspect sentinel -1
    flat = spark.createDataFrame(
        [(0, 0, r, c, 7.0) for r in range(4) for c in range(4)],
        ["item_idx", "band_idx", "row", "col", "value"],
    )
    for r in slope_aspect(flat).collect():
        assert r["slope_deg"] == 0.0 and r["aspect_deg"] == -1.0


def test_lsh_tuning_curve_properties(spark):
    from stackstac_spark.operators.dedup import lsh_tuning_curve

    docs = [(i, " ".join("w%d_%d" % (i, k) for k in range(30))) for i in range(20)]
    # identical copies -> jaccard 1.0 -> every config must detect
    copies = [(i + 100, t) for i, t in docs]
    df = spark.createDataFrame(docs + copies, ["doc_id", "text"])
    truth = spark.createDataFrame([(i, i + 100) for i in range(20)], ["id_a", "id_b"])
    out = lsh_tuning_curve(df, truth).collect()
    assert {r["config"] for r in out} == {"b8r1", "b4r2", "b2r4"}
    for r in out:
        assert r["sim_bucket"] == 10
        assert r["emp_rate"] == 1.0
        assert r["mean_analytic"] == 1.0


def test_lsh_tuning_curve_rejects_bad_config(spark):
    import pytest

    from stackstac_spark.operators.dedup import lsh_tuning_curve

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    truth = spark.createDataFrame([(1, 1)], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="b\\*r"):
        lsh_tuning_curve(df, truth, num_hashes=8, configs=((3, 2),))
