"""Regression tests for the round-11 ADVICE fixes: null/NaN hygiene in
calibration_error, sax_symbols, hill_tail_index, and boolean-complete
label_noise_flags."""

import math

import pytest


def test_calibration_error_excludes_null_nan_rows(spark):
    from stackstac_spark.operators.evalmetrics import calibration_error

    clean = [(0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0), (0.6, 1.0)]
    dirty = clean + [
        (None, 1.0),            # null p: pre-fix landed in the TOP bin
        (float("nan"), 0.0),    # NaN p
        (0.7, None),            # null y: pre-fix inflated bin n
        (0.5, float("nan")),    # NaN y
    ]
    df_clean = spark.createDataFrame(clean, "p double, y double")
    df_dirty = spark.createDataFrame(dirty, "p double, y double")
    rc = calibration_error(df_clean, "p", "y").first()
    rd = calibration_error(df_dirty, "p", "y").first()
    assert rd["n"] == len(clean) == rc["n"]
    for m in ("brier", "ece", "mce"):
        assert rd[m] == rc[m] and not math.isnan(rd[m])


def test_sax_symbols_null_rows_no_phantom_segments(spark):
    from stackstac_spark.operators.timeseries import sax_symbols

    word_len = 3
    clean = [(float(t), float(v)) for t, v in enumerate([1, 5, 2, 8, 3, 9])]
    dirty = clean + [(10.0, None), (11.0, float("nan")), (None, 4.0)]
    df_clean = spark.createDataFrame(clean, "t double, value double")
    df_dirty = spark.createDataFrame(dirty, "t double, value double")
    out_c = sax_symbols(df_clean, word_len).collect()
    out_d = sax_symbols(df_dirty, word_len).collect()
    # pre-fix: null rows ranked but not counted -> seg could hit word_len
    assert all(0 <= r["seg"] < word_len for r in out_d)
    assert [r.asDict() for r in out_d] == [r.asDict() for r in out_c]


def test_hill_tail_index_nan_excluded(spark):
    from stackstac_spark.operators.textstats import hill_tail_index

    vals = [float(2 ** (i / 3)) for i in range(30)]
    clean = spark.createDataFrame([(v,) for v in vals], "x double")
    dirty = spark.createDataFrame(
        [(v,) for v in vals] + [(float("nan"),), (float("nan"),)], "x double"
    )
    rc = hill_tail_index(clean, "x", k=10).first()
    rd = hill_tail_index(dirty, "x", k=10).first()
    # pre-fix: NaN > 0 is true and NaN sorts above every number, so the
    # top-(k+1) was poisoned and hill_alpha came back NaN
    assert rd["hill_alpha"] is not None and not math.isnan(rd["hill_alpha"])
    assert rd["hill_alpha"] == rc["hill_alpha"]
    assert rd["x_tail"] == rc["x_tail"]


def test_label_noise_flags_boolean_complete_single_class(spark):
    from stackstac_spark.operators.mlfit import label_noise_flags

    # only label-1 rows: t_lo (mean 1-p over label-0 rows) is NULL, so the
    # screen is undecidable -> pre-fix `flagged` was SQL NULL (three-valued
    # logic breaking ~flagged); post-fix it is boolean-complete False
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.1, 1)], "p double, y int"
    )
    rows = label_noise_flags(df, "p", "y").collect()
    assert all(isinstance(r["flagged"], bool) for r in rows)
    assert all(r["flagged"] is False for r in rows)
    # mixed-class sanity: a confidently-wrong row still flags True
    mixed = spark.createDataFrame(
        [(0.9, 1), (0.85, 1), (0.1, 0), (0.15, 0), (0.95, 0)],
        "p double, y int",
    )
    by_p = {r["p"]: r["flagged"] for r in label_noise_flags(mixed, "p", "y").collect()}
    assert by_p[0.95] is True  # labeled 0 with p >= t_hi
    assert by_p[0.9] is False and by_p[0.1] is False
