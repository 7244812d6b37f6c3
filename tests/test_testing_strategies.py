"""Public testing strategies (stackstac_spark.testing — reference
testing/strategies.py parity): every drawn value must be ACCEPTED by the
engine surface it targets."""

import numpy as np
from hypothesis import HealthCheck, given, settings

from stackstac_spark.grid import normalize_chunksize
from stackstac_spark.testing import chunksizes, raster_dtypes, simple_bboxes


@given(simple_bboxes())
def test_simple_bboxes_ordered(b):
    w, s, e, n = b
    assert -100 <= w <= e <= 100 and -100 <= s <= n <= 100


@given(simple_bboxes(zero_size=False))
def test_simple_bboxes_nonempty(b):
    w, s, e, n = b
    assert e > w and n > s


@given(raster_dtypes)
def test_raster_dtypes_are_numpy_dtypes(dt):
    assert np.dtype(dt).itemsize >= 1


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(chunksizes(2))
def test_chunksizes_2d_all_normalize(cs):
    ch, cw = normalize_chunksize(cs, (300, 400))
    assert 1 <= ch <= 300 and 1 <= cw <= 400


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(chunksizes(4))
def test_chunksizes_4d_all_normalize(cs):
    ch, cw = normalize_chunksize(cs, (300, 400))
    assert 1 <= ch <= 300 and 1 <= cw <= 400
