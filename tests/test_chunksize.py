"""Chunksize-form parity with the reference (to_dask.py:219-231 delegates to
dask normalize_chunks; testing/strategies.py:34-79 fuzzes ints, 'auto', byte
strings, None, -1, 2/4-tuples and dim dicts)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stackstac_spark.grid import AUTO_TARGET_BYTES, normalize_chunksize

SHAPE = (3000, 5000)


def test_int_and_pair_passthrough():
    assert normalize_chunksize(256, SHAPE) == (256, 256)
    assert normalize_chunksize((128, 512), SHAPE) == (128, 512)


def test_full_extent_forms():
    assert normalize_chunksize(-1, SHAPE) == SHAPE
    assert normalize_chunksize(None, SHAPE) == SHAPE
    assert normalize_chunksize((-1, 64), SHAPE) == (3000, 64)
    assert normalize_chunksize((64, None), SHAPE) == (64, 5000)


def test_auto_targets_default_chunk_bytes():
    big = (10**6, 10**6)  # unclamped
    h, w = normalize_chunksize("auto", big, dtype="float64")
    assert h == w
    assert h * w * 8 <= AUTO_TARGET_BYTES
    # within one row/col of the sqrt target — not pathologically small
    assert (h + 1) * (w + 1) * 8 > AUTO_TARGET_BYTES
    # clamps to the raster shape when the target chunk exceeds it
    ch, cw = normalize_chunksize("auto", SHAPE, dtype="float64")
    assert (ch, cw) == (min(h, SHAPE[0]), min(w, SHAPE[1]))

    # itemsize matters: float32 chunks hold 2x the elements of float64
    h32, _ = normalize_chunksize("auto", (10**6, 10**6), dtype="float32")
    h64, _ = normalize_chunksize("auto", (10**6, 10**6), dtype="float64")
    assert h32 > h64


def test_byte_strings():
    assert normalize_chunksize("8B", SHAPE, dtype="float64") == (1, 1)
    h, w = normalize_chunksize("100KiB", SHAPE, dtype="float64")
    assert h == w and h * w * 8 <= 100 * 1024
    h2, w2 = normalize_chunksize("64MiB", SHAPE, dtype="float64")
    assert h2 * w2 * 8 <= 64 * 2**20
    # decimal units too
    assert normalize_chunksize("1KB", SHAPE, dtype="float64")[0] == 11  # isqrt(125)


def test_mixed_pair_budget():
    # fixed width, auto height: height = budget / (itemsize * width)
    h, w = normalize_chunksize(("1KiB", 4), SHAPE, dtype="float64")
    assert w == 4 and h == 32  # 1024 / (8*4)
    h, w = normalize_chunksize((16, "1KiB"), SHAPE, dtype="float64")
    assert h == 16 and w == 8  # 1024 / (8*16)


def test_four_tuple_and_dict_layouts():
    assert normalize_chunksize((1, 1, 256, 512), SHAPE) == (256, 512)
    assert normalize_chunksize({2: 256, 3: 512}, SHAPE) == (256, 512)
    assert normalize_chunksize({"y": 100, "x": 200}, SHAPE) == (100, 200)
    assert normalize_chunksize({2: 256}, SHAPE) == (256, 5000)  # missing dim = full
    with pytest.raises(NotImplementedError, match="time"):
        normalize_chunksize((4, 1, 256, 256), SHAPE)
    with pytest.raises(NotImplementedError, match="band"):
        normalize_chunksize({1: 2, 2: 256}, SHAPE)
    # time/band chunks of 1/-1/None are tolerated (dask's strategies emit them)
    assert normalize_chunksize({0: 1, 1: None, 2: 64, 3: 64}, SHAPE) == (64, 64)


def test_garbage_rejected():
    with pytest.raises(ValueError, match="chunksize"):
        normalize_chunksize("12 potatoes", SHAPE)
    with pytest.raises(ValueError, match="chunksize"):
        normalize_chunksize(object(), SHAPE)


@given(
    cs=st.one_of(
        st.integers(1, 4096),
        st.just("auto"),
        st.sampled_from(["8B", "100KiB", "16MiB"]),
        st.just(None),
        st.just(-1),
        st.tuples(
            st.one_of(st.integers(1, 4096), st.just(-1), st.none(), st.just("auto")),
            st.one_of(st.integers(1, 4096), st.just(-1), st.none(), st.just("8MiB")),
        ),
    ),
    h=st.integers(1, 10_000),
    w=st.integers(1, 10_000),
    dtype=st.sampled_from(["uint8", "int16", "float32", "float64"]),
)
@settings(max_examples=200, deadline=None)
def test_normalize_invariants(cs, h, w, dtype):
    """The strategies.py invariants: always a positive int pair; explicit
    ints pass through; -1/None mean the full dim; byte budgets are
    respected."""
    ch, cw = normalize_chunksize(cs, (h, w), dtype=dtype)
    assert isinstance(ch, int) and isinstance(cw, int)
    assert ch >= 1 and cw >= 1
    if isinstance(cs, int) and cs > 0:
        assert (ch, cw) == (cs, cs)
    if cs is None or cs == -1:
        assert (ch, cw) == (h, w)
    item = np.dtype(dtype).itemsize
    if isinstance(cs, str) and cs != "auto":
        import re

        n = int(re.match(r"(\d+)", cs).group(1))
        mult = {"B": 1, "KiB": 1024, "MiB": 2**20}[cs.lstrip("0123456789")]
        budget = n * mult
        if budget >= item:  # sub-itemsize budgets clamp to 1x1
            assert min(ch, h) * min(cw, w) * item <= max(budget, item)


def test_stack_accepts_auto_chunksize(spark):
    from stackstac_spark.stack import stack
    from tests.conftest import make_item

    st_ = stack(
        spark,
        [make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 32.0, 32.0))],
        assets=["red"],
        chunksize="1KiB",
    )
    # 1KiB/8B = 128 px → 11x11 chunks over a 32x32 grid → 3x3 tiles... just
    # assert it scans end-to-end and reproduces the data
    dense = st_.compute()
    assert dense.shape == (1, 1, 32, 32)
    assert np.isfinite(dense).all()
