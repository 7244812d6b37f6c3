"""Property-based scan correctness — the reference's core test idea
(tests/test_to_dask.py:69-186): random asset tables (random integer bboxes,
random missing assets, random chunksizes), oracle = a dense numpy array
painted per asset window from the same deterministic value function the
fake reader serves; the engine's ``compute()`` must reproduce it
pixel-exactly, including fill in uncovered/missing cells."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stackstac_spark.stack import stack
from tests.conftest import make_item
from tests.test_stack_e2e import paint_oracle


@st.composite
def stack_cases(draw):
    n_items = draw(st.integers(1, 4))
    items = []
    for i in range(n_items):
        minx = draw(st.integers(-20, 20))
        miny = draw(st.integers(-20, 20))
        w = draw(st.integers(1, 40))
        h = draw(st.integers(1, 40))
        items.append(
            make_item(
                i,
                f"2024-01-{i + 1:02d}T00:00:00Z",
                (float(minx), float(miny), float(minx + w), float(miny + h)),
            )
        )
    # randomly drop assets (missing cells in the asset table)
    for i in range(n_items):
        if n_items > 1 and draw(st.booleans()):
            del items[i]["assets"][draw(st.sampled_from(["red", "nir"]))]
    chunksize = draw(st.sampled_from([7, 16, 33]))
    return items, chunksize


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=stack_cases())
def test_scan_fuzz_matches_painted_oracle(spark, case):
    items, chunksize = case
    st_ = stack(spark, items, assets=["red", "nir"], chunksize=chunksize)
    # a band missing from EVERY item is dropped (all-empty column semantics,
    # reference prepare.py:384-393) — paint the oracle for surviving bands
    oracle = paint_oracle(items, st_.asset_ids, st_.spec)
    got = st_.compute()
    assert got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)
