"""Hypothesis strategies mirroring the reference's public testing API
(reference testing/strategies.py:1-79), adapted to this engine:

- :func:`simple_bboxes` — integer-cornered bboxes, optionally zero-size
  (same semantics as the reference's, testing/strategies.py:10-24).
- :data:`raster_dtypes` — every dtype ``stack(dtype=...)`` accepts:
  unsigned/signed integers, floats, and complex (byte-opaque payloads with
  the ``split_complex`` relational view), matching the reference's draw
  (testing/strategies.py:26-31).
- :func:`chunksizes` — arguments for ``chunksize=``: ints, "auto", byte
  strings, -1/None, (y, x) tuples, dask-layout 4-tuples/dim dicts whose
  time/band entries are identity (grid.py::normalize_chunksize rejects
  real time/band chunking loudly — tiles are one row per item x band).

The engine's own fuzz suites (tests/test_scan_fuzz.py,
tests/test_chunksize.py) consume the same shapes; this module makes them
part of the public surface so downstream code can fuzz against the engine
the way the reference's users fuzz against dask graphs.
"""

from __future__ import annotations

from hypothesis import strategies as st

__all__ = ["simple_bboxes", "raster_dtypes", "chunksizes"]


@st.composite
def simple_bboxes(
    draw: st.DrawFn,
    minx: int = -100,
    miny: int = -100,
    maxx: int = 100,
    maxy: int = 100,
    *,
    zero_size: bool = True,
) -> tuple[int, int, int, int]:
    """(west, south, east, north) with integer corners inside the given
    frame; ``zero_size=True`` admits degenerate (empty) boxes — the
    reference uses these to fuzz bounds snapping/overlap edge cases."""
    west = draw(st.integers(minx, maxx - 1))
    south = draw(st.integers(miny, maxy - 1))
    east = draw(st.integers(west if zero_size else west + 1, maxx))
    north = draw(st.integers(south if zero_size else south + 1, maxy))
    return (west, south, east, north)


raster_dtypes: st.SearchStrategy[str] = st.sampled_from(
    [
        "uint8", "uint16", "uint32", "uint64",
        "int8", "int16", "int32", "int64",
        "float32", "float64",
        "complex64", "complex128",
    ]
)


def chunksizes(
    ndim: int = 2,
    *,
    max_side: int | None = 256,
    ints: bool = True,
    auto: bool = True,
    bytes: bool = True,
    none: bool = True,
    minus_one: bool = True,
    tuples: bool = True,
    dicts: bool = True,
    singleton: bool = True,
) -> st.SearchStrategy:
    """Generates ``chunksize=`` arguments (reference
    testing/strategies.py:34-79 generates dask ``chunks=`` the same way).

    ``ndim=2`` draws spatial (y, x) forms; ``ndim=4`` draws the dask-layout
    forms where the time/band entries are drawn from the identity values
    (1 / -1 / None) the engine accepts.
    """
    if ndim not in (2, 4):
        raise ValueError(f"ndim must be 2 or 4, got {ndim}")
    side = max_side or 256
    byte_vals = st.sampled_from(["8B", f"{side * 8}B", "100KiB", "64MiB"])

    top = []
    if ints:
        top.append(st.integers(1, side))
    if auto:
        top.append(st.just("auto"))
    if bytes:
        top.append(byte_vals)
    toplevel = st.one_of(top)

    inner = list(top)
    if none:
        inner.append(st.none())
    if minus_one:
        inner.append(st.just(-1))
    inner_vals = st.one_of(inner)
    identity = st.sampled_from([1, -1, None])

    final = []
    if singleton:
        final.append(toplevel)
    if tuples:
        if ndim == 2:
            final.append(st.tuples(inner_vals, inner_vals))
        else:
            final.append(st.tuples(identity, identity, inner_vals, inner_vals))
    if dicts:
        if ndim == 2:
            final.append(
                st.dictionaries(
                    st.sampled_from(["y", "x"]), inner_vals, min_size=1, max_size=2
                )
            )
        else:
            final.append(
                st.fixed_dictionaries(
                    {},
                    optional={
                        0: identity,
                        1: identity,
                        2: inner_vals,
                        3: inner_vals,
                    },
                ).filter(bool)
            )
    return st.one_of(final)
