"""The real-COG read path (reference rio_reader.py:287-466).

rasterio is absent from this container, so the suite has two layers:

1. mocked tests (always run) — fake ``rasterio`` modules + a recording
   dataset verify ``_read_real_window``'s bounds math, the VRT-needed
   decision, the WarpedVRT parameters, and masked→NaN filling;
2. integration tests gated on ``importorskip("rasterio")`` — they write
   real GeoTIFFs (same-CRS and cross-CRS) and run the full stack→compute
   pipeline against a painted oracle. They skip cleanly here and activate
   the moment the environment gains rasterio.
"""

import sys
import types

import numpy as np
import pytest

from stackstac_spark.raster_spec import RasterSpec

# ---------------------------------------------------------------------------
# mocked layer
# ---------------------------------------------------------------------------


class _FakeCRS:
    def __init__(self, epsg):
        self._epsg = epsg

    def to_epsg(self):
        return self._epsg


class _FakeTransform:
    def __init__(self, a, e, c, f):
        self.a, self.e, self.c, self.f = a, e, c, f


class _FakeDataset:
    """Records read() calls; returns a masked gradient block."""

    count = 1

    def __init__(self, epsg, transform):
        self.crs = _FakeCRS(epsg)
        self.transform = transform
        self.reads = []

    closed = False

    def read(self, band, window=None, masked=True, out_shape=None, boundless=False):
        self.reads.append(
            {"band": band, "window": window, "out_shape": out_shape, "boundless": boundless}
        )
        h, w = out_shape
        data = np.arange(h * w, dtype="float64").reshape(h, w)
        mask = np.zeros((h, w), dtype=bool)
        mask[0, 0] = True  # one nodata pixel to prove masked→NaN
        return np.ma.masked_array(data, mask)


class _FakeVRT(_FakeDataset):
    calls: list = []
    instances: list = []

    def close(self):
        self.closed = True

    def __init__(self, ds, **kwargs):
        _FakeVRT.calls.append(kwargs)
        _FakeVRT.instances.append(self)
        self.wrapped = ds
        tr = kwargs["transform"]
        super().__init__(int(kwargs["crs"].split(":")[1]), tr)


@pytest.fixture()
def fake_rasterio(monkeypatch):
    """Install minimal fake rasterio modules + patch the open/VRT seams."""
    from stackstac_spark.sources import raster as R

    windows_mod = types.ModuleType("rasterio.windows")
    from_bounds_calls = []

    def from_bounds(minx, miny, maxx, maxy, transform=None):
        from_bounds_calls.append((minx, miny, maxx, maxy))
        return ("win", minx, miny, maxx, maxy)

    windows_mod.from_bounds = from_bounds

    enums_mod = types.ModuleType("rasterio.enums")
    enums_mod.Resampling = {"nearest": "nearest", "bilinear": "bilinear"}

    transform_mod = types.ModuleType("rasterio.transform")

    def from_origin(west, north, xres, yres):
        return _FakeTransform(xres, -yres, west, north)

    transform_mod.from_origin = from_origin

    env_calls = []

    class _FakeEnv:
        """Records the option set active around each GDAL call."""

        def __init__(self, **options):
            self.options = options

        def __enter__(self):
            env_calls.append(self.options)
            return self

        def __exit__(self, *exc):
            return False

    rio_mod = types.ModuleType("rasterio")
    rio_mod.windows = windows_mod
    rio_mod.enums = enums_mod
    rio_mod.transform = transform_mod
    rio_mod.Env = _FakeEnv
    for name, mod in [
        ("rasterio", rio_mod),
        ("rasterio.windows", windows_mod),
        ("rasterio.enums", enums_mod),
        ("rasterio.transform", transform_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.setattr(R, "WarpedVRT", _FakeVRT, raising=False)
    _FakeVRT.calls = []
    _FakeVRT.instances = []
    return {"from_bounds_calls": from_bounds_calls, "env_calls": env_calls}


SPEC = RasterSpec(32613, (100.0, 200.0, 164.0, 264.0), (2.0, 2.0))  # 32x32 px


def test_read_same_grid_skips_vrt(fake_rasterio, monkeypatch):
    """Dataset already on the output grid: direct windowed read, no VRT,
    window bounds = exactly the requested pixel window, masked → NaN."""
    from stackstac_spark.sources import raster as R

    ds = _FakeDataset(32613, _FakeTransform(2.0, -2.0, 100.0, 264.0))
    monkeypatch.setattr(R, "_open_dataset", lambda url, key: ds)

    out = R._read_real_window("s3://b/x.tif", SPEC, 4, 12, 6, 16, "nearest", {})
    assert out.shape == (8, 10)
    assert np.isnan(out[0, 0]) and not np.isnan(out[1, 1])  # masked→NaN
    assert not _FakeVRT.calls  # no VRT for an aligned dataset
    assert ds.reads[0]["out_shape"] == (8, 10)
    # window bounds: rows 4..12, cols 6..16 on a 2m grid anchored (100, 264)
    assert fake_rasterio["from_bounds_calls"] == [(112.0, 240.0, 132.0, 256.0)]


def test_read_offset_grid_uses_vrt(fake_rasterio, monkeypatch):
    """Same CRS+res but an origin off the output grid lattice → WarpedVRT
    with the spec's full grid, then the window read against the VRT."""
    from stackstac_spark.sources import raster as R

    ds = _FakeDataset(32613, _FakeTransform(2.0, -2.0, 101.0, 264.0))  # 1m offset
    monkeypatch.setattr(R, "_open_dataset", lambda url, key: ds)

    out = R._read_real_window("s3://b/x.tif", SPEC, 0, 8, 0, 8, "bilinear", {})
    assert out.shape == (8, 8)
    (vrt_kwargs,) = _FakeVRT.calls
    assert vrt_kwargs["crs"] == "EPSG:32613"
    assert vrt_kwargs["width"] == 32 and vrt_kwargs["height"] == 32
    assert vrt_kwargs["resampling"] == "bilinear"
    tr = vrt_kwargs["transform"]
    assert (tr.a, tr.e, tr.c, tr.f) == (2.0, -2.0, 100.0, 264.0)
    assert ds.reads == []  # the read went through the VRT, not the raw ds


def test_read_cross_crs_uses_vrt(fake_rasterio, monkeypatch):
    from stackstac_spark.sources import raster as R

    ds = _FakeDataset(4326, _FakeTransform(0.1, -0.1, -105.0, 40.0))
    monkeypatch.setattr(R, "_open_dataset", lambda url, key: ds)
    R._read_real_window("s3://b/x.tif", SPEC, 0, 4, 0, 4, "nearest", {})
    (vrt_kwargs,) = _FakeVRT.calls
    assert vrt_kwargs["crs"] == "EPSG:32613"


def test_read_coarse_spec_decimates_via_vrt(fake_rasterio, monkeypatch):
    """Decimated read (reference rio_reader.py:382-429): spec 4x coarser than
    the native raster. Our design pins the WarpedVRT to the SPEC grid, so
    GDAL performs the decimation (overview selection) inside the VRT warp;
    the read then asks for exactly the coarse pixel window with
    out_shape == (r1-r0, c1-c0) — each output pixel covers 4x4 native pixels
    but the task only ever materializes the decimated block."""
    from stackstac_spark.sources import raster as R

    spec_coarse = RasterSpec(32613, (100.0, 200.0, 164.0, 264.0), (8.0, 8.0))  # 8x8 px
    # native 2 m dataset, same CRS, aligned origin — only the resolution differs
    ds = _FakeDataset(32613, _FakeTransform(2.0, -2.0, 100.0, 264.0))
    monkeypatch.setattr(R, "_open_dataset", lambda url, key: ds)

    out = R._read_real_window("s3://b/x.tif", spec_coarse, 2, 6, 1, 5, "nearest", {})
    assert out.shape == (4, 4)

    # the VRT is the decimation point: it must target the coarse spec grid
    (vrt_kwargs,) = _FakeVRT.calls
    tr = vrt_kwargs["transform"]
    assert (tr.a, tr.e, tr.c, tr.f) == (8.0, -8.0, 100.0, 264.0)
    assert vrt_kwargs["width"] == 8 and vrt_kwargs["height"] == 8

    # the raw dataset is never read directly; the VRT gets the coarse window
    assert ds.reads == []
    (vrt,) = _FakeVRT.instances
    assert vrt.reads[0]["out_shape"] == (4, 4)
    # rows 2..6, cols 1..5 on the 8 m grid anchored (100, 264):
    # a 32 m x 32 m span = 16x16 native pixels, decimated to out_shape (4, 4)
    assert fake_rasterio["from_bounds_calls"] == [(108.0, 216.0, 140.0, 248.0)]


def test_gdal_env_layering_open_vs_read(fake_rasterio, monkeypatch):
    """The reference's LayeredEnv semantics (rio_env.py:11-114): VSI_CACHE
    is ON for the open that parses headers, OFF for the bulk pixel read —
    the open key and the read-time Env must disagree on it."""
    from stackstac_spark.sources import raster as R

    open_keys = []

    def fake_open(url, key):
        open_keys.append(dict(key))
        return _FakeDataset(32613, _FakeTransform(2.0, -2.0, 100.0, 264.0))

    monkeypatch.setattr(R, "_open_dataset", fake_open)
    R._read_real_window("s3://b/x.tif", SPEC, 0, 8, 0, 8, "nearest", None)

    (okey,) = open_keys
    assert okey["VSI_CACHE"] == "TRUE"
    assert okey["GDAL_DISABLE_READDIR_ON_OPEN"] == "EMPTY_DIR"
    read_envs = [e for e in fake_rasterio["env_calls"] if e.get("VSI_CACHE") == "FALSE"]
    assert len(read_envs) == 1, fake_rasterio["env_calls"]
    assert read_envs[0]["GDAL_HTTP_MULTIRANGE"] == "YES"  # always-layer carried


def test_gdal_env_flat_dict_merges_into_always(fake_rasterio, monkeypatch):
    """A flat user dict must not erase the open/read VSI_CACHE split."""
    from stackstac_spark.sources import raster as R

    layers = R.normalize_gdal_env({"GDAL_HTTP_TIMEOUT": "30"})
    assert layers["always"]["GDAL_HTTP_TIMEOUT"] == "30"
    assert layers["open"]["VSI_CACHE"] == "TRUE"
    assert layers["read"]["VSI_CACHE"] == "FALSE"
    # layered overrides update only the named layer
    layered = R.normalize_gdal_env({"read": {"CPL_DEBUG": "ON"}})
    assert layered["read"] == {"VSI_CACHE": "FALSE", "CPL_DEBUG": "ON"}
    assert layered["open"]["VSI_CACHE"] == "TRUE"
    # a MIX of layered and flat keys is ambiguous: treating it as flat would
    # hand rasterio.Env a nested dict as an option value — reject loudly
    with pytest.raises(ValueError, match="mixes layered and flat"):
        R.normalize_gdal_env({"open": {"VSI_CACHE": "TRUE"}, "GDAL_HTTP_TIMEOUT": "30"})


def test_open_without_rasterio_raises_cleanly():
    from stackstac_spark.sources import raster as R

    if R._HAVE_RASTERIO:  # pragma: no cover - environment-dependent
        pytest.skip("rasterio present; the stub path is unreachable")
    R._open_dataset.cache_clear()
    with pytest.raises(NotImplementedError, match="rasterio is not installed"):
        R._open_dataset("s3://bucket/real.tif", ())


# ---------------------------------------------------------------------------
# integration layer — ALWAYS ON (since round 6): fixtures are written with
# the built-in writer (sources/minitiff.py), so the full stack()→compute
# pipeline runs against real GeoTIFF bytes in every environment. Without
# rasterio the scan routes to _read_fallback_window; with rasterio installed
# these same tests exercise the rasterio path (and thereby cross-validate
# the minitiff writer against GDAL).
# ---------------------------------------------------------------------------


def _write_geotiff(path, arr, epsg, transform_args, nodata=None):
    from stackstac_spark.sources import minitiff

    west, north, xres, yres = transform_args
    minitiff.write_geotiff(
        path,
        arr,
        epsg,
        minitiff.from_origin(west, north, xres, yres),
        nodata=nodata,
        tile=(16, 16),
    )


def _item_for_tif(path, epsg, bounds, shape, res, dt="2024-01-05T00:00:00Z"):
    minx, miny, maxx, maxy = bounds
    return {
        "type": "Feature",
        "id": "tif-item",
        "collection": "itest",
        "bbox": [-105.5, 39.5, -104.5, 40.5],
        "properties": {"datetime": dt, "proj:epsg": epsg},
        "assets": {
            "data": {
                "href": str(path),
                "type": "image/tiff; application=geotiff",
                "proj:bbox": list(bounds),
                "proj:shape": list(shape),
                "proj:transform": [res, 0.0, minx, 0.0, -res, maxy],
            }
        },
    }


def test_real_cog_same_crs_roundtrip(spark, tmp_path):
    from stackstac_spark.stack import stack

    rng = np.random.default_rng(7)
    arr = rng.uniform(0, 100, (32, 32)).astype("float64")
    arr[3, 4] = -9999.0  # nodata pixel
    tif = tmp_path / "same_crs.tif"
    _write_geotiff(tif, arr, 32613, (500000.0, 4000064.0, 2.0, 2.0), nodata=-9999.0)

    bounds = (500000.0, 4000000.0, 500064.0, 4000064.0)
    st = stack(spark, [_item_for_tif(tif, 32613, bounds, (32, 32), 2.0)], chunksize=16)
    dense = st.compute()
    assert dense.shape == (1, 1, 32, 32)
    expect = arr.copy()
    expect[arr == -9999.0] = np.nan
    np.testing.assert_allclose(dense[0, 0], expect, equal_nan=True)


def test_real_cog_resampled_grid_matches_nearest_oracle(spark, tmp_path):
    """Grid-mismatched stack over a real GeoTIFF: 2 m source onto a 5 m spec
    (non-integer ratio, so no dst center ever lands on a source pixel
    boundary — the closed-form oracle is tie-free and valid for BOTH the
    WarpedVRT path and the built-in mini-warp): dst pixel (R, C) gathers
    source pixel (floor(2.5R + 1.25), floor(2.5C + 1.25))."""
    from stackstac_spark.stack import stack

    rng = np.random.default_rng(11)
    arr = rng.uniform(0, 100, (40, 40)).astype("float64")
    tif = tmp_path / "utm.tif"
    _write_geotiff(tif, arr, 32613, (500000.0, 4000080.0, 2.0, 2.0))

    bounds = (500000.0, 4000000.0, 500080.0, 4000080.0)
    st = stack(
        spark,
        [_item_for_tif(tif, 32613, bounds, (40, 40), 2.0)],
        chunksize=16,
        resolution=5.0,
        resampling="nearest",
    )
    dense = st.compute()
    assert dense.shape == (1, 1, 16, 16)
    idx = np.floor(2.5 * np.arange(16) + 1.25).astype(int)
    oracle = arr[np.ix_(idx, idx)]
    np.testing.assert_allclose(dense[0, 0], oracle, equal_nan=True)


def test_direct_read_is_boundless_vrt_read_is_not(fake_rasterio, monkeypatch):
    """The non-VRT fastpath must read boundless (asset bbox metadata can
    overstate the raster extent; a clipped window would be stretched to
    out_shape, misregistering edge tiles). The VRT spans the full spec grid,
    so its read stays bounded — and the per-read VRT must be closed."""
    from stackstac_spark.sources import raster as R

    ds = _FakeDataset(32613, _FakeTransform(2.0, -2.0, 100.0, 264.0))
    monkeypatch.setattr(R, "_open_dataset", lambda url, key: ds)
    R._read_real_window("s3://b/x.tif", SPEC, 0, 8, 0, 8, "nearest", {})
    assert ds.reads[-1]["boundless"] is True

    off = _FakeDataset(32613, _FakeTransform(2.0, -2.0, 101.0, 264.0))
    monkeypatch.setattr(R, "_open_dataset", lambda url, key: off)
    _FakeVRT.instances = []
    R._read_real_window("s3://b/y.tif", SPEC, 0, 8, 0, 8, "nearest", {})
    (vrt,) = _FakeVRT.instances
    assert vrt.reads[-1]["boundless"] is False
    assert vrt.closed  # per-read VRT handle released


def test_scan_udf_rejects_unrepresentable_fill():
    from stackstac_spark.raster_spec import RasterSpec
    from stackstac_spark.sources.raster import make_scan_udf

    spec = RasterSpec(32613, (0.0, 0.0, 64.0, 64.0), (1.0, 1.0))
    with pytest.raises(ValueError, match="not exactly representable"):
        make_scan_udf(spec, fill_value=-1.0, dtype="uint8")
    make_scan_udf(spec, fill_value=255.0, dtype="uint8")  # in-range is fine
    with pytest.raises(ValueError, match="NaN"):
        make_scan_udf(spec, fill_value=float("nan"), dtype="int32")
