"""Ranged-HTTP GeoTIFF reads (minitiff.HttpRangeFile).

The reference's production path reads COGs over HTTP through GDAL's
/vsicurl/ (rio_reader.py:287-466: range GETs + a block cache). rasterio
is absent here, so HttpRangeFile reproduces that access pattern in pure
Python; these tests run it against a REAL in-process HTTP server — every
request observed, every byte counted — and pin:

- byte-identical windows vs the local-file read,
- all requests ranged, transfer ≪ file size for small windows,
- graceful degradation when the server ignores Range (plain 200),
- the full scan path (stack → pixels) over an http:// asset href.
"""

from __future__ import annotations

import http.server
import os
import re
import threading

import numpy as np
import pytest

from stackstac_spark.sources import minitiff
from stackstac_spark.sources.minitiff import HttpRangeFile, from_origin, write_geotiff


class _RangeHandler(http.server.SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler + RFC 7233 single-range support + a request
    log (python's stdlib handler ignores Range, which is itself useful — see
    the ignores-Range test, where we use the stock behavior)."""

    serve_ranges = True
    log: list[tuple[str, str | None, int]] = []

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        path = self.translate_path(self.path)
        rng = self.headers.get("Range")
        if not (self.serve_ranges and rng):
            type(self).log.append((self.path, rng, 200))
            return super().do_GET()
        try:
            with open(path, "rb") as fh:
                data = fh.read()
        except OSError:
            type(self).log.append((self.path, rng, 404))
            self.send_error(404)
            return
        m = re.fullmatch(r"bytes=(\d+)-(\d*)", rng.strip())
        if not m:
            self.send_error(400)
            return
        start = int(m.group(1))
        stop = int(m.group(2)) + 1 if m.group(2) else len(data)
        if start >= len(data):
            type(self).log.append((self.path, rng, 416))
            self.send_response(416)
            self.send_header("Content-Range", f"bytes */{len(data)}")
            self.end_headers()
            return
        stop = min(stop, len(data))
        body = data[start:stop]
        type(self).log.append((self.path, rng, 206))
        self.send_response(206)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Range", f"bytes {start}-{stop - 1}/{len(data)}")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def http_dir(tmp_path):
    """A Range-capable HTTP server rooted at tmp_path; yields (base_url, log)."""
    handler = type("H", (_RangeHandler,), {"log": [], "serve_ranges": True})
    handler.directory = str(tmp_path)

    def factory(*a, **kw):
        return handler(*a, directory=str(tmp_path), **kw)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), factory)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", handler.log, handler
    finally:
        srv.shutdown()
        minitiff.cache_clear()


def _paint(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4000, size=(h, w)).astype("uint16")


def test_http_window_matches_local(http_dir, tmp_path):
    base, log, _ = http_dir
    arr = _paint(512, 512)
    p = tmp_path / "cog.tif"
    write_geotiff(str(p), arr, 32633, from_origin(500000, 4000100, 10, 10),
                  nodata=0, tile=(64, 64), overviews=[2, 4])
    local = minitiff.MiniTiffDataset(str(p))
    remote = minitiff.MiniTiffDataset(f"{base}/cog.tif")
    assert (remote.width, remote.height, remote.count) == (512, 512, 1)
    assert remote.epsg == 32633 and remote.transform == local.transform
    assert remote.dtype == local.dtype and remote.nodata == local.nodata
    for win in [(0, 64, 0, 64), (100, 230, 50, 400), (448, 512, 448, 512)]:
        np.testing.assert_array_equal(
            remote.read_window(*win), local.read_window(*win)
        )
    # overview chain works over HTTP too
    np.testing.assert_array_equal(
        remote.overview(0).read_full(), local.overview(0).read_full()
    )
    assert all(rng is not None and code in (206, 416) for _, rng, code in log)
    local.close(); remote.close()


def test_http_small_window_transfers_fraction(http_dir, tmp_path):
    base, log, _ = http_dir
    arr = _paint(1024, 1024, seed=1)
    p = tmp_path / "big.tif"
    write_geotiff(str(p), arr, 32633, from_origin(0, 10240, 10, 10),
                  tile=(64, 64), compress="none")
    size = os.path.getsize(p)
    b0 = minitiff.HTTP_BYTES
    ds = minitiff.MiniTiffDataset(f"{base}/big.tif")
    got = ds.read_window(128, 192, 128, 192)  # exactly one 64x64 tile
    np.testing.assert_array_equal(got, arr[128:192, 128:192])
    moved = minitiff.HTTP_BYTES - b0
    # one tile (8 KiB) + header blocks ≪ the ~2 MiB file
    assert moved < size / 8, (moved, size)
    assert all(rng is not None for _, rng, _ in log)
    ds.close()


def test_http_server_ignoring_range_still_correct(http_dir, tmp_path):
    base, log, handler = http_dir
    handler.serve_ranges = False  # stock stdlib behavior: Range ignored
    arr = _paint(96, 96, seed=2)
    p = tmp_path / "plain.tif"
    write_geotiff(str(p), arr, 4326, from_origin(0, 96, 1, 1), tile=(64, 64))
    ds = minitiff.MiniTiffDataset(f"{base}/plain.tif")
    np.testing.assert_array_equal(ds.read_full(), arr)
    # exactly one 200 download serves everything afterwards
    assert [c for _, _, c in log] == [200]
    ds.close()


def test_http_range_file_read_semantics(http_dir, tmp_path):
    base, _, _ = http_dir
    blob = bytes(range(256)) * 1000  # 256 000 bytes
    (tmp_path / "blob.bin").write_bytes(blob)
    f = HttpRangeFile(f"{base}/blob.bin", block_size=4096, max_blocks=4)
    # small read via block cache
    f.seek(10)
    assert f.read(20) == blob[10:30]
    # block-spanning small read
    f.seek(4090)
    assert f.read(12) == blob[4090:4102]
    # big read: one exact-range GET
    r0 = minitiff.HTTP_REQUESTS
    f.seek(8192)
    assert f.read(100_000) == blob[8192:108_192]
    assert minitiff.HTTP_REQUESTS == r0 + 1
    # to-EOF read + seek(2)
    f.seek(-16, 2)
    assert f.read() == blob[-16:]
    # read past EOF → short/empty
    f.seek(len(blob) + 10)
    assert f.read(10) == b""
    assert f.size == len(blob)
    f.close()


def test_http_retry_on_transient_5xx(http_dir, tmp_path):
    """First two responses 503 → the ranged read succeeds on retry; a 404
    fails fast without retries (GDAL_HTTP_MAX_RETRY parity)."""
    base, log, handler = http_dir
    blob = b"retry-me" * 512
    (tmp_path / "r.bin").write_bytes(blob)
    fails = {"n": 2}
    orig = handler.do_GET

    def flaky(self):
        if fails["n"] > 0:
            fails["n"] -= 1
            self.send_error(503)
            return
        orig(self)

    handler.do_GET = flaky
    try:
        f = HttpRangeFile(f"{base}/r.bin", block_size=1024, retry_backoff=0.01)
        assert f.read(16) == blob[:16]
        assert fails["n"] == 0
        f.close()
        # fail-fast on 404: exactly one request, error surfaces
        import urllib.error

        n0 = len(log)
        g = HttpRangeFile(f"{base}/absent.bin", retry_backoff=0.01)
        with pytest.raises(urllib.error.HTTPError):
            g.read(16)
        assert len(log) == n0 + 1
    finally:
        handler.do_GET = orig


def test_http_open_cached_reuses_dataset(http_dir, tmp_path):
    base, _, _ = http_dir
    arr = _paint(64, 64, seed=3)
    write_geotiff(str(tmp_path / "c.tif"), arr, 4326, from_origin(0, 64, 1, 1))
    url = f"{base}/c.tif"
    ds1 = minitiff.open_cached(url)
    ds2 = minitiff.open_cached(url)
    assert ds1 is ds2


def test_scan_path_over_http(spark, http_dir, tmp_path):
    """stack → pixels with an http:// asset href: the executor-side fallback
    reader opens the URL through HttpRangeFile and the painted values round-
    trip exactly (same contract as the local raster_real_tiff gate)."""
    base, log, _ = http_dir
    h = w = 96
    res = 10.0
    arr = (np.arange(h * w, dtype="float64").reshape(h, w) % 997) / 7.0
    minx, maxy = 600000.0, 5000000.0
    p = tmp_path / "scene.tif"
    write_geotiff(str(p), arr, 32633, from_origin(minx, maxy, res, res),
                  tile=(64, 64), compress="deflate", predictor=3)
    url = f"{base}/scene.tif"
    item = {
        "id": "http0",
        "properties": {"datetime": "2024-05-01T00:00:00Z", "proj:epsg": 32633},
        "assets": {
            "b": {
                "href": url,
                "type": "image/tiff; application=geotiff",
                "proj:bbox": [minx, maxy - h * res, minx + w * res, maxy],
                "proj:epsg": 32633,
                "proj:transform": [res, 0, minx, 0, -res, maxy],
            }
        },
        "bbox": [0, 0, 1, 1],
    }
    from stackstac_spark.stack import stack

    st = stack(spark, [item], assets=["b"], chunksize=64)
    px = st.pixels().collect()
    assert len(px) == h * w
    got = np.full((h, w), np.nan)
    for r in px:
        got[r.row, r.col] = r.value
    np.testing.assert_array_equal(got, arr)


def test_stalled_server_times_out():
    """A server that accepts the connection but never responds must convert
    to TimeoutError via the finite urlopen timeout and enter the retry path
    — not hang the executor task forever (r7 advice; GDAL's /vsicurl/ has
    connect/read timeouts)."""
    import socket
    import time as _time

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    accepted = []

    def _sink():
        try:
            while True:
                conn, _ = srv.accept()
                accepted.append(conn)  # hold open, never reply
        except OSError:
            pass

    t = threading.Thread(target=_sink, daemon=True)
    t.start()
    try:
        f = HttpRangeFile(
            f"http://127.0.0.1:{port}/x.tif",
            timeout=0.3, retries=1, retry_backoff=0.05,
        )
        t0 = _time.monotonic()
        with pytest.raises((TimeoutError, OSError)):
            f._fetch(0, 1024)
        # two attempts (retries=1) at 0.3 s each + one 0.05 s backoff;
        # generous ceiling still far below "hangs forever"
        assert _time.monotonic() - t0 < 5.0
        # the retry policy actually triggered: both attempts connected
        assert len(accepted) == 2
    finally:
        srv.close()
        for c in accepted:
            c.close()


def test_stac_search_times_out():
    import socket
    import time as _time

    from stackstac_spark.sources.stac_api import search_items

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    conns = []

    def _sink():
        try:
            while True:
                conn, _ = srv.accept()
                conns.append(conn)
        except OSError:
            pass

    threading.Thread(target=_sink, daemon=True).start()
    try:
        t0 = _time.monotonic()
        with pytest.raises((TimeoutError, OSError)):
            search_items(
                f"http://127.0.0.1:{port}/v1",
                collections=["c"],
                timeout=0.3, retries=1, retry_backoff=0.05,
            )
        assert _time.monotonic() - t0 < 5.0
    finally:
        srv.close()
        for c in conns:
            c.close()
