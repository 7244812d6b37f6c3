"""ipyleaflet widget glue (streaming/leaflet.py) against a stub ipyleaflet.

The engine-side machinery (tile server, MapObserver, prefetch/cancel) is
tested widget-free in test_warp_viz.py; these tests pin the GLUE layer the
reference has at show.py:637-816 — layer add/replace-by-name, the trait
observer translating ipyleaflet's ((south, west), (north, east)) bounds
into MapObserver calls, and a clean ImportError without ipyleaflet — using
a stub module so no notebook stack is needed.
"""

from __future__ import annotations

import sys
import types
import urllib.request

import numpy as np
import pytest


# --- stub ipyleaflet ---------------------------------------------------------


class _StubTileLayer:
    def __init__(self, url: str, name: str = ""):
        self.url = url
        self.name = name
        self.redraws = 0

    def redraw(self):
        self.redraws += 1


class _StubMap:
    """Duck-typed ipyleaflet.Map: layers tuple, add(), observe(), and the
    bounds/zoom traits (bounds in leaflet's ((south, west), (north, east))
    order)."""

    def __init__(self, center=(0.0, 0.0), zoom=3, **kwargs):
        self.center = center
        self.zoom = zoom
        self.layers: tuple = ()
        self._observers: list = []
        self.bounds: tuple = ()

    def add(self, layer):
        self.layers = self.layers + (layer,)

    def observe(self, handler, names=None):
        self._observers.append((handler, tuple(names or ())))

    # test helper: simulate a leaflet pan/zoom event
    def fire_bounds(self, south, west, north, east, zoom):
        self.bounds = ((south, west), (north, east))
        self.zoom = zoom
        out = None
        for handler, _ in self._observers:
            out = handler({"name": "bounds", "new": self.bounds})
        return out


@pytest.fixture()
def stub_ipyleaflet(monkeypatch):
    mod = types.ModuleType("ipyleaflet")
    mod.TileLayer = _StubTileLayer
    mod.Map = _StubMap
    monkeypatch.setitem(sys.modules, "ipyleaflet", mod)
    yield mod


@pytest.fixture()
def small_stack(spark):
    from stackstac_spark.stack import stack

    items = [
        {
            "id": f"it-{i}",
            "bbox": None,
            "properties": {
                "datetime": f"2024-06-0{i + 1}T00:00:00Z",
                "proj:epsg": 32633,
                "proj:bbox": [400000.0, 5000000.0, 400320.0, 5000320.0],
                "proj:shape": [32, 32],
                "proj:transform": [10.0, 0.0, 400000.0, 0.0, -10.0, 5000320.0],
            },
            "assets": {
                "red": {
                    "href": f"fake://{i}/0",
                    "type": "image/tiff; application=geotiff",
                }
            },
        }
        for i in range(2)
    ]
    return stack(spark, items, assets=["red"], chunksize=16)


def test_add_to_map_creates_live_layer(stub_ipyleaflet, small_stack):
    from stackstac_spark.streaming import leaflet

    m = _StubMap()
    layer = leaflet.add_to_map(small_stack, m, name="l1", range=(0.0, 2000.0))
    assert layer in m.layers and layer.name == "l1"
    assert "/{z}/{x}/{y}.png" in layer.url
    # the URL is LIVE: a real GET against it returns a PNG tile
    west, south, east, north = __import__(
        "stackstac_spark.functions.proj", fromlist=["reproject_bounds"]
    ).reproject_bounds(small_stack.spec.bounds, small_stack.spec.epsg, 4326)
    from stackstac_spark.streaming.show import visible_tiles

    z, x, y = visible_tiles((west, south, east, north), 13)[0]
    url = layer.url.replace("{z}", str(z)).replace("{x}", str(x)).replace("{y}", str(y))
    body = urllib.request.urlopen(url, timeout=30).read()
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_add_to_map_replaces_same_named_layer(stub_ipyleaflet, small_stack):
    from stackstac_spark.streaming import leaflet

    m = _StubMap()
    l1 = leaflet.add_to_map(small_stack, m, name="scene", range=(0.0, 2000.0))
    n_layers = len(m.layers)
    l2 = leaflet.add_to_map(small_stack, m, name="scene", range=(0.0, 1000.0))
    # reference semantics (show.py:700-709): same name → update url in
    # place, don't pile up layers
    assert l2 is l1
    assert len(m.layers) == n_layers
    assert l1.redraws >= 1


def test_observer_translates_leaflet_bounds(stub_ipyleaflet, small_stack):
    from stackstac_spark.functions.proj import reproject_bounds
    from stackstac_spark.streaming import leaflet

    m = _StubMap()
    leaflet.add_to_map(small_stack, m, name="obs", range=(0.0, 2000.0))
    west, south, east, north = reproject_bounds(
        small_stack.spec.bounds, small_stack.spec.epsg, 4326
    )
    out = m.fire_bounds(south, west, north, east, zoom=12)
    assert out is not None and out["tiles"]
    zs = {t[0] for t in out["tiles"]}
    assert zs == {12}
    # the viewport tiles are the slippy-math ones for this bbox
    from stackstac_spark.streaming.show import visible_tiles

    assert set(out["tiles"]) == set(visible_tiles((west, south, east, north), 12))


def test_show_map_centers_on_stack(stub_ipyleaflet, small_stack):
    from stackstac_spark.functions.proj import reproject_bounds
    from stackstac_spark.streaming import leaflet

    m = leaflet.show_map(small_stack, range=(0.0, 2000.0))
    west, south, east, north = reproject_bounds(
        small_stack.spec.bounds, small_stack.spec.epsg, 4326
    )
    lat, lon = m.center
    assert south <= lat <= north and west <= lon <= east
    assert isinstance(m.zoom, int) and 0 <= m.zoom <= 18
    assert len(m.layers) == 1


def test_import_error_without_ipyleaflet(monkeypatch, small_stack):
    import builtins

    real_import = builtins.__import__

    def _no_ipyleaflet(name, *a, **k):
        if name == "ipyleaflet":
            raise ImportError("No module named 'ipyleaflet'")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "ipyleaflet", raising=False)
    monkeypatch.setattr(builtins, "__import__", _no_ipyleaflet)
    from stackstac_spark.streaming import leaflet

    with pytest.raises(ImportError, match="ipyleaflet"):
        leaflet.add_to_map(small_stack, _StubMap())
