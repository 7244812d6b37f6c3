"""ipyleaflet hookup: live map widgets over the engine's tile server.

The reference renders stacks on an `ipyleaflet.Map` (show.py:637-816
``add_to_map``/``show``) with a traitlets observer that re-drives tile
computation on every pan/zoom (show.py:523-634). This module is that
hookup for the Spark engine:

- :func:`add_to_map` — register the stack (streaming/show.py::register),
  start/reuse the local :class:`~stackstac_spark.streaming.show.TileServer`,
  add an ``ipyleaflet.TileLayer`` pointing at it (replacing a same-named
  layer, like the reference), and attach a trait observer that forwards
  ``bounds``/``zoom`` changes to :class:`MapObserver.bounds_changed` for
  speculative viewport prefetch + scrolled-away cancellation.
- :func:`show_map` — the reference's ``show()``: build a Map centered on
  the stack and call :func:`add_to_map`.

All engine logic (tile math, prefetch, cancellation, LRU) lives in
streaming/show.py and is tested without any widget; this module is ONLY
the widget glue, so it degrades to a clear ImportError message when
ipyleaflet isn't installed. The glue itself is tested against a stub
ipyleaflet (tests/test_leaflet_hookup.py) — duck-typed access only, no
isinstance checks on widget classes, exactly so a stub (or a future
ipyleaflet version) works.
"""

from __future__ import annotations

import math
from typing import Any

from stackstac_spark.streaming.show import (
    MapObserver,
    TileServer,
    register,
)

__all__ = ["add_to_map", "show_map"]

# one shared server per process, like the reference's single Bokeh/ioloop
# server (show.py:120-140): every layer is routed by token on one port.
_SERVER: TileServer | None = None


def _ensure_server(port: int = 0) -> TileServer:
    global _SERVER
    if _SERVER is None:
        _SERVER = TileServer(port).start()
    return _SERVER


def _import_ipyleaflet():
    try:
        import ipyleaflet  # noqa: F811
    except ImportError as exc:  # pragma: no cover - exercised via stub tests
        raise ImportError(
            "add_to_map/show_map need ipyleaflet (pip install ipyleaflet). "
            "For widget-free serving use stackstac_spark.streaming.show.show(), "
            "which returns a plain XYZ URL template for any web map."
        ) from exc
    return ipyleaflet


class _TraitForwarder:
    """The observer callable handed to ``map.observe``: translates leaflet
    trait events into MapObserver.bounds_changed calls.

    ipyleaflet's ``bounds`` trait is ((south, west), (north, east));
    MapObserver takes (west, south, east, north) — the translation the
    reference does inline at show.py:560-610.
    """

    def __init__(self, map_widget: Any, observer: MapObserver):
        self.map = map_widget
        self.observer = observer

    def __call__(self, change: Any = None) -> dict | None:
        bounds = getattr(self.map, "bounds", None)
        zoom = getattr(self.map, "zoom", None)
        if not bounds or zoom is None:
            return None
        (south, west), (north, east) = bounds
        return self.observer.bounds_changed(
            (float(west), float(south), float(east), float(north)), int(zoom)
        )


def add_to_map(
    stack,
    map: Any,
    name: str | None = None,
    range: tuple[float, float] | None = None,
    cmap: str | None = None,
    checkerboard: bool = True,
    port: int = 0,
    max_tiles: int = 64,
):
    """Add a RasterStack to an ``ipyleaflet.Map`` as a live tile layer.

    Reference parity: show.py:637-721 ``add_to_map`` — same-named layers
    are updated in place (re-run a notebook cell without piling up layers);
    the trait observer keeps the prefetch pool aligned with the viewport.
    Returns the ``ipyleaflet.TileLayer``.
    """
    ipyleaflet = _import_ipyleaflet()
    token = register(
        stack, range=range, cmap=cmap, checkerboard=checkerboard
    )
    server = _ensure_server(port)
    url = f"http://127.0.0.1:{server.port}/{token}/{{z}}/{{x}}/{{y}}.png"
    if name is None:
        name = f"stackstac-{token[:8]}"

    layer = None
    for lyr in tuple(getattr(map, "layers", ()) or ()):
        if getattr(lyr, "name", None) == name:
            layer = lyr
            break
    if layer is not None:
        # update-in-place, like the reference's url swap (show.py:700-709)
        layer.url = url
        if hasattr(layer, "redraw"):
            layer.redraw()
    else:
        layer = ipyleaflet.TileLayer(url=url, name=name)
        map.add(layer) if hasattr(map, "add") else map.add_layer(layer)

    forwarder = _TraitForwarder(map, MapObserver(token, max_tiles=max_tiles))
    map.observe(forwarder, names=["bounds", "zoom"])
    # prime the prefetch pool with the current viewport (the reference fires
    # bounds_changed once on attach, show.py:560)
    forwarder()
    return layer


def show_map(
    stack,
    center: tuple[float, float] | None = None,
    zoom: int | None = None,
    range: tuple[float, float] | None = None,
    cmap: str | None = None,
    checkerboard: bool = True,
    **map_kwargs,
):
    """Create an ``ipyleaflet.Map`` centered on the stack and add it as a
    live layer (reference show.py:723-816 ``show``). Returns the Map."""
    ipyleaflet = _import_ipyleaflet()
    if center is None or zoom is None:
        from stackstac_spark.functions.proj import reproject_bounds

        west, south, east, north = reproject_bounds(
            stack.spec.bounds, stack.spec.epsg, 4326
        )
        if center is None:
            center = ((south + north) / 2.0, (west + east) / 2.0)
        if zoom is None:
            # fit the AOI's longer side into one ~256 px tile on a
            # reasonably-sized map: zoom = log2(360 / span) capped to [0, 18]
            span = max(east - west, (north - south) + 1e-12)
            zoom = int(max(0, min(18, math.floor(math.log2(360.0 / span)))))
    m = ipyleaflet.Map(center=center, zoom=zoom, **map_kwargs)
    add_to_map(
        stack, m, range=range, cmap=cmap, checkerboard=checkerboard
    )
    return m
