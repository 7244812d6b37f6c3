"""STAC API Item Search client (sources/stac_api.py) against a live mock
server: POST-body pagination, GET-href pagination, parameter encoding,
transient-5xx retry, max_items, JSONL spooling, and an e2e into stack().

The mock implements the public STAC API "Item Search" pagination
recommendations (next links with method/body/merge) — the same protocol
pystac-client speaks, which is what reference users feed to stackstac.
"""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from stackstac_spark.sources.stac_api import search_items


def _item(i: int) -> dict:
    return {
        "type": "Feature",
        "id": f"item-{i:04d}",
        "collection": "demo",
        "bbox": [10.0 + i, 40.0, 10.5 + i, 40.5],
        "properties": {
            "datetime": f"2024-03-{(i % 27) + 1:02d}T00:00:00Z",
            "eo:cloud_cover": i * 5,
            "proj:epsg": 32633,
            "proj:bbox": [500000.0, 4000000.0, 500320.0, 4000320.0],
            "proj:shape": [32, 32],
            "proj:transform": [10.0, 0.0, 500000.0, 0.0, -10.0, 4000320.0],
        },
        "assets": {
            "red": {"href": f"fake://{i}/0", "type": "image/tiff; application=geotiff"}
        },
    }


class _StacHandler(http.server.BaseHTTPRequestHandler):
    items = [_item(i) for i in range(7)]
    page_size = 3
    fail_next = 0  # number of requests to 503 before succeeding
    requests: list[dict] = []

    def log_message(self, *a):  # quiet
        pass

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/geo+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _page(self, offset: int, body: dict, post: bool):
        cls = type(self)
        feats = cls.items[offset : offset + cls.page_size]
        page = {"type": "FeatureCollection", "features": feats, "links": []}
        nxt_off = offset + cls.page_size
        if nxt_off < len(cls.items):
            if post:
                page["links"].append(
                    {
                        "rel": "next",
                        "href": f"http://{self.headers['Host']}/search",
                        "method": "POST",
                        "body": {"offset": nxt_off},
                        "merge": True,
                    }
                )
            else:
                page["links"].append(
                    {
                        "rel": "next",
                        "href": f"http://{self.headers['Host']}/search?offset={nxt_off}",
                    }
                )
        return page

    def _maybe_fail(self) -> bool:
        cls = type(self)
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self._send({"error": "try later"}, code=503)
            return True
        return False

    def do_POST(self):
        if self._maybe_fail():
            return
        if not self.path.split("?")[0].rstrip("/") == "/search":
            self._send({"error": "not found"}, code=404)
            return
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n)) if n else {}
        type(self).requests.append({"method": "POST", "path": self.path, "body": body})
        self._send(self._page(int(body.get("offset", 0)), body, post=True))

    def do_GET(self):
        if self._maybe_fail():
            return
        from urllib.parse import parse_qs, urlsplit

        if not urlsplit(self.path).path.rstrip("/") == "/search":
            self._send({"error": "not found"}, code=404)
            return
        q = parse_qs(urlsplit(self.path).query)
        type(self).requests.append({"method": "GET", "path": self.path, "body": None})
        off = int(q.get("offset", ["0"])[0])
        self._send(self._page(off, {}, post=False))


@pytest.fixture()
def api_url():
    _StacHandler.requests = []
    _StacHandler.fail_next = 0
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _StacHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_post_pagination_collects_all(api_url):
    items = search_items(api_url, collections=["demo"], limit=3)
    assert [it["id"] for it in items] == [f"item-{i:04d}" for i in range(7)]
    # next-body merge: offset pages carry the original filter forward
    bodies = [r["body"] for r in _StacHandler.requests if r["method"] == "POST"]
    assert bodies[0]["collections"] == ["demo"]
    assert bodies[1]["offset"] == 3 and bodies[1]["collections"] == ["demo"]


def test_get_pagination_and_param_encoding(api_url):
    items = search_items(
        api_url + "/search",
        method="GET",
        bbox=[10.0, 40.0, 12.0, 42.0],
        datetime="2024-03-01/2024-03-31",
        collections=["demo", "demo2"],
    )
    assert len(items) == 7
    first = next(r for r in _StacHandler.requests if r["method"] == "GET")
    assert "bbox=10.0%2C40.0%2C12.0%2C42.0" in first["path"]
    assert "collections=demo%2Cdemo2" in first["path"]
    assert "datetime=2024-03-01%2F2024-03-31" in first["path"]


def test_max_items_stops_early(api_url):
    items = search_items(api_url, max_items=4)
    assert len(items) == 4
    # stopped after the second page — no third request
    assert len([r for r in _StacHandler.requests if r["method"] == "POST"]) == 2


def test_retry_on_transient_503(api_url):
    _StacHandler.fail_next = 2
    items = search_items(api_url, retries=3, retry_backoff=0.01)
    assert len(items) == 7


def test_fail_fast_on_404(api_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        search_items(api_url + "/search-nope/search", retries=3, retry_backoff=0.01)
    # exactly one request: 404 is not retried
    assert len(_StacHandler.requests) == 0


def test_max_pages_backstop(api_url):
    with pytest.raises(RuntimeError, match="max_pages"):
        search_items(api_url, max_pages=1)


def test_jsonl_spool(api_url, tmp_path):
    out = search_items(api_url, to_jsonl=str(tmp_path / "items.jsonl"))
    assert out == str(tmp_path / "items.jsonl")
    lines = [json.loads(s) for s in open(out) if s.strip()]
    assert [it["id"] for it in lines] == [f"item-{i:04d}" for i in range(7)]


def test_search_to_stack_e2e(spark, api_url):
    """The full reference workflow: search → stack → compute."""
    import numpy as np

    from stackstac_spark.stack import stack

    items = search_items(api_url, max_items=2)
    st = stack(spark, items, assets=["red"], epsg=32633, resolution=10.0, chunksize=32)
    arr = st.compute()
    assert arr.shape == (2, 1, 32, 32)
    assert np.isfinite(arr).all()
