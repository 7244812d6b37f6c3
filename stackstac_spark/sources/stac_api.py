"""Minimal STAC API Item Search client: ``/search`` → plain item dicts.

The reference engine consumes whatever ``pystac_client.Client.search()``
returns (stac.py docstring; reference stac_types.py:136-200 normalizes the
resulting ItemCollection). To make this repo standalone-complete for that
workflow, this module implements the public STAC API "Item Search" spec
(github.com/radiantearth/stac-api-spec, ``item-search`` conformance class)
with nothing but the standard library:

- POST (default) or GET ``/search`` with ``collections``/``ids``/``bbox``/
  ``datetime``/``intersects``/``query``/``sortby``/``limit``;
- pagination by following ``links[rel=next]``: POST-style next links carry
  ``body`` (optionally ``merge: true`` — merged over the previous body),
  GET-style next links are plain hrefs — both per the spec's pagination
  recommendations;
- the same transient-failure policy as the ranged-COG reader
  (minitiff.HttpRangeFile._fetch): bounded retries with exponential backoff
  on 429/5xx and connection errors, fail-fast on other 4xx.

The output is a list of plain item dicts — exactly what ``stack()`` /
``items_to_dataframes`` accept — so the full reference workflow becomes:

    items = search_items("https://earth-search.example.com/v1",
                         collections=["sentinel-2-l2a"], bbox=aoi,
                         datetime="2024-01-01/2024-06-30")
    st = stack(spark, items, assets=["red", "nir"], resolution=10)

Driver-side by design: a search result is catalog *metadata* (KB/item) and
the STAC API itself caps pages (typically ≤10k items per search); the
100 TB-catalog ingest paths are ``items_from_jsonl`` /
``items_from_geoparquet`` which scan published bulk catalogs split-parallel.
For searches bigger than driver memory, pass ``to_jsonl=`` to spool pages
straight to a JSONL file and feed *that* to ``stack()``.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any

__all__ = ["search_items"]

_RETRIABLE = (429, 500, 502, 503, 504)


def _http_json(
    url: str,
    body: dict | None,
    headers: dict | None,
    retries: int,
    retry_backoff: float,
    timeout: float = 30.0,
) -> dict:
    """One request (POST when ``body`` is not None, else GET) → parsed JSON,
    with the engine's standard transient-failure retry policy."""
    hdrs = {"Accept": "application/geo+json, application/json"}
    if headers:
        hdrs.update(headers)
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        hdrs["Content-Type"] = "application/json"
    req = urllib.request.Request(url, data=data, headers=hdrs)
    for attempt in range(retries + 1):
        try:
            # finite timeout so a stalled server converts to TimeoutError
            # and enters the retry path instead of hanging the driver
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as ex:
            if ex.code not in _RETRIABLE or attempt == retries:
                raise
        except (urllib.error.URLError, ConnectionError, TimeoutError):
            if attempt == retries:
                raise
        time.sleep(retry_backoff * (2 ** attempt))
    raise RuntimeError("unreachable")  # pragma: no cover


def _search_url(url: str) -> str:
    """Accept a catalog root or the search endpoint itself."""
    path = urllib.parse.urlsplit(url).path
    if path.rstrip("/").endswith("/search"):
        return url
    return url.rstrip("/") + "/search"


def _get_params(body: dict) -> str:
    """STAC Item Search GET encoding: arrays comma-joined, JSON values for
    structured fields (intersects/query/sortby per the spec's GET forms)."""
    params: dict[str, str] = {}
    for k, v in body.items():
        if v is None:
            continue
        if k in ("collections", "ids"):
            params[k] = ",".join(str(x) for x in v)
        elif k == "bbox":
            params[k] = ",".join(repr(float(x)) for x in v)
        elif k == "sortby" and isinstance(v, list):
            params[k] = ",".join(
                ("-" if s.get("direction") == "desc" else "") + s["field"]
                if isinstance(s, dict)
                else str(s)
                for s in v
            )
        elif isinstance(v, (dict, list)):
            params[k] = json.dumps(v)
        else:
            params[k] = str(v)
    return urllib.parse.urlencode(params)


def _next_link(page: dict) -> dict | None:
    for link in page.get("links", []) or []:
        if isinstance(link, dict) and link.get("rel") == "next":
            return link
    return None


def search_items(
    url: str,
    *,
    collections: list[str] | None = None,
    ids: list[str] | None = None,
    bbox: list[float] | None = None,
    datetime: str | None = None,
    intersects: dict | None = None,
    query: dict | None = None,
    sortby: list | None = None,
    limit: int = 100,
    max_items: int | None = None,
    method: str = "POST",
    headers: dict | None = None,
    retries: int = 3,
    retry_backoff: float = 0.25,
    timeout: float = 30.0,
    to_jsonl: str | None = None,
    max_pages: int = 10_000,
) -> list[dict] | str:
    """Run a STAC API Item Search and return the matching item dicts.

    ``url`` may be the catalog root (``/search`` is appended) or the search
    endpoint itself. Returns a list of plain item dicts ready for
    ``stack()``; with ``to_jsonl=`` set, pages are appended to that path as
    item-per-line JSONL instead (constant driver memory) and the path is
    returned — feed it to ``stack(spark, path)`` for distributed ingest.
    """
    if method not in ("POST", "GET"):
        raise ValueError(f"method must be POST or GET, got {method!r}")
    base = _search_url(url)
    body: dict[str, Any] = {"limit": int(limit)}
    if collections:
        body["collections"] = list(collections)
    if ids:
        body["ids"] = list(ids)
    if bbox is not None:
        body["bbox"] = [float(x) for x in bbox]
    if datetime is not None:
        body["datetime"] = datetime
    if intersects is not None:
        body["intersects"] = intersects
    if query is not None:
        body["query"] = query
    if sortby is not None:
        body["sortby"] = sortby

    out: list[dict] = []
    n = 0
    sink = open(to_jsonl, "w") if to_jsonl else None
    try:
        # first request
        if method == "POST":
            page = _http_json(base, body, headers, retries, retry_backoff, timeout)
        else:
            page = _http_json(
                base + "?" + _get_params(body),
                None,
                headers,
                retries,
                retry_backoff,
                timeout,
            )
        pages = 1
        while True:
            feats = page.get("features", []) or []
            for it in feats:
                if max_items is not None and n >= max_items:
                    break
                if sink is not None:
                    sink.write(json.dumps(it) + "\n")
                else:
                    out.append(it)
                n += 1
            if max_items is not None and n >= max_items:
                break
            nxt = _next_link(page)
            if nxt is None or not feats:
                break
            # runaway-pagination backstop: a misbehaving server that keeps
            # emitting next links would otherwise loop the driver forever
            if pages >= max_pages:
                raise RuntimeError(
                    f"search exceeded max_pages={max_pages} ({n} items so far); "
                    "raise max_pages or set max_items to bound the search"
                )
            pages += 1
            href = nxt.get("href", base)
            if (nxt.get("method") or "GET").upper() == "POST":
                nbody = nxt.get("body") or {}
                if nxt.get("merge"):
                    nbody = {**body, **nbody}
                body = nbody
                page = _http_json(href, body, headers, retries, retry_backoff, timeout)
            else:
                page = _http_json(href, None, headers, retries, retry_backoff, timeout)
    finally:
        if sink is not None:
            sink.close()
    return to_jsonl if to_jsonl else out
