"""S12 — driver-side geocoding utility (reference
`scripts/fetch_bboxes.py:25-41,98-142`): fetch city bbox/center from a
geocoding HTTP API with a JSON file cache, rate limiting, and
retry-on-429. Not a distributed operator — config prep that runs once
on the driver before a pipeline.

The HTTP transport is injectable (`fetch_fn`) so the utility is
testable offline; the default transport uses urllib against a
Nominatim-compatible endpoint and is only exercised when a network is
actually available.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from urllib.parse import urlencode

DEFAULT_ENDPOINT = "https://nominatim.openstreetmap.org/search"


def _default_fetch(url: str) -> tuple[int, str]:
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "kg-etl-spark-geocode/1.0"})
    with urlopen(req, timeout=30) as resp:  # pragma: no cover (network)
        return resp.status, resp.read().decode("utf-8")


def fetch_bbox(
    query: str,
    cache_dir: str,
    fetch_fn: Callable[[str], tuple[int, str]] | None = None,
    endpoint: str = DEFAULT_ENDPOINT,
    min_interval_s: float = 1.0,
    max_retries: int = 3,
    _state: dict = {},
) -> dict | None:
    """Returns {bbox: [s, w, n, e], center: {lat, lon}} for the query,
    cached at cache_dir/<slug>.json. Rate-limited to one request per
    min_interval_s; retries with backoff on HTTP 429."""
    fetch = fetch_fn or _default_fetch
    os.makedirs(cache_dir, exist_ok=True)
    key = "".join(c if c.isalnum() else "-" for c in query.lower()).strip("-")
    cache_path = os.path.join(cache_dir, f"{key}.json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)

    url = f"{endpoint}?{urlencode({'q': query, 'format': 'json', 'limit': 1})}"
    delay = min_interval_s
    for _ in range(max_retries):
        last = _state.get("last_request", 0.0)
        wait = min_interval_s - (time.monotonic() - last)
        if wait > 0:
            time.sleep(wait)
        _state["last_request"] = time.monotonic()
        status, body = fetch(url)
        if status == 429:
            time.sleep(delay)
            delay *= 2
            continue
        if status != 200:
            return None
        rows = json.loads(body)
        if not rows:
            return None
        r = rows[0]
        s, n, w, e = (float(x) for x in r["boundingbox"])
        out = {
            "bbox": [s, w, n, e],
            "center": {"lat": float(r["lat"]), "lon": float(r["lon"])},
        }
        with open(cache_path, "w") as f:
            json.dump(out, f)
        return out
    return None
