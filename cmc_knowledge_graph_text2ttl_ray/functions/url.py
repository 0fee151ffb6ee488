"""URL canonicalization for web-corpus dedup.

Common-Crawl-style pipelines dedup pages by *canonical* URL before any
content-based pass (the cheapest dedup signal there is). The reference
engine never sees raw URLs (its inputs are files), so this module follows
the public canonicalization rules used by crawl dedup (RFC 3986 §6 syntax
normalization + the usual tracking-param strip):

- scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- query parameters sorted by key (stable for equal keys), tracking
  parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``) removed, and the
  ``?`` dropped entirely when nothing survives;
- duplicate slashes collapsed in the path, trailing slash stripped
  (except the bare root path, which becomes empty — host-only URL);
- empty path kept empty (no ``/`` is appended).

``canonicalize_urls`` is the batch entry point: one Python-level pass per
row (URL parsing is irreducibly per-string), but all allocation stays in
one list comprehension and the per-row work is a single ``urlsplit`` +
regex — suitable inside ``map_batches`` over string columns.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

__all__ = ["canonicalize_url", "canonicalize_urls"]

_TRACKING = ("fbclid", "gclid", "ref")
_MULTISLASH = re.compile(r"//+")


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL (see module docstring for the rules)."""
    try:
        parts = urlsplit(url.strip())
        port = parts.port  # raises ValueError on a non-numeric port
    except ValueError:
        return url.strip().lower()
    scheme = parts.scheme.lower()
    host = parts.hostname or ""
    host = host.lower().rstrip(".")
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = _MULTISLASH.sub("/", parts.path)
    if path.endswith("/"):
        path = path[:-1]
    query = ""
    if parts.query:
        kept = [
            kv
            for kv in parts.query.split("&")
            if kv
            and not kv.split("=", 1)[0].lower().startswith("utm_")
            and kv.split("=", 1)[0].lower() not in _TRACKING
        ]
        kept.sort(key=lambda kv: kv.split("=", 1)[0])
        if kept:
            query = "?" + "&".join(kept)
    return f"{scheme}://{host}{path}{query}"


def canonicalize_urls(urls) -> list[str]:
    """Batch canonicalization: any iterable of strings → list of strings.

    Accepts a pyarrow ChunkedArray / Array (converted once via
    ``to_pylist``), a pandas Series, or a plain list.
    """
    if hasattr(urls, "to_pylist"):
        urls = urls.to_pylist()
    return [canonicalize_url(u) for u in urls]
