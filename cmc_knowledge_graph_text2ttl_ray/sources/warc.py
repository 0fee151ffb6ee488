"""WARC source: read Common-Crawl-style WARC files into the pages schema.

The engine's north-star input is Common-Crawl-style web pages; crawls ship
as WARC (ISO 28500) — a sequence of records, each a header block (CRLF
lines) + a body, usually stored one-gzip-member-per-record (``.warc.gz``).
This module parses ``response`` records into ``(url, warc_ts, html, text,
lang)`` rows — the same schema as ``sources/pages.py`` — so a WARC corpus
drops straight into ``run_kg_pipeline``.

Scale shape: one WARC file is one read task (``read_binary_files`` with
``include_paths`` → a ``flat_map``-style ``map_batches`` expansion), so a
directory of crawl shards parallelizes file-per-task exactly like Common
Crawl's own 1 GiB segment layout; the record scan inside a task is a
single pass over the decompressed stream. Pure stdlib (``gzip``) — no
warcio dependency in this sandbox.

Writing: :func:`write_warc` emits the standard one-gzip-member-per-record
layout so round-trip tests don't need external fixtures.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

from cmc_knowledge_graph_text2ttl_ray.sources.pages import (
    PAGES_SCHEMA,
    extract_page_text,
)

__all__ = ["parse_warc_bytes", "warc_dataset", "write_warc"]

_CRLF = b"\r\n"


class WarcParseError(ValueError):
    pass


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line or line.startswith((b" ", b"\t")):
            continue  # continuation lines: rare, not needed for CC fields
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1"))
    return headers


def _http_body(payload: bytes) -> bytes:
    """Split an HTTP response payload into body (after the header CRLFCRLF)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return payload
    return payload[sep + 4:]


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or gzip, incl. multi-member per-record gzip)
    into page rows. Non-``response`` records (warcinfo, request, metadata)
    are skipped, matching how Common Crawl consumers read crawls."""
    if data[:2] == b"\x1f\x8b":
        # concatenated gzip members decompress as one stream under GzipFile
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            data = fh.read()
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise WarcParseError(f"Expected WARC/ record header at {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcParseError("Unterminated WARC header block")
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as ex:
            raise WarcParseError("Missing/invalid Content-Length") from ex
        body_start = hdr_end + 4
        body = data[body_start:body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")) \
                .astimezone(timezone.utc).replace(tzinfo=None)
        except ValueError:
            ts = datetime(1970, 1, 1)
        html = _http_body(body)
        rows.append({
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": extract_page_text(html),
            "lang": "en",
        })
    return rows


def _rows_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def warc_dataset(paths: str | list[str]):
    """Ray Dataset over WARC file(s)/director(ies) in the pages schema.

    File-per-task parallelism: each WARC shard is read and expanded by one
    task; pass a directory of shards for a parallel crawl read."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=True)

    def expand(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in batch["bytes"]:
            rows.extend(parse_warc_bytes(blob.as_py()))
        return _rows_table(rows)

    return files.map_batches(expand, batch_format="pyarrow")


def write_warc(rows, path: str, compress: bool = True) -> int:
    """Write page rows (dicts with url/warc_ts/html) as WARC response
    records — one gzip member per record when ``compress`` (the standard
    ``.warc.gz`` layout). Returns the record count."""
    out = io.BytesIO()
    n = 0
    for r in rows:
        raw = r["html"]
        html = (raw if isinstance(raw, bytes)
                else raw.encode("utf-8") if isinstance(raw, str)
                else bytes(raw))
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        ts = r["warc_ts"]
        if isinstance(ts, str):
            ts = datetime.fromisoformat(ts.replace("Z", "+00:00"))
        iso = (ts if isinstance(ts, datetime) else ts.to_pydatetime()) \
            .strftime("%Y-%m-%dT%H:%M:%SZ")
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {iso}\r\n".encode()
            + f"WARC-Record-ID: <urn:uuid:rec-{n}>\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"\r\n"
        )
        record = hdr + http + _CRLF + _CRLF
        if compress:
            out.write(gzip.compress(record))
        else:
            out.write(record)
        n += 1
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
    return n
