"""Deterministic synthesis of Common-Crawl-style web pages.

The engine's primary input (BASELINE.json ``input_hint``) is a Parquet table

    (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

No such corpus ships with the sandbox, so this module synthesizes one
deterministically (pure function of the row index — safe under any Ray
partitioning, resumable, and identical across processes). The HTML template
mix exercises every extraction-operator family of the workflow engine (see
FIXTURES.md §1): plain paragraphs, key-value property blocks, tables,
multi-root truncation cases, entity-mention pages with a deliberately hot
entity, HTML-escaped names, typed literals, and empty pages.

``text`` is the golden extracted text: the engine's HTML→text stage must
reproduce it byte-identically per url (the reference keeps only the first
``</html>`` root — kg_text_to_ttl/text_to_turtle_runner.py:118-128).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

__all__ = [
    "PAGES_SCHEMA",
    "extract_page_text",
    "synthesize_pages_table",
    "generate_pages_parquet",
    "pages_dataset",
]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH = datetime(2025, 3, 28, 0, 0, 0)

_COMPANIES = [
    "Acme Corp", "Globex GmbH", "Initech Inc", "Umbrella AG", "Stark Ltd",
    "Wayne Inc", "Hooli LLC", "Vandelay Inc", "Wonka Ltd", "Tyrell Corp",
    "Cyberdyne Inc", "Soylent Corp", "Aperture Ltd", "Sirius Corp",
    "Gringotts AG", "Duff Inc", "Oscorp Ltd", "Octan AG", "Zorg Inc",
    "Monarch Corp", "Nakatomi Corp", "Gekko Inc", "Prestige Ltd",
    "Macguffin GmbH", "Pinnacle LLC", "Vertex AG", "Quantum Ltd",
    "Helix Inc", "Orbital Corp", "Summit GmbH", "Cascade Ltd",
    "Meridian Inc", "Apex AG", "Horizon LLC", "Zenith Corp",
    "Atlas GmbH", "Borealis Ltd", "Cinder Inc", "Delta AG", "Ember Corp",
]
_HOT_COMPANY = "Acme Corp"  # appears on ~20% of pages → canonicalization skew

_CITIES = [
    "Berlin", "Paris", "Madrid", "Vienna", "Lisbon", "Dublin", "Oslo",
    "Prague", "Zurich", "Athens", "Warsaw", "Helsinki",
]

_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "en"]

_FILLER = (
    "market data value stream merge table sort filter window scan batch "
    "query group hash join index column vector row part order key"
).split()


def _rng(i: int, salt: int = 0) -> int:
    """Deterministic 32-bit mix of the row index (no wall clock, no RNG state)."""
    return zlib.crc32(f"{i}:{salt}".encode())


def _company(i: int, salt: int = 0) -> str:
    r = _rng(i, salt)
    if r % 5 == 0:
        return _HOT_COMPANY
    return _COMPANIES[r % len(_COMPANIES)]


def _variant(name: str, r: int) -> str:
    """Surface-form variants of an entity (case/whitespace) for the
    canonicalization stage to cluster."""
    v = r % 4
    if v == 0:
        return name
    if v == 1:
        return name.upper()
    if v == 2:
        head, _, tail = name.partition(" ")
        return f"{head}  {tail}" if tail else name
    return name


def _filler_sentence(i: int, k: int) -> str:
    r = _rng(i, 100 + k)
    words = [_FILLER[(r >> (j * 3)) % len(_FILLER)] for j in range(8)]
    return " ".join(words)


def _page_body(i: int) -> tuple[str, str]:
    """Return (body_html, extra_roots) for row i; template mix by i % 10."""
    t = i % 10
    r = _rng(i)
    c1 = _company(i, 1)
    c2 = _company(i, 2)
    city = _CITIES[r % len(_CITIES)]
    founded = 1900 + (r % 120)
    employees = 10 + (r % 9000)
    parts: list[str] = []
    extra = ""

    if t == 9:
        return ("", "")  # empty-content page
    parts.append(f"<h1>Report {i}</h1>")
    if t in (0, 1, 2):
        parts.append(
            f"<p>{c1} announced a partnership with {c2} yesterday. "
            f"{_filler_sentence(i, 0)}.</p>"
        )
        parts.append(f"<p>{c1} was founded in {founded}. {_filler_sentence(i, 1)}.</p>")
        parts.append(f"<p>The firm {c1} is headquartered in {city}.</p>")
    elif t == 3:
        parts.append(
            f"<p>Company: {c1}</p><p>Founded: {founded}</p>"
            f"<p>Employees: {employees}</p><p>City: {city}</p>"
        )
    elif t == 4:
        rows = "".join(
            f"<tr><td>{_company(i, 10 + k)}</td><td>{1900 + (_rng(i, 20 + k) % 120)}</td>"
            f"<td>{_CITIES[_rng(i, 30 + k) % len(_CITIES)]}</td></tr>"
            for k in range(2 + r % 3)
        )
        parts.append(
            "<table><tr><td>Company</td><td>Founded</td><td>City</td></tr>"
            f"{rows}</table>"
        )
    elif t == 5:
        parts.append(f"<p>{c1} was founded in {founded}.</p>")
        # Second root: must be truncated away by extraction; the fact in it
        # must never be extracted.
        extra = (
            f"<html><body><p>{c2} was founded in 1600.</p></body></html>"
        )
    elif t == 6:
        v1 = _variant(_HOT_COMPANY, r)
        v2 = _variant(c2, _rng(i, 7))
        parts.append(f"<p>Profile of {v1}. Also covering {v2}.</p>")
        parts.append(f"<p>{v1} is headquartered in {city}.</p>")
    elif t == 7:
        parts.append(f"<p>Johnson &amp; Sons Ltd works with {c1}.</p>")
    elif t == 8:
        parts.append(
            f"<p>Revenue: {r % 500}.{r % 10} MEUR</p><p>Active: true</p>"
            f"<p>Audited on 2024-0{1 + r % 9}-1{r % 10}</p>"
            f"<p>{c1} filed the report.</p>"
        )
    parts.append(f"<p>{_filler_sentence(i, 2)}.</p>")
    return ("\n".join(parts), extra)


def synthesize_page(i: int) -> dict:
    """One deterministic page row (pure function of i)."""
    body, extra = _page_body(i)
    lang = _LANGS[_rng(i, 3) % len(_LANGS)]
    if body:
        html = (
            f'<html><head><title>Page {i}</title></head>\n'
            f'<body>\n<div class="page" pageno="1">\n{body}\n</div>\n</body></html>'
        ) + extra
    else:
        html = ""
    return {
        "url": f"https://site{i % 97}.example/page/{i}",
        "warc_ts": _EPOCH + timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": extract_page_text(html.encode("utf-8")),
        "lang": lang,
    }


def extract_page_text(html: bytes | None) -> str:
    """Golden HTML→text rule: decode UTF-8 and keep only the first
    ``</html>`` root (reference text_to_turtle_runner.py:124-128; there a
    missing root keeps ``content[0:6]`` — we define it as empty instead)."""
    if not html:
        return ""
    s = html.decode("utf-8")
    pos = s.find("</html>")
    if pos < 0:
        return ""
    return s[: pos + 7]


def synthesize_pages_table(indexes: np.ndarray | list[int]) -> pa.Table:
    """Batch synthesis: row indexes → Arrow table in PAGES_SCHEMA."""
    rows = [synthesize_page(int(i)) for i in indexes]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def generate_pages_parquet(out_dir: str, n_rows: int, num_files: int = 16) -> str:
    """Materialize a synthetic corpus as partitioned Parquet (one file per
    shard → ≥num_files input fragments for resume/checkpoint tests).

    Pure pyarrow writer (no Ray needed); idempotent: skips work if the
    directory already holds the expected marker.
    """
    import os

    marker = os.path.join(out_dir, f"_SYNTH_{n_rows}_{num_files}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq

    per = (n_rows + num_files - 1) // num_files
    for f in range(num_files):
        lo, hi = f * per, min((f + 1) * per, n_rows)
        if lo >= hi:
            break
        table = synthesize_pages_table(np.arange(lo, hi))
        pq.write_table(table, os.path.join(out_dir, f"pages-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir


def pages_dataset(n_rows: int, override_num_blocks: int | None = None):
    """Synthesize pages as a streaming Ray Dataset (no materialized files):
    ``range(n) → map_batches(synthesize)``. Deterministic per row index."""
    import ray.data

    ds = ray.data.range(n_rows, override_num_blocks=override_num_blocks)

    def synth(batch: pa.Table) -> pa.Table:
        return synthesize_pages_table(batch["id"].to_numpy())

    # batch_size bounds fused-task granularity downstream: ~512 pages per
    # task keeps a 32-way pool saturated on 50k-row inputs
    return ds.map_batches(synth, batch_format="pyarrow", batch_size=512)


def pages_from_documents(sf_dir: str, doc_pred=None):
    """Derive a deterministic pages table from the driver-provided
    ``documents`` table (so correctness queries are tied to sf_dir): the
    document text becomes a filler paragraph and the synthetic facts are a
    pure function of doc_id — same template mix as :func:`synthesize_page`.

    ``doc_pred``: optional vectorized row filter applied at the read —
    ``fn(pa.Table) -> boolean mask`` over the documents batch (used to
    carve crawl shards, e.g. ``doc_id % 10`` splits, without a second
    source implementation).
    """
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    if doc_pred is not None:
        ds = ds.map_batches(lambda t: t.filter(doc_pred(t)),
                            batch_format="pyarrow")

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        fillers = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        rows = []
        for doc_id, filler, lang in zip(ids, fillers, langs):
            body, extra = _page_body(int(doc_id))
            if body:
                html = (
                    f'<html><head><title>Doc {doc_id}</title></head>\n'
                    f'<body>\n<div class="page" pageno="1">\n{body}\n'
                    f"<p>{filler}</p>\n</div>\n</body></html>"
                ) + extra
            else:
                html = ""
            raw = html.encode("utf-8")
            rows.append(
                {
                    "url": f"https://docs.example/{doc_id}",
                    "warc_ts": _EPOCH + timedelta(seconds=int(doc_id)),
                    "html": raw,
                    "text": extract_page_text(raw),
                    "lang": lang,
                }
            )
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=512)
