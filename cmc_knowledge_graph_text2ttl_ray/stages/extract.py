"""HTML → text extraction stage (stateless ``map_batches`` transform).

Engine analogue of the reference's Tika/PyMuPDF document-to-XHTML boundary
(kg_text_to_ttl/text_to_turtle_runner.py:36-141): our corpus is already-fetched
web pages, so the stage decodes the ``html: binary`` column and keeps only the
first ``</html>`` root (truncation rule :124-128). The per-row invariant is
byte-identical output vs the golden ``text`` column.

Hot-path design: the batch stays Arrow end-to-end. The truncation fix-up
(multi-root pages, a small minority) is detected with vectorized kernels
(``find_substring`` / ``binary_length``) and only the flagged rows take a
Python slice; everything else is a zero-copy cast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["extract_text_batch", "add_extracted_text"]

_CLOSE = "</html>"


def _extract_column(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    # Zero-copy-ish: binary → large_string (validates UTF-8 once). A single
    # invalid-UTF-8 row must not fail the block (real web corpora contain
    # mislabeled encodings): fall back to per-row decode, mapping invalid
    # rows to "" so they surface downstream as empty-text diagnostics.
    try:
        s = pc.cast(html, pa.large_string())
    except pa.ArrowInvalid:
        decoded = []
        for v in html.to_pylist():
            if v is None:
                decoded.append(None)
                continue
            try:
                decoded.append(v.decode("utf-8"))
            except UnicodeDecodeError:
                decoded.append("")
        s = pa.array(decoded, pa.large_string())
    pos = pc.find_substring(s, _CLOSE)
    end = pc.add(pos, len(_CLOSE))
    nbytes = pc.binary_length(s)
    # Fast path: the document is exactly one <html> root (or empty).
    needs_fix = pc.or_(pc.less(pos, 0), pc.not_equal(end, nbytes))
    needs_fix = pc.fill_null(needs_fix, True)
    mask = needs_fix.to_numpy(zero_copy_only=False)
    flagged = np.flatnonzero(mask)
    if len(flagged) == 0:
        return pc.fill_null(s, "")
    fixed: list[str | None] = [None] * len(s)
    for i in flagged:
        v = s[int(i)].as_py()
        if v is None:
            fixed[int(i)] = ""
            continue
        p = v.find(_CLOSE)
        fixed[int(i)] = v[: p + len(_CLOSE)] if p >= 0 else ""
    return pc.if_else(needs_fix, pa.array(fixed, type=pa.large_string()), s)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Replace/compute the ``text`` column from ``html`` (pyarrow batch)."""
    text = pc.cast(_extract_column(batch["html"]), pa.string())
    if "text" in batch.column_names:
        idx = batch.column_names.index("text")
        return batch.set_column(idx, "text", text)
    return batch.append_column("text", text)


def add_extracted_text(ds, batch_size: int = 1024):
    """Dataset → Dataset with the extracted ``text`` column (streaming,
    stateless tasks, Arrow zero-copy)."""
    return ds.map_batches(extract_text_batch, batch_format="pyarrow", batch_size=batch_size)
