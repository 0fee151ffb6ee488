"""N-Quads / TriG serialization for named-graph (quad) datasets.

The reference emits per-document Turtle files only
(kg_text_to_ttl/text_to_turtle_processor.py:66-83) — document provenance
lives in the FILE NAME.  At 100 TB that layout is a metadata bomb (one
file per document) and loses provenance the moment shards merge, so the
engine adds first-class named graphs: every triple carries a ``graph``
IRI (minted from ``doc_url``) and the sinks write the W3C line-oriented
**N-Quads** format — the natural large-scale RDF interchange layout
(splittable, no prefix state, one quad per line) — plus **TriG** for
human-readable grouped output.

Quad row layout everywhere in this module:
``(subject, predicate, object, object_kind, object_lang,
object_datatype, graph)`` — the engine triple row + a trailing graph
IRI (``None``/``""`` = default graph → an N-Triples-style line).

Rendering is N-Triples/N-Quads canonical-style: full IRIs in ``<>``,
no numeric/boolean shorthand, UCHAR escapes only where the grammar
requires them.
"""

from __future__ import annotations

import re
from typing import Iterable

from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
    KIND_IRI,
)

__all__ = ["serialize_nquads", "parse_nquads", "serialize_trig", "QuadRow"]

QuadRow = tuple  # (s, p, o, kind, lang, dtype, graph)

# N-Quads string escapes (ECHAR): backslash, quote, control whitespace
_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}
_ESCAPE_TABLE = str.maketrans(_ESCAPES)

# IRIREF forbids these raw characters; they must be %-encoded by the
# minter — the serializer asserts rather than silently emitting an
# unparseable line
_BAD_IRI = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def _esc(text: str) -> str:
    return text.translate(_ESCAPE_TABLE)


def _iri(value: str) -> str:
    if _BAD_IRI.search(value):
        raise ValueError(f"IRI contains characters forbidden by N-Quads: {value!r}")
    return f"<{value}>"


def _term(obj: str, kind: str, lang, dtype) -> str:
    if kind == KIND_IRI:
        return _iri(obj)
    out = f'"{_esc(obj)}"'
    if lang:
        return f"{out}@{lang}"
    if dtype:
        return f"{out}^^{_iri(dtype)}"
    return out


def serialize_nquads(rows: Iterable[QuadRow]) -> str:
    """Quad rows → deterministic N-Quads text (sorted, set-deduped).

    Sorting the RENDERED lines (not the tuples) makes the bytes
    independent of how ``None`` vs ``""`` lang/datatype fields arrived —
    the same partition-independence guarantee the TTL sink gives.
    """
    lines = set()
    for s, p, o, kind, lang, dtype, graph in rows:
        core = f"{_iri(s)} {_iri(p)} {_term(o, kind, lang or None, dtype or None)}"
        if graph:
            lines.add(f"{core} {_iri(graph)} .")
        else:
            lines.add(f"{core} .")
    return "\n".join(sorted(lines)) + ("\n" if lines else "")


_RE_LINE = re.compile(
    r"""^
    <(?P<s>[^>]*)>\s+
    <(?P<p>[^>]*)>\s+
    (?:
        <(?P<o_iri>[^>]*)>
      | "(?P<o_lit>(?:[^"\\]|\\.)*)"
        (?: @(?P<lang>[A-Za-z][A-Za-z0-9\-]*)
          | \^\^<(?P<dtype>[^>]*)>
        )?
    )
    (?:\s+<(?P<g>[^>]*)>)?
    \s*\.\s*$
""",
    re.VERBOSE,
)

_UNESC = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}
_RE_UNESC = re.compile(r"\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}|\\.")


def _unesc(text: str) -> str:
    def sub(m):
        tok = m.group(0)
        if len(tok) > 2:  # \uXXXX / \UXXXXXXXX (N-Quads UCHAR)
            return chr(int(tok[2:], 16))
        return _UNESC.get(tok, tok)

    return _RE_UNESC.sub(sub, text)


def parse_nquads(text: str) -> list[QuadRow]:
    """Line-oriented N-Quads parser (IRI terms + literals; no blank
    nodes — the engine never emits them).  Used by tests and the quad
    round-trip readers."""
    rows: list[QuadRow] = []
    for ln, line in enumerate(text.splitlines(), 1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _RE_LINE.match(line)
        if m is None:
            raise ValueError(f"unparseable N-Quads line {ln}: {line!r}")
        g = m.group("g") or ""
        if m.group("o_iri") is not None:
            rows.append((m.group("s"), m.group("p"), m.group("o_iri"),
                         "iri", None, None, g))
        else:
            rows.append((m.group("s"), m.group("p"), _unesc(m.group("o_lit")),
                         "literal", m.group("lang"), m.group("dtype"), g))
    return rows


def serialize_trig(rows: Iterable[QuadRow],
                   prefixes: dict[str, str] | None = None) -> str:
    """Quad rows → deterministic TriG text: one ``<graph> { … }`` block
    per named graph (sorted by graph IRI), default-graph triples as a
    top-level Turtle block.  The Turtle body inside each block reuses
    :func:`~cmc_knowledge_graph_text2ttl_ray.functions.turtle.serialize_triples`
    (same grouping/sorting → same determinism guarantees)."""
    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import serialize_triples

    prefixes = dict(prefixes or {})
    by_graph: dict[str, set] = {}
    for s, p, o, kind, lang, dtype, graph in rows:
        by_graph.setdefault(graph or "", set()).add(
            (s, p, o, kind, lang or None, dtype or None))

    chunks: list[str] = []
    for pfx in sorted(prefixes):
        chunks.append(f"@prefix {pfx}: <{prefixes[pfx]}> .")
    if chunks:
        chunks.append("")

    def body(triples, indent: str) -> str:
        # serialize without a prefix header (declared once at the top);
        # serialize_triples sorts internally with a None-safe key
        txt = serialize_triples(list(triples), {})
        return "\n".join(indent + ln if ln else "" for ln in txt.splitlines())

    default = by_graph.pop("", None)
    if default:
        chunks.append(body(default, ""))
        chunks.append("")
    for g in sorted(by_graph):
        chunks.append(f"{_iri(g)} {{")
        chunks.append(body(by_graph[g], "    "))
        chunks.append("}")
        chunks.append("")
    return "\n".join(chunks).rstrip("\n") + "\n"
