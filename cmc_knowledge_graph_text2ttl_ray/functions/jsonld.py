"""Flat (expanded-style) JSON-LD serialization of triple rows.

The third interchange surface beside Turtle (functions/turtle.py) and
N-Quads/TriG (functions/nquads.py): one JSON array of node objects —
``{"@id": subject, predicate: [values…]}`` — with IRI objects as
``{"@id": …}``, plain literals as ``{"@value": …}`` (plus ``@language``
/ ``@type`` when present), and ``rdf:type`` IRIs lifted to ``"@type"``,
per the JSON-LD 1.1 expanded document form. No ``@context`` is emitted
(expanded form is context-free), so any JSON-LD processor can consume
the output without resolution.

Deterministic: subjects, predicates and values sort lexicographically,
so identical triple sets give identical bytes regardless of input
partitioning — same contract as ``serialize_triples``.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

__all__ = ["serialize_jsonld", "parse_jsonld"]

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _obj_value(row) -> dict:
    _, _, o, kind, lang, dt = (list(row) + [None, None, None])[:6]
    if kind == "iri":
        return {"@id": o}
    v: dict = {"@value": o}
    if lang:
        v["@language"] = lang
    elif dt:
        v["@type"] = dt
    return v


def serialize_jsonld(triples: Iterable, indent: int | None = None) -> str:
    """Triple rows (5/6-tuples or (s, p, o, kind) rows) → expanded
    JSON-LD text. Duplicates set-dedup (graph set semantics)."""
    uniq = sorted(
        {tuple(list(t) + [None] * (6 - len(t))) for t in triples},
        key=lambda t: tuple("" if x is None else str(x) for x in t),
    )
    nodes: dict[str, dict] = {}
    for row in uniq:
        s, p = row[0], row[1]
        node = nodes.setdefault(s, {"@id": s})
        if p == _RDF_TYPE and row[3] == "iri":
            node.setdefault("@type", []).append(row[2])
        else:
            node.setdefault(p, []).append(_obj_value(row))
    out = [nodes[s] for s in sorted(nodes)]
    return json.dumps(out, indent=indent, sort_keys=True,
                      ensure_ascii=False) + "\n"


def parse_jsonld(text: str) -> list[tuple]:
    """Expanded JSON-LD text → sorted distinct triple rows
    ``(s, p, o, kind, lang, datatype)``. Accepts a top-level array or a
    single node object; nested node objects (inline ``{"@id": …}`` with
    extra keys) are NOT expanded — the flat form this module writes."""
    doc = json.loads(text)
    if isinstance(doc, dict):
        doc = doc.get("@graph", [doc])
    rows: set[tuple] = set()
    for node in doc:
        s = node["@id"]
        for key, vals in node.items():
            if key == "@id":
                continue
            if key == "@type":
                if isinstance(vals, str):
                    vals = [vals]
                for t in vals:
                    rows.add((s, _RDF_TYPE, t, "iri", None, None))
                continue
            if not isinstance(vals, list):
                vals = [vals]
            for v in vals:
                if isinstance(v, dict) and "@id" in v and "@value" not in v:
                    rows.add((s, key, v["@id"], "iri", None, None))
                elif isinstance(v, dict):
                    rows.add((s, key, str(v["@value"]), "literal",
                              v.get("@language"), v.get("@type")))
                else:
                    rows.add((s, key, str(v), "literal", None, None))
    return sorted(rows, key=lambda t: tuple("" if x is None else str(x)
                                            for x in t))
