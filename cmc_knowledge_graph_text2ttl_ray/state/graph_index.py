"""In-memory indexed triple store + SPARQL-SELECT-subset evaluator.

Replaces the reference's rdflib-backed ``LocalQueryHandler``
(reference: kg_text_to_ttl/text_to_turtle_processor.py:168-214) for the
``select:`` workflow operation. The store is small broadcast state: built once
on the driver (or in an actor's ``__init__``) from a Turtle file and shared
read-only by every extraction actor — the engine's entity-linking candidate
index.

Supported query subset (what rule workflows actually need):

    PREFIX pfx: <iri>
    SELECT ?a ?b WHERE { ?a pfx:p ?b . ?b pfx:q "literal" . }

- triple patterns joined by nested index lookups (SPO/POS/OSP indexes),
- terms: ``?var``, ``<iri>``, ``prefix:local``, ``"literal"`` (@lang /
  ^^datatype), numbers, booleans, ``a``.
- no OPTIONAL / FILTER / UNION (compile-time error) — workflows that need
  more push the logic into the workflow body instead.

Results are deterministic: rows are returned in sorted order.
"""

from __future__ import annotations

import re
from typing import Iterable

from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
    TripleRow,
    TurtleParseError,
    parse_turtle,
)

__all__ = ["GraphIndex", "QueryError"]


class QueryError(Exception):
    pass


_WILD = None

_RE_PREFIX_DECL = re.compile(r"PREFIX\s+([A-Za-z_][\w\-]*):\s*<([^>]*)>", re.IGNORECASE)
_RE_WHERE = re.compile(r"\{(.*)\}", re.DOTALL)
_RE_TERM = re.compile(
    r"""\s*(?:
      (?P<var>\?[A-Za-z_][\w]*)
    | (?P<iri><[^>]*>)
    | (?P<string>"(?:[^"\\]|\\.)*")(?:@(?P<lang>[A-Za-z][\w\-]*)|\^\^(?P<dt><[^>]*>|[A-Za-z_][\w\-]*:[\w.\-]+))?
    | (?P<kw>\ba\b|\btrue\b|\bfalse\b)
    | (?P<prefixed>[A-Za-z_][\w\-]*:[\w][\w.\-]*)
    | (?P<number>[+-]?\d+(?:\.\d+)?)
    )\s*""",
    re.VERBOSE,
)


class GraphIndex:
    """Triple store with SPO/POS/OSP hash indexes over object *lexical* forms.

    Matching keys are the plain string forms: IRIs match their text, literals
    match their lexical form (lang/datatype are carried but not part of the
    join key — the same relaxation the workflows rely on when binding values
    extracted from text against ontology labels).
    """

    def __init__(self, triples: Iterable[TripleRow] = (), prefixes: dict[str, str] | None = None):
        self._triples: list[TripleRow] = []
        self._by_s: dict[str, list[int]] = {}
        self._by_p: dict[str, list[int]] = {}
        self._by_o: dict[str, list[int]] = {}
        self.prefixes: dict[str, str] = dict(prefixes or {})
        for t in triples:
            self.add(t)

    @classmethod
    def from_turtle(cls, text: str) -> "GraphIndex":
        triples, prefixes = parse_turtle(text)
        return cls(triples, prefixes)

    @classmethod
    def from_file(cls, path: str) -> "GraphIndex":
        with open(path, "r", encoding="utf8") as fh:
            return cls.from_turtle(fh.read())

    def add(self, t: TripleRow) -> None:
        idx = len(self._triples)
        self._triples.append(tuple(t))
        self._by_s.setdefault(t[0], []).append(idx)
        self._by_p.setdefault(t[1], []).append(idx)
        self._by_o.setdefault(t[2], []).append(idx)

    def __len__(self) -> int:
        return len(self._triples)

    def match(self, s: str | None, p: str | None, o: str | None) -> list[TripleRow]:
        """All triples matching the pattern; ``None`` is a wildcard."""
        candidates: list[int] | None = None
        for key, index in ((s, self._by_s), (p, self._by_p), (o, self._by_o)):
            if key is not None:
                hits = index.get(key, [])
                if candidates is None:
                    candidates = hits
                else:
                    hit_set = set(hits)
                    candidates = [i for i in candidates if i in hit_set]
                if not candidates:
                    return []
        if candidates is None:
            return list(self._triples)
        return [self._triples[i] for i in candidates]

    # -- SPARQL-subset SELECT ------------------------------------------------

    def query(self, sparql: str) -> list[dict[str, str]]:
        """Evaluate a SELECT query; returns sorted rows of var → string."""
        prefixes = dict(self.prefixes)
        for m in _RE_PREFIX_DECL.finditer(sparql):
            prefixes[m.group(1)] = m.group(2)
        for bad in ("OPTIONAL", "FILTER", "UNION", "MINUS"):
            if re.search(rf"\b{bad}\b", sparql, re.IGNORECASE):
                raise QueryError(f"{bad} is not supported by the local query subset")
        mw = _RE_WHERE.search(sparql)
        if mw is None:
            raise QueryError(f"No {{...}} body found in query: {sparql[:120]}")
        patterns = self._parse_patterns(mw.group(1), prefixes)
        rows = self._join(patterns, {})
        # deterministic order
        rows.sort(key=lambda r: tuple(sorted(r.items())))
        return rows

    def _parse_patterns(
        self, body: str, prefixes: dict[str, str]
    ) -> list[tuple[tuple[str, str], ...]]:
        patterns = []
        for stmt in self._split_statements(body):
            terms = []
            pos = 0
            while pos < len(stmt):
                m = _RE_TERM.match(stmt, pos)
                if m is None:
                    raise QueryError(f"Cannot parse pattern term at: {stmt[pos:pos+40]!r}")
                pos = m.end()
                terms.append(self._term(m, prefixes))
            if len(terms) != 3:
                raise QueryError(f"Pattern is not a triple: {stmt!r}")
            patterns.append(tuple(terms))
        if not patterns:
            raise QueryError("Empty WHERE body")
        return patterns

    @staticmethod
    def _split_statements(body: str) -> list[str]:
        stmts, cur, in_str, in_iri, esc = [], [], False, False, False
        for i, ch in enumerate(body):
            if in_str:
                cur.append(ch)
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if in_iri:
                # '.' inside <...> is part of the IRI, never a separator
                cur.append(ch)
                if ch == ">":
                    in_iri = False
                continue
            if ch == '"':
                in_str = True
                cur.append(ch)
            elif ch == "<":
                in_iri = True
                cur.append(ch)
            elif ch == "." and (i + 1 >= len(body) or body[i + 1] in " \t\r\n}"):
                # a '.' mid-token (pfx:a.b, 1.5) is part of the term; the
                # statement separator is always followed by whitespace/'}'
                stmt = "".join(cur).strip()
                if stmt:
                    stmts.append(stmt)
                cur = []
            else:
                cur.append(ch)
        tail = "".join(cur).strip()
        if tail:
            stmts.append(tail)
        return stmts

    @staticmethod
    def _term(m: "re.Match[str]", prefixes: dict[str, str]) -> tuple[str, str]:
        if m.group("var"):
            return ("var", m.group("var")[1:])
        if m.group("iri"):
            return ("const", m.group("iri")[1:-1])
        if m.group("string"):
            raw = m.group("string")[1:-1]
            raw = re.sub(r"\\(.)", lambda mm: {"n": "\n", "t": "\t", "r": "\r"}.get(mm.group(1), mm.group(1)), raw)
            return ("const", raw)
        if m.group("kw"):
            kw = m.group("kw")
            if kw == "a":
                return ("const", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
            return ("const", kw)
        if m.group("prefixed"):
            pfx, local = m.group("prefixed").split(":", 1)
            if pfx not in prefixes:
                raise QueryError(f"Unknown prefix in query: {pfx}")
            return ("const", prefixes[pfx] + local)
        if m.group("number"):
            return ("const", m.group("number"))
        raise QueryError("unreachable term")

    def _join(
        self,
        patterns: list[tuple[tuple[str, str], ...]],
        binding: dict[str, str],
    ) -> list[dict[str, str]]:
        if not patterns:
            return [dict(binding)]
        (skind, sval), (pkind, pval), (okind, oval) = patterns[0]

        def bound(kind: str, val: str) -> str | None:
            if kind == "const":
                return val
            return binding.get(val)

        s, p, o = bound(skind, sval), bound(pkind, pval), bound(okind, oval)
        out: list[dict[str, str]] = []
        for t in self.match(s, p, o):
            new_binding = dict(binding)
            ok = True
            for kind, val, got in ((skind, sval, t[0]), (pkind, pval, t[1]), (okind, oval, t[2])):
                if kind == "var":
                    prev = new_binding.get(val)
                    if prev is None:
                        new_binding[val] = got
                    elif prev != got:
                        ok = False
                        break
            if ok:
                out.extend(self._join(patterns[1:], new_binding))
        return out
