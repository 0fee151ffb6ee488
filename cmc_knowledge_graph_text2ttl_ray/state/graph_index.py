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
  ^^datatype), numbers, booleans, ``a``,
- ``OPTIONAL { }`` / ``FILTER( )`` / ``{ } UNION { }`` / ``MINUS { }`` /
  ``BIND(expr AS ?v)`` / ``VALUES ?v { … }`` (and the tuple form with
  ``UNDEF``), with a practical FILTER-expression subset (comparisons,
  regex, bound, contains/strstarts/strends, str/ucase/lcase/strlen,
  ``! && ||``), plus ``SELECT DISTINCT``, projection, ``ORDER BY``,
  ``LIMIT`` / ``OFFSET``.

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


def _string_mask(text: str) -> list[bool]:
    """Per-character mask: True where the character sits inside a quoted
    string literal (escape-aware)."""
    mask = [False] * len(text)
    in_str, esc = False, False
    for i, ch in enumerate(text):
        if in_str:
            mask[i] = True
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
        elif ch == '"':
            mask[i] = True
            in_str = True
    return mask


def _minus_match(b: dict, s: dict) -> bool:
    """SPARQL MINUS compatibility: shared domain, all shared vars equal."""
    shared = b.keys() & s.keys()
    return bool(shared) and all(b[k] == s[k] for k in shared)


_FILTER_TOKEN = re.compile(
    r"""\s*(?:
      (?P<lpar>\()|(?P<rpar>\))|(?P<comma>,)
    | (?P<or>\|\|)|(?P<and>&&)
    | (?P<op>!=|<=|>=|=|<|>)|(?P<not>!)
    | (?P<var>\?[A-Za-z_]\w*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<number>[+-]?\d+(?:\.\d+)?)
    | (?P<iri><[^>]*>)
    | (?P<name>[A-Za-z_][\w\-]*(?::[\w][\w.\-]*)?)
    )""",
    re.VERBOSE,
)

_FILTER_FUNCS = {"regex", "bound", "contains", "strstarts", "strends", "str",
                 "ucase", "lcase", "strlen"}


def _compile_filter(expr: str, prefixes: dict[str, str]):
    """Compile a FILTER expression subset to a ``binding → bool`` closure.

    Supported: comparisons (= != < <= > >=; numeric when both sides parse as
    numbers, else string), ``regex(?v, "pat"[, "i"])``, ``bound(?v)``,
    ``contains/strstarts/strends(?v, "s")``, ``str/ucase/lcase/strlen``,
    ``! && ||`` and parentheses.
    """
    tokens = []
    pos = 0
    while pos < len(expr):
        m = _FILTER_TOKEN.match(expr, pos)
        if m is None or m.end() == m.start():
            if expr[pos:].strip() == "":
                break
            raise QueryError(f"Cannot tokenize FILTER at: {expr[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        tokens.append((kind, m.group(kind)))

    i = 0

    def peek(kind=None):
        if i >= len(tokens):
            return None
        if kind is not None and tokens[i][0] != kind:
            return None
        return tokens[i]

    def take(kind=None):
        nonlocal i
        t = peek(kind)
        if t is None:
            raise QueryError(f"Unexpected FILTER syntax near token {i} in {expr!r}")
        i += 1
        return t

    def parse_or():
        left = parse_and()
        while peek("or"):
            take("or")
            right = parse_and()
            l_, r_ = left, right
            left = lambda b, l_=l_, r_=r_: bool(l_(b)) or bool(r_(b))
        return left

    def parse_and():
        left = parse_unary()
        while peek("and"):
            take("and")
            right = parse_unary()
            l_, r_ = left, right
            left = lambda b, l_=l_, r_=r_: bool(l_(b)) and bool(r_(b))
        return left

    def parse_unary():
        if peek("not"):
            take("not")
            inner = parse_unary()
            return lambda b, inner=inner: not bool(inner(b))
        if peek("lpar"):
            take("lpar")
            inner = parse_or()
            take("rpar")
            return maybe_comparison(inner)
        return maybe_comparison(parse_operand())

    def maybe_comparison(left):
        if not peek("op"):
            return left
        op = take("op")[1]
        right = parse_operand()

        def cmp(b, left=left, right=right, op=op):
            lv, rv = left(b), right(b)
            if lv is None or rv is None:
                return False
            try:
                ln, rn = float(lv), float(rv)
                lv, rv = ln, rn
            except (TypeError, ValueError):
                lv, rv = str(lv), str(rv)
            return {
                "=": lv == rv, "!=": lv != rv, "<": lv < rv,
                "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv,
            }[op]

        return cmp

    def parse_operand():
        t = peek()
        if t is None:
            raise QueryError(f"FILTER expression truncated: {expr!r}")
        kind, val = t
        if kind == "var":
            take()
            name = val[1:]
            return lambda b, name=name: b.get(name)
        if kind == "string":
            take()
            raw = re.sub(r"\\(.)",
                         lambda mm: {"n": "\n", "t": "\t", "r": "\r"}.get(
                             mm.group(1), mm.group(1)), val[1:-1])
            return lambda b, raw=raw: raw
        if kind == "number":
            take()
            return lambda b, val=val: val
        if kind == "iri":
            take()
            return lambda b, v=val[1:-1]: v
        if kind == "name":
            take()
            lname = val.lower()
            if lname in _FILTER_FUNCS:
                return parse_call(lname)
            if lname in ("true", "false"):
                return lambda b, r=(lname == "true"): r
            if ":" in val:
                pfx, local = val.split(":", 1)
                if pfx not in prefixes:
                    raise QueryError(f"Unknown prefix in FILTER: {pfx}")
                full = prefixes[pfx] + local
                return lambda b, full=full: full
            raise QueryError(f"Unknown FILTER function or term: {val}")
        if kind == "lpar":
            take()
            inner = parse_or()
            take("rpar")
            return inner
        raise QueryError(f"Unexpected FILTER token: {val!r}")

    def parse_call(fname: str):
        take("lpar")
        args = [parse_or()]
        while peek("comma"):
            take("comma")
            args.append(parse_or())
        take("rpar")
        if fname == "bound":
            a = args[0]
            return lambda b, a=a: a(b) is not None
        if fname == "regex":
            a, p = args[0], args[1]
            flags = args[2] if len(args) > 2 else None

            def rx(b, a=a, p=p, flags=flags):
                v = a(b)
                if v is None:
                    return False
                f = re.IGNORECASE if (flags and "i" in str(flags(b))) else 0
                return re.search(str(p(b)), str(v), f) is not None

            return rx
        if fname in ("contains", "strstarts", "strends"):
            a, s = args[0], args[1]

            def sf(b, a=a, s=s, fname=fname):
                v, sub = a(b), s(b)
                if v is None or sub is None:
                    return False
                v, sub = str(v), str(sub)
                return {"contains": sub in v,
                        "strstarts": v.startswith(sub),
                        "strends": v.endswith(sub)}[fname]

            return sf
        if fname == "str":
            a = args[0]
            return lambda b, a=a: None if a(b) is None else str(a(b))
        if fname == "ucase":
            a = args[0]
            return lambda b, a=a: None if a(b) is None else str(a(b)).upper()
        if fname == "lcase":
            a = args[0]
            return lambda b, a=a: None if a(b) is None else str(a(b)).lower()
        if fname == "strlen":
            a = args[0]
            return lambda b, a=a: None if a(b) is None else str(len(str(a(b))))
        raise QueryError(f"Unsupported FILTER function: {fname}")

    fn = parse_or()
    if i != len(tokens):
        raise QueryError(f"Trailing tokens in FILTER: {expr!r}")
    return fn


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
        """Evaluate a SELECT query; returns sorted rows of var → string.

        Supports basic graph patterns plus ``OPTIONAL { }``, ``FILTER( )``,
        ``{ } UNION { }`` and ``MINUS { }`` (round-1 verdict: reference
        workflows rely on FILTER for value constraints,
        text_to_turtle_processor.py:2107-2202 runs full rdflib SPARQL).
        FILTERs are applied at the end of their group, per SPARQL scoping.
        """
        prefixes = dict(self.prefixes)
        for m in _RE_PREFIX_DECL.finditer(sparql):
            prefixes[m.group(1)] = m.group(2)
        start = sparql.find("{")
        if start < 0:
            raise QueryError(f"No {{...}} body found in query: {sparql[:120]}")
        body, end = self._read_group(sparql, start)
        elements = self._parse_group(body, prefixes)
        rows = self._eval_group(elements, [{}])

        # SPARQL modifier order: ORDER BY (may reference non-projected
        # vars) → projection → DISTINCT → OFFSET/LIMIT.
        tail = sparql[end:]
        m_ord = re.search(
            r"ORDER\s+BY\s+((?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+)"
            r"(?:\s+(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+))*)",
            tail, re.IGNORECASE)
        if m_ord:
            keys = re.findall(r"(?:(ASC|DESC)\s*\(\s*\?(\w+)\s*\)|\?(\w+))",
                              m_ord.group(1), re.IGNORECASE)
            # stable multi-key sort: apply keys right-to-left. Values
            # compare numerically when both parse as numbers (matching the
            # FILTER comparator); unbound sorts LOWEST per SPARQL, so it
            # leads under ASC and trails under DESC.
            for direction, v1, v2 in reversed(keys):
                var = v1 or v2
                desc = bool(direction) and direction.upper() == "DESC"
                unbound = [r for r in rows if var not in r]
                bound = [r for r in rows if var in r]

                def sort_key(r, var=var):
                    v = r[var]
                    try:
                        return (0, float(v), "")
                    except (TypeError, ValueError):
                        return (1, 0.0, str(v))

                bound.sort(key=sort_key, reverse=desc)
                rows = (bound + unbound) if desc else (unbound + bound)
        else:
            rows.sort(key=lambda r: tuple(sorted(r.items())))  # deterministic

        # SELECT clause: projection + DISTINCT. The optional WHERE keyword
        # must be whitespace-separated so a variable named ?where is not
        # half-swallowed.
        m_sel = re.search(
            r"\bSELECT\s+(DISTINCT\s+)?(.*?)\s*(?:(?<=\s)WHERE\s*)?\{",
            sparql, re.IGNORECASE | re.DOTALL)
        distinct = bool(m_sel and m_sel.group(1))
        proj = (m_sel.group(2).split() if m_sel else [])
        sel_vars = [v[1:] for v in proj if v.startswith("?")]
        if sel_vars and "*" not in proj:
            rows = [{v: r[v] for v in sel_vars if v in r} for r in rows]
        if distinct:
            seen, uniq = set(), []
            for r in rows:
                key = tuple(sorted(r.items()))
                if key not in seen:
                    seen.add(key)
                    uniq.append(r)
            rows = uniq

        m_off = re.search(r"\bOFFSET\s+(\d+)", tail, re.IGNORECASE)
        if m_off:
            rows = rows[int(m_off.group(1)):]
        m_lim = re.search(r"\bLIMIT\s+(\d+)", tail, re.IGNORECASE)
        if m_lim:
            rows = rows[: int(m_lim.group(1))]
        return rows

    # -- group parsing -------------------------------------------------------

    @staticmethod
    def _read_group(text: str, open_idx: int) -> tuple[str, int]:
        """Return (body, index-after-closing-brace) for the group opening at
        ``open_idx`` (which must point at '{'); brace/string aware."""
        depth, in_str, esc = 0, False, False
        for i in range(open_idx, len(text)):
            ch = text[i]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return text[open_idx + 1 : i], i + 1
        raise QueryError("Unbalanced braces in query group")

    def _parse_group(self, body: str, prefixes: dict[str, str]) -> list[tuple]:
        """Parse a group body into a list of elements:
        ("bgp", patterns) | ("optional", elements) | ("filter", fn) |
        ("union", [elements, ...]) | ("minus", elements)."""
        elements: list[tuple] = []
        pos, n = 0, len(body)
        plain: list[str] = []  # accumulates plain triple text

        def flush_plain():
            text = "".join(plain).strip()
            plain.clear()
            if text:
                elements.append(("bgp", self._parse_patterns(text, prefixes)))

        # keywords/braces inside quoted literals are DATA; and '?filter' is a
        # variable, not the FILTER keyword — hence the string-span mask and
        # the left lookbehind
        in_str = _string_mask(body)
        kw = re.compile(r"(?<![?\w])(OPTIONAL|FILTER|MINUS|UNION|BIND|VALUES)\b|\{",
                        re.IGNORECASE)
        while pos < n:
            m = kw.search(body, pos)
            while m is not None and in_str[m.start()]:
                plain.append(body[pos : m.start() + 1])
                pos = m.start() + 1
                m = kw.search(body, pos)
            if m is None:
                plain.append(body[pos:])
                break
            plain.append(body[pos : m.start()])
            tok = m.group(0)
            if tok == "{":
                # bare subgroup: either the left arm of UNION or a plain group
                flush_plain()
                sub, pos = self._read_group(body, m.start())
                arms = [self._parse_group(sub, prefixes)]
                while True:
                    um = re.match(r"\s*UNION\s*", body[pos:], re.IGNORECASE)
                    if um is None:
                        break
                    brace = pos + um.end()
                    if brace >= n or body[brace] != "{":
                        raise QueryError("UNION must be followed by a group")
                    sub, pos = self._read_group(body, brace)
                    arms.append(self._parse_group(sub, prefixes))
                # a plain subgroup is simply a 1-arm union
                elements.append(("union", arms))
                continue
            word = tok.upper()
            if word == "UNION":
                raise QueryError("UNION without a preceding group")
            flush_plain()
            rest = body[m.end() :]
            ws = len(rest) - len(rest.lstrip())
            nxt = m.end() + ws
            if word in ("OPTIONAL", "MINUS"):
                if nxt >= n or body[nxt] != "{":
                    raise QueryError(f"{word} must be followed by a group")
                sub, pos = self._read_group(body, nxt)
                elements.append((word.lower(), self._parse_group(sub, prefixes)))
            elif word == "FILTER":
                if nxt >= n or body[nxt] != "(":
                    raise QueryError("FILTER must be followed by (expr)")
                expr, pos = self._read_parens(body, nxt)
                elements.append(("filter", _compile_filter(expr, prefixes)))
            elif word == "BIND":
                if nxt >= n or body[nxt] != "(":
                    raise QueryError("BIND must be followed by (expr AS ?var)")
                inner, pos = self._read_parens(body, nxt)
                mb = re.search(r"\s+AS\s+\?(\w+)\s*$", inner, re.IGNORECASE)
                if mb is None:
                    raise QueryError("BIND requires 'expr AS ?var'")
                fn = _compile_filter(inner[: mb.start()], prefixes)
                elements.append(("bind", (mb.group(1), fn)))
            else:  # VALUES
                rest2 = body[nxt:]
                mv = re.match(r"(\?(\w+)|\(\s*((?:\?\w+\s*)+)\))\s*", rest2)
                if mv is None:
                    raise QueryError("VALUES requires ?var or (?v1 ?v2 ...)")
                vars_ = ([mv.group(2)] if mv.group(2)
                         else re.findall(r"\?(\w+)", mv.group(3)))
                brace = nxt + mv.end()
                if brace >= n or body[brace] != "{":
                    raise QueryError("VALUES requires a { data } block")
                block, pos = self._read_group(body, brace)
                rows = self._parse_values_block(block, vars_, prefixes)
                elements.append(("values", (vars_, rows)))
        flush_plain()
        if not elements:
            raise QueryError("Empty WHERE body")
        return elements

    def _parse_values_block(self, block: str, vars_: list[str],
                            prefixes: dict[str, str]) -> list[tuple]:
        """VALUES data rows: single-var form (flat terms) or tuple form
        ``( t1 t2 ) ( ... )``; UNDEF → None."""
        rows: list[tuple] = []
        pos = 0
        block = block.strip()
        if len(vars_) == 1:
            while pos < len(block):
                mu = re.match(r"\s*UNDEF(?![\w:])\s*", block[pos:])
                if mu:
                    rows.append((None,))
                    pos += mu.end()
                    continue
                m = _RE_TERM.match(block, pos)
                if m is None or m.end() == pos:
                    break
                pos = m.end()
                rows.append((self._term(m, prefixes)[1],))
            return rows
        while pos < len(block):
            ws = re.match(r"\s*", block[pos:])
            pos += ws.end()
            if pos >= len(block):
                break
            if block[pos] != "(":
                raise QueryError("VALUES tuple rows must be parenthesized")
            inner, off = self._read_parens(block, pos)
            pos = off
            row: list = []
            ip = 0
            while ip < len(inner):
                mu = re.match(r"\s*UNDEF(?![\w:])\s*", inner[ip:])
                if mu:
                    row.append(None)
                    ip += mu.end()
                    continue
                m = _RE_TERM.match(inner, ip)
                if m is None or m.end() == ip:
                    break
                ip = m.end()
                row.append(self._term(m, prefixes)[1])
            if len(row) != len(vars_):
                raise QueryError(
                    f"VALUES row arity {len(row)} != {len(vars_)} vars")
            rows.append(tuple(row))
        return rows

    @staticmethod
    def _read_parens(text: str, open_idx: int) -> tuple[str, int]:
        depth, in_str, esc = 0, False, False
        for i in range(open_idx, len(text)):
            ch = text[i]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return text[open_idx + 1 : i], i + 1
        raise QueryError("Unbalanced parentheses in FILTER")

    # -- group evaluation ----------------------------------------------------

    def _eval_group(
        self, elements: list[tuple], bindings: list[dict[str, str]]
    ) -> list[dict[str, str]]:
        filters = [e[1] for e in elements if e[0] == "filter"]
        for kind, payload in elements:
            if kind == "bgp":
                bindings = [
                    out for b in bindings for out in self._join(payload, b)
                ]
            elif kind == "optional":
                nxt = []
                for b in bindings:
                    sols = self._eval_group(payload, [b])
                    nxt.extend(sols if sols else [b])
                bindings = nxt
            elif kind == "union":
                nxt = []
                for b in bindings:
                    for arm in payload:
                        nxt.extend(self._eval_group(arm, [b]))
                bindings = nxt
            elif kind == "minus":
                sols = self._eval_group(payload, [{}])
                bindings = [b for b in bindings
                            if not any(_minus_match(b, s) for s in sols)]
            elif kind == "bind":
                var, fn = payload
                nxt2 = []
                for b in bindings:
                    v = fn(b)
                    if v is None:
                        nxt2.append(b)  # expression error → var stays unbound
                    else:
                        sv = ("true" if v is True else
                              "false" if v is False else str(v))
                        if var in b:
                            if b[var] == sv:
                                nxt2.append(b)
                        else:
                            nb = dict(b)
                            nb[var] = sv
                            nxt2.append(nb)
                bindings = nxt2
            elif kind == "values":
                vars_, rows_ = payload
                nxt2 = []
                for b in bindings:
                    for row in rows_:
                        ok2, nb = True, dict(b)
                        for var, val in zip(vars_, row):
                            if val is None:
                                continue  # UNDEF
                            if var in nb and nb[var] != val:
                                ok2 = False
                                break
                            nb[var] = val
                        if ok2:
                            nxt2.append(nb)
                bindings = nxt2
            # filters handled below
            if not bindings:
                break
        for f in filters:
            bindings = [b for b in bindings if f(b)]
        return bindings

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
