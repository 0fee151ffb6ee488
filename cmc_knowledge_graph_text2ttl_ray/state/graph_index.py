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
  arithmetic, ``IN``/``NOT IN``, regex, bound, contains/strstarts/
  strends, str/ucase/lcase/strlen, ``! && ||``),
- property paths in predicate position (``/ | ^ + * ?``, parenthesized),
- aggregates (COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT, DISTINCT) with
  ``GROUP BY`` / ``HAVING``, and nested ``{ SELECT … }`` subqueries,
- plus ``SELECT DISTINCT``, projection, ``ORDER BY``, ``LIMIT``/``OFFSET``.

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
    string literal (escape-aware) or a ``<...>`` IRI span — both are DATA,
    never syntax. An IRI span requires a whitespace-free run ending in
    ``>`` so comparison operators in FILTER expressions (``?x < 5``) are
    never mistaken for an IRI opener."""
    mask = [False] * len(text)
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == '"':
            mask[i] = True
            i += 1
            esc = False
            while i < n:
                mask[i] = True
                c = text[i]
                i += 1
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == '"':
                    break
            continue
        if ch == "<":
            j = i + 1
            while j < n and not text[j].isspace() and text[j] not in '<>"':
                j += 1
            if j < n and text[j] == ">":
                for k in range(i, j + 1):
                    mask[k] = True
                i = j + 1
                continue
        i += 1
    return mask


def _minus_match(b: dict, s: dict) -> bool:
    """SPARQL MINUS compatibility: shared domain, all shared vars equal."""
    shared = b.keys() & s.keys()
    return bool(shared) and all(b[k] == s[k] for k in shared)


_FILTER_TOKEN = re.compile(
    r"""\s*(?:
      (?P<lpar>\()|(?P<rpar>\))|(?P<comma>,)
    | (?P<or>\|\|)|(?P<and>&&)
    | (?P<iri><[^<>\s"]*>)
    | (?P<op>!=|<=|>=|=|<|>)|(?P<not>!)
    | (?P<arith>[+\-*/])
    | (?P<var>\?[A-Za-z_]\w*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<number>\d+(?:\.\d+)?)
    | (?P<name>[A-Za-z_][\w\-]*(?::[\w][\w.\-]*)?)
    )""",
    re.VERBOSE,
)

_FILTER_FUNCS = {"regex", "bound", "contains", "strstarts", "strends", "str",
                 "ucase", "lcase", "strlen"}


def _compile_filter(expr: str, prefixes: dict[str, str]):
    """Compile a FILTER expression subset to a ``binding → bool`` closure.

    Supported: comparisons (= != < <= > >=; numeric when both sides parse as
    numbers, else string), arithmetic (``+ - * /`` with unary minus; numeric
    coercion, type errors evaluate the filter false per SPARQL), ``?v IN
    (...)`` / ``NOT IN``, ``regex(?v, "pat"[, "i"])``, ``bound(?v)``,
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

    def _num(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return None

    def parse_unary():
        if peek("not"):
            take("not")
            inner = parse_unary()
            return lambda b, inner=inner: not bool(inner(b))
        return parse_comparison()

    def parse_comparison():
        left = parse_additive()
        if peek("op"):
            op = take("op")[1]
            right = parse_additive()

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
        t = peek("name")
        if t is not None and t[1].upper() in ("IN", "NOT"):
            negate = t[1].upper() == "NOT"
            take("name")
            if negate:
                nt = peek("name")
                if nt is None or nt[1].upper() != "IN":
                    raise QueryError(f"Expected IN after NOT in FILTER: {expr!r}")
                take("name")
            take("lpar")
            items = []
            if not peek("rpar"):
                items.append(parse_additive())
                while peek("comma"):
                    take("comma")
                    items.append(parse_additive())
            take("rpar")

            def inlist(b, left=left, items=items, negate=negate):
                lv = left(b)
                if lv is None:
                    return False
                hit = False
                for it in items:
                    rv = it(b)
                    if rv is None:
                        continue
                    ln, rn = _num(lv), _num(rv)
                    if (ln is not None and rn is not None and ln == rn) or \
                            str(lv) == str(rv):
                        hit = True
                        break
                return (not hit) if negate else hit

            return inlist
        return left

    def parse_additive():
        left = parse_mult()
        while peek("arith") and peek("arith")[1] in "+-":
            op = take("arith")[1]
            right = parse_mult()

            def add(b, l_=left, r_=right, op=op):
                lv, rv = _num(l_(b)), _num(r_(b))
                if lv is None or rv is None:
                    return None
                return lv + rv if op == "+" else lv - rv

            left = add
        return left

    def parse_mult():
        left = parse_primary()
        while peek("arith") and peek("arith")[1] in "*/":
            op = take("arith")[1]
            right = parse_primary()

            def mul(b, l_=left, r_=right, op=op):
                lv, rv = _num(l_(b)), _num(r_(b))
                if lv is None or rv is None:
                    return None
                if op == "/":
                    return lv / rv if rv != 0 else None
                return lv * rv

            left = mul
        return left

    def parse_primary():
        t = peek("arith")
        if t is not None and t[1] in "+-":
            op = take("arith")[1]
            inner = parse_primary()

            def signed(b, inner=inner, op=op):
                v = _num(inner(b))
                if v is None:
                    return None
                return -v if op == "-" else v

            return signed
        return parse_operand()

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

    def __init__(self, triples: Iterable[TripleRow] = (), prefixes: dict[str, str] | None = None,
                 graphs: Iterable[str] | None = None):
        self._triples: list[TripleRow] = []
        self._by_s: dict[str, list[int]] = {}
        self._by_p: dict[str, list[int]] = {}
        self._by_o: dict[str, list[int]] = {}
        # optional named-graph column (parallel to _triples; "" = default
        # graph). None = a plain triple-only reference graph, which
        # rejects GRAPH queries by name.
        self._graphs: list[str] | None = None
        self._graph_views: dict[str, "GraphIndex"] = {}
        self.prefixes: dict[str, str] = dict(prefixes or {})
        if graphs is not None:
            self._graphs = []
            for t, g in zip(triples, graphs):
                self.add(t, graph=g)
        else:
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

    def add(self, t: TripleRow, graph: str | None = None) -> None:
        idx = len(self._triples)
        self._triples.append(tuple(t))
        self._by_s.setdefault(t[0], []).append(idx)
        self._by_p.setdefault(t[1], []).append(idx)
        self._by_o.setdefault(t[2], []).append(idx)
        if self._graphs is not None:
            self._graphs.append(graph or "")
            self._graph_views.clear()
        elif graph is not None:
            raise ValueError(
                "add(graph=...) on a triple-only GraphIndex; construct "
                "with graphs=[...] for quad support")

    def graph_names(self) -> list[str]:
        # NAMED graphs only — "" is the default graph and never binds
        # a GRAPH ?g variable (SPARQL §13.3)
        return sorted(set(self._graphs or ()) - {""})

    def _graph_view(self, g: str) -> "GraphIndex":
        """Sub-index of one named graph (cached; invalidated by add)."""
        view = self._graph_views.get(g)
        if view is None:
            view = GraphIndex(
                (t for t, tg in zip(self._triples, self._graphs) if tg == g),
                self.prefixes)
            self._graph_views[g] = view
        return view

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

    def query(self, sparql: str,
              _base_prefixes: dict[str, str] | None = None
              ) -> list[dict[str, str]]:
        """Evaluate a SELECT query; returns sorted rows of var → string.

        Supports basic graph patterns plus ``OPTIONAL { }``, ``FILTER( )``
        (with arithmetic and ``IN``), ``{ } UNION { }``, ``MINUS { }``,
        ``BIND``/``VALUES``, property paths (``/ | ^ + * ?``), aggregates
        (COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT) with ``GROUP BY`` /
        ``HAVING``, and the DISTINCT/ORDER BY/LIMIT/OFFSET modifiers
        (round-1 verdict: reference workflows rely on these,
        text_to_turtle_processor.py:2107-2202 runs full rdflib SPARQL;
        nested SELECT subqueries (evaluated in their own scope, natural-
        joined into the outer group), ``FILTER [NOT] EXISTS {}``, and
        negated property sets ``!p`` / ``!(p1|^p2)``. FILTERs are applied at the end of their group, per SPARQL
        scoping.
        """
        prefixes = dict(self.prefixes)
        if _base_prefixes:
            prefixes.update(_base_prefixes)  # subquery inherits outer scope
        for m in _RE_PREFIX_DECL.finditer(sparql):
            prefixes[m.group(1)] = m.group(2)

        # non-SELECT forms (parity with the distributed dispatcher,
        # pipelines/sparql_dist.py::sparql_query):
        # ASK → [{'ask': 'true'|'false'}]; DESCRIBE <iri…> → the seeds'
        # 1-hop subgraph as subject/predicate/object rows (the pragmatic
        # DESCRIBE most stores implement).
        stripped = _RE_PREFIX_DECL.sub("", sparql).lstrip()
        form = stripped.split(None, 1)[0].upper() if stripped else ""
        if form == "ASK":
            # rewrite on the prefix-stripped text: substituting over the
            # raw query could hit an 'ask' token inside a PREFIX IRI
            decls = "\n".join(m.group(0)
                              for m in _RE_PREFIX_DECL.finditer(sparql))
            token_len = len(stripped.split(None, 1)[0])
            body_query = decls + "\nSELECT *" + stripped[token_len:]
            any_row = self.query(body_query, _base_prefixes)
            return [{"ask": "true" if any_row else "false"}]
        if form == "DESCRIBE":
            rest = re.split(r"\bWHERE\b|\{", stripped[len("DESCRIBE"):],
                            maxsplit=1, flags=re.IGNORECASE)[0]
            seeds = set(re.findall(r"<([^>]+)>", rest))
            for m in re.finditer(r"(?<![<\w:])(\w*):([\w\-.]+)", rest):
                if m.group(1) in prefixes:
                    seeds.add(prefixes[m.group(1)] + m.group(2))
            if not seeds:
                raise QueryError("DESCRIBE needs at least one IRI")
            rows = [{"subject": t[0], "predicate": t[1], "object": t[2]}
                    for t in self._triples
                    if t[0] in seeds or t[2] in seeds]
            return sorted(rows, key=lambda r: (r["subject"],
                                               r["predicate"],
                                               r["object"]))

        start = sparql.find("{")
        if start < 0:
            raise QueryError(f"No {{...}} body found in query: {sparql[:120]}")
        body, end = self._read_group(sparql, start)
        elements = self._parse_group(body, prefixes)
        rows = self._eval_group(elements, [{}])

        # SPARQL modifier order: GROUP BY/aggregates → HAVING → ORDER BY
        # (may reference non-projected vars) → projection → DISTINCT →
        # OFFSET/LIMIT.
        tail = sparql[end:]
        rows, agg_proj = self._apply_aggregation(sparql, tail, rows, prefixes)
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
        if agg_proj is not None:
            sel_vars, proj = agg_proj, agg_proj
        else:
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

    # -- aggregation ---------------------------------------------------------

    _RE_AGG_ITEM = re.compile(
        r"^\(\s*(COUNT|SUM|MIN|MAX|AVG|SAMPLE|GROUP_CONCAT)\s*\(\s*"
        r"(DISTINCT\s+)?(\*|\?\w+)\s*"
        r"(?:;\s*SEPARATOR\s*=\s*\"([^\"]*)\"\s*)?\)\s+AS\s+\?(\w+)\s*\)$",
        re.IGNORECASE,
    )

    @staticmethod
    def _split_select_items(text: str) -> list[str]:
        """Whitespace-split the SELECT list, keeping ``( ... AS ?x )`` items
        (which contain spaces) intact."""
        items, buf, depth = [], [], 0
        for ch in text:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch.isspace() and depth == 0:
                if buf:
                    items.append("".join(buf))
                    buf = []
            else:
                buf.append(ch)
        if buf:
            items.append("".join(buf))
        return items

    def _apply_aggregation(self, sparql: str, tail: str, rows: list[dict],
                           prefixes: dict[str, str]):
        """GROUP BY + SELECT aggregates + HAVING (reference workflows get
        these from rdflib, text_to_turtle_processor.py:2107-2202).

        Supported: COUNT(*/?v) / SUM / MIN / MAX / AVG / SAMPLE /
        GROUP_CONCAT(?v ; SEPARATOR="...") with optional DISTINCT, ``GROUP
        BY ?a ?b``, ``HAVING(expr)`` over group keys and aggregate aliases.
        Returns (rows, projection-list) — projection None when the query has
        no aggregation (caller keeps plain-SELECT semantics)."""
        m_sel = re.search(
            r"\bSELECT\s+(?:DISTINCT\s+)?(.*?)\s*(?:(?<=\s)WHERE\s*)?\{",
            sparql, re.IGNORECASE | re.DOTALL)
        items = self._split_select_items(m_sel.group(1)) if m_sel else []
        agg_specs: list[tuple] = []   # (fname, distinct, var|None, sep, alias)
        plain_vars: list[str] = []
        for it in items:
            m = self._RE_AGG_ITEM.match(it)
            if m:
                fname = m.group(1).upper()
                var = None if m.group(3) == "*" else m.group(3)[1:]
                if var is None and fname != "COUNT":
                    raise QueryError(f"{fname}(*) is only valid for COUNT")
                agg_specs.append((fname, bool(m.group(2)), var,
                                  m.group(4) if m.group(4) is not None else " ",
                                  m.group(5)))
            elif it.startswith("?"):
                plain_vars.append(it[1:])
            elif it.startswith("("):
                raise QueryError(f"Unsupported SELECT expression: {it}")
        m_grp = re.search(r"\bGROUP\s+BY\s+((?:\?\w+\s*)+)", tail,
                          re.IGNORECASE)
        if not agg_specs and not m_grp:
            return rows, None
        group_vars = (re.findall(r"\?(\w+)", m_grp.group(1)) if m_grp
                      else plain_vars)
        groups: dict[tuple, list[dict]] = {}
        for r in rows:
            groups.setdefault(tuple(r.get(v) for v in group_vars), []).append(r)
        if not group_vars and not groups:
            groups[()] = []   # aggregate over the empty solution set
        out = []
        for key in groups:
            grows = groups[key]
            row = {v: k for v, k in zip(group_vars, key) if k is not None}
            for fname, dist, var, sep, alias in agg_specs:
                if var is None:           # COUNT(*)
                    if dist:
                        # COUNT(DISTINCT *): number of distinct solutions
                        vals = [1] * len({tuple(sorted(r.items()))
                                          for r in grows})
                    else:
                        vals = [1] * len(grows)
                else:
                    vals = [r[var] for r in grows if r.get(var) is not None]
                    if dist:
                        vals = sorted(set(vals))
                if fname == "COUNT":
                    row[alias] = str(len(vals))
                    continue
                if fname == "GROUP_CONCAT":
                    row[alias] = sep.join(str(v) for v in vals)
                    continue
                if not vals:
                    continue              # SUM/MIN/MAX/AVG of nothing: unbound
                if fname == "SAMPLE":
                    row[alias] = str(min(vals))
                    continue
                nums = []
                for v in vals:
                    try:
                        nums.append(float(v))
                    except (TypeError, ValueError):
                        nums = None
                        break
                if fname in ("SUM", "AVG"):
                    if nums is None:
                        raise QueryError(f"{fname} over non-numeric values")
                    x = sum(nums) / (len(nums) if fname == "AVG" else 1)
                elif nums is not None:
                    x = min(nums) if fname == "MIN" else max(nums)
                else:
                    row[alias] = min(vals) if fname == "MIN" else max(vals)
                    continue
                row[alias] = str(int(x)) if float(x).is_integer() else str(x)
            out.append(row)
        m_hav = re.search(r"\bHAVING\s*\(", tail, re.IGNORECASE)
        if m_hav:
            expr, _ = self._read_parens(tail, m_hav.end() - 1)
            fn = _compile_filter(expr, prefixes)
            out = [r for r in out if fn(r)]
        return out, (plain_vars + [a for *_x, a in agg_specs])

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

        # keywords/braces inside quoted literals and <...> IRIs are DATA;
        # '?filter' is a variable and 'ex:filter' a prefixed local name, not
        # the FILTER keyword — hence the span mask and the left lookbehind
        # (':' keeps prefixed names out)
        in_str = _string_mask(body)
        kw = re.compile(
            r"(?<![?\w:])(OPTIONAL|FILTER|MINUS|UNION|BIND|VALUES|GRAPH)\b|\{",
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
                # bare subgroup: a SUBQUERY when it opens with SELECT, else
                # the left arm of UNION or a plain group
                flush_plain()
                sub, pos = self._read_group(body, m.start())
                if re.match(r"\s*SELECT\b", sub, re.IGNORECASE):
                    # evaluated independently (its own scope, per SPARQL),
                    # then natural-joined with the outer bindings
                    elements.append(("subquery", (sub, dict(prefixes))))
                    continue
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
            elif word == "GRAPH":
                # GRAPH ?g { … } | GRAPH <iri> { … } | GRAPH pfx:name { … }
                mg = re.match(
                    r"(\?(\w+)|<([^>]*)>|(\w*):([A-Za-z0-9_.\-]+))\s*",
                    body[nxt:])
                if mg is None:
                    raise QueryError(
                        "GRAPH requires ?var or an IRI before its group")
                if mg.group(2):
                    gterm = ("var", mg.group(2))
                elif mg.group(3) is not None:
                    gterm = ("const", mg.group(3))
                else:
                    ns = prefixes.get(mg.group(4))
                    if ns is None:
                        raise QueryError(
                            f"Unknown prefix {mg.group(4)!r} in GRAPH")
                    gterm = ("const", ns + mg.group(5))
                brace = nxt + mg.end()
                if brace >= n or body[brace] != "{":
                    raise QueryError("GRAPH term must be followed by a group")
                sub, pos = self._read_group(body, brace)
                elements.append(("graph", (gterm,
                                           self._parse_group(sub, prefixes))))
            elif word == "FILTER":
                m_ex = re.match(r"(NOT\s+)?EXISTS\s*\{", body[nxt:],
                                re.IGNORECASE)
                if m_ex is not None:
                    # FILTER [NOT] EXISTS { pattern } — a group-valued
                    # filter, applied per binding at group end like other
                    # filters (SPARQL 1.1 §8.1)
                    sub, pos = self._read_group(body, nxt + m_ex.end() - 1)
                    elements.append(("exists", (bool(m_ex.group(1)),
                                                self._parse_group(sub, prefixes))))
                    continue
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
        exists_filters = [e[1] for e in elements if e[0] == "exists"]
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
            elif kind == "subquery":
                sub_text, sub_prefixes = payload
                rows_ = self.query(sub_text, _base_prefixes=sub_prefixes)
                nxt2 = []
                for b in bindings:
                    for r in rows_:
                        shared = b.keys() & r.keys()
                        if all(b[k] == r[k] for k in shared):
                            nb = dict(b)
                            nb.update(r)
                            nxt2.append(nb)
                bindings = nxt2
            elif kind == "graph":
                if self._graphs is None:
                    raise QueryError(
                        "GRAPH is not supported on triple-only reference "
                        "graphs; construct the GraphIndex with graphs=[...] "
                        "or run the query through the distributed front "
                        "end over a quad dataset")
                gterm, elems = payload
                gkind, gval = gterm
                nxt = []
                for b in bindings:
                    if gkind == "var":
                        pinned = b.get(gval)
                        for g in self.graph_names():
                            if pinned is not None and g != pinned:
                                continue
                            for sol in self._graph_view(g)._eval_group(
                                    elems, [dict(b, **{gval: g})]):
                                nxt.append(sol)
                    else:
                        nxt.extend(self._graph_view(gval)._eval_group(
                            elems, [b]))
                bindings = nxt
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
            # 'filter' and 'exists' elements are handled below
            if not bindings:
                break
        for f in filters:
            bindings = [b for b in bindings if f(b)]
        for negated, elems in exists_filters:
            bindings = [
                b for b in bindings
                if bool(self._eval_group(elems, [b])) != negated
            ]
        return bindings

    def _parse_patterns(
        self, body: str, prefixes: dict[str, str]
    ) -> list[tuple[tuple[str, str], ...]]:
        patterns = []
        for stmt in self._split_statements(body):
            toks = self._tokenize_statement(stmt, prefixes)
            if len(toks) == 3 and all(k == "term" for k, _ in toks):
                patterns.append((toks[0][1], toks[1][1], toks[2][1]))
                continue
            # predicate-position property path: subject PATH object
            if len(toks) < 3 or toks[0][0] != "term" or toks[-1][0] != "term":
                raise QueryError(f"Pattern is not a triple: {stmt!r}")
            ast = self._parse_path(toks[1:-1], stmt)
            patterns.append((toks[0][1], ("path", ast), toks[-1][1]))
        if not patterns:
            raise QueryError("Empty WHERE body")
        return patterns

    _RE_PATH_OP = re.compile(r"\s*([/|^+*?()!])\s*")

    def _tokenize_statement(self, stmt: str, prefixes: dict[str, str]):
        """Statement → [("term", (kind, val)) | ("op", ch)] tokens; the op
        alphabet is the SPARQL property-path operators."""
        toks, pos = [], 0
        while pos < len(stmt):
            m = _RE_TERM.match(stmt, pos)
            if m is not None and m.end() > pos:
                toks.append(("term", self._term(m, prefixes)))
                pos = m.end()
                continue
            m2 = self._RE_PATH_OP.match(stmt, pos)
            if m2 is not None:
                toks.append(("op", m2.group(1)))
                pos = m2.end()
                continue
            raise QueryError(f"Cannot parse pattern term at: {stmt[pos:pos+40]!r}")
        return toks

    def _parse_path(self, toks: list, stmt: str):
        """SPARQL property-path subset → AST (reference runs full rdflib):
        sequences ``p1/p2``, alternatives ``p1|p2``, inverse ``^p``,
        closures ``p+ p* p?``, negated property sets ``!p`` / ``!(p1|^p2)``,
        grouped with parentheses."""
        pos = 0

        def peek():
            return toks[pos] if pos < len(toks) else None

        def parse_alt():
            parts = [parse_seq()]
            while peek() == ("op", "|"):
                advance()
                parts.append(parse_seq())
            return parts[0] if len(parts) == 1 else ("alt", parts)

        def parse_seq():
            parts = [parse_unary()]
            while peek() == ("op", "/"):
                advance()
                parts.append(parse_unary())
            return parts[0] if len(parts) == 1 else ("seq", parts)

        def advance():
            nonlocal pos
            pos += 1

        def parse_unary():
            inv = False
            if peek() == ("op", "^"):
                advance()
                inv = True
            node = parse_atom()
            while peek() in (("op", "+"), ("op", "*"), ("op", "?")):
                ch = toks[pos][1]
                advance()
                node = ({"+": "plus", "*": "star", "?": "opt"}[ch], node)
            return ("inv", node) if inv else node

        def parse_neg_member():
            inv = False
            if peek() == ("op", "^"):
                advance()
                inv = True
            t = peek()
            if t is None or t[0] != "term" or t[1][0] != "const":
                raise QueryError(
                    f"Negated property set members must be IRIs: {stmt!r}")
            advance()
            return (inv, t[1][1])

        def parse_atom():
            t = peek()
            if t == ("op", "!"):
                # negated property set !iri / !(iri1|^iri2|...) —
                # SPARQL 1.1 §9.1 PathNegatedPropertySet
                advance()
                members = []
                if peek() == ("op", "("):
                    advance()
                    members.append(parse_neg_member())
                    while peek() == ("op", "|"):
                        advance()
                        members.append(parse_neg_member())
                    if peek() != ("op", ")"):
                        raise QueryError(f"Unbalanced parens in path: {stmt!r}")
                    advance()
                else:
                    members.append(parse_neg_member())
                return ("negset", members)
            if t == ("op", "("):
                advance()
                node = parse_alt()
                if peek() != ("op", ")"):
                    raise QueryError(f"Unbalanced parens in path: {stmt!r}")
                advance()
                return node
            if t is not None and t[0] == "term" and t[1][0] == "const":
                advance()
                return ("atom", t[1][1])
            raise QueryError(f"Cannot parse property path in: {stmt!r}")

        ast = parse_alt()
        if pos != len(toks):
            raise QueryError(f"Trailing tokens in property path: {stmt!r}")
        return ast

    def _path_nodes(self) -> list[str]:
        return sorted(set(self._by_s) | set(self._by_o))

    def _eval_path(self, ast, s: str | None, o: str | None) -> set:
        """Evaluate a path AST → set of (subject, object) pairs, with the
        bound ends (if any) pushed down as index lookups."""
        kind = ast[0]
        if kind == "atom":
            return {(t[0], t[2]) for t in self.match(s, ast[1], o)}
        if kind == "inv":
            return {(b, a) for (a, b) in self._eval_path(ast[1], o, s)}
        if kind == "negset":
            fwd = {iri for inv, iri in ast[1] if not inv}
            invs = {iri for inv, iri in ast[1] if inv}
            out: set = set()
            # forward part exists iff there is ≥1 forward member (or the
            # set is pure-forward): matches any predicate NOT in the set
            if fwd or not invs:
                out |= {(t[0], t[2]) for t in self.match(s, None, o)
                        if t[1] not in fwd}
            if invs:
                out |= {(t[2], t[0]) for t in self.match(o, None, s)
                        if t[1] not in invs}
            return out
        if kind == "alt":
            out: set = set()
            for sub in ast[1]:
                out |= self._eval_path(sub, s, o)
            return out
        if kind == "seq":
            parts = ast[1]
            frontier = self._eval_path(parts[0], s, None)
            for part in parts[1:-1]:
                nxt = set()
                for (a, mid) in frontier:
                    for (_m, c) in self._eval_path(part, mid, None):
                        nxt.add((a, c))
                frontier = nxt
                if not frontier:
                    return set()
            out = set()
            for (a, mid) in frontier:
                for (_m, c) in self._eval_path(parts[-1], mid, o):
                    out.add((a, c))
            return out
        if kind == "opt":
            pairs = self._eval_path(ast[1], s, o)
            if s is not None:
                if o is None or o == s:
                    pairs.add((s, s))
            elif o is not None:
                pairs.add((o, o))
            else:
                pairs |= {(x, x) for x in self._path_nodes()}
            return pairs
        if kind in ("plus", "star"):
            inner = ast[1]
            if s is None and o is not None:
                # pivot on the bound end: walk the inverse and flip back
                flipped = self._eval_path((kind, ("inv", inner)), o, None)
                return {(b, a) for (a, b) in flipped}
            starts = [s] if s is not None else self._path_nodes()
            out = set()
            for st in starts:
                reached: set = set()
                frontier = {st}
                while frontier:
                    nxt = set()
                    for nd in frontier:
                        for (_a, y) in self._eval_path(inner, nd, None):
                            if y not in reached:
                                reached.add(y)
                                nxt.add(y)
                    frontier = nxt
                if kind == "star":
                    reached.add(st)
                out |= {(st, y) for y in reached}
            if o is not None:
                out = {(a, b) for (a, b) in out if b == o}
            return out
        raise QueryError(f"Unknown path node: {kind}")

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

        if pkind == "path":
            s, o = bound(skind, sval), bound(okind, oval)
            out2: list[dict[str, str]] = []
            for sv, ov in sorted(self._eval_path(pval, s, o)):
                nb = dict(binding)
                ok = True
                for kind, val, got in ((skind, sval, sv), (okind, oval, ov)):
                    if kind == "var":
                        prev = nb.get(val)
                        if prev is None:
                            nb[val] = got
                        elif prev != got:
                            ok = False
                            break
                if ok:
                    out2.extend(self._join(patterns[1:], nb))
            return out2

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
