"""Distributed SPARQL SELECT front end for the triples Dataset.

``state/graph_index.py`` gives per-actor reference graphs a full SPARQL
subset (reference parity: workflows run rdflib SPARQL on small mapping
graphs, text_to_turtle_processor.py:2107-2202).  This module reuses THAT
parser but compiles the query onto the distributed evaluators
(``pipelines/kg_query.bgp_query`` hash-join plans), so the same query
text runs against a billion-triple materialized KG — and the in-memory
evaluator doubles as the differential oracle in tests.

Supported distributed subset (the rest raises ``NotImplementedError``
with the unsupported construct named — honesty over silent wrong
answers):

- basic graph patterns (joined per ``bgp_query``'s planner)
- any number of ``OPTIONAL { BGP }`` groups (applied in order;
  groups may only share REQUIRED variables — sharing a previous
  OPTIONAL's nullable vars is rejected by name) and one
  ``MINUS { BGP }`` group
- ``FILTER(...)`` — the parser's compiled closures applied per solution
  row (solutions are the post-join RESULT set, orders of magnitude
  smaller than the triple table; a vectorized translation would cover
  only a fraction of the expression grammar)
- ``{ } UNION { }`` groups (arms evaluated independently, columns
  aligned with nulls, correlated with the rest by a hash join on the
  shared variables)
- property paths ``p1/p2`` ``^p`` ``p1|p2`` (grouped), negated
  property sets ``!p`` / ``!(p1|^p2)``, and ``p+`` transitive closure
  over plain IRIs — lowered to the SPARQL-1.1 fresh-variable BGP
  rewrite (DNF: alternatives become UNION arms; negsets become fresh
  predicate variables with not-in filters; ``p+`` patterns scan the
  predicate's semi-naive ``forward_chain`` closure, computed once per
  query).
  Deviation, documented: the rewrite has the spec's BAG multiplicity
  (one row per route); the in-memory evaluator dedups path endpoint
  pairs — use DISTINCT when comparing.
- ``BIND(expr AS ?var)`` (applied after the joins — valid while the
  expression references only BGP-bound vars) and ``VALUES`` (inline
  compatible-bindings join; UNDEF entries are wildcards; the inline
  list is query-text-sized, so the per-solution loop is bounded)
- ``FILTER [NOT] EXISTS { … }`` — a distributed left_semi / left_anti
  hash join on the shared variables (uncorrelated groups decide
  globally by emptiness)
- nested ``{ SELECT … }`` subqueries — evaluated in their own scope
  (outer prefixes inherited) and natural-joined back on the shared
  variables
- SELECT projection, ``DISTINCT``, aggregates COUNT(*) / COUNT(?v) /
  SUM / MIN / MAX / AVG with ``GROUP BY`` and ``HAVING`` (compiled
  filter over the per-group rows)
- ``ORDER BY`` / ``LIMIT``.  Deviation, documented: the distributed
  sort orders LEXICALLY (Arrow string sort); the in-memory evaluator
  sorts numerically when both values parse as numbers.

NOT supported distributed: ``*``/``?`` closures (zero-length arms
need reflexive pairs over every node), ``+`` over complex sub-paths or
inside path alternatives, OPTIONAL groups correlated only through
other OPTIONALs' nullable vars, paths inside OPTIONAL/MINUS, OFFSET.
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["sparql_select", "sparql_query"]

_RE_PREFIX_DECL = re.compile(
    r"PREFIX\s+(\w*):\s*<([^>]*)>", re.IGNORECASE)


def _conv_term(term):
    kind, val = term
    if kind == "var":
        return "?" + val
    if kind == "const":
        return val
    raise NotImplementedError(
        f"distributed SPARQL: unsupported term {term!r}")


class _Fresh:
    """Fresh internal variables for path lowering (``__pN`` — dropped
    from results before projection/union alignment)."""

    def __init__(self):
        self.n = 0

    def __call__(self):
        self.n += 1
        return ("var", f"__p{self.n}")


def _not_in_filter(var_name: str, bad: frozenset):
    def fn(b, _v=var_name, _bad=bad):
        return b.get(_v) is not None and b[_v] not in _bad

    return fn


def _closure_source(pred: str):
    """Source factory for a ``p+`` pattern: the transitive closure of
    predicate ``pred``, computed ONCE per query by semi-naive
    ``forward_chain`` over only that predicate's edges (bucket-pruned on
    a TripleStore) and scanned like any triple source."""
    def factory(triples):
        import pyarrow.compute as pc

        from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_infer import (
            Rule,
            forward_chain,
        )

        base = (triples.scan_for_predicate(pred)
                if hasattr(triples, "scan_for_predicate") else triples)
        base = base.map_batches(
            lambda t, _p=pred: t.filter(pc.fill_null(
                pc.equal(t["predicate"], _p), False)),
            batch_format="pyarrow")
        rule = Rule([("?x", pred, "?y"), ("?y", pred, "?z")],
                    [("?x", pred, "?z")], name="closure")
        return forward_chain(base, [rule])["closure"]

    return factory


def _lower_path(s_term, ast, o_term, fresh):
    """Lower a property-path AST to DNF: a list of ALTERNATIVE
    ``(patterns, filters, sources)`` triples (SPARQL 1.1 §9.1 defines
    ``p1/p2`` / ``^p`` / ``p1|p2`` as exactly the fresh-variable BGP
    rewrite, bag semantics).  Negated property sets ``!p`` /
    ``!(p1|^p2)`` become a fresh PREDICATE variable constrained by a
    not-in filter; ``p+`` over a plain IRI becomes a pattern whose
    SOURCE is the predicate's transitive closure (semi-naive
    ``forward_chain``, computed once per query).  ``* ?`` closures and
    ``+`` over complex sub-paths raise by name."""
    kind = ast[0]
    if kind == "atom":
        return [([(s_term, ("const", ast[1]), o_term)], [], [None])]
    if kind == "inv":
        return _lower_path(o_term, ast[1], s_term, fresh)
    if kind == "plus":
        inner = ast[1]
        if inner[0] != "atom":
            raise NotImplementedError(
                "distributed SPARQL: '+' over a complex sub-path is "
                "not supported (plain-IRI closures only)")
        return [([(s_term, ("const", inner[1]), o_term)], [],
                 [_closure_source(inner[1])])]
    if kind == "negset":
        fwd = frozenset(iri for inv, iri in ast[1] if not inv)
        invs = frozenset(iri for inv, iri in ast[1] if inv)
        arms = []
        if fwd or not invs:
            pv = fresh()
            arms.append(([(s_term, pv, o_term)],
                         [_not_in_filter(pv[1], fwd)], [None]))
        if invs:
            pv = fresh()
            arms.append(([(o_term, pv, s_term)],
                         [_not_in_filter(pv[1], invs)], [None]))
        return arms
    if kind == "seq":
        alts = [([], [], [])]
        left = s_term
        parts = ast[1]
        for i, part in enumerate(parts):
            right = o_term if i == len(parts) - 1 else fresh()
            part_alts = _lower_path(left, part, right, fresh)
            alts = [(cp + ap, cf + af, cs + asrc)
                    for cp, cf, cs in alts
                    for ap, af, asrc in part_alts]
            left = right
        return alts
    if kind == "alt":
        out = []
        for part in ast[1]:
            out.extend(_lower_path(s_term, part, o_term, fresh))
        return out
    raise NotImplementedError(
        f"distributed SPARQL: property-path operator {kind!r} is not "
        "supported (use pipelines.kg_infer.forward_chain for transitive "
        "closure)")


def _conv_patterns(patterns):
    return [tuple(_conv_term(t) for t in pat) for pat in patterns]


def _bgp_only(elements, what):
    pats = []
    for kind, payload in elements:
        if kind != "bgp":
            raise NotImplementedError(
                f"distributed SPARQL: {kind.upper()} inside {what} is "
                "not supported")
        pats.extend(_conv_patterns(payload))
    return pats


def _row_filters(ds, filter_fns):
    """Apply the parser's compiled FILTER closures per solution row.
    Runs distributed inside map_batches; the loop is over the RESULT
    set, not the triple table."""
    def apply(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        keep = [all(fn({k: v for k, v in r.items() if v is not None})
                    for fn in filter_fns) for r in rows]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(apply, batch_format="pyarrow")


def _apply_binds(ds, binds):
    """``BIND(expr AS ?var)`` after the joins (valid for the supported
    subset: the expression references only BGP-bound variables).  Local
    semantics mirrored exactly: an expression error leaves the variable
    unbound; binding over an ALREADY-bound variable keeps the row only
    when the values agree."""
    def apply(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        out = []
        for r in rows:
            clean = {k: v for k, v in r.items() if v is not None}
            ok = True
            for var, fn in binds:
                v = fn(clean)
                if v is None:
                    continue  # expression error → stays unbound
                sv = ("true" if v is True else
                      "false" if v is False else str(v))
                if clean.get(var) is not None:
                    if str(clean[var]) != sv:
                        ok = False
                        break
                else:
                    clean[var] = sv
            if ok:
                out.append(clean)
        names = sorted(set(t.column_names) | {var for var, _ in binds})
        return pa.table(
            {n: pa.array([None if r.get(n) is None else str(r.get(n))
                          for r in out], pa.string()) for n in names})

    return ds.map_batches(apply, batch_format="pyarrow")


def _apply_values(ds, vars_, rows):
    """``VALUES`` as a compatible-bindings join: each solution row joins
    every inline data row whose non-UNDEF entries agree; UNDEF entries
    are wildcards.  The inline list is a tiny constant (query text), so
    the per-solution loop is bounded by its length."""
    def apply(t: pa.Table) -> pa.Table:
        sols = t.to_pylist()
        out = []
        for r in sols:
            for vrow in rows:
                ok, merged = True, dict(r)
                for var, val in zip(vars_, vrow):
                    if val is None:
                        continue  # UNDEF matches anything
                    cur = merged.get(var)
                    if cur is not None and str(cur) != val:
                        ok = False
                        break
                    merged[var] = val
                if ok:
                    out.append(merged)
        names = sorted(set(t.column_names) | set(vars_))
        return pa.table(
            {n: pa.array([None if r.get(n) is None else str(r.get(n))
                          for r in out], pa.string()) for n in names})

    return ds.map_batches(apply, batch_format="pyarrow")


def _translate_group(elements):
    patterns, optionals, minus, filters, unions = [], [], None, [], []
    binds, values_blocks, exists_groups, subqueries = [], [], [], []
    sources = []  # per-pattern source factories (aligned with patterns)
    fresh = _Fresh()
    for kind, payload in elements:
        if kind == "bgp":
            # DNF-expand any property paths: a single conjunction extends
            # the BGP in place; real alternatives become a UNION element
            conj_alts = [([], [], [])]
            for pat in payload:
                s, p, o = pat
                alts = (_lower_path(s, p[1], o, fresh)
                        if isinstance(p, tuple) and p[0] == "path"
                        else [([pat], [], [None])])
                conj_alts = [(cp + ap, cf + af, cs + asrc)
                             for cp, cf, cs in conj_alts
                             for ap, af, asrc in alts]
            if len(conj_alts) == 1:
                pats, fils, srcs = conj_alts[0]
                patterns.extend(_conv_patterns(pats))
                filters.extend(fils)
                sources.extend(srcs)
            else:
                if any(src is not None
                       for _, _, srcs in conj_alts for src in srcs):
                    raise NotImplementedError(
                        "distributed SPARQL: '+' closure inside a path "
                        "alternative is not supported")
                unions.append(
                    [[("bgp", pats)] + [("filter", f) for f in fils]
                     for pats, fils, _srcs in conj_alts])
        elif kind == "optional":
            optionals.append(_bgp_only(payload, "OPTIONAL"))
        elif kind == "minus":
            if minus is not None:
                raise NotImplementedError(
                    "distributed SPARQL: only one MINUS group")
            minus = _bgp_only(payload, "MINUS")
        elif kind == "filter":
            filters.append(payload)
        elif kind == "union":
            unions.append(payload)
        elif kind == "bind":
            binds.append(payload)  # (var, compiled fn)
        elif kind == "values":
            values_blocks.append(payload)  # (vars, rows)
        elif kind == "exists":
            exists_groups.append(payload)  # (negated, elements)
        elif kind == "subquery":
            subqueries.append(payload)  # (text, prefixes)
        else:
            raise NotImplementedError(
                f"distributed SPARQL: {kind.upper()} is not supported")
    return (patterns, optionals, minus, filters, unions, binds,
            values_blocks, exists_groups, subqueries, sources)


def _group_dataset(triples, elements, num_partitions):
    """Evaluate one translated group (recursive for UNION arms) into a
    solution Dataset with one string column per variable."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import (
        _compact,
        bgp_query,
    )

    (patterns, optionals, minus, filters, unions, binds,
     values_blocks, exists_groups, subqueries,
     sources) = _translate_group(elements)

    acc = None
    if patterns:
        resolved = ([src(triples) if src is not None else None
                     for src in sources]
                    if any(src is not None for src in sources) else None)
        acc = bgp_query(triples, patterns,
                        optional_groups=optionals or None,
                        minus_patterns=minus or None,
                        num_partitions=num_partitions,
                        pattern_sources=resolved)
    elif optionals or minus:
        raise NotImplementedError(
            "distributed SPARQL: OPTIONAL/MINUS need required patterns")

    for arms in unions:
        arm_ds = [_group_dataset(triples, arm, num_partitions)
                  for arm in arms]
        all_cols = sorted({c for d in arm_ds for c in d.schema().names})

        def pad(cols):
            def fn(t: pa.Table) -> pa.Table:
                out = {}
                for c in cols:
                    out[c] = (t[c].cast(pa.string())
                              if c in t.column_names
                              else pa.nulls(len(t), pa.string()))
                return pa.table(
                    out, schema=pa.schema([(c, pa.string())
                                           for c in cols]))

            return fn

        uds = arm_ds[0].map_batches(pad(all_cols), batch_format="pyarrow")
        for other in arm_ds[1:]:
            uds = uds.union(other.map_batches(pad(all_cols),
                                              batch_format="pyarrow"))
        if acc is None:
            acc = uds
        else:
            shared = sorted(set(acc.schema().names) & set(all_cols))
            if not shared:
                raise NotImplementedError(
                    "distributed SPARQL: UNION group sharing no variable "
                    "with the rest of the WHERE clause (cross product)")
            left, n_l = _compact(acc)
            right, n_r = _compact(uds)
            if left is None or right is None:
                sch = pa.schema(
                    [(c, pa.string())
                     for c in sorted(set(acc.schema().names) |
                                     set(all_cols))])
                import ray.data

                return ray.data.from_arrow(sch.empty_table())
            right = right.rename_columns({c: c + "__r" for c in shared})
            np_join = max(1, min(default_join_partitions(),
                                 -(-min(n_l, n_r) // 50_000)))
            acc = left.join(
                right, join_type="inner", num_partitions=np_join,
                on=tuple(shared),
                right_on=tuple(c + "__r" for c in shared))
            acc = acc.select_columns(sorted(
                set(left.schema().names) | set(all_cols)))

    if acc is None:
        raise NotImplementedError("distributed SPARQL: empty WHERE body")
    # subqueries: evaluated in their own scope, natural-joined back on
    # the shared variables (SPARQL 1.1 §12 bottom-up evaluation)
    for sub_text, sub_prefixes in subqueries:
        sub = sparql_select(triples, sub_text, num_partitions,
                            _base_prefixes=sub_prefixes)
        sub_cols = set(sub.schema().names)
        shared = sorted(set(acc.schema().names) & sub_cols)
        if not shared:
            raise NotImplementedError(
                "distributed SPARQL: subquery sharing no variable with "
                "the outer group (cross product)")
        left, n_l = _compact(acc)
        right, n_r = _compact(sub)
        if left is None or right is None:
            sch = pa.schema([(c, pa.string()) for c in sorted(
                set(acc.schema().names) | sub_cols)])
            import ray.data

            return ray.data.from_arrow(sch.empty_table())

        def _str_cols(t: pa.Table) -> pa.Table:
            return pa.table({c: t[c].cast(pa.string())
                             for c in t.column_names})

        right = right.map_batches(_str_cols, batch_format="pyarrow") \
                     .rename_columns({c: c + "__r" for c in shared})
        np_join = max(1, min(default_join_partitions(),
                             -(-min(n_l, n_r) // 50_000)))
        acc = left.join(right, join_type="inner",
                        num_partitions=np_join,
                        on=tuple(shared),
                        right_on=tuple(c + "__r" for c in shared))
        acc = acc.select_columns(sorted(
            set(left.schema().names) | sub_cols))

    # evaluation order for the supported subset: VALUES (inline joins) →
    # BIND (derived vars) → EXISTS/FILTER (SPARQL applies filters at
    # group end; negated-property-set filters must also see their fresh
    # __p vars)
    for vars_, rows in values_blocks:
        acc = _apply_values(acc, vars_, rows)
    if binds:
        acc = _apply_binds(acc, binds)
    for negated, group_elements in exists_groups:
        probe = _group_dataset(triples, group_elements, num_partitions)
        probe_cols = set(probe.schema().names)
        shared = sorted(set(acc.schema().names) & probe_cols)
        if not shared:
            # uncorrelated EXISTS: group emptiness decides globally
            any_row = probe.limit(1).count() > 0
            keep = any_row != negated
            if keep:
                continue
            sch = pa.schema([(c, pa.string())
                             for c in acc.schema().names])
            import ray.data

            acc = ray.data.from_arrow(sch.empty_table())
            continue
        left, n_l = _compact(acc)
        right, n_r = _compact(probe)
        if left is None:
            continue  # no solutions left; nothing to subtract from
        if right is None:
            if not negated:
                import ray.data

                sch = pa.schema([(c, pa.string())
                                 for c in left.schema().names])
                acc = ray.data.from_arrow(sch.empty_table())
            else:
                acc = left
            continue

        def keys_only(t: pa.Table, shared=shared) -> pa.Table:
            sub = pa.table({c + "__r": t[c].cast(pa.string())
                            for c in shared})
            return sub.group_by(list(sub.column_names)).aggregate([])

        right = right.map_batches(keys_only, batch_format="pyarrow")
        np_join = max(1, min(default_join_partitions(),
                             -(-min(n_l, n_r) // 50_000)))
        acc = left.join(
            right,
            join_type=("left_anti" if negated else "left_semi"),
            num_partitions=np_join,
            on=tuple(shared),
            right_on=tuple(c + "__r" for c in shared))
    if filters:
        acc = _row_filters(acc, filters)
    internal = [c for c in acc.schema().names if c.startswith("__p")]
    if internal:
        acc = acc.select_columns(
            [c for c in acc.schema().names if not c.startswith("__p")])
    return acc


def sparql_query(triples, query: str, num_partitions: int | None = None):
    """Dispatch on the query form:

    - ``SELECT`` → :func:`sparql_select` (a bindings Dataset)
    - ``ASK``    → one-row Dataset ``{ask: bool}`` (any solution?)
    - ``DESCRIBE <iri> [<iri> …]`` → the seeds' 1-hop subgraph via
      :func:`~cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query.khop_subgraph` (a
      triples Dataset) — the pragmatic DESCRIBE most stores implement.
    """
    import ray.data

    stripped = re.sub(r"PREFIX\s+\w*:\s*<[^>]*>", "", query,
                      flags=re.IGNORECASE).lstrip()
    form = stripped.split(None, 1)[0].upper() if stripped else ""
    if form == "SELECT":
        return sparql_select(triples, query, num_partitions)
    if form == "ASK":
        body_query = re.sub(r"\bASK\b", "SELECT *", query, count=1,
                            flags=re.IGNORECASE)
        any_row = sparql_select(triples, body_query,
                                num_partitions).limit(1).count()
        return ray.data.from_arrow(
            pa.table({"ask": pa.array([any_row > 0], pa.bool_())}))
    if form == "DESCRIBE":
        from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import (
            khop_subgraph,
        )

        # seed list = everything between DESCRIBE and WHERE/{/end
        rest = re.split(r"\bWHERE\b|\{", stripped[len("DESCRIBE"):],
                        maxsplit=1, flags=re.IGNORECASE)[0]
        seeds = re.findall(r"<([^>]+)>", rest)
        prefixes = {m.group(1): m.group(2)
                    for m in _RE_PREFIX_DECL.finditer(query)}
        for m in re.finditer(r"(?<![<\w:])(\w*):([\w\-.]+)", rest):
            if m.group(1) in prefixes:
                seeds.append(prefixes[m.group(1)] + m.group(2))
        if not seeds:
            raise ValueError("DESCRIBE needs at least one IRI")
        return khop_subgraph(triples, seeds, k=1)
    raise NotImplementedError(
        f"distributed SPARQL: query form {form or '<empty>'!r} "
        "(SELECT / ASK / DESCRIBE supported)")


_RE_AGG = re.compile(
    r"^\(\s*(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(\*|\?\w+)\s*\)\s+AS\s+"
    r"\?(\w+)\s*\)$", re.IGNORECASE)


def sparql_select(triples, query: str, num_partitions: int | None = None,
                  _base_prefixes: dict | None = None):
    """Compile a SPARQL SELECT string onto the distributed BGP engine.

    Returns a Dataset: one string column per projected variable
    (aggregate columns are float64 except COUNT's int64).
    ``_base_prefixes``: inherited outer-scope prefixes (subqueries)."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    gi = GraphIndex()
    prefixes = dict(_base_prefixes or {})
    prefixes.update({m.group(1): m.group(2)
                     for m in _RE_PREFIX_DECL.finditer(query)})
    start = query.find("{")
    if start < 0:
        raise ValueError("No {...} body in query")
    body, end = gi._read_group(query, start)
    elements = gi._parse_group(body, prefixes)
    acc = _group_dataset(triples, elements, num_partitions)
    tail = query[end:]

    # ---- SELECT clause ----
    m_sel = re.search(
        r"\bSELECT\s+(DISTINCT\s+)?(.*?)\s*(?:(?<=\s)WHERE\s*)?\{",
        query, re.IGNORECASE | re.DOTALL)
    distinct = bool(m_sel and m_sel.group(1))
    items = GraphIndex._split_select_items(m_sel.group(2)) if m_sel else []

    agg_items = []
    plain_vars = []
    for it in items:
        m_a = _RE_AGG.match(it)
        if m_a:
            agg_items.append((m_a.group(1).upper(), m_a.group(2),
                              m_a.group(3)))
        elif it.startswith("?"):
            plain_vars.append(it[1:])
        elif it == "*":
            plain_vars = [c for c in acc.schema().names]
        else:
            raise NotImplementedError(
                f"distributed SPARQL: select item {it!r}")

    if agg_items:
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        m_grp = re.search(r"GROUP\s+BY\s+((?:\?\w+\s*)+)", tail,
                          re.IGNORECASE)
        group_vars = (re.findall(r"\?(\w+)", m_grp.group(1))
                      if m_grp else [])
        if sorted(plain_vars) != sorted(group_vars) and plain_vars:
            raise NotImplementedError(
                "distributed SPARQL: non-grouped plain select vars "
                "alongside aggregates")

        num_needed = sorted({v[1:] for fn, v, _alias in agg_items
                             if v != "*"
                             and fn in ("SUM", "MIN", "MAX", "AVG")})

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            out = {c: t[c] for c in t.column_names}
            for v in num_needed:
                try:
                    out["__num_" + v] = pc.cast(t[v], pa.float64())
                except pa.ArrowInvalid as exc:
                    # match the in-memory evaluator: SUM/AVG/MIN/MAX over
                    # a non-numeric binding is a query error, not a
                    # silent skip
                    raise ValueError(
                        f"aggregate over non-numeric values of ?{v}: "
                        f"{exc}") from exc
            out["__one"] = pa.array([1] * len(t), pa.int64())
            return pa.table(out)

        aggs = []
        for fn, v, alias in agg_items:
            if fn == "COUNT":
                if v == "*":
                    aggs.append(Count(alias_name=alias))
                else:
                    aggs.append(Count(v[1:], ignore_nulls=True,
                                      alias_name=alias))
            elif fn == "SUM":
                aggs.append(Sum("__num_" + v[1:], alias_name=alias))
            elif fn == "MIN":
                aggs.append(Min("__num_" + v[1:], alias_name=alias))
            elif fn == "MAX":
                aggs.append(Max("__num_" + v[1:], alias_name=alias))
            elif fn == "AVG":
                aggs.append(Mean("__num_" + v[1:], alias_name=alias))
        acc = acc.map_batches(prep, batch_format="pyarrow")
        if group_vars:
            acc = acc.groupby(group_vars).aggregate(*aggs)
        else:
            acc = acc.groupby("__one").aggregate(*aggs) \
                     .drop_columns(["__one"])
        out_cols = group_vars + [a for _, _, a in agg_items]
        acc = acc.select_columns(out_cols)
        # HAVING: the parser's compiled filter over group keys +
        # aggregate aliases, applied per (already tiny) group row
        m_hav = re.search(r"\bHAVING\s*\(", tail, re.IGNORECASE)
        if m_hav:
            from cmc_knowledge_graph_text2ttl_ray.state.graph_index import (
                _compile_filter,
            )

            expr, _end = GraphIndex._read_parens(tail, m_hav.end() - 1)
            acc = _row_filters(
                acc, [_compile_filter(expr, prefixes)])
    else:
        if plain_vars:
            acc = acc.select_columns(plain_vars)
        if distinct:
            cols = plain_vars or list(acc.schema().names)
            acc = coarse_group_reduce(
                acc, cols, lambda g: g.drop_duplicates(subset=cols))

    # ---- ORDER BY / OFFSET / LIMIT (lexical sort; see module doc) ----
    m_ord = re.search(
        r"ORDER\s+BY\s+((?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+)"
        r"(?:\s+(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+))*)",
        tail, re.IGNORECASE)
    if m_ord:
        keys = re.findall(r"(?:(ASC|DESC)\s*\(\s*\?(\w+)\s*\)|\?(\w+))",
                          m_ord.group(1), re.IGNORECASE)
        cols = [(v1 or v2) for _, v1, v2 in keys]
        desc = [bool(d) and d.upper() == "DESC" for d, _, _ in keys]
        acc = acc.sort(cols, descending=desc)
    if re.search(r"\bOFFSET\s+\d+", tail, re.IGNORECASE):
        raise NotImplementedError(
            "distributed SPARQL: OFFSET is not supported (Ray Datasets "
            "have no skip operator; page with LIMIT + a key predicate)")
    m_lim = re.search(r"\bLIMIT\s+(\d+)", tail, re.IGNORECASE)
    if m_lim:
        acc = acc.limit(int(m_lim.group(1)))
    return acc
