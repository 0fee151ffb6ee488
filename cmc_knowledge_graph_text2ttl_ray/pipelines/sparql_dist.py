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
- any number of ``OPTIONAL { … }`` groups, applied in syntactic
  order with full SPARQL LeftJoin per-binding semantics: groups
  containing property paths / FILTER / UNION evaluate recursively; a
  group correlated through a previous OPTIONAL's possibly-null vars —
  even when the optional side itself carries unbound shared vars —
  joins via BOTH-SIDES bound-var strata (one inner join per observed
  (left, right) null-bitmask pair; unmatched solutions survive
  unextended).  Any number of ``MINUS { … }`` groups (plain/rich
  split; the first plain one fuses into the BGP planner, the rest
  apply as sequential left_anti joins in syntactic order)
- ``FILTER(...)`` — the parser's compiled closures applied per solution
  row (solutions are the post-join RESULT set, orders of magnitude
  smaller than the triple table; a vectorized translation would cover
  only a fraction of the expression grammar)
- ``{ } UNION { }`` groups (arms evaluated independently, columns
  aligned with nulls, correlated with the rest by a hash join on the
  shared variables)
- property paths ``p1/p2`` ``^p`` ``p1|p2`` (grouped), negated
  property sets ``!p`` / ``!(p1|^p2)``, and the closures ``+`` ``*``
  ``?`` over plain IRIs AND complex sub-paths (incl. inside
  alternatives) — lowered to the SPARQL-1.1 fresh-variable BGP
  rewrite (DNF: alternatives become UNION arms; negsets become fresh
  predicate variables with not-in filters; ``+`` patterns scan a
  semi-naive ``forward_chain`` closure computed once per query — a
  complex sub-path's evaluated (start, end) pairs become
  sentinel-predicate edges first; ``*``/``?`` add a zero-length arm:
  reflexive pairs of the bound end, or of every graph term when both
  ends are variables).
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
- SELECT projection, ``DISTINCT``, the full aggregate set COUNT(* /
  ?v) / SUM / MIN / MAX / AVG / SAMPLE / GROUP_CONCAT(;SEPARATOR)
  with optional ``DISTINCT`` modifiers, ``GROUP BY`` (with or without
  aggregates) and ``HAVING`` (compiled filter over the per-group
  rows).  Plain COUNT/SUM/AVG compile to Ray-native aggregates;
  everything else runs the in-memory evaluator's per-group semantics
  (numeric MIN/MAX with per-group lexical fallback, SAMPLE = the
  deterministic minimum, GROUP_CONCAT in sorted value order — a
  documented deviation: a distributed engine has no solution order,
  so it equals the in-memory result under DISTINCT) on ONE coarse
  exchange of the result-sized solution table
- ``ORDER BY`` with the in-memory comparator (numeric when the value
  parses as a number, strings after numbers, unbound lowest) via
  derived sort-key columns, ``OFFSET`` (a distributed ordered split;
  bounded by OFFSET+LIMIT when LIMIT is present) and ``LIMIT``.

MINUS over possibly-null shared variables (on either side) applies
full per-binding §18.5 semantics through the same both-sides strata:
a solution is removed only by a group row agreeing on every var bound
in both with at least one var bound in both.

Property paths / rich groups under ``GRAPH ?var`` evaluate once per
ENUMERATED named graph (bounded at 64 graphs — per-graph closures do
not scale to per-document graphs; beyond the bound it rejects by
name, the one remaining rejection).  Plain BGPs under ``GRAPH ?var``
lower to quad patterns (graph var as a join term) and carry no bound.
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



def _graph_source(graph_iri: str):
    """Source factory for patterns inside ``GRAPH <iri> { … }``: the quad
    dataset restricted to that graph.  Raises a clear error when the
    source carries no ``graph`` column (a plain triple dataset)."""
    def factory(triples):
        import pyarrow.compute as pc

        if hasattr(triples, "scan_for_graph"):
            # graph-bucketed QuadStore: the constant graph prunes the
            # read to its bucket directory (sources/quad_store.py)
            return triples.scan_for_graph(graph_iri)
        base = (triples.scan_for_predicate(None)
                if hasattr(triples, "scan_for_predicate") else triples)

        def pick(t: pa.Table, _g=graph_iri) -> pa.Table:
            if "graph" not in t.column_names:
                raise ValueError(
                    "GRAPH requires a quad source (a 'graph' column); "
                    "this dataset is triple-only")
            return t.filter(pc.fill_null(pc.equal(t["graph"], _g), False))

        return base.map_batches(pick, batch_format="pyarrow")

    return factory


def _compose_graph_source(src, graph_iri: str):
    """Compose a path-arm source factory with a constant-GRAPH filter:
    the arm (plain scan, predicate closure, zero-length reflexive set)
    evaluates over ONLY that graph's quads — per-graph path semantics
    under ``GRAPH <iri> { … path … }``."""
    gsrc = _graph_source(graph_iri)
    if src is None:
        return gsrc

    def factory(triples, _s=src, _g=gsrc):
        return _s(_g(triples))

    return factory


def _pin_triple_schema(ds):
    """Zero-block datasets (a filter emptied every block) lose their
    schema; downstream pandas kernels then KeyError on the missing
    triple columns — pin the canonical (subject, predicate, object)
    empty table instead."""
    sch = ds.schema()
    if sch is None or not list(sch.names):
        import ray.data

        return ray.data.from_arrow(pa.schema(
            [("subject", pa.string()), ("predicate", pa.string()),
             ("object", pa.string())]).empty_table())
    return ds


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
        return forward_chain(_pin_triple_schema(base), [rule])["closure"]

    return factory


def _path_edge_dataset(triples, ast, sent: str, num_partitions=None):
    """Evaluate a path AST over ``triples`` into an EDGE Dataset
    ``(subject, predicate=sent, object)`` — one row per (start, end)
    route (deduped: closure semantics are set-based).  Each DNF arm of
    the inner path runs through ``bgp_query`` with fresh endpoint
    variables; arms union, pairs dedupe on coarse partitions."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import bgp_query

    fresh = _Fresh()
    sv, ov = ("var", "__ca"), ("var", "__cb")
    arms = _lower_path(sv, ast, ov, fresh)
    parts = []
    for pats, fils, srcs in arms:
        resolved = ([src(triples) if src is not None else None
                     for src in srcs]
                    if any(s is not None for s in srcs) else None)
        ds = bgp_query(triples, _conv_patterns(pats),
                       num_partitions=num_partitions,
                       pattern_sources=resolved)
        if fils:
            ds = _row_filters(ds, fils)

        def to_edges(t: pa.Table, _sent=sent) -> pa.Table:
            return pa.table({
                "subject": t["__ca"].cast(pa.string()),
                "predicate": pa.array([_sent] * len(t), pa.string()),
                "object": t["__cb"].cast(pa.string()),
            })

        parts.append(ds.map_batches(to_edges, batch_format="pyarrow"))
    edges = parts[0]
    for other in parts[1:]:
        edges = edges.union(other)
    return coarse_group_reduce(
        edges, ["subject", "object"],
        lambda g: g.drop_duplicates(subset=["subject", "object"]))


def _complex_closure_source(inner_ast, sent: str):
    """Source factory for ``(path)+`` over a COMPLEX sub-path: the inner
    path's (start, end) pairs become sentinel-predicate edges, then the
    same semi-naive ``forward_chain`` closure as the plain-IRI case."""
    def factory(triples):
        from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_infer import (
            Rule,
            forward_chain,
        )

        edges = _pin_triple_schema(
            _path_edge_dataset(triples, inner_ast, sent))
        rule = Rule([("?x", sent, "?y"), ("?y", sent, "?z")],
                    [("?x", sent, "?z")], name="closure")
        return forward_chain(edges, [rule])["closure"]

    return factory


def _zero_length_source(s_term, o_term, sent: str):
    """Source factory for the ZERO-length arm of ``p*`` / ``p?``
    (SPARQL 1.1 §18.4 ZeroLengthPath): sentinel-predicate reflexive
    pairs.  A bound end contributes its own ``(c, c)`` pair (matching
    the in-memory evaluator: membership in the graph is NOT required);
    with both ends variables, every graph term (subjects ∪ objects,
    literals included) gets one — a single coarse-distinct over the
    two narrow columns, no all-to-all beyond it."""
    consts = sorted({t[1] for t in (s_term, o_term) if t[0] == "const"})

    def factory(triples):
        import pyarrow.compute as pc
        import ray.data

        from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
            coarse_group_reduce,
        )

        if consts:
            return ray.data.from_arrow(pa.table({
                "subject": pa.array(consts, pa.string()),
                "predicate": pa.array([sent] * len(consts), pa.string()),
                "object": pa.array(consts, pa.string()),
            }))
        base = (triples.scan_for_predicate(None)
                if hasattr(triples, "scan_for_predicate") else triples)

        def block_nodes(t: pa.Table) -> pa.Table:
            both = pa.chunked_array([t["subject"].cast(pa.string()),
                                     t["object"].cast(pa.string())])
            return pa.table({"node": pc.unique(both.combine_chunks())})

        nodes = coarse_group_reduce(
            base.map_batches(block_nodes, batch_format="pyarrow"),
            ["node"], lambda g: g.drop_duplicates(subset=["node"]))

        def reflexive(t: pa.Table, _sent=sent) -> pa.Table:
            n = t["node"].cast(pa.string())
            return pa.table({
                "subject": n,
                "predicate": pa.array([_sent] * len(t), pa.string()),
                "object": n,
            })

        return _pin_triple_schema(
            nodes.map_batches(reflexive, batch_format="pyarrow"))

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
        if inner[0] == "atom":
            return [([(s_term, ("const", inner[1]), o_term)], [],
                     [_closure_source(inner[1])])]
        # complex sub-path: closure over its evaluated edge pairs
        sent = "urn:x-kg:path-closure-" + fresh()[1]
        return [([(s_term, ("const", sent), o_term)], [],
                 [_complex_closure_source(inner, sent)])]
    if kind in ("star", "opt"):
        inner = ast[1]
        nonzero = _lower_path(
            s_term, ("plus", inner) if kind == "star" else inner,
            o_term, fresh)
        sent = "urn:x-kg:zero-length-" + fresh()[1]
        zero = ([(s_term, ("const", sent), o_term)], [],
                [_zero_length_source(s_term, o_term, sent)])
        return nonzero + [zero]
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


def _strata_prep(ds, shared, with_lid):
    """String-cast + (optionally) full-row content hash ``__lid`` +
    observed null-bitmask ``__stratum`` over ``shared``; materialized
    so the per-stratum picks below reuse one execution."""
    import pyarrow.compute as pc

    def _str_cols(t: pa.Table) -> pa.Table:
        return pa.table({c: t[c].cast(pa.string())
                         for c in t.column_names})

    def add_lid(df, _=None):
        import pandas as pd

        h = pd.util.hash_pandas_object(df, index=False) \
            .astype("uint64").astype("int64")
        df = df.copy()
        df["__lid"] = h
        return df

    def add_mask(t: pa.Table, _sh=tuple(shared)) -> pa.Table:
        import numpy as np

        mask = np.zeros(len(t), dtype="int64")
        for i, c in enumerate(_sh):
            isnull = pc.is_null(t[c]).to_numpy(zero_copy_only=False)
            mask |= isnull.astype("int64") << i
        return t.append_column("__stratum", pa.array(mask, pa.int64()))

    def fix_types(t: pa.Table) -> pa.Table:
        # the pandas hop in add_lid re-infers an ALL-NULL column as
        # Arrow `null` type; joins reject null-typed non-key fields —
        # force every non-lid column back to string
        return pa.table({c: (t[c].cast(pa.int64()) if c == "__lid"
                             else t[c].cast(pa.string()))
                         for c in t.column_names})

    out = ds.map_batches(_str_cols, batch_format="pyarrow")
    if with_lid:
        out = out.map_batches(add_lid, batch_format="pandas") \
                 .map_batches(fix_types, batch_format="pyarrow")
    return out.map_batches(add_mask, batch_format="pyarrow").materialize()


def _compat_matches(lm, rm, shared, out_cols, np_join,
                    cross_on_disjoint=True, with_lid=True):
    """Per-binding-compatible matches of two solution sets (§18.5
    compatibility: agree on every var bound in BOTH; a null shared var
    is a wildcard).  ``lm``/``rm`` come from :func:`_strata_prep`.
    Returns the list of per-(left-stratum, right-stratum) projected
    match datasets — the shared core of LeftJoin (crossing pairs with
    no commonly-bound var), MINUS (skipping them — the disjoint-domain
    guard) and plain Join over nullable solutions."""
    import pyarrow.compute as pc

    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import _compact

    def pick(src, mask):
        def fn(t: pa.Table, _m=mask) -> pa.Table:
            t = t.filter(pc.equal(t["__stratum"], _m))
            return t.select([c for c in t.column_names
                             if c != "__stratum"])

        return _compact(src.map_batches(fn, batch_format="pyarrow"))[0]

    proj_cols = list(out_cols) + (["__lid"] if with_lid else [])
    parts = []
    for ml in sorted(lm.unique("__stratum")):
        l_unbound = {c for i, c in enumerate(shared) if (ml >> i) & 1}
        stratum = pick(lm, ml)
        if stratum is None:
            continue
        for mr in sorted(rm.unique("__stratum")):
            r_unbound = {c for i, c in enumerate(shared)
                         if (mr >> i) & 1}
            join_on = [c for c in shared
                       if c not in l_unbound and c not in r_unbound]
            if not join_on and not cross_on_disjoint:
                continue  # MINUS: disjoint domains remove nothing
            rstr = pick(rm, mr)
            if rstr is None:
                continue
            r_all = rstr.rename_columns(
                {c: c + "__r" for c in rstr.schema().names})
            if join_on:
                j = stratum.join(
                    r_all, join_type="inner",
                    num_partitions=np_join,
                    on=tuple(join_on),
                    right_on=tuple(c + "__r" for c in join_on))
            else:
                # no var bound on both sides: everything compatible
                s2 = stratum.map_batches(
                    lambda t: t.append_column(
                        "__x", pa.array(["_"] * len(t), pa.string())),
                    batch_format="pyarrow")
                r3 = r_all.map_batches(
                    lambda t: t.append_column(
                        "__x__r", pa.array(["_"] * len(t), pa.string())),
                    batch_format="pyarrow")
                j = s2.join(r3, join_type="inner",
                            num_partitions=np_join,
                            on=("__x",), right_on=("__x__r",))

            def project(t: pa.Table,
                        _lu=frozenset(l_unbound),
                        _oc=tuple(proj_cols)) -> pa.Table:
                cols = {}
                for c in _oc:
                    # a shared var unbound on the left takes the right
                    # side's value (may itself be null); right-only
                    # vars come from the right
                    src = c
                    if c in _lu or (c + "__r" in t.column_names
                                    and c not in t.column_names):
                        src = c + "__r"
                    cols[c] = (t[src].cast(
                        pa.string() if c != "__lid" else pa.int64())
                        if src in t.column_names
                        else pa.nulls(len(t), pa.string()))
                return pa.table(cols, schema=pa.schema(
                    [(c, pa.string() if c != "__lid" else pa.int64())
                     for c in _oc]))

            parts.append(j.map_batches(project, batch_format="pyarrow"))
    return parts


def _matched_lid_anti(lm, matches, np_join):
    """``lm`` rows whose ``__lid`` appears in no match row."""
    def dedup_ids(t: pa.Table) -> pa.Table:
        # empty filter outputs can arrive as schema-less blocks;
        # emit a stable one-column __mid schema either way
        if "__lid" not in t.column_names:
            return pa.table({"__mid": pa.array([], pa.int64())})
        return pa.table({"__mid": t["__lid"]}) \
                 .group_by(["__mid"]).aggregate([])

    matched_ids = matches.map_batches(
        dedup_ids, batch_format="pyarrow").materialize()
    if matched_ids.count() == 0:
        # a fully-empty materialized dataset loses its schema and the
        # anti-join would fail resolving __mid; nothing matched
        return lm
    return lm.join(matched_ids, join_type="left_anti",
                   num_partitions=np_join,
                   on=("__lid",), right_on=("__mid",))


def _compat_inner_join(left, right, shared, out_cols, np_join):
    """SPARQL Join over two solution sets where shared vars may be
    null on either side (per-binding compatibility; null = wildcard).
    Union of :func:`_compat_matches` with crossing pairs kept (Join,
    unlike MINUS, has no disjoint-domain guard)."""
    import ray.data as _rd

    lm = _strata_prep(left, shared, with_lid=False)
    rm = _strata_prep(right, shared, with_lid=False)
    parts = _compat_matches(lm, rm, shared, out_cols, np_join,
                            cross_on_disjoint=True, with_lid=False)
    sch = pa.schema([(c, pa.string()) for c in out_cols])
    if not parts:
        return _rd.from_arrow(sch.empty_table())
    out = parts[0]
    for other in parts[1:]:
        out = out.union(other)
    osch = out.schema()
    if osch is None or not list(osch.names):  # zero blocks → schema lost
        return _rd.from_arrow(sch.empty_table())
    return out


def _left_join(acc, opt_ds, nullable, num_partitions):
    """SPARQL algebra ``LeftJoin(acc, opt)`` (§18.5): for each solution
    μ1, extend by every COMPATIBLE optional solution μ2 (agree on the
    variables bound in BOTH), or keep μ1 unextended when none matches.
    Returns ``(joined, vars-made-nullable)``.

    When no shared variable can be null on EITHER side this is one
    left-outer hash join.  Otherwise — the OPTIONAL correlates through
    a previous OPTIONAL's possibly-null vars, and/or the OPTIONAL side
    itself carries unbound shared vars (nested OPTIONAL / UNION inside
    the group) — BOTH sides are STRATIFIED by which shared vars are
    actually bound (observed null bitmasks, at most 2^k each): every
    (left-stratum, right-stratum) pair inner-joins on the vars bound in
    both (an all-unbound pair crosses — compatible with anything), the
    pairs union into the matched rows, and μ1 rows matching NO pair
    survive unextended.  Unmatched detection keys on a content hash of
    the full left row (identical rows have identical match status, so
    bag multiplicities are preserved; 64-bit hash, collision odds
    negligible at solution-set size)."""
    import pyarrow.compute as pc
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import _compact

    opt_cols = [c for c in opt_ds.schema().names
                if not c.startswith("__p")]
    acc_cols = list(acc.schema().names)
    shared = sorted(set(acc_cols) & set(opt_cols))
    if not shared:
        raise ValueError(
            "OPTIONAL group shares no variable with the required "
            "patterns — an unconstrained cross product is rejected")
    extra = sorted(set(opt_cols) - set(shared))
    out_cols = sorted(set(acc_cols) | set(opt_cols))
    null_shared = sorted(set(shared) & nullable)
    out_schema = pa.schema([(c, pa.string()) for c in out_cols])

    left, n_l = _compact(acc)
    right, n_r = _compact(opt_ds.select_columns(opt_cols))
    if left is None:
        return ray.data.from_arrow(out_schema.empty_table()), set(extra)
    if right is None:
        def add_nulls(t: pa.Table, _extra=tuple(extra)) -> pa.Table:
            for name in _extra:
                t = t.append_column(name, pa.nulls(len(t), pa.string()))
            return t

        return (left.map_batches(add_nulls, batch_format="pyarrow"),
                set(extra))

    def _str_cols(t: pa.Table) -> pa.Table:
        return pa.table({c: t[c].cast(pa.string())
                         for c in t.column_names})

    right = right.map_batches(_str_cols, batch_format="pyarrow")
    np_join = max(1, min(default_join_partitions(),
                         -(-min(n_l, n_r) // 50_000)))

    n_right_nulls = int(right.map_batches(
        lambda t, _sh=tuple(shared): pa.table(
            {"n": pa.array([sum(t[c].null_count for c in _sh)],
                           pa.int64())}),
        batch_format="pyarrow").sum("n") or 0)

    if not null_shared and not n_right_nulls:
        r2 = right.rename_columns({c: c + "__r" for c in shared})
        j = left.join(r2, join_type="left_outer",
                      num_partitions=np_join,
                      on=tuple(shared),
                      right_on=tuple(c + "__r" for c in shared))
        return j.select_columns(out_cols), set(extra)

    # ---- general per-binding compatibility (nulls on EITHER side) ----
    lm = _strata_prep(left, shared, with_lid=True)
    rm = _strata_prep(right, shared, with_lid=False)
    parts = _compat_matches(lm, rm, shared, out_cols, np_join,
                            cross_on_disjoint=True, with_lid=True)

    import ray.data as _rd

    lid_schema = pa.schema([(c, pa.string()) for c in out_cols]
                           + [("__lid", pa.int64())])
    if parts:
        matches = parts[0]
        for other in parts[1:]:
            matches = matches.union(other)
        matches = matches.materialize()
        unmatched = _matched_lid_anti(lm, matches, np_join)
    else:
        matches = _rd.from_arrow(lid_schema.empty_table())
        unmatched = lm

    def pad_left(t: pa.Table, _oc=tuple(out_cols)) -> pa.Table:
        cols = {}
        for c in _oc:
            cols[c] = (t[c].cast(pa.string()) if c in t.column_names
                       else pa.nulls(len(t), pa.string()))
        return pa.table(cols, schema=pa.schema(
            [(c, pa.string()) for c in _oc]))

    out = matches.map_batches(pad_left, batch_format="pyarrow") \
                 .union(unmatched.map_batches(pad_left,
                                              batch_format="pyarrow"))
    osch = out.schema()
    if osch is None or not list(osch.names):  # zero blocks → schema lost
        out = ray.data.from_arrow(out_schema.empty_table())
    return out, set(extra)


def _minus_nullable(left, right, shared, np_join):
    """SPARQL §18.5 Minus with possibly-null shared vars on either
    side: :func:`_compat_matches` with the disjoint-domain guard
    (pairs sharing no bound var remove nothing) marks removed left
    rows by content hash; the survivors anti-join back."""
    out_cols = list(left.schema().names)
    lm = _strata_prep(left, shared, with_lid=True)
    rm = _strata_prep(right, shared, with_lid=False)
    parts = _compat_matches(lm, rm, shared, [], np_join,
                            cross_on_disjoint=False, with_lid=True)

    def drop_helpers(t: pa.Table, _oc=tuple(out_cols)) -> pa.Table:
        return pa.table({c: t[c] for c in _oc})

    def pin_schema(ds):
        import ray.data as _rd

        dsch = ds.schema()
        if dsch is None or not list(dsch.names):  # zero blocks
            return _rd.from_arrow(pa.schema(
                [(c, pa.string()) for c in out_cols]).empty_table())
        return ds

    if not parts:
        return pin_schema(
            lm.map_batches(drop_helpers, batch_format="pyarrow"))
    removed = parts[0]
    for other in parts[1:]:
        removed = removed.union(other)
    kept = _matched_lid_anti(lm, removed.materialize(), np_join)
    return pin_schema(
        kept.map_batches(drop_helpers, batch_format="pyarrow"))

_MAX_ENUM_GRAPHS = 64


def _eval_var_graph_group(triples, gvar, inner, num_partitions):
    """``GRAPH ?var { … paths / rich elements … }``: enumerate the
    NAMED graphs (one distinct scan over the graph column), evaluate
    the inner group once per graph through the constant-graph
    machinery, bind ``?var`` to the graph name, union.

    Partitioning assumption, documented: per-graph path closures are
    inherently one evaluation per graph, so this path is bounded to
    ``_MAX_ENUM_GRAPHS`` named graphs — beyond that (e.g. per-document
    graphs at corpus scale) it raises by name rather than launching an
    unbounded driver loop.  Plain BGPs under ``GRAPH ?var`` do NOT take
    this path (they lower to quad patterns with the graph var as a
    join term — unbounded-graph safe)."""
    import pyarrow.compute as pc
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    base = (triples.scan_for_graph(None)
            if hasattr(triples, "scan_for_graph")
            else triples.scan_for_predicate(None)
            if hasattr(triples, "scan_for_predicate") else triples)

    def names(t: pa.Table) -> pa.Table:
        if "graph" not in t.column_names:
            raise ValueError(
                "GRAPH requires a quad source (a 'graph' column); "
                "this dataset is triple-only")
        g = pc.unique(pa.chunked_array([t["graph"].cast(pa.string())])
                      .combine_chunks())
        return pa.table({"g": g})

    distinct = coarse_group_reduce(
        base.map_batches(names, batch_format="pyarrow"),
        ["g"], lambda df: df.drop_duplicates()).materialize()
    n_graphs = distinct.count()
    if n_graphs > _MAX_ENUM_GRAPHS:
        raise NotImplementedError(
            f"distributed SPARQL: GRAPH ?var with property paths / "
            f"rich groups enumerates named graphs — {n_graphs} exceed "
            f"the {_MAX_ENUM_GRAPHS} bound (per-graph closures do not "
            f"scale to per-document graphs)")
    graphs = sorted(r["g"] for r in distinct.take_all() if r["g"])

    parts = []
    expected_cols = {gvar}
    for gname in graphs:
        sub = _group_dataset(_graph_source(gname)(triples), inner,
                             num_partitions)
        sub_sch = sub.schema()
        if sub_sch is not None:
            expected_cols |= {c for c in sub_sch.names
                              if not c.startswith("__p")}

        def bind_graph(t: pa.Table, _g=gname, _v=gvar) -> pa.Table:
            cols = {c: t[c].cast(pa.string()) for c in t.column_names}
            cols[_v] = pa.array([_g] * len(t), pa.string())
            names_ = sorted(cols)
            return pa.table({c: cols[c] for c in names_},
                            schema=pa.schema([(c, pa.string())
                                              for c in names_]))

        parts.append(sub.map_batches(bind_graph, batch_format="pyarrow"))
    empty = pa.schema([(c, pa.string())
                       for c in sorted(expected_cols)]).empty_table()
    if not parts:
        return ray.data.from_arrow(empty)
    out = parts[0]
    for other in parts[1:]:
        out = out.union(other)
    osch = out.schema()
    if osch is None or not list(osch.names):  # every per-graph result empty
        return ray.data.from_arrow(empty)
    return out


def _translate_group(elements):
    patterns, optionals, minuses, filters, unions = [], [], [], [], []
    binds, values_blocks, exists_groups, subqueries = [], [], [], []
    graph_groups = []  # (graph_iri, inner elements) — rich constant-GRAPH
    var_graph_groups = []  # (var name, inner elements) — rich GRAPH ?var
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
                # real alternatives become UNION arms; lowered patterns
                # keep their per-pattern sources (closure / zero-length
                # arms) via the internal ``bgp_lowered`` element kind
                unions.append(
                    [[("bgp_lowered", (pats, fils, srcs))]
                     for pats, fils, srcs in conj_alts])
        elif kind == "bgp_lowered":
            # internal: a pre-lowered UNION arm (patterns already in
            # term form, aligned filters + per-pattern sources)
            pats, fils, srcs = payload
            patterns.extend(_conv_patterns(pats))
            filters.extend(fils)
            sources.extend(srcs)
        elif kind == "optional":
            # plain BGP groups ride bgp_query's left-outer machinery;
            # groups with paths / FILTER / UNION inside ("rich") are
            # evaluated recursively and joined by _group_dataset
            try:
                optionals.append(("plain", _bgp_only(payload,
                                                     "OPTIONAL")))
            except NotImplementedError:
                optionals.append(("rich", payload))
        elif kind == "minus":
            # any number of MINUS groups, applied in syntactic order
            # (Minus(Minus(acc, m1), m2) — sequential left_anti)
            try:
                minuses.append(("plain", _bgp_only(payload, "MINUS")))
            except NotImplementedError:
                minuses.append(("rich", payload))
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
        elif kind == "graph":
            # GRAPH ?g { BGP [FILTER…] } — patterns become QUADS (the
            # graph var is a 4th join term, so multi-pattern groups are
            # same-graph-constrained for free); GRAPH <iri> { … } keeps
            # 3-term patterns over a graph-filtered source.  Default-graph
            # semantics outside GRAPH are the UNION of all graphs (the
            # rdflib-Dataset default_union / Virtuoso convention),
            # documented deviation from the SPARQL dataset model.
            gterm, inner = payload
            g = _conv_term(gterm)
            if g.startswith("?") and (
                    any(k not in ("bgp", "filter") for k, _ in inner)
                    or any(isinstance(pat[1], tuple)
                           and pat[1][0] == "path"
                           for k, pl in inner if k == "bgp"
                           for pat in pl)):
                # paths / rich elements under a VARIABLE graph: evaluate
                # once per ENUMERATED named graph (bounded — see
                # _eval_var_graph_group) through the constant-graph
                # machinery, binding the var to each graph name
                var_graph_groups.append((g[1:], inner))
                continue
            if not g.startswith("?") and any(
                    k not in ("bgp", "filter") for k, _ in inner):
                # rich group under a CONSTANT graph: evaluate the whole
                # inner group recursively over the graph-filtered source
                # and join back on the shared vars (same shape as a
                # subquery) — full OPTIONAL/UNION/MINUS semantics per
                # graph for free
                graph_groups.append((g, inner))
                continue
            for ikind, ipayload in inner:
                if ikind == "filter":
                    filters.append(ipayload)
                    continue
                if ikind != "bgp":
                    raise NotImplementedError(
                        f"distributed SPARQL: {ikind.upper()} inside "
                        "GRAPH ?var is not supported (constant "
                        "GRAPH <iri> is)")
                plain_pats, path_pats = [], []
                for pat in ipayload:
                    if isinstance(pat[1], tuple) and pat[1][0] == "path":
                        path_pats.append(pat)
                    else:
                        plain_pats.append(pat)
                if g.startswith("?"):
                    if path_pats:
                        # per-graph path closures with a VARIABLE graph
                        # would need one closure per named graph
                        raise NotImplementedError(
                            "distributed SPARQL: property paths inside "
                            "GRAPH ?var are not supported (constant "
                            "GRAPH <iri> is)")
                    patterns.extend(
                        tuple(_conv_term(t) for t in pat) + (g,)
                        for pat in plain_pats)
                    sources.extend([None] * len(plain_pats))
                    # SPARQL §13.3: GRAPH ?g ranges over NAMED graphs
                    # only — default-graph rows (graph = "" / null) must
                    # not bind; filter on the result set (cheap)
                    filters.append(
                        lambda b, _v=g[1:]: bool(b.get(_v)))
                else:
                    patterns.extend(_conv_patterns(plain_pats))
                    sources.extend([_graph_source(g)] * len(plain_pats))
                    # property paths under a CONSTANT graph: lower as
                    # usual, then compose every arm source (including
                    # the default triple scan) with the graph filter so
                    # closures / zero-length arms see ONLY that graph
                    for pat in path_pats:
                        ps, pp, po = pat
                        alts = _lower_path(ps, pp[1], po, fresh)
                        alts = [(pats_, fils_,
                                 [_compose_graph_source(src_, g)
                                  for src_ in srcs_])
                                for pats_, fils_, srcs_ in alts]
                        if len(alts) == 1:
                            pats_, fils_, srcs_ = alts[0]
                            patterns.extend(_conv_patterns(pats_))
                            filters.extend(fils_)
                            sources.extend(srcs_)
                        else:
                            unions.append(
                                [[("bgp_lowered", (pats_, fils_, srcs_))]
                                 for pats_, fils_, srcs_ in alts])
        else:
            raise NotImplementedError(
                f"distributed SPARQL: {kind.upper()} is not supported")
    return (patterns, optionals, minuses, filters, unions, binds,
            values_blocks, exists_groups, subqueries, sources,
            graph_groups, var_graph_groups)


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

    (patterns, optionals, minuses, filters, unions, binds,
     values_blocks, exists_groups, subqueries, sources,
     graph_groups, var_graph_groups) = _translate_group(elements)

    # the FIRST plain MINUS fuses into bgp_query's planner (one pass) —
    # but only over a PURE BGP group: with OPTIONAL/UNION/subquery
    # elements the subtraction must apply AFTER those joins (syntactic
    # order, §18.5), and it must share a var with the required patterns
    # (else bgp_query's cross-product guard fires where the spec says
    # "removes nothing").  Every other group applies sequentially below.
    plain_minus = None
    rest_minuses = minuses
    if (minuses and minuses[0][0] == "plain"
            and not optionals and not unions and not subqueries):
        m_vars = {t for pat in minuses[0][1] for t in pat
                  if isinstance(t, str) and t.startswith("?")}
        req_vars = {t for pat in patterns for t in pat
                    if isinstance(t, str) and t.startswith("?")}
        if m_vars & req_vars:
            plain_minus = minuses[0][1]
            rest_minuses = minuses[1:]
    # vars that may be NULL in acc (introduced by an OPTIONAL or by a
    # UNION arm that lacks them) — a later OPTIONAL correlated through
    # these takes the per-binding-substitution LeftJoin path
    nullable: set = set()

    acc = None
    if patterns:
        resolved = ([src(triples) if src is not None else None
                     for src in sources]
                    if any(src is not None for src in sources) else None)
        acc = bgp_query(triples, patterns,
                        minus_patterns=plain_minus or None,
                        num_partitions=num_partitions,
                        pattern_sources=resolved)
    elif optionals or minuses:
        raise NotImplementedError(
            "distributed SPARQL: OPTIONAL/MINUS need required patterns")

    for arms in unions:
        arm_ds = [_group_dataset(triples, arm, num_partitions)
                  for arm in arms]
        all_cols = sorted({c for d in arm_ds for c in d.schema().names})
        common = set(arm_ds[0].schema().names)
        for d in arm_ds[1:]:
            common &= set(d.schema().names)
        nullable |= set(all_cols) - common

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
            np_join = max(1, min(default_join_partitions(),
                                 -(-min(n_l, n_r) // 50_000)))
            u_out = sorted(set(left.schema().names) | set(all_cols))
            n_unulls = int(right.map_batches(
                lambda t, _sh=tuple(shared): pa.table(
                    {"n": pa.array([sum(t[c].null_count
                                        for c in _sh
                                        if c in t.column_names)],
                                   pa.int64())}),
                batch_format="pyarrow").sum("n") or 0)
            if n_unulls or (set(shared) & nullable):
                # a UNION arm lacking a shared var (or a nullable acc
                # var) makes the strict hash join drop rows the spec
                # keeps: per-binding Join via the strata helper
                acc = _compat_inner_join(left, right, shared, u_out,
                                         np_join)
            else:
                right = right.rename_columns(
                    {c: c + "__r" for c in shared})
                acc = left.join(
                    right, join_type="inner", num_partitions=np_join,
                    on=tuple(shared),
                    right_on=tuple(c + "__r" for c in shared))
                acc = acc.select_columns(u_out)

    # rich constant-GRAPH groups: each evaluates recursively over the
    # graph-filtered source, then joins back on the shared vars
    all_graph_groups = ([("const", k, i) for k, i in graph_groups]
                        + [("var", k, i) for k, i in var_graph_groups])
    for gg_kind, gg_key, g_inner in all_graph_groups:
        if gg_kind == "const":
            gds = _group_dataset(_graph_source(gg_key)(triples),
                                 g_inner, num_partitions)
        else:
            gds = _eval_var_graph_group(triples, gg_key, g_inner,
                                        num_partitions)
        g_cols = [c for c in gds.schema().names
                  if not c.startswith("__p")]
        gds = gds.select_columns(g_cols)
        if acc is None:
            acc = gds
            # the recursive evaluation's own nullable set is not
            # plumbed out; mark every var conservatively (only routes
            # later joins to the general per-binding path)
            nullable |= set(g_cols)
            continue
        shared = sorted(set(acc.schema().names) & set(g_cols))
        if not shared:
            raise NotImplementedError(
                "distributed SPARQL: GRAPH group sharing no variable "
                "with the rest of the WHERE clause (cross product)")
        left, n_l = _compact(acc)
        right, n_r = _compact(gds)
        if left is None or right is None:
            import ray.data

            sch = pa.schema([(c, pa.string()) for c in sorted(
                set(acc.schema().names) | set(g_cols))])
            return ray.data.from_arrow(sch.empty_table())
        n_gnulls = int(right.map_batches(
            lambda t, _sh=tuple(shared): pa.table(
                {"n": pa.array([sum(t[c].null_count for c in _sh)],
                               pa.int64())}),
            batch_format="pyarrow").sum("n") or 0)
        np_join = max(1, min(default_join_partitions(),
                             -(-min(n_l, n_r) // 50_000)))
        g_out = sorted(set(left.schema().names) | set(g_cols))
        if n_gnulls or (set(shared) & nullable):
            # shared vars may be unbound on either side: per-binding
            # Join via the both-sides strata helper
            acc = _compat_inner_join(left, right, shared, g_out,
                                     np_join)
        else:
            def _str_cols_g(t: pa.Table) -> pa.Table:
                return pa.table({c: t[c].cast(pa.string())
                                 for c in t.column_names})

            right = right.map_batches(_str_cols_g,
                                      batch_format="pyarrow") \
                         .rename_columns(
                             {c: c + "__r" for c in shared})
            acc = left.join(right, join_type="inner",
                            num_partitions=np_join,
                            on=tuple(shared),
                            right_on=tuple(c + "__r" for c in shared))
            acc = acc.select_columns(g_out)
        # vars the GRAPH group introduced may be null (inner OPTIONAL)
        nullable |= set(g_cols) - set(shared)

    if acc is None:
        raise NotImplementedError("distributed SPARQL: empty WHERE body")

    # OPTIONAL groups, in syntactic order: plain BGPs evaluate through
    # bgp_query, rich groups (paths / FILTER / UNION inside) through
    # the recursive group evaluator; both left-join via _left_join,
    # which switches to per-binding-substitution strata when the group
    # correlates through a previous OPTIONAL's nullable variables
    for opt_kind, payload in optionals:
        if opt_kind == "plain":
            opt_ds = bgp_query(triples, payload,
                               num_partitions=num_partitions)
        else:
            opt_ds = _group_dataset(triples, payload, num_partitions)
        acc, new_nullable = _left_join(acc, opt_ds, nullable,
                                       num_partitions)
        nullable |= new_nullable

    # remaining MINUS groups, in order: remove solutions with a
    # compatible row in the group (left_anti on the shared vars;
    # sharing none removes nothing)
    for min_kind, min_payload in rest_minuses:
        if min_kind == "plain":
            min_ds = bgp_query(triples, min_payload,
                               num_partitions=num_partitions)
        else:
            min_ds = _group_dataset(triples, min_payload, num_partitions)
        min_cols = [c for c in min_ds.schema().names
                    if not c.startswith("__p")]
        shared = sorted(set(acc.schema().names) & set(min_cols))
        if not shared:
            continue  # disjoint domains remove nothing (§18.5 guard)
        left, n_l = _compact(acc)
        right, n_r = _compact(min_ds.select_columns(shared))
        if left is None:
            import ray.data

            sch = pa.schema([(c, pa.string())
                             for c in acc.schema().names])
            acc = ray.data.from_arrow(sch.empty_table())
            continue
        if right is None:
            continue
        n_right_nulls = int(right.map_batches(
            lambda t, _sh=tuple(shared): pa.table(
                {"n": pa.array([sum(t[c].null_count for c in _sh)],
                               pa.int64())}),
            batch_format="pyarrow").sum("n") or 0)
        np_join = max(1, min(default_join_partitions(),
                             -(-min(n_l, n_r) // 50_000)))
        if not (set(shared) & nullable) and not n_right_nulls:
            def _min_keys(t: pa.Table, _sh=tuple(shared)) -> pa.Table:
                sub = pa.table({c + "__r": t[c].cast(pa.string())
                                for c in _sh})
                return sub.group_by(
                    list(sub.column_names)).aggregate([])

            right = right.map_batches(_min_keys,
                                      batch_format="pyarrow")
            acc = left.join(
                right, join_type="left_anti",
                num_partitions=np_join,
                on=tuple(shared),
                right_on=tuple(c + "__r" for c in shared))
        else:
            # per-binding MINUS (§18.5): μ1 removed iff some μ2 agrees
            # on every var bound in BOTH and they share at least one
            # bound var — the same both-sides strata machinery as
            # _left_join, collecting REMOVED ids instead of matches
            acc = _minus_nullable(left, right, shared, np_join)

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

        np_join = max(1, min(default_join_partitions(),
                             -(-min(n_l, n_r) // 50_000)))
        sq_out = sorted(set(left.schema().names) | sub_cols)
        n_snulls = int(right.map_batches(
            lambda t, _sh=tuple(shared): pa.table(
                {"n": pa.array([sum(t[c].null_count for c in _sh)],
                               pa.int64())}),
            batch_format="pyarrow").sum("n") or 0)
        if n_snulls or (set(shared) & nullable):
            # subquery projections (or the outer acc) may be null on a
            # shared var: per-binding Join via the strata helper
            acc = _compat_inner_join(left, right, shared, sq_out,
                                     np_join)
        else:
            def _str_cols(t: pa.Table) -> pa.Table:
                return pa.table({c: t[c].cast(pa.string())
                                 for c in t.column_names})

            right = right.map_batches(_str_cols,
                                      batch_format="pyarrow") \
                         .rename_columns(
                             {c: c + "__r" for c in shared})
            acc = left.join(right, join_type="inner",
                            num_partitions=np_join,
                            on=tuple(shared),
                            right_on=tuple(c + "__r" for c in shared))
            acc = acc.select_columns(sq_out)
        nullable |= sub_cols - set(shared)

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
    pre_sch = acc.schema()
    if filters:
        acc = _row_filters(acc, filters)
    sch = acc.schema()
    if sch is None or not list(sch.names):
        # a filter that empties every block loses the schema (zero
        # blocks / empty-name blocks); pin the pre-filter column set
        import ray.data

        names = pre_sch.names if pre_sch is not None else []
        return ray.data.from_arrow(pa.schema(
            [(c, pa.string()) for c in names
             if not c.startswith("__p")]).empty_table())
    internal = [c for c in sch.names if c.startswith("__p")]
    if internal:
        acc = acc.select_columns(
            [c for c in sch.names if not c.startswith("__p")])
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
    r"^\(\s*(COUNT|SUM|MIN|MAX|AVG|SAMPLE|GROUP_CONCAT)\s*\(\s*"
    r"(DISTINCT\s+)?(\*|\?\w+)\s*"
    r"(?:;\s*SEPARATOR\s*=\s*\"([^\"]*)\"\s*)?\)\s+AS\s+\?(\w+)\s*\)$",
    re.IGNORECASE)


def _general_aggregate(acc, group_vars, agg_items):
    """Aggregates Ray's native aggregate objects can't express —
    DISTINCT modifiers, SAMPLE, GROUP_CONCAT, and MIN/MAX with the
    in-memory evaluator's PER-GROUP lexical fallback — via ONE
    ``coarse_group_reduce`` exchange of the (post-join, result-sized)
    solution table on hash(group keys): each group's rows land in one
    coarse partition, where a pandas combine replicates
    ``GraphIndex._apply_aggregation``'s per-group semantics exactly.

    Output dtypes: COUNT → int64, SUM/AVG → float64 (non-numeric values
    raise, matching the in-memory QueryError), MIN/MAX → string in the
    in-memory evaluator's numeric rendering (``str(int(x))`` when
    integral) with lexical per-group fallback, SAMPLE → the group's
    minimum lexical value (deterministic), GROUP_CONCAT → values in
    SORTED order (deviation, documented: a distributed engine has no
    solution order; equals the in-memory result under DISTINCT)."""
    import numpy as np
    import pandas as pd

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    out_aliases = [alias for *_x, alias in agg_items]
    int_aliases = {alias for fname, _d, _v, _s, alias in agg_items
                   if fname == "COUNT"}
    float_aliases = {alias for fname, _d, _v, _s, alias in agg_items
                     if fname in ("SUM", "AVG")}

    def agg_group(g: pd.DataFrame, row: dict) -> dict:
        for fname, dist, var, sep, alias in agg_items:
            if var is None:  # COUNT(*) / COUNT(DISTINCT *)
                row[alias] = int(len(g.drop_duplicates()) if dist
                                 else len(g))
                continue
            vals = [v for v in g[var].tolist()
                    if v is not None and v == v]
            if dist:
                vals = sorted({str(v) for v in vals})
            if fname == "COUNT":
                row[alias] = int(len(vals))
                continue
            if fname == "GROUP_CONCAT":
                row[alias] = sep.join(
                    str(v) for v in (vals if dist
                                     else sorted(map(str, vals))))
                continue
            if not vals:
                continue  # SUM/MIN/MAX/AVG/SAMPLE of nothing: unbound
            if fname == "SAMPLE":
                row[alias] = str(min(str(v) for v in vals))
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
                    raise ValueError(
                        f"aggregate {fname} over non-numeric values "
                        f"of ?{var}")
                row[alias] = sum(nums) / (len(nums) if fname == "AVG"
                                          else 1)
            elif nums is not None:
                x = min(nums) if fname == "MIN" else max(nums)
                row[alias] = (str(int(x)) if float(x).is_integer()
                              else str(x))
            else:
                svals = [str(v) for v in vals]
                row[alias] = min(svals) if fname == "MIN" else max(svals)
        return row

    keys = group_vars or ["__g"]
    if not group_vars:
        acc = acc.map_batches(
            lambda t: t.append_column(
                "__g", pa.array(["_"] * len(t), pa.string())),
            batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(keys, dropna=False, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            row = {v: k for v, k in zip(group_vars, key)
                   if k is not None and k == k}
            rows.append(agg_group(g, row))
        cols = group_vars + out_aliases
        out = pd.DataFrame(
            [{c: r.get(c) for c in cols} for r in rows], columns=cols)
        for a in int_aliases:
            out[a] = out[a].astype("int64")
        for a in float_aliases:
            out[a] = out[a].astype("float64")
        for c in out.columns:
            if c not in int_aliases and c not in float_aliases:
                out[c] = out[c].astype(object).where(
                    out[c].notna(), None)
        _ = np  # (numpy imported for pandas' benefit on older stacks)
        return out

    return coarse_group_reduce(acc, keys, combine)


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

    agg_items = []  # (fname, distinct, var|None, separator, alias)
    plain_vars = []
    for it in items:
        m_a = _RE_AGG.match(it)
        if m_a:
            agg_items.append((
                m_a.group(1).upper(), bool(m_a.group(2)),
                None if m_a.group(3) == "*" else m_a.group(3)[1:],
                m_a.group(4) if m_a.group(4) is not None else " ",
                m_a.group(5)))
        elif it.startswith("?"):
            plain_vars.append(it[1:])
        elif it == "*":
            plain_vars = [c for c in acc.schema().names]
        else:
            raise NotImplementedError(
                f"distributed SPARQL: select item {it!r}")
    for fname, _d, var, _s, _a in agg_items:
        if var is None and fname != "COUNT":
            raise ValueError(f"{fname}(*) is only valid for COUNT")

    m_grp_plain = re.search(r"GROUP\s+BY\s+((?:\?\w+\s*)+)", tail,
                            re.IGNORECASE)
    if m_grp_plain and not agg_items:
        # GROUP BY without aggregates: one row per group (the group
        # keys), i.e. a distinct projection of the grouping variables
        group_vars = re.findall(r"\?(\w+)", m_grp_plain.group(1))
        acc = acc.select_columns(group_vars)
        acc = coarse_group_reduce(
            acc, group_vars,
            lambda g, _c=tuple(group_vars):
                g.drop_duplicates(subset=list(_c)))
        plain_vars, distinct = group_vars, False

    if agg_items:
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        group_vars = (re.findall(r"\?(\w+)", m_grp_plain.group(1))
                      if m_grp_plain else [])
        if sorted(plain_vars) != sorted(group_vars) and plain_vars:
            raise NotImplementedError(
                "distributed SPARQL: non-grouped plain select vars "
                "alongside aggregates")

        # fast path: Ray-native aggregates, numeric columns, zero
        # Python per group — valid when no item needs DISTINCT /
        # SAMPLE / GROUP_CONCAT / MIN/MAX's per-group lexical fallback
        fast = all(not dist and fname in ("COUNT", "SUM", "AVG")
                   for fname, dist, _v, _s, _a in agg_items)
        if not fast:
            acc = _general_aggregate(acc, group_vars, agg_items)
        else:
            num_needed = sorted({v for fn, _d, v, _s, _a in agg_items
                                 if v is not None and fn in ("SUM",
                                                             "AVG")})

            def prep(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                out = {c: t[c] for c in t.column_names}
                for v in num_needed:
                    try:
                        out["__num_" + v] = pc.cast(t[v], pa.float64())
                    except pa.ArrowInvalid as exc:
                        # match the in-memory evaluator: SUM/AVG over a
                        # non-numeric binding is a query error, not a
                        # silent skip
                        raise ValueError(
                            f"aggregate over non-numeric values of "
                            f"?{v}: {exc}") from exc
                out["__one"] = pa.array([1] * len(t), pa.int64())
                return pa.table(out)

            aggs = []
            for fn, _d, v, _s, alias in agg_items:
                if fn == "COUNT":
                    if v is None:
                        aggs.append(Count(alias_name=alias))
                    else:
                        aggs.append(Count(v, ignore_nulls=True,
                                          alias_name=alias))
                elif fn == "SUM":
                    aggs.append(Sum("__num_" + v, alias_name=alias))
                elif fn == "AVG":
                    aggs.append(Mean("__num_" + v, alias_name=alias))
            acc = acc.map_batches(prep, batch_format="pyarrow")
            if group_vars:
                acc = acc.groupby(group_vars).aggregate(*aggs)
            else:
                acc = acc.groupby("__one").aggregate(*aggs) \
                         .drop_columns(["__one"])
        out_cols = group_vars + [a for *_x, a in agg_items]
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

    # ---- ORDER BY / OFFSET / LIMIT ----
    m_ord = re.search(
        r"ORDER\s+BY\s+((?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+)"
        r"(?:\s+(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+))*)",
        tail, re.IGNORECASE)
    if m_ord:
        keys = re.findall(r"(?:(ASC|DESC)\s*\(\s*\?(\w+)\s*\)|\?(\w+))",
                          m_ord.group(1), re.IGNORECASE)
        cols = [(v1 or v2) for _, v1, v2 in keys]
        desc = [bool(d) and d.upper() == "DESC" for d, _, _ in keys]

        # the in-memory comparator, as derived sort-key columns: per key
        # a (kind, numeric, lexical) triple with kind −1 unbound /
        # 0 numeric / 1 string — so values compare numerically when both
        # parse as numbers, strings sort after numbers, and unbound
        # sorts LOWEST (leads under ASC, trails under DESC)
        def add_sort_keys(df):
            import numpy as np
            import pandas as pd

            for i, c in enumerate(cols):
                v = df[c]
                num = pd.to_numeric(v, errors="coerce")
                unbound = v.isna().to_numpy()
                numeric = num.notna().to_numpy() & ~unbound
                df[f"__ord{i}k"] = np.where(
                    unbound, -1, np.where(numeric, 0, 1)).astype("int8")
                df[f"__ord{i}n"] = num.fillna(0.0).astype("float64")
                df[f"__ord{i}s"] = np.where(
                    numeric | unbound, "", v.astype(str))
            return df

        sort_cols = [f"__ord{i}{p}" for i in range(len(cols))
                     for p in "kns"]
        sort_desc = [d for d in desc for _ in range(3)]
        acc = acc.map_batches(add_sort_keys, batch_format="pandas") \
                 .sort(sort_cols, descending=sort_desc)
        acc = acc.drop_columns(sort_cols)
    m_off = re.search(r"\bOFFSET\s+(\d+)", tail, re.IGNORECASE)
    m_lim = re.search(r"\bLIMIT\s+(\d+)", tail, re.IGNORECASE)
    if m_off and int(m_off.group(1)) > 0:
        # distributed skip: global positions need one materialization —
        # bounded by OFFSET+LIMIT when LIMIT is present, and always
        # applied to the post-modifier RESULT set, not the triple table.
        # Without ORDER BY the skipped rows are engine-order (same as
        # any distributed store); sort first for deterministic paging.
        off = int(m_off.group(1))
        if m_lim:
            acc = acc.limit(off + int(m_lim.group(1)))
        acc = acc.split_at_indices([off])[1]
    if m_lim:
        acc = acc.limit(int(m_lim.group(1)))
    return acc
