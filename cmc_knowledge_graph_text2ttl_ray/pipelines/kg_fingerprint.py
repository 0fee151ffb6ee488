"""Content fingerprints of a KG: order-independent set hashes.

A deterministic 64-bit fingerprint of the DISTINCT triple set (and a
per-named-graph variant) gives O(1) change detection between pipeline
runs — compare fingerprints before shipping a diff or re-uploading, and
verify replicas without moving data.  The reference has no equivalent
(its outputs are compared file-by-file); rerun-determinism tests in this
repo previously compared full shard bytes.

Construction: per triple, ``md5(key)`` where ``key`` joins the identity
columns with ``\\x1f`` (a separator that cannot appear in IRIs and is
escaped in literals is not required — md5 of the joined string with an
unlikely control char keeps the SQL oracle expressible:
``md5_number_upper(s || chr(31) || p || chr(31) || o)`` in DuckDB equals
``int.from_bytes(md5(key)[:8], "little")``).  The set hash is the XOR of
the per-triple values — order-independent and incrementally updatable
(XOR the fingerprint of added/removed triples to roll it forward).

XOR cancels DUPLICATE rows pairwise, so set semantics require global
dedup first: rows co-locate on ``hash(digest) % P`` (one exchange of
16-byte digests — never the triple text), each partition dedups on the
full 128-bit digest (collision odds 2⁻¹²⁸) and XORs locally; the driver
folds P partial rows.  Per-row md5 is the inherent cost of a content
hash; it is embarrassingly parallel per block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["kg_fingerprint", "kg_fingerprint_by_graph",
           "kg_isocanonical_fingerprint"]

_SEP = "\x1f"


def _digests(df: pd.DataFrame, cols) -> pd.DataFrame:
    keys = df[cols[0]].astype(str)
    for c in cols[1:]:
        keys = keys + _SEP + df[c].astype(str)
    dig = [hashlib.md5(k.encode("utf-8")).digest() for k in keys]
    return pd.DataFrame({"d": dig})


def _xor_fold(vals: np.ndarray) -> int:
    return int(np.bitwise_xor.reduce(vals)) if len(vals) else 0


def kg_fingerprint(triples, cols=("subject", "predicate", "object"),
                   num_coarse=None) -> pd.DataFrame:
    """One-row DataFrame: ``n_triples`` (distinct) + ``fingerprint``
    (16-hex-char set hash over ``cols``)."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    cols = list(cols)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return _digests(df, cols).drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        d = g["d"].drop_duplicates()
        u = np.frombuffer(b"".join(d), dtype="<u8")[::2]  # first 8 LE bytes
        # the partial travels as a 16-hex STRING: a uint64 > 2^63 in one
        # partition and < 2^63 in another makes Ray's schema unification
        # promote the column to float64, silently destroying low bits
        return pd.DataFrame({"x": [f"{_xor_fold(u):016x}"], "n": [len(d)]})

    parts = coarse_group_reduce(
        triples.map_batches(pre, batch_format="pandas"),
        ["d"], combine, num_coarse=num_coarse).to_pandas()
    fp = 0
    for x in parts["x"]:
        fp ^= int(x, 16)
    return pd.DataFrame([{
        "n_triples": int(parts["n"].sum()),
        "fingerprint": f"{fp:016x}",
    }])


def kg_fingerprint_by_graph(quads, cols=("subject", "predicate", "object"),
                            num_coarse=None) -> pd.DataFrame:
    """Per-named-graph fingerprints: ``(graph, n_quads, fingerprint)`` —
    change detection per source document.  One exchange keyed by graph;
    each graph's digests dedup and fold inside its partition."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    cols = list(cols)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        out = _digests(df, cols)
        out["graph"] = df["graph"].to_numpy()
        return out.drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        rows = []
        for graph, grp in g.groupby("graph", sort=False):
            u = np.frombuffer(b"".join(grp["d"]), dtype="<u8")[::2]
            rows.append({"graph": graph, "n_quads": len(grp),
                         "fingerprint": f"{_xor_fold(u):016x}"})
        return pd.DataFrame(rows)

    out = coarse_group_reduce(
        quads.map_batches(pre, batch_format="pandas"),
        ["graph"], combine, num_coarse=num_coarse).to_pandas()
    return out.sort_values("graph", ignore_index=True)


# --------------------------------------------------------------------------
# Isomorphism-canonical fingerprint (blank-node-label independent)
# --------------------------------------------------------------------------
#
# The plain set hash above is label-sensitive: re-parsing the same Turtle
# under a different ``bnode_scope`` (functions/turtle.py skolemization)
# changes every skolem IRI and therefore the fingerprint, even though the
# graphs are isomorphic. The canonical variant relabels blank nodes by
# iterated color refinement (the Weisfeiler-Leman / Hogan-2017 /
# RDFC-1.0 family): a bnode's color is the hash of its (direction,
# predicate, neighbor-color-or-ground-term) multiset, refined to a fixed
# point; remaining ties (automorphism candidates) are broken by
# individualize-and-recurse, choosing the lexicographically least
# canonical serialization.

_BNODE_PREFIX = "urn:graft:bnode:"


def _bnode_scope(term: str, prefix: str) -> str:
    """Scope key of a skolem bnode IRI: ``urn:graft:bnode:<scope>:<label>``
    → ``<scope>``; unscoped skolems (no second colon) → ``""``."""
    rest = term[len(prefix):]
    i = rest.rfind(":")
    return rest[:i] if i >= 0 else ""


def _refine(triples, bnodes, color):
    """Iterate WL color refinement to a stable partition."""
    import hashlib as _h

    def partition(c):
        groups = {}
        for b in bnodes:
            groups.setdefault(c[b], []).append(b)
        return frozenset(frozenset(v) for v in groups.values())

    prev = partition(color)
    for _ in range(len(bnodes) + 1):
        new = {}
        for b in bnodes:
            sig = []
            for s, p, o in triples:
                if s == b:
                    sig.append("o\x1f" + p + "\x1f"
                               + (color[o] if o in color else "g:" + str(o)))
                if o == b:
                    sig.append("i\x1f" + p + "\x1f"
                               + (color[s] if s in color else "g:" + str(s)))
            sig.sort()
            new[b] = _h.md5(
                (color[b] + "\x1e" + "\x1e".join(sig)).encode()).hexdigest()
        cur = partition(new)
        color = new
        if cur == prev:
            break
        prev = cur
    return color


def _canonical_digests(triples, prefix: str, _budget=None,
                       _exhausted=None) -> list[bytes]:
    """md5 digests of the group's triples with bnodes canonically
    relabeled ``_:c<rank>``. Ties after refinement are resolved by
    individualizing each candidate of the smallest tied class and keeping
    the lexicographically least serialization (bounded: past ``_budget``
    leaf evaluations the first deterministic choice stands — still
    deterministic for a given input, just not proven canonical; when that
    happens ``_exhausted[0]`` is set so callers can surface that the
    relabel-invariance guarantee is unproven for this group)."""
    import hashlib as _h

    if _budget is None:
        _budget = [64]
    if _exhausted is None:
        _exhausted = [False]
    bnodes = sorted({t for s, _, o in triples for t in (s, o)
                     if isinstance(t, str) and t.startswith(prefix)})
    color = {b: "" for b in bnodes}
    color = _refine(triples, bnodes, color)

    def serialize(c):
        by_color = sorted(c.items(), key=lambda kv: (kv[1], kv[0]))
        label = {b: f"_:c{i}" for i, (b, _) in enumerate(by_color)}
        rows = sorted(
            "\x1f".join(label.get(t, str(t)) for t in (s, p, o))
            for s, p, o in triples)
        return rows

    groups = {}
    for b in bnodes:
        groups.setdefault(color[b], []).append(b)
    tied = sorted((c, sorted(bs)) for c, bs in groups.items()
                  if len(bs) > 1)
    if tied and _budget[0] > 0:
        c, bs = tied[0]
        best = None
        for b in bs:
            if _budget[0] <= 0:
                _exhausted[0] = True  # class not fully explored
                break
            _budget[0] -= 1
            c2 = dict(color)
            c2[b] = _h.md5(("ind\x1e" + c2[b]).encode()).hexdigest()
            c2 = _refine(triples, bnodes, c2)
            rows = _canonical_rows(triples, bnodes, c2, prefix, _budget,
                                   _exhausted)
            if best is None or rows < best:
                best = rows
        rows = best
    else:
        if tied:
            _exhausted[0] = True
        rows = serialize(color)
    return [_h.md5(r.encode("utf-8")).digest() for r in rows]


def _canonical_rows(triples, bnodes, color, prefix, _budget,
                    _exhausted=None):
    """Recursive helper: resolve remaining ties under ``color``."""
    import hashlib as _h

    if _exhausted is None:
        _exhausted = [False]
    groups = {}
    for b in bnodes:
        groups.setdefault(color[b], []).append(b)
    tied = sorted((c, sorted(bs)) for c, bs in groups.items()
                  if len(bs) > 1)
    if not tied or _budget[0] <= 0:
        if tied:
            _exhausted[0] = True  # ties remain but budget is spent
        by_color = sorted(color.items(), key=lambda kv: (kv[1], kv[0]))
        label = {b: f"_:c{i}" for i, (b, _) in enumerate(by_color)}
        return sorted(
            "\x1f".join(label.get(t, str(t)) for t in (s, p, o))
            for s, p, o in triples)
    c, bs = tied[0]
    best = None
    for b in bs:
        if _budget[0] <= 0:
            _exhausted[0] = True
            break
        _budget[0] -= 1
        c2 = dict(color)
        c2[b] = _h.md5(("ind\x1e" + c2[b]).encode()).hexdigest()
        c2 = _refine(triples, bnodes, c2)
        rows = _canonical_rows(triples, bnodes, c2, prefix, _budget,
                               _exhausted)
        if best is None or rows < best:
            best = rows
    return best


def kg_isocanonical_fingerprint(
        triples, cols=("subject", "predicate", "object"),
        bnode_prefix: str = _BNODE_PREFIX, num_coarse=None,
        object_kind_col: str | None = None) -> pd.DataFrame:
    """One-row ``(n_triples, fingerprint)`` like :func:`kg_fingerprint`,
    but INVARIANT under blank-node relabeling: re-reading the same
    document under a different skolem ``bnode_scope`` yields the same
    fingerprint.

    Scale shape: ground triples (no bnode) digest directly per block —
    the common case costs exactly what :func:`kg_fingerprint` costs.
    Bnode-containing triples exchange ONCE keyed by their skolem scope
    (the reader mints bnode IRIs per-document, so a scope's subgraph is
    document-sized); each scope group canonicalizes locally via color
    refinement + individualization into ONE canonical group digest.
    Distinct isomorphic components must not cancel, so group digests fold
    via a SECOND small exchange as ``md5(group_digest, multiplicity)`` —
    one row per document, not per triple. Cross-scope bnode links cannot
    exist by construction (per-document minting); a bnode triple's group
    key is its subject's scope, falling back to the object's.

    ``object_kind_col`` (if given, e.g. ``"object_kind"``) restricts
    object-side bnode detection to rows whose kind is ``"iri"`` — a
    LITERAL whose text happens to start with the skolem prefix is then
    treated as ground instead of being mis-routed into a scope group.
    The output's ``tiebreak_exhausted`` column counts scope groups whose
    individualization budget ran out with ties unresolved: for those
    groups the fingerprint is deterministic but relabel-invariance is
    unproven (very-high-automorphism subgraphs).
    """
    import hashlib as _h

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    s_col, p_col, o_col = cols

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        s = df[s_col].astype(str)
        o = df[o_col].astype(str)
        sb = s.str.startswith(bnode_prefix)
        ob = o.str.startswith(bnode_prefix)
        if object_kind_col is not None and object_kind_col in df.columns:
            ob = ob & (df[object_kind_col].astype(str) == "iri")
        has_b = (sb | ob).to_numpy()
        ground = df.loc[~has_b]
        gd = _digests(ground, list(cols)) if len(ground) else \
            pd.DataFrame({"d": pd.Series(dtype=object)})
        gd = gd.drop_duplicates()
        # ground rows co-locate by digest; bnode rows by scope (8-hex
        # scopes cannot collide with 32-hex digest keys)
        gd["k"] = [d.hex() for d in gd["d"]]
        gd["s"] = None
        gd["p"] = None
        gd["o"] = None
        bt = df.loc[has_b]
        if len(bt):
            o_b = o[has_b]
            if object_kind_col is not None and object_kind_col in df.columns:
                # a LITERAL in a bnode row whose text starts with the
                # skolem prefix must not be relabeled by the
                # canonicalizer — escape it out of the prefix space
                kind_b = df.loc[has_b, object_kind_col].astype(str)
                lit_like = o_b.str.startswith(bnode_prefix) \
                    & (kind_b != "iri")
                if lit_like.any():
                    o_b = o_b.where(~lit_like, "\x00lit\x1f" + o_b)
            scope = [
                _bnode_scope(sv, bnode_prefix)
                if sv.startswith(bnode_prefix)
                else _bnode_scope(ov, bnode_prefix)
                for sv, ov in zip(s[has_b], o_b)]
            bd = pd.DataFrame({
                "d": None,
                "k": pd.Series(["b:" + x for x in scope], dtype="object"),
                "s": s[has_b].to_numpy(),
                "p": bt[p_col].astype(str).to_numpy(),
                "o": o_b.to_numpy(),
            })
            gd = pd.concat([gd, bd], ignore_index=True)
        return gd

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        """Partial rows: kind 'g' = XOR partial over deduped ground
        digests; kind 'b' = one canonical digest per bnode scope group."""
        rows = []
        # block conversions may surface the bnode rows' None digest as
        # NaN — select by type, not identity
        ground = [d for d in g["d"] if isinstance(d, bytes)]
        if ground:
            d = pd.Series(ground).drop_duplicates()
            u = np.frombuffer(b"".join(d), dtype="<u8")[::2]
            rows.append({"kind": "g", "x": f"{_xor_fold(u):016x}",
                         "n": len(d), "ex": 0})
        bmask = g["d"].isna()
        if bmask.any():
            for scope, grp in g[bmask].groupby("scope_k", sort=False):
                trs = sorted(set(zip(grp["s"], grp["p"], grp["o"])))
                exhausted = [False]
                digs = _canonical_digests(trs, bnode_prefix,
                                          _exhausted=exhausted)
                gd = _h.md5(b"".join(sorted(digs))).hexdigest()
                rows.append({"kind": "b", "x": gd, "n": len(trs),
                             "ex": int(exhausted[0])})
        out = pd.DataFrame(rows, columns=["kind", "x", "n", "ex"])
        return out.astype({"kind": "object", "x": "object", "n": "int64",
                           "ex": "int64"})

    def combine_keyed(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"k": "scope_k"})
        return combine(g)

    parts = coarse_group_reduce(
        triples.map_batches(keyed, batch_format="pandas"),
        ["k"], combine_keyed,
        num_coarse=num_coarse).materialize()

    fp, n, n_ex = 0, 0, 0
    for r in parts.filter(expr="kind == 'g'").take_all():
        fp ^= int(r["x"], 16)
        n += int(r["n"])

    groups = parts.filter(expr="kind == 'b'")
    if groups.count():
        def fold_groups(g: pd.DataFrame) -> pd.DataFrame:
            out_x, out_n, out_ex = 0, 0, 0
            for gd, grp in g.groupby("x", sort=False):
                m = len(grp)  # multiplicity of this isomorphism class
                h = _h.md5(f"{gd}\x1e{m}".encode()).digest()
                out_x ^= int.from_bytes(h[:8], "little")
                out_n += int(grp["n"].sum())
                out_ex += int(grp["ex"].sum())
            return pd.DataFrame({"x": [f"{out_x:016x}"], "n": [out_n],
                                 "ex": [out_ex]})

        gparts = coarse_group_reduce(
            groups.select_columns(["x", "n", "ex"]), ["x"], fold_groups,
        ).to_pandas()
        for x in gparts["x"]:
            fp ^= int(x, 16)
        n += int(gparts["n"].sum())
        n_ex = int(gparts["ex"].sum())

    return pd.DataFrame([{
        "n_triples": int(n),
        "fingerprint": f"{fp:016x}",
        "tiebreak_exhausted": n_ex,
    }])
