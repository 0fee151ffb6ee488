"""Rule-based KG inference: CONSTRUCT and semi-naive forward chaining.

The construction pipeline materializes extracted triples; this module is
the enrichment layer on top — SPARQL-CONSTRUCT-style derivation (match a
BGP, emit templated triples) and Datalog-style forward chaining to a
fixpoint (transitive closure of ``locatedIn``-like predicates, type
inheritance through ``subClassOf`` chains, ...).

Scale shape
-----------
- ``construct`` is :func:`~cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query.bgp_query`
  (distributed hash joins over binding tables) plus ONE vectorized
  ``map_batches`` expansion — no extra exchange.
- ``forward_chain`` is **semi-naive**: after the first round, each rule
  body is re-evaluated once per body pattern with that pattern bound to
  the round's DELTA (everything derived last round) and the others to
  the full graph — so round *k* joins are sized by the delta, not the
  accumulated closure.  New-fact detection is the generation machinery's
  set difference (hash co-partitioned anti-join on full identity,
  ``kg_incremental.kg_new_triples``-shaped), and the closure is
  re-materialized once per round.  Rounds are bounded by rule-graph
  depth (ontology hierarchies are shallow); per-round cost is
  rules × body-size BGP evaluations over delta-sized inputs.

Binding values are lexical strings; template objects default to
``object_kind="iri"`` — declare ``{"object_kind": "literal", ...}`` per
template when deriving literals (the honest limitation of string-typed
binding tables, documented rather than guessed).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["Rule", "construct", "forward_chain"]

_TRIPLE_COLS = ("subject", "predicate", "object",
                "object_kind", "object_lang", "object_datatype")

_TRIPLES_SCHEMA = pa.schema([(c, pa.string()) for c in _TRIPLE_COLS])


class Rule:
    """``body`` (BGP patterns) ⇒ ``head`` (template triples).

    Each head template is ``(s, p, o)`` of variables/constants plus an
    optional 4th dict entry for object typing:
    ``("?e", "locatedIn", "?c")`` or
    ``("?e", "label", "?name", {"object_kind": "literal",
    "object_lang": "en"})``.
    """

    def __init__(self, body: list[Sequence[str]],
                 head: list[Sequence], name: str = ""):
        if not body or not head:
            raise ValueError("Rule needs non-empty body and head")
        self.body = [tuple(p) for p in body]
        self.head = [tuple(t) for t in head]
        self.name = name
        body_vars = {v for p in self.body for v in p
                     if isinstance(v, str) and v.startswith("?")}
        for tmpl in self.head:
            for term in tmpl[:3]:
                if isinstance(term, str) and term.startswith("?") \
                        and term not in body_vars:
                    raise ValueError(
                        f"head variable {term} not bound by the body")
        self.body_vars = sorted(body_vars)


def _expand_templates(head: list[Sequence]):
    """Vectorized binding-table → triples expansion for one rule head."""
    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        parts = []
        for tmpl in head:
            s, p, o = tmpl[:3]
            meta = tmpl[3] if len(tmpl) > 3 else {}
            cols = {}
            for name, term in (("subject", s), ("predicate", p),
                               ("object", o)):
                if isinstance(term, str) and term.startswith("?"):
                    cols[name] = t[term[1:]].cast(pa.string())
                else:
                    cols[name] = pa.array([term] * n, pa.string())
            cols["object_kind"] = pa.array(
                [meta.get("object_kind", "iri")] * n, pa.string())
            cols["object_lang"] = pa.array(
                [meta.get("object_lang")] * n, pa.string())
            cols["object_datatype"] = pa.array(
                [meta.get("object_datatype")] * n, pa.string())
            parts.append(pa.table(cols, schema=_TRIPLES_SCHEMA))
        return pa.concat_tables(parts) if parts \
            else _TRIPLES_SCHEMA.empty_table()

    return expand


def construct(triples, patterns, head: list[Sequence], **bgp_kwargs):
    """SPARQL-CONSTRUCT: evaluate the BGP, emit one set of ``head``
    template triples per solution (deduped).  Returns a Dataset in the
    pipeline triple schema, composable with the sinks / generations."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import bgp_query

    rule = Rule(patterns, head)  # validates head vars against body
    sols = bgp_query(triples, patterns, project=rule.body_vars,
                     distinct=True, **bgp_kwargs)
    derived = sols.map_batches(_expand_templates(rule.head),
                               batch_format="pyarrow")
    return _dedup_triples(derived)


def _dedup_triples(ds, num_partitions: int | None = None):
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    cols = list(_TRIPLE_COLS)
    return coarse_group_reduce(
        ds, cols, lambda g: g.drop_duplicates(subset=cols),
        num_coarse=num_partitions)


def _new_vs_known(candidates, known, num_partitions: int):
    """Set difference ``candidates - known`` on full triple identity
    (hash co-partition, one exchange — kg_incremental shape)."""
    cols = list(_TRIPLE_COLS)

    def tag(side: int):
        def pre(t: pa.Table) -> pd.DataFrame:
            df = t.select(cols).to_pandas().drop_duplicates(subset=cols)
            df["side"] = np.int64(side)
            h = pd.util.hash_pandas_object(df[cols], index=False) \
                .to_numpy(np.uint64)
            df["part"] = (h % np.uint64(num_partitions)).astype("int64")
            return df

        return pre

    both = known.map_batches(tag(0), batch_format="pyarrow").union(
        candidates.map_batches(tag(1), batch_format="pyarrow"))

    def keep_new(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=cols + ["side"])
        grp = g.groupby(cols, dropna=False, sort=False)["side"]
        new_only = grp.transform("min") == 1
        keep = g[new_only & (g["side"] == 1)]
        if keep.empty:
            return _TRIPLES_SCHEMA.empty_table()
        return pa.Table.from_pandas(keep[cols], schema=_TRIPLES_SCHEMA,
                                    preserve_index=False)

    return (both.groupby("part")
            .map_groups(keep_new, batch_format="pandas"))


def forward_chain(triples, rules: list[Rule], max_rounds: int = 12,
                  num_partitions: int | None = None) -> dict:
    """Apply ``rules`` to a fixpoint (or ``max_rounds``).  Returns
    ``{"closure": Dataset, "derived": Dataset, "rounds": int,
    "n_derived": int}`` — ``closure`` is base ∪ derived, materialized.

    Round 1 evaluates each body against the base graph; later rounds are
    semi-naive (one evaluation per body pattern with that pattern bound
    to the previous round's delta), so convergence work tracks the delta
    size.  Facts already known never re-enter the delta, guaranteeing
    termination on finite domains."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_coarse_partitions,
    )
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import bgp_query

    if hasattr(triples, "scan_for_predicate"):
        triples = triples.scan_for_predicate(None)

    def norm(ds):
        def pick(t: pa.Table) -> pa.Table:
            cols = {}
            for c in _TRIPLE_COLS:
                cols[c] = (t[c].cast(pa.string()) if c in t.column_names
                           else pa.nulls(len(t), pa.string()))
            return pa.table(cols, schema=_TRIPLES_SCHEMA)

        return ds.map_batches(pick, batch_format="pyarrow")

    full = norm(triples).materialize()
    n_full = full.count()
    if num_partitions is None:
        num_partitions = default_coarse_partitions(max(n_full, 1))

    delta = full
    derived_parts = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        first_round = rounds == 1
        cand_parts = []
        for rule in rules:
            if first_round:
                evals = [None]  # body over the base graph once
            else:
                evals = range(len(rule.body))  # semi-naive: delta at i
            for i in evals:
                sources = (None if i is None else
                           [delta if j == i else None
                            for j in range(len(rule.body))])
                sols = bgp_query(full, rule.body,
                                 project=rule.body_vars, distinct=True,
                                 pattern_sources=sources)
                cand_parts.append(
                    sols.map_batches(_expand_templates(rule.head),
                                     batch_format="pyarrow"))
        cand = cand_parts[0]
        for extra in cand_parts[1:]:
            cand = cand.union(extra)
        new = _new_vs_known(cand, full, num_partitions).materialize()
        n_new = new.count()
        if n_new == 0:
            rounds -= 1  # this round added nothing
            break
        derived_parts.append(new)
        delta = new
        full = full.union(new).materialize()

    if derived_parts:
        derived = derived_parts[0]
        for extra in derived_parts[1:]:
            derived = derived.union(extra)
        derived = derived.materialize()
        n_derived = derived.count()
    else:
        import ray.data

        derived = ray.data.from_arrow(_TRIPLES_SCHEMA.empty_table())
        n_derived = 0
    return {"closure": full, "derived": derived,
            "rounds": rounds, "n_derived": n_derived}
