"""Document-granular (named-graph-level) updates over a QUAD KG root.

The dominant update pattern of a crawl-fed KG is not triple-level
surgery — it is *document replace*: a page is re-crawled (or taken
down) and every triple previously extracted from it must be swapped for
the new extraction.  With one named graph per source document
(``records_to_quads``) that is exactly a GRAPH-level operation, and it
admits a far stronger scale shape than triple-level tombstones:

- each ``gen-NNNNN`` stores its added quads as bucketed **N-Quads**
  shards (``write_quad_partitions`` — manifest resume, deterministic
  bytes) plus an optional ``_graph_removals.json`` listing the graph
  IRIs it retracts;
- the retraction list is GRAPH-granular — thousands of IRIs per
  re-crawl wave, not millions of triple identities — so the read-side
  resolve needs **no exchange at all**: the (graph → last-tombstone
  generation) map broadcasts via ``ray.put`` and every add block
  filters itself vectorized (a quad survives iff its generation is
  LATER than its graph's last tombstone; a generation that both
  retracts and re-adds a graph keeps its own adds — replace
  semantics);
- ``replace_graphs`` publishes a retraction + the new quads as ONE
  generation, the incremental-crawl primitive.

Triple-level updates (SPARQL 1.1 Update, ``pipelines/kg_update.py``)
remain the tool for fine-grained edits on TRIPLE roots; this module is
the quad-root counterpart at the granularity real pipelines update at.
The broadcast-map assumption (tombstoned-graph count fits a node)
matches the repo's small-side conventions; a wave retracting more
graphs than fit in memory would shard the map by ``hash(graph)`` —
the add-side filter is already keyed by graph.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa

__all__ = ["publish_quads", "replace_graphs", "quad_read",
           "list_generations"]

GRAPH_REMOVALS = "_graph_removals.json"

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_incremental import (  # noqa: E402
    list_generations,
)


def _next_gen_name(kg_root: str) -> str:
    gens = list_generations(kg_root)
    nxt = (int(gens[-1].split("-")[1]) + 1) if gens else 0
    return f"gen-{nxt:05d}"


def publish_quads(kg_root: str, quads_ds=None,
                  retract_graphs: list[str] | None = None,
                  prefixes: dict[str, str] | None = None,
                  num_buckets: int = 64,
                  compression: str | None = None) -> dict:
    """Publish the next generation: optional quad adds (N-Quads shards)
    + optional GRAPH retraction list."""
    from cmc_knowledge_graph_text2ttl_ray.stages.sinks import (
        write_quad_partitions,
    )

    os.makedirs(kg_root, exist_ok=True)
    gen = _next_gen_name(kg_root)
    gen_dir = os.path.join(kg_root, gen)
    os.makedirs(gen_dir, exist_ok=True)
    manifest = None
    if quads_ds is not None:
        manifest = write_quad_partitions(
            quads_ds, gen_dir, fmt="nquads", prefixes=prefixes,
            num_buckets=num_buckets, compression=compression)
    if retract_graphs:
        with open(os.path.join(gen_dir, GRAPH_REMOVALS), "w") as fh:
            json.dump({"graphs": sorted(set(retract_graphs))}, fh,
                      indent=1)
    return {"generation": gen, "path": gen_dir, "manifest": manifest}


def replace_graphs(kg_root: str, new_quads, graphs: list[str] | None = None,
                   **kw) -> dict:
    """The document-replace primitive: retract ``graphs`` (default: the
    distinct graphs present in ``new_quads`` — computed distributed)
    and publish the new quads, as ONE generation."""
    if graphs is None:
        import pyarrow.compute as pc

        new_quads = new_quads.materialize()

        def uniq(t: pa.Table) -> pa.Table:
            return pa.table({"graph": pc.unique(t["graph"])})

        gset = set()
        for b in (new_quads.map_batches(uniq, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            gset.update(b["graph"].to_pylist())
        graphs = sorted(gset)
    return publish_quads(kg_root, new_quads, retract_graphs=graphs, **kw)


def quad_read(kg_root: str, generation=None):
    """Resolved quad Dataset as of ``generation`` (inclusive).

    Zero-exchange resolve: the (graph → last tombstone generation) map
    is driver-assembled from the (small) ``_graph_removals.json``
    sidecars, broadcast once, and applied as a vectorized per-block
    filter over the union of generation N-Quads reads.  A root with no
    retractions is the pure union — zero added cost, same guarantee as
    the triple LSM's fast path."""
    import ray
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.sources.nquads_src import (
        QUADS_SCHEMA,
        nquads_dataset,
    )

    gens = list_generations(kg_root)
    if generation is not None:
        if isinstance(generation, int):
            generation = f"gen-{generation:05d}"
        if generation not in gens:
            raise ValueError(
                f"unknown generation {generation!r}; root has {gens}")
        gens = [g for g in gens if g <= generation]
    if not gens:
        return ray.data.from_arrow(QUADS_SCHEMA.empty_table())

    tomb: dict[str, int] = {}
    add_dirs: list[tuple[int, str]] = []
    for i, g in enumerate(gens):
        d = os.path.join(kg_root, g)
        side = os.path.join(d, GRAPH_REMOVALS)
        if os.path.isfile(side):
            with open(side) as fh:
                for graph in json.load(fh)["graphs"]:
                    tomb[graph] = i
        if any(f.endswith((".nq", ".nq.gz"))
               for _r, _dd, fs in os.walk(d) for f in fs):
            add_dirs.append((i, d))

    out = None
    if not tomb:
        for _i, d in add_dirs:
            ds = nquads_dataset(d)
            out = ds if out is None else out.union(ds)
        return out if out is not None else ray.data.from_arrow(
            QUADS_SCHEMA.empty_table())

    tomb_ref = ray.put(tomb)

    def keep(gen_idx: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            t = ray.get(tomb_ref)
            # vectorized: map each row's graph to its last tombstone
            # generation (-1 = never retracted); survive iff this add's
            # generation is >= it (same-generation replace keeps adds)
            last = df["graph"].map(t).fillna(-1).astype("int64")
            return df[last <= gen_idx]

        return fn

    for i, d in add_dirs:
        ds = nquads_dataset(d).map_batches(keep(i), batch_format="pandas")
        out = ds if out is None else out.union(ds)
    return out if out is not None else ray.data.from_arrow(
        QUADS_SCHEMA.empty_table())
