"""N-Quads source: read ``.nq`` shards back into a quad Dataset.

Inverse of ``stages/sinks.write_quad_partitions(fmt="nquads")`` — loads a
named-graph KG (this engine's output or any external N-Quads export) as a
``ray.data.Dataset`` with the pipeline's quad schema, ready for 4-term
BGP queries / SPARQL ``GRAPH`` clauses / re-canonicalization.

Scale shape: one ``.nq`` file per read task, same as the TTL source.
N-Quads is line-oriented, so unlike Turtle a single huge file COULD be
split by byte ranges; the sink's bucketed layout already gives uniform
per-file tasks, so per-file parsing keeps the code shared with the
deterministic serializer's round-trip tests.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["QUADS_SCHEMA", "nquads_dataset", "parse_nquads_table"]

QUADS_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("object_kind", pa.string()),
        ("object_lang", pa.string()),
        ("object_datatype", pa.string()),
        ("graph", pa.string()),
    ]
)


def parse_nquads_table(text: str) -> pa.Table:
    """Parse one N-Quads document into an Arrow table in QUADS_SCHEMA."""
    from cmc_knowledge_graph_text2ttl_ray.functions.nquads import parse_nquads

    cols = {name: [] for name in QUADS_SCHEMA.names}
    for s, p, o, kind, lang, dtype, graph in parse_nquads(text):
        cols["subject"].append(s)
        cols["predicate"].append(p)
        cols["object"].append(o)
        cols["object_kind"].append(kind)
        cols["object_lang"].append(lang)
        cols["object_datatype"].append(dtype)
        cols["graph"].append(graph)
    return pa.Table.from_pydict(cols, schema=QUADS_SCHEMA)


def nquads_dataset(path: str):
    """Read a ``.nq``/``.nq.gz`` file or a directory of shards as a quad
    Dataset (one file per read task; parse errors fail the task — a
    corrupt shard should stop the run, matching the sink's manifest
    contract)."""
    import ray.data

    ds = ray.data.read_binary_files(
        path, include_paths=True, file_extensions=["nq", "nq.gz"]
    )

    def expand(batch: pa.Table) -> pa.Table:
        import gzip

        tables = []
        for data in batch["bytes"].to_pylist():
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
            tables.append(parse_nquads_table(data.decode("utf-8")))
        if not tables:
            return QUADS_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return ds.map_batches(expand, batch_format="pyarrow")
