"""TTL source: read Turtle shards back into a triples Dataset.

The sink side (``stages/sinks.py``) writes the KG as bucketed ``.ttl``
shards; this module is the inverse — it completes the round trip so an
existing knowledge graph (this engine's own output, a reference export, a
curated ontology) can be loaded as a ``ray.data.Dataset`` and joined /
diffed / re-canonicalized against a new extraction run.

Schema matches the pipeline's triple rows exactly:
``(subject, predicate, object, object_kind, object_lang,
object_datatype[, src_file])``.

Scale shape: one ``.ttl`` file is one read task
(``read_binary_files(include_paths=True)`` → a ``map_batches`` expansion
parsing each file with ``functions/turtle.parse_turtle``) — a directory of
shards parallelizes file-per-task, the same layout the sink produced them
in. Parsing is per-file Python (Turtle is a sequential text format), but
each file is bounded by the sink's bucket size, so tasks stay uniform.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["TRIPLES_SCHEMA", "ttl_dataset", "parse_ttl_table"]

TRIPLES_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("object_kind", pa.string()),
        ("object_lang", pa.string()),
        ("object_datatype", pa.string()),
        ("src_file", pa.string()),
    ]
)


def parse_ttl_table(text: str, src_file: str = "") -> pa.Table:
    """Parse one Turtle document into an Arrow table in TRIPLES_SCHEMA."""
    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

    triples, _prefixes = parse_turtle(text)
    cols = {name: [] for name in
            ("subject", "predicate", "object", "object_kind",
             "object_lang", "object_datatype")}
    for s, p, o, kind, lang, dtype in triples:
        cols["subject"].append(s)
        cols["predicate"].append(p)
        cols["object"].append(o)
        cols["object_kind"].append(kind)
        cols["object_lang"].append(lang)
        cols["object_datatype"].append(dtype)
    cols["src_file"] = [src_file] * len(cols["subject"])
    return pa.Table.from_pydict(cols, schema=TRIPLES_SCHEMA)


def ttl_dataset(path: str, include_src_file: bool = False):
    """Read a ``.ttl`` file or a directory of shards as a triples Dataset.

    Each file is one read task; parse errors surface as task errors (fail
    fast — a corrupt shard should stop the run, matching the sink's
    manifest contract).
    """
    import ray.data

    ds = ray.data.read_binary_files(
        path, include_paths=True, file_extensions=["ttl"]
    )

    def expand(batch: pa.Table) -> pa.Table:
        tables = []
        for path_val, data in zip(batch["path"].to_pylist(),
                                  batch["bytes"].to_pylist()):
            tables.append(parse_ttl_table(data.decode("utf-8"), path_val))
        if not tables:
            return TRIPLES_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    out = ds.map_batches(expand, batch_format="pyarrow")
    if not include_src_file:
        out = out.select_columns(
            ["subject", "predicate", "object", "object_kind",
             "object_lang", "object_datatype"])
    return out
