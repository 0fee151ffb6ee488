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

__all__ = ["TRIPLES_SCHEMA", "ttl_dataset", "jsonld_dataset",
           "parse_ttl_table", "kg_diff"]

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
    """Parse one Turtle document into an Arrow table in TRIPLES_SCHEMA.
    ``src_file`` doubles as the blank-node skolem scope so distinct
    shards' ``_:b0`` never conflate in the merged Dataset."""
    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

    triples, _prefixes = parse_turtle(text, bnode_scope=src_file)
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
        path, include_paths=True, file_extensions=["ttl", "ttl.gz"]
    )

    def expand(batch: pa.Table) -> pa.Table:
        import gzip

        tables = []
        for path_val, data in zip(batch["path"].to_pylist(),
                                  batch["bytes"].to_pylist()):
            # ray's read_binary_files already inflates .gz by extension;
            # sniff the magic so hand-fed compressed bytes still work
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
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


def _est_ttl_rows(p: str) -> int:
    """Metadata-only triple-count estimate for partition sizing (bytes on
    disk ≈ 60-80 B per serialized triple; a .count() would parse every
    shard a second time just to pick a partition count).  Recurses so
    generation roots (``gen-NNNNN`` subdirs) estimate like flat dirs;
    gzip shards are ~8-10x smaller on disk, so their bytes count ~9x
    more rows per byte than plain .ttl."""
    import os

    if os.path.isdir(p):
        total = 0
        for e in os.scandir(p):
            if e.is_dir():
                total += _est_ttl_rows(e.path)
            elif e.name.endswith(".ttl.gz"):
                total += e.stat().st_size * 9 // 70
            elif e.name.endswith(".ttl"):
                total += e.stat().st_size // 70
        return total
    if not os.path.exists(p):
        return 0
    mult = 9 if p.endswith(".gz") else 1
    return os.path.getsize(p) * mult // 70


def kg_diff(old_path: str, new_path: str, num_partitions: int | None = None):
    """Set difference of two knowledge graphs (TTL shard dirs or files):
    rows in TRIPLES_SCHEMA minus ``src_file``, plus a ``change`` column —
    ``"added"`` (in new, not old) or ``"removed"`` (in old, not new).

    The operational companion to the round trip: diff a fresh extraction
    run against the currently-published graph before uploading. Scale
    shape: each side pre-dedups in-block, rows co-locate on
    ``hash(identity) % P`` (ONE all-to-all over pre-deduped rows), and the
    per-partition combine is a vectorized indicator merge — identical
    triples never leave their partition, and unchanged triples (the
    overwhelming majority) are dropped inside the combine, so only the
    actual diff flows downstream.
    """
    import numpy as np
    import pandas as pd

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_coarse_partitions,
    )
    from cmc_knowledge_graph_text2ttl_ray.stages.dedup_triples import (
        IDENTITY_COLS,
        add_identity_hash,
    )

    old = ttl_dataset(old_path)
    new = ttl_dataset(new_path)
    if num_partitions is None:
        est_rows = _est_ttl_rows(old_path) + _est_ttl_rows(new_path)
        num_partitions = default_coarse_partitions(max(est_rows, 1))

    def tag(side: int):
        def pre(batch: pa.Table) -> pd.DataFrame:
            df = add_identity_hash(batch, keep_cols=IDENTITY_COLS)
            df["side"] = np.int64(side)
            df["part"] = (df["h"] % num_partitions).astype("int64")
            return df

        return pre

    both = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))

    diff_schema = pa.schema([(c, pa.string()) for c in IDENTITY_COLS]
                            + [("change", pa.string())])

    def diff_group(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=IDENTITY_COLS + ["side"])
        # membership by FULL identity, not the 64-bit hash — at billions
        # of triples birthday collisions would silently cancel an added
        # triple against an unrelated removed one (round-3 review);
        # dropna=False keeps None-lang/datatype literals grouped
        grp = g.groupby(IDENTITY_COLS, dropna=False, sort=False)["side"]
        both_sides = grp.transform("min") != grp.transform("max")
        keep = g[~both_sides]
        if keep.empty:
            # typed empty Arrow block — pandas object-dtype empties trip
            # Ray's block size estimator into per-column log noise
            return diff_schema.empty_table()
        out = keep[IDENTITY_COLS].copy()
        out["change"] = np.where(keep["side"].to_numpy() == 1,
                                 "added", "removed")
        return pa.Table.from_pandas(out, schema=diff_schema,
                                    preserve_index=False)

    return (both.groupby("part")
            .map_groups(diff_group, batch_format="pandas"))


def jsonld_dataset(path: str):
    """Read ``.jsonld`` shards (the :func:`write_jsonld_partitions`
    layout, or any expanded/flat JSON-LD files) as a triples Dataset —
    one read task per file, same fail-fast contract as
    :func:`ttl_dataset`."""
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.functions.jsonld import (
        parse_jsonld,
    )

    ds = ray.data.read_binary_files(
        path, include_paths=True, file_extensions=["jsonld"])

    def expand(batch: pa.Table) -> pa.Table:
        tables = []
        for data in batch["bytes"].to_pylist():
            rows = parse_jsonld(data.decode("utf-8"))
            tables.append(pa.table({
                "subject": pa.array([r[0] for r in rows], pa.string()),
                "predicate": pa.array([r[1] for r in rows], pa.string()),
                "object": pa.array([r[2] for r in rows], pa.string()),
                "object_kind": pa.array([r[3] for r in rows],
                                        pa.string()),
                "object_lang": pa.array([r[4] for r in rows],
                                        pa.string()),
                "object_datatype": pa.array([r[5] for r in rows],
                                            pa.string()),
            }))
        if not tables:
            return TRIPLES_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return ds.map_batches(expand, batch_format="pyarrow")
