"""Training-shard export sink: deterministic, resumable JSONL shards.

The last mile of a training-data pipeline — the cleaned/packed corpus has
to land as shard files a data loader streams. Mirrors the TTL sink's
scale contract (``stages/sinks.py``; north rule: per-partition
checkpoints + lineage):

- rows are bucketed by ``hash(key) % num_shards`` — shard membership is a
  pure function of the row, so reruns and different cluster sizes produce
  byte-identical shards;
- each shard writes independently through ``pyarrow.fs`` (local or
  s3://-style URIs — never worker-local ``open()``) with a write-then-move
  commit, and ``manifest.json`` records finished shards so a failed run
  resumes by skipping them;
- within a shard, rows sort by the key before serialization —
  deterministic bytes regardless of partitioning or execution order.

Format: gzip'd JSON-lines (``.jsonl.gz``, the de-facto interchange for
text corpora) or plain ``.jsonl``.
"""

from __future__ import annotations

import gzip
import json

import pandas as pd
import pyarrow as pa

from cmc_knowledge_graph_text2ttl_ray.functions import fsio

__all__ = ["write_training_shards", "read_shard_manifest"]


def read_shard_manifest(out_dir: str, filesystem=None) -> dict:
    fs, base = fsio.resolve_fs(out_dir, filesystem)
    path = fsio.fs_join(base, "manifest.json")
    if fsio.exists(fs, path):
        return json.loads(fsio.read_text(fs, path))
    return {"shards": {}}


def write_training_shards(
    ds,
    out_dir: str,
    *,
    key_col: str = "doc_id",
    num_shards: int = 64,
    columns: list[str] | None = None,
    compress: bool = True,
    resume: bool = True,
    filesystem=None,
) -> dict:
    """Write ``ds`` as ``num_shards`` deterministic JSONL shards; returns
    the manifest (shard → rows/bytes/path). One all-to-all exchange
    (the shard groupby) and one write task per shard."""
    fs, base = fsio.resolve_fs(out_dir, filesystem)
    fsio.makedirs(fs, base)
    manifest = (read_shard_manifest(out_dir, filesystem)
                if resume else {"shards": {}})
    # Resume is only valid for the exact sharding parameters: a changed
    # num_shards/columns/compress re-maps rows to different shards, so
    # trusting old manifest entries would keep stale, misplaced rows
    # (round-3 review). On mismatch, clear the old shard FILES too —
    # they are no longer part of any consistent layout.
    params = {"key_col": key_col, "num_shards": num_shards,
              "columns": sorted(columns) if columns else None,
              "compress": bool(compress)}
    if manifest["shards"] and manifest.get("params") != params:
        for v in manifest["shards"].values():
            try:
                fs.delete_file(v["path"])
            except OSError:
                pass
        manifest = {"shards": {}}
    manifest["params"] = params
    done = set(manifest["shards"]) if resume else set()
    ext = "jsonl.gz" if compress else "jsonl"

    def pre(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        if columns is not None:
            df = df[list(dict.fromkeys([key_col, *columns]))]
        h = pd.util.hash_pandas_object(df[key_col], index=False) \
            .to_numpy("uint64")
        df["_shard"] = (h % num_shards).astype("int64")
        return df

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        shard = int(group["_shard"].iloc[0])
        if str(shard) in done:
            return pd.DataFrame({"shard": [shard], "n_rows": [-1],
                                 "n_bytes": [-1], "path": ["<skipped>"]})
        group = group.sort_values(key_col, kind="stable") \
                     .drop(columns=["_shard"])
        lines = group.to_json(orient="records", lines=True,
                              force_ascii=False)
        if lines and not lines.endswith("\n"):
            lines += "\n"
        data = lines.encode("utf-8")
        if compress:
            # fixed mtime: gzip output must be byte-deterministic
            data = gzip.compress(data, mtime=0)
        path = fsio.fs_join(base, f"shard-{shard:05d}.{ext}")
        fsio.replace_bytes(fs, path, data)
        return pd.DataFrame({"shard": [shard], "n_rows": [len(group)],
                             "n_bytes": [len(data)], "path": [path]})

    written = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
    )
    for r in written.itertuples():
        if r.path != "<skipped>":
            manifest["shards"][str(int(r.shard))] = {
                "n_rows": int(r.n_rows),
                "n_bytes": int(r.n_bytes),
                "path": r.path,
            }
    fsio.replace_text(fs, fsio.fs_join(base, "manifest.json"),
                      json.dumps(manifest, indent=1, sort_keys=True))
    return manifest
