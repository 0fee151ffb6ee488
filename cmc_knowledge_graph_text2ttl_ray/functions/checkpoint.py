"""Fingerprinted build-once checkpoint directories + engine scratch root.

Shared by every "build an expensive layout once, reuse until the input or
parameters change" site (IVF index, LSH index, MinHash signature spill):
the fingerprint covers the input files' identity (abspath + size +
mtime_ns) AND the build parameters, so a regenerated corpus at the same
path or a different parameterization can never silently reuse a stale
layout (the divergence the hand-rolled copies of this logic developed —
round-3 self-review).

Multi-node readiness (round-4 verdict #2): every spill/cache path in the
engine derives from ONE scratch root, ``GRAFT_SCRATCH_DIR`` (default
``/tmp``).  ``spill_roundtrip`` writes from Ray tasks and reads back from
arbitrary workers, so on a real cluster the root must be a shared
filesystem path or object-store URI (e.g. ``s3://bucket/scratch``); all
helpers here speak URIs through the same ``pyarrow.fs`` layer the sinks
use (``functions/fsio.py``), and Ray's parquet read/write already accepts
them.  Single-node defaults are unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

__all__ = ["input_fingerprint", "scratch_root", "scratch_dir",
           "scratch_cleanup", "default_cache_dir", "is_valid", "reset",
           "mark_done", "spill_roundtrip"]


def input_fingerprint(paths: list[str], params: dict | None = None) -> str:
    parts = []
    for p in paths:
        st = os.stat(p)
        parts.append(f"{os.path.abspath(p)}:{st.st_size}:{st.st_mtime_ns}")
    if params:
        parts.append(json.dumps(params, sort_keys=True, default=str))
    return "|".join(parts)


def scratch_root() -> str:
    """Engine-wide base for every spill/cache artifact.

    ``GRAFT_SCRATCH_DIR`` may be a local path (single-node default
    ``/tmp``), a shared-filesystem mount, or an object-store URI — any
    worker on any node must be able to read back what another wrote.
    """
    return os.environ.get("GRAFT_SCRATCH_DIR", "/tmp")


def _join(root: str, *parts: str) -> str:
    return "/".join([root.rstrip("/"), *parts])


def scratch_dir(prefix: str) -> str:
    """A fresh unique scratch directory under :func:`scratch_root` —
    the cluster-safe replacement for ``tempfile.mkdtemp`` at the
    forward-chain / SPARQL-update spill sites."""
    path = _join(scratch_root(), f"{prefix}{uuid.uuid4().hex}")
    if "://" not in path:
        os.makedirs(path, exist_ok=True)
    return path


def scratch_cleanup(path: str) -> None:
    """Best-effort removal of a :func:`scratch_dir` (local path or URI)."""
    fs, root = _fs(path)
    try:
        fs.delete_dir(root)
    except (OSError, FileNotFoundError):
        pass


def default_cache_dir(family: str, key: str) -> str:
    """Stable per-(family, key) directory under :func:`scratch_root`."""
    h = hashlib.md5(key.encode()).hexdigest()[:16]
    return _join(scratch_root(), family, h)


def _fs(path: str):
    from cmc_knowledge_graph_text2ttl_ray.functions.fsio import resolve_fs

    return resolve_fs(path)


def is_valid(ckpt_dir: str, fingerprint: str) -> bool:
    from cmc_knowledge_graph_text2ttl_ray.functions import fsio

    fs, root = _fs(ckpt_dir)
    done = fsio.fs_join(root, "_DONE")
    try:
        if not fsio.exists(fs, done):
            return False
        return json.loads(fsio.read_text(fs, done)).get("fp") == fingerprint
    except (OSError, json.JSONDecodeError):
        return False


def reset(ckpt_dir: str) -> None:
    from cmc_knowledge_graph_text2ttl_ray.functions import fsio

    fs, root = _fs(ckpt_dir)
    try:
        fs.delete_dir(root)
    except FileNotFoundError:
        pass
    fsio.makedirs(fs, root)


def mark_done(ckpt_dir: str, fingerprint: str, **extra) -> None:
    from cmc_knowledge_graph_text2ttl_ray.functions import fsio

    fs, root = _fs(ckpt_dir)
    fsio.write_text(fs, fsio.fs_join(root, "_DONE"),
                    json.dumps({"fp": fingerprint, **extra}))


def spill_roundtrip(ds, out_dir: str, schema):
    """Execute ``ds`` ONCE into ``out_dir`` parquet and hand back a
    streaming read — the multi-consumer reuse mechanism that does NOT
    pin the rows in the object store (the treatment the dedup family
    gives signatures/candidate pairs past their spill thresholds, and
    the SPARQL Update / forward-chain paths give the resolved KG and
    per-round closure deltas).  An empty dataset writes no files; fall
    back to an empty table so the read side never globs a fileless
    directory.  ``schema`` is the pyarrow schema of the empty fallback.
    ``out_dir`` may be a URI — writes and the existence probe both go
    through pyarrow.fs, so the round-trip works when the scratch root is
    a shared filesystem on a multi-node cluster."""
    import ray.data

    from pyarrow import fs as pafs

    ds.write_parquet(out_dir)
    fs, root = _fs(out_dir)
    infos = fs.get_file_info(pafs.FileSelector(root, allow_not_found=True))
    if any(i.base_name.endswith(".parquet") for i in infos):
        return ray.data.read_parquet(out_dir, file_extensions=["parquet"])
    return ray.data.from_arrow(schema.empty_table())
