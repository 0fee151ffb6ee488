"""Cluster-shared scratch root (round-4 verdict #2): every spill/cache
site derives its path from GRAFT_SCRATCH_DIR and round-trips through the
pyarrow.fs layer, so a shared-filesystem or object-store root makes the
engine's scratch traffic multi-node-safe. Defaults stay /tmp."""

import os

import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.functions import checkpoint as ckpt


def test_defaults_unchanged(monkeypatch):
    monkeypatch.delenv("GRAFT_SCRATCH_DIR", raising=False)
    assert ckpt.scratch_root() == "/tmp"
    assert ckpt.default_cache_dir("fam", "k").startswith("/tmp/fam/")
    d = ckpt.scratch_dir("graft_test_")
    assert d.startswith("/tmp/graft_test_") and os.path.isdir(d)
    ckpt.scratch_cleanup(d)
    assert not os.path.exists(d)


def test_env_root_redirects_all_path_helpers(monkeypatch, tmp_path):
    monkeypatch.setenv("GRAFT_SCRATCH_DIR", str(tmp_path))
    assert ckpt.scratch_root() == str(tmp_path)
    assert ckpt.default_cache_dir("fam", "k").startswith(str(tmp_path))
    d = ckpt.scratch_dir("x_")
    assert d.startswith(str(tmp_path)) and os.path.isdir(d)


def test_checkpoint_markers_roundtrip_through_uri(tmp_path):
    """is_valid / reset / mark_done on a file:// URI — the same pyarrow.fs
    route an s3:// root would take."""
    uri = "file://" + str(tmp_path / "ck")
    assert not ckpt.is_valid(uri, "fp1")
    ckpt.reset(uri)
    ckpt.mark_done(uri, "fp1", extra=1)
    assert ckpt.is_valid(uri, "fp1")
    assert not ckpt.is_valid(uri, "other")
    ckpt.reset(uri)  # reset wipes the marker
    assert not ckpt.is_valid(uri, "fp1")


def test_spill_roundtrip_through_uri(ray_session, tmp_path):
    uri = "file://" + str(tmp_path / "spill")
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    back = ckpt.spill_roundtrip(ray.data.from_pandas(df), uri,
                                pa.schema([("a", pa.int64()),
                                           ("b", pa.string())]))
    got = back.to_pandas().sort_values("a", ignore_index=True)
    assert got.equals(df)
    # files really landed under the injected root
    assert any(f.endswith(".parquet")
               for f in os.listdir(tmp_path / "spill"))

    # empty dataset → empty-table fallback with the declared schema
    empty = ckpt.spill_roundtrip(
        ray.data.from_pandas(df).filter(lambda r: False),
        "file://" + str(tmp_path / "spill_empty"),
        pa.schema([("a", pa.int64()), ("b", pa.string())]))
    assert empty.count() == 0
    assert empty.schema().names == ["a", "b"]


def test_forward_chain_spills_under_injected_root(ray_session, monkeypatch,
                                                  tmp_path):
    """End-to-end: with GRAFT_SCRATCH_DIR set and no explicit spill_dir,
    the forward-chain spill path writes under the injected root and the
    result matches the pinned path."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_infer import (
        Rule,
        forward_chain,
    )

    chain = [("a", "locatedIn", "b"), ("b", "locatedIn", "c"),
             ("c", "locatedIn", "d")]
    trans = Rule([("?x", "locatedIn", "?y"), ("?y", "locatedIn", "?z")],
                 [("?x", "locatedIn", "?z")], name="trans")
    ds = ray.data.from_pandas(pd.DataFrame(
        chain, columns=["subject", "predicate", "object"]))

    monkeypatch.setenv("GRAFT_SCRATCH_DIR", str(tmp_path))
    spill = forward_chain(ds, [trans], spill_rows=0)
    assert spill["spill_dir"].startswith(str(tmp_path))
    assert any(p.startswith("graft_fchain_") for p in os.listdir(tmp_path))

    pin = forward_chain(ds, [trans])

    def spo(d):
        return {(r["subject"], r["predicate"], r["object"])
                for r in d.take_all()}

    assert spo(spill["closure"]) == spo(pin["closure"])
    assert spill["n_derived"] == pin["n_derived"]


def test_minhash_sig_cache_lands_under_injected_root(ray_session,
                                                     monkeypatch, tmp_path):
    """The MinHash signature spill checkpoint derives from the scratch
    root when no explicit dir is passed."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.dedup import (
        minhash_lsh_pairs,
    )

    monkeypatch.setenv("GRAFT_SCRATCH_DIR", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    # sig_spill_docs=0 forces the fingerprinted checkpoint path
    pairs = minhash_lsh_pairs(sf, sig_spill_docs=0)
    n = pairs.count()
    assert n >= 0
    cache = tmp_path / "graft_minhash_sigs"
    assert cache.is_dir() and any(cache.iterdir())
