"""KG content fingerprints: set semantics, layout invariance, rollforward."""

import hashlib

import pandas as pd

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
    kg_fingerprint,
    kg_fingerprint_by_graph,
)


def _df(rows):
    return pd.DataFrame(rows, columns=["subject", "predicate", "object",
                                       "graph"])


ROWS = [(f"urn:s{i % 13}", f"urn:p{i % 3}", f"v{i}", f"urn:g{i % 4}")
        for i in range(100)]


def _brute_fp(rows):
    fp = 0
    for s, p, o, _g in set(rows):
        key = f"{s}\x1f{p}\x1f{o}".encode()
        fp ^= int.from_bytes(hashlib.md5(key).digest()[:8], "little")
    return f"{fp:016x}"


def test_matches_brute_force_any_layout(ray_session):
    for blocks in (1, 7):
        ds = ray.data.from_pandas(_df(ROWS)).repartition(blocks)
        out = kg_fingerprint(ds).iloc[0]
        assert out["fingerprint"] == _brute_fp(ROWS)
        assert out["n_triples"] == len(ROWS)


def test_duplicates_do_not_change_fingerprint(ray_session):
    dup = ROWS + ROWS[:17]
    out = kg_fingerprint(ray.data.from_pandas(_df(dup)).repartition(5)).iloc[0]
    assert out["fingerprint"] == _brute_fp(ROWS)
    assert out["n_triples"] == len(ROWS)  # set semantics


def test_rollforward_by_xor(ray_session):
    base = kg_fingerprint(ray.data.from_pandas(_df(ROWS))).iloc[0]
    extra = ("urn:new", "urn:p0", "vX", "urn:g0")
    both = kg_fingerprint(
        ray.data.from_pandas(_df(ROWS + [extra]))).iloc[0]
    key = "urn:new\x1furn:p0\x1fvX".encode()
    delta = int.from_bytes(hashlib.md5(key).digest()[:8], "little")
    assert int(both["fingerprint"], 16) == int(base["fingerprint"], 16) ^ delta


def test_by_graph_detects_single_graph_change(ray_session):
    a = kg_fingerprint_by_graph(ray.data.from_pandas(_df(ROWS)))
    changed = [(s, p, ("CHANGED" if (g == "urn:g2" and o == "v2") else o), g)
               for s, p, o, g in ROWS]
    b = kg_fingerprint_by_graph(ray.data.from_pandas(_df(changed))
                                .repartition(3))
    merged = a.merge(b, on="graph", suffixes=("_a", "_b"))
    diff = merged[merged["fingerprint_a"] != merged["fingerprint_b"]]
    assert diff["graph"].tolist() == ["urn:g2"]
