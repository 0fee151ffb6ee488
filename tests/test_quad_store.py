"""Graph-bucketed QuadStore: round trip, pruned scans, SPARQL hook."""

import os

import pandas as pd

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.sources.quad_store import (
    QuadStore,
    write_quad_store,
    _bucket,
)


def _quads(n=60, n_graphs=6):
    return pd.DataFrame({
        "subject": [f"urn:s{i}" for i in range(n)],
        "predicate": ["urn:p"] * n,
        "object": [f"v{i % 7}" for i in range(n)],
        "object_kind": ["literal"] * n,
        "object_lang": [None] * n,
        "object_datatype": [None] * n,
        "graph": [f"urn:g{i % n_graphs}" for i in range(n)],
    })


def test_round_trip_and_pruned_scan(ray_session, tmp_path):
    df = _quads()
    meta = write_quad_store(ray.data.from_pandas(df).repartition(3),
                            str(tmp_path), num_buckets=4)
    assert sum(meta["bucket_rows"].values()) == len(df)
    store = QuadStore(str(tmp_path))
    assert store.scan().count() == len(df)
    one = store.scan("urn:g2").to_pandas()
    want = df[df["graph"] == "urn:g2"]
    assert len(one) == len(want)
    assert set(one["subject"]) == set(want["subject"])


def test_unknown_graph_reads_nothing(ray_session, tmp_path):
    df = _quads(n_graphs=1)  # all rows in one bucket
    write_quad_store(ray.data.from_pandas(df), str(tmp_path), num_buckets=64)
    store = QuadStore(str(tmp_path))
    # a graph hashing to an empty bucket short-circuits without I/O
    for g in ("urn:absent1", "urn:absent2", "urn:absent3"):
        if str(_bucket(g, 64)) not in store.bucket_rows:
            assert store.scan(g).count() == 0
            break
    else:  # all three collided with the data bucket — filter still applies
        assert store.scan("urn:absent1").count() == 0


def test_pruning_reads_one_bucket_dir(ray_session, tmp_path):
    df = _quads(n=200, n_graphs=40)
    write_quad_store(ray.data.from_pandas(df), str(tmp_path), num_buckets=8)
    n_dirs = len([d for d in os.listdir(tmp_path)
                  if d.startswith("graph_bucket=")])
    assert n_dirs > 1
    store = QuadStore(str(tmp_path))
    # the pruned scan reads only its bucket directory by construction;
    # that directory holds a strict subset of the store's rows
    bdir = os.path.join(tmp_path, f"graph_bucket={_bucket('urn:g3', 8)}")
    raw = ray.data.read_parquet(bdir)
    assert 0 < raw.count() < len(df)
    got = store.scan("urn:g3").to_pandas()
    assert set(got["subject"]) == set(
        df[df["graph"] == "urn:g3"]["subject"])
    # residue filter: the bucket holds more rows than the one graph
    assert raw.count() > len(got)


def test_sparql_const_graph_over_store(ray_session, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sparql_dist import sparql_select

    df = _quads()
    write_quad_store(ray.data.from_pandas(df), str(tmp_path), num_buckets=4)
    store = QuadStore(str(tmp_path))
    out = sparql_select(
        store, "SELECT ?s WHERE { GRAPH <urn:g1> { ?s <urn:p> ?o } } "
               "ORDER BY ?s").to_pandas()
    assert out["s"].tolist() == sorted(
        df[df["graph"] == "urn:g1"]["subject"])
    # variable-graph + aggregate works over the store's full scan too
    agg = sparql_select(
        store, "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } "
               "GROUP BY ?g ORDER BY ?g").to_pandas()
    assert agg["n"].sum() == len(df)
