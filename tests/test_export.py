"""Training-shard export sink: determinism, resume, round trip."""

import gzip
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def docs_ds(ray_session, tmp_path):
    import ray.data

    rows = [{"doc_id": i, "text": f"doc {i} body", "score": i * 0.5}
            for i in range(200)]
    p = tmp_path / "documents.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(p))
    return ray.data.read_parquet(str(p))


def _read_all(out_dir):
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard-"):
            continue
        raw = open(os.path.join(out_dir, name), "rb").read()
        if name.endswith(".gz"):
            raw = gzip.decompress(raw)
        rows += [json.loads(l) for l in raw.decode().splitlines()]
    return pd.DataFrame(rows)


def test_export_roundtrip_and_determinism(docs_ds, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.stages.export import write_training_shards

    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    man1 = write_training_shards(docs_ds, out1, num_shards=8)
    man2 = write_training_shards(docs_ds, out2, num_shards=8)
    assert len(man1["shards"]) == 8
    # every row lands exactly once
    back = _read_all(out1).sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(200))
    assert back["text"].iloc[3] == "doc 3 body"
    # byte determinism across independent runs
    for k in man1["shards"]:
        b1 = open(man1["shards"][k]["path"], "rb").read()
        b2 = open(man2["shards"][k]["path"], "rb").read()
        assert b1 == b2


def test_export_resume_skips_done_shards(docs_ds, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.stages.export import (
        read_shard_manifest,
        write_training_shards,
    )

    out = str(tmp_path / "r")
    man = write_training_shards(docs_ds, out, num_shards=4)
    # drop two shards from the manifest to simulate a partial run (a real
    # partial run keeps the params stamp — preserve it)
    partial = {"shards": {k: v for k, v in man["shards"].items()
                          if k in ("0", "1")},
               "params": man["params"]}
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(partial, f)
    mtimes = {k: os.path.getmtime(v["path"])
              for k, v in man["shards"].items()}
    import time

    time.sleep(0.05)
    write_training_shards(docs_ds, out, num_shards=4)
    man2 = read_shard_manifest(out)
    assert set(man2["shards"]) == {"0", "1", "2", "3"}
    # finished shards untouched, missing ones rewritten
    assert os.path.getmtime(man["shards"]["0"]["path"]) == mtimes["0"]
    assert os.path.getmtime(man["shards"]["2"]["path"]) > mtimes["2"]


def test_export_column_projection(docs_ds, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.stages.export import write_training_shards

    out = str(tmp_path / "c")
    write_training_shards(docs_ds, out, num_shards=2, columns=["text"],
                          compress=False)
    back = _read_all(out)
    assert sorted(back.columns) == ["doc_id", "text"]  # key + projection


def test_grouped_tdigest_vs_exact(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        events_type_quantiles_tdigest,
    )

    sf = "/root/testdata/sf0.001"
    got = events_type_quantiles_tdigest(sf)
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for etype, g in got.groupby("event_type"):
        vals = np.sort(ev[ev["event_type"] == etype]["value"]
                       .dropna().to_numpy(float))
        ranks = np.searchsorted(vals, g["value_est"].to_numpy()) / len(vals)
        assert np.abs(ranks - g["q"].to_numpy()).max() < 0.02
    # determinism
    again = events_type_quantiles_tdigest(sf)
    pd.testing.assert_frame_equal(got, again)


def test_export_param_change_resets_layout(docs_ds, tmp_path):
    """Changing num_shards on an existing out_dir must not mix layouts:
    old shard files are cleared and the new layout is complete/exact."""
    import os

    from cmc_knowledge_graph_text2ttl_ray.stages.export import write_training_shards

    out = str(tmp_path / "p")
    write_training_shards(docs_ds, out, num_shards=4)
    write_training_shards(docs_ds, out, num_shards=8)
    names = [n for n in os.listdir(out) if n.startswith("shard-")]
    assert len(names) == 8
    back = _read_all(out).sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(200))
