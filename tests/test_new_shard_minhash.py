"""Incremental near-dup crawl dedup against a persisted LSH index."""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.dedup import (
    new_shard_minhash_dedup,
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shardcorpus")
    random.seed(3)
    words = [f"w{i}" for i in range(500)]
    base = {i: " ".join(random.choices(words, k=60)) for i in range(200)}
    rows = []
    for i in range(200):
        if i % 20 == 0:
            # new doc that is a near-copy of corpus doc i+1
            w = base[i + 1].split()
            w[5] = "CHANGED"
            rows.append((i, " ".join(w)))
        else:
            rows.append((i, base[i]))
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())}),
        d / "documents.parquet",
    )
    return str(d)


def test_planted_near_dups_found(ray_session, planted_dir, tmp_path):
    idx = str(tmp_path / "lsh_index")
    out = new_shard_minhash_dedup(planted_dir, threshold=0.6,
                                  index_dir=idx) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # every new doc (doc_id % 10 == 0) gets exactly one row
    assert out["doc_id"].tolist() == list(range(0, 200, 10))
    dups = dict(zip(out[out["is_near_dup"] == 1]["doc_id"],
                    out[out["is_near_dup"] == 1]["dup_of"]))
    assert dups == {i: i + 1 for i in range(0, 200, 20)}
    # novel docs are flagged novel with sentinel fields
    novel = out[out["is_near_dup"] == 0]
    assert (novel["dup_of"] == -1).all()
    assert (novel["est_jaccard"] == 0.0).all()
    # matched rows carry a high estimate
    assert (out[out["is_near_dup"] == 1]["est_jaccard"] >= 0.6).all()


def test_index_is_reused_across_snapshots(ray_session, planted_dir,
                                          tmp_path):
    idx = str(tmp_path / "lsh_index2")
    a = new_shard_minhash_dedup(planted_dir, threshold=0.6, index_dir=idx) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert os.path.isdir(os.path.join(idx, "bands"))
    assert os.path.isdir(os.path.join(idx, "sigs"))
    # freeze the index files; a second probe must not rewrite them
    mtimes = {
        f: os.path.getmtime(os.path.join(idx, "bands", f))
        for f in os.listdir(os.path.join(idx, "bands"))
    }
    b = new_shard_minhash_dedup(planted_dir, threshold=0.6, index_dir=idx) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(idx, "bands", f)) == t


def test_no_duplicates_all_novel(ray_session, tmp_path):
    """Zero-candidate and zero-verified paths: every new doc flagged
    novel, no join crash on all-empty sides."""
    import random

    random.seed(5)
    words = [f"w{i}" for i in range(500)]
    rows = [(i, " ".join(random.choices(words, k=60))) for i in range(60)]
    d = tmp_path / "nodups"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())}),
        d / "documents.parquet",
    )
    out = new_shard_minhash_dedup(str(d), threshold=0.7,
                                  index_dir=str(tmp_path / "idx")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == list(range(0, 60, 10))
    assert (out["is_near_dup"] == 0).all()
    assert (out["dup_of"] == -1).all()
