"""epoch_shuffle: deterministic seeded global permutation semantics."""

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.corpus_prep import epoch_shuffle


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shufcorpus")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array([f"doc {i}" for i in range(40)],
                                   pa.string())}),
        d / "documents.parquet",
    )
    return str(d)


def _expected_order(doc_ids, seed):
    return sorted(
        doc_ids,
        key=lambda d: (hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:16],
                       d),
    )


def test_positions_are_a_permutation_matching_md5_order(ray_session,
                                                        corpus_dir):
    out = epoch_shuffle(corpus_dir, seed=0).to_pandas()
    assert sorted(out["pos"]) == list(range(40))
    by_pos = out.sort_values("pos")["doc_id"].tolist()
    assert by_pos == _expected_order(range(40), 0)


def test_deterministic_and_seed_dependent(ray_session, corpus_dir):
    a = epoch_shuffle(corpus_dir, seed=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = epoch_shuffle(corpus_dir, seed=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    c = epoch_shuffle(corpus_dir, seed=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert not a["pos"].equals(c["pos"])


def test_block_structure_invariance(ray_session, corpus_dir, tmp_path):
    """Positions must not depend on how rows split into blocks."""
    docs = pq.read_table(f"{corpus_dir}/documents.parquet").to_pandas()
    ddir = tmp_path / "sf"
    pdir = ddir / "documents.parquet"
    pdir.mkdir(parents=True)
    for i, row in docs.iterrows():
        pq.write_table(
            pa.table({"doc_id": pa.array([row["doc_id"]], pa.int64()),
                      "text": pa.array([row["text"]], pa.string())}),
            pdir / f"part-{i}.parquet",
        )
    a = epoch_shuffle(corpus_dir, seed=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = epoch_shuffle(str(ddir), seed=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
