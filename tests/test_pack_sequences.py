"""pack_sequences: distributed prefix-sum packing semantics."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.corpus_prep import pack_sequences


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("packcorpus")
    # token counts: 3, 5, 2, 7, 4  (whitespace tokenization)
    texts = ["a b c", "d e f g h", "i j", "k l m n o p q", "r s t u"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet",
    )
    return str(d)


def test_spans_and_chunk_ids(ray_session, corpus_dir):
    out = pack_sequences(corpus_dir, seq_len=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # global stream: offsets 0..21; seq_len=4 chunks
    assert out["n_tokens"].tolist() == [3, 5, 2, 7, 4]
    assert out["start_off"].tolist() == [0, 3, 8, 10, 17]
    assert out["end_off"].tolist() == [3, 8, 10, 17, 21]
    assert out["first_seq"].tolist() == [0, 0, 2, 2, 4]
    assert out["last_seq"].tolist() == [0, 1, 2, 4, 5]
    # spans tile the stream exactly: each doc starts where the last ended
    assert (out["start_off"].iloc[1:].to_numpy()
            == out["end_off"].iloc[:-1].to_numpy()).all()


def test_block_structure_invariance(ray_session, corpus_dir, tmp_path):
    """The packing must not depend on how rows split into blocks: the same
    corpus written as many single-row files gives identical spans."""
    docs = pq.read_table(f"{corpus_dir}/documents.parquet").to_pandas()
    # one file per doc under a documents.parquet directory
    ddir = tmp_path / "sf"
    pdir = ddir / "documents.parquet"
    pdir.mkdir(parents=True)
    for i, row in docs.iterrows():
        pq.write_table(
            pa.table({"doc_id": pa.array([row["doc_id"]], pa.int64()),
                      "text": pa.array([row["text"]], pa.string())}),
            pdir / f"part-{i}.parquet",
        )
    a = pack_sequences(corpus_dir, seq_len=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(str(ddir), seq_len=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_chunk_documents_spans(ray_session, corpus_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.corpus_prep import (
        chunk_documents,
    )

    # token counts 3,5,2,7,4; chunk=4, overlap=1 → stride 3
    out = chunk_documents(corpus_dir, chunk_tokens=4, overlap=1) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    # doc 3 has 7 tokens → chunks [0,4) and [3,7)
    d3 = out[out["doc_id"] == 3]
    assert list(zip(d3["start_tok"], d3["end_tok"])) == [(0, 4), (3, 7)]
    # every doc appears; chunk 0 always starts at 0
    assert set(out["doc_id"]) == set(range(5))
    assert (out[out["chunk_idx"] == 0]["start_tok"] == 0).all()
    # spans never exceed the doc and consecutive chunks overlap by 1
    d1 = out[out["doc_id"] == 1]
    assert list(zip(d1["start_tok"], d1["end_tok"])) == [(0, 4), (3, 5)]


def test_chunk_documents_rejects_bad_overlap(ray_session, corpus_dir):
    import pytest as _pytest

    from cmc_knowledge_graph_text2ttl_ray.pipelines.corpus_prep import (
        chunk_documents,
    )

    with _pytest.raises(ValueError):
        chunk_documents(corpus_dir, chunk_tokens=4, overlap=4)
