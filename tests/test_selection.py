"""Training-data selection: distributed LR quality classifier + DSIR."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sel_dir(tmp_path_factory):
    """documents.parquet with two planted domains: 'good' docs use the
    spark/ray vocabulary, 'bad' docs the turtle/graph vocabulary; plus a
    target source marker on a third of the good docs."""
    rng = np.random.default_rng(7)
    good_vocab = "spark ray data batch stream shuffle actor arrow block".split()
    bad_vocab = "turtle graph triple predicate ontology sparql iri node".split()
    rows = []
    for i in range(120):
        good = i % 2 == 0
        vocab = good_vocab if good else bad_vocab
        n = int(rng.integers(20, 60))
        text = " ".join(rng.choice(vocab, size=n))
        rows.append({"doc_id": i, "text": text,
                     "lang": "en", "source": "src0" if good and i % 6 == 0
                     else "srcX", "n_chars": len(text)})
    d = tmp_path_factory.mktemp("seldocs")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_classifier_separates_planted_domains(ray_session, sel_dir):
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import (
        classifier_score_batch,
        train_quality_classifier,
    )

    def vocab_label(texts: pd.Series) -> np.ndarray:
        return texts.str.contains("spark|ray|shuffle").astype(np.int64).to_numpy()

    ds = ray.data.read_parquet(f"{sel_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    model = train_quality_classifier(ds, label_fn=vocab_label, iters=6,
                                     n_features=1 << 14)
    df = ds.to_pandas()
    p = classifier_score_batch(model, df["text"])
    acc = ((p >= 0.5).astype(int) == vocab_label(df["text"])).mean()
    assert acc >= 0.99  # disjoint vocabularies: must be ~perfectly separable


def test_classifier_scores_shape_and_determinism(ray_session, sel_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import (
        quality_classifier_scores,
    )

    a = (quality_classifier_scores(sel_dir, iters=4, n_features=1 << 14)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(a.columns) == ["doc_id", "label", "score", "pred"]
    assert len(a) == 120
    assert set(a["pred"].unique()) <= {0, 1}
    assert ((a["score"] >= 0) & (a["score"] <= 1)).all()
    b = (quality_classifier_scores(sel_dir, iters=4, n_features=1 << 14)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_ngram_buckets_window_semantics():
    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import _ngram_buckets

    texts = pd.Series(["a b c d", "x y", "lone", None, ""])
    di, b = _ngram_buckets(texts, 1 << 12, 2)
    # bigram counts per doc: 3, 1, 0, 0, 0 — and no cross-doc windows
    assert np.bincount(di, minlength=5).tolist() == [3, 1, 0, 0, 0]
    # identical bigrams hash identically across docs
    di2, b2 = _ngram_buckets(pd.Series(["a b", "a b"]), 1 << 12, 2)
    assert b2[0] == b2[1]


def test_dsir_prefers_target_like_docs(ray_session, sel_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import (
        dsir_topk,
        dsir_weights,
    )

    w = dsir_weights(sel_dir, target_source="src0").to_pandas()
    assert len(w) == 120
    good = w[w["doc_id"] % 2 == 0]["log_weight"]
    bad = w[w["doc_id"] % 2 == 1]["log_weight"]
    # the target sample is spark-vocab: spark-vocab docs must score higher
    assert good.median() > bad.median() + 0.5
    top = dsir_topk(sel_dir, k=20, target_source="src0").to_pandas()
    assert len(top) == 20
    assert (top["doc_id"] % 2 == 0).all()  # all selected docs are on-domain
    # ordering is deterministic: weight desc, doc_id asc
    assert top["log_weight"].is_monotonic_decreasing


def test_classifier_empty_input(ray_session, tmp_path):
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import (
        train_quality_classifier,
    )

    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}),
                   str(tmp_path / "documents.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    model = train_quality_classifier(ds, iters=2, n_features=1 << 10)
    assert model["bias"] == 0.0 and not model["w"].any()


def test_dsir_quoted_target_source_is_data(ray_session, sel_dir):
    """A target_source containing a quote must be treated as data (no
    filter-expression interpolation): empty target → finite weights."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import dsir_weights

    w = dsir_weights(sel_dir, target_source="o'reilly").to_pandas()
    assert len(w) == 120
    assert w["log_weight"].notna().all()


def test_classifier_local_path_matches_distributed(ray_session, sel_dir):
    import numpy as np
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import (
        train_quality_classifier,
    )

    ds = ray.data.read_parquet(f"{sel_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    local = train_quality_classifier(ds, iters=5)
    dist = train_quality_classifier(ds, iters=5, force_distributed=True)
    assert np.abs(local["w"] - dist["w"]).max() < 1e-9
    assert abs(local["bias"] - dist["bias"]) < 1e-9
    assert np.abs(local["mean"] - dist["mean"]).max() < 1e-12


def test_dsir_fused_counts_equal_two_pass(ray_session):
    """The single-scan fused histogram pair equals the separate
    target-pass + raw-pass histograms exactly."""
    import pyarrow.compute as pc

    from cmc_knowledge_graph_text2ttl_ray.pipelines.selection import (
        _dsir_fused_counts,
        _hashed_ngram_counts,
        _docs,
    )

    sf = "/root/testdata/sf0.001"
    raw = _docs(sf, columns=["doc_id", "text", "source"])
    t_fused, r_fused = _dsir_fused_counts(raw, "src0", 1 << 12, 2)
    target = raw.map_batches(
        lambda t: t.filter(pc.equal(t["source"], "src0")),
        batch_format="pyarrow").select_columns(["text"])
    t_sep = _hashed_ngram_counts(target, 1 << 12, 2)
    r_sep = _hashed_ngram_counts(raw, 1 << 12, 2)
    assert np.array_equal(t_fused, t_sep)
    assert np.array_equal(r_fused, r_sep)
    assert r_fused.sum() > t_fused.sum() > 0
