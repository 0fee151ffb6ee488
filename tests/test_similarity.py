"""IVF index layout, pruned-probe kNN, and bucketed near-dup pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    """embeddings.parquet with 3 well-separated clusters + planted near-dups."""
    rng = np.random.RandomState(42)
    dim = 16
    centers = rng.randn(3, dim) * 5
    vecs, ids = [], []
    vid = 0
    for c in range(3):
        for _ in range(40):
            vecs.append(centers[c] + rng.randn(dim) * 0.5)
            ids.append(vid)
            vid += 1
    # planted near-dup pairs: tiny perturbations of existing vectors
    planted = [(0, vid), (45, vid + 1), (100, vid + 2)]
    for src, nid in planted:
        vecs.append(np.asarray(vecs[src]) + rng.randn(dim) * 1e-3)
        ids.append(nid)
    d = tmp_path_factory.mktemp("embdocs")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }),
        str(d / "embeddings.parquet"),
    )
    return str(d), planted


def test_embedding_near_dup_pairs_ivf(ray_session, emb_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        embedding_near_dup_pairs,
    )

    d, planted = emb_dir
    pairs = embedding_near_dup_pairs(d, threshold=0.99, n_clusters=3).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    for src, nid in planted:
        assert (min(src, nid), max(src, nid)) in found, (src, nid, found)
    # vectors from different well-separated clusters never pair
    assert all(
        abs(a // 40 - b // 40) == 0 or a >= 120 or b >= 120 for a, b in found
    )


def test_knn_ivf_matches_bruteforce_on_clustered(ray_session, emb_dir, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        knn_bruteforce,
        knn_ivf,
    )

    d, _ = emb_dir
    exact = knn_bruteforce(d, query_vec_id=5, k=5).to_pandas()
    approx = knn_ivf(d, query_vec_id=5, k=5, n_clusters=3, nprobe=1,
                     index_dir=str(tmp_path / "ivf")).to_pandas()
    # query's own cluster holds all true neighbors → pruned probe is exact
    assert list(approx["vec_id"]) == list(exact["vec_id"])
    # index layout on disk: one dir per cluster + centroids + marker
    import os

    assert os.path.exists(tmp_path / "ivf" / "_DONE")
    assert os.path.exists(tmp_path / "ivf" / "centroids.npy")
    clusters = [p for p in os.listdir(tmp_path / "ivf" / "vectors")
                if p.startswith("cluster=")]
    assert len(clusters) >= 2


def test_ivf_index_reused_not_rebuilt(ray_session, emb_dir, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import build_ivf_index
    import os

    d, _ = emb_dir
    idx = str(tmp_path / "ivf2")
    c1 = build_ivf_index(d, idx, n_clusters=3)
    mtime = os.path.getmtime(os.path.join(idx, "centroids.npy"))
    c2 = build_ivf_index(d, idx, n_clusters=3)
    assert np.allclose(c1, c2)
    assert os.path.getmtime(os.path.join(idx, "centroids.npy")) == mtime


def test_knn_lsh_finds_close_neighbors(ray_session, emb_dir):
    """LSH-bucketed ANN: planted near-dup must surface for its source query."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        hyperplane_lsh_buckets,
        knn_lsh,
    )

    d, planted = emb_dir
    src, nid = planted[0]  # vec `nid` is a tiny perturbation of vec `src`
    res = knn_lsh(d, query_vec_id=src, k=5, n_bits=6).to_pandas()
    assert nid in set(res["vec_id"])
    assert res["sim"].iloc[0] > 0.99
    # bucketization is deterministic and assigns every vector
    b1 = hyperplane_lsh_buckets(d).to_pandas().sort_values("vec_id")
    b2 = hyperplane_lsh_buckets(d).to_pandas().sort_values("vec_id")
    assert b1["bucket"].tolist() == b2["bucket"].tolist()
    # near-identical vectors share a bucket
    by_id = dict(zip(b1["vec_id"], b1["bucket"]))
    assert by_id[src] == by_id[nid]


def test_embedding_near_dup_hot_cluster_guard(ray_session, emb_dir):
    """Sub-bucketing hot clusters (max_cluster_rows small enough to force
    B>1 block pairs) must produce the SAME pair set as the unsplit run —
    no cross-block pair may be lost."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        embedding_near_dup_pairs,
    )

    d, planted = emb_dir

    def pairset(**kw):
        df = embedding_near_dup_pairs(d, threshold=0.99, n_clusters=3,
                                      **kw).to_pandas()
        return {(int(a), int(b), float(c))
                for a, b, c in zip(df["vec_a"], df["vec_b"], df["cosine"])}

    base = pairset(max_cluster_rows=100_000)      # B = 1 everywhere
    split = pairset(max_cluster_rows=8)           # forces many blocks
    assert split == base and base


def test_knn_lsh_pruned_layout(ray_session, emb_dir, tmp_path):
    """The LSH index layout is bucket-partitioned parquet; a probe reads
    only the probed buckets' files and the cached index is reused."""
    import glob
    import os

    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        build_lsh_index,
        knn_lsh,
    )

    d, planted = emb_dir
    idx = str(tmp_path / "lsh")
    p1 = build_lsh_index(d, idx, n_bits=6)
    assert glob.glob(os.path.join(idx, "vectors", "bucket=*", "*.parquet"))
    mtime = os.path.getmtime(os.path.join(idx, "planes.npy"))
    src, nid = planted[0]
    res = knn_lsh(d, query_vec_id=src, k=5, n_bits=6, index_dir=idx).to_pandas()
    assert nid in set(res["vec_id"])
    # idempotent rebuild: planes untouched, identical matrix
    p2 = build_lsh_index(d, idx, n_bits=6)
    assert (p1 == p2).all()
    assert os.path.getmtime(os.path.join(idx, "planes.npy")) == mtime


def test_knn_lsh_multi_table_improves_candidates(ray_session, emb_dir, tmp_path):
    """Multi-table LSH: the planted near-dup surfaces and multi-table
    results are supersets-or-equal in quality (same top hit, deterministic
    across runs)."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import knn_lsh

    d, planted = emb_dir
    src, nid = planted[0]
    r1 = knn_lsh(d, query_vec_id=src, k=5, n_bits=6, n_tables=4,
                 index_dir=str(tmp_path / "l4")).to_pandas()
    assert nid in set(r1["vec_id"])
    assert r1["sim"].iloc[0] > 0.99
    r2 = knn_lsh(d, query_vec_id=src, k=5, n_bits=6, n_tables=4,
                 index_dir=str(tmp_path / "l4")).to_pandas()
    assert r1.equals(r2)


def test_knn_pq_recall_and_determinism(ray_session, tmp_path):
    """PQ top-k: recall vs exact cosine at the documented level, fully
    deterministic, and the cached index is reused (codes written once)."""
    import os

    import numpy as np

    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        knn_bruteforce,
        knn_pq,
    )

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "pq")
    recalls = []
    for qid in (0, 5, 17):
        exact = set(knn_bruteforce(sf, query_vec_id=qid, k=10)
                    .to_pandas()["vec_id"])
        approx = knn_pq(sf, query_vec_id=qid, k=10, index_dir=idx) \
            .to_pandas()
        recalls.append(len(set(approx["vec_id"]) & exact) / 10)
    # measured 0.73 mean at m=16/nbits=8 on this corpus; honest floor
    assert np.mean(recalls) >= 0.55, recalls
    a = knn_pq(sf, query_vec_id=0, k=10, index_dir=idx).to_pandas()
    b = knn_pq(sf, query_vec_id=0, k=10, index_dir=idx).to_pandas()
    assert a.equals(b)
    assert os.path.exists(os.path.join(idx, "_DONE"))


def test_pq_codebook_roundtrip_error_shrinks():
    """More bits → lower reconstruction error (sanity of the trainer)."""
    import numpy as np

    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        _pq_encode_matrix,
        _pq_train_codebooks,
    )

    rng = np.random.default_rng(5)
    x = rng.normal(size=(400, 16))

    def recon_err(nbits):
        books = _pq_train_codebooks(x, m=4, k=1 << nbits)
        codes = _pq_encode_matrix(x, books)
        xhat = np.concatenate(
            [books[s][codes[:, s]] for s in range(4)], axis=1)
        return float(((x - xhat) ** 2).mean())

    e2, e6 = recon_err(2), recon_err(6)
    assert e6 < e2 * 0.6


def test_pq_trainer_tiny_corpus_many_centroids():
    """k >> sample size must train (cyclic dead-centroid reseed), not
    crash on a broadcast mismatch (round-3 review)."""
    import numpy as np

    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        _pq_encode_matrix,
        _pq_train_codebooks,
    )

    x = np.random.default_rng(1).normal(size=(100, 16))
    books = _pq_train_codebooks(x, m=4, k=256)
    codes = _pq_encode_matrix(x, books)
    assert books.shape == (4, 256, 4) and codes.shape == (100, 4)
    assert np.array_equal(books, _pq_train_codebooks(x, m=4, k=256))


def test_knn_recall_check_row(ray_session):
    """The oracle-backed ANN check row: every method's mean recall@10 over
    the probe queries clears its floor on the synthetic embeddings."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        knn_recall_check,
    )

    out = knn_recall_check("/root/testdata/sf0.001")
    assert list(out["method"]) == ["ivf", "lsh", "pq"]
    assert out["recall_above_floor"].all(), out.to_dict("records")


def test_pca_fit_block_invariant_and_ordered(ray_session):
    """Components identical under any block structure (moment sums are
    exact); explained variance is descending; projection matches the
    driver-side numpy PCA on the same data."""
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        pca_fit, pca_transform,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=(400, 3)) @ np.diag([5.0, 1.0, 0.2])
    df = pd.DataFrame({"vec_id": np.arange(400),
                       "embedding": list(base.astype(np.float32))})
    fits = []
    for parts in (1, 4, 32):
        ds = ray.data.from_pandas(df).repartition(parts)
        fits.append(pca_fit(ds, "embedding", k=2))
    for comps, _, var in fits[1:]:
        np.testing.assert_allclose(comps, fits[0][0], atol=1e-9)
    comps, mean, var = fits[0]
    assert var[0] > var[1] > 0
    # sign convention: largest-|entry| coordinate positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0
    # equals driver-side numpy PCA (same convention)
    x = base.astype(np.float32).astype(np.float64)
    cov = np.cov(x, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    ref = vecs[:, np.argsort(vals)[::-1][:2]].T
    for i in range(2):
        j = np.argmax(np.abs(ref[i]))
        if ref[i][j] < 0:
            ref[i] = -ref[i]
    np.testing.assert_allclose(comps, ref, atol=1e-8)
    proj = (pca_transform(ray.data.from_pandas(df), comps, mean)
            .to_pandas().sort_values("vec_id"))
    want = (x - x.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(proj[["pc1", "pc2"]].to_numpy(), want,
                               atol=1e-8)


def test_pca_reconstruction_error_shrinks_with_k(ray_session):
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        pca_fit,
    )

    rng = np.random.default_rng(9)
    base = rng.normal(size=(300, 6)) @ np.diag([4, 3, 2, 1, 0.5, 0.1])
    df = pd.DataFrame({"vec_id": np.arange(300),
                       "embedding": list(base.astype(np.float32))})
    ds = ray.data.from_pandas(df)
    x = base.astype(np.float32).astype(np.float64)
    xc = x - x.mean(axis=0)
    errs = []
    for k in (1, 3, 5):
        comps, mean, _ = pca_fit(ds, "embedding", k=k)
        recon = (xc @ comps.T) @ comps
        errs.append(np.linalg.norm(xc - recon))
    assert errs[0] > errs[1] > errs[2]


def test_emb_covariance_check_vs_duckdb(ray_session):
    import duckdb

    from cmc_knowledge_graph_text2ttl_ray.pipelines.similarity import (
        emb_covariance_check,
    )

    sf = "/root/testdata/sf0.001"
    got = emb_covariance_check(sf)
    want = duckdb.connect().execute(f"""
        SELECT CAST(1 AS BIGINT) AS dim_i, CAST(1 AS BIGINT) AS dim_j,
               ROUND(COVAR_SAMP(embedding[1], embedding[1]), 4) AS cov
        FROM read_parquet('{sf}/embeddings.parquet')
        UNION ALL SELECT 1, 2, ROUND(COVAR_SAMP(embedding[1], embedding[2]), 4)
        FROM read_parquet('{sf}/embeddings.parquet')
        UNION ALL SELECT 2, 2, ROUND(COVAR_SAMP(embedding[2], embedding[2]), 4)
        FROM read_parquet('{sf}/embeddings.parquet')
        ORDER BY dim_i, dim_j
    """).df()
    sub = got[(got["dim_j"] <= 2) & (got["dim_i"] <= 2)].reset_index(drop=True)
    pd.testing.assert_frame_equal(sub, want, check_dtype=False)
