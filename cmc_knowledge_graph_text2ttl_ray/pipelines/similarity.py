"""Similarity search over the ``embeddings`` table (list<float> column).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  once; every batch computes a vectorized matmul; only (id, sim) pairs reach
  the driver-side top-k. This is the correctness baseline (DuckDB oracle via
  ``list_cosine_similarity``).
- :func:`knn_ivf` — the scale path: a deterministic IVF index (k-means with
  fixed seeding, 2 refinement passes) assigns every vector to a centroid;
  queries probe only the closest ``nprobe`` partitions. At 100 TB the
  assignment is a bucketed parquet layout and probing is a partition-pruned
  read; here both live in one session.
- :func:`embedding_near_dup_pairs` — cosine ≥ τ near-duplicate pairs via
  blockwise matmul against the (small) broadcast matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away
import pyarrow as pa
import ray.data

__all__ = ["knn_bruteforce", "knn_ivf", "embedding_near_dup_pairs", "build_ivf_centroids"]


def _emb(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _to_matrix(col) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    row = t.filter(pc.equal(t["vec_id"], query_vec_id))
    return np.asarray(row["embedding"][0].as_py(), dtype=np.float64)


def knn_bruteforce(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Exact cosine top-k of the query vector (excluded from results)."""
    q = _query_vector(sf_dir, query_vec_id)

    def sims(df: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(df["embedding"])
        s = _cosine(mat, q)
        out = pd.DataFrame({"vec_id": df["vec_id"], "sim": round_half_away(s, 4)})
        out = out[out["vec_id"] != query_vec_id]
        # per-block combiner: keep only the local top-k before the sort
        return out.nlargest(k, ["sim"])

    return (
        _emb(sf_dir)
        .map_batches(sims, batch_format="pandas")
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


def build_ivf_centroids(sf_dir: str, n_clusters: int = 16, iters: int = 2) -> np.ndarray:
    """Deterministic mini k-means: seeds = evenly-strided vec_ids, two Lloyd
    passes over the full (streamed) data."""
    ds = _emb(sf_dir)
    total = ds.count()
    stride = max(1, total // n_clusters)
    seed_ids = set(range(0, stride * n_clusters, stride))

    def keep_seeds(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        return t.filter(_pc.is_in(t["vec_id"], value_set=_pa.array(sorted(seed_ids), _pa.int64())))

    seeds = (
        ds.map_batches(keep_seeds, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    )
    centroids = _to_matrix(seeds["embedding"])[:n_clusters]

    for _ in range(iters):
        c = centroids

        def assign_sum(df: pd.DataFrame) -> pd.DataFrame:
            mat = _to_matrix(df["embedding"])
            idx = np.argmax(mat @ c.T, axis=1)  # cosine-ish on ~normalized data
            sums = np.zeros_like(c)
            counts = np.zeros(len(c))
            np.add.at(sums, idx, mat)
            np.add.at(counts, idx, 1)
            return pd.DataFrame(
                {"cluster": range(len(c)), "sum": list(sums), "count": counts}
            )

        parts = ds.map_batches(assign_sum, batch_format="pandas").to_pandas()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        for r in parts.itertuples():
            sums[r.cluster] += np.asarray(r.sum)
            counts[r.cluster] += r.count
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
    return centroids


def knn_ivf(sf_dir: str, query_vec_id: int = 0, k: int = 10, n_clusters: int = 16,
            nprobe: int = 4):
    """Approximate top-k: probe only the ``nprobe`` closest IVF partitions."""
    q = _query_vector(sf_dir, query_vec_id)
    centroids = build_ivf_centroids(sf_dir, n_clusters)
    cq = _cosine(centroids, q)
    probe = set(np.argsort(-cq)[:nprobe].tolist())

    def sims(df: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(df["embedding"])
        assign = np.argmax(mat @ centroids.T, axis=1)
        mask = np.isin(assign, list(probe)) & (df["vec_id"].to_numpy() != query_vec_id)
        if not mask.any():
            return pd.DataFrame({"vec_id": [], "sim": []})
        s = _cosine(mat[mask], q)
        out = pd.DataFrame({"vec_id": df["vec_id"].to_numpy()[mask], "sim": round_half_away(s, 4)})
        return out.nlargest(k, ["sim"])

    return (
        _emb(sf_dir)
        .map_batches(sims, batch_format="pandas")
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.95):
    """All pairs with cosine ≥ threshold. The right side is broadcast once
    (fits while the corpus side streams); at larger scale the same kernel
    runs per IVF bucket so only intra-bucket pairs are compared."""
    full = _emb(sf_dir).to_pandas().sort_values("vec_id")
    ids = full["vec_id"].to_numpy()
    mat = _to_matrix(full["embedding"])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        lmat = _to_matrix(df["embedding"])
        lnorm = np.linalg.norm(lmat, axis=1)
        lnorm[lnorm == 0] = 1.0
        sims = (lmat / lnorm[:, None]) @ matn.T
        lids = df["vec_id"].to_numpy()
        li, ri = np.nonzero(sims >= threshold)
        keep = lids[li] < ids[ri]  # upper triangle only, no self-pairs
        return pd.DataFrame(
            {
                "vec_a": lids[li][keep],
                "vec_b": ids[ri][keep],
                "cosine": round_half_away(sims[li, ri][keep], 4),
            }
        )

    return _emb(sf_dir).map_batches(pairs, batch_format="pandas")
