"""Distributed KG embedding training (TransE-style) + link prediction.

Learns vector representations of a knowledge graph's entities and
relations from its (subject, predicate, object) triples — the standard
technique for KG completion / link prediction (Bordes et al., NeurIPS
2013, public).  The reference has no ML surface; for the engine this is
the KG-side counterpart of the training-data family (quality classifier,
DSIR): turn the constructed KG into trainable features.

Model: ``score(s, p, o) = ||E[s] + R[p] - E[o]||²`` (squared-L2 TransE —
squared distance keeps the gradient linear, a documented deviation from
the paper's L1/L2-norm variant), margin ranking loss against
hash-corrupted negatives, full-batch gradient descent with per-epoch
entity renormalization.

Scale shape:

- **The corpus never shuffles.**  Each epoch is ONE ``map_batches`` pass
  over the id-encoded triples: every block gathers its rows' embedding
  vectors from the broadcast matrices (numpy fancy indexing), computes
  margin-loss gradients vectorized, and emits per-(kind, id) gradient
  PARTIALS already block-summed — the exchange is bounded by (entities
  touched × dim), not by triple count.
- **Parameters broadcast once per epoch** via ``ray.put`` (the repo's
  small-side pattern); gradient partials come back through one
  ``coarse_group_reduce`` (vector sums over fixed-width float32 bytes).
- **Partitioning assumption, documented:** the embedding matrices fit
  one node's memory (dim 32 × 10M entities ≈ 1.3 GB).  Beyond that the
  same loop holds with entity-sharded parameter actors (hash(id) →
  shard) — the gradient exchange is already keyed by entity id, so only
  the broadcast/apply step changes.
- Negative sampling, init, and id assignment are all HASH-derived →
  training is deterministic for a given (corpus, seed), any block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["encode_triple_ids", "transe_train", "link_rank", "transe_score"]


def encode_triple_ids(triples):
    """Triples → (ids_df, entities list, relations list).

    Vocabulary is built DISTRIBUTED (per-block distinct → one coarse
    exchange) and returned sorted, so ids are deterministic.  The id
    tables are bounded by vocabulary size; the driver holds them under
    the same assumption as the embedding matrices themselves.

    IRI-objects only: literal objects carry no identity to embed —
    they are dropped here (standard KG-embedding preprocessing).
    """
    import pyarrow.compute as pc

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    def proj(t: pa.Table) -> pa.Table:
        if "object_kind" in t.column_names:
            t = t.filter(pc.fill_null(
                pc.equal(t["object_kind"], "iri"), False))
        return t.select(["subject", "predicate", "object"])

    spo = triples.map_batches(proj, batch_format="pyarrow").materialize()

    def ent_pairs(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.concat([df["subject"], df["object"]], ignore_index=True)
        return pd.DataFrame({"v": vals.drop_duplicates()})

    ents = coarse_group_reduce(
        spo.map_batches(ent_pairs, batch_format="pandas"),
        ["v"], lambda g: g.drop_duplicates()).to_pandas()
    entities = sorted(ents["v"])
    rels = coarse_group_reduce(
        spo.map_batches(
            lambda df: pd.DataFrame({"v": df["predicate"].drop_duplicates()}),
            batch_format="pandas"),
        ["v"], lambda g: g.drop_duplicates()).to_pandas()
    relations = sorted(rels["v"])

    e_id = {e: i for i, e in enumerate(entities)}
    r_id = {r: i for i, r in enumerate(relations)}

    import ray

    e_ref = ray.put(e_id)
    r_ref = ray.put(r_id)

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        em = ray.get(e_ref)
        rm = ray.get(r_ref)
        return pd.DataFrame({
            "s": df["subject"].map(em).astype("int64"),
            "p": df["predicate"].map(rm).astype("int64"),
            "o": df["object"].map(em).astype("int64"),
        })

    ids = spo.map_batches(to_ids, batch_format="pandas").materialize()
    return ids, entities, relations


def _init_matrix(n: int, dim: int, seed: int, tag: str) -> np.ndarray:
    """Deterministic init (md5-derived seed — Python's ``hash()`` is
    process-salted and would break cross-run determinism)."""
    import hashlib

    h = hashlib.md5(f"{seed}:{tag}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:4], "little"))
    m = rng.standard_normal((n, dim)).astype(np.float32) / np.sqrt(dim)
    return m


def transe_train(ids, n_entities: int, n_relations: int, dim: int = 32,
                 epochs: int = 20, lr: float = 0.1, margin: float = 1.0,
                 seed: int = 7, num_coarse=None):
    """Full-batch TransE training.  Returns ``(E, R, losses)`` — the
    entity / relation float32 matrices and the per-epoch mean loss."""
    import ray

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    E = _init_matrix(n_entities, dim, seed, "ent")
    R = _init_matrix(n_relations, dim, seed, "rel")
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    losses: list[float] = []

    n_rows = ids.count()

    for epoch in range(epochs):
        e_ref = ray.put(E)
        r_ref = ray.put(R)

        def grad_block(df: pd.DataFrame, _e=e_ref, _r=r_ref,
                       _epoch=epoch) -> pd.DataFrame:
            Em = ray.get(_e)
            Rm = ray.get(_r)
            s = df["s"].to_numpy()
            p = df["p"].to_numpy()
            o = df["o"].to_numpy()
            # hash-derived corrupt tails: deterministic per (triple, epoch)
            h = (np.uint64(0x9E3779B97F4A7C15) * (s.astype(np.uint64) + 1)
                 ^ np.uint64(0xC2B2AE3D27D4EB4F) * (o.astype(np.uint64) + 3)
                 ^ np.uint64(_epoch * 2654435761 + 97))
            # never corrupt to the TRUE tail: sample from |E|-1 slots
            # and shift past o (keeps determinism; a true-tail negative
            # would contribute `margin` to the loss with zero gradient)
            if len(Em) > 1:
                o_neg = (h % np.uint64(len(Em) - 1)).astype(np.int64)
                o_neg += (o_neg >= o)
            else:
                o_neg = o.copy()
            es, rp, eo, en = Em[s], Rm[p], Em[o], Em[o_neg]
            d_pos = es + rp - eo
            d_neg = es + rp - en
            loss_vec = (margin + (d_pos * d_pos).sum(1)
                        - (d_neg * d_neg).sum(1))
            active = loss_vec > 0
            loss_sum = float(loss_vec[active].sum())
            if not active.any():
                return pd.DataFrame({
                    "kind": pd.Series(["loss"], dtype="object"),
                    "id": pd.Series([0], dtype="int64"),
                    "g": [np.zeros(dim, np.float32).tobytes()],
                    "loss": [0.0], "n": [len(df)]})
            sa, pa_, oa, na = s[active], p[active], o[active], o_neg[active]
            gp, gn = 2 * d_pos[active], 2 * d_neg[active]
            # ∂L/∂e_s = gp - gn ; ∂R = gp - gn ; ∂e_o = -gp ; ∂e_neg = +gn
            ids_all = np.concatenate([sa, oa, na, pa_])
            kinds = np.concatenate([
                np.zeros(len(sa) + len(oa) + len(na), np.int8),
                np.ones(len(pa_), np.int8)])
            grads = np.concatenate([gp - gn, -gp, gn, gp - gn])
            # block-local combine BEFORE the exchange (the combiner):
            key = kinds.astype(np.int64) * (len(Em) + len(Rm)) + ids_all
            order = np.argsort(key, kind="stable")
            key_s, grads_s = key[order], grads[order]
            uk, start = np.unique(key_s, return_index=True)
            summed = np.add.reduceat(grads_s, start, axis=0)
            out_kind = np.where(uk // (len(Em) + len(Rm)) == 0, "ent", "rel")
            out_id = uk % (len(Em) + len(Rm))
            rows = pd.DataFrame({
                "kind": out_kind, "id": out_id.astype("int64"),
                "g": [v.astype(np.float32).tobytes() for v in summed],
                "loss": 0.0, "n": 0})
            rows.loc[len(rows)] = ["loss", 0,
                                   np.zeros(dim, np.float32).tobytes(),
                                   loss_sum, len(df)]
            return rows

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            mats = np.frombuffer(b"".join(g["g"]), dtype=np.float32) \
                .reshape(len(g), -1)
            df2 = g[["kind", "id"]].copy()
            df2["_row"] = np.arange(len(g))
            agg = df2.groupby(["kind", "id"], as_index=False)["_row"] \
                .agg(list)
            out_g = [mats[r].sum(0).tobytes() for r in agg["_row"]]
            loss = g.groupby(["kind", "id"], as_index=False)[["loss", "n"]] \
                .sum()
            merged = agg.drop(columns=["_row"]).merge(loss, on=["kind", "id"])
            merged["g"] = out_g
            return merged

        parts = coarse_group_reduce(
            ids.map_batches(grad_block, batch_format="pandas"),
            ["kind", "id"], combine, num_coarse=num_coarse).to_pandas()

        total_loss = float(parts["loss"].sum())
        losses.append(total_loss / max(1, n_rows))
        scale = lr / max(1, n_rows)
        for kind, mat in (("ent", E), ("rel", R)):
            sel = parts[parts["kind"] == kind]
            if len(sel):
                idx = sel["id"].to_numpy()
                gr = np.frombuffer(b"".join(sel["g"]), dtype=np.float32) \
                    .reshape(len(sel), dim)
                np.subtract.at(mat, idx, scale * gr)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        np.divide(E, norms, out=E, where=norms > 1)  # project to unit ball
    return E, R, losses


def transe_score(E, R, s_ids, p_ids, o_ids) -> np.ndarray:
    d = E[np.asarray(s_ids)] + R[np.asarray(p_ids)] - E[np.asarray(o_ids)]
    return (d * d).sum(1)


def link_rank(E, R, ids_df: pd.DataFrame,
              filter_known: pd.DataFrame | None = None) -> pd.DataFrame:
    """FILTERED-rank evaluation (Bordes et al. protocol): for each
    (s, p, o) row, the rank of the true tail o among all entities by
    score (1 = best), NOT counting the OTHER known-true tails of the
    same (s, p) — a perfect model on a many-valid-tails relation would
    otherwise never reach rank 1.  ``filter_known`` defaults to
    ``ids_df`` itself (train == eval in the demo); pass the full triple
    id table when evaluating held-out rows.  Vectorized one matmul-sized
    pass; at scale this is the brute-force baseline (the engine's ANN
    family provides the indexed path).  Returns per-relation mean rank
    + hits@10."""
    s = ids_df["s"].to_numpy()
    p = ids_df["p"].to_numpy()
    o = ids_df["o"].to_numpy()
    q = E[s] + R[p]                          # (n, d)
    # ||q - E||² = |q|² - 2 q·E + |E|² ; ranks need only the order
    cross = q @ E.T                          # (n, |E|)
    scores = (E * E).sum(1)[None, :] - 2 * cross
    true_sc = scores[np.arange(len(s)), o]
    rank = (scores < true_sc[:, None]).sum(1) + 1
    known = filter_known if filter_known is not None else ids_df
    tails: dict[tuple, np.ndarray] = {
        k: g["o"].unique()
        for k, g in known.groupby(["s", "p"], sort=False)}
    for i in range(len(s)):
        others = tails.get((s[i], p[i]))
        if others is not None and len(others) > 1:
            mask = others != o[i]
            rank[i] -= int((scores[i, others[mask]] < true_sc[i]).sum())
    out = pd.DataFrame({"p": p, "rank": rank})
    agg = out.groupby("p").agg(
        mean_rank=("rank", "mean"),
        hits_at_10=("rank", lambda r: float((r <= 10).mean())),
        n=("rank", "size")).reset_index()
    return agg
