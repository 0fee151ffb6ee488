"""Entity linking: candidate generation + scoring against a knowledge base.

North-star requirement (BASELINE.json): "entity linking with
candidate-generation hash lookups and scoring". The reference's only linking
primitives are the mapping hash lookup (J1) and ``select:`` graph queries
(J2); this stage composes them into a real linker:

1. **Candidate generation** — exact hash lookup on the normalized surface
   (O(1), covers the vast majority), falling back to a character-3-gram
   inverted index that returns only candidates sharing ≥1 gram (no full
   scan of the KB).
2. **Scoring** — 3-gram Jaccard between surface and candidate label;
   best-scoring candidate wins, accepted at ``min_score``.

The KB index is built once per actor from broadcast Turtle text (stateful
actor-pool pattern); per batch the work is dict lookups + small set ops per
DISTINCT surface (deduped within batch — the combiner again).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cmc_knowledge_graph_text2ttl_ray.functions.templates import norm_text
from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

__all__ = ["EntityLinker", "link_entities", "LINKS_SCHEMA"]

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

LINKS_SCHEMA = pa.schema(
    [
        ("entity", pa.string()),     # engine entity IRI
        ("surface", pa.string()),    # the label that was linked
        ("kb_entity", pa.string()),  # linked KB IRI
        ("score", pa.float64()),     # Jaccard score (1.0 = exact)
        ("method", pa.string()),     # exact | fuzzy
    ]
)


def _norm(s: str) -> str:
    return " ".join(norm_text(s).lower().split())


def _grams(s: str, n: int = 3) -> frozenset:
    s = f"  {s} "
    return frozenset(s[i : i + n] for i in range(len(s) - n + 1))


class EntityLinker:
    """Actor-pool UDF over extraction records: label triples → link rows.

    :param kb_ttl: Turtle text of the KB (entities with rdfs:label).
    :param entity_ns: namespace of engine-minted entity IRIs to link.
    :param min_score: acceptance threshold for fuzzy candidates.
    """

    def __init__(self, kb_ttl: str, entity_ns: str, min_score: float = 0.5) -> None:
        kb = GraphIndex.from_turtle(kb_ttl)
        self._exact: dict[str, str] = {}
        self._gram_index: dict[str, set[str]] = {}
        self._labels: dict[str, tuple[str, frozenset]] = {}  # kb_iri → (label, grams)
        for s, _, label, kind, _, _ in kb.match(None, RDFS_LABEL, None):
            key = _norm(label)
            self._exact.setdefault(key, s)
            grams = _grams(key)
            self._labels[s] = (label, grams)
            for g in grams:
                self._gram_index.setdefault(g, set()).add(s)
        self._entity_ns = entity_ns
        self._min_score = min_score

    def link_surface(self, surface: str) -> tuple[str, float, str] | None:
        key = _norm(surface)
        hit = self._exact.get(key)
        if hit is not None:
            return (hit, 1.0, "exact")
        grams = _grams(key)
        candidates: set[str] = set()
        for g in grams:
            candidates |= self._gram_index.get(g, set())
        best, best_score = None, 0.0
        for kb_iri in candidates:
            _, kb_grams = self._labels[kb_iri]
            union = len(grams | kb_grams)
            score = len(grams & kb_grams) / union if union else 0.0
            if score > best_score or (score == best_score and best is not None
                                      and kb_iri < best):
                best, best_score = kb_iri, score
        if best is not None and best_score >= self._min_score:
            return (best, round(best_score, 4), "fuzzy")
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["rec"], "triple"),
            pc.and_(
                pc.equal(batch["predicate"], RDFS_LABEL),
                pc.starts_with(batch["subject"], self._entity_ns),
            ),
        )
        labels = batch.filter(mask)
        pairs = {
            (s, o)
            for s, o in zip(labels["subject"].to_pylist(), labels["object"].to_pylist())
        }
        rows = []
        for entity, surface in sorted(pairs):
            linked = self.link_surface(surface)
            if linked is None:
                continue
            kb_iri, score, method = linked
            rows.append(
                {"entity": entity, "surface": surface, "kb_entity": kb_iri,
                 "score": score, "method": method}
            )
        return pa.Table.from_pylist(rows, schema=LINKS_SCHEMA)


def link_entities(records_ds, kb_ttl: str, entity_ns: str, min_score: float = 0.5,
                  concurrency=(1, 4)):
    """Extraction-record dataset → deduped link rows (one per entity/KB pair)."""
    links = records_ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs=dict(kb_ttl=kb_ttl, entity_ns=entity_ns,
                                   min_score=min_score),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["entity", "score"], ascending=[True, False]).drop_duplicates(
            subset=["entity", "kb_entity"]
        )

    from ray.data.aggregate import Max

    # global dedup on (entity, kb_entity): keep the best score
    return (
        links.map_batches(dedup, batch_format="pandas")
        .groupby(["entity", "kb_entity"])
        .aggregate(Max("score", alias_name="score"))
    )
