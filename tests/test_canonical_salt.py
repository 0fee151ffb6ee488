"""Skew-aware salting of hot entities in join-mode canonicalization
(north-rule case: one entity on a large share of pages must not put that
share of the triple table into one join partition)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cmc_knowledge_graph_text2ttl_ray.stages.canonicalize import (
    apply_canonical_mapping_join,
    detect_entity_salt,
)

NS = "http://example.org/entity/"


def _triples(n_hot=3000, n_cold=500):
    rng = np.random.default_rng(5)
    subj = ([f"{NS}Hot_Corp"] * n_hot
            + [f"{NS}c{i}" for i in rng.integers(0, 200, n_cold)])
    obj = ([f"{NS}hot_corp"] * (n_hot // 2)            # variant, rewritten
           + ["\"lit\""] * (n_hot - n_hot // 2)        # literal, untouched
           + [f"{NS}o{i}" for i in rng.integers(0, 200, n_cold)])
    kind = (["iri"] * (n_hot // 2) + ["literal"] * (n_hot - n_hot // 2)
            + ["iri"] * n_cold)
    return pd.DataFrame({
        "subject": subj,
        "predicate": ["http://example.org/p"] * (n_hot + n_cold),
        "object": obj,
        "object_kind": kind,
    })


def _mapping():
    return pd.DataFrame({
        "iri": [f"{NS}hot_corp", f"{NS}c7"],
        "canonical": [f"{NS}Hot_Corp", f"{NS}c7_canon"],
    })


def test_salted_join_parity(ray_session):
    """salt=4 must produce byte-identical rows to the unsalted join and
    rewrite both hot-variant objects and cold subjects."""
    tdf = _triples()
    cols = ["subject", "predicate", "object", "object_kind"]

    def run(salt):
        out = apply_canonical_mapping_join(
            ray.data.from_pandas(tdf).repartition(6),
            ray.data.from_pandas(_mapping()),
            num_partitions=4, salt=salt)
        return out.to_pandas()[cols].sort_values(cols).reset_index(drop=True)

    plain, salted = run(1), run(4)
    pd.testing.assert_frame_equal(salted, plain)
    # the hot variant object really was rewritten to the canonical
    assert (salted["object"] == f"{NS}hot_corp").sum() == 0
    assert (salted["object"] == f"{NS}Hot_Corp").sum() > 0
    # cold mapping applied on subjects, literals untouched
    assert (salted["subject"] == f"{NS}c7").sum() == 0
    assert (salted["object"] == "\"lit\"").sum() > 0


def test_detect_entity_salt(ray_session):
    """A guaranteed-hot key above the threshold yields S >= 2; a uniform
    key distribution yields 1 (no salting)."""
    tdf = _triples()
    ds = ray.data.from_pandas(tdf).repartition(4)
    s = detect_entity_salt(ds, hot_min_rows=1000, rows_per_salted_part=500)
    assert s >= 2
    assert detect_entity_salt(ds, hot_min_rows=10**9) == 1
    uniform = pd.DataFrame({
        "subject": [f"{NS}u{i}" for i in range(2000)],
        "predicate": ["p"] * 2000,
        "object": ["\"x\""] * 2000,
        "object_kind": ["literal"] * 2000,
    })
    assert detect_entity_salt(ray.data.from_pandas(uniform),
                              hot_min_rows=1000) == 1
