"""Benchmark decontamination: passage containment + n-gram overlap."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def contam_dir(tmp_path_factory):
    """Corpus where doc 0 (and 97, 194) are 'benchmark' docs; their leading
    passage is planted verbatim into two other docs."""
    rng = np.random.RandomState(12)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    texts = {}
    for i in range(200):
        texts[i] = " ".join(rng.choice(words, size=40))
    # make the benchmark docs long + distinctive
    texts[0] = ("the secret benchmark passage number zero goes here with "
                "enough length to pass the sixty four char floor " * 2)
    texts[97] = ("another held out evaluation question appears in this "
                 "document body and is quite long indeed " * 2)
    passage0 = texts[0][:64]
    # plant contamination
    texts[5] = texts[5] + " " + passage0 + " trailing words"
    texts[123] = passage0  # the whole doc IS the passage
    d = tmp_path_factory.mktemp("contam")
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[k] for k in sorted(texts)])}),
        str(d / "documents.parquet"))
    return str(d), passage0


def test_contains_benchmark_flags_planted(ray_session, contam_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.decontam import (
        contains_benchmark,
    )

    sf, _ = contam_dir
    out = contains_benchmark(sf).to_pandas().set_index("doc_id")
    assert bool(out.loc[5, "contaminated"])
    assert bool(out.loc[123, "contaminated"])
    # bench docs contain their own passage
    assert bool(out.loc[0, "contaminated"])
    assert bool(out.loc[97, "contaminated"])
    # a random doc is clean
    assert not bool(out.loc[50, "contaminated"])


def test_contains_matches_duckdb_oracle(ray_session, contam_dir):
    import duckdb
    import __ray_entry__ as E

    sf, _ = contam_dir
    got = E.queries()["docs_decontaminated"](sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()["docs_decontaminated"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def _brute_overlap(texts, passages, n):
    bench = set()
    for p in passages:
        toks = p.split()
        bench.update(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))
    out = []
    for t in texts:
        toks = t.split()
        out.append(sum(1 for i in range(max(0, len(toks) - n + 1))
                       if tuple(toks[i:i + n]) in bench))
    return out


def test_ngram_overlap_matches_bruteforce(ray_session, contam_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.decontam import (
        benchmark_passages,
        ngram_overlap,
    )

    sf, _ = contam_dir
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    passages = benchmark_passages(sf)
    want = _brute_overlap(docs.sort_values("doc_id")["text"], passages, 8)
    got = ngram_overlap(sf, n=8).to_pandas().sort_values("doc_id")
    assert got["n_hits"].tolist() == want
    assert (got.set_index("doc_id").loc[123, "n_hits"] > 0) == (
        len(passages[0].split()) >= 8 if passages else False)


def test_gram_hashes_never_cross_doc_boundary():
    from cmc_knowledge_graph_text2ttl_ray.pipelines.decontam import _gram_hashes

    # "a b c" | "c d e": no 3-gram spans the boundary
    grams, idx = _gram_hashes(["a b c x", "x a b c"], 3)
    # doc0 windows: (a b c), (b c x); doc1: (x a b), (a b c)
    assert len(grams) == 4
    assert idx.tolist() == [0, 0, 1, 1]
    # identical gram content hashes identically across docs
    assert grams[0] == grams[3]
    # empty / short docs contribute nothing
    g2, i2 = _gram_hashes(["", "one two", "a b c"], 3)
    assert len(g2) == 1 and i2.tolist() == [2]


def test_ngram_overlap_bloom_equivalence(ray_session, contam_dir):
    """The Bloom-gated plan returns EXACTLY the exact plan's counts — at a
    well-sized filter and at a deliberately saturated 2^10-bit one where
    false positives are guaranteed (FPs change work, never results)."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.decontam import (
        ngram_overlap,
        ngram_overlap_bloom,
    )

    sf, _ = contam_dir
    want = (ngram_overlap(sf, n=8).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    for n_bits in (None, 1 << 10):
        got = (ngram_overlap_bloom(sf, n=8, n_bits=n_bits).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want), f"mismatch at n_bits={n_bits}"
    assert want["n_hits"].sum() > 0
