"""Distributed BPE training: histogram exactness, merge-rule semantics,
encoder consistency, block invariance."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.tokenizer import (
    bpe_token_counts,
    train_bpe,
    word_histogram,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpecorpus")
    texts = [
        "aaab aaab aaab",          # 'aa' dominant pair
        "aaab abab",
        "xy xy xy xy xy xy",       # 'xy</w>' family
        "zq",                      # singleton word — never merges alone
        "   ",                     # whitespace-only doc
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet",
    )
    return str(d)


def test_word_histogram_exact(ray_session, corpus_dir):
    h = word_histogram(corpus_dir, max_words=100)
    got = dict(zip(h["word"], h["cnt"]))
    assert got == {"xy": 6, "aaab": 4, "abab": 1, "zq": 1}
    # count-desc, word-asc ordering
    assert h["word"].tolist()[:2] == ["xy", "aaab"]


def test_merge_rules_match_hand_computation(ray_session, corpus_dir):
    m = train_bpe(corpus_dir, num_merges=3, max_words=100)
    # pair counts over {xy:6, aaab:4, abab:1}:
    #   ('a','a') = 2 per 'aaab' × 4 = 8 → rank0
    #   after merging: 'aaab'=[aa,a,b,</w>] so ('a','b') = 4+2 = 6,
    #   tying ('x','y')=6 and ('y','</w>')=6 → lexicographic min
    #   ('a','b') → rank1; then ('x','y') < ('y','</w>') → rank2
    rows = list(zip(m["rank"], m["left"], m["right"], m["freq"]))
    assert rows[0] == (0, "a", "a", 8)
    assert rows[1] == (1, "a", "b", 6)
    assert rows[2] == (2, "x", "y", 6)


def test_encoder_counts(ray_session, corpus_dir):
    tc = bpe_token_counts(corpus_dir, num_merges=3, max_words=100) \
        .to_pandas().sort_values("doc_id")
    got = dict(zip(tc["doc_id"], tc["n_bpe_tokens"]))
    # after merges [aa, ab, xy]: 'aaab' → aa,ab,</w> = 3 tokens;
    # 'abab' → ab,ab,</w> = 3; 'xy' → xy,</w> = 2; 'zq' → z,q,</w> = 3
    assert got == {0: 9, 1: 6, 2: 12, 3: 3, 4: 0}


def test_deterministic_and_block_invariant(ray_session, corpus_dir,
                                           tmp_path):
    a = train_bpe(corpus_dir, num_merges=5, max_words=100)
    b = train_bpe(corpus_dir, num_merges=5, max_words=100)
    pd.testing.assert_frame_equal(a, b)
    # same corpus, one file per doc
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
    c = train_bpe(str(ddir), num_merges=5, max_words=100)
    pd.testing.assert_frame_equal(a, c)


def test_merge_loop_matches_naive_reference():
    """Differential test: the incremental pair-count maintenance must give
    exactly the merges a naive recount-every-iteration BPE produces."""
    import random

    from cmc_knowledge_graph_text2ttl_ray.pipelines.tokenizer import (
        END_OF_WORD,
        _merge_loop,
    )

    def naive_bpe(hist, num_merges):
        words = {i: tuple(w) + (END_OF_WORD,)
                 for i, w in enumerate(hist["word"])}
        cnts = dict(enumerate(hist["cnt"]))
        merges = []
        for rank in range(num_merges):
            pc_ = {}
            for i, syms in words.items():
                for pair in zip(syms, syms[1:]):
                    pc_[pair] = pc_.get(pair, 0) + cnts[i]
            if not pc_:
                break
            best = min(pc_, key=lambda p: (-pc_[p], p))
            if pc_[best] < 2:
                break
            merges.append((rank, best[0], best[1], pc_[best]))
            merged = best[0] + best[1]
            for i, syms in words.items():
                out, j = [], 0
                while j < len(syms):
                    if (j + 1 < len(syms) and syms[j] == best[0]
                            and syms[j + 1] == best[1]):
                        out.append(merged)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                words[i] = tuple(out)
        return merges

    rng = random.Random(17)
    alphabet = "abcde"
    for trial in range(8):
        n_words = rng.randint(3, 25)
        hist = pd.DataFrame({
            "word": ["".join(rng.choices(alphabet, k=rng.randint(1, 7)))
                     for _ in range(n_words)],
            "cnt": [rng.randint(1, 50) for _ in range(n_words)],
        }).drop_duplicates("word").reset_index(drop=True)
        got = _merge_loop(hist, num_merges=12)
        exp = naive_bpe(hist, num_merges=12)
        assert list(map(tuple, got.itertuples(index=False))) == exp, \
            (trial, hist.to_dict("records"))


# --------------------------------------------------------------------------
# unigram LM tokenizer
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["ababab ababab cd", "ababab cd cd", "ababab ababab ababab"]
    d = tmp_path_factory.mktemp("unidocs")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(d / "documents.parquet"))
    return str(d)


def test_unigram_learns_repeated_piece(ray_session, uni_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.tokenizer import (
        _viterbi,
        train_unigram,
    )

    v = train_unigram(uni_dir, vocab_size=8, max_words=100)
    logp = dict(zip(v["piece"], v["logp"]))
    # every corpus char survives pruning
    assert {"a", "b", "c", "d"} <= set(logp)
    # the dominant word segments into few pieces, not characters
    pieces, _ = _viterbi("ababab", logp)
    assert len(pieces) <= 3
    assert all(p in logp for p in pieces)


def test_unigram_block_invariant_and_deterministic(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.tokenizer import (
        train_unigram,
    )

    sf = "/root/testdata/sf0.001"
    a = train_unigram(sf, vocab_size=150, max_words=2000)
    b = train_unigram(sf, vocab_size=150, max_words=2000)
    assert a.equals(b)
    assert len(a) == 150


def test_unigram_token_counts_match_driver_viterbi(ray_session):
    import duckdb

    from cmc_knowledge_graph_text2ttl_ray.pipelines.tokenizer import (
        _pretokenize,
        _viterbi,
        train_unigram,
        unigram_token_counts,
    )

    sf = "/root/testdata/sf0.001"
    got = unigram_token_counts(sf, vocab_size=150, max_words=2000) \
        .to_pandas().set_index("doc_id")["n_unigram_tokens"].to_dict()
    v = train_unigram(sf, vocab_size=150, max_words=2000)
    logp = dict(zip(v["piece"], v["logp"]))
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
    import pyarrow as pa
    for doc_id, text in rows[:50]:
        toks = _pretokenize(pa.chunked_array([pa.array([text])]))
        words = toks.to_pylist()[0]
        expect = sum(len(_viterbi(w, logp)[0]) for w in words)
        assert got[doc_id] == expect


def test_encoders_handle_trailing_empty_docs(ray_session, corpus_dir,
                                             uni_dir):
    """Round-5 advisor fix: a batch whose LAST doc(s) are empty used to
    truncate the preceding non-empty doc's token count (clamped reduceat
    indices). The prefix-sum-difference form is exact."""
    import ray as _ray

    from cmc_knowledge_graph_text2ttl_ray.pipelines.tokenizer import (
        BpeEncoder,
        UnigramEncoder,
        train_bpe,
        train_unigram,
    )

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["aaab aaab", "", "xy zq", ""], pa.string()),
    })

    enc = BpeEncoder(_ray.put(train_bpe(corpus_dir, 3, 100)))
    got = dict(zip(*enc(batch).to_pydict().values()))
    # merges [aa, ab, xy]: 'aaab'→3 tokens ×2; 'xy'→2; 'zq'→3
    assert got == {0: 6, 1: 0, 2: 5, 3: 0}

    uenc = UnigramEncoder(_ray.put(train_unigram(uni_dir, 8, 100)))
    ugot = dict(zip(*uenc(batch).to_pydict().values()))
    assert ugot[1] == 0 and ugot[3] == 0
    # the non-empty docs keep their full (independent) counts
    solo = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["aaab aaab"], pa.string())})
    assert ugot[0] == uenc(solo).to_pydict()["n_unigram_tokens"][0]


def test_train_unigram_rejects_unreachable_vocab_size(ray_session, uni_dir):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.tokenizer import (
        train_unigram,
    )

    # corpus has 4 distinct chars (a b c d); target below that can never
    # be reached (single chars are unprunable) — must raise, not spin
    with pytest.raises(ValueError, match="single characters"):
        train_unigram(uni_dir, vocab_size=3, max_words=100)
