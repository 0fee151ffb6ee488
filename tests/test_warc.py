"""WARC source: round-trip, gzip layouts, record filtering, pipeline e2e."""

import gzip

import pytest

from cmc_knowledge_graph_text2ttl_ray.sources.pages import synthesize_pages_table
from cmc_knowledge_graph_text2ttl_ray.sources.warc import (
    WarcParseError,
    parse_warc_bytes,
    warc_dataset,
    write_warc,
)


@pytest.fixture(scope="module")
def warc_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    pages = synthesize_pages_table(list(range(40))).to_pylist()
    path = str(d / "shard-00000.warc.gz")
    n = write_warc(pages, path)
    assert n == 40
    return path, pages


def test_round_trip(warc_file):
    path, pages = warc_file
    rows = parse_warc_bytes(open(path, "rb").read())
    assert len(rows) == len(pages)
    for got, want in zip(rows, pages):
        assert got["url"] == want["url"]
        assert got["html"] == want["html"]
        # text re-extracted from html must equal the synthesized text
        assert got["text"] == want["text"]


def test_uncompressed_and_skipped_records(tmp_path):
    pages = synthesize_pages_table([0, 1]).to_pylist()
    path = str(tmp_path / "x.warc")
    write_warc(pages, path, compress=False)
    raw = open(path, "rb").read()
    # prepend a warcinfo record — must be skipped, not returned
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"info\r\n\r\n")
    rows = parse_warc_bytes(info + raw)
    assert [r["url"] for r in rows] == [p["url"] for p in pages]


def test_garbage_raises():
    with pytest.raises(WarcParseError):
        parse_warc_bytes(b"NOT A WARC RECORD\r\n\r\n")


def test_dataset_and_kg_pipeline(ray_session, warc_file, tmp_path):
    path, pages = warc_file
    ds = warc_dataset(path)
    assert ds.count() == len(pages)
    # the WARC corpus drops straight into the flagship pipeline
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg import run_kg_pipeline

    out = run_kg_pipeline(ds, out_dir=str(tmp_path / "kg"), resume=False)
    n_triples = sum(b["n_triples"]
                    for b in out["manifest"]["buckets"].values())
    assert n_triples > 0
