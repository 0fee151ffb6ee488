"""Unit tests for functions/url.py canonicalization rules (the oracle in
__ray_entry__ checks the pipeline end-to-end; these pin the per-rule
behavior on hand-picked tricky cases)."""

import pyarrow as pa

from cmc_knowledge_graph_text2ttl_ray.functions.url import (
    canonicalize_url,
    canonicalize_urls,
)


def test_scheme_host_lowercased():
    assert canonicalize_url("HTTP://ExAmPle.COM/Path") == \
        "http://example.com/Path"


def test_default_port_stripped_http_and_https():
    assert canonicalize_url("http://a.com:80/x") == "http://a.com/x"
    assert canonicalize_url("https://a.com:443/x") == "https://a.com/x"
    assert canonicalize_url("http://a.com:8080/x") == "http://a.com:8080/x"
    # https on port 80 is NOT a default port
    assert canonicalize_url("https://a.com:80/x") == "https://a.com:80/x"


def test_fragment_dropped():
    assert canonicalize_url("http://a.com/x#sec") == "http://a.com/x"


def test_query_sorted_and_tracking_stripped():
    assert canonicalize_url("http://a.com/x?b=2&a=1") == \
        "http://a.com/x?a=1&b=2"
    assert canonicalize_url(
        "http://a.com/x?utm_source=t&fbclid=f&gclid=g&ref=r&a=1"
    ) == "http://a.com/x?a=1"
    # all params stripped → no '?'
    assert canonicalize_url("http://a.com/x?utm_medium=m") == "http://a.com/x"


def test_equal_keys_keep_stable_order():
    assert canonicalize_url("http://a.com/x?k=2&k=1&a=0") == \
        "http://a.com/x?a=0&k=2&k=1"


def test_path_slashes():
    assert canonicalize_url("http://a.com//x///y/") == "http://a.com/x/y"
    assert canonicalize_url("http://a.com/") == "http://a.com"
    assert canonicalize_url("http://a.com") == "http://a.com"


def test_trailing_host_dot_stripped():
    assert canonicalize_url("http://a.com./x") == "http://a.com/x"


def test_whitespace_and_unparseable():
    assert canonicalize_url("  http://a.com/x  ") == "http://a.com/x"
    # urlsplit raises ValueError on bad ports → lowercased passthrough
    assert canonicalize_url("http://a.com:NOTAPORT/x") == \
        "http://a.com:notaport/x"


def test_batch_accepts_arrow_and_lists():
    urls = ["HTTP://A.com/", "http://b.com/x?b=2&a=1#f"]
    want = ["http://a.com", "http://b.com/x?a=1&b=2"]
    assert canonicalize_urls(urls) == want
    assert canonicalize_urls(pa.array(urls)) == want
    assert canonicalize_urls(pa.chunked_array([urls])) == want


def test_idempotent():
    samples = [
        "HTTP://Site3.Example.COM/path/7?utm_source=x&b=2&a=1#frag",
        "http://site3.example.com:80/path/7?b=2&a=1",
        "http://Site3.example.com//path//7/",
    ]
    canon = [canonicalize_url(u) for u in samples]
    # variants 0 and 1 collapse (same surviving query); variant 2 has none
    assert canon[0] == canon[1] == "http://site3.example.com/path/7?a=1&b=2"
    assert canon[2] == "http://site3.example.com/path/7"
    assert [canonicalize_url(c) for c in canon] == canon
