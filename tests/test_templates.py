"""Template expansion semantics (reference text_to_turtle_processor.py:2599-2669)."""

import re

import pytest

from cmc_knowledge_graph_text2ttl_ray.functions.templates import (
    TemplateError,
    expand_template,
    iri_slug,
    norm_text,
)


def m(pattern, text):
    return re.search(pattern, text)


def test_variable_reference():
    assert expand_template("x=@{a}", {"a": "1"}, {}) == "x=1"


def test_missing_variable_expands_to_None_string():
    # Reference quirk: str(dict.get(...)) makes missing vars "None".
    assert expand_template("@{nope}", {}, {}) == "None"


def test_named_match_group():
    mm = m(r"(\w+)=(\w+)", "k=v")
    assert expand_template("@{kv.1}/@{kv.2}", {}, {"kv": mm}) == "k/v"


def test_named_match_group_by_name():
    mm = m(r"(?P<key>\w+)=(?P<val>\w+)", "k=v")
    assert expand_template("@{kv.key}:@{kv.val}", {}, {"kv": mm}) == "k:v"


def test_missing_match_raises():
    with pytest.raises(TemplateError):
        expand_template("@{gone.1}", {}, {})


def test_optional_missing_match_is_empty():
    assert expand_template("[@{?gone.1}]", {}, {}) == "[]"


def test_nested_reference():
    mm = m(r"(\w+)", "humid")
    assert (
        expand_template("@{material-@{row}.1}", {"row": 3}, {"material-3": mm})
        == "humid"
    )


def test_trim_iri_norm_functions():
    mm = re.search(r"(.*)", "  Hello &amp; World\n\t x ", re.DOTALL)
    assert expand_template("@{x.1:trim}", {}, {"x": mm}) == "Hello &amp; World\n\t x"
    assert expand_template("@{x.1:iri}", {}, {"x": mm}) == "Hello__amp__World___x"
    assert expand_template("@{x.1:norm}", {}, {"x": mm}) == "Hello & World  x"


def test_iri_slug_exact():
    assert iri_slug("  Acme Corp. (US) ") == "Acme_Corp___US_"


def test_norm_text_unescape():
    assert norm_text(" a&lt;b\nc ") == "a<b c"


def test_empty_group_inserts_empty():
    mm = m(r"(a)(b)?", "a")
    # group 2 is None → "ext or ''"
    assert expand_template("[@{x.2}]", {}, {"x": mm}) == "[]"


def test_non_string_passthrough():
    assert expand_template(5, {}, {}) == 5
    assert expand_template(None, {}, {}) is None
