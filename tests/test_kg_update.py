"""SPARQL 1.1 Update over the generation KG (pipelines/kg_update.py).

Oracle strategy: every update form is checked against plain Python set
algebra over the full-identity triple tuples — INSERT adds to the set,
DELETE subtracts, the modify form does both with DELETE-before-INSERT
semantics — plus the structural LSM contracts (append-only fast path is
union-identical, legacy readers see a stale superset, compaction folds
tombstones away, as-of time travel is removal-aware).
"""

import os

import pandas as pd
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_incremental import (
    compact_generations,
    kg_as_of,
    list_generations,
)
from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_update import (
    REMOVALS_DIR,
    kg_read,
    parse_triple_block,
    sparql_update,
)
from cmc_knowledge_graph_text2ttl_ray.sources.ttl import ttl_dataset

IDENTITY = ["subject", "predicate", "object", "object_kind",
            "object_lang", "object_datatype"]

PFX = "PREFIX ex: <http://example.org/>\n" \
      "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"


def _tset(ds):
    df = ds.to_pandas()
    if df.empty:
        return set()
    return {tuple(None if pd.isna(v) else v for v in row)
            for row in df[IDENTITY].itertuples(index=False)}


EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"

T_NAME_A = (EX + "a", EX + "name", "Alice", "literal", None, None)
T_NAME_B = (EX + "b", EX + "name", "Bob", "literal", None, None)
T_AGE_A = (EX + "a", EX + "age", "42", "literal", None, XSD + "integer")
T_LANG_A = (EX + "a", EX + "label", "Alice", "literal", "en", None)
T_TYPE_A = (EX + "a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            EX + "Person", "iri", None, None)

INSERT_SEED = PFX + """
INSERT DATA {
  ex:a ex:name "Alice" .
  ex:b ex:name "Bob" .
  ex:a ex:age 42 .
  ex:a ex:label "Alice"@en .
  ex:a a ex:Person .
}"""

SEED_SET = {T_NAME_A, T_NAME_B, T_AGE_A, T_LANG_A, T_TYPE_A}


@pytest.fixture()
def root(ray_session, tmp_path):
    r = str(tmp_path / "kg")
    pub = sparql_update(r, INSERT_SEED)
    assert pub["op"] == "insert_data"
    assert pub["generation"] == "gen-00000"
    assert pub["n_added"] == len(SEED_SET)
    return r


def test_insert_data_full_identity(root):
    assert _tset(kg_read(root)) == SEED_SET


def test_reinsert_is_a_read_noop(root):
    pub = sparql_update(root, PFX + 'INSERT DATA { ex:a ex:name "Alice" }')
    assert pub["generation"] == "gen-00001"
    assert _tset(kg_read(root)) == SEED_SET


def test_append_only_fast_path_matches_ttl_dataset(root):
    # no removals anywhere -> kg_read is the pure union path
    assert not any(os.path.isdir(os.path.join(root, g, REMOVALS_DIR))
                   for g in list_generations(root))
    assert _tset(kg_read(root)) == _tset(ttl_dataset(root))


def test_delete_data_exact(root):
    pub = sparql_update(root, PFX + 'DELETE DATA { ex:b ex:name "Bob" }')
    assert pub["op"] == "delete_data"
    assert pub["n_removed"] == 1
    assert _tset(kg_read(root)) == SEED_SET - {T_NAME_B}
    # legacy extension-filtered readers skip parquet tombstones and see
    # a stale SUPERSET, never garbage
    assert _tset(ttl_dataset(root)) == SEED_SET


def test_delete_data_absent_writes_no_tombstone(root):
    pub = sparql_update(root, PFX + 'DELETE DATA { ex:z ex:name "Zed" }')
    assert pub["n_removed"] == 0
    assert _tset(kg_read(root)) == SEED_SET


def test_delete_matches_stored_typing_lexically(root):
    # the update spells the object as a plain literal; the stored row is
    # "42"^^xsd:integer — lexical (s,p,o) match tombstones the stored
    # identity anyway
    pub = sparql_update(root, PFX + 'DELETE DATA { ex:a ex:age "42" }')
    assert pub["n_removed"] == 1
    assert _tset(kg_read(root)) == SEED_SET - {T_AGE_A}


def test_delete_where_pattern(root):
    pub = sparql_update(root, PFX + "DELETE WHERE { ?s ex:name ?o }")
    assert pub["op"] == "delete_where"
    assert pub["n_removed"] == 2
    assert _tset(kg_read(root)) == SEED_SET - {T_NAME_A, T_NAME_B}


def test_modify_rename_predicate(root):
    pub = sparql_update(root, PFX + """
        DELETE { ?s ex:name ?o }
        INSERT { ?s ex:fullName ?o }
        WHERE  { ?s ex:name ?o }""")
    assert pub["op"] == "modify"
    assert pub["n_removed"] == 2
    assert pub["n_added"] == 2
    want = (SEED_SET - {T_NAME_A, T_NAME_B}) | {
        (EX + "a", EX + "fullName", "Alice", "literal", None, None),
        (EX + "b", EX + "fullName", "Bob", "literal", None, None),
    }
    assert _tset(kg_read(root)) == want


def test_modify_insert_only_with_where(root):
    pub = sparql_update(root, PFX + """
        INSERT { ?s ex:greeting "hi" }
        WHERE  { ?s ex:name ?o }""")
    assert pub["n_removed"] == 0
    assert pub["n_added"] == 2
    want = SEED_SET | {
        (EX + "a", EX + "greeting", "hi", "literal", None, None),
        (EX + "b", EX + "greeting", "hi", "literal", None, None),
    }
    assert _tset(kg_read(root)) == want


def test_insert_preserves_lang_tag_typing(root):
    sparql_update(root, PFX + """
        INSERT { ?s ex:newLabel ?o }
        WHERE  { ?s ex:label ?o }""")
    want = SEED_SET | {
        (EX + "a", EX + "newLabel", "Alice", "literal", "en", None)}
    assert _tset(kg_read(root)) == want


def test_insert_preserves_datatype_typing(root):
    sparql_update(root, PFX + """
        INSERT { ?s ex:years ?v }
        WHERE  { ?s ex:age ?v }""")
    want = SEED_SET | {
        (EX + "a", EX + "years", "42", "literal", None,
         XSD + "integer")}
    assert _tset(kg_read(root)) == want


def test_insert_subject_bound_var_is_iri(root):
    sparql_update(root, PFX + """
        INSERT { ex:root ex:member ?s }
        WHERE  { ?s ex:name ?o }""")
    want = SEED_SET | {
        (EX + "root", EX + "member", EX + "a", "iri", None, None),
        (EX + "root", EX + "member", EX + "b", "iri", None, None)}
    assert _tset(kg_read(root)) == want


def test_insert_object_bound_iri_var_via_lookup(root):
    sparql_update(root, PFX + """
        INSERT { ?s ex:classifiedAs ?t }
        WHERE  { ?s a ?t }""")
    want = SEED_SET | {
        (EX + "a", EX + "classifiedAs", EX + "Person", "iri",
         None, None)}
    assert _tset(kg_read(root)) == want


def test_delete_insert_same_triple_survives(root):
    # SPARQL runs DELETE before INSERT inside one operation: a triple
    # both deleted and re-inserted by the same update survives
    sparql_update(root, PFX + """
        DELETE { ?s ex:name ?o }
        INSERT { ?s ex:name ?o }
        WHERE  { ?s ex:name ?o }""")
    assert _tset(kg_read(root)) == SEED_SET


def test_as_of_is_removal_aware(root):
    sparql_update(root, PFX + 'DELETE DATA { ex:b ex:name "Bob" }')
    sparql_update(root, PFX + 'INSERT DATA { ex:c ex:name "Cara" }')
    t_c = (EX + "c", EX + "name", "Cara", "literal", None, None)
    assert _tset(kg_as_of(root, 0)) == SEED_SET
    assert _tset(kg_as_of(root, 1)) == SEED_SET - {T_NAME_B}
    assert _tset(kg_as_of(root, "gen-00002")) == \
        (SEED_SET - {T_NAME_B}) | {t_c}


def test_delete_then_later_reinsert_comes_back(root):
    sparql_update(root, PFX + 'DELETE DATA { ex:b ex:name "Bob" }')
    sparql_update(root, PFX + 'INSERT DATA { ex:b ex:name "Bob" }')
    assert _tset(kg_read(root)) == SEED_SET


def test_compaction_folds_tombstones_away(root, tmp_path):
    sparql_update(root, PFX + 'DELETE DATA { ex:b ex:name "Bob" }')
    want = SEED_SET - {T_NAME_B}
    out_root = str(tmp_path / "kg.compacted")
    pub = compact_generations(root, out_root)
    assert pub["out_root"] == out_root
    # compacted root is pure adds again: one generation, no removals,
    # readable by the plain extension-filtered TTL reader
    assert list_generations(out_root) == ["gen-00000"]
    assert not os.path.isdir(
        os.path.join(out_root, "gen-00000", REMOVALS_DIR))
    assert _tset(ttl_dataset(out_root)) == want
    assert _tset(kg_read(out_root)) == want


def test_unbound_template_variable_rejected(root):
    with pytest.raises(ValueError, match="not bound"):
        sparql_update(root, PFX + """
            INSERT { ?s ex:x ?nope } WHERE { ?s ex:name ?o }""")


def test_vars_rejected_in_data_blocks(root):
    with pytest.raises(ValueError, match="DATA block"):
        sparql_update(root, PFX + "INSERT DATA { ?s ex:name ?o }")


def test_parse_triple_block_typed_terms():
    pfx = {"ex": EX, "xsd": XSD}
    tmpls = parse_triple_block(
        'ex:a ex:p "v"@en . ex:a ex:q "3"^^xsd:byte . '
        "ex:a ex:r 2.5 . ex:a a ex:T", pfx)
    assert tmpls[0][3] == {"object_kind": "literal", "object_lang": "en"}
    assert tmpls[1][3] == {"object_kind": "literal",
                           "object_datatype": XSD + "byte"}
    assert tmpls[2] == (EX + "a", EX + "r", "2.5",
                        {"object_kind": "literal",
                         "object_datatype": XSD + "decimal"})
    assert tmpls[3][1] == \
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert tmpls[3][3] == {"object_kind": "iri"}


def test_literal_subject_rejected():
    with pytest.raises(ValueError, match="subject/predicate"):
        parse_triple_block('"lit" ex:p ex:o', {"ex": EX})


def test_spill_path_equivalence(ray_session, tmp_path):
    """spill_rows=0 forces the scratch-parquet path for the resolved KG
    AND the solution table; the published generation and the final KG
    must be byte-equal in set terms to the pinned path, incl. the
    typed-insert lookup (which consumes the spilled KG a second time)."""
    results = {}
    for mode, spill_rows in (("pin", 5_000_000), ("spill", 0)):
        r = str(tmp_path / f"kg_{mode}")
        sparql_update(r, INSERT_SEED)
        pub = sparql_update(r, PFX + """
            DELETE { ?s ex:name ?o }
            INSERT { ?s ex:fullName ?o . ?s ex:knows ex:a }
            WHERE  { ?s ex:name ?o }""", spill_rows=spill_rows)
        results[mode] = (pub["n_removed"], pub["n_added"],
                         _tset(kg_read(r)))
    assert results["pin"] == results["spill"]
    assert results["pin"][0] == 2


def test_spill_scratch_cleaned_up(ray_session, tmp_path):
    import glob

    before = set(glob.glob("/tmp/graft_sparql_update_*"))
    r = str(tmp_path / "kg")
    sparql_update(r, INSERT_SEED)
    sparql_update(r, PFX + "DELETE WHERE { ex:a ex:name ?o }",
                  spill_rows=0)
    assert set(glob.glob("/tmp/graft_sparql_update_*")) == before


def test_sequence_operations_lexical_order(ray_session, tmp_path):
    """A ';'-separated request applies in lexical order (SPARQL 1.1 §3):
    the DELETE WHERE sees the triples the preceding INSERT DATA added.
    Braces/quotes/IRIs shield their own ';' from the splitter."""
    r = str(tmp_path / "kg")
    pub = sparql_update(r, PFX + """
        INSERT DATA { ex:a ex:name "semi;colon" . ex:b ex:name "Bob" } ;
        INSERT DATA { ex:a ex:age 42 } ;
        DELETE WHERE { ex:b ex:name ?o }
    """)
    assert pub["op"] == "sequence"
    assert len(pub["operations"]) == 3
    assert [o["op"] for o in pub["operations"]] == [
        "insert_data", "insert_data", "delete_where"]
    assert pub["n_added"] == 3
    assert pub["n_removed"] == 1
    assert pub["generation"] == "gen-00002"
    assert _tset(kg_read(r)) == {
        (EX + "a", EX + "name", "semi;colon", "literal", None, None),
        (EX + "a", EX + "age", "42", "literal", None,
         XSD + "integer"),
    }


def test_cli_update_and_removal_aware_query(ray_session, tmp_path):
    """CLI round trip: update (sequence) publishes generations; the
    query subcommand auto-detects the _removals shards and resolves
    tombstones (a plain TTL union would still show the deleted row)."""
    import subprocess
    import sys

    r = str(tmp_path / "kg")
    upd = (PFX.replace("\n", " ") +
           ' INSERT DATA { ex:a ex:name "Alice" . ex:b ex:name "Bob" } ; '
           ' DELETE WHERE { ex:b ex:name ?o } ')
    proc = subprocess.run(
        [sys.executable, "-m", "cmc_knowledge_graph_text2ttl_ray",
         "update", "--kg", r, "--sparql", upd,
         "--num-cpus", "4", "--num-buckets", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import json as _json

    summary = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["op"] == "sequence"
    assert summary["n_operations"] == 2
    assert summary["n_removed"] == 1
    proc = subprocess.run(
        [sys.executable, "-m", "cmc_knowledge_graph_text2ttl_ray",
         "query", "--kg", r, "--sparql",
         "SELECT ?s ?o WHERE { ?s <http://example.org/name> ?o }",
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert lines[0] == "s,o"
    assert lines[1:] == ["http://example.org/a,Alice"]
