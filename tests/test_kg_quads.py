"""Graph-granular quad-root updates: publish / replace / retract / as-of."""

import pandas as pd

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_quads import (
    publish_quads,
    quad_read,
    replace_graphs,
)


def _quads(tag, graphs=("urn:g0", "urn:g1", "urn:g2", "urn:g3")):
    rows = []
    for g in graphs:
        for i in range(3):
            rows.append((f"urn:{g[-2:]}s{i}", "urn:p", f"{tag}{i}",
                         "literal", None, None, g))
    return ray.data.from_pandas(pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "object_kind",
        "object_lang", "object_datatype", "graph"]))


def test_replace_and_retract_lifecycle(ray_session, tmp_path):
    root = str(tmp_path / "kg")
    publish_quads(root, _quads("v1"))
    # gen1: replace g1's content
    replace_graphs(root, _quads("v2", graphs=("urn:g1",)))
    # gen2: retract g2 entirely (document taken down)
    publish_quads(root, retract_graphs=["urn:g2"])

    df = quad_read(root).to_pandas()
    by_graph = df.groupby("graph")["object"].apply(set).to_dict()
    assert by_graph["urn:g0"] == {"v10", "v11", "v12"}
    assert by_graph["urn:g1"] == {"v20", "v21", "v22"}  # replaced
    assert "urn:g2" not in by_graph                      # retracted
    assert by_graph["urn:g3"] == {"v10", "v11", "v12"}

    # as-of reads
    gen0 = quad_read(root, 0).to_pandas()
    assert set(gen0["graph"]) == {"urn:g0", "urn:g1", "urn:g2", "urn:g3"}
    assert set(gen0[gen0["graph"] == "urn:g1"]["object"]) == {
        "v10", "v11", "v12"}
    gen1 = quad_read(root, 1).to_pandas()
    assert set(gen1[gen1["graph"] == "urn:g1"]["object"]) == {
        "v20", "v21", "v22"}
    assert "urn:g2" in set(gen1["graph"])  # retraction comes at gen2


def test_re_add_after_retraction(ray_session, tmp_path):
    root = str(tmp_path / "kg")
    publish_quads(root, _quads("v1", graphs=("urn:g9",)))
    publish_quads(root, retract_graphs=["urn:g9"])
    assert quad_read(root).count() == 0
    publish_quads(root, _quads("v3", graphs=("urn:g9",)))
    df = quad_read(root).to_pandas()
    assert set(df["object"]) == {"v30", "v31", "v32"}


def test_pure_union_fast_path_and_empty_root(ray_session, tmp_path):
    root = str(tmp_path / "kg")
    assert quad_read(root).count() == 0
    publish_quads(root, _quads("v1"))
    publish_quads(root, _quads("w1", graphs=("urn:g8",)))
    assert quad_read(root).count() == 15  # 12 + 3, no resolve exchange


def test_replace_infers_graphs_distributed(ray_session, tmp_path):
    root = str(tmp_path / "kg")
    publish_quads(root, _quads("v1"))
    # replace_graphs with graphs=None derives the retraction set from
    # the new quads themselves
    replace_graphs(root, _quads("n1", graphs=("urn:g0", "urn:g3")))
    df = quad_read(root).to_pandas()
    by_graph = df.groupby("graph")["object"].apply(set).to_dict()
    assert by_graph["urn:g0"] == {"n10", "n11", "n12"}
    assert by_graph["urn:g3"] == {"n10", "n11", "n12"}
    assert by_graph["urn:g1"] == {"v10", "v11", "v12"}


def test_cli_query_quad_root(ray_session, tmp_path, capsys):
    from cmc_knowledge_graph_text2ttl_ray.__main__ import main

    root = str(tmp_path / "kg")
    publish_quads(root, _quads("v1"))
    replace_graphs(root, _quads("v2", graphs=("urn:g1",)))
    main(["query", "--kg", root, "--sparql",
          "SELECT ?o WHERE { GRAPH <urn:g1> { ?s <urn:p> ?o } } ORDER BY ?o",
          "--num-cpus", "4"])
    out = capsys.readouterr().out
    assert "v20" in out and "v10" not in out  # replaced content only
