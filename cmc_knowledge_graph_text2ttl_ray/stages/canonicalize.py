"""Entity canonicalization: surface-form clustering + URI minting.

The reference mints URIs deterministically from surface text via the ``:iri``
template function (kg_text_to_ttl/text_to_turtle_processor.py:2658-2659), so
"ACME Corp" and "Acme Corp" produce *different* URIs. This stage — a
first-class engine addition required by the north rule — clusters those
variants and rewrites the graph onto one canonical URI per entity.

Scale design (SURVEY §7.4):

- Cluster key = case/whitespace-normalized local name.
- The candidate table is built with a two-level aggregate:
  (1) per-batch partial counts inside ``map_batches`` (combiner — cuts the
      shuffle to distinct (key, iri) pairs per block, not per mention), then
  (2) ``groupby(key, iri).sum`` + ``groupby(key)`` arg-max. Hot entities
      (one surface on 20% of pages) are therefore already collapsed to ONE
      row per block before any shuffle — the classic salting concern applies
      to mention *rows*, which never enter the shuffle here.
- The finished mapping (distinct entities, small by construction) is
  broadcast via ``ray.put`` once and applied inside ``map_batches`` with a
  dictionary-encode + map-unique-values rewrite, so the wide triple table is
  never shuffled at all for the rewrite.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "canonicalization_mapping",
    "canonicalization_mapping_ds",
    "mapping_from_entity_records",
    "apply_canonical_mapping",
    "apply_canonical_mapping_join",
    "canonicalize_entities",
]


def _local_name(iri_arr: pa.Array, namespace: str) -> pa.Array:
    return pc.utf8_slice_codeunits(iri_arr, len(namespace), 2**31 - 1)


def _norm_key(local: pa.Array) -> pa.Array:
    # lower-case + collapse duplicate '_' (slugs already replaced spaces etc.)
    lowered = pc.utf8_lower(local)
    return pc.replace_substring_regex(lowered, "_+", "_")


def canonicalization_mapping(triples_ds, entity_ns: str):
    """Build the variant→canonical IRI mapping as a small pandas DataFrame.

    ``triples_ds`` is the extraction-record dataset; every IRI in ``subject``
    or ``object`` under ``entity_ns`` is a mention vote. Canonical member =
    highest total count, ties broken lexicographically (deterministic).
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        cols = []
        subj = batch["subject"]
        cols.append(subj.filter(pc.starts_with(subj, entity_ns)).combine_chunks())
        obj = batch["object"]
        is_ent_obj = pc.and_(
            pc.equal(batch["object_kind"], "iri"), pc.starts_with(obj, entity_ns)
        )
        cols.append(obj.filter(is_ent_obj).combine_chunks())
        iris = pa.concat_arrays([c.cast(pa.string()) for c in cols])
        if len(iris) == 0:
            return pa.table(
                {"key": pa.array([], pa.string()), "iri": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        counts = iris.value_counts()  # per-batch combiner
        variants = counts.field("values")
        key = _norm_key(_local_name(variants, entity_ns))
        return pa.table({"key": key, "iri": variants, "cnt": counts.field("counts").cast(pa.int64())})

    partial = triples_ds.map_batches(partial_counts, batch_format="pyarrow")
    # The partials are DISTINCT (key, iri) pairs per block — small by
    # construction — so the final combine is a driver-side pandas groupby
    # instead of a Ray shuffle (one less all-to-all; at extreme entity
    # cardinality switch back to partial.groupby(["key","iri"]).sum("cnt")).
    pdf = partial.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=["iri", "canonical"])
    col = "cnt"
    pdf = pdf.groupby(["key", "iri"], as_index=False)["cnt"].sum()
    # Arg-max per key: max count, then lexicographically smallest IRI.
    pdf = pdf.sort_values(["key", col, "iri"], ascending=[True, False, True])
    canon = pdf.groupby("key", sort=False).first().rename(columns={"iri": "canonical"})
    out = pdf.merge(canon["canonical"], left_on="key", right_index=True)
    return out[["iri", "canonical"]].reset_index(drop=True)


def _argmax_mapping(pdf: pd.DataFrame, entity_ns: str) -> pd.DataFrame:
    """(iri, cnt) rows → variant→canonical mapping (max count, lex-min ties)."""
    if pdf.empty:
        return pd.DataFrame(columns=["iri", "canonical"])
    import pyarrow as _pa

    iri_arr = _pa.array(pdf["iri"], _pa.string())
    pdf = pdf.assign(key=_norm_key(_local_name(iri_arr, entity_ns)).to_pylist())
    pdf = pdf.groupby(["key", "iri"], as_index=False)["cnt"].sum()
    pdf = pdf.sort_values(["key", "cnt", "iri"], ascending=[True, False, True])
    canon = pdf.groupby("key", sort=False).first().rename(columns={"iri": "canonical"})
    out = pdf.merge(canon["canonical"], left_on="key", right_index=True)
    return out[["iri", "canonical"]].reset_index(drop=True)


def mapping_from_entity_records(records_ds, entity_ns: str) -> pd.DataFrame:
    """Build the mapping from rec='entity' partial-count rows emitted by the
    extraction actors — no extra pass over the triple table."""
    def _ent(t: pa.Table) -> pa.Table:
        # A rec-partitioned checkpoint read arrives pre-filtered without the
        # rec column; mixed record streams still carry it.
        if "rec" in t.column_names:
            t = t.filter(pc.equal(t["rec"], "entity"))
        return pa.table({"iri": t["subject"], "cnt": t["no_triples"]})

    ent = records_ds.map_batches(_ent, batch_format="pyarrow")
    return _argmax_mapping(ent.to_pandas(), entity_ns)


def apply_canonical_mapping(triples_ds, mapping: dict[str, str]):
    """Rewrite subject/object through the broadcast mapping (no shuffle).

    The mapping dict is placed in the object store ONCE with ``ray.put`` and
    referenced by every task (zero-copy reads per node — the broadcast
    small-side pattern), instead of riding inside the pickled closure;
    rewrite cost is O(distinct values per block) via dictionary encoding.
    """
    if not mapping:
        return triples_ds
    import ray

    mapping_ref = ray.put(mapping)

    def rewrite(batch: pa.Table) -> pa.Table:
        m = ray.get(mapping_ref)

        def rewrite_col(col: pa.ChunkedArray) -> pa.Array:
            arr = col.combine_chunks()
            d = pc.dictionary_encode(arr)
            uniques = d.dictionary.to_pylist()
            remapped = pa.array(
                [None if u is None else m.get(u, u) for u in uniques], pa.string()
            )
            return pc.take(remapped, d.indices)

        batch = batch.set_column(
            batch.column_names.index("subject"), "subject", rewrite_col(batch["subject"])
        )
        # only IRI objects are rewritten; literals can never collide with IRIs
        obj = rewrite_col(batch["object"])
        obj = pc.if_else(pc.equal(batch["object_kind"], "iri"), obj,
                         batch["object"].combine_chunks())
        return batch.set_column(batch.column_names.index("object"), "object", obj)

    return triples_ds.map_batches(rewrite, batch_format="pyarrow")


def canonicalization_mapping_ds(records_ds, entity_ns: str,
                                num_coarse: int | None = 32):
    """Fully-DISTRIBUTED mapping build (the 100-TB path; round-1 verdict:
    the driver-side pandas arg-max caps out when distinct surface forms run
    to billions). ONE exchange: rec='entity' partial rows hash-partition by
    ``key`` alone, so each coarse task holds every (key, iri) vote of its
    keys and does the sum AND the per-key arg-max in the same vectorized
    pass — a (key, iri) groupby().aggregate here would pay Ray's
    per-distinct-group overhead (see coarse_group_reduce) and still need a
    second exchange for the arg-max. Nothing touches the driver."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    def ent_rows(t: pa.Table) -> pa.Table:
        ent = (t.filter(pc.equal(t["rec"], "entity"))
               if "rec" in t.column_names else t)
        iri = ent["subject"].combine_chunks().cast(pa.string())
        return pa.table({
            "key": _norm_key(_local_name(iri, entity_ns)),
            "iri": iri,
            "cnt": ent["no_triples"].combine_chunks().cast(pa.int64()),
        })

    def sum_argmax(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized arg-max over ALL keys of the coarse partition at once:
        # max count, lexicographically-smallest IRI tie-break
        if g.empty:
            return pd.DataFrame({"iri": pd.Series(dtype=object),
                                 "canonical": pd.Series(dtype=object)})
        g = g.groupby(["key", "iri"], as_index=False)["cnt"].sum()
        g = g.sort_values(["key", "cnt", "iri"], ascending=[True, False, True])
        canon = g.groupby("key", sort=False)["iri"].first().rename("canonical")
        out = g.merge(canon, left_on="key", right_index=True)
        out = out[out["iri"] != out["canonical"]]
        return out[["iri", "canonical"]]

    return coarse_group_reduce(
        records_ds.map_batches(ent_rows, batch_format="pyarrow"),
        ["key"], sum_argmax, num_coarse=num_coarse,
    )


def apply_canonical_mapping_join(triples_ds, mapping_ds,
                                 num_partitions: int | None = None):
    """Join-based rewrite for when the mapping itself is too large to
    broadcast: two left-outer hash joins (subject, then IRI objects) with a
    coalesce. Costs two shuffles of the triple table — use
    :func:`apply_canonical_mapping` (broadcast) whenever the mapping fits
    comfortably in a worker heap."""
    if num_partitions is None:
        from cmc_knowledge_graph_text2ttl_ray.functions.cluster import default_join_partitions

        num_partitions = default_join_partitions()

    def coalesce(col: str):
        def f(t: pa.Table) -> pa.Table:
            if "canonical" not in t.column_names:
                return t  # empty-schema block passthrough
            fixed = pc.coalesce(t["canonical"], t[col])
            if col == "object":
                fixed = pc.if_else(
                    pc.equal(t["object_kind"], "iri"), fixed, t[col]
                )
            t = t.drop_columns(["canonical"])
            return t.set_column(t.column_names.index(col), col, fixed)

        return f

    out = triples_ds.join(
        mapping_ds, join_type="left_outer", num_partitions=num_partitions,
        on=("subject",), right_on=("iri",),
    ).map_batches(coalesce("subject"), batch_format="pyarrow")
    out = out.join(
        mapping_ds, join_type="left_outer", num_partitions=num_partitions,
        on=("object",), right_on=("iri",),
    ).map_batches(coalesce("object"), batch_format="pyarrow")
    return out


def canonicalize_entities(triples_ds, entity_ns: str):
    """Full canonicalization: mapping build (small shuffle) + broadcast
    rewrite. Returns (rewritten_ds, mapping_df)."""
    mapping_df = canonicalization_mapping(triples_ds, entity_ns)
    mapping = {
        r.iri: r.canonical
        for r in mapping_df.itertuples()
        if r.iri != r.canonical
    }
    return apply_canonical_mapping(triples_ds, mapping), mapping_df
