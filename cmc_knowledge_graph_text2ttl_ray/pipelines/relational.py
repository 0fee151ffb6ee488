"""Relational analytics pipelines over the TPC-H-ish test tables.

These exist to prove the engine's generic groupby / join / sort / top-k
capabilities in Ray Data form (the reference engine has no relational
operators; SURVEY.md §2.4-2.6 maps its lookup/aggregation patterns here).
Every query has a DuckDB oracle in ``__ray_entry__.oracle_sql`` — column
names and rounding match exactly.

Scale notes baked into each query:
- columns are pruned at ``read_parquet``;
- per-block partial aggregation happens inside Ray's native hash aggregate;
- dimension tables (region/nation/supplier/customer) are BROADCAST into
  ``map_batches`` lookups instead of shuffling the fact table
  (SURVEY §7.4 — broadcast-small-side join); the fact table is never
  materialized on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

__all__ = [
    "q1_pricing_summary",
    "q6_revenue_forecast",
    "q3_top_orders",
    "q5_nation_revenue",
    "orders_per_segment",
    "top_parts",
    "events_daily",
    "events_user_stats",
]


def _read(sf_dir: str, table: str, columns=None):
    # metadata-sized block count: dimension tables (region=5 rows) no
    # longer split into ~2xCPU sub-millisecond blocks that every join
    # and all-to-all downstream pays scheduling for
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        sized_read_parquet,
    )

    return sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round2(col):
    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import pc_round

    return pc_round(col, 2)


def _empty_df(fields: dict[str, "pa.DataType"]) -> pd.DataFrame:
    """Typed empty result frame. Ray 2.49's hash join raises ArrowInvalid
    when a side has zero rows overall (each empty partition builds a
    0-column table), so pipelines whose join input can legitimately be
    empty at small scale materialize the (post-aggregate, small) side,
    check ``count()``, and short-circuit to this instead of joining."""
    return pa.table({k: pa.array([], t) for k, t in fields.items()}).to_pandas()


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: big scan + 4-group aggregate with computed column."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    from ray.data.aggregate import Count, Mean, Sum

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc"):
            t = t.set_column(t.column_names.index(c), c, _round2(t[c]))
        return t

    return out.map_batches(fin, batch_format="pyarrow")


def q6_revenue_forecast(sf_dir: str):
    """TPC-H Q6 shape: pure filtered-scan aggregate (no groupby) — predicate
    pushdown + per-block partial sums, single tiny result row."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1994-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(mask)
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0
        return pa.table({"revenue": pa.array([rev], pa.float64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(["revenue", "n"])
    import pandas as pd_

    return pd_.DataFrame({
        "revenue": [round(agg["sum(revenue)"], 2) if isinstance(agg, dict) else round(agg, 2)],
        "n": [int(agg["sum(n)"]) if isinstance(agg, dict) else 0],
    })


def q3_top_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10,
                  broadcast_threshold: int = 5_000_000):
    """Join-heavy top-k: customer(seg) ⋈ orders ⋈ lineitem → top-k revenue.

    Scale shape (reworked per round-1 verdict — no fact table on the
    driver): customer is a DIMENSION, so its segment-filtered key set is
    broadcast once; the orders FACT table stream-filters against it in
    tasks. The filtered order-key side then reaches lineitem adaptively:
    BROADCAST semi-join while it fits (``broadcast_threshold`` keys —
    one pinned array, zero extra shuffles), distributed hash join past it
    — the standard size-aware join choice."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = sorted(cust.loc[cust["c_mktsegment"] == segment, "c_custkey"])
    key_set = pa.array(keys, pa.int64())  # dimension-sized, shipped once

    def keep_seg_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["o_custkey"], value_set=key_set))
        return t.select(["o_orderkey"])

    # the filtered order-key set is computed DISTRIBUTED and pinned (small:
    # one int per segment order)
    seg_orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        keep_seg_orders, batch_format="pyarrow"
    ).materialize()
    n_keys = seg_orders.count()

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    broadcast = n_keys <= broadcast_threshold
    if broadcast:
        # semi-join build side fits comfortably → broadcast it once via the
        # object store and stream-filter lineitem (NO extra shuffle). This
        # is the classic broadcast semi-join; past the threshold we fall
        # back to the distributed hash join below.
        key_arr = pa.array(
            sorted(seg_orders.to_pandas()["o_orderkey"].unique()), pa.int64()
        )
        keys_ref = ray.put(key_arr)

    def partial(t: pa.Table) -> pa.Table:
        if broadcast:
            t = t.filter(pc.is_in(t["l_orderkey"], value_set=ray.get(keys_ref)))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        # per-block combiner: collapse to one partial row per orderkey
        part = pa.table({"o_orderkey": t["l_orderkey"], "revenue": rev})
        return part.group_by("o_orderkey").aggregate([("revenue", "sum")]).rename_columns(
            ["o_orderkey", "revenue"]
        )

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    out = coarse_group_reduce(
        li.map_batches(partial, batch_format="pyarrow"),
        ["o_orderkey"],
        lambda g: g.groupby("o_orderkey", as_index=False)["revenue"].sum(),
    )
    if not broadcast:
        from cmc_knowledge_graph_text2ttl_ray.functions.cluster import default_join_partitions

        out = out.join(seg_orders, join_type="inner",
                       num_partitions=default_join_partitions(),
                       on=("o_orderkey",))
    out = (
        out.map_batches(
            lambda t: t.set_column(
                t.column_names.index("revenue"), "revenue", _round2(t["revenue"])
            ),
            batch_format="pyarrow",
        )
        # deterministic top-k: revenue desc, orderkey asc tiebreak
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )
    return out


def q5_nation_revenue(sf_dir: str):
    """Broadcast-dim join chain: lineitem ⋈ supplier ⋈ nation → per-nation
    revenue. The two dimension tables ride along as hash maps; only the
    tiny (nation, partial-revenue) pairs are shuffled.

    Partitioning assumption: supplier is broadcastable (TPC-H SF×10k rows —
    tens of MB up to SF 1k). Past that, switch the supplier side to the
    adaptive broadcast/hash-join pattern of :func:`q3_top_orders`."""
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    supp_to_nation = dict(
        zip(
            supp["s_suppkey"],
            supp["s_nationkey"].map(dict(zip(nation["n_nationkey"], nation["n_name"]))),
        )
    )
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1.0 - df["l_discount"])
        n_name = df["l_suppkey"].map(supp_to_nation)
        g = rev.groupby(n_name).sum()  # per-block combiner
        return pd.DataFrame({"n_name": g.index, "revenue": g.to_numpy()})

    from ray.data.aggregate import Sum

    return (
        li.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("revenue"), "revenue", _round2(t["revenue"])
            ),
            batch_format="pyarrow",
        )
    )


def orders_per_segment(sf_dir: str):
    """Distributed hash join (Ray native ds.join) + aggregate: order counts
    and total price per customer market segment."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import default_join_partitions

    joined = orders.join(
        cust, join_type="inner", num_partitions=default_join_partitions(),
        on=("o_custkey",), right_on=("c_custkey",),
    )
    from ray.data.aggregate import Count, Sum

    return (
        joined.groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="total_price"),
        )
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("total_price"), "total_price", _round2(t["total_price"])
            ),
            batch_format="pyarrow",
        )
    )


def top_parts(sf_dir: str, k: int = 10):
    """Global sort + limit (deterministic tie-break on key)."""
    return (
        _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
        .sort(["p_retailprice", "p_partkey"], descending=[True, False])
        .limit(k)
    )


def events_daily(sf_dir: str):
    """Event-stream daily rollup: groupby (day, type) count + sum."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us"))
        return pa.table({"day": day, "event_type": t["event_type"], "value": t["value"]})

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("total_value"), "total_value", _round2(t["total_value"])
            ),
            batch_format="pyarrow",
        )
    )


def events_user_stats(sf_dir: str):
    """Per-user activity profile (count, avg value, distinct event types).

    ``value`` is 2-decimal money-like data, so the partial sums run in
    EXACT integer cents — a float partial-sum's last-ulp drift depends
    on Ray's block combine order, and a user whose average sits on a
    ROUND(·, 2) half boundary then flips by 0.01 between runs (observed
    once in a round-4 sweep).  Integer summation is order-independent;
    the oracle SQL mirrors the same cents arithmetic."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["value"].to_numpy() * 100.0).astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"], "cents": cents}) \
            .groupby("user_id").agg(n=("cents", "size"),
                                    sum_cents=("cents", "sum"))
        return g.reset_index()

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n_events"),
                   Sum("sum_cents", alias_name="sum_cents"))
    )

    def fin(t: pa.Table) -> pa.Table:
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import pc_round
        avg = pc_round(
            pc.divide(pc.cast(t["sum_cents"], pa.float64()),
                      pc.multiply(pc.cast(t["n_events"], pa.float64()),
                                  100.0)), 2)
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": t["n_events"],
                "avg_value": avg,
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def q4_order_priority(sf_dir: str):
    """Semi-join pattern (TPC-H Q4 shape): orders having ≥1 returned
    lineitem, counted per priority. The lineitem side collapses to DISTINCT
    order keys inside ``map_batches`` (per-block combiner) before Ray's
    native ``left_semi`` hash join — only keys shuffle, never payload."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def returned_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table({"l_orderkey": pc.unique(t["l_orderkey"])})

    keys = li.map_batches(returned_keys, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import default_join_partitions

    semi = orders.join(keys, join_type="left_semi",
                       num_partitions=default_join_partitions(),
                       on=("o_orderkey",), right_on=("l_orderkey",))
    from ray.data.aggregate import Count

    return (
        semi.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def nation_account_balance(sf_dir: str):
    """Union + broadcast-dim join: customer and supplier account balances
    pooled per nation name. ``ds.union`` concatenates the two projected
    streams without a shuffle; the 25-row nation map rides along broadcast."""
    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pa.table({"nationkey": t["c_nationkey"], "bal": t["c_acctbal"]}),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"]).map_batches(
        lambda t: pa.table({"nationkey": t["s_nationkey"], "bal": t["s_acctbal"]}),
        batch_format="pyarrow",
    )
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def to_name(t: pa.Table) -> pa.Table:
        import pandas as pd_

        names = pd_.Series(t["nationkey"].to_pandas()).map(name_of)
        out = pa.table({"n_name": pa.array(names, pa.string()), "bal": t["bal"]})
        # per-block combiner before the groupby
        return out.group_by("n_name").aggregate([("bal", "sum")]).rename_columns(
            ["n_name", "bal"]
        )

    from ray.data.aggregate import Sum

    return (
        cust.union(supp)
        .map_batches(to_name, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("bal", alias_name="total_bal"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("total_bal"), "total_bal", _round2(t["total_bal"])
            ),
            batch_format="pyarrow",
        )
        .sort("n_name")
    )


def events_value_histogram(sf_dir: str, bin_width: float = 10.0):
    """Vectorized binning + count (the classic histogram shuffle shape:
    per-block combiner first, tiny bin table after)."""
    ds = _read(sf_dir, "events", columns=["value"])

    def bins(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t["value"], bin_width)), pa.int64())
        out = pa.table({"bin": b})
        return out.group_by("bin").aggregate([([], "count_all")]).rename_columns(
            ["bin", "n"]
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(bins, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .sort("bin")
    )


def part_type_stats(sf_dir: str):
    """Groupby with mixed aggregates (count + mean) and DuckDB-compatible
    half-away rounding."""
    from ray.data.aggregate import Count, Mean

    return (
        _read(sf_dir, "part", columns=["p_type", "p_retailprice"])
        .groupby("p_type")
        .aggregate(Count(alias_name="n_parts"),
                   Mean("p_retailprice", alias_name="avg_price"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("avg_price"), "avg_price", _round2(t["avg_price"])
            ),
            batch_format="pyarrow",
        )
        .sort("p_type")
    )


def events_daily_moving_avg(sf_dir: str, window: int = 7):
    """Windowed aggregate: 7-day trailing moving average of daily event
    counts. The expensive part (per-day counts) is a distributed groupby
    with per-block combiners; the moving window then runs over the TINY
    post-aggregation table (≤ one row per day) inside a single
    ``map_groups`` task — the standard two-phase shape for sliding windows
    whose frame fits after rollup. For per-key windows at scale, partition
    by key first (see windows.py sessionization)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us"))
        out = pa.table({"day": day})
        return out.group_by("day").aggregate([([], "count_all")]).rename_columns(
            ["day", "n"]
        )

    from ray.data.aggregate import Sum

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
    )

    def moving(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day").reset_index(drop=True)
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

        df["avg_n"] = round_half_away(
            df["n"].rolling(window, min_periods=1).mean().to_numpy(), 2
        )
        return df[["day", "n", "avg_n"]]

    def const_key(df: pd.DataFrame) -> pd.DataFrame:
        df["_g"] = 0
        return df

    return (
        daily.map_batches(const_key, batch_format="pandas")
        .groupby("_g")
        .map_groups(moving, batch_format="pandas")
        .sort("day")
    )


_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def docs_bpe_token_stats(sf_dir: str):
    """BPE-ish tokenization counts: words, numbers and punctuation as
    separate tokens (the pre-tokenizer split most BPE vocabularies use),
    vectorized with one Arrow regex kernel per batch."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        # one C kernel: count of non-overlapping matches per row
        n = pc.count_substring_regex(t["text"], _BPE_ISH).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": n})

    return ds.map_batches(stats, batch_format="pyarrow")


def top_parts_per_brand(sf_dir: str, k: int = 2):
    """Per-group top-k (window row_number shape): the k most expensive parts
    per brand. Brands are few → ``groupby(brand).map_groups`` is the coarse
    per-group pattern (each group fits a task); the in-group top-k is a
    vectorized ``nlargest``. Deterministic tie-break on p_partkey."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_retailprice", "p_partkey"],
                          ascending=[False, True]).head(k)
        return g[["p_brand", "p_partkey", "p_name", "p_retailprice"]]

    return (
        _read(sf_dir, "part",
              columns=["p_brand", "p_partkey", "p_name", "p_retailprice"])
        .groupby("p_brand")
        .map_groups(topk, batch_format="pandas")
        .sort(["p_brand", "p_partkey"])
    )


def q12_priority_by_returnflag(sf_dir: str):
    """TPC-H Q12 shape: FACT-FACT distributed hash join (lineitem ⋈ orders
    on orderkey — neither side is broadcastable at scale), then conditional
    counts per return flag. The lineitem side is pre-projected to two
    columns so only (orderkey, returnflag) pairs shuffle; the aggregation
    is a per-block combiner + tiny global groupby."""
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    j = li.join(orders, join_type="inner",
                num_partitions=default_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        high = pc.is_in(t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        hi = pc.cast(high, pa.int64())
        lo = pc.cast(pc.invert(high), pa.int64())
        part = pa.table({"l_returnflag": t["l_returnflag"],
                         "high_line_count": hi, "low_line_count": lo})
        return part.group_by("l_returnflag").aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        ).rename_columns(["l_returnflag", "high_line_count", "low_line_count"])

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count"))
        .sort("l_returnflag")
    )


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: broadcast-dimension join (part type by partkey,
    2k×SF rows → ray.put once) + a single global ratio. Returns ONE row:
    promo revenue share in percent, rounded to 2 decimals."""
    import ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    promo_keys = pa.array(
        sorted(part.loc[part["p_type"].str.startswith("PROMO"), "p_partkey"]),
        pa.int64(),
    )
    keys_ref = ray.put(promo_keys)

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        promo = pc.is_in(t["l_partkey"], value_set=ray.get(keys_ref))
        promo_rev = pc.if_else(promo, rev, pa.scalar(0.0))
        return pa.table({
            "promo": [pc.sum(promo_rev).as_py() or 0.0],
            "total": [pc.sum(rev).as_py() or 0.0],
        })

    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])
    agg = li.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo", alias_name="promo"), Sum("total", alias_name="total"))
    pct = 100.0 * agg["promo"] / agg["total"] if agg["total"] else 0.0
    return pa.table({"promo_revenue_pct": pa.array(
        [float(_round2(pa.array([pct]))[0].as_py())], pa.float64())})


def q10_returned_customers(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape: revenue of RETURNED items per customer → top-k with
    nation names. Pipeline: lineitem(R) per-block partial agg by orderkey →
    groupby-sum → hash join to orders (orderkey→custkey) → groupby-sum by
    custkey → broadcast customer/nation dimension lookup → top-k. Only
    (orderkey, revenue) then (custkey, revenue) pairs ever shuffle."""
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})
        return part.group_by("l_orderkey").aggregate(
            [("revenue", "sum")]).rename_columns(["l_orderkey", "revenue"])

    by_order = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Sum("revenue", alias_name="revenue"))
        # aggregate outputs can contain schema-less empty blocks that break
        # join field resolution (Ray 2.49) — coalesce first
        .repartition(default_join_partitions())
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = by_order.join(orders, join_type="inner",
                      num_partitions=default_join_partitions(),
                      on=("l_orderkey",), right_on=("o_orderkey",))
    by_cust = (
        j.map_batches(
            lambda t: pa.table({"c_custkey": t["o_custkey"],
                                "revenue": t["revenue"]}),
            batch_format="pyarrow")
        .groupby("c_custkey").aggregate(Sum("revenue", alias_name="revenue"))
    )
    import ray

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    # broadcast: ray.put ONCE, zero-copy per node — never in the closure
    name_ref = ray.put(dict(zip(cust["c_custkey"],
                                zip(cust["c_name"], cust["n_name"]))))

    def attach(t: pa.Table) -> pa.Table:
        name_of = ray.get(name_ref)
        keys = t["c_custkey"].to_pylist()
        names = [name_of.get(kk, ("", "")) for kk in keys]
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_name": pa.array([n[0] for n in names], pa.string()),
            "n_name": pa.array([n[1] for n in names], pa.string()),
            "revenue": _round2(t["revenue"]),
        })

    return (
        by_cust.map_batches(attach, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def events_value_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.9, 0.99),
                           n_bins: int = 8192,
                           max_driver_rows: int = 1_000_000,
                           max_refine_rounds: int = 6,
                           _stats_out: dict | None = None):
    """EXACT distributed quantiles (percentile_disc semantics) over
    ``events.value`` without a global sort.

    Streaming passes, no all-to-all exchange:
    1. global min/max/count (tiny aggregate),
    2. one fixed-bin partial histogram per block, summed — locates the bin
       containing each target rank,
    3. RECURSIVE refinement (round-3 verdict): a located bin holding more
       than ``max_driver_rows`` values is re-histogrammed in place instead
       of being collected to the driver. Bin membership is re-derived from
       a per-target constraint chain of ``(interval_lo, bin_width, bin)``
       triples evaluated with the exact binning formula each round, so
       float boundary rounding can never shift a value between parent and
       child passes. A bin whose min == max resolves exactly with no
       collection at all — a degenerate one-dominant-value distribution
       (the case that made the old single-pass refinement O(n) on the
       driver) terminates here after one extra streaming pass,
    4. one filtered pass collecting ONLY values in still-unresolved bins
       (each ≤ max_driver_rows unless ``max_refine_rounds`` is exhausted)
       — exact rank selection on the driver.

    A sort-based quantile moves the whole column through the object store;
    this moves small aggregates plus bounded driver bytes per step, the
    right shape at 100 TB (raise ``n_bins`` to cut rounds). The common
    uniform case still costs exactly 3 passes — refinement rounds only run
    when a target bin is actually oversized."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["value"])
    stats = ds.aggregate(Min("value", alias_name="lo"),
                         Max("value", alias_name="hi"),
                         Count(alias_name="n"))
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})

    def bin_of(v: np.ndarray, ilo: float, iw: float) -> np.ndarray:
        # the ONE binning formula — hist, narrowing and collection all use
        # it verbatim, which is what makes the recursion float-exact
        if iw == 0:  # interval collapsed to (near-)identical floats
            return np.zeros(len(v), dtype=np.int64)
        return np.clip(((v - ilo) / iw).astype(np.int64), 0, n_bins - 1)

    def chain_mask(v: np.ndarray, chain) -> np.ndarray:
        mask = np.ones(len(v), dtype=bool)
        for ilo, iw, b in chain:
            mask &= bin_of(v, ilo, iw) == b
        return mask

    # a live target = (q, 1-based rank WITHIN its interval, constraint chain)
    targets = [(float(q), max(1, int(np.ceil(q * n))), ()) for q in qs]
    resolved: dict[float, float] = {}
    to_collect: list[tuple[float, int, tuple]] = []

    for round_no in range(max_refine_rounds):
        if not targets:
            break
        # targets sharing an interval scan it once (round 0: all of them)
        groups: dict[tuple, list[tuple[float, int]]] = {}
        for q, r, chain in targets:
            groups.setdefault(chain, []).append((q, r))
        chains = list(groups)
        params = []
        for chain in chains:
            if not chain:
                params.append((float(lo), (hi - lo) / n_bins))
            else:
                ilo, iw, b = chain[-1]
                params.append((ilo + b * iw, iw / n_bins))

        def hist(t: pa.Table, _chains=chains, _params=params) -> pa.Table:
            v = t["value"].to_numpy()
            gs, bs, cs, mns, mxs = [], [], [], [], []
            for gi, (chain, (clo, cw)) in enumerate(zip(_chains, _params)):
                sub = v[chain_mask(v, chain)]
                if not len(sub):
                    continue
                bins = bin_of(sub, clo, cw)
                counts = np.bincount(bins, minlength=n_bins)
                nz = np.flatnonzero(counts)  # emit ONLY occupied bins
                mn = np.full(n_bins, np.inf)
                mx = np.full(n_bins, -np.inf)
                np.minimum.at(mn, bins, sub)
                np.maximum.at(mx, bins, sub)
                gs.append(np.full(len(nz), gi, dtype=np.int64))
                bs.append(nz.astype(np.int64))
                cs.append(counts[nz].astype(np.int64))
                mns.append(mn[nz])
                mxs.append(mx[nz])
            if not gs:
                return pa.table({"g": pa.array([], pa.int64()),
                                 "bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "vmin": pa.array([], pa.float64()),
                                 "vmax": pa.array([], pa.float64())})
            return pa.table({"g": np.concatenate(gs),
                             "bin": np.concatenate(bs),
                             "cnt": np.concatenate(cs),
                             "vmin": np.concatenate(mns),
                             "vmax": np.concatenate(mxs)})

        agg = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["g", "bin"])
            .aggregate(Sum("cnt", alias_name="cnt"),
                       Min("vmin", alias_name="vmin"),
                       Max("vmax", alias_name="vmax"))
            .to_pandas()            # ≤ |groups| × n_bins rows — driver-tiny
        )
        next_targets = []
        for gi, chain in enumerate(chains):
            g = agg[agg["g"] == gi].sort_values("bin")
            cum = g["cnt"].cumsum().to_numpy()
            bins_arr = g["bin"].to_numpy()
            clo, cw = params[gi]
            for q, r in groups[chain]:
                i = int(np.searchsorted(cum, r))
                b = int(bins_arr[i])
                before = int(cum[i - 1]) if i > 0 else 0
                sub_rank = r - before
                row = g.iloc[i]
                child = chain + ((clo, cw, b),)
                if row["vmin"] == row["vmax"]:
                    resolved[q] = float(row["vmin"])  # bin is one value
                elif (row["cnt"] <= max_driver_rows
                      or round_no == max_refine_rounds - 1):
                    to_collect.append((q, sub_rank, child))
                else:
                    next_targets.append((q, sub_rank, child))
        targets = next_targets

    if to_collect:
        uniq = list(dict.fromkeys(c for _, _, c in to_collect))

        def collect(t: pa.Table, _uniq=uniq) -> pa.Table:
            v = t["value"].to_numpy()
            gs, vs = [], []
            for gi, chain in enumerate(_uniq):
                sel = v[chain_mask(v, chain)]
                gs.append(np.full(len(sel), gi, dtype=np.int64))
                vs.append(sel)
            return pa.table({"g": np.concatenate(gs) if gs else
                             pa.array([], pa.int64()),
                             "value": np.concatenate(vs) if vs else
                             pa.array([], pa.float64())})

        small = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        if _stats_out is not None:  # test hook: driver-collection volume
            _stats_out["collected_rows"] = int(len(small))
        for q, r, chain in to_collect:
            gi = uniq.index(chain)
            vals = np.sort(small.loc[small["g"] == gi, "value"].to_numpy())
            resolved[q] = float(vals[r - 1])
    elif _stats_out is not None:
        _stats_out["collected_rows"] = 0

    out_q = np.array(sorted(resolved), dtype=np.float64)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array([resolved[q] for q in out_q],
                                       pa.float64())})


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str]):
    """Generic AS-OF join (an operator Ray Data lacks natively): for every
    left row, attach the single right row with the LARGEST ``right_ts`` ≤
    ``left_ts`` within the same ``key`` (inner semantics — unmatched left
    rows drop, like SQL ASOF JOIN).

    Composition: both sides project to a shared schema (missing columns
    null) tagged with a side marker, union WITHOUT a shuffle, then ONE
    exchange on ``hash(key) % num_coarse`` (coarse partitions, not
    per-key groups — Ray's sort-based map_groups pays ~1 ms per distinct
    group, linear in key cardinality) where each partition answers ALL its
    keys' left rows with a single C-speed ``pd.merge_asof(by=key)``; a
    per-key searchsorted loop remains only as the fallback for ``ts``
    dtypes merge_asof cannot order.

    Ties on ``right_ts`` resolve DETERMINISTICALLY to the greatest right
    payload tuple (right rows are sorted by [ts, *right_cols] and
    merge_asof backward takes the last eligible row) — required for
    run-to-run stable output under Ray's nondeterministic block order.

    Partitioning assumption (documented per the custom-operator contract):
    one coarse partition's rows fit one task — salt hot keys upstream if a
    single key's history outgrows worker memory."""
    import pandas as pd_

    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def project(cols, side):
        def f(t: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in [key, "ts", "_side"] + all_cols:
                if c == "ts":
                    src = left_ts if side == 0 else right_ts
                    arrays.append(t[src])
                elif c == "_side":
                    arrays.append(pa.array([side] * t.num_rows, pa.int8()))
                elif c == key:
                    if key not in t.column_names:
                        raise KeyError(
                            f"asof_join: key column {key!r} missing from a "
                            f"side's batch (rename upstream)")
                    arrays.append(t[key])
                elif c in t.column_names and c in cols:
                    arrays.append(t[c])
                else:
                    arrays.append(pa.nulls(t.num_rows))
                names.append(c)
            return pa.table(dict(zip(names, arrays)))

        return f

    l2 = left.map_batches(project(left_cols, 0), batch_format="pyarrow")
    r2 = right.map_batches(project(right_cols, 1), batch_format="pyarrow")

    keep_left = [c for c in left_cols if c != key and c not in right_cols]

    def match_one_key(lrows: pd_.DataFrame,
                      rrows: pd_.DataFrame) -> pd_.DataFrame | None:
        # fallback kernel for one key (rrows pre-sorted by [ts, *right_cols])
        idx = np.searchsorted(rrows["ts"].to_numpy(),
                              lrows["ts"].to_numpy(), side="right") - 1
        keep = idx >= 0
        lrows = lrows[keep]
        if lrows.empty:
            return None
        matched = rrows.iloc[idx[keep]]
        out = lrows[[key, "ts"] + keep_left].copy()
        for c in right_cols:
            out[c] = matched[c].to_numpy()
        return out

    def per_part(g: pd_.DataFrame) -> pd_.DataFrame:
        lmask = g["_side"] == 0
        lrows = g[lmask]
        rrows = g[~lmask].sort_values(["ts"] + right_cols, kind="stable")
        empty = pd_.DataFrame({c: pd_.Series(dtype=g[c].dtype)
                               for c in g.columns if c != "_side"})
        if lrows.empty or rrows.empty:
            return empty
        try:
            # one vectorized pass for EVERY key in the partition; backward +
            # exact matches ≡ searchsorted(side="right") - 1, and the last
            # eligible row per (key, ts) is the greatest payload tuple
            merged = pd_.merge_asof(
                lrows.sort_values("ts", kind="stable")[[key, "ts"] + keep_left],
                rrows[[key, "ts"] + right_cols].assign(_m=1),
                on="ts", by=key, direction="backward")
            merged = merged[merged["_m"].notna()].drop(columns=["_m"])
            return merged.reset_index(drop=True)
        except (ValueError, TypeError, pd_.errors.MergeError):
            # ts dtype merge_asof cannot order — per-key searchsorted loop
            outs = []
            for _, lkg in lrows.groupby(key, sort=False):
                rkg = rrows[rrows[key] == lkg[key].iloc[0]]
                if rkg.empty:
                    continue
                m = match_one_key(lkg, rkg)
                if m is not None:
                    outs.append(m)
            if not outs:
                return empty
            return pd_.concat(outs, ignore_index=True)

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    return coarse_group_reduce(l2.union(r2), [key], per_part)


def events_asof_orders(sf_dir: str):
    """Each event joined AS-OF to the customer's most recent order at or
    before the event timestamp (DuckDB ``ASOF JOIN`` oracle)."""
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_orderkey",
                            "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(
            ["user_id", "o_orderdate", "o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    out = asof_join(events, orders, key="user_id",
                    left_ts="ts", right_ts="o_orderdate",
                    left_cols=["event_id"],
                    right_cols=["o_orderkey", "o_totalprice"])

    def restore_types(t: pa.Table) -> pa.Table:
        # the tagged union carries nulls on the other side's columns, so
        # integer columns come back float64 — cast to the oracle schema
        for c in ("event_id", "o_orderkey"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.cast(t[c], pa.int64()))
        return t

    return out.map_batches(restore_types, batch_format="pyarrow").sort("event_id")


def range_join(left, intervals_df, value_col: str,
               lo_col: str, hi_col: str, payload_cols: list[str]):
    """Generic broadcast RANGE (interval) join — another operator Ray Data
    lacks natively: each left row matches the interval with
    ``lo ≤ value < hi`` (intervals non-overlapping, sorted).

    The interval table is a DIMENSION (pandas DataFrame): shipped once via
    ``ray.put`` and applied per batch as one vectorized ``searchsorted``
    over the sorted bounds — no shuffle at all. Rows outside every
    interval drop (inner semantics)."""
    import ray

    if len(intervals_df) == 0:
        raise ValueError("range_join requires a non-empty interval table")
    iv = intervals_df.sort_values(lo_col).reset_index(drop=True)
    los = iv[lo_col].to_numpy()
    his = iv[hi_col].to_numpy()
    if (los[1:] < his[:-1]).any():
        raise ValueError("range_join requires non-overlapping intervals")
    iv_ref = ray.put((los, his, {c: iv[c].to_numpy() for c in payload_cols}))

    def join_batch(t: pa.Table) -> pa.Table:
        los_, his_, payload = ray.get(iv_ref)
        v = t[value_col].to_numpy()
        idx = np.searchsorted(los_, v, side="right") - 1
        idx_c = np.clip(idx, 0, len(los_) - 1)
        keep = (idx >= 0) & (v < his_[idx_c])
        out = t.filter(pa.array(keep))
        for c, arr in payload.items():
            out = out.append_column(c, pa.array(arr[idx_c[keep]]))
        return out

    return left.map_batches(join_batch, batch_format="pyarrow")


def parts_price_tiers(sf_dir: str):
    """Parts bucketed into price tiers via the broadcast range join, then
    counted per tier (DuckDB BETWEEN-join oracle)."""
    import pandas as pd_

    from ray.data.aggregate import Count

    tiers = pd_.DataFrame({
        "lo": [0.0, 925.0, 950.0, 975.0],
        "hi": [925.0, 950.0, 975.0, 10_000.0],
        "tier": ["budget", "mid", "high", "premium"],
    })
    parts = _read(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    joined = range_join(parts, tiers, value_col="p_retailprice",
                        lo_col="lo", hi_col="hi", payload_cols=["tier"])
    return (
        joined.groupby("tier").aggregate(Count(alias_name="n_parts"))
        .sort("tier")
    )


def events_hopping_window_counts(sf_dir: str, window_hours: int = 6,
                                 hop_hours: int = 3):
    """HOPPING (sliding) event-time window counts — the streaming-window
    operator Ray Data lacks natively: 6-hour windows advancing every 3
    hours, so each event lands in ``window/hop`` windows.

    Composition: one vectorized ``map_batches`` expands each event into
    its window-start keys (epoch arithmetic, no Python loop), then a
    single groupby-count over (window_start) — per-block partials combine
    inside Ray's hash aggregate, so the shuffle moves one row per
    (block, window)."""
    assert window_hours % hop_hours == 0
    k = window_hours // hop_hours
    hop_us = hop_hours * 3600 * 1_000_000

    ds = _read(sf_dir, "events", columns=["ts"])

    def expand(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy()
        base = (us // hop_us) * hop_us
        starts = (base[:, None]
                  - (np.arange(k, dtype=np.int64) * hop_us)[None, :]).ravel()
        return pa.table({"window_start":
                         pa.array(starts).cast(pa.timestamp("us"))})

    from ray.data.aggregate import Count

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"))
        .sort("window_start")
    )


def q7_nation_volume(sf_dir: str, nation_a: str = "NATION_1",
                     nation_b: str = "NATION_2",
                     broadcast_threshold: int = 2_000_000):
    """TPC-H Q7 shape: shipping volume between a nation pair by year.

    Scale plan: supplier and nation are dimensions — broadcast once
    (suppkey → nation name) so the lineitem scan filters to the two nations
    and pre-aggregates per (orderkey, supp_nation, year) BEFORE any
    exchange; orders⋈customer runs as a distributed hash join producing
    (orderkey → cust_nation); one more hash join + a tiny final groupby.
    Only order-level partials ever shuffle, never raw lineitems."""
    import ray
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup_ref = ray.put(dict(zip(sup["s_suppkey"],
                               sup["s_nationkey"].map(nmap))))
    nmap_ref = ray.put(nmap)
    pair = {nation_a, nation_b}

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["l_shipdate"] >= pd.Timestamp("1996-01-01"))
               & (df["l_shipdate"] <= pd.Timestamp("1997-12-31"))]
        sn = d["l_suppkey"].map(ray.get(sup_ref))
        d = d[sn.isin(pair)]
        if d.empty:
            return pd.DataFrame({"l_orderkey": pd.Series(dtype="int64"),
                                 "supp_nation": pd.Series(dtype="object"),
                                 "l_year": pd.Series(dtype="int64"),
                                 "volume": pd.Series(dtype="float64")})
        out = pd.DataFrame({
            "l_orderkey": d["l_orderkey"].astype("int64"),
            "supp_nation": sn[sn.isin(pair)],
            "l_year": d["l_shipdate"].dt.year.astype("int64"),
            "volume": d["l_extendedprice"] * (1.0 - d["l_discount"]),
        })
        return out.groupby(["l_orderkey", "supp_nation", "l_year"],
                           as_index=False)["volume"].sum()

    def norm_part(df: pd.DataFrame) -> pd.DataFrame:
        # aggregate emits schema-less empty blocks that break the join's
        # field resolution — force the schema on every block
        if df.empty:
            return pd.DataFrame({"l_orderkey": pd.Series(dtype="int64"),
                                 "supp_nation": pd.Series(dtype="object"),
                                 "l_year": pd.Series(dtype="int64"),
                                 "volume": pd.Series(dtype="float64")})
        return df.astype({"l_orderkey": "int64", "l_year": "int64",
                          "volume": "float64"})

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    partials = (
        coarse_group_reduce(
            li.map_batches(partial, batch_format="pandas"),
            ["l_orderkey", "supp_nation", "l_year"],
            lambda g: g.groupby(["l_orderkey", "supp_nation", "l_year"],
                                as_index=False)["volume"].sum(),
        )
        .repartition(default_join_partitions())
        .map_batches(norm_part, batch_format="pandas")
        # order-level partials for the two nations: post-aggregate small;
        # pinned so the empty-input guard below doesn't re-run the scan
        .materialize()
    )
    n_part = partials.count()
    if n_part == 0:
        return _empty_df({"supp_nation": pa.string(),
                          "cust_nation": pa.string(),
                          "l_year": pa.int64(), "revenue": pa.float64()})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    if n_part <= broadcast_threshold:
        # the partial set covers only the two nations' orders — usually
        # driver-small. Broadcast it (plus the custkey → nation dimension)
        # and fold everything into ONE orders scan: zero ds.joins, zero
        # order-level shuffles; join-actor spin-up (the dominant cost of
        # the distributed path at bench scale) disappears.
        cust_pd = _read(sf_dir, "customer",
                        ["c_custkey", "c_nationkey"]).to_pandas()
        cmap_ref = ray.put(dict(zip(cust_pd["c_custkey"],
                                    cust_pd["c_nationkey"].map(nmap))))
        part_ref = ray.put(partials.to_pandas())

        def scan(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(part_ref)
            d = df.merge(m, left_on="o_orderkey", right_on="l_orderkey")
            empty = pd.DataFrame({
                "supp_nation": pd.Series(dtype="object"),
                "cust_nation": pd.Series(dtype="object"),
                "l_year": pd.Series(dtype="int64"),
                "volume": pd.Series(dtype="float64")})
            if d.empty:
                return empty
            cn = d["o_custkey"].map(ray.get(cmap_ref))
            keep = (((d["supp_nation"] == nation_a) & (cn == nation_b))
                    | ((d["supp_nation"] == nation_b) & (cn == nation_a)))
            d = d[keep]
            if d.empty:
                return empty
            out = pd.DataFrame({"supp_nation": d["supp_nation"],
                                "cust_nation": cn[keep],
                                "l_year": d["l_year"].astype("int64"),
                                "volume": d["volume"]})
            return out.groupby(["supp_nation", "cust_nation", "l_year"],
                               as_index=False)["volume"].sum()

        out = (
            orders.map_batches(scan, batch_format="pandas")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("volume", alias_name="revenue"))
        )
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        oc = orders.join(cust, join_type="inner",
                         num_partitions=default_join_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))

        def cust_nat(t: pa.Table) -> pa.Table:
            m = ray.get(nmap_ref)
            names = [m.get(k, "") for k in t["c_nationkey"].to_pylist()]
            return pa.table({"o_orderkey": t["o_orderkey"],
                             "cust_nation": pa.array(names, pa.string())})

        oc = oc.map_batches(cust_nat, batch_format="pyarrow")

        j = partials.join(oc, join_type="inner",
                          num_partitions=default_join_partitions(),
                          on=("l_orderkey",), right_on=("o_orderkey",))

        def keep_pair(t: pa.Table) -> pa.Table:
            sa = pc.and_(pc.equal(t["supp_nation"], nation_a),
                         pc.equal(t["cust_nation"], nation_b))
            sb = pc.and_(pc.equal(t["supp_nation"], nation_b),
                         pc.equal(t["cust_nation"], nation_a))
            t = t.filter(pc.or_(sa, sb))
            return t.select(["supp_nation", "cust_nation", "l_year",
                             "volume"])

        out = (
            j.map_batches(keep_pair, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("volume", alias_name="revenue"))
        )

    def fin(t: pa.Table) -> pa.Table:
        if "revenue" not in t.column_names:
            return pa.table({"supp_nation": pa.array([], pa.string()),
                             "cust_nation": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.float64())})
        return pa.table({"supp_nation": t["supp_nation"],
                         "cust_nation": t["cust_nation"],
                         "l_year": t["l_year"].cast(pa.int64()),
                         "revenue": _round2(t["revenue"])})

    return out.map_batches(fin, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"])


def q13_customer_distribution(sf_dir: str,
                              excl_priority: str = "1-URGENT",
                              broadcast_threshold: int = 2_000_000):
    """TPC-H Q13 shape: distribution of per-customer order counts,
    INCLUDING zero-order customers (the left-outer-join subtlety).

    Scale plan: per-block order counts by custkey → groupby sum (only
    (custkey, count) pairs shuffle) → distributed LEFT OUTER join from the
    customer key column (null → 0) → tiny final count-of-counts groupby."""
    from ray.data.aggregate import Count, Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def percust(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["o_orderpriority"] != excl_priority]
        c = d["o_custkey"].value_counts()
        return pd.DataFrame({"o_custkey": c.index.astype("int64"),
                             "n": c.to_numpy(dtype="int64")})

    counts = (
        orders.map_batches(percust, batch_format="pandas")
        .groupby("o_custkey").aggregate(Sum("n", alias_name="n"))
        .repartition(default_join_partitions())
        .materialize()   # one row per active customer — small
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    if counts.count() <= broadcast_threshold:
        # broadcast the (custkey, count) array sorted by key; the customer
        # scan resolves its count with one vectorized searchsorted — no
        # join actors, no customer-table shuffle
        import ray

        cdf = counts.to_pandas().sort_values("o_custkey")
        ref = ray.put((cdf["o_custkey"].to_numpy(dtype=np.int64),
                       cdf["n"].to_numpy(dtype=np.int64)))

        def percust_count(df: pd.DataFrame) -> pd.DataFrame:
            keys, ns = ray.get(ref)
            ck = df["c_custkey"].to_numpy(dtype=np.int64)
            cc = np.zeros(len(ck), dtype=np.int64)
            if len(keys):
                pos = np.searchsorted(keys, ck)
                pos_c = np.minimum(pos, len(keys) - 1)
                hit = keys[pos_c] == ck
                cc[hit] = ns[pos_c[hit]]
            v, n = np.unique(cc, return_counts=True)
            return pd.DataFrame({"c_count": v, "nc": n.astype(np.int64)})

        return (
            cust.map_batches(percust_count, batch_format="pandas")
            .groupby("c_count").aggregate(Sum("nc", alias_name="custdist"))
            .map_batches(
                lambda df: df.astype({"c_count": "int64",
                                      "custdist": "int64"})
                if not df.empty else df, batch_format="pandas")
            .sort(["custdist", "c_count"], descending=[True, True])
        )

    j = cust.join(counts, join_type="left_outer",
                  num_partitions=default_join_partitions(),
                  on=("c_custkey",), right_on=("o_custkey",))

    def c_count(t: pa.Table) -> pa.Table:
        if "n" not in t.column_names:
            return pa.table({"c_count": pa.array([], pa.int64())})
        filled = pc.coalesce(t["n"], pa.scalar(0, pa.int64()))
        return pa.table({"c_count": filled.cast(pa.int64())})

    return (
        j.map_batches(c_count, batch_format="pyarrow")
        .groupby("c_count").aggregate(Count(alias_name="custdist"))
        .sort(["custdist", "c_count"], descending=[True, True])
    )


def q18_large_orders(sf_dir: str, min_qty: float = 250.0, k: int = 100,
                     broadcast_threshold: int = 2_000_000):
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING over a fact aggregate), joined back to order attributes.

    Scale plan: per-block quantity sums by orderkey → groupby sum → filter
    (the surviving set is tiny) → distributed hash join to orders → top-k
    sort. Raw lineitems never shuffle, only (orderkey, qty) partials."""
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        part = pa.table({"l_orderkey": t["l_orderkey"],
                         "sum_qty": t["l_quantity"]})
        return part.group_by("l_orderkey").aggregate(
            [("sum_qty", "sum")]).rename_columns(["l_orderkey", "sum_qty"])

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # groups are complete within a coarse partition, so the HAVING
        # filter is applied right here — survivors only leave the task
        s = g.groupby("l_orderkey", as_index=False)["sum_qty"].sum()
        return s[s["sum_qty"] > min_qty]

    big = (
        coarse_group_reduce(
            li.map_batches(partial, batch_format="pyarrow"),
            ["l_orderkey"], combine,
        )
        .repartition(default_join_partitions())
        # HAVING survivors: tiny by construction; pinned for the guard
        .materialize()
    )
    n_big = big.count()
    if n_big == 0:
        return _empty_df({"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                          "o_orderdate": pa.timestamp("us"),
                          "o_totalprice": pa.float64(),
                          "sum_qty": pa.float64()})
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    if n_big <= broadcast_threshold:
        # HAVING survivors broadcast as a sorted key/qty array pair; the
        # orders scan semi-filters + attaches sum_qty with one vectorized
        # searchsorted — no join actors, no orders shuffle
        import ray

        bdf = big.to_pandas().sort_values("l_orderkey")
        ref = ray.put((bdf["l_orderkey"].to_numpy(dtype=np.int64),
                       bdf["sum_qty"].to_numpy(dtype=np.float64)))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
                round_half_away,
            )

            keys, qv = ray.get(ref)
            ok = df["o_orderkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(keys, ok)
            pos_c = np.minimum(pos, len(keys) - 1)
            hit = keys[pos_c] == ok
            d = df[hit]
            return pd.DataFrame({
                "o_orderkey": d["o_orderkey"].astype("int64"),
                "o_custkey": d["o_custkey"].astype("int64"),
                "o_orderdate": d["o_orderdate"],
                "o_totalprice": d["o_totalprice"],
                "sum_qty": round_half_away(qv[pos_c[hit]], 2),
            })

        return (
            orders.map_batches(attach, batch_format="pandas")
            .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(k)
        )

    j = big.join(orders, join_type="inner",
                 num_partitions=default_join_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["l_orderkey"].cast(pa.int64()),
            "o_custkey": t["o_custkey"].cast(pa.int64()),
            "o_orderdate": t["o_orderdate"],
            "o_totalprice": t["o_totalprice"],
            "sum_qty": _round2(t["sum_qty"]),
        })

    return (
        j.map_batches(fin, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


_Q19_BRANCHES = [
    ("Brand#1", 1, 15, 1.0, 11.0),
    ("Brand#13", 10, 30, 10.0, 20.0),
    ("Brand#20", 20, 50, 20.0, 30.0),
]


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: disjunctive multi-attribute predicates across a
    fact⋈dimension join. part is a dimension: broadcast (partkey → brand,
    size) once; the lineitem scan evaluates all three OR-branches
    vectorized and emits one partial row per block — no shuffle at all."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
    ref = ray.put((dict(zip(part["p_partkey"], part["p_brand"])),
                   dict(zip(part["p_partkey"], part["p_size"]))))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        brand_map, size_map = ray.get(ref)
        brand = df["l_partkey"].map(brand_map)
        size = df["l_partkey"].map(size_map)
        qty = df["l_quantity"]
        mask = None
        for b, lo_s, hi_s, lo_q, hi_q in _Q19_BRANCHES:
            m = ((brand == b) & (size >= lo_s) & (size <= hi_s)
                 & (qty >= lo_q) & (qty <= hi_q))
            mask = m if mask is None else (mask | m)
        d = df[mask]
        rev = float((d["l_extendedprice"] * (1.0 - d["l_discount"])).sum())
        return pd.DataFrame({"revenue": [rev], "n": [len(d)]})

    agg = li.map_batches(partial, batch_format="pandas").sum(["revenue", "n"])
    return pd.DataFrame({
        "revenue": [round(agg["sum(revenue)"], 2)],
        "n": [int(agg["sum(n)"])],
    })


def q15_top_supplier(sf_dir: str,
                     date_lo: str = "1996-01-01", date_hi: str = "1996-07-01"):
    """TPC-H Q15 shape: supplier(s) achieving the MAXIMUM revenue over a
    ship-date window (modeled on reference query semantics; partsupp-free
    schema adaptation).

    Scale shape: revenue per supplier via per-block partial aggregation
    (shuffle ships (suppkey, partial_rev) only), the global max is one
    driver scalar, and the winning (usually single-row) supplier set joins
    against the small supplier dimension with a broadcast pandas merge.
    The max-filter compares the engine's OWN sums, so float associativity
    can't misselect the winner."""
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp(date_lo))),
            pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp(date_hi))),
        ))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return (
            pa.table({"l_suppkey": t["l_suppkey"], "rev": rev})
            .group_by("l_suppkey").aggregate([("rev", "sum")])
            .rename_columns(["l_suppkey", "rev"])
        )

    from ray.data.aggregate import Sum

    per_supp = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev", alias_name="total_revenue"))
        .materialize()
    )
    max_rev = per_supp.max("total_revenue")
    winners = per_supp.filter(
        expr=f"total_revenue == {max_rev!r}"
    ).to_pandas()
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = round_half_away(out["total_revenue"], 2)
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey").reset_index(drop=True)
    )


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#23",
                               frac: float = 0.2):
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below ``frac`` × that part's average quantity) were not
    filled, for one brand. The correlated per-part AVG subquery becomes a
    broadcast map.

    Scale shape: the brand's part keys are a pruned dimension read
    (broadcast via ``ray.put``); lineitem is scanned ONCE with an inline
    semi-join filter, per-part (sum, count) partials aggregate to exact
    averages, and the small per-part threshold table broadcasts back for
    the final filtered sum — no fact-table shuffle at any point."""
    import ray

    part_keys = set(
        _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
        .filter(expr=f"p_brand == {brand!r}")
        .to_pandas()["p_partkey"].astype("int64")
    )
    keys_ref = ray.put(part_keys)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def brand_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["l_partkey"].isin(ray.get(keys_ref))]

    brand_li = li.map_batches(brand_rows, batch_format="pandas").materialize()

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_partkey")["l_quantity"].agg(["sum", "count"])
        return pd.DataFrame({"l_partkey": g.index.astype("int64"),
                             "qty_sum": g["sum"].to_numpy(),
                             "qty_cnt": g["count"].to_numpy(dtype="int64")})

    # driver-side combine: the partial table is bounded by blocks ×
    # brand-parts (a pruned dimension), so collecting it skips the
    # shuffle's fixed actor overhead for a dimension-sized result
    avg_df = (
        brand_li.map_batches(qty_partial, batch_format="pandas")
        .to_pandas()
        .groupby("l_partkey", as_index=False)[["qty_sum", "qty_cnt"]]
        .sum()
    )
    thr = dict(zip(avg_df["l_partkey"].astype("int64"),
                   frac * avg_df["qty_sum"].to_numpy()
                   / avg_df["qty_cnt"].to_numpy()))
    thr_ref = ray.put(thr)

    def below(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        lim = df["l_partkey"].map(t).to_numpy(dtype="float64")
        keep = df["l_quantity"].to_numpy() < lim
        return pd.DataFrame({"price": df.loc[keep, "l_extendedprice"]})

    total = brand_li.map_batches(below, batch_format="pandas").sum("price")
    return pd.DataFrame({"avg_yearly": [round((total or 0.0) / 7.0, 2)]})


def q22_idle_balances(sf_dir: str, nation_lo: int = 0, nation_hi: int = 12,
                      broadcast_threshold: int = 5_000_000):
    """TPC-H Q22 shape: customers from a nation band with above-average
    positive balances and NO urgent order, rolled up per nation (the
    phone-prefix predicate is adapted to the schema's nation keys, and
    the anti-join side is the URGENT-priority order subset so the result
    is non-degenerate on the synthetic data, where every customer has
    at least one order).

    Scale shape: the global AVG is two driver scalars from one pruned
    pre-aggregated scan; the "has no orders" anti-join reuses the adaptive
    pattern — the DISTINCT customer keys of orders collapse per block
    before the exchange, broadcast under the threshold, and flip to a
    distributed left-anti hash join past it."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"]).filter(
        expr=f"c_nationkey >= {nation_lo} and c_nationkey <= {nation_hi}"
    ).materialize()

    def bal_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], pa.scalar(0.0)))
        return pa.table({
            "s": pa.array([pc.sum(t["c_acctbal"]).as_py() or 0.0],
                          pa.float64()),
            "c": pa.array([t.num_rows], pa.int64()),
        })

    agg = cust.map_batches(bal_partial, batch_format="pyarrow").sum(["s", "c"])
    n_pos = int(agg["sum(c)"])
    if n_pos == 0:
        return _empty_df({"c_nationkey": pa.int64(), "numcust": pa.int64(),
                          "totacctbal": pa.float64()})
    avg_bal = float(agg["sum(s)"]) / n_pos

    rich = cust.filter(expr=f"c_acctbal > {avg_bal!r}")

    okeys = _read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    ).select_columns(["o_custkey"])

    def distinct_block(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.unique(t["o_custkey"]).cast(pa.int64())})

    okeys = (okeys.map_batches(distinct_block, batch_format="pyarrow")
             .groupby("o_custkey").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]))
    n_keys = okeys.count()
    if n_keys <= broadcast_threshold:
        key_ref = ray.put(set(okeys.to_pandas()["o_custkey"].astype("int64")))

        def anti(df: pd.DataFrame) -> pd.DataFrame:
            return df[~df["c_custkey"].isin(ray.get(key_ref))]

        idle = rich.map_batches(anti, batch_format="pandas")
    else:
        from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
            default_join_partitions,
        )

        j = rich.join(okeys, join_type="left_outer",
                      num_partitions=default_join_partitions(),
                      on=("c_custkey",), right_on=("o_custkey",))
        idle = j.map_batches(
            lambda df: df[df["o_custkey"].isna()][
                ["c_custkey", "c_nationkey", "c_acctbal"]],
            batch_format="pandas")

    out = (
        idle.groupby("c_nationkey")
        .aggregate(Count(alias_name="numcust"),
                   Sum("c_acctbal", alias_name="totacctbal"))
        .to_pandas()
    )
    if out.empty:
        return _empty_df({"c_nationkey": pa.int64(), "numcust": pa.int64(),
                          "totacctbal": pa.float64()})
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = round_half_away(out["totacctbal"], 2)
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q8_market_share(sf_dir: str, nation: str = "NATION_3",
                    region: str = "ASIA", p_type: str = "ECONOMY",
                    date_lo: str = "1995-01-01", date_hi: str = "1996-12-31",
                    broadcast_threshold: int = 5_000_000):
    """TPC-H Q8 shape: ``nation``'s share of ECONOMY-part order volume sold
    to ``region`` customers, per order year.

    Scale plan: part keys (one p_type), target-nation supplier keys and
    customer-in-region keys are DIMENSIONS — broadcast once via
    ``ray.put``. The (date- and region-filtered) orders side is reduced
    DISTRIBUTED to (o_orderkey, o_year) pairs; while that fits the
    broadcast threshold it is shipped once as two sorted numpy arrays and
    the single lineitem scan does filter + year lookup + per-(year,
    target) pre-aggregation in one pass — the only all-to-all is a
    groupby over a handful of (o_year, target) partial rows. Past the
    threshold it falls back to the distributed hash join (same answer,
    one extra shuffle) — the standard size-aware join choice."""
    import ray
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name",
                                   "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(
        nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        .loc[lambda d: d["r_name"] == region, "n_nationkey"]
    )
    target_natkeys = set(nat.loc[nat["n_name"] == nation, "n_nationkey"])

    parts = _read(sf_dir, "part", ["p_partkey", "p_type"]).filter(
        expr=f"p_type == {p_type!r}").to_pandas()
    pkeys_ref = ray.put(np.sort(parts["p_partkey"].to_numpy(np.int64)))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    tsup_ref = ray.put(np.sort(
        sup.loc[sup["s_nationkey"].isin(target_natkeys), "s_suppkey"]
        .to_numpy(np.int64)))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ckeys_ref = ray.put(
        cust.loc[cust["c_nationkey"].isin(region_keys), "c_custkey"]
        .to_numpy(np.int64))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def ord_filter(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["o_orderdate"] >= pd.Timestamp(date_lo))
               & (df["o_orderdate"] <= pd.Timestamp(date_hi))
               & df["o_custkey"].isin(ray.get(ckeys_ref))]
        return pd.DataFrame({
            "o_orderkey": d["o_orderkey"].astype("int64"),
            "o_year": d["o_orderdate"].dt.year.astype("int64"),
        })

    ord_years = orders.map_batches(ord_filter,
                                   batch_format="pandas").materialize()
    broadcast = ord_years.count() <= broadcast_threshold

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    if broadcast:
        om = ord_years.to_pandas().sort_values("o_orderkey")
        okeys_ref = ray.put(om["o_orderkey"].to_numpy(np.int64))
        oyears_ref = ray.put(om["o_year"].to_numpy(np.int64))

        def li_year_partial(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                "o_year": pd.Series(dtype="int64"),
                "target": pd.Series(dtype="int64"),
                "volume": pd.Series(dtype="float64")})
            pk = ray.get(pkeys_ref)
            ok = ray.get(okeys_ref)
            if len(pk) == 0 or len(ok) == 0:
                return empty
            lk = df["l_orderkey"].to_numpy(np.int64)
            pos = np.clip(np.searchsorted(
                pk, df["l_partkey"].to_numpy(np.int64)), 0, len(pk) - 1)
            keep = pk[pos] == df["l_partkey"].to_numpy(np.int64)
            opos = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
            keep &= ok[opos] == lk
            if not keep.any():
                return empty
            d = df[keep]
            ts = ray.get(tsup_ref)
            sk = d["l_suppkey"].to_numpy(np.int64)
            if len(ts) == 0:
                target = np.zeros(len(d), dtype=np.int64)
            else:
                spos = np.clip(np.searchsorted(ts, sk), 0, len(ts) - 1)
                target = (ts[spos] == sk).astype(np.int64)
            out = pd.DataFrame({
                "o_year": ray.get(oyears_ref)[opos[keep]],
                "target": target,
                "volume": (d["l_extendedprice"]
                           * (1.0 - d["l_discount"])).to_numpy(),
            })
            return out.groupby(["o_year", "target"], as_index=False).sum()

        joined = li.map_batches(li_year_partial, batch_format="pandas")
    else:
        def li_partial(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                "l_orderkey": pd.Series(dtype="int64"),
                "target": pd.Series(dtype="int64"),
                "volume": pd.Series(dtype="float64")})
            pk = ray.get(pkeys_ref)
            if len(pk) == 0:
                return empty
            pos = np.clip(np.searchsorted(
                pk, df["l_partkey"].to_numpy(np.int64)), 0, len(pk) - 1)
            d = df[pk[pos] == df["l_partkey"].to_numpy(np.int64)]
            if d.empty:
                return empty
            ts = ray.get(tsup_ref)
            sk = d["l_suppkey"].to_numpy(np.int64)
            if len(ts) == 0:
                target = np.zeros(len(d), dtype=np.int64)
            else:
                spos = np.clip(np.searchsorted(ts, sk), 0, len(ts) - 1)
                target = (ts[spos] == sk).astype(np.int64)
            out = pd.DataFrame({
                "l_orderkey": d["l_orderkey"].astype("int64"),
                "target": target,
                "volume": (d["l_extendedprice"]
                           * (1.0 - d["l_discount"])).to_numpy(),
            })
            return out.groupby(["l_orderkey", "target"], as_index=False).sum()

        joined = li.map_batches(li_partial, batch_format="pandas").join(
            ord_years, join_type="inner",
            num_partitions=default_join_partitions(),
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

    def year_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"o_year": pd.Series(dtype="int64"),
                                 "total": pd.Series(dtype="float64"),
                                 "nation_vol": pd.Series(dtype="float64")})
        d = df.assign(total=df["volume"],
                      nation_vol=df["volume"] * (df["target"] == 1))
        return d.groupby("o_year", as_index=False)[["total", "nation_vol"]].sum()

    per_year = (
        joined.map_batches(year_partial, batch_format="pandas")
        .groupby("o_year")
        .aggregate(Sum("total", alias_name="total"),
                   Sum("nation_vol", alias_name="nation_vol"))
        .to_pandas()
    )
    if per_year.empty:
        return _empty_df({"o_year": pa.int64(), "mkt_share": pa.float64()})
    per_year["mkt_share"] = round_half_away(
        per_year["nation_vol"] / per_year["total"], 4)
    return (per_year[["o_year", "mkt_share"]]
            .astype({"o_year": "int64"})
            .sort_values("o_year").reset_index(drop=True))


def events_type_quantiles(sf_dir: str, qs=(0.5, 0.9)):
    """Per-group exact quantiles (percentile_disc semantics): one
    (event_type, q, value) row per group and quantile.

    Scale shape: one ``groupby(event_type).map_groups`` shuffle with a
    vectorized in-group sort. Contract: one type's values fit one group —
    when a group outgrows a task, swap the in-group sort for the
    histogram-refinement pass :func:`events_value_quantiles` runs
    globally (same code per key)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        n = len(v)
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "q": list(qs),
            "value": [float(v[max(1, int(np.ceil(q * n))) - 1])
                      for q in qs],
        })

    return ds.groupby("event_type").map_groups(per_type,
                                               batch_format="pandas")


def bloom_semi_join_revenue(sf_dir: str, priority: str = "1-URGENT",
                            n_bits: int = 1 << 20):
    """Revenue of lineitems whose order has the given priority, computed
    with a BLOOM-FILTER-pruned semi-join: the build side's keys become a
    compact bit array that prefilters the probe scan, and only the
    (small) candidate set enters the exact distributed hash join — so the
    all-to-all moves ~|matches| + false-positive rows instead of the full
    fact table. The exact join makes the result independent of the
    false-positive rate; the bloom only prunes.

    Scale shape: per-block partial blooms are OR-combined (blocks × 128 KB
    for the default 2^20 bits — driver-cheap) and broadcast once via
    ``ray.put``; two splitmix64-derived hash probes per key, fully
    vectorized."""
    import ray
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    okeys = _read(sf_dir, "orders",
                  columns=["o_orderkey", "o_orderpriority"]).filter(
        expr=f"o_orderpriority == {priority!r}"
    ).select_columns(["o_orderkey"]).materialize()

    mask = np.uint64(n_bits - 1)

    def _probes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # two independent probes from one splitmix64 finalization
        z = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return (z & mask, (z >> np.uint64(32)) & mask)

    def block_bloom(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_bits, dtype=bool)
        h1, h2 = _probes(t["o_orderkey"].to_numpy())
        bits[h1] = True
        bits[h2] = True
        return pa.table({"bloom": pa.array([np.packbits(bits).tobytes()],
                                           pa.binary())})

    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in okeys.map_batches(block_bloom,
                                 batch_format="pyarrow").iter_rows():
        merged |= np.frombuffer(row["bloom"], dtype=np.uint8)
    bloom_ref = ray.put(np.unpackbits(merged).astype(bool))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        bits = ray.get(bloom_ref)
        h1, h2 = _probes(df["l_orderkey"].to_numpy(dtype=np.int64))
        return df[bits[h1] & bits[h2]]

    cand = li.map_batches(prefilter, batch_format="pandas")
    exact = cand.join(okeys, join_type="inner",
                      num_partitions=default_join_partitions(),
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "revenue": df["l_extendedprice"] * (1.0 - df["l_discount"]),
            "n_items": np.ones(len(df), dtype=np.int64),
        })
        return out.groupby("l_returnflag", as_index=False).sum()

    res = (
        exact.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    if res.empty:
        return _empty_df({"l_returnflag": pa.string(),
                          "revenue": pa.float64(), "n_items": pa.int64()})
    res["revenue"] = round_half_away(res["revenue"], 2)
    res["n_items"] = res["n_items"].astype("int64")
    return res.sort_values("l_returnflag").reset_index(drop=True)


def salted_type_stats(sf_dir: str, num_salts: int = 32):
    """Per-event-type count/sum computed through EXPLICIT key salting — the
    skew pattern the north rule calls for, as a first-class operator: stage
    1 groups by (event_type, salt) so one hot type's rows spread over
    ``num_salts`` independent reducers; stage 2 combines the ≤ num_salts
    partial rows per type. For combinable aggregates the per-batch
    combiner below already collapses hot keys to one row per block — the
    salted two-stage shape is the tool for when the per-group state is NOT
    combinable (heavy sketches, map_groups UDFs) and one reducer would
    otherwise hold a whole hot key."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "salt": (df["event_id"].to_numpy(np.int64) % num_salts),
            "value": df["value"],
            "n": np.ones(len(df), dtype=np.int64),
        })
        return out.groupby(["event_type", "salt"], as_index=False).sum()

    staged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "salt"])
        .aggregate(Sum("value", alias_name="value"),
                   Sum("n", alias_name="n"))
        # stage 2: ≤ num_salts rows per type — a trivially small combine
        .groupby("event_type")
        .aggregate(Sum("value", alias_name="sum_value"),
                   Sum("n", alias_name="n_events"))
        .to_pandas()
    )
    if staged.empty:
        return _empty_df({"event_type": pa.string(),
                          "n_events": pa.int64(),
                          "sum_value": pa.float64()})
    return pd.DataFrame({
        "event_type": staged["event_type"],
        "n_events": staged["n_events"].astype("int64"),
        "sum_value": round_half_away(staged["sum_value"], 2),
    }).sort_values("event_type").reset_index(drop=True)


def orders_rollup(sf_dir: str):
    """ROLLUP(year, priority) totals: finest-level distributed partials →
    bounded driver combine → the coarser levels derived additively (never a
    second scan). Rollup sentinel rows use -1 / 'ALL' instead of NULL so
    the result hashes identically across engines."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority",
                                          "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_year": df["o_orderdate"].dt.year.astype("int64"),
            "o_orderpriority": df["o_orderpriority"],
            "n_orders": np.ones(len(df), dtype=np.int64),
            "total_price": df["o_totalprice"],
        })
        return out.groupby(["o_year", "o_orderpriority"],
                           as_index=False).sum()

    # bounded: years × priorities × blocks rows
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return _empty_df({"o_year": pa.int64(),
                          "o_orderpriority": pa.string(),
                          "n_orders": pa.int64(),
                          "total_price": pa.float64()})
    fine = parts.groupby(["o_year", "o_orderpriority"], as_index=False)[
        ["n_orders", "total_price"]].sum()
    by_year = fine.groupby("o_year", as_index=False)[
        ["n_orders", "total_price"]].sum()
    by_year["o_orderpriority"] = "ALL"
    grand = pd.DataFrame({
        "o_year": [-1], "o_orderpriority": ["ALL"],
        "n_orders": [fine["n_orders"].sum()],
        "total_price": [fine["total_price"].sum()],
    })
    out = pd.concat([fine, by_year, grand], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_price"] = round_half_away(out["total_price"], 2)
    return (out[["o_year", "o_orderpriority", "n_orders", "total_price"]]
            .sort_values(["o_year", "o_orderpriority"])
            .reset_index(drop=True))


def sole_supplier_orders(sf_dir: str, k: int = 10):
    """TPC-H q21 shape adapted to this schema (no commit/receipt dates):
    suppliers ranked by how many finished ('F') orders they supplied
    ALONE — the EXISTS / NOT-EXISTS pair collapsed into one per-order
    aggregate.

    Scale shape: lineitem emits distinct (orderkey, suppkey) pairs per
    block; ONE coarse exchange keyed by orderkey counts distinct
    suppliers per order and keeps sole-supplier survivors only (≤ 1 row
    per order). The 'F'-status key set filters the lineitem scan inline —
    broadcast while it fits, distributed hash join of the (already
    reduced) survivors past the threshold. Per-supplier count + name
    attach finish on the driver (supplier is a dimension)."""
    import ray

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
        default_join_partitions,
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def fkeys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderstatus"], "F")) \
            .select(["o_orderkey"])

    fkeys_ds = orders.map_batches(fkeys,
                                  batch_format="pyarrow").materialize()
    broadcast = fkeys_ds.count() <= 5_000_000
    if broadcast:
        f_ref = ray.put(np.sort(fkeys_ds.to_pandas()["o_orderkey"]
                                .to_numpy(np.int64)))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"].astype("int64"),
                            "l_suppkey": df["l_suppkey"].astype("int64")})
        if broadcast:
            fk = ray.get(f_ref)
            if len(fk):
                pos = np.clip(np.searchsorted(fk,
                                              out["l_orderkey"].to_numpy()),
                              0, len(fk) - 1)
                out = out[fk[pos] == out["l_orderkey"].to_numpy()]
            else:
                out = out.iloc[:0]
        return out.drop_duplicates()

    def sole(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        n = g.groupby("l_orderkey")["l_suppkey"].transform("nunique")
        return g[n == 1]

    survivors = coarse_group_reduce(
        li.map_batches(pairs, batch_format="pandas"),
        ["l_orderkey"], sole,
    )
    if not broadcast:
        survivors = survivors.join(
            fkeys_ds, join_type="inner",
            num_partitions=default_join_partitions(),
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
    per_supp = (
        survivors.select_columns(["l_suppkey"])
        .to_pandas()
        .groupby("l_suppkey", as_index=False).size()
        .rename(columns={"size": "n_sole_orders"})
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = per_supp.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out = out.sort_values(["n_sole_orders", "s_suppkey"],
                          ascending=[False, True]).head(k)
    return pd.DataFrame({
        "s_suppkey": out["s_suppkey"].astype("int64"),
        "s_name": out["s_name"],
        "n_sole_orders": out["n_sole_orders"].astype("int64"),
    }).reset_index(drop=True)


def parts_supplier_counts(sf_dir: str, k: int = 20):
    """TPC-H q16 shape adapted (no partsupp table): distinct suppliers
    per (p_brand, p_type), from the observed lineitem relationships.

    Scale shape: distinct (partkey, suppkey) via one coarse exchange;
    part's (brand, type) dims broadcast; the per-(brand, type) DISTINCT
    supplier count is a second coarse exchange keyed by the dimension
    pair — both combines vectorized."""
    import ray

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    part = _read(sf_dir, "part", ["p_partkey", "p_brand",
                                  "p_type"]).to_pandas().sort_values("p_partkey")
    pk_ref = ray.put((part["p_partkey"].to_numpy(np.int64),
                      part["p_brand"].to_numpy(object),
                      part["p_type"].to_numpy(object)))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].astype("int64"),
            "l_suppkey": df["l_suppkey"].astype("int64"),
        }).drop_duplicates()

    distinct = coarse_group_reduce(
        li.map_batches(pairs, batch_format="pandas"),
        ["l_partkey", "l_suppkey"],
        lambda g: g.drop_duplicates(),
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        from cmc_knowledge_graph_text2ttl_ray.functions.cluster import sorted_lookup

        keys, brands, types = ray.get(pk_ref)
        keep, pos = sorted_lookup(keys, df["l_partkey"].to_numpy())
        d = df[keep]
        p = pos[keep]
        return pd.DataFrame({"p_brand": brands[p], "p_type": types[p],
                             "l_suppkey": d["l_suppkey"].to_numpy()}
                            ).drop_duplicates()

    counts = (
        coarse_group_reduce(
            distinct.map_batches(attach, batch_format="pandas"),
            ["p_brand", "p_type"],
            lambda g: g.drop_duplicates()
            .groupby(["p_brand", "p_type"], as_index=False)["l_suppkey"]
            .nunique().rename(columns={"l_suppkey": "supplier_cnt"}),
        )
        .to_pandas()
    )
    return (counts.sort_values(
        ["supplier_cnt", "p_brand", "p_type"],
        ascending=[False, True, True]).head(k)
        .astype({"supplier_cnt": "int64"}).reset_index(drop=True))


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape adapted to this schema (no ``partsupp`` table): for
    every part observed in ``lineitem``, the supplier offering the minimum
    unit price (``l_extendedprice / l_quantity``), ties broken by lowest
    ``l_suppkey`` — the correlated min-cost subquery of Q2 collapsed into
    a distributed arg-min.

    Scale shape: the lineitem scan emits per-block partial minima per
    (partkey, suppkey) — the only rows that shuffle; ONE coarse exchange
    keyed by partkey re-minimizes and picks the arg-min supplier per part
    (vectorized sort + first). The result is dimension-sized (≤ one row
    per part), so brand / supplier-name attach happens on the driver."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        uc = df["l_extendedprice"].to_numpy() / df["l_quantity"].to_numpy()
        return (pd.DataFrame({
            "l_partkey": df["l_partkey"].astype("int64"),
            "l_suppkey": df["l_suppkey"].astype("int64"),
            "uc": uc})
            .groupby(["l_partkey", "l_suppkey"], as_index=False)["uc"].min())

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["l_partkey", "l_suppkey"], as_index=False)["uc"].min()
        g = g.sort_values(["l_partkey", "uc", "l_suppkey"], kind="mergesort")
        return g.drop_duplicates("l_partkey", keep="first")

    best = coarse_group_reduce(
        li.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], argmin,
    ).to_pandas()

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = (best.merge(part, left_on="l_partkey", right_on="p_partkey")
           .merge(sup, left_on="l_suppkey", right_on="s_suppkey"))
    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    out["min_cost"] = round_half_away(out["uc"].to_numpy(), 2)
    return (out[["p_partkey", "p_brand", "s_name", "min_cost"]]
            .sort_values("p_partkey").reset_index(drop=True))


def q9_profit_by_nation_year(sf_dir: str,
                             broadcast_threshold: int = 5_000_000):
    """TPC-H Q9 shape: profit ``l_extendedprice * (1 - l_discount)`` per
    (supplier nation, order year). The part-name LIKE filter is dropped
    (every part qualifies) — the join topology is the point.

    Scale shape: supplier→nation-name is a broadcast dimension lookup.
    The orders side is reduced DISTRIBUTED to (o_orderkey, o_year) pairs;
    under the threshold those ship once as two sorted numpy arrays and the
    single lineitem scan does year lookup + per-(nation, year) partial sums
    in one pass (only ~nations×years rows shuffle); past it, the standard
    distributed hash join on orderkey (q8's size-aware pattern).

    Profit sums run in EXACT 10^-4 units (price and discount are both
    2-decimal, so each product is an exact int64): a float partial-sum's
    combine-order drift was measured within one ulp of a ROUND(·, 2)
    half boundary at sf0.01, which would flip the rounded value between
    runs.  Integer summation is order-independent (magnitude bound:
    ≤1e9/row, ~6e8 rows per (nation, year) group at 100 TB → ≤6e17,
    inside int64); the oracle SQL mirrors the same units."""
    import ray
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sm = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey") \
        .sort_values("s_suppkey")
    skeys_ref = ray.put(sm["s_suppkey"].to_numpy(np.int64))
    snames_ref = ray.put(sm["n_name"].to_numpy(object))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def oyears(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_year": df["o_orderdate"].dt.year.astype("int64")})

    ord_years = orders.map_batches(oyears,
                                   batch_format="pandas").materialize()
    broadcast = ord_years.count() <= broadcast_threshold

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def attach_nation(df: pd.DataFrame) -> pd.DataFrame:
        from cmc_knowledge_graph_text2ttl_ray.functions.cluster import sorted_lookup

        sk = ray.get(skeys_ref)
        sn = ray.get(snames_ref)
        # inner-join semantics: a suppkey absent from supplier drops the row
        found, pos = sorted_lookup(sk, df["l_suppkey"].to_numpy())
        d = df[found]
        p = pos[found]
        cents = np.round(
            d["l_extendedprice"].to_numpy() * 100.0).astype("int64")
        keep = np.round(
            (1.0 - d["l_discount"].to_numpy()) * 100.0).astype("int64")
        return pd.DataFrame({
            "l_orderkey": d["l_orderkey"].astype("int64"),
            "nation": sn[p],
            "amount": cents * keep})

    if broadcast:
        om = ord_years.to_pandas().sort_values("o_orderkey")
        okeys_ref = ray.put(om["o_orderkey"].to_numpy(np.int64))
        oyears_ref = ray.put(om["o_year"].to_numpy(np.int64))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            d = attach_nation(df)
            ok = ray.get(okeys_ref)
            if len(ok) == 0:
                return pd.DataFrame({"nation": pd.Series(dtype=object),
                                     "o_year": pd.Series(dtype="int64"),
                                     "profit": pd.Series(dtype="int64")})
            pos = np.clip(np.searchsorted(ok, d["l_orderkey"].to_numpy()),
                          0, len(ok) - 1)
            d["o_year"] = ray.get(oyears_ref)[pos]
            d = d[ok[pos] == d["l_orderkey"].to_numpy()]
            return (d.groupby(["nation", "o_year"], as_index=False)["amount"]
                    .sum().rename(columns={"amount": "profit"}))

        agg = (li.map_batches(partial, batch_format="pandas")
               .groupby(["nation", "o_year"])
               .aggregate(Sum("profit", alias_name="profit")))
    else:
        joined = li.map_batches(attach_nation, batch_format="pandas").join(
            ord_years, join_type="inner",
            num_partitions=default_join_partitions(),
            on=("l_orderkey",), right_on=("o_orderkey",))
        agg = (joined.groupby(["nation", "o_year"])
               .aggregate(Sum("amount", alias_name="profit")))

    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    out = agg.to_pandas()
    out["profit"] = round_half_away(
        out["profit"].to_numpy().astype("float64") / 1e4, 2)
    return (out.sort_values(["nation", "o_year"])
            .reset_index(drop=True)[["nation", "o_year", "profit"]])


def q11_important_parts(sf_dir: str, factor: float = 1.1):
    """TPC-H Q11 shape adapted (no partsupp): parts whose total lineitem
    quantity exceeds ``factor ×`` the average per-part total — the
    global-scalar HAVING subquery of Q11.

    Scale shape: one lineitem scan with per-block partial (qty, value)
    sums per partkey; ONE coarse exchange finishes the per-part totals
    (dimension-sized result). The global threshold is a driver-side
    scalar over that small aggregate — no second pass over the fact
    table. Quantity sums are integer-valued doubles, so the threshold
    comparison is exact-deterministic at any partition order."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "p_partkey": df["l_partkey"].astype("int64"),
            "sum_qty": df["l_quantity"].to_numpy(),
            "value": df["l_extendedprice"].to_numpy()})
            .groupby("p_partkey", as_index=False).sum())

    totals = coarse_group_reduce(
        li.map_batches(partial, batch_format="pandas"),
        ["p_partkey"],
        lambda g: g.groupby("p_partkey", as_index=False).sum(),
    ).to_pandas()
    if totals.empty:
        return _empty_df({"p_partkey": pa.int64(), "sum_qty": pa.float64(),
                          "value": pa.float64()})
    threshold = factor * (totals["sum_qty"].sum() / len(totals))
    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    out = totals[totals["sum_qty"] > threshold].copy()
    out["value"] = round_half_away(out["value"].to_numpy(), 2)
    return (out.sort_values("p_partkey")
            .reset_index(drop=True)[["p_partkey", "sum_qty", "value"]])


def q20_dominant_suppliers(sf_dir: str, factor: float = 2.0, k: int = 100):
    """TPC-H Q20 shape adapted: suppliers who supplied some part at more
    than ``factor ×`` the average supplier's share of that part's total
    quantity — Q20's nested half-of-total-quantity semi-join re-expressed
    as a per-part dominance test.

    Scale shape: lineitem emits per-block partial quantity sums per
    (partkey, suppkey); ONE coarse exchange keyed by partkey finishes the
    pair sums AND evaluates the dominance predicate inside the same task
    (the per-part total and supplier count never leave the partition).
    Only dominating (suppkey, partkey) survivors — a tiny set — reach the
    final supplier rollup. Sums are integer-valued doubles → the
    threshold compare is partition-order-deterministic."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "l_partkey": df["l_partkey"].astype("int64"),
            "l_suppkey": df["l_suppkey"].astype("int64"),
            "qty": df["l_quantity"].to_numpy()})
            .groupby(["l_partkey", "l_suppkey"], as_index=False).sum())

    def dominate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["l_partkey", "l_suppkey"], as_index=False).sum()
        grp = g.groupby("l_partkey")["qty"]
        avg_share = grp.transform("sum") / grp.transform("size")
        return g[g["qty"] > factor * avg_share][["l_suppkey", "l_partkey"]]

    winners = coarse_group_reduce(
        li.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], dominate,
    ).to_pandas()

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    if winners.empty:
        return _empty_df({"s_suppkey": pa.int64(), "s_name": pa.string(),
                          "dominated_parts": pa.int64()})
    counts = (winners.groupby("l_suppkey", as_index=False)["l_partkey"]
              .nunique().rename(columns={"l_suppkey": "s_suppkey",
                                         "l_partkey": "dominated_parts"}))
    out = counts.merge(sup, on="s_suppkey")
    return (out.sort_values(["dominated_parts", "s_suppkey"],
                            ascending=[False, True]).head(k)
            .astype({"dominated_parts": "int64"})
            .reset_index(drop=True)[["s_suppkey", "s_name",
                                     "dominated_parts"]])


_Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 25)


def q16_supplier_part_counts(sf_dir: str, excluded_brand: str = "Brand#5",
                             sizes: tuple = _Q16_SIZES,
                             broadcast_threshold: int = 2_000_000):
    """TPC-H Q16 shape adapted to this star schema (no partsupp table —
    lineitem's (partkey, suppkey) pairs are the supplier/part relation, the
    same adaptation as Q20; no s_comment — suppliers with negative account
    balance stand in for the customer-complaints exclusion): distinct
    supplier count per (brand, type, size) over non-excluded-brand parts
    of the listed sizes.

    Scale shape, adaptive like q13/customers_without_orders: while the
    filtered part rows fit ``broadcast_threshold``, the (partkey →
    brand/type/size) map broadcasts once via ``ray.put`` and the
    bad-supplier key array rides the same ref — zero joins. Past it (part
    scales with SF in TPC-H) the lineitem pair stream instead anti-joins
    the bad suppliers and inner-joins the filtered part table distributed
    — no driver materialization of either side. Both paths end in the
    same ONE coarse exchange keyed by the 3 group columns (group
    cardinality = brands × types × sizes, driver-small), and are
    parity-tested against each other."""
    import math

    import ray

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
        default_join_partitions,
    )

    part_f = _read(sf_dir, "part",
                   ["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(
            lambda df: df[(df["p_brand"] != excluded_brand)
                          & df["p_size"].isin(sizes)],
            batch_format="pandas")
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    keys = ["p_brand", "p_type", "p_size"]

    def distinct_count(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop_duplicates()
                .groupby(keys, as_index=False)["s"].nunique()
                .rename(columns={"s": "supplier_cnt"}))

    n_part = part_f.count()
    if n_part <= broadcast_threshold:
        part = part_f.to_pandas()
        bad = _read(sf_dir, "supplier",
                    ["s_suppkey", "s_acctbal"]).to_pandas()
        bad_keys = np.sort(bad.loc[bad["s_acctbal"] < 0,
                                   "s_suppkey"].to_numpy(np.int64))
        ref = ray.put((dict(zip(part["p_partkey"], part["p_brand"])),
                       dict(zip(part["p_partkey"], part["p_type"])),
                       dict(zip(part["p_partkey"],
                                part["p_size"].astype("int64"))),
                       bad_keys))

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            brand_map, type_map, size_map, bad_arr = ray.get(ref)
            df = df.drop_duplicates()
            supp = df["l_suppkey"].to_numpy(np.int64)
            if len(bad_arr):
                pos = np.clip(np.searchsorted(bad_arr, supp),
                              0, len(bad_arr) - 1)
                ok = bad_arr[pos] != supp
            else:
                ok = np.ones(len(supp), dtype=bool)
            brand = df["l_partkey"].map(brand_map)
            keep = ok & brand.notna().to_numpy()
            d = df[keep]
            return pd.DataFrame({
                "p_brand": brand[keep].to_numpy(dtype=object),
                "p_type": d["l_partkey"].map(type_map)
                          .to_numpy(dtype=object),
                "p_size": d["l_partkey"].map(size_map).to_numpy(np.int64),
                "s": d["l_suppkey"].to_numpy(np.int64),
            }).drop_duplicates()

        grouped = li.map_batches(pairs, batch_format="pandas")
    else:
        bad_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]) \
            .map_batches(
                lambda df: pd.DataFrame(
                    {"s_suppkey": df.loc[df["s_acctbal"] < 0, "s_suppkey"]
                     .astype("int64")}),
                batch_format="pandas").materialize()
        n_bad = bad_ds.count()
        # partition counts sized by the SMALL side (empty-block join guard)
        np_part = max(1, min(default_join_partitions(),
                             math.ceil(n_part / 50_000)))
        np_bad = max(1, min(default_join_partitions(),
                            math.ceil(max(n_bad, 1) / 50_000)))
        pair_stream = li.map_batches(
            lambda df: df.drop_duplicates()
            .astype({"l_partkey": "int64", "l_suppkey": "int64"}),
            batch_format="pandas")
        if n_bad:
            pair_stream = pair_stream.join(
                bad_ds, join_type="left_anti", num_partitions=np_bad,
                on=("l_suppkey",), right_on=("s_suppkey",))
        joined = pair_stream.join(
            part_f, join_type="inner", num_partitions=np_part,
            on=("l_partkey",), right_on=("p_partkey",))
        grouped = joined.map_batches(
            lambda df: pd.DataFrame({
                "p_brand": df["p_brand"].to_numpy(dtype=object),
                "p_type": df["p_type"].to_numpy(dtype=object),
                "p_size": df["p_size"].to_numpy(np.int64),
                "s": df["l_suppkey"].to_numpy(np.int64),
            }).drop_duplicates(),
            batch_format="pandas")

    counts = coarse_group_reduce(grouped, keys, distinct_count).to_pandas()
    if counts.empty:
        return _empty_df({"p_brand": pa.string(), "p_type": pa.string(),
                          "p_size": pa.int64(), "supplier_cnt": pa.int64()})
    return (counts.astype({"supplier_cnt": "int64", "p_size": "int64"})
            .sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                         ascending=[False, True, True, True])
            .reset_index(drop=True))


def q21_waiting_suppliers(sf_dir: str, k: int = 100):
    """TPC-H Q21 shape adapted (no commit/receipt dates — a supplier "kept
    the order waiting" when it is the UNIQUE latest shipper of a finished
    multi-supplier order): per supplier, the number of 'F' orders with ≥2
    suppliers where this supplier's last ship date is strictly the
    order's latest. Q21's EXISTS (another supplier) / NOT EXISTS (another
    equally-late supplier) pair becomes nsupp ≥ 2 ∧ n_at_max = 1.

    Scale shape: NO fact⋈fact join — lineitem partials (orderkey, suppkey,
    max shipdate per block) and orders' status rows (suppkey = -1
    sentinel) UNION into ONE coarse exchange keyed by orderkey; the
    combiner finishes the per-pair max, evaluates the waiting predicate
    and emits only winner pairs. The supplier rollup is bounded by the
    supplier count and merges names on the driver like Q20."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "l_orderkey": df["l_orderkey"].astype("int64"),
            "l_suppkey": df["l_suppkey"].astype("int64"),
            "v": df["l_shipdate"].astype("datetime64[ns]")
                 .astype("int64")})
            .groupby(["l_orderkey", "l_suppkey"], as_index=False).max())

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def status_rows(df: pd.DataFrame) -> pd.DataFrame:
        f = df[df["o_orderstatus"] == "F"]
        return pd.DataFrame({
            "l_orderkey": f["o_orderkey"].astype("int64"),
            "l_suppkey": np.full(len(f), -1, dtype=np.int64),
            "v": np.zeros(len(f), dtype=np.int64),
        })

    merged = li.map_batches(li_partial, batch_format="pandas").union(
        orders.map_batches(status_rows, batch_format="pandas"))

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        is_status = g["l_suppkey"].to_numpy() == -1
        f_orders = set(g.loc[is_status, "l_orderkey"].tolist())
        sup = (g[~is_status]
               .groupby(["l_orderkey", "l_suppkey"], as_index=False)["v"]
               .max())
        sup = sup[sup["l_orderkey"].isin(f_orders)]
        if sup.empty:
            return pd.DataFrame({"l_suppkey": pd.Series(dtype="int64")})
        grp = sup.groupby("l_orderkey")["v"]
        order_last = grp.transform("max")
        nsupp = grp.transform("size")
        at_max = sup["v"].to_numpy() == order_last.to_numpy()
        n_at_max = (sup.assign(_am=at_max).groupby("l_orderkey")["_am"]
                    .transform("sum"))
        win = sup[(nsupp.to_numpy() >= 2) & at_max
                  & (n_at_max.to_numpy() == 1)]
        return pd.DataFrame({"l_suppkey":
                             win["l_suppkey"].to_numpy(np.int64)})

    waiting_ds = coarse_group_reduce(merged, ["l_orderkey"], winners)
    # second distributed reduce: winner pairs (one per waiting order)
    # collapse to per-supplier counts BEFORE anything reaches the driver —
    # the collected table is bounded by the waiting-supplier count, never
    # by the order count
    counts = coarse_group_reduce(
        waiting_ds, ["l_suppkey"],
        lambda g: (g.groupby("l_suppkey", as_index=False).size()
                   .rename(columns={"size": "numwait"})),
    ).to_pandas()
    if counts.empty:
        return _empty_df({"s_name": pa.string(), "numwait": pa.int64()})
    counts = counts.rename(columns={"l_suppkey": "s_suppkey"})
    # name lookup: broadcast the (sorted) waiting-supplier keys and filter
    # the supplier scan to just those rows — no supplier-table collection,
    # no shuffle; the merge input is ≤ len(counts) rows
    import ray as _ray

    keys_ref = _ray.put(np.sort(counts["s_suppkey"].to_numpy(np.int64)))

    def name_rows(df: pd.DataFrame) -> pd.DataFrame:
        keys_arr = _ray.get(keys_ref)
        sk = df["s_suppkey"].to_numpy(np.int64)
        pos = np.clip(np.searchsorted(keys_arr, sk), 0, len(keys_arr) - 1)
        return df[keys_arr[pos] == sk][["s_suppkey", "s_name"]]

    sup = (_read(sf_dir, "supplier", ["s_suppkey", "s_name"])
           .map_batches(name_rows, batch_format="pandas").to_pandas())
    out = counts.merge(sup, on="s_suppkey")
    return (out.sort_values(["numwait", "s_name"],
                            ascending=[False, True]).head(k)
            .astype({"numwait": "int64"})
            .reset_index(drop=True)[["s_name", "numwait"]])


def skew_safe_join_priority_quantity(sf_dir: str, hot_k: int = 64):
    """Skew-safe fact-fact join: per-priority lineitem quantity via
    lineitem ⋈ orders, with the join SPLIT on hot keys — the canonical
    mitigation when a handful of join keys dominate (one reducer would
    otherwise receive a whole hot key's rows).

    Scale shape: (1) a Misra-Gries pass finds the top-``hot_k`` heaviest
    join keys in ONE constant-exchange scan (guaranteed to contain every
    key above n/(k+1)); (2) the hot keys' right-side rows — ≤ hot_k rows
    — broadcast via ``ray.put`` and their lineitem rows map-join in-task
    with NO shuffle; (3) the cold remainder takes the normal distributed
    hash join, now free of its heaviest keys. Results are identical to a
    plain join (the DuckDB oracle checks exactly that) — on uniform
    TPC-H keys the split is a no-op semantically, which is the point:
    correctness never depends on the skew profile.
    """
    import ray
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        default_join_partitions,
    )
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        mg_heavy_hitters,
    )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])

    hh = mg_heavy_hitters(li, "l_orderkey", k=hot_k)
    hot_keys = pa.array(sorted(int(v) for v in hh["item"]), pa.int64())

    # right-side rows for the hot keys: ≤ hot_k rows to the driver
    orders_hot = orders.map_batches(
        lambda t: t.filter(pc.is_in(t["o_orderkey"], value_set=hot_keys)),
        batch_format="pyarrow").to_pandas()
    hot_map = dict(zip(orders_hot["o_orderkey"].astype("int64"),
                       orders_hot["o_orderpriority"]))
    hot_ref = ray.put(hot_map)

    def hot_side(t: pa.Table) -> pa.Table:
        import pandas as pd_

        sub = t.filter(pc.is_in(t["l_orderkey"], value_set=hot_keys))
        if sub.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "qty": pa.array([], pa.float64())})
        m = ray.get(hot_ref)
        pr = pd_.Series(sub["l_orderkey"].to_numpy()).map(m)
        out = pa.table({
            "o_orderpriority": pa.array(pr, pa.string()),
            "qty": sub["l_quantity"].cast(pa.float64()),
        })
        return out.group_by("o_orderpriority").aggregate(
            [("qty", "sum")]).rename_columns(["o_orderpriority", "qty"])

    def cold_side(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(
            pc.is_in(t["l_orderkey"], value_set=hot_keys)))

    hot_partials = li.map_batches(hot_side, batch_format="pyarrow")

    cold = li.map_batches(cold_side, batch_format="pyarrow").join(
        orders, join_type="inner",
        num_partitions=default_join_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    ).map_batches(
        lambda t: pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "qty": t["l_quantity"].cast(pa.float64()),
        }).group_by("o_orderpriority").aggregate(
            [("qty", "sum")]).rename_columns(["o_orderpriority", "qty"]),
        batch_format="pyarrow")

    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    out = (hot_partials.union(cold)
           .groupby("o_orderpriority")
           .aggregate(Sum("qty", alias_name="total_qty"))
           .to_pandas())
    out["total_qty"] = round_half_away(out["total_qty"].to_numpy(), 2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def events_retention_cohorts(sf_dir: str,
                             broadcast_threshold: int = 5_000_000):
    """Retention cohort analysis: users are cohorted by their first active
    day; for each (cohort_day, day_offset) count the users still active —
    the classic activation/retention matrix.

    Scale shape: (1) ONE scan reduces the stream to DISTINCT (user, day)
    pairs (per-block dedup before the coarse exchange — the raw event
    count never shuffles); (2) first-active-day per user is a min over
    those pairs; (3) under ``broadcast_threshold`` users the cohort map
    broadcasts via ``ray.put`` and the pairs stream-map against it, else
    a distributed hash join keyed on user; (4) the final count is a tiny
    groupby over (cohort, offset) cells.
    """
    import ray
    from ray.data.aggregate import Count

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
        default_join_partitions,
    )

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        out = pa.table({"user_id": t["user_id"].combine_chunks()
                        .cast(pa.int64()), "day": day})
        return out.group_by(["user_id", "day"]).aggregate([])

    pairs = coarse_group_reduce(
        ds.map_batches(day_pairs, batch_format="pyarrow"),
        ["user_id", "day"],
        lambda g: g.drop_duplicates(["user_id", "day"]),
    ).materialize()

    first = coarse_group_reduce(
        pairs, ["user_id"],
        lambda g: g.groupby("user_id", as_index=False)["day"].min()
        .rename(columns={"day": "cohort"}),
    ).materialize()

    if first.count() <= broadcast_threshold:
        fm = first.to_pandas()
        cohort_of = dict(zip(fm["user_id"].astype("int64"), fm["cohort"]))
        ref = ray.put(cohort_of)

        def offsets(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(ref)
            cohort = df["user_id"].astype("int64").map(m)
            off = ((df["day"] - cohort).dt.total_seconds() // 86400) \
                .astype("int64")
            return pd.DataFrame({"cohort_day": cohort,
                                 "day_offset": off})

        cells = pairs.map_batches(offsets, batch_format="pandas")
    else:
        joined = pairs.join(
            first, join_type="inner",
            num_partitions=default_join_partitions(),
            on=("user_id",),
        )

        def offsets(df: pd.DataFrame) -> pd.DataFrame:
            off = ((df["day"] - df["cohort"]).dt.total_seconds() // 86400) \
                .astype("int64")
            return pd.DataFrame({"cohort_day": df["cohort"],
                                 "day_offset": off})

        cells = joined.map_batches(offsets, batch_format="pandas")

    return (cells.groupby(["cohort_day", "day_offset"])
            .aggregate(Count(alias_name="n_users"))
            .map_batches(
                lambda df: df.assign(n_users=df["n_users"].astype("int64")),
                batch_format="pandas")
            .sort(["cohort_day", "day_offset"]))


def events_rolling_active_users(sf_dir: str, window: int = 7):
    """Rolling window-active-users (WAU-style): for each observed day,
    the count of distinct users active in the trailing ``window`` days.

    Scale shape: the stream reduces to DISTINCT (user, day) pairs once
    (per-block dedup before the coarse exchange); each pair then fans out
    to the ``window`` days it keeps the user "active" for (a vectorized
    repeat — the fan-out is ×window on the already-tiny pair table, not
    on raw events); a second distinct collapses multi-day users; the
    final count per day is a small groupby. Days with no events are not
    reported (the window is evaluated at observed days only).
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Count

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        out = pa.table({"user_id": t["user_id"].combine_chunks()
                        .cast(pa.int64()), "day": day})
        return out.group_by(["user_id", "day"]).aggregate([])

    pairs = coarse_group_reduce(
        ds.map_batches(day_pairs, batch_format="pyarrow"),
        ["user_id", "day"],
        lambda g: g.drop_duplicates(["user_id", "day"]),
    ).materialize()

    # observed days: tiny (≤ corpus day span) — broadcast for the clip
    days = sorted({d for r in pairs.groupby("day").count().take_all()
                   for d in [r["day"]]})
    days_ref = ray.put(set(pd.Timestamp(d) for d in days))

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        obs = ray.get(days_ref)
        n = len(df)
        if n == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "day": pd.Series(dtype="datetime64[us]")})
        offs = pd.to_timedelta(np.tile(np.arange(window), n), unit="D")
        out = pd.DataFrame({
            "user_id": np.repeat(df["user_id"].to_numpy(np.int64), window),
            "day": np.repeat(df["day"].to_numpy(), window) + offs,
        })
        out = out[out["day"].isin(obs)]
        return out.drop_duplicates(["user_id", "day"])

    active = coarse_group_reduce(
        pairs.map_batches(fan_out, batch_format="pandas"),
        ["user_id", "day"],
        lambda g: g.drop_duplicates(["user_id", "day"]),
    )

    return (active.groupby("day")
            .aggregate(Count(alias_name="active_users"))
            .map_batches(
                lambda df: df.assign(
                    active_users=df["active_users"].astype("int64")),
                batch_format="pandas")
            .sort("day"))


def segment_year_pivot(sf_dir: str, years=range(1995, 2002)):
    """PIVOT shape: order counts as a (market segment × order year)
    matrix — one column per year. The wide step is a normal distributed
    (segment, year) count with per-block combiners; the pivot itself runs
    over the tiny aggregated cell table on the driver (segments × years
    cells), which is the correct place for a reshape at any scale.
    Customer segments arrive by dimension broadcast — the orders fact
    table never joins wide."""
    import ray
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import sorted_lookup

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas() \
        .sort_values("c_custkey")
    keys_ref = ray.put(cust["c_custkey"].to_numpy(np.int64))
    seg_ref = ray.put(cust["c_mktsegment"].to_numpy(object))

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        segs = ray.get(seg_ref)
        found, pos = sorted_lookup(keys, df["o_custkey"].to_numpy(np.int64))
        d = pd.DataFrame({
            "segment": np.where(found, segs[pos], None),
            "year": pd.to_datetime(df["o_orderdate"]).dt.year
            .astype("int64"),
        })
        d = d[d["segment"].notna()]
        out = d.groupby(["segment", "year"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    agg = (_read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
           .map_batches(cells, batch_format="pandas")
           .groupby(["segment", "year"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    wide = agg.pivot_table(index="segment", columns="year", values="n",
                           fill_value=0, aggfunc="sum")
    out = pd.DataFrame({"c_mktsegment": wide.index})
    for y in years:
        out[f"y{y}"] = (wide[y].to_numpy(np.int64) if y in wide.columns
                        else np.zeros(len(wide), np.int64))
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def part_size_unpivot(sf_dir: str):
    """UNPIVOT/melt shape: the part table's per-row numeric measures
    (size, retailprice) unpivoted to (p_partkey, measure, value) long
    form — a pure vectorized row-expanding map (each block melts
    independently; no shuffle, no state)."""
    p = _read(sf_dir, "part",
              columns=["p_partkey", "p_size", "p_retailprice"])

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = t["p_partkey"].combine_chunks().cast(pa.int64())
        size = t["p_size"].combine_chunks().cast(pa.float64())
        price = t["p_retailprice"].combine_chunks().cast(pa.float64())
        return pa.table({
            "p_partkey": pa.concat_arrays([keys, keys]),
            "measure": pa.array(["size"] * n + ["retailprice"] * n,
                                pa.string()),
            "value": pa.concat_arrays([size, price]),
        })

    return p.map_batches(melt, batch_format="pyarrow") \
        .sort(["p_partkey", "measure"])


def events_daily_anomalies(sf_dir: str, z_threshold: float = 2.0):
    """Daily-volume anomaly detection per event type: z-score of each
    day's event count against that type's distribution across days.

    Scale shape: the heavy step is the distributed (type, day) count with
    per-block combiners; the z-scores then run per type over the TINY
    cell table (types × days rows) via ``map_groups`` — each type's cells
    trivially fit one task at any corpus size."""
    from ray.data.aggregate import Count

    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        return pa.table({"event_type": t["event_type"], "day": day})

    cells = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby(["event_type", "day"])
             .aggregate(Count(alias_name="n")))

    def zscores(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.float64)
        mu = n.mean()
        sd = n.std(ddof=1) if len(n) > 1 else 0.0
        z = (n - mu) / sd if sd > 0 else np.zeros(len(n))
        out = pd.DataFrame({
            "event_type": g["event_type"],
            "day": g["day"],
            "n": g["n"].astype("int64"),
            "z": round_half_away(z, 4),
        })
        out["is_anomaly"] = (np.abs(z) > z_threshold).astype("int64")
        return out

    return (cells.groupby("event_type")
            .map_groups(zscores, batch_format="pandas")
            .sort(["event_type", "day"]))


def lineitem_qty_price_corr(sf_dir: str):
    """Grouped Pearson correlation (quantity vs extended price per return
    flag) as a single-pass DISTRIBUTED MOMENTS aggregate: each block emits
    (n, Σx, Σy, Σxx, Σyy, Σxy) per group — six numbers, perfectly
    combinable — and the correlation formula runs over the tiny reduced
    table. The classic two-column statistic without a second scan or any
    row shuffle."""
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(np.float64)
        y = df["l_extendedprice"].to_numpy(np.float64)
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "n": np.ones(len(df), np.int64),
            "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y,
        })
        return g.groupby("l_returnflag", as_index=False).sum()

    red = (ds.map_batches(partial, batch_format="pandas")
           .groupby("l_returnflag")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy"),
                      Sum("sxy", alias_name="sxy"))
           .to_pandas())
    n = red["n"].to_numpy(np.float64)
    cov = red["sxy"] - red["sx"] * red["sy"] / n
    vx = red["sxx"] - red["sx"] ** 2 / n
    vy = red["syy"] - red["sy"] ** 2 / n
    corr = cov / np.sqrt(vx * vy)
    return pd.DataFrame({
        "l_returnflag": red["l_returnflag"],
        "n": red["n"].astype("int64"),
        "corr_qty_price": round_half_away(corr.to_numpy(np.float64), 4),
    }).sort_values("l_returnflag").reset_index(drop=True)


def lineitem_price_regression(sf_dir: str):
    """Grouped OLS regression (extended price ~ quantity per return flag)
    from the same single-pass distributed moment sums as
    :func:`lineitem_qty_price_corr` — slope and intercept per group with
    zero extra scans."""
    from ray.data.aggregate import Sum

    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(np.float64)
        y = df["l_extendedprice"].to_numpy(np.float64)
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "n": np.ones(len(df), np.int64),
            "sx": x, "sy": y, "sxx": x * x, "sxy": x * y,
        })
        return g.groupby("l_returnflag", as_index=False).sum()

    red = (ds.map_batches(partial, batch_format="pandas")
           .groupby("l_returnflag")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("sxy", alias_name="sxy"))
           .to_pandas())
    n = red["n"].to_numpy(np.float64)
    slope = ((red["sxy"] - red["sx"] * red["sy"] / n)
             / (red["sxx"] - red["sx"] ** 2 / n))
    intercept = red["sy"] / n - slope * red["sx"] / n
    return pd.DataFrame({
        "l_returnflag": red["l_returnflag"],
        "slope": round_half_away(slope.to_numpy(np.float64), 4),
        "intercept": round_half_away(intercept.to_numpy(np.float64), 2),
    }).sort_values("l_returnflag").reset_index(drop=True)


def orders_monthly_growth(sf_dir: str):
    """Month-over-month order-count growth: the distributed part is the
    monthly count (per-block combiners); the LAG/pct-change window then
    runs over the tiny months table on the driver."""
    from ray.data.aggregate import Count

    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.cast(pc.floor_temporal(
            t["o_orderdate"].combine_chunks().cast(pa.timestamp("us")),
            unit="month"), pa.timestamp("us"))
        return pa.table({"month": m})

    months = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby("month").aggregate(Count(alias_name="n_orders"))
              .to_pandas().sort_values("month").reset_index(drop=True))
    prev = months["n_orders"].shift(1)
    growth = (months["n_orders"] - prev) / prev * 100.0
    out = pd.DataFrame({
        "month": months["month"],
        "n_orders": months["n_orders"].astype("int64"),
        "growth_pct": round_half_away(
            growth.fillna(0.0).to_numpy(np.float64), 2),
    })
    return out
