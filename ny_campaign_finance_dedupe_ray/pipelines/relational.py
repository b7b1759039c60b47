"""Relational payoff operators — the reference's stats/aggregate SQL re-shaped
for Ray Data (SURVEY.md §2.7): top-k grouped sums with a broadcast dimension
join, cluster-size stats, filtered counts, and normalizer projections.

Scale idioms demonstrated here and reused by the stats stage:
- prune columns at the read (``read_parquet(columns=[...])``)
- partial aggregation inside ``map_batches`` before the (small) groupby
- broadcast the small dimension side with ``ray.put`` + per-batch lookup
  instead of a shuffle join
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions import textnorm


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order amount — the Top-10 deduped donors
    query (/root/reference/dedupe_extension/campaign_finance_dedupe.py:381-398)
    with orders as contributions and customers as donors.

    orders is the fact side (partial-agg per batch -> groupby sum); customer
    is broadcast (ray.put once)."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    name_ref = ray.put(
        (
            pa.array(cust["c_custkey"].to_numpy()),
            pa.array(cust["c_name"], pa.string()),
        )
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("o_custkey", as_index=False)["o_totalprice"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    totals = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total_amount"))
    )

    def attach_name(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys_arr, names_arr = ray.get(name_ref)
        # index_in + take: one vectorized dictionary lookup, no per-row dict
        # .get (same idiom as the part-type join below)
        pos = pc.index_in(t.column("o_custkey"), value_set=keys_arr)
        return pa.table(
            {
                "c_name": names_arr.take(pos),
                "total_amount": t.column("total_amount"),
            }
        )

    out = (
        totals.map_batches(attach_name, batch_format="pyarrow")
        .sort(["total_amount", "c_name"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["total_amount"] = out["total_amount"].round(2)
    return out


def customer_order_stats(sf_dir: str) -> pd.DataFrame:
    """Cluster-size stats over orders-per-customer — the MAX/AVG/COUNT
    cluster stats query (campaign_finance_dedupe.py:449-468) with customers
    as clusters."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column("o_custkey").value_counts()
        return pa.table(
            {"o_custkey": vc.field("values"), "partial": vc.field("counts")}
        )

    from ray.data.aggregate import Sum

    sizes = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("partial", alias_name="n_orders"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "total_customers": [int(len(sizes))],
            "max_orders": [int(sizes["n_orders"].max())],
            "avg_orders": [round(float(sizes["n_orders"].mean()), 6)],
            "total_orders": [int(sizes["n_orders"].sum())],
        }
    )


def event_type_counts(sf_dir: str) -> pd.DataFrame:
    """Filtered count by type — the transaction-code filter + count shape
    (/root/reference/data_load/all_txt_to_csv.py:28-33)."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("value"), 0.0))
        vc = t.column("event_type").value_counts()
        return pa.table(
            {"event_type": vc.field("values"), "partial": vc.field("counts")}
        )

    from ray.data.aggregate import Sum

    out = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("partial", alias_name="n"))
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def lineitem_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped pruned aggregate: demonstrates column-pruned read +
    per-batch partial aggregation before a tiny groupby."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        # Arrow-native partial: no pandas conversion in the wide stage
        agg = (
            pa.table(
                {
                    "l_returnflag": t.column("l_returnflag"),
                    "l_linestatus": t.column("l_linestatus"),
                    "sum_qty": t.column("l_quantity"),
                    "sum_revenue": rev,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [("sum_qty", "sum"), ("sum_revenue", "sum"), ([], "count_all")]
            )
        )
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_revenue", "n_rows"]
        )

    from ray.data.aggregate import Sum

    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_revenue", alias_name="sum_revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_revenue"] = out["sum_revenue"].round(2)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def normalize_documents(sf_dir: str) -> "ray.data.Dataset":
    """Lower/trim/punct-strip/null-empty projection over documents — the
    processed_donors normalizer shape
    (/root/reference/data_load/init_postgres_db.py:110-121,187-199)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_norm": textnorm.lower_trim_null(
                    textnorm.strip_punctuation(t.column("text"))
                ),
            }
        )

    return docs.map_batches(norm, batch_format="pyarrow")


PRIORITY_CODES = {
    "1-URGENT": "URG",
    "2-HIGH": "HIGH",
    "3-MEDIUM": "MED",
    "4-NOT SPECIFIED": "NS",
    "5-LOW": "LOW",
}


def orders_uuid(sf_dir: str) -> "ray.data.Dataset":
    """UUID builder + date handling over orders — the reference's
    contribution-uuid projection (init_postgres_db.py:214-227 date parse,
    :224 uuid concat)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def project(t: pa.Table) -> pa.Table:
        from ..functions.textnorm import build_uuid

        datestr = pc.strftime(t.column("o_orderdate"), format="%Y-%m-%d")
        uuid = build_uuid(t.column("o_orderkey"), t.column("o_custkey"), datestr)
        year = pc.year(t.column("o_orderdate")).cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "uuid": uuid,
                "e_year": year,
            }
        )

    return orders.map_batches(project, batch_format="pyarrow")


def priority_codes(sf_dir: str) -> "ray.data.Dataset":
    """Dictionary-encoded CASE mapping over o_orderpriority — the
    contributor-type coder shape (init_postgres_db.py:122-147) via
    vectorized index_in lookup."""
    from ..functions.textnorm import map_codes

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def project(t: pa.Table) -> pa.Table:
        codes = map_codes(
            t.column("o_orderpriority").combine_chunks()
            if isinstance(t.column("o_orderpriority"), pa.ChunkedArray)
            else t.column("o_orderpriority"),
            PRIORITY_CODES,
            null_code="NS",
            unknown_code="UNK",
        )
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "priority_code": codes}
        )

    return orders.map_batches(project, batch_format="pyarrow")


def gazette_top_orders(sf_dir: str, n_matches: int = 2) -> pd.DataFrame:
    """Gazetteer top-k shaped query: per customer, the top-n orders by
    amount (clustering.py:280-308 semantics over relational data)."""
    from ..stages.clustering import gazette_matching

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    def reshape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": t.column("o_custkey").cast(pa.string()),
                "id_b": t.column("o_orderkey").cast(pa.string()),
                "score": t.column("o_totalprice"),
            }
        )

    scores = orders.map_batches(reshape, batch_format="pyarrow")
    out = gazette_matching(scores, threshold=0.0, n_matches=n_matches).to_pandas()
    out = out.rename(
        columns={"id_a": "o_custkey", "id_b": "o_orderkey", "score": "o_totalprice"}
    )
    out["o_custkey"] = out["o_custkey"].astype("int64")
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)


def supplier_region_stats(sf_dir: str) -> pd.DataFrame:
    """Supplier count + rounded average account balance per region — the
    TPC-H-Q5-shaped dim-chain (region ⨝ nation ⨝ supplier) expressed
    Ray-Data-first: the two tiny dim tables collapse into ONE broadcast
    nationkey -> region_name map (ray.put once, read per task) and the
    supplier fact side partial-aggregates per batch before a 5-row groupby.
    No shuffle join anywhere."""
    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    rname = dict(zip(region["r_regionkey"], region["r_name"]))
    # broadcast the nationkey->region_name lookup as two aligned arrays so
    # the per-batch lookup is a vectorized index_in + take (the map_codes
    # idiom), not a per-row dict.get loop
    nation_keys = pa.array(nation["n_nationkey"].astype("int64"))
    region_names = pa.array(
        [rname[int(rk)] for rk in nation["n_regionkey"]], pa.string()
    )
    map_ref = ray.put((nation_keys, region_names))

    suppliers = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys_arr, names_arr = ray.get(map_ref)
        idx = pc.index_in(
            t.column("s_nationkey").cast(pa.int64()), value_set=keys_arr
        )
        df = pd.DataFrame(
            {
                "r_name": pc.take(names_arr, idx).to_pandas(),
                "bal": t.column("s_acctbal").to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby("r_name", as_index=False).agg(
            n_suppliers=("bal", "size"), sum_bal=("bal", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        suppliers.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("sum_bal", alias_name="sum_bal"),
        )
        .to_pandas()
    )
    out["avg_acctbal"] = (out["sum_bal"] / out["n_suppliers"]).round(4)
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return (
        out[["r_name", "n_suppliers", "avg_acctbal"]]
        .sort_values("r_name")
        .reset_index(drop=True)
    )


def part_type_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue by part type — the TPC-H-Q14 shape: lineitem ⨝ part where
    BOTH sides are fact-scaled, joined by bucketed groupby co-location
    (stages/joins.bucketed_join: one shuffle per side, no broadcast), then
    a per-batch partial aggregate into a tiny p_type groupby."""
    from ..stages.joins import bucketed_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def project(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table({"p_partkey": t.column("l_partkey"), "rev": rev})

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    joined = bucketed_join(
        li.map_batches(project, batch_format="pyarrow"), part, on="p_partkey"
    )

    def partial(t: pa.Table) -> pa.Table:
        agg = (
            pa.table({"p_type": t.column("p_type"), "rev": t.column("rev")})
            .group_by("p_type")
            .aggregate([("rev", "sum"), ([], "count_all")])
        )
        return agg.rename_columns(["p_type", "revenue", "n_items"])

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("p_type")
        .aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_items", alias_name="n_items"),
        )
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("p_type").reset_index(drop=True)


def customer_order_coalesce(sf_dir: str) -> "ray.data.Dataset":
    """Every customer with their order count/revenue, zero-coalesced — the
    reference e_map RIGHT JOIN COALESCE shape
    (campaign_finance_dedupe.py:376-379) as a general engine query: a
    both-large bucketed RIGHT join (stages/joins.py) preserving the
    customer side, then vectorized null coalesce."""
    import pyarrow.compute as pc

    from ..stages.joins import bucketed_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("o_custkey", "count"), ("o_totalprice", "sum")]
        )
        return pa.table(
            {
                "c_custkey": g.column("o_custkey"),
                "pn": g.column("o_custkey_count"),
                "pt": g.column("o_totalprice_sum"),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("pn", alias_name="n_orders"), Sum("pt", alias_name="total"))
    )
    joined = bucketed_join(agg, customer, on="c_custkey", how="right")

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_orders").fill_null(0).cast(pa.int64())
        tot = pc.round(t.column("total").fill_null(0.0), 2)
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "n_orders": n,
                "total_spent": tot,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
