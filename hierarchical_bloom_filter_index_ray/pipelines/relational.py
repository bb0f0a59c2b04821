"""Relational pipelines over the TPC-H-ish star tables.

Not reference operators — the engine-completeness side of the build brief:
the same map-side-combiner / broadcast-join patterns the sketch pipelines
use, exercised on numeric/relational data with exact DuckDB oracles.
Monetary sums convert to integer cents PER ROW before aggregation so both
engines sum integers (float summation order can flip a final rounding).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row money -> int64 cents (round-half-away, like DuckDB ROUND)."""
    v = col.to_numpy(zero_copy_only=False)
    return pa.array(np.floor(v * 100 + 0.5).astype(np.int64), pa.int64())


def pricing_summary(sf_dir: str, *, ship_cutoff: str = "2001-01-01"
                    ) -> "rd.Dataset":
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) counts
    and integer-cent monetary sums over lineitem rows shipped on/before
    the cutoff. Map-side per-batch partial aggregation (combiner) -> tiny
    groupby over <= #flag x #status groups."""
    cutoff = np.datetime64(ship_cutoff).astype("datetime64[us]")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship <= cutoff
        batch = batch.filter(pa.array(keep))
        if not batch.num_rows:
            return pa.schema([
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("sum_qty", pa.int64()),
                ("sum_base_cents", pa.int64()),
                ("sum_disc_cents", pa.int64()),
                ("n_rows", pa.int64()),
            ]).empty_table()
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        base_c = _cents(batch["l_extendedprice"]).to_numpy()
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        disc_c = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pandas(),
            "l_linestatus": batch["l_linestatus"].to_pandas(),
            "sum_qty": qty.astype(np.int64),
            "sum_base_cents": base_c,
            "sum_disc_cents": disc_c,
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_base_cents=("sum_base_cents", "sum"),
            sum_disc_cents=("sum_disc_cents", "sum"),
            n_rows=("sum_qty", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Sum("sum_base_cents", alias_name="sum_base_cents"),
                       Sum("sum_disc_cents", alias_name="sum_disc_cents"),
                       Sum("n_rows", alias_name="n_rows")))


def revenue_by_priority(sf_dir: str, *, num_partitions: int = 8
                        ) -> "rd.Dataset":
    """Revenue per order priority via Ray's NATIVE distributed hash join
    (big x big: lineitem joined to orders on the order key — both sides
    hash-partition, neither broadcasts), then a combiner + tiny groupby.
    Revenue converts to integer cents per row before summing."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def to_cents(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "rev_cents": pa.array(rev, pa.int64())})

    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority"])
    joined = li.map_batches(to_cents, batch_format="pyarrow").join(
        od, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def combine(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderpriority": batch["o_orderpriority"].to_pandas(),
            "rev_cents": batch["rev_cents"].to_numpy(
                zero_copy_only=False)})
        g = df.groupby("o_orderpriority", as_index=False).agg(
            rev_cents=("rev_cents", "sum"),
            n_items=("rev_cents", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    return (joined.map_batches(combine, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("rev_cents", alias_name="rev_cents"),
                       Sum("n_items", alias_name="n_items")))


def revenue_by_nation(sf_dir: str, *, num_partitions: int = 8
                      ) -> "rd.Dataset":
    """Revenue per customer nation: the canonical star-join shape — ONE
    big-big hash join (lineitem x orders on the order key), with the two
    dimension hops (customer -> nation) folded into a broadcast dict
    (1 driver-side read of the small tables, ``ray.put`` once, mapped
    inside the join's output batches — never a shuffle join of the big
    side against a dimension)."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"]).to_pandas()
    ckeys = cust["c_custkey"].to_numpy()
    cnames = nation.set_index("n_nationkey")["n_name"].reindex(
        cust["c_nationkey"].to_numpy()).to_numpy()
    # dense array LUT (custkeys are small ints): O(1) vectorized gather
    lut = np.empty(int(ckeys.max()) + 1, dtype=object)
    lut[ckeys] = cnames
    map_ref = ray.put(lut)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def to_cents(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "rev_cents": pa.array(rev, pa.int64())})

    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    joined = li.map_batches(to_cents, batch_format="pyarrow").join(
        od, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",))

    class Combine:
        def __init__(self):
            self.lut = ray.get(map_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
            names = self.lut[ck]
            df = pd.DataFrame({
                "n_name": names,
                "rev_cents": batch["rev_cents"].to_numpy(
                    zero_copy_only=False)})
            g = df.groupby("n_name", as_index=False).agg(
                rev_cents=("rev_cents", "sum"),
                n_items=("rev_cents", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    return (joined.map_batches(Combine, batch_format="pyarrow",
                               concurrency=(1, 8))
            .groupby("n_name")
            .aggregate(Sum("rev_cents", alias_name="rev_cents"),
                       Sum("n_items", alias_name="n_items")))


def suppliers_by_region(sf_dir: str) -> "rd.Dataset":
    """Per-region supplier counts + integer-cent balances: the two
    dimension hops (nation -> region) fold into one broadcast LUT mapped
    over the supplier stream."""
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"]
                             ).to_pandas()
    region = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    reg_name = region.set_index("r_regionkey")["r_name"]
    nk = nation["n_nationkey"].to_numpy()
    lut = np.empty(int(nk.max()) + 1, dtype=object)
    lut[nk] = reg_name.reindex(nation["n_regionkey"].to_numpy()).to_numpy()
    lut_ref = ray.put(lut)

    class ToRegion:
        def __init__(self):
            self.lut = ray.get(lut_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            names = self.lut[batch["s_nationkey"].to_numpy(
                zero_copy_only=False)]
            return pa.table({
                "r_name": pa.array(names.tolist(), pa.string()),
                "acctbal_cents": _cents(batch["s_acctbal"]),
            })

    from ray.data.aggregate import Count, Sum
    return (rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_nationkey", "s_acctbal"])
            .map_batches(ToRegion, batch_format="pyarrow",
                         concurrency=(1, 4))
            .groupby("r_name")
            .aggregate(Count(alias_name="n_suppliers"),
                       Sum("acctbal_cents", alias_name="acctbal_cents")))


def revenue_by_brand(sf_dir: str) -> "rd.Dataset":
    """Revenue per part brand: lineitem (big) against the part dimension
    via a broadcast dense LUT — never a shuffle join of the big side."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]).to_pandas()
    pk = part["p_partkey"].to_numpy()
    lut = np.empty(int(pk.max()) + 1, dtype=object)
    lut[pk] = part["p_brand"].to_numpy()
    lut_ref = ray.put(lut)

    class Combine:
        def __init__(self):
            self.lut = ray.get(lut_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            price = batch["l_extendedprice"].to_numpy(
                zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(
                np.int64)
            df = pd.DataFrame({
                "p_brand": self.lut[batch["l_partkey"].to_numpy(
                    zero_copy_only=False)],
                "rev_cents": rev})
            g = df.groupby("p_brand", as_index=False).agg(
                rev_cents=("rev_cents", "sum"),
                n_items=("rev_cents", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    return (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice",
                                     "l_discount"])
            .map_batches(Combine, batch_format="pyarrow",
                         concurrency=(1, 8))
            .groupby("p_brand")
            .aggregate(Sum("rev_cents", alias_name="rev_cents"),
                       Sum("n_items", alias_name="n_items")))


def top_customers_by_spend(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order spend with name/segment attached —
    the broadcast-join pattern: orders aggregate per custkey (combiner +
    small groupby); the small customer table rides to the driver where
    the lookup is a vectorized merge (at scale: ``ray.put`` the customer
    dict and map it in — never a shuffle join of the big side)."""
    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"]).to_numpy()
        df = pd.DataFrame({"o_custkey": batch["o_custkey"].to_numpy(
            zero_copy_only=False), "spend_cents": cents})
        g = df.groupby("o_custkey", as_index=False).agg(
            spend_cents=("spend_cents", "sum"),
            n_orders=("spend_cents", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    spend = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("o_custkey")
             .aggregate(Sum("spend_cents", alias_name="spend_cents"),
                        Sum("n_orders", alias_name="n_orders"))
             .sort(["spend_cents", "o_custkey"], descending=[True, False])
             .limit(k).to_pandas())
    cust = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name", "c_mktsegment"])
            .to_pandas())
    out = spend.merge(cust, left_on="o_custkey", right_on="c_custkey",
                      how="left")
    return out[["o_custkey", "c_name", "c_mktsegment", "spend_cents",
                "n_orders"]]
