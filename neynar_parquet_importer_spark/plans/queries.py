"""The engine's query surface: every operator family from SURVEY §2 plus
the training-data-pipeline extensions, each as a (spark, sf_dir) ->
DataFrame plan with a DuckDB oracle twin in ``ORACLE_SQL``.

Conventions (driver contract):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the correctness hash sorts columns by name);
- float aggregates are rounded (2 decimals for money, 4-6 for ratios) on
  BOTH sides so cross-engine summation order can't flip the hash;
- timestamps are projected as dates or epoch bigints (the events table is
  nanosecond-precision parquet, which Spark truncates to micros — raw
  timestamp output would hash-mismatch by design, not by bug);
- queries with no SQL-expressible oracle (the xxhash64-based MinHash/
  SimHash families, seeded-LSH/IVF probes, approximate sketches) are
  registered without an ORACLE_SQL entry -> driver rows-only check,
  backed by recall/containment property tests in tests/test_operators.py.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..filters import compile_filter
from ..functions.scalars import window_start
from ..operators import audit as aud
from ..operators import bloom as blm
from ..operators import classifier as clf
from ..operators import clustering as clu
from ..operators import cms as cm
from ..operators import corpus as crp
from ..operators import dedup as dd
from ..operators import diff as dff
from ..operators import histogram as hg
from ..operators import hll as hl
from ..operators import layout as lay
from ..operators import linkage as lk
from ..operators import retrieval as rtr
from ..operators import sampling as smp
from ..operators import scd as sc2
from ..operators import similarity as sim
from ..operators import text as tx
from ..operators import timeseries as tss
from ..graph import kcore as kcr
from ..graph import khop as kh
from ..graph import lpa
from ..graph import pagerank as pgr
from ..graph import triangles as tri
from ..operators.multimodal import documents_as_media, extract_features


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ntz_epoch_seconds(ts_col: str):
    """Epoch seconds from a TIMESTAMP_NTZ column, timezone-independent:
    an NTZ-to-NTZ timestampdiff. ``unix_timestamp(ts)`` on an NTZ column
    converts via the SESSION timezone — every query here must use this
    form instead so results don't silently depend on session.py pinning
    UTC (tests flip the session TZ to prove it)."""
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
    )


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.5/§2.6/§2.7: joins, aggs, sorts — the general
# surface Spark gives for free, exercised TPC-H-style)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation; Catalyst plans a
    partial (map-side) + final hash aggregate, so the shuffle carries only
    group rows, not data rows."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + grouped revenue + top-10; the top-10
    plans as TakeOrderedAndProject (no global sort).

    Broadcast policy (applies to the whole TPC-H family here): explicit
    broadcast hints are reserved for constant-cardinality frames (region
    5 rows, nation 25, one-row scalars, bounded filtered aggregates).
    Linear-growth dims — customer, supplier, part, per-part aggregates —
    carry NO hint: Catalyst/AQE broadcast them from size stats while they
    fit the threshold (they always do at bench scale, so the plans below
    still show BroadcastHashJoin), and at the corpus size where that
    stops being true a forced hint would exceed Spark's broadcast cap
    and fail the query rather than degrade to a shuffled join."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where supplier/customer nation must
    match. region/nation/supplier/customer are dims -> broadcast; only
    orders⋈lineitem shuffles."""
    region = F.broadcast(_t(spark, sf_dir, "region"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join. The
    reference's l_commitdate/l_receiptdate pair doesn't exist in this
    schema, so "late" = any line shipped >60 days after the order date.
    The semi join keeps only the order's key columns in the shuffle and
    short-circuits per matching key."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate.cast("date")
                > F.date_add(orders.o_orderdate.cast("date"), 60)
            ),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + single aggregate. Every predicate
    reaches the parquet scan as a pushed filter; the plan is one
    WholeStageCodegen span with a partial+final agg of a single double."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair trade volume by ship year. Both nation dims
    broadcast; the symmetric pair predicate is applied after the joins so
    one plan serves both directions."""
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    supplier = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(n1, supplier.s_nationkey == n1.s_nkey)
        .join(n2, cust.c_nationkey == n2.c_nkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue inside EUROPE,
    per order year. Conditional aggregation (sum of CASE / sum) instead
    of a second pass; all dims broadcast so only lineitem⋈orders
    shuffles."""
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    n_cust = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
        )
    )
    n_supp = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n_cust, cust.c_nationkey == F.col("c_nkey"))
        .join(region, F.col("c_rkey") == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(n_supp, supplier.s_nationkey == F.col("s_nkey"))
        .groupBy(
            F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(0.0))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year over
    STANDARD parts. No ps_supplycost in this schema, so cost is proxied
    as 80% of retail price × quantity — the join/agg topology (5-way
    star, two fact-side shuffles) is the point."""
    n_supp = F.broadcast(_t(spark, sf_dir, "nation"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.8
    # sum exact integer cents: per-row floor(x*100 + 0.5) evaluates
    # identically in any IEEE engine and integer sums are order-
    # independent — a double sum rounded to 2dp can land on a .005
    # boundary and flip with summation order (observed at sf0.001)
    profit_cents = F.floor(profit * 100 + F.lit(0.5)).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(n_supp, supplier.s_nationkey == n_supp.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year"),
        )
        .agg(F.sum(profit_cents).alias("sum_profit_cents"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    quarter. TakeOrderedAndProject top-k with a deterministic tie-break;
    nation broadcast."""
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, including
    zero-order customers via the left join; count(col) skips the nulls
    the join manufactures. Two stacked aggregations, each partial+final."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one ship month. part broadcast;
    single conditional aggregate, no second scan."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(0.0))
            / F.sum(revenue),
            4,
        ).alias("promo_revenue")
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300 (46 at sf0.01).
    The HAVING subquery becomes aggregate-then-join; the aggregated side
    is tiny after the filter so Catalyst broadcasts it into orders."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of three (brand × quantity-range ×
    size-range) baskets. The join key predicate stays conjunctive so the
    equi-join is still hash-planned; the OR filter evaluates post-join
    inside codegen."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    basket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return joined.filter(basket).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the positive-balance average with
    no recent orders, grouped by nation. The scalar average broadcasts as
    a 1-row cross join; the NOT EXISTS is a left-anti join against the
    distinct recent-buyer keys."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
        .distinct()
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 structure (correlated MIN subquery + 4-way dimension
    join) adapted to this schema: partsupp doesn't exist, so the
    part-supplier cost relation is derived from lineitem as
    ``min(l_extendedprice / l_quantity)`` per (part, supplier) — MIN of
    per-row ratios is commutative/order-independent, so the double
    compares equal across engines (a SUM-based unit cost would be
    summation-order-dependent and could break the min-equality join by
    1 ulp). The correlated ``supplycost = (SELECT min(...) WHERE
    partkey = p_partkey)`` becomes aggregate-then-equijoin; the
    region-filtered supplier dimension (~1/5 of 100 rows) broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eur = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eur = ps.join(
        F.broadcast(eur), ps.l_suppkey == eur.s_suppkey
    ).select("l_partkey", "supplycost", "s_name", "s_acctbal", "n_name")
    mc = ps_eur.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("supplycost").alias("min_cost")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    return (
        ps_eur.join(
            mc,
            (ps_eur.l_partkey == F.col("mk"))
            & (ps_eur.supplycost == F.col("min_cost")),
        )
        .join(F.broadcast(parts), ps_eur.l_partkey == parts.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("supplycost", 6).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 structure: GROUP BY ... HAVING sum > fraction × (scalar
    subquery over the same scope). The scope (one nation's suppliers'
    lineitems) is computed once and reused for both the per-part sums
    and the global total; the 1-row total broadcasts as a cross join.
    The HAVING compares raw double sums (not pre-rounded) exactly like
    the oracle — quantities/prices sum over few rows per part, so a
    boundary flip needs a 1-ulp straddle of the threshold, the same
    accepted risk as q18's HAVING."""
    scoped = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "supplier")
                .join(
                    _t(spark, sf_dir, "nation").filter(
                        F.col("n_name") == "NATION_7"
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
        )
    )
    total = scoped.agg(F.sum("val").alias("total_val"))
    return (
        scoped.groupBy("l_partkey")
        .agg(F.sum("val").alias("raw_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > 0.001 * F.col("total_val"))
        .select(
            "l_partkey", F.round("raw_value", 2).alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 structure: COUNT(DISTINCT supplier) per part attribute
    triple, with a negated attribute filter and a NOT IN supplier
    exclusion subquery (negative-balance suppliers stand in for the
    reference's complaint scan). NOT IN compiles to a broadcast
    left-anti join; the distinct (part, supplier) pair relation comes
    from lineitem since partsupp doesn't exist in this schema."""
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    excl = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        pairs.join(F.broadcast(excl), pairs.l_suppkey == excl.s_suppkey, "left_anti")
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 structure: correlated AVG subquery (``l_quantity <
    0.2 * (SELECT avg(l_quantity) WHERE l_partkey = p_partkey)``) as
    aggregate-then-equijoin. Quantities are integer-valued doubles, so
    the per-part avg (exact integer sum / count) is bit-identical across
    engines and the 0.2× threshold compare cannot straddle. The per-part
    avg frame is one row per part (~2k) — broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 structure: nested IN chain (supplier IN (... part IN
    (name-pattern scan) ... HAVING qty > correlated half-threshold)).
    The reference's ``ps_availqty > 0.5 * shipped`` correlation becomes
    ``per-(supplier, part) shipped qty > 0.5 * that part's total shipped
    qty`` — a majority-shipper test with the same correlated-scalar
    shape, exact under integer-valued quantities. Each IN level is a
    semi/equi join; the name-filtered part list and the per-part totals
    broadcast."""
    target = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("tk")).agg(
        F.sum("qty").alias("tot_qty")
    )
    majority = (
        shipped.join(F.broadcast(tot), F.col("l_partkey") == F.col("tk"))
        .filter(F.col("qty") > 0.5 * F.col("tot_qty"))
        .select("l_suppkey")
        .distinct()
    )
    asia = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        asia.join(
            F.broadcast(majority),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


def q21_late_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 structure: EXISTS + NOT EXISTS self-references on the
    same fact scan. The reference's receipt-vs-commit lateness doesn't
    exist in this schema (no commitdate/receiptdate), so "late" =
    shipped >365 days after the order date; the semantics kept are the
    interesting ones — a supplier counted only when it was late on a
    finished multi-supplier order (EXISTS another supplier's line) and
    it was the ONLY late supplier (NOT EXISTS another late line).
    EXISTS → left_semi, NOT EXISTS → left_anti, both equi on l_orderkey
    with the supplier-inequality conjunct evaluated inside the join."""
    fli = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    late = fli.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAY")
    )
    other = fli.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    l1 = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        l1.join(
            F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Filter DSL (SURVEY §2.2 F1-F10)
# ---------------------------------------------------------------------------

def filter_dsl_in_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 ($in) + F3 ($gt) + implicit AND across keys, compiled to Columns
    that Catalyst pushes into the parquet scan."""
    pred = compile_filter(
        {
            "data.c_mktsegment": {"$in": ["BUILDING", "MACHINERY"]},
            "data.c_acctbal": {"$gt": 1000.0},
        }
    )
    return (
        _t(spark, sf_dir, "customer")
        .filter(pred)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


def filter_dsl_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 ($and inside $or) + F2/F4 on the events stream table."""
    pred = compile_filter(
        {
            "$or": [
                {
                    "data.event_type": {"$eq": "purchase"},
                    "data.value": {"$gte": 100.0},
                },
                {"data.event_type": {"$in": ["error"]}},
            ]
        }
    )
    return (
        _t(spark, sf_dir, "events")
        .filter(pred)
        .select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))
    )


def backfill_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: inclusive time-range predicate (cli/backfill.py:130-131 analog)
    on the orders table, projected to date granularity."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between(F.lit("1997-01-01"), F.lit("1997-12-31")))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderstatus",
        )
    )


# ---------------------------------------------------------------------------
# J1/A1: the reference's one real view — left join + ordered agg
# (schema/023 profiles_with_verifications, re-shaped onto customer/orders)
# ---------------------------------------------------------------------------

def join_left_ordered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profiles_with_verifications shape (schema/023:9-53): left join each
    customer to the DESC-ordered aggregate of its non-'deleted' orders.
    The correlated subquery the reference's view uses decorrelates to
    aggregate-then-join; aggregating *before* the join keeps the shuffle
    on the small aggregated side."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    agg = orders.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("o_orderkey"), asc=False),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("order_ids"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return cust.join(agg, cust.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.col("order_ids"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# D1/D2: dedup + last-writer-wins (SURVEY §2.4) and window functions
# ---------------------------------------------------------------------------

def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup on documents (hash-groupBy)."""
    return dd.exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1's last-occurrence-wins dedup in its robust distributed form:
    row_number over an explicit arrival order (event_id) instead of
    nondeterministic file position (db.py:800-820 deviation noted in
    SURVEY §7.3)."""
    ev = _t(spark, sf_dir, "events")
    out = dd.last_writer_wins(ev, ["user_id"], [F.desc("event_id")])
    return out.select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function: top-3 customers by balance per nation."""
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


def top1_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 top-1 lookup shape (db.py:177-191): ORDER BY ... DESC LIMIT 1
    with a deterministic tiebreak -> TakeOrderedAndProject."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def events_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (lag) over the event stream: per-user
    value delta in arrival order."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation (subtotals + grand total)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over two dimensions."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def distinct_buyers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) aggregate: distinct ordering customers per segment
    (Catalyst plans expand + two-stage aggregate)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def semi_join_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one urgent order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def anti_join_never_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent orders."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: line items shipped within 30 days after
    their order date. Catalyst plans equi-key (orderkey) + range residual,
    so this stays a hash join with a post-filter, not a nested loop."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= orders.o_orderdate)
            & (li.l_shipdate <= orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_fast_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("fast_revenue"),
        )
    )


def asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (an operator Spark lacks natively): for each purchase
    event, the most recent order of the matching customer at or before the
    event time — expressed as equi-join on key + range predicate + top-1
    per event via row_number (SURVEY §2.5's composition strategy (a))."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    orders = _t(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc_nulls_last("o_orderdate"), F.desc_nulls_last("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "o_orderkey")
    )


_EMB_DIM_CACHE: dict[tuple, int] = {}


def _emb_cache_key(sf_dir: str) -> tuple:
    """(path, mtime) cache key for per-corpus derived artifacts: a
    rewritten embeddings file invalidates automatically. Non-local URIs
    (s3a:// etc.) fall back to path-only keying — call
    reset_corpus_caches() there if data changes mid-process."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        return (sf_dir, os.path.getmtime(path))
    except OSError:
        return (sf_dir, None)


def reset_model_caches() -> None:
    """Drop ONLY the trained-model memos (IVF centroids, PQ codebooks,
    k-means centroids, PCA basis, BPE merges) — the bench's cold-leg
    reset. Deliberately narrower than :func:`reset_corpus_caches`: the
    hot-shingle df-cap list and the embedding dim/count probes are
    consumed by queries OUTSIDE the cold/warm split (dedup_ngram_*,
    every ANN dispatch), and wiping them made those queries' bench
    headline permanently cold on every pass (round-8 review finding)."""
    _IVF_CENTROID_CACHE.clear()
    _PQ_CODEBOOK_CACHE.clear()
    _KMEANS_CENT_CACHE.clear()
    _PCA_MODEL_CACHE.clear()
    _BPE_MERGE_CACHE.clear()
    _BPE_STABLE_CACHE.clear()


def reset_corpus_caches() -> None:
    """Drop all per-corpus derived-artifact caches (embedding dims, IVF
    centroids) — for long-lived sessions whose data changes under a
    non-local URI where mtime keying can't see it."""
    _EMB_DIM_CACHE.clear()
    _EMB_COUNT_CACHE.clear()
    _IVF_CENTROID_CACHE.clear()
    _PQ_CODEBOOK_CACHE.clear()
    _HOT_SHINGLE_CACHE.clear()
    _ARTIFACT_ORACLE_CACHE.clear()
    _KMEANS_CENT_CACHE.clear()
    _PCA_MODEL_CACHE.clear()
    _BPE_MERGE_CACHE.clear()
    _BPE_STABLE_CACHE.clear()
    _BPE_ORACLE_MERGE_CACHE.clear()


def _embedding_dim(emb: DataFrame, sf_dir: str) -> int:
    """Vector width probe, one tiny job per corpus per process (the array
    type carries no static length); cached so repeated queries pay zero."""
    key = _emb_cache_key(sf_dir)
    if key not in _EMB_DIM_CACHE:
        _EMB_DIM_CACHE[key] = int(
            emb.select(F.size("embedding").alias("d")).head()[0]
        )
    return _EMB_DIM_CACHE[key]


_EMB_COUNT_CACHE: dict[tuple, int] = {}


def _embedding_count(emb: DataFrame, sf_dir: str) -> int:
    """Embedding-corpus row count for the adaptive exact/LSH dispatch,
    cached per (path, mtime) like every other per-corpus artifact: the
    count() behind the FAISS-style crossover is metadata-only on Parquet
    but still one Spark job per invocation on a hot query path."""
    key = _emb_cache_key(sf_dir)
    if key not in _EMB_COUNT_CACHE:
        _EMB_COUNT_CACHE[key] = emb.count()
    return _EMB_COUNT_CACHE[key]


def _embedding_exact_pairs(
    spark: SparkSession, sf_dir: str, threshold: float
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (id_a < id_b) — shared by the
    near-dup pair query (0.5) and the cluster query (0.4).

    Primary plan: distributed block-pair BLAS matmuls
    (operators.similarity.exact_cosine_pairs_blocked) — exact O(n^2)
    semantics with no corpus broadcast and per-pair cost at matmul speed.
    The flattened-codegen cross join below
    (_embedding_exact_pairs_unblocked) is kept as the oracle-shape twin:
    its left-assoc dot matches DuckDB's sequential list_dot_product
    bit-for-bit, and tests/test_operators.py proves blocked == unblocked
    on the real corpus, transitively anchoring the BLAS path to the SQL
    oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = sim.exact_cosine_pairs_blocked(emb, threshold)
    return pairs.select(
        "id_a", "id_b", F.round("cos_raw", 4).alias("cos_sim")
    )


def _embedding_exact_pairs_unblocked(
    spark: SparkSession, sf_dir: str, threshold: float
) -> DataFrame:
    """The broadcast cross-join form of the exact pair scan (oracle-shape
    twin of _embedding_exact_pairs; see its docstring)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = _embedding_dim(emb, sf_dir)
    # flatten to scalar columns: array higher-order folds are interpreted,
    # but a 64-term product-sum over scalar columns is whole-stage codegen
    # (~50x faster on the 2M-pair cross join at sf0.1). Term order matches
    # the oracle's sequential list_dot_product exactly.
    # SQL-string expression build: one py4j call, not 100s of Column ops
    # (driver plan construction is part of the per-query latency). The
    # left-assoc "+" chain matches the oracle's sequential fold exactly.
    def flat(side: str):
        exprs = [f"vec_id as id_{side}"] + [
            f"cast(embedding[{i}] as double) as {side}{i}" for i in range(dim)
        ]
        # norm precomputed ONCE per vector (n rows), not per pair (n^2):
        # cuts the cross-join arithmetic from 3 to 1 dot products per pair
        sumsq = " + ".join(f"{side}{i}*{side}{i}" for i in range(dim))
        return emb.selectExpr(*exprs).withColumn(
            f"nrm_{side}", F.expr(f"sqrt({sumsq})")
        )

    def dot(x: str, y: str):
        return F.expr(" + ".join(f"{x}{i}*{y}{i}" for i in range(dim)))

    # the corpus arrives as one small parquet split; spread the streamed
    # side so the O(n^2) compare uses every core (a 2000-row shuffle)
    par = spark.sparkContext.defaultParallelism
    pairs = flat("a").repartition(par).join(
        F.broadcast(flat("b")), F.col("id_a") < F.col("id_b")
    )
    denom = F.col("nrm_a") * F.col("nrm_b")
    cos = F.when(denom > 0, dot("a", "b") / denom).otherwise(F.lit(0.0))
    return (
        pairs.select("id_a", "id_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cos_sim"))
    )


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.5, id_a < id_b).

    Exact all-pairs, executed as distributed block-pair BLAS matmuls (no
    corpus broadcast; B(B+1)/2 independent tasks). Exactness matters here:
    at thresholds near the data's bulk similarity, candidate pruning (LSH)
    cannot keep recall without scanning ~everything, so the scale lever is
    the arithmetic rate, not the comparison count. For the genuinely
    approximate regime (high-cos planted dups), embedding_near_dup_lsh is
    the pruned twin."""
    return _embedding_exact_pairs(spark, sf_dir, 0.5)


def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup clustering: exact cosine pairs (>= 0.4) ->
    connected components -> canonical keeper per cluster. The embedding
    twin of dedup_clusters; the oracle recomputes the pairs and the
    transitive closure with a recursive CTE, so the iterative/union-find
    clustering is value-checked end-to-end on this modality too.

    The pair scan is the blocked-BLAS exact plan (see
    _embedding_exact_pairs): at this 0.4 threshold the corpus' pair
    population is entirely borderline (cos 0.4-0.6 — measured, no planted
    high-cos mass), where hyperplane-LSH recall is provably poor, so a
    pruned candidate set would silently drop edges and change components.
    embedding_dedup_clusters_lsh is the pruned twin for the planted-dup
    regime where recall genuinely holds."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = _embedding_exact_pairs(spark, sf_dir, 0.4).select("id_a", "id_b")
    return dd.dedup_cluster_keepers(emb, pairs, "vec_id")


def embedding_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of embedding_dedup_clusters with the FAISS-style
    corpus-size crossover (operators.similarity.near_dup_pairs_adaptive):
    below ~1e5 vectors the exact blocked-BLAS scan is strictly faster than
    building LSH tables — and deterministic, so this query is fully
    ORACLE-CHECKED at test scales (same recursive-CTE closure as
    embedding_dedup_clusters, threshold 0.5). Above the crossover, the
    multi-table hyperplane LSH candidate + exact-rerank path engages;
    tests/test_operators.py forces that path on a planted corpus and
    proves its clusters match the exact plan's exactly, so the adaptive
    dispatch never changes answers in the regime near-dup dedup targets
    (planted dups, cos >= ~0.9, recall ~= 1)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = _embedding_dim(emb, sf_dir)
    pairs = sim.near_dup_pairs_adaptive(
        emb, dim, threshold=0.5, n_rows=_embedding_count(emb, sf_dir)
    ).select("id_a", "id_b")
    return dd.dedup_cluster_keepers(emb, pairs, "vec_id")


def sketch_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per order status: HyperLogLog++ distinct buyers
    and approximate price percentiles. Both sketches merge associatively
    across partitions, so the shuffle carries fixed-size sketch state
    instead of value sets — the 100 TB way to get distincts/quantiles.

    FULLY oracle-checked, sketches included: raw sketch values aren't
    portable across engines, but their CONTRACT is — each sketch column
    is emitted as an error-bound predicate against an exact reference
    computed in the same aggregate (HLL within 10% of exact distinct at
    rsd=0.02; digest percentiles inside the exact (q±0.01)-quantile
    envelope at accuracy 10k). The DuckDB twin recomputes the exact
    columns and asserts the predicates as TRUE, so the driver hash-check
    verifies the groups, the exact counts, AND that the sketches honor
    their bounds. (At true 100 TB the exact references would come from a
    sampled audit, not the same scan; here they double as the oracle
    anchor. Raw sketch error vs exact is additionally measured in
    tests/test_operators.py.)"""
    orders = _t(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("ab"),
        F.countDistinct("o_custkey").alias("n_buyers"),
        F.percentile_approx("o_totalprice", [0.5, 0.95], 10_000).alias("pp"),
        F.expr("percentile(o_totalprice, array(0.49, 0.51, 0.94, 0.96))").alias(
            "px"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # percentile_approx returns an ACTUAL data value while the exact
    # (q±0.01)-quantile envelope is interpolated; on a tiny group the
    # nearest data value can legitimately sit outside the interpolated
    # envelope, so the bound predicate only applies once the group is
    # large enough (>= 1000 rows) for the envelope to contain data points
    small = F.col("n_orders") < 1000
    return g.select(
        "o_orderstatus",
        "n_orders",
        "n_buyers",
        (F.abs(F.col("ab") - F.col("n_buyers")) <= 0.1 * F.col("n_buyers")).alias(
            "hll_within_bound"
        ),
        (
            small
            | ((F.col("pp")[0] >= F.col("px")[0]) & (F.col("pp")[0] <= F.col("px")[1]))
        ).alias("p50_within_bound"),
        (
            small
            | ((F.col("pp")[1] >= F.col("px")[2]) & (F.col("pp")[1] <= F.col("px")[3]))
        ).alias("p95_within_bound"),
    )


def salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof grouped aggregation: per-event-type count/sum via
    two-phase salting (operators.skew). Result is identical to the plain
    groupBy — the oracle checks that — while the first shuffle spreads
    each hot key over 16 sub-keys."""
    from ..operators.skew import salted_aggregate

    ev = _t(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["event_type"],
        [F.count(F.lit(1)).alias("pc"), F.sum("value").alias("ps")],
        [
            F.sum("pc").alias("n_events"),
            F.round(F.sum("ps"), 2).alias("sum_value"),
        ],
    )


def exists_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-subquery decorrelated to a left-semi join
    (order has >=1 line item shipped more than 60 days after the order
    date), then a grouped count."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def scalar_subquery_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated to aggregate-then-join; revenue of line items
    below half their part's average quantity. The per-part aggregate is
    tiny -> broadcast into the second scan."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("aq")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def moving_avg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user trailing-1-hour average event value
    (time-based frame over the epoch, not a row count). Epoch seconds via
    NTZ-to-NTZ timestampdiff — unix_timestamp on a TIMESTAMP_NTZ column
    converts through the session timezone and would only match the oracle
    because the session pins UTC."""
    ev = _t(spark, sf_dir, "events")
    epoch = _ntz_epoch_seconds("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("trailing_avg"),
    )


def percentile_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (median / p90, linear interpolation) of
    extended price per return flag. Exact percentile buffers each group's
    value set, so this is the low-cardinality-group / audit path; the
    fixed-state mergeable path at 100 TB is the approx variant in
    `sketch_order_stats`."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("price_p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("price_p90"),
    )


def corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per return flag: Pearson correlation, sample
    covariance, and sample stddevs of quantity vs extended price — all
    single-pass moment aggregates whose partial states merge
    associatively, so the shuffle carries O(groups) fixed-size state."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
    )


def ntile_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation account-balance quartile assignment (ntile(4)). The
    window partitions by nation, so each sort is local to its shuffle
    partition — never global — and the (balance, custkey) order key makes
    tie placement deterministic across engines."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


def pivot_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with explicit pivot values: order revenue by priority ×
    order-year. Explicit values skip the distinct-values discovery job;
    the plan is two stacked partial+final aggregates (group-by (priority,
    year), then pivotfirst per priority), so every shuffle carries
    O(groups × years) rows — data rows are combined map-side at the
    scan."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.withColumn("o_year", F.year(F.col("o_orderdate").cast("date")))
        .groupBy("o_orderpriority")
        .pivot("o_year", [1995, 1996, 1997])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return piv.select(
        "o_orderpriority",
        F.col("1995").alias("rev_1995"),
        F.col("1996").alias("rev_1996"),
        F.col("1997").alias("rev_1997"),
    )


# ---------------------------------------------------------------------------
# Set operations (§2.8 — absent in reference, table stakes for the engine)
# ---------------------------------------------------------------------------

def set_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    big_buyers = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return building.intersect(big_buyers)


def set_except_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    machinery = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_custkey").alias("custkey"))
    )
    have_orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return machinery.exceptAll(have_orders).distinct()


# ---------------------------------------------------------------------------
# Scalar functions (§2.3): JSON extraction, hex projection
# ---------------------------------------------------------------------------

def json_extract_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 shape: JSON payload column -> typed value -> aggregate.
    get_json_object is JVM-side; no UDF in the path."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


def hex_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 hex-encode projection ('0x' || hex(payload)), the address
    rendering at the reference's graph edge (transformers/verifications.py:17-23)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(F.lit("0x"), F.lower(F.hex(F.col("source")))).alias("source_hex"),
    )


# ---------------------------------------------------------------------------
# Streaming-semantics batch twins (§2.8 W1/W8): tumbling windows
# ---------------------------------------------------------------------------

def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 tumbling windows (main.py:286-291's ts//dur*dur alignment) as a
    grouped agg on the events stream table; the same expression drives the
    Structured Streaming variant in streaming/pipeline.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("window_start", window_start("ts", 3600))
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows — 30-minute windows every 10 minutes,
    so each event lands in exactly 3 overlapping windows. Expressed as
    an explicit explode of the window/slide ratio (epoch-aligned
    ``floor(secs/slide)*slide - i*slide``, exact integer arithmetic)
    rather than ``F.window(..., slide)``: the expansion factor is then
    visible in the plan, the alignment matches the tumbling W1
    convention (``window_start``'s ts//dur*dur), and the whole thing
    replays as static SQL. At scale the 3x row expansion happens
    AFTER the scan projection (2 small columns), before the one
    grouped aggregate."""
    ev = _t(spark, sf_dir, "events")
    secs = _ntz_epoch_seconds("ts")
    size, slide = 1800, 600
    base = ev.select(
        "event_type",
        (F.floor(secs / slide) * slide).cast("long").alias("anchor"),
        "value",
    )
    i = F.explode(F.array(*[F.lit(x) for x in range(size // slide)]))
    return (
        base.select("event_type", "value", "anchor", i.alias("i"))
        .select(
            "event_type",
            "value",
            (F.col("anchor") - F.col("i") * slide).alias("window_start"),
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) as a batch plan:
    cumulative sum over gap-breaks assigns session indexes, then one
    aggregate per session. The streaming twin (same semantics, per-key
    state + timeout) is streaming.sessionize.sessionize_stream."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe epoch (see moving_avg_user_value)
    epoch = _ntz_epoch_seconds("ts")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sessioned = ev.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy("user_id", "session_idx")
        .agg(
            F.min(epoch).alias("session_start"),
            F.max(epoch).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis (training-data extensions)
# ---------------------------------------------------------------------------

def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.token_count("text", mode="bpe").alias("n_bpe_tokens"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.quality_score("text").alias("quality"))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.language_id("text").alias("lang_pred"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.fingerprint("text").alias("fp"))


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/spam signal: 1 - distinct-token ratio per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.repetition_score("text").alias("repetition"))


def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters per document (top-bigram position
    fraction, duplicated-trigram position fraction, pass/fail rule) —
    ORACLE-CHECKED; see operators.corpus.gopher_repetition for the
    n-gram-position adaptation and the execution shape."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.gopher_repetition(docs, "text", "doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "top_bigram_frac",
        "dup_trigram_frac",
        "repetition_ok",
    )


def text_substring_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication per document at 10-gram granularity
    (Lee et al. 2022 signal): duplicated-window fraction + longest
    duplicated run — ORACLE-CHECKED (DuckDB recomputes positional grams,
    global occurrence counts, and the run decomposition)."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.substring_dup_stats(docs, "text", "doc_id", gram_n=10)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "dup_grams",
        "dup_fraction",
        "max_dup_run",
    )


def lang_mixing_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.3) language sampling weights — the
    mBERT/XLM-R/mT5 alpha-sampling rule; ORACLE-CHECKED. Complements
    lang_mixing_weights (the alpha->0 uniform limit)."""
    docs = _t(spark, sf_dir, "documents")
    return crp.mixing_weights_temperature(docs, "lang", alpha=0.3)


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub plumbing: per-category match counts + fingerprint of the
    redacted text (witnesses the replacement without shipping the text)."""
    docs = _t(spark, sf_dir, "documents")
    counts = tx.pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(tx.redact_pii("text")).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Near-dup dedup (rows-only oracle: not SQL-expressible)
# ---------------------------------------------------------------------------

def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures -> LSH banding -> estimated-Jaccard filter —
    the real scale pipeline (one signature aggregate, one banded
    self-join), ORACLE-CHECKED end to end: the member family is the
    engine-portable md5 + Kirsch-Mitzenmacher construction
    (dedup.minhash_signatures hash_family="md5"), so the DuckDB twin
    recomputes the identical signatures, replays band collisions as
    member-slice equality (bucket-hash equality <=> slice equality up to
    a ~2^-64 xxhash64 collision), and reproduces est_jaccard exactly.
    The xxhash64 family remains the default for engine-internal
    pipelines (streaming near-dup state)."""
    docs = _t(spark, sf_dir, "documents")
    sigs = dd.minhash_signatures(
        docs, num_hashes=64, shingle_n=3, hash_family="md5"
    )
    cands = dd.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    return cands.filter(F.col("est_jaccard") >= 0.5).orderBy("id_a", "id_b")


_HOT_SHINGLE_CACHE: dict[tuple, list[int]] = {}


def _hot_shingles_cached(
    spark: SparkSession, docs: DataFrame, sf_dir: str, frac: float
) -> DataFrame:
    """Stop-shingle frame for the documents corpus, computed once per
    (corpus, cap) per process and rebuilt as a tiny frame thereafter —
    the same artifact discipline as the IVF centroids / PQ codebooks: in
    production the hot list is computed once at corpus build and
    persisted beside it (dedup.hot_shingles + every consumer's ``hot``
    parameter exist for exactly that), so queries don't re-pay a full
    corpus shingle aggregation each. The hot tail is tiny by construction
    (shingles in > frac of ALL documents), so caching the hash values at
    the driver is bounded."""
    key = (_emb_cache_key(sf_dir), "documents", frac)
    if key not in _HOT_SHINGLE_CACHE:
        _HOT_SHINGLE_CACHE[key] = [
            r[0] for r in dd.hot_shingles(docs, frac, "text", "doc_id", 3).collect()
        ]
    vals = _HOT_SHINGLE_CACHE[key]
    return spark.createDataFrame([(v,) for v in vals], "shingle long")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates reranked by exact shingle Jaccard — under the SAME
    fractional stop-shingle cap as dedup_ngram_jaccard_allpairs, so both
    exact-Jaccard paths share one definition (hot list amortized per
    corpus, see _hot_shingles_cached). At jaccard >= 0.8 the 16-band x
    4-row banding collides with probability ~1 - 3e-4 per pair, so the
    rerank output equals the capped all-pairs ground truth at 0.8 on
    every tested corpus — making this query ORACLE-CHECKED (the
    all-pairs SQL at 0.8); the banding recall contract is additionally
    property-tested in tests/test_operators.py."""
    docs = _t(spark, sf_dir, "documents")
    hot = _hot_shingles_cached(spark, docs, sf_dir, 0.05)
    # signatures over the CAPPED shingle stream (hot shingles excluded),
    # so signature agreement estimates the same capped Jaccard the exact
    # rerank and the all-pairs oracle compute — without this, a pair with
    # capped jaccard >= 0.8 but boilerplate-diluted raw sets can sit
    # below every signature/banding threshold and break the recall bound
    sigs = dd.minhash_signatures(docs, num_hashes=64, shingle_n=3, hot=hot)
    # estimated-Jaccard pre-filter before the exact rerank (the standard
    # three-stage LSH pipeline): a pair with CAPPED jaccard >= 0.8 has
    # P[signature agreement < 0.5] = P[Binom(64, 0.8) < 32] ~ 1e-8, so
    # est >= 0.5 sheds the collision noise (most banding candidates on a
    # common-vocabulary corpus) at no recall cost — the exact rerank then
    # touches a vanishing candidate set
    cands = (
        dd.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    return dd.ngram_jaccard_pairs(
        docs, cands, "text", "doc_id", hot=hot
    ).filter(F.col("jaccard") >= 0.8)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: exact-Jaccard pairs (>= 0.7, over df-capped
    shingle sets — the same FRACTIONAL stop-shingle rule as the rest of
    the Jaccard family, mirrored in the oracle) -> connected components
    (iterative min-label propagation) -> canonical keeper per cluster.
    The oracle twin computes the same components with a recursive-CTE
    transitive closure, making this an ORACLE-CHECKED iterative
    algorithm."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.7, max_shingle_df=0.05
    ).select("id_a", "id_b")
    return dd.dedup_cluster_keepers(docs, pairs, "doc_id")


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship quarter, how many lines belong to
    high- vs low-priority orders. No l_shipmode in this schema, so the
    grouping key is the ship quarter. Conditional counts in one pass;
    orders joins in as a (broadcastable) two-column projection."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.quarter(F.col("l_shipdate").cast("date")).cast("long").alias("ship_quarter")
        )
        .agg(
            # when/otherwise (not bool.cast) so a NULL priority counts as
            # low, matching the oracle's CASE ... ELSE 1 exactly
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def balance_distribution_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-distribution windows: percent_rank and cume_dist of each
    customer's balance within its market segment. One sort per segment
    partition; no global sort."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.round(F.percent_rank().over(w), 6).alias("bal_percent_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


def user_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's first and last event type by time (event_id tie-break)
    as ONE hash aggregate: min_by/max_by on the (ts, event_id) ordering
    struct. The earlier full-frame-window + distinct form computed the
    same result but sorted every user partition and shuffled duplicate
    rows into the distinct; the aggregate form is partial+final (map-side
    combine), no sort, no duplicate-row shuffle."""
    ev = _t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_event_type"),
        F.max_by("event_type", key).alias("last_event_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    revenue view aggregates first (one shuffle on suppkey) and is persisted
    so it computes once; the max collapses to a one-row aggregate that
    broadcast-joins back as an equi-join on the value — no unpartitioned
    window (which would funnel the aggregated frame through one task)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = dd._persist(
        li.groupBy("l_suppkey").agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("mx")
    ).drop("mx")
    supplier = _t(spark, sf_dir, "supplier")
    return top.join(supplier, top.l_suppkey == supplier.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


def orders_export_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Totally-ordered export (the one shape that legitimately needs a
    global sort): range-partitioned sample-based sort, so each partition
    writes a disjoint key range — never a single-node sort."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
        .select(
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderdate", "o_orderkey")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix over the events stream: users
    bucketed by first-active week, counted per week offset. Weeks are
    epoch arithmetic (floor(epoch_seconds/604800)) where epoch seconds
    come from an NTZ-to-NTZ timestampdiff — genuinely timezone-
    independent (unix_timestamp on a TIMESTAMP_NTZ column would convert
    via the session zone and only matched the oracle because the session
    pins UTC). user-week distinct first, so the join and both aggregates
    run on the collapsed frame."""
    ev = _t(spark, sf_dir, "events")
    secs = _ntz_epoch_seconds("ts")
    wk = F.floor(secs / 604800).cast("long")
    user_weeks = ev.select("user_id", wk.alias("week_idx")).distinct()
    firsts = user_weeks.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    return (
        user_weeks.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def event_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase with
    strictly-after chaining: a user reaches step N only via an event
    AFTER their step-(N-1) time, and the step time is the EARLIEST such
    event (min-ts chaining — the standard funnel semantics, not mere
    per-type existence). Each step is one filtered aggregate joined to
    the previous frontier; all three frames are user-sized (small next
    to the event stream), and every output is an exact integer count,
    plus an epoch-seconds checksum of the step times so the chaining
    itself is value-checked, not just the counts. Timestamps compare as
    NTZ — no session-zone dependence."""
    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _row(step: str, order: int, frame, tcol: str):
        chk = _ntz_epoch_seconds(tcol)
        return frame.agg(
            F.lit(order).alias("step_order"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(chk).alias("step_ts_checksum"),
        )

    return (
        _row("view", 1, s1, "t1")
        .unionAll(_row("click", 2, s2, "t2"))
        .unionAll(_row("purchase", 3, s3, "t3"))
        .orderBy("step_order")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event transition counts (the Markov matrix behind
    path analysis): lag over each user's ts-ordered stream, tie-broken
    by event_id so the ordering is a total order and the lag is
    deterministic on any engine. One window shuffle partitioned by
    user_id (bounded keys, no global sort) + one count aggregate; every
    output an exact integer."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, counted across orders, min-support filtered, top-20. The
    pair self-join is bounded per order by C(lines, 2) (~6 here); at
    100 TB the same shape needs the df-cap discipline the n-gram
    families use — drop parts in more than a support-fraction of
    baskets BEFORE pairing, since one ubiquitous part otherwise
    dominates the pair shuffle exactly like a hot shingle. Exact
    integer counts; id-ordered canonical pairs."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        li.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(
            F.col("l_orderkey"),
            F.col("l_partkey").alias("part_a"),
            F.col("p2").alias("part_b"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM filtering with a corpus-trained unigram model: score
    each document by the mean negative log-probability of its tokens
    under corpus-wide unigram frequencies. Two aggregations (token
    frequency, then per-doc mean); the vocabulary frame is small relative
    to the corpus so Catalyst broadcasts it back onto the token stream,
    and the scalar total arrives as a 1-row broadcast."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    return (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM filtering, one order up from the unigram model:
    score each document by the mean negative conditional log-probability
    of its bigrams, P(w2|w1) = c(w1 w2) / c(w1 ·), under corpus-trained
    counts. Catches locally-incoherent text the unigram model cannot
    (every word common, the transitions nonsense). Self-trained on the
    corpus, so no probability is zero and no smoothing constant leaks
    into the contract.

    Scale shape: the bigram stream is posexplode + lead (the codegen
    shingling shape), both count models are partial+final aggregates
    keyed by ngram, and the rejoin shuffles per-bigram rows on their
    natural keys — no driver state, no broadcast of anything unbounded.
    Documents with fewer than two tokens have no bigram and drop out
    (same rule in the oracle)."""
    docs = _t(spark, sf_dir, "documents")
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.lead("tok", 1).over(w).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    bfreq = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cfreq = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cc"))
    return (
        big.join(bfreq, ["w1", "w2"])
        .join(cfreq, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("cb") / F.col("cc"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis-Spirakis, weight =
    n_chars): longer documents are proportionally likelier, yet the
    sample is a pure function of (doc_id, n_chars, seed) — identical in
    any engine, as the oracle proves by replaying the same md5-uniform
    and -ln(u)/w scoring in SQL."""
    docs = _t(spark, sf_dir, "documents")
    out = smp.weighted_sample(docs, ["doc_id"], "n_chars", k=50, seed="wdocs")
    return out.select("doc_id", "lang", "source", "n_chars")


def events_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval self-join: per user, count event pairs occurring
    within 10 minutes of each other ((t1, t1+600s], microsecond-exact).

    A naive time-range self-join is a per-user nested loop — O(k^2) rows
    per key with no equi-condition for the hash join to use. The banding
    trick makes it an equi-join: bucket time into window-sized bands, a
    successor event must land in the same or next band, so the left side
    probes (bucket, bucket+1) and the join runs hash-partitioned on
    (user, band); the exact interval predicate filters inside the join.
    Each qualifying pair matches exactly once (its successor band is one
    of the two probes). This is the standard range-join optimization —
    shuffle stays O(events), never O(pairs)."""
    window_us = 600 * 1_000_000
    # ts is TIMESTAMP_NTZ: diff against the NTZ epoch is timezone-
    # independent (unix_micros would force a session-zone cast)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    ev = _t(spark, sf_dir, "events").select("user_id", micros.alias("t"))
    left = ev.select(
        "user_id",
        F.col("t").alias("t1"),
        F.explode(
            F.array(
                F.floor(F.col("t") / window_us),
                F.floor(F.col("t") / window_us) + 1,
            )
        ).alias("band"),
    )
    right = ev.select(
        F.col("user_id").alias("r_user"),
        F.col("t").alias("t2"),
        F.floor(F.col("t") / window_us).alias("r_band"),
    )
    return (
        left.join(
            right,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("band") == F.col("r_band"))
            & (F.col("t2") > F.col("t1"))
            & (F.col("t2") - F.col("t1") <= window_us),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table: one row per column with
    null count, exact distinct count, and min/max rendered as strings.

    One branch per column — groupBy(value) hash-agg then a tiny final
    aggregate — unioned. NOT a single agg with five count_distincts:
    multi-distinct aggregation plans as Expand (5x every row) feeding a
    SortAggregate, measured ~3 s at sf0.1 vs ~0.3 s for these unioned
    two-level hash aggregates, each over a pruned one-column scan."""
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    branches = []
    for c in cols:
        if c == "o_totalprice":
            # fixed %.2f: a raw double->string cast goes scientific at
            # different magnitudes in different engines
            mn = F.format_string("%.2f", F.min(F.col("v")))
            mx = F.format_string("%.2f", F.max(F.col("v")))
        else:
            mn = F.min(F.col("v")).cast("string")
            mx = F.max(F.col("v")).cast("string")
        lvl1 = orders.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        branches.append(
            lvl1.agg(
                F.sum(
                    F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0)
                ).alias("n_nulls"),
                F.sum(F.col("v").isNotNull().cast("long")).alias("n_distinct"),
                mn.alias("min_value"),
                mx.alias("max_value"),
            ).select(
                F.lit(c).alias("column_name"),
                F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
                F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
                "min_value",
                "max_value",
            )
        )
    return reduce(DataFrame.unionAll, branches)


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: each document's token range in the
    concatenated corpus and the 512-token training sequences it spans.
    The global prefix sum runs as a two-phase distributed scan
    (operators/packing.py) — never a single-task empty-PARTITION-BY
    window — while the oracle is the naive single-window SQL, proving
    the scalable plan computes the same answer."""
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tx.token_count("text").alias("n_tokens"))
    return pack_sequences(toks, seq_len=512).select(
        F.col("id").alias("doc_id"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "offset",
        "first_seq",
        "last_seq",
        "n_seqs",
    )


def passage_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide passage-level exact dedup (10-word windows): per doc,
    how many passages survive first-occurrence dedup and the md5 of the
    reassembled text. The md5 makes the full reassembly oracle-checked
    without hashing megabytes of text through the driver."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.passage_dedup(docs, "text", "doc_id", chunk_words=10)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_chunks",
        "kept_chunks",
        F.md5(F.col("kept_text")).alias("kept_text_md5"),
    )


def boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-based boilerplate removal (CCNet/C4 rule over 10-word
    windows): chunks appearing in more than 2 distinct documents are
    dropped from every document; the reassembled text is oracle-checked
    by md5 like passage_dedup_docs."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.remove_boilerplate_chunks(
        docs, "text", "doc_id", chunk_words=10, max_chunk_df=2
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_chunks",
        "kept_chunks",
        F.md5(F.col("kept_text")).alias("kept_text_md5"),
    )


def epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle of the corpus (training order for
    "epoch-1"): every row tagged with its engine-portable md5 sort key.
    The permutation is fully value-checked — the oracle recomputes the
    same md5 draw, and sorting either engine's output by sort_key
    reproduces the identical training order. Plans as a range-partitioned
    parallel sort (see test_plans)."""
    docs = _t(spark, sf_dir, "documents")
    return smp.epoch_shuffle(docs, ["doc_id"], seed="epoch-1").select(
        "doc_id", "sort_key"
    )


def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: fraction of the doc's distinct
    3-gram shingles first seen (min doc_id) in this doc — the marginal-
    contribution score used to curate under a fixed ingestion order."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.shingle_novelty(docs, "text", "doc_id", shingle_n=3)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_shingles",
        F.round(F.col("novelty"), 4).alias("novelty"),
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms. Term frequency aggregates on the
    (doc, term) pair key (partial+final, one shuffle); document frequency
    reuses that frame with a second aggregate on term — the df table is
    O(vocab), far smaller than the corpus, and at 100 TB can be broadcast
    when the vocabulary is bounded. The corpus size joins in as a
    broadcast 1-row frame (no driver-side collect), and top-3 is a
    row_number window partitioned by doc — never a global sort. Ranking
    uses the ROUNDED score (ties broken by term) so cross-engine
    last-ulp float drift can't reorder the cut."""
    docs = _t(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) — ORACLE-CHECKED end to end:
    token hashes derive from md5 (engine-portable, one md5 per distinct
    token), pigeonhole blocking is EXACT for the threshold (any pair
    within hamming 3 agrees on >= 1 of 4 chunks), so the output is
    precisely the SQL-expressible set {pairs: hamming(simhash) <= 3} and
    DuckDB recomputes the identical signatures bit for bit."""
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_near_duplicates(
        dd.simhash(docs, token_hash="md5"), max_hamming=3
    )


def dedup_ngram_jaccard_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs shingle Jaccard (>= 0.5) — the oracle-checked ground
    truth for the whole near-dup family (inverted-index plan, not a cross
    join; see operators.dedup.jaccard_all_pairs). The stop-shingle cap is
    the FRACTIONAL form (df > 5% of the corpus): a fraction names the
    same boilerplate at every corpus size, where an absolute count means
    less and less as the corpus grows — the oracle mirrors the same
    fraction against count(*) of documents."""
    docs = _t(spark, sf_dir, "documents")
    return dd.jaccard_all_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.5, max_shingle_df=0.05
    )


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

def _query_vec_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return F.broadcast(emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q")))


def _cosine_to_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, raw cosine vs vec_id=0) via broadcast one-row cross join —
    no driver collect; the dot/norm fold is a sequential JVM left-fold so
    it matches the oracle's list_dot_product bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    joined = emb.crossJoin(_query_vec_df(spark, sf_dir))
    dot = sim._dot(F.col("embedding"), F.col("q"))
    denom = sim._norm(F.col("embedding")) * sim._norm(F.col("q"))
    score = F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))
    return joined.select("vec_id", score.alias("cos_raw"))


def embedding_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine of every vector against vec_id=0 (the exact
    baseline for similarity search; one narrow projection, no shuffle)."""
    return _cosine_to_query(spark, sf_dir).select(
        "vec_id", F.round("cos_raw", 6).alias("cos_sim")
    )


def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 by cosine: TakeOrderedAndProject (per-partition heap,
    k-row driver merge — no global sort even at 100 TB)."""
    return (
        _cosine_to_query(spark, sf_dir)
        .orderBy(F.desc("cos_raw"), F.col("vec_id"))
        .limit(20)
        .select("vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned embedding near-dup pairs (the scale path for
    embedding_near_dup_pairs; rows-only oracle — bucket membership depends
    on the engine's plane hashes). Candidate generation is multi-table
    hyperplane LSH with the constant-occupancy auto-plane rule
    (n_planes = max(8, log2(n/16)) — the sf1 scaling study measured
    exponent 1.7 at a fixed 8 planes before the rule, ~sublinear after);
    the exact-cosine rerank guarantees precision 1, so the only
    approximation is recall on borderline pairs (measured in
    tests/test_operators.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = _embedding_dim(emb, sf_dir)
    return sim.lsh_near_dup_pairs(emb, dim, threshold=0.5).orderBy("id_a", "id_b")


def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via random-hyperplane LSH bucket pruning
    (rows-only oracle: bucket membership isn't SQL-expressible)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = sim.lsh_bucketed_topk(emb, list(qvec), k=20, n_planes=8)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


_IVF_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}
_PQ_CODEBOOK_CACHE: dict[tuple, list] = {}


def _ivf_centroids_cached(emb: DataFrame, sf_dir: str) -> list[list[float]]:
    key = _emb_cache_key(sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE[key] = sim.ivf_centroids(emb, n_centroids=16)
    return _IVF_CENTROID_CACHE[key]


def embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN JOIN (the batch retrieval primitive: hard-negative
    mining, retrieval eval): top-10 cosine neighbors for each of the
    first five vectors as queries — ORACLE-CHECKED against the DuckDB
    cross-join + row_number twin. Execution: the query matrix broadcasts,
    each corpus partition keeps only its local top-k per query via one
    BLAS matmul (mapInPandas), and a per-query merge ranks the
    O(partitions x |Q| x k) partition winners — shuffle never carries
    the corpus (operators.similarity.knn_join)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.knn_join(emb, queries, k=10)


def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding corpus
    (the cached IVF coarse quantizer), detect near-dup pairs WITHIN each
    cell only, connect components, keep the min-id representative.
    Comparisons drop from n^2 to sum(|cell|^2) — the semantic-dedup scale
    shape. ORACLE-CHECKED via the corpus-size crossover
    (sim.semdedup_keepers_adaptive): below ~1e5 vectors the pair scan is
    the exact single-cell limit (deterministic — no trained-quantizer
    dependence — and strictly better recall than any cell partition), so
    the recursive-CTE closure twin value-checks the whole
    cluster-and-keep contract; above it the k-means-cell path engages,
    and tests/test_operators.py force it on planted dups to prove it
    matches the exact limit. Threshold 0.45 (vs clusters' 0.4/0.5) keeps
    the three clustering queries distinct result sets."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.semdedup_keepers_adaptive(
        emb,
        threshold=0.45,
        centroids=lambda: _ivf_centroids_cached(emb, sf_dir),
        n_rows=_embedding_count(emb, sf_dir),
    )


def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via product quantization + asymmetric distance
    (ADC): each vector is its 8-byte PQ code, the query ships as one
    distance-table literal, and scoring is 8 table lookups per row — the
    compressed-domain regime a 100 TB ANN corpus queries in (no float
    vectors touched at query time). Completes the index family next to
    the LSH (data-oblivious) and IVF (adaptive-probe) paths. Rows-only
    oracle; recall properties in tests/test_operators.py."""
    emb = _t(spark, sf_dir, "embeddings")
    key = _emb_cache_key(sf_dir)
    if key not in _PQ_CODEBOOK_CACHE:
        _PQ_CODEBOOK_CACHE[key] = sim.pq_codebooks(emb, n_sub=8, n_centroids=16)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.pq_topk(
        emb, list(qvec), k=20, codebooks=_PQ_CODEBOOK_CACHE[key]
    )


def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via an IVF coarse quantizer (nprobe=6 of 16
    cells). The adaptive counterpart to embedding_lsh_topk: probes the
    centroids nearest the query instead of fixed hash buckets. Rows-only
    oracle; recall properties are asserted in tests/test_operators.py.
    Centroids are trained once per corpus and cached (in production they'd
    be a persisted artifact beside the partitioned-by-cell corpus)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = sim.ivf_topk(
        emb, list(qvec), k=20, centroids=_ivf_centroids_cached(emb, sf_dir), nprobe=6
    )
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


# ---------------------------------------------------------------------------
# Graph projection (§2.9 U4-U6 shape on the events table)
# ---------------------------------------------------------------------------

def graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 FollowsGraphTransformer shape: interaction rows -> typed edges."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("src_id"),
        F.get_json_object("props", "$.k").cast("long").alias("dst_id"),
        F.col("event_type").alias("rel_type"),
    ).filter(F.col("dst_id").isNotNull())


def graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 endpoint resolution: node set = distinct union of edge endpoints
    (neo4j_queries.py:88-93's implicit MERGE-created endpoints)."""
    e = graph_edges(spark, sf_dir)
    return (
        e.select(F.col("src_id").alias("node_id"))
        .union(e.select(F.col("dst_id").alias("node_id")))
        .distinct()
    )


def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node out/in degree over the projected edge set — the profile
    query of any graph load (find hubs before a MERGE storm hits the graph
    sink). ONE scan: each edge explodes into its two endpoint rows tagged
    (out, in), then a single partial+final aggregate sums both counters
    per node. The earlier two-grouped-counts + full-outer-join plan read
    the events table (and re-parsed the JSON edge projection) twice and
    paid a third shuffle for the join; this shape pays one scan and one
    shuffle carrying a row per (node, partition)."""
    e = graph_edges(spark, sf_dir)
    ends = e.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src_id").alias("node_id"),
                    F.lit(1).alias("o"),
                    F.lit(0).alias("i"),
                ),
                F.struct(
                    F.col("dst_id").alias("node_id"),
                    F.lit(0).alias("o"),
                    F.lit(1).alias("i"),
                ),
            )
        ).alias("n")
    ).select("n.node_id", "n.o", "n.i")
    return ends.groupBy("node_id").agg(
        F.sum("o").alias("out_degree"), F.sum("i").alias("in_degree")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only; decode stubbed per container limits)
# ---------------------------------------------------------------------------

def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED multimodal plumbing: the fake decode derives the
    feature from sha256(payload), which DuckDB can recompute in SQL —
    so the whole mapInPandas path (schema, Arrow batching, vectorized
    body) is value-checked, not just row-counted. The float32 feature is
    projected through fixed %.4f formatting (a float32 is dyadic, so it
    never sits on a rounding boundary and both engines agree)."""
    docs = _t(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs), fake=True)
    return feats.select(
        "media_id",
        "mime_type",
        "n_bytes",
        "content_sha256",
        F.array_join(
            F.transform(
                F.col("feature"),
                lambda x: F.format_string("%.4f", x.cast("double")),
            ),
            ",",
        ).alias("feature_r4"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling / splits (training-data extensions)
# ---------------------------------------------------------------------------

def sample_docs_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic hash sample of the corpus — reproducible across
    engines, runs, and partition layouts (unlike rand()-based sampling);
    the predicate is a codegen'd filter at scan time, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return smp.hash_sample(docs, ["doc_id"], 0.1, seed="sample").select("doc_id", "lang")


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def train_val_test_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by key hash, verified via the
    per-split counts. Assignment is a pure projection (one scan) and every
    engine computing the same md5 ranges agrees row-for-row."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", smp.split_column(["doc_id"], _SPLIT_WEIGHTS, seed="split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def contrastive_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: 4 pseudo-random other-doc
    draws per anchor (md5-based, engine-portable, self-selection
    impossible) — ORACLE-CHECKED byte for byte. Rank assignment uses the
    two-phase range-partitioned prefix scan (operators.sampling.negative_samples)."""
    docs = _t(spark, sf_dir, "documents")
    return smp.negative_samples(docs, "doc_id", k=4, seed="neg")


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end contrastive training-pair materialization: positives
    are near-duplicate pairs (capped Jaccard >= 0.5, anchor = smaller
    id), negatives are the deterministic md5 draws (2 per anchor,
    negatives colliding with the positive filtered) — the triplet frame
    a contrastive trainer consumes. Pure composition of two
    oracle-checked operators and itself ORACLE-CHECKED."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=0.05
    ).select(F.col("id_a").alias("anchor"), F.col("id_b").alias("positive"))
    negs = smp.negative_samples(docs, "doc_id", k=2, seed="neg").select(
        F.col("doc_id").alias("anchor"),
        "neg_idx",
        F.col("neg_doc_id").alias("negative"),
    )
    return pairs.join(negs, "anchor").filter(
        F.col("negative") != F.col("positive")
    ).select("anchor", "positive", "neg_idx", "negative")


def lang_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: the confusion matrix between the corpus'
    declared ``lang`` labels and the n-gram language-ID prediction — the
    standard check before trusting either side for mixing/sampling
    decisions. One scan + one grouped count; ORACLE-CHECKED (the oracle
    recomputes the stopword-vote prediction in SQL)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("declared"),
            tx.language_id("text").alias("predicted"),
        )
        .groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def source_near_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance audit: which SOURCES duplicate each other — near-dup
    pairs (capped Jaccard >= 0.5) aggregated into an unordered
    source-pair matrix with pair counts and mean similarity. The
    dedup-pipeline view a data vendor review starts from (a hot
    cross-source cell = one feed scraping another). Pair scan reused
    verbatim; the rollup is two tiny joins + one grouped aggregate;
    ORACLE-CHECKED."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=0.05
    )
    src = docs.select("doc_id", "source")
    joined = (
        pairs.join(
            src.withColumnsRenamed({"doc_id": "id_a", "source": "src_a"}), "id_a"
        ).join(
            src.withColumnsRenamed({"doc_id": "id_b", "source": "src_b"}), "id_b"
        )
    )
    lo = F.least("src_a", "src_b")
    hi = F.greatest("src_a", "src_b")
    return (
        joined.select(lo.alias("source_a"), hi.alias("source_b"), "jaccard")
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
    )


def length_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length curriculum: documents ranked into 8 equal-count
    token-length buckets (ties broken by doc_id), summarized per bucket
    — the batching/curriculum schedule input. The global rank comes from
    the SAME two-phase range-partitioned prefix scan as sequence packing
    (token_offsets with unit weights over a (n_tokens, doc_id) sort
    key), never an unpartitioned ntile window funneling the corpus
    through one task; bucket = rank*8 div N in exact integer math, the
    formula the DuckDB oracle mirrors. ORACLE-CHECKED."""
    from ..operators.packing import token_offsets

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.struct(
            tx.token_count("text").alias("n_tokens"), F.col("doc_id")
        ).alias("__ord"),
    ).withColumn("__one", F.lit(1))
    ranked = token_offsets(toks, id_col="__ord", token_col="__one")
    n = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("n_total")))
    return (
        ranked.crossJoin(n)
        .select(
            F.col("id.n_tokens").alias("n_tokens"),
            F.expr("(offset * 8) div n_total + 1").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs (capped Jaccard >= 0.5)
    whose members landed in DIFFERENT train/val/test splits — the eval-
    contamination check every dedup-then-split pipeline must run (a val
    doc near-identical to a train doc inflates eval). Composes the
    inverted-index exact pair scan with the hash-split assignment; both
    pieces and the composition are ORACLE-CHECKED. At 100 TB the split
    lookup is two joins of the (tiny) pair set against a projection of
    the corpus — the pair scan dominates, nothing new shuffles."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=0.05
    )
    splits = docs.select(
        F.col("doc_id"),
        smp.split_column(["doc_id"], _SPLIT_WEIGHTS, seed="split").alias("split"),
    )
    return (
        pairs.join(
            splits.withColumnsRenamed({"doc_id": "id_a", "split": "split_a"}),
            "id_a",
        )
        .join(
            splits.withColumnsRenamed({"doc_id": "id_b", "split": "split_b"}),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )


def _near_dup_components(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(docs, components) for the cluster-unit operators. ONE definition
    of the cluster — capped-Jaccard pairs (>= 0.5, df-cap 0.05) ->
    connected components (min-id label), components keyed by `doc_id` —
    shared by `split_cluster_safe` and `soft_dedup_weights` so the split
    unit and the weight unit can never silently de-synchronize on a
    threshold tweak. The component frame is a tiny contraction of the
    corpus (clustered docs only), so joins back against it are
    AQE-broadcast when small, sort-merge when a pathological corpus
    makes it large."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=0.05
    ).select("id_a", "id_b")
    comp = dd.connected_components(pairs, detach=True).withColumnsRenamed(
        {"id": "doc_id"}
    )
    return docs, comp


def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-FREE train/val/test split: the split unit is the near-dup
    CLUSTER, not the document. `split_leakage_pairs` shows the naive
    per-doc hash split leaks (a val doc near-identical to a train doc);
    the standard fix is to hash the cluster representative — every member
    of a connected near-dup component inherits one split, so cross-split
    near-dup pairs are zero BY CONSTRUCTION (asserted in
    tests/test_sampling_corpus.py). Pipeline: the shared
    `_near_dup_components` contraction -> split key = component for
    clustered docs, own id for singletons -> the shared md5 hash-range
    split. At 100 TB the pair scan dominates and the assignment itself
    stays one codegen'd projection. ORACLE-CHECKED end-to-end
    (recursive-CTE closure + the same CASE split in DuckDB)."""
    docs, comp = _near_dup_components(spark, sf_dir)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("split_key")
        )
        .withColumn(
            "split", smp.split_column(["split_key"], _SPLIT_WEIGHTS, seed="split")
        )
    )


def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of DROPPING near-duplicates, every document
    gets training weight 1/|cluster| (singletons keep 1.0), so each
    distinct piece of content contributes exactly 1.0 to the training
    mix no matter how many copies the crawl collected — the reweighting
    alternative data-constrained LM training uses when hard dedup would
    discard too many tokens. The SAME `_near_dup_components` contraction
    as `split_cluster_safe` (one cluster definition for both), plus one
    tiny per-component count; both joins back are over the contraction
    and AQE-broadcast when it is small. ORACLE-CHECKED (recursive-CTE
    closure + the same size/weight arithmetic in DuckDB)."""
    docs, comp = _near_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .join(sizes, "component", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
            F.round(
                F.lit(1.0) / F.coalesce("cluster_size", F.lit(1)), 6
            ).alias("weight"),
        )
    )


_STRAT_FRACTIONS = {"en": 0.05, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 1.0}


def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing downsample: per-language sampling fractions (keep all
    rare zh, 5% of dominant en) as one codegen'd CASE-threshold filter —
    no per-stratum scans, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return smp.stratified_sample(
        docs, "lang", _STRAT_FRACTIONS, ["doc_id"], seed="stratified"
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Corpus analysis: contamination, n-gram stats, mixing weights, funnel
# ---------------------------------------------------------------------------

def domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: at most 15 documents per source,
    chosen deterministically by key hash — no source dominates the
    mixture, and every engine agrees on which rows survive."""
    docs = _t(spark, sf_dir, "documents")
    return smp.capped_per_group(docs, "source", ["doc_id"], cap=15, seed="cap").select(
        "doc_id", "source", "lang"
    )


def contamination_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: every 20th document plays the eval
    benchmark; the rest of the corpus is scored by 3-gram overlap against
    the benchmark's (broadcast) shingle set. Corpus rows never shuffle —
    only per-doc counters do."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return crp.ngram_contamination(corpus, bench, "text", "doc_id", shingle_n=3)


def rag_passage_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: overlapping 32-token passages every 24 tokens per
    document (final passage may be shorter; docs below one window yield
    themselves) — ORACLE-CHECKED including the passage text. Pure
    codegen projection, zero shuffle (see operators.corpus.passage_windows)."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.passage_windows(docs, "text", "doc_id", size=32, stride=24)
    return out.select(
        F.col("id").alias("doc_id"), "passage_idx", "passage", "n_tokens"
    )


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling log-weights: every 20th document plays
    the target domain (same convention as contamination_vs_benchmark),
    the rest are scored by summed unigram log-probability ratios with
    additive smoothing — ORACLE-CHECKED (DuckDB recomputes both count
    tables, the smoothed ratios, and the per-doc fold)."""
    docs = _t(spark, sf_dir, "documents")
    tgt = docs.filter(F.col("doc_id") % 20 == 0)
    src = docs.filter(F.col("doc_id") % 20 != 0)
    out = crp.dsir_log_weights(src, tgt, "text", "doc_id", alpha=0.5)
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "log_weight")


def top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide 20 most frequent trigrams (count + doc frequency),
    deterministic under ties; plans as partial agg + TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    return crp.top_ngrams(docs, "text", "doc_id", shingle_n=3, k=20)


def token_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (bucket width 10, capped at 200+): the
    length-distribution profile every corpus report starts with. One
    partial+final hash aggregate over a pure-projection bucket key."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.least(
        (F.floor(tx.token_count("text") / 10) * 10).cast("bigint"), F.lit(200)
    )
    return docs.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n_docs"))


def lang_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus share + inverse-frequency mixing weight (the
    rebalancing table a data-mixture scheduler consumes)."""
    docs = _t(spark, sf_dir, "documents")
    return crp.mixing_weights(docs, "lang")


def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel report in ONE scan: how many documents survive each
    successive quality gate (non-empty -> >=10 tokens -> quality >= 0.5 ->
    english). Conditional-sum aggregation, no per-stage scans — at 100 TB
    each extra funnel stage is one more codegen'd column, not another job."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens = tx.token_count("text")
    quality = tx.quality_score("text")
    lang = tx.language_id("text")
    nonempty = F.length(F.trim("text")) > 0
    min_tok = nonempty & (n_tokens >= 10)
    good = min_tok & (quality >= 0.5)
    en = good & (lang == "en")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return docs.agg(
        F.count(F.lit(1)).alias("n_total"),
        one_if(nonempty).alias("n_nonempty"),
        one_if(min_tok).alias("n_min_tokens"),
        one_if(good).alias("n_quality"),
        one_if(en).alias("n_english"),
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics over the embedding column — the sanity
    profile for a vector corpus (catches unnormalized or degenerate
    batches). The norm is a sequential JVM fold (aggregate over the array,
    each float widened to double) so it matches the oracle's
    list_dot_product bit-for-bit; one narrow aggregate, no shuffle of
    vectors beyond the per-label partials."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end pre-training pipeline (composition of the operators above)
# ---------------------------------------------------------------------------

def _pretrain_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pretrain import pretrain_pipeline

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return pretrain_pipeline(corpus, benchmark=bench)


def pretrain_curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline, row-level: quality gates -> exact dedup
    -> decontamination -> stratified downsample -> split assignment, as one
    lazy plan. Oracle-checked per document — the strongest end-to-end
    correctness signal in the suite."""
    return _pretrain_curated(spark, sf_dir)


def pretrain_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (split, lang) doc/token/quality report over the curated corpus —
    what a data-mixture scheduler consumes."""
    from .pretrain import corpus_summary

    return corpus_summary(_pretrain_curated(spark, sf_dir))


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key candidates via a count-min sketch (the detector feeding
    skew.salted_aggregate): build a 4x256 sketch over event user_ids —
    one bounded, skew-free groupBy regardless of key cardinality — then
    keep every key whose ESTIMATE clears the threshold. est >= true
    always, so no genuinely hot key is missed (the one-sided CMS
    guarantee); the narrow width deliberately forces collisions at bench
    scale so overcounts are visible and value-checked. true_count rides
    along to expose the estimation error per key."""
    ev = _t(spark, sf_dir, "events")
    sk = cm.cms_build(ev, "user_id", width=256, depth=4)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    est = cm.cms_estimate(truth, sk, "user_id", width=256, depth=4)
    return est.filter(F.col("est_count") >= 60).select(
        "user_id", "true_count", "est_count"
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-linear quality gate, inference side: tokens
    -> md5 hash buckets -> weight-table join -> mean weight as the keep/
    drop logit. Weights are integer milli-units so the per-doc sum is
    exact int64 and the logit one deterministic double division —
    value-checkable with no rounding tolerance (the gate projects the
    exact integer sum, not the float logit — a rounded logit sits on
    round-half boundaries engines break differently). The pseudo-trained
    weight table stands in for a real model; the join shape is identical
    (see operators/classifier.py)."""
    docs = _t(spark, sf_dir, "documents")
    w = clf.pseudo_weights(spark, 4096)
    out = clf.classify(docs, w, "text", "doc_id", n_buckets=4096)
    return out.select(
        "doc_id",
        "n_terms",
        "w_milli_sum",
        (F.col("logit") > 0).alias("keep"),
    )


def embedding_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via 8-bit scalar quantization (SQ8), the fourth
    index family next to LSH (data-oblivious), IVF (adaptive-probe), and
    PQ (compressed-domain ADC). SQ8's entire training state is two
    plan-side aggregates (per-dimension min/max) — no driver sample, no
    seeded artifact, no collect — so unlike the other three families its
    oracle twin is static SQL, not a generated artifact replay. The scan
    scores dequantized reconstructions (1 byte/dim at rest), and the 20
    winners are exactly reranked so quantization error is visible
    per hit (sq_cos vs exact_cos)."""
    emb = _t(spark, sf_dir, "embeddings")
    top = sim.sq8_topk(emb, _query_vec_df(spark, sf_dir), k=20, rerank=True)
    return top.select(
        "vec_id",
        F.round("sq_cos_raw", 6).alias("sq_cos"),
        F.round("exact_cos_raw", 6).alias("exact_cos"),
    )


def bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: Bloom pre-filter + exact confirmation.

    History = even doc_ids, incoming = odd.  The history is folded into a
    Bloom words table (``bloom.bloom_build``); each incoming row pays k
    broadcast-join probes, and only the ``maybe`` slice is exactly
    confirmed against history — the join the filter exists to avoid never
    touches the definite-new rows.  The filter here is DELIBERATELY
    undersized (1024 bits for ~250 history docs, load ~1 bit/bit) so the
    false-positive path is exercised and value-checked at bench scale;
    production sizing comes from ``bloom.bloom_size_for`` (12 GB of bits
    covers 10 B documents at 1 % FPR).  Per-source accounting: candidate
    = flagged by the filter, true dup = exact text match in history,
    false positive = flagged but no match (resolved by the confirmation
    join).  No false negatives by construction — the oracle twin replays
    the identical md5/Kirsch-Mitzenmacher/bit arithmetic in DuckDB.
    """
    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    bl = blm.bloom_build(hist, "text", n_bits=1024, k=4)
    probed = blm.bloom_probe(
        inc, "text", bl, n_bits=1024, k=4, id_col="doc_id"
    )
    confirmed = (
        probed.filter(F.col("maybe_in_bloom"))
        .join(hist.select("text").distinct(), "text", "left_semi")
        .select("doc_id", F.lit(True).alias("is_dup"))
    )
    flagged = probed.join(confirmed, "doc_id", "left").withColumn(
        "is_dup", F.coalesce(F.col("is_dup"), F.lit(False))
    )
    maybe = F.col("maybe_in_bloom")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_incoming"),
        F.sum((~maybe).cast("long")).alias("n_definite_new"),
        F.sum(maybe.cast("long")).alias("n_candidate_dup"),
        F.sum(F.col("is_dup").cast("long")).alias("n_true_dup"),
        F.sum((maybe & ~F.col("is_dup")).cast("long")).alias("n_false_pos"),
    )


def bloom_words_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-exact profile of a production-sized Bloom filter over the whole
    documents table: word count, set-bit population, and a positional
    checksum (``sum(word_idx * word)``, < 2^52 so exact in BIGINT on any
    engine).  A single flipped bit anywhere in the filter changes the
    checksum — this is the strongest value check of the build path."""
    docs = _t(spark, sf_dir, "documents")
    bl = blm.bloom_build(docs, "text", n_bits=1 << 15, k=4)
    return bl.agg(
        F.count("*").alias("n_words"),
        F.sum(F.bit_count("word")).alias("n_set_bits"),
        F.sum(F.col("word_idx") * F.col("word")).alias("words_checksum"),
        F.min("word_idx").alias("min_word_idx"),
        F.max("word_idx").alias("max_word_idx"),
    )


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, checked
    against the exact distinct count in the same result row. The
    register build is ONE bounded hash-aggregate (at most
    ``n_types x 2^10`` shuffle rows regardless of user cardinality) —
    the shape that replaces ``countDistinct`` when the key space no
    longer fits a shuffle at 100 TB. The md5-derived registers replay
    bit-for-bit in the oracle (``hll.hll_oracle_sql``), so even the
    float estimate is value-checked, not tolerance-checked; the exact
    side here doubles as the accuracy witness (rel_err ~ 1.04/sqrt(m)
    ~ 3.2% at p=10)."""
    ev = _t(spark, sf_dir, "events")
    regs = hl.hll_registers(ev, "user_id", ["event_type"], p=10)
    est = hl.hll_estimate(regs, ["event_type"], p=10)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "estimate",
            "exact_distinct",
            F.round(
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def hll_register_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability witness: per-event-type sketches union by
    register-wise max (``hll.hll_merge``) into a global sketch that must
    be IDENTICAL — register table and estimate — to one built directly
    from all rows (max of maxes). That lossless-union property is what
    lets per-source/per-day sketches persist independently and roll up
    later without rescanning history. Output pins both estimates, their
    equality, and a register checksum (sum(bucket*register), exact
    int64) of the union sketch."""
    ev = _t(spark, sf_dir, "events")
    per_type = hl.hll_registers(ev, "user_id", ["event_type"], p=10)
    union = hl.hll_merge(per_type, [])
    direct = hl.hll_registers(ev, "user_id", [], p=10)
    u_est = hl.hll_estimate(union, [], p=10).select(
        F.col("estimate").alias("union_estimate")
    )
    d_est = hl.hll_estimate(direct, [], p=10).select(
        F.col("estimate").alias("direct_estimate")
    )
    checksum = union.agg(
        F.sum(F.col("bucket") * F.col("register")).alias("register_checksum"),
        F.count(F.lit(1)).alias("n_registers"),
    )
    return (
        u_est.crossJoin(d_est)
        .crossJoin(checksum)
        .select(
            "union_estimate",
            "direct_estimate",
            (F.col("union_estimate") == F.col("direct_estimate")).alias(
                "union_equals_direct"
            ),
            "register_checksum",
            "n_registers",
        )
    )


_BM25_QUERIES = {
    "q_exec": ["spark", "window", "merge"],
    "q_io": ["scan", "batch"],
    "q_cust": ["customer", "vector"],
}


def hll_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra, the estimated leg: |A∩B| by inclusion-exclusion
    over two HLL sketches (est(A) + est(B) - est(A∪B)) — the union is
    EXACT on registers (max-merge), so intersection inherits only the
    two estimates' error. Audited in-row against the exact intersection
    (the thing that needs a full distinct shuffle the sketches avoid).
    Deterministic: all three estimates derive from the same md5
    registers the oracle replays."""
    ev = _t(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view")
    buyers = ev.filter(F.col("event_type") == "purchase")
    ra = hl.hll_registers(viewers, "user_id", p=10)
    rb = hl.hll_registers(buyers, "user_id", p=10)
    est_a = hl.hll_estimate(ra, p=10).select(
        F.col("estimate").alias("est_viewers")
    )
    est_b = hl.hll_estimate(rb, p=10).select(
        F.col("estimate").alias("est_buyers")
    )
    est_u = hl.hll_estimate(hl.hll_merge(ra.unionByName(rb), []), p=10).select(
        F.col("estimate").alias("est_union")
    )
    exact = (
        viewers.select("user_id")
        .intersect(buyers.select("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(exact)
        .select(
            "est_viewers",
            "est_buyers",
            "est_union",
            F.round(
                F.col("est_viewers")
                + F.col("est_buyers")
                - F.col("est_union"),
                4,
            ).alias("est_both"),
            "exact_both",
        )
    )


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-5 per query over the documents corpus — the
    scored-retrieval primitive behind contamination triage and
    hard-negative mining (``operators/retrieval`` module doc). Scoring
    touches only the posting rows of query terms (broadcast equi-join =
    posting-list seek); scores round to 4 dp BEFORE ranking with doc_id
    tie-break, the cross-engine ranking contract."""
    docs = _t(spark, sf_dir, "documents")
    postings = rtr.term_postings(docs)
    return rtr.bm25_topk(
        postings, rtr.query_frame(spark, _BM25_QUERIES), k=5
    ).orderBy("query_id", "rank")


def bm25_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 statistics path in isolation: per query-term document
    frequency and idf, plus corpus N/avgdl — value-checks the stats
    independently of the score composition so a regression localizes."""
    docs = _t(spark, sf_dir, "documents")
    postings = rtr.term_postings(docs)
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.round(F.avg("dl"), 4).alias("avgdl")
    )
    terms = rtr.query_frame(spark, _BM25_QUERIES).select("term").distinct()
    dfreq = (
        postings.join(F.broadcast(terms), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            F.round(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ).alias("idf"),
            "n_docs",
            "avgdl",
        )
        .orderBy("term")
    )


def _cosupplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical co-supplier edge set: suppliers that shipped lines of
    the same order during 1997 Q1 (the window keeps the graph sparse
    enough that triangle structure is non-trivial rather than
    near-complete)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey"), F.col("l_suppkey").alias("s2")
    )
    pairs = li.join(l2, "l_orderkey").filter(
        F.col("l_suppkey") != F.col("s2")
    )
    return tri.canonical_edges(pairs, "l_suppkey", "s2")


def cosupplier_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle count + global clustering coefficient
    over the co-supplier graph (``graph/triangles`` module doc: the
    orientation bounds the wedge join at O(m^1.5) regardless of hot
    nodes — the property that keeps this runnable on a follows graph
    with celebrity skew). Every column exact-integer except the final
    coefficient division."""
    return tri.triangle_stats(_cosupplier_edges(spark, sf_dir))


def cosupplier_triangle_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle membership over the same graph — the local
    density signal (bot rings and tight communities surface as high
    per-node triangle counts)."""
    return (
        tri.node_triangle_counts(_cosupplier_edges(spark, sf_dir))
        .orderBy(F.desc("n_triangles"), "node")
        .limit(25)
    )


def lpa_supplier_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation over the co-supplier
    graph (``graph/lpa`` module doc): 4 fixed rounds, most-common
    neighbor label, smallest label on ties — every update an exact
    integer aggregate, so the community assignment is value-checked by
    an INDEPENDENT single-process replay embedded as the oracle
    (pagerank discipline, not a shared artifact)."""
    edges = _cosupplier_edges(spark, sf_dir)
    directed = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = lpa.label_propagation(directed, n_iter=4)
    return lpa.community_sizes(labels).orderBy(
        F.desc("n_members"), "community"
    )


def zorder_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit over (user_id, event time): quantize both
    dims onto the full 16-bit budget from their global min/max, Morton-
    interleave, bucket by the top z-bits (the file boundaries a writer
    would cut), and report per-bucket bounding boxes. Tight boxes in
    BOTH dims are the direct evidence a filter on either column skips
    most files at 100 TB (``operators/layout`` module doc) — a
    single-column sort would show x_span ~ full domain in every bucket.
    Pure integer bit arithmetic end to end; static SQL replay."""
    ev = _t(spark, sf_dir, "events")
    secs = _ntz_epoch_seconds("ts")
    base = ev.select(
        F.col("user_id").cast("long").alias("uid"), secs.alias("secs")
    )
    rng = base.agg(
        F.min("uid").alias("umin"),
        F.max("uid").alias("umax"),
        F.min("secs").alias("smin"),
        F.max("secs").alias("smax"),
    )
    q = base.crossJoin(F.broadcast(rng)).select(
        lay.quantize_dim(
            F.col("uid"), F.col("umin"), F.col("umax"), 16
        ).alias("qx"),
        lay.quantize_dim(
            F.col("secs"), F.col("smin"), F.col("smax"), 16
        ).alias("qy"),
    )
    return lay.zorder_profile(q, "qx", "qy", bits=16, n_buckets=64)


def embedding_ivf_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN retrieval (``similarity.ivf_knn_join``): top-10 corpus
    neighbors for each of eight query vectors, searching only each
    query's nprobe=4 of 16 IVF cells — the index-accelerated form of
    embedding_knn_join (hard-negative mining / retrieval eval at 100 TB
    runs THIS shape: candidates are |Q| * n * nprobe/n_centroids
    instead of |Q| * n). Centroids are a deterministic function of the
    corpus sample, so the whole pipeline — assignment ties to the
    higher cell, probe selection, pruned cosine, (cos desc, neighbor
    asc) ranking — replays as generated DuckDB SQL with the centroid
    literals embedded (build_artifact_oracles)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sim.ivf_centroids(emb, n_centroids=16)
    return sim.ivf_knn_join(
        emb, queries, k=10, centroids=cents, nprobe=4
    )


def zorder_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-order WRITE path end-to-end (``layout.write_zordered``):
    events (user_id, event time) are quantized, Morton-interleaved, cut
    into 64 equal-width z-range buckets, and physically written as one
    ``zbucket=<i>/`` partition directory each with rows z-sorted inside;
    the audit then READS THE FILES BACK and reports per-bucket row
    counts, raw-dimension bounding boxes, and an id-sum checksum. The
    oracle replays the identical quantize->interleave->bucket arithmetic
    as static SQL over the raw table — so a pass proves the files on
    disk realize exactly the layout the profile promises (bucket
    membership, counts, and boxes all value-checked through the
    write+read round trip). Equal-width z-buckets (not sampled range
    boundaries) are what make the writer oracle-replayable at all."""
    import hashlib

    ev = _t(spark, sf_dir, "events")
    secs = _ntz_epoch_seconds("ts")
    base = ev.select(
        F.col("event_id").cast("long").alias("eid"),
        F.col("user_id").cast("long").alias("uid"),
        secs.alias("secs"),
    )
    # per-process scratch path: keyed by corpus AND pid so two
    # concurrent runs (gate test + bench, xdist workers) can't race
    # overwrite-vs-read on the same directory. Dead processes' leftovers
    # are reaped here (pid-liveness probe) so /tmp stays bounded at one
    # copy per LIVE process instead of growing per run.
    import glob
    import shutil

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    for stale in glob.glob(f"/tmp/spark_graft_zorder_audit_{tag}_*"):
        try:
            pid = int(stale.rsplit("_", 1)[-1])
            if pid != os.getpid():
                os.kill(pid, 0)  # raises if the owner is gone
        except ValueError:
            continue
        except ProcessLookupError:
            # owner is gone — safe to reap
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            # a LIVE process under another uid reused the pid: leave its
            # files alone and keep going (not a failure of THIS audit)
            continue
    path = f"/tmp/spark_graft_zorder_audit_{tag}_{os.getpid()}"
    lay.write_zordered(base, path, "uid", "secs", bits=16, n_buckets=64)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("zbucket").cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("uid").alias("u_min"),
            F.max("uid").alias("u_max"),
            F.min("secs").alias("s_min"),
            F.max("secs").alias("s_max"),
            F.sum("eid").alias("id_checksum"),
        )
        .orderBy("zbucket")
    )


def kcore_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core backbone of the co-supplier graph (``graph/kcore`` module
    doc): simultaneous degree peeling to the unique fixpoint, one
    bounded shuffle per round over a shrinking edge list. k is derived
    from the graph itself — 70% of the average degree, in exact integer
    arithmetic ``(14*E) // (10*N)`` — so the core stays non-empty (and
    proper wherever the degree distribution has a tail) at every test
    scale; the density of THIS graph varies 10x across sf. Two tiny
    driver-side count jobs fix k before peeling (the adaptive-dispatch
    pattern); the oracle re-derives the same k and independently
    re-peels the same edge set single-process."""
    edges = dd._persist(_cosupplier_edges(spark, sf_dir))
    n_edges = edges.count()
    n_nodes = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .distinct()
        .count()
    )
    k = max(1, (14 * n_edges) // (10 * max(n_nodes, 1)))
    return kcr.kcore_stats(edges, k=k)


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-snapshot diff audit (``operators/diff`` module doc): two
    deterministic versions of the orders table — rows keyed %7==6
    appear only in the new snapshot (added), %5==4 only in the old
    (removed), %11==0 get a price bump (changed) — classified by one
    full-outer join with null-safe column comparison, then reduced to
    per-status counts + key checksums. The operation a deployment runs
    on every fresh full snapshot before trusting it as an incremental
    source."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 7 != 6)
    new = orders.filter(F.col("o_orderkey") % 5 != 4).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.5
        ).otherwise(F.col("o_totalprice")),
    )
    d = dff.snapshot_diff(
        old, new, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
    return dff.diff_summary(d, "o_orderkey")


def winnow_plagiarism_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style plagiarism detection (Schleimer et al. 2003 winnowing):
    per-window-minimum selection keeps ~2/(w+1) of the 5-gram hashes as
    position-robust fingerprints — any shared substring of >= w+k-1 = 8
    tokens is guaranteed a shared fingerprint — then a df-capped
    equi-join on fingerprint value surfaces pairs sharing >= 2. The
    engine-portable md5 hash makes the whole selection (window minima
    included) replay as static ANSI SQL; every output column is an
    exact integer."""
    docs = _t(spark, sf_dir, "documents")
    return dd.winnow_shared_pairs(
        docs, k=5, w=4, min_shared=2, max_df=50
    )


def winnow_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing profile: gram count, selected-fingerprint
    count, and the selection fraction (expected ~2/(w+1) ~ 0.4 at w=4,
    lower when repeated text lets one minimum cover many windows — so
    the fraction itself is a cheap repetitiveness signal)."""
    docs = _t(spark, sf_dir, "documents")
    fps = dd.winnow_fingerprints(docs, k=5, w=4)
    n_fp = fps.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
    n_grams = (
        dd._shingle_stream(docs, "text", "doc_id", 5)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    return n_grams.join(n_fp, "id").select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_fp",
        # UNROUNDED: one double division of the same exact int64s is
        # bitwise identical on every engine, while round() sits on
        # half-boundaries Spark (decimal HALF_UP) and DuckDB (binary)
        # break differently — the documented classifier lesson
        (F.col("n_fp") / F.col("n_grams")).alias("fp_frac"),
    )


def pagerank_supplier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier influence via integer-exact distributed PageRank (the
    third iterative algorithm next to connected components and the
    fixed-point k-means): nodes are customers (2k) and suppliers (2k+1)
    on the who-buys-from-whom graph (distinct lineitem x orders pairs,
    both directions so no node dangles), 5 damped iterations of pure
    int64 mass arithmetic — partition-order invariant, so the oracle
    generator INDEPENDENTLY replays the identical recursion over the
    same edge set and the top-20 (mass desc, suppkey) must agree
    exactly (graph/pagerank.py). Top-k via orderBy+limit
    (TakeOrderedAndProject — no single-task window)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pgr.pagerank(edges, n_iter=5)
    return (
        ranks.filter(F.col("node") % 2 == 1)
        .select(F.expr("(node - 1) div 2").alias("suppkey"), "mass")
        .orderBy(F.desc("mass"), "suppkey")
        .limit(20)
    )


_KMEANS_CENT_CACHE: dict[tuple, list[list[float]]] = {}


def _kmeans_cents(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Distributed-k-means centroids for the corpus, cached per
    (path, mtime) like the other per-corpus artifacts so bench passes
    don't re-pay the Lloyd iterations."""
    key = _emb_cache_key(sf_dir)
    if key not in _KMEANS_CENT_CACHE:
        _KMEANS_CENT_CACHE[key] = clu.kmeans_fit(
            _t(spark, sf_dir, "embeddings"), k=8, n_iter=4
        )
    return _KMEANS_CENT_CACHE[key]


def kmeans_corpus_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering with DISTRIBUTED Lloyd k-means (domain discovery
    for mixture balancing): unlike the sample-trained IVF quantizer, the
    iterations here run as Spark aggregations over every vector, made
    value-checkable by fixed-point quantization — per-cluster sums are
    exact int64, so the oracle generator recomputes the SAME training
    single-process and must land bitwise-identical centroids (an
    independent replay of training, a stronger check than the
    shared-artifact ANN twins; operators/clustering.py). Output:
    per-cluster membership count, exact id checksum, and mean squared
    distance to the centroid."""
    emb = _t(spark, sf_dir, "embeddings")
    a = clu.kmeans_assign(emb, _kmeans_cents(spark, sf_dir))
    return a.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("id").alias("sum_vec_id"),
        F.round(F.avg("dist2"), 6).alias("avg_dist2"),
    )


def kmeans_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a data-mixture scheduler reads off the clustering: per
    (cluster, source) document counts and exact char mass — the inputs
    to per-domain sampling weights. Joins the assignment frame to
    documents on the shared id space; every output is an exact integer,
    so the twin has zero float-parity surface."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    a = clu.kmeans_assign(emb, _kmeans_cents(spark, sf_dir))
    return (
        a.join(docs, a["id"] == docs["doc_id"])
        .groupBy("cluster", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def events_daily_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward gap fill (``operators/timeseries``
    module doc): per-user daily grid from each user's own min to max
    observed day, exact event counts (0 on gap days), and the day's
    average value carried forward through gaps. The grid explode runs on
    the one-row-per-user span frame, AFTER aggregation; the fill window
    is partitioned by user (never a global window). The day average is
    computed in fixed point — sum of floor(value*1e6) BIGINTs (exact and
    summation-order-invariant, the k-means discipline) divided by
    count*1e6 — and deliberately NOT rounded: both engines perform the
    identical integer-to-double division, so the result is bit-equal by
    construction, whereas round() disagrees on exact half-boundaries
    (Spark HALF_UP vs DuckDB half-even flipped 67.49125 at sf0.1)."""
    ev = _t(spark, sf_dir, "events")
    day_avg = F.sum(F.floor(F.col("value") * 1000000)) / (
        F.count("value") * F.lit(1000000.0)
    )
    out = tss.resample_fill(
        ev.select("user_id", "ts", "value"),
        keys=["user_id"],
        epoch_col=_ntz_epoch_seconds("ts"),
        step=86400,
        aggs={"day_avg_value": day_avg},
        fill_cols=["day_avg_value"],
    )
    return out.select(
        "user_id",
        F.col("bucket_start").alias("day_start"),
        "n_events",
        F.col("day_avg_value").alias("filled_avg_value"),
    )


def user_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 rebuild (``operators/scd`` module doc): per-user
    event_type version history — consecutive same-type events collapse
    into one version, each version carries a half-open
    [valid_from, valid_to) epoch-second interval, the latest is flagged
    current. Ordering is (epoch second, event_id): a TOTAL order that
    both engines compute identically (raw ns timestamps would tie at
    different precisions cross-engine — the header's timestamp rule)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        _ntz_epoch_seconds("ts").alias("es"),
    )
    hist = sc2.scd2_history(
        ev,
        keys=["user_id"],
        valid_from=F.col("es"),
        order_cols=[F.col("es"), F.col("event_id")],
        attr_cols=["event_type"],
    )
    return hist.select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        "version_n",
        "is_current",
    )


def orders_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint audit (``operators/audit`` module doc):
    the pre-import quality gate the reference delegates to Postgres
    constraints (schema/*.sql PKs and NOT NULLs), run as ONE aggregation
    pass over the fact table plus one broadcast RI join. The
    ``unique_probe`` constraint is deliberately strict (o_custkey is a
    foreign key, not a key) so the report exercises the failing branch
    on real data."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    checks = [
        aud.Check(
            "orders.o_custkey.complete", aud.completeness("o_custkey")
        ),
        aud.Check(
            "orders.o_orderkey.unique", aud.uniqueness("o_orderkey")
        ),
        aud.Check(
            "orders.o_custkey.unique_probe", aud.uniqueness("o_custkey")
        ),
        aud.Check(
            "orders.o_totalprice.positive",
            aud.satisfies(F.col("o_totalprice") > 0),
        ),
        aud.Check(
            "orders.o_orderstatus.domain",
            aud.satisfies(F.col("o_orderstatus").isin("O", "F", "P")),
        ),
    ]
    ri = aud.referential_integrity(
        orders,
        "o_custkey",
        customer,
        "c_custkey",
        "orders.o_custkey.ref_customer",
    )
    return aud.audit_suite([aud.table_audit(orders, checks), ri])


# deterministic "dirty" twin of the customer table for the linkage
# queries: per-key perturbation mode (substitute a digit with 'X' /
# delete a digit / append a char / identity) at a per-key position —
# the same arithmetic replays as SQL in the oracle
_DIRTY_NAME_EXPR = (
    "CASE CAST(c_custkey % 4 AS INT) "
    "WHEN 0 THEN concat(substr(c_name, 1, CAST(9 + c_custkey % 8 AS INT)), 'X', "
    "substr(c_name, CAST(9 + c_custkey % 8 AS INT) + 2)) "
    "WHEN 1 THEN concat(substr(c_name, 1, CAST(9 + c_custkey % 8 AS INT)), "
    "substr(c_name, CAST(9 + c_custkey % 8 AS INT) + 2)) "
    "WHEN 2 THEN concat(c_name, 'Z') "
    "ELSE c_name END"
)


def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("d_key"),
        "c_nationkey",
        F.expr(_DIRTY_NAME_EXPR).alias("d_name"),
    )


def _linkage_corpus(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """THE (dirty, clean) linkage corpus — single definition shared by
    the blocked query, the auto-dispatch query, and (via import) the
    scale study's A/B, so the preprocessing can't silently diverge from
    the oracle twin. Every customer name carries the literal 'Customer#'
    prefix and the perturbations only touch the digit region, so both
    sides strip the constant prefix before the quadratic metric —
    standard Levenshtein preprocessing (identical common prefixes never
    contribute edits); measured ~2x on the pair scan. The oracle strips
    identically."""
    clean = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("substr(c_name, 10)").alias("c_suffix"),
    )
    dirty = _dirty_customers(spark, sf_dir).select(
        "d_key",
        "c_nationkey",
        F.expr("substr(d_name, 10)").alias("d_suffix"),
    )
    return dirty, clean


def _linkage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    dirty, clean = _linkage_corpus(spark, sf_dir)
    return lk.blocked_pairs(
        dirty,
        clean,
        block_cols=["c_nationkey"],
        left_id="d_key",
        right_id="c_custkey",
        left_text="d_suffix",
        right_text="c_suffix",
        max_distance=2,
    )


def fuzzy_customer_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage (``operators/linkage`` module doc):
    a deterministically-perturbed "dirty" copy of the customer table is
    linked back to the clean table — equi-join on the nation blocking
    key, length pre-filter, Levenshtein <= 2 — and the match pairs are
    profiled per edit distance with id-sum checksums. Levenshtein is
    unit-cost in both engines, so the whole pipeline replays as SQL."""
    return (
        _linkage_pairs(spark, sf_dir)
        .groupBy("distance")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d_key").alias("dirty_checksum"),
            F.sum("c_custkey").alias("clean_checksum"),
        )
        .orderBy("distance")
    )


def fuzzy_linkage_auto_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEASURED blocked-vs-PassJoin dispatch as a first-class query
    (``linkage.auto_pairs``): decide_pairs_strategy compares the exact
    block-pair budget against a sampled estimate of PassJoin candidates
    (both in the shared candidate-pair currency), runs the cheaper
    side, and — because both operators are EXACT edit-distance joins —
    the result is strategy-independent: the oracle is the same
    all-pairs twin as fuzzy_customer_linkage, so the gate value-checks
    that dispatch can never change answers, only cost. On this
    zero-padded low-entropy corpus the blocked side wins (segments
    collide corpus-wide; plan-pinned in tests/test_linkage_dispatch)."""
    dirty, clean = _linkage_corpus(spark, sf_dir)
    pairs = lk.auto_pairs(
        dirty,
        clean,
        block_cols=["c_nationkey"],
        left_id="d_key",
        right_id="c_custkey",
        left_text="d_suffix",
        right_text="c_suffix",
        max_distance=2,
    )
    return (
        pairs.groupBy("distance")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d_key").alias("dirty_checksum"),
            F.sum("c_custkey").alias("clean_checksum"),
        )
        .orderBy("distance")
    )


def fuzzy_customer_linkage_fine_block(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The linkage module's documented mitigation for the quadratic
    nation-block regime (``operators/linkage`` module doc: "a block
    that big means the blocking key is underspecified, and the fix is a
    finer key"), measured instead of asserted (round-7 verdict #5):
    two-pass multi-pass blocking (Hernández & Stolfo sorted-
    neighborhood discipline) on (nation, first-5 suffix chars) UNION
    (nation, last-4 suffix chars), pair-distinct, then the same
    distance profile as fuzzy_customer_linkage plus an ``n_true``
    column making recall visible in the gate.

    The two keys are chosen LOSSLESS for this corpus's perturbation
    family (one edit at suffix position k in [0,7], or an append):
    substitution/deletion at k <= 4 leaves the last 4 characters
    counted from the END intact (a deletion before position 5 shifts
    the tail left exactly one, so dirty[-4:] == clean[-4:]);
    substitution/deletion at k >= 5 and the append leave the first 5
    intact — so every true pair survives at least one pass, which the
    oracle twin and test_linkage.py's recall check both pin. Cross-
    block distance<=2 coincidences ARE dropped relative to the
    all-pairs query — that is the documented trade; n_true is what the
    fine key promises to keep.

    The quadratic core runs on DISTINCT (nation, suffix) texts, then
    expands matches back to rows through two equi-joins — exact (the
    metric depends only on the texts) and the standard mitigation for
    duplicate-heavy corpora: replicated names multiply only the LINEAR
    expansion, never the pair scan. The pair set is identical to
    blocking the raw rows, so the oracle twin replays raw-row blocking
    and must agree."""
    dirty, clean = _linkage_corpus(spark, sf_dir)
    dd = (
        dirty.select("c_nationkey", "d_suffix")
        .distinct()
        .withColumn("_b1", F.expr("substr(d_suffix, 1, 5)"))
        .withColumn(
            "_b2", F.expr("substr(d_suffix, length(d_suffix) - 3, 4)")
        )
    )
    cc = (
        clean.select("c_nationkey", "c_suffix")
        .distinct()
        .withColumn("_b1", F.expr("substr(c_suffix, 1, 5)"))
        .withColumn(
            "_b2", F.expr("substr(c_suffix, length(c_suffix) - 3, 4)")
        )
    )

    def _pass(key: str) -> DataFrame:
        j = dd.select("c_nationkey", "d_suffix", key).join(
            cc.select("c_nationkey", "c_suffix", key),
            ["c_nationkey", key],
        )
        return (
            j.filter(
                F.abs(F.length("d_suffix") - F.length("c_suffix")) <= 2
            )
            .withColumn("distance", F.levenshtein("d_suffix", "c_suffix", 2))
            .filter(F.col("distance") >= 0)
            .select("c_nationkey", "d_suffix", "c_suffix", "distance")
        )

    text_pairs = _pass("_b1").unionByName(_pass("_b2")).distinct()
    pairs = text_pairs.join(
        dirty, ["c_nationkey", "d_suffix"]
    ).join(clean, ["c_nationkey", "c_suffix"])
    return (
        pairs.groupBy("distance")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d_key").alias("dirty_checksum"),
            F.sum("c_custkey").alias("clean_checksum"),
            F.sum(
                (F.col("d_key") == F.col("c_custkey")).cast("bigint")
            ).alias("n_true"),
        )
        .orderBy("distance")
    )


def linkage_self_match_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage resolution quality: per dirty record keep the best match
    (min distance, then min clean key — deterministic), then measure how
    often the best match is the record's true source. Single-digit name
    collisions make this genuinely < 1: a substituted digit is
    equidistant from several neighboring customer names, and the
    smallest-key tiebreak sometimes picks a neighbor — exactly the
    ambiguity a real linkage pipeline has to quantify."""
    best = lk.best_match(
        _linkage_pairs(spark, sf_dir), "d_key", "c_custkey"
    )
    is_self = (F.col("d_key") == F.col("c_custkey")).cast("double")
    return best.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(is_self.cast("bigint")).alias("n_self"),
        F.round(F.avg(is_self), 6).alias("self_match_rate"),
    )


def event_value_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles (``operators/histogram`` module doc):
    per-event-type p50/p90/p99 of value answered from a 64-bin
    equi-width histogram — the distribution member of the mergeable
    sketch trio (HLL distinct / CMS frequency / histogram quantile).
    The estimate is the selected bin's upper edge, over the true
    quantile by at most one bin width; bin assignment, cumulative
    ranks, and edges are identical IEEE arithmetic cross-engine, so
    the whole chain replays as static SQL (unlike percentile sketches
    with engine-specific interpolation)."""
    ev = _t(spark, sf_dir, "events")
    hist = hg.histogram_build(
        ev, ["event_type"], "value", lo=0.0, width=8.0, n_bins=64
    )
    return hg.histogram_quantiles(
        hist, ["event_type"], [0.5, 0.9, 0.99], lo=0.0, width=8.0
    )


def khop_supplier_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (``graph/khop`` module doc): hop-distance rings
    around the three smallest co-supplier-graph nodes, k=3 — per (root,
    dist) node counts with id-sum checksums. Level-synchronous
    frontier expansion with per-round eager localCheckpoints (the
    k-core/CC lineage discipline); the oracle replays min-dist
    reachability as a recursive CTE over the same canonical edges."""
    edges = dd._persist(_cosupplier_edges(spark, sf_dir))
    nodes = (
        edges.select(F.col("a").alias("root"))
        .unionAll(edges.select(F.col("b").alias("root")))
        .distinct()
    )
    seeds = nodes.orderBy("root").limit(3)
    return kh.khop_summary(kh.khop_reach(edges, seeds, k=3))


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return q1_pricing_summary(spark, sf_dir)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_nation_revenue": q5_region_nation_revenue,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_part_value": q11_important_part_value,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_late_shippers": q21_late_shippers,
    "filter_dsl_in_gt": filter_dsl_in_gt,
    "filter_dsl_and_or": filter_dsl_and_or,
    "backfill_time_range": backfill_time_range,
    "join_left_ordered_agg": join_left_ordered_agg,
    "events_value_delta": events_value_delta,
    "rollup_revenue": rollup_revenue,
    "cube_order_stats": cube_order_stats,
    "distinct_buyers_per_segment": distinct_buyers_per_segment,
    "semi_join_buyers": semi_join_buyers,
    "anti_join_never_urgent": anti_join_never_urgent,
    "range_join_shipments": range_join_shipments,
    "asof_latest_order_per_event": asof_latest_order_per_event,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "embedding_dedup_clusters": embedding_dedup_clusters,
    "embedding_dedup_clusters_lsh": embedding_dedup_clusters_lsh,
    "dedup_exact_documents": dedup_exact_documents,
    "latest_event_per_user": latest_event_per_user,
    "window_topn_per_group": window_topn_per_group,
    "top1_order": top1_order,
    "sketch_order_stats": sketch_order_stats,
    "salted_event_stats": salted_event_stats,
    "exists_late_shipment_orders": exists_late_shipment_orders,
    "scalar_subquery_small_quantity_revenue": scalar_subquery_small_quantity_revenue,
    "moving_avg_user_value": moving_avg_user_value,
    "percentile_price_by_flag": percentile_price_by_flag,
    "corr_price_quantity": corr_price_quantity,
    "ntile_balance_quartiles": ntile_balance_quartiles,
    "pivot_revenue_by_year": pivot_revenue_by_year,
    "set_intersect_buyers": set_intersect_buyers,
    "set_except_no_orders": set_except_no_orders,
    "json_extract_sum": json_extract_sum,
    "hex_projection": hex_projection,
    "tumbling_event_counts": tumbling_event_counts,
    "sessionize_events": sessionize_events,
    "text_token_count": text_token_count,
    "text_quality": text_quality,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_repetition": text_repetition,
    "text_pii_redaction": text_pii_redaction,
    "text_gopher_repetition": text_gopher_repetition,
    "text_substring_dup_stats": text_substring_dup_stats,
    "tfidf_top_terms": tfidf_top_terms,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_jaccard_allpairs": dedup_ngram_jaccard_allpairs,
    "dedup_clusters": dedup_clusters,
    "passage_dedup_docs": passage_dedup_docs,
    "boilerplate_chunk_removal": boilerplate_chunk_removal,
    "epoch_shuffle_docs": epoch_shuffle_docs,
    "doc_novelty": doc_novelty,
    "pack_training_sequences": pack_training_sequences,
    "table_profile_orders": table_profile_orders,
    "events_interval_pairs": events_interval_pairs,
    "weighted_sample_docs": weighted_sample_docs,
    "q15_top_supplier": q15_top_supplier,
    "q12_priority_shipping": q12_priority_shipping,
    "balance_distribution_by_segment": balance_distribution_by_segment,
    "user_first_last_event": user_first_last_event,
    "orders_export_sorted": orders_export_sorted,
    "cohort_retention": cohort_retention,
    "event_funnel_steps": event_funnel_steps,
    "event_transition_matrix": event_transition_matrix,
    "copurchase_part_pairs": copurchase_part_pairs,
    "sliding_event_counts": sliding_event_counts,
    "unigram_logprob_score": unigram_logprob_score,
    "bigram_logprob_score": bigram_logprob_score,
    "dedup_simhash": dedup_simhash,
    "embedding_near_dup_lsh": embedding_near_dup_lsh,
    "embedding_cosine_scores": embedding_cosine_scores,
    "embedding_topk": embedding_topk,
    "embedding_lsh_topk": embedding_lsh_topk,
    "embedding_ivf_topk": embedding_ivf_topk,
    "embedding_ivf_knn_join": embedding_ivf_knn_join,
    "embedding_pq_topk": embedding_pq_topk,
    "embedding_semdedup": embedding_semdedup,
    "embedding_knn_join": embedding_knn_join,
    "graph_edges": graph_edges,
    "graph_nodes": graph_nodes,
    "graph_degrees": graph_degrees,
    "multimodal_features": multimodal_features,
    "sample_docs_hash": sample_docs_hash,
    "train_val_test_counts": train_val_test_counts,
    "split_leakage_pairs": split_leakage_pairs,
    "split_cluster_safe": split_cluster_safe,
    "soft_dedup_weights": soft_dedup_weights,
    "bloom_incremental_dedup": bloom_incremental_dedup,
    "kmeans_corpus_clusters": kmeans_corpus_clusters,
    "kmeans_domain_profile": kmeans_domain_profile,
    "winnow_plagiarism_pairs": winnow_plagiarism_pairs,
    "winnow_fingerprint_stats": winnow_fingerprint_stats,
    "pagerank_supplier_rank": pagerank_supplier_rank,
    "bloom_words_profile": bloom_words_profile,
    "hll_distinct_users": hll_distinct_users,
    "hll_register_union": hll_register_union,
    "hll_intersection_users": hll_intersection_users,
    "bm25_topk_docs": bm25_topk_docs,
    "bm25_term_stats": bm25_term_stats,
    "cosupplier_triangle_stats": cosupplier_triangle_stats,
    "cosupplier_triangle_nodes": cosupplier_triangle_nodes,
    "snapshot_diff_orders": snapshot_diff_orders,
    "events_daily_resampled": events_daily_resampled,
    "user_scd2_type_history": user_scd2_type_history,
    "orders_quality_audit": orders_quality_audit,
    "fuzzy_customer_linkage": fuzzy_customer_linkage,
    "fuzzy_customer_linkage_fine_block": fuzzy_customer_linkage_fine_block,
    "fuzzy_linkage_auto_dispatch": fuzzy_linkage_auto_dispatch,
    "linkage_self_match_rate": linkage_self_match_rate,
    "khop_supplier_reach": khop_supplier_reach,
    "event_value_quantile_hist": event_value_quantile_hist,
    "lpa_supplier_communities": lpa_supplier_communities,
    "kcore_supplier_stats": kcore_supplier_stats,
    "zorder_events_profile": zorder_events_profile,
    "zorder_write_audit": zorder_write_audit,
    "embedding_sq8_topk": embedding_sq8_topk,
    "quality_classifier_scores": quality_classifier_scores,
    "heavy_hitters_cms": heavy_hitters_cms,
    "lang_label_confusion": lang_label_confusion,
    "contrastive_negative_samples": contrastive_negative_samples,
    "contrastive_triplets": contrastive_triplets,
    "source_near_dup_matrix": source_near_dup_matrix,
    "length_curriculum_buckets": length_curriculum_buckets,
    "stratified_sample_by_lang": stratified_sample_by_lang,
    "domain_capped_sample": domain_capped_sample,
    "contamination_vs_benchmark": contamination_vs_benchmark,
    "top_trigrams": top_trigrams,
    "token_count_histogram": token_count_histogram,
    "lang_mixing_weights": lang_mixing_weights,
    "lang_mixing_temperature": lang_mixing_temperature,
    "dsir_importance_weights": dsir_importance_weights,
    "rag_passage_windows": rag_passage_windows,
    "quality_filter_funnel": quality_filter_funnel,
    "embedding_norm_stats": embedding_norm_stats,
    "pretrain_curated_docs": pretrain_curated_docs,
    "pretrain_corpus_summary": pretrain_corpus_summary,
}

# DuckDB oracle twins. Keys missing here (minhash/simhash/LSH/multimodal)
# are intentionally rows-only: their bucketing depends on engine hash
# functions and is not ANSI-SQL-expressible.
ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": """
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_region_nation_revenue": """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY r_name, n_name
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
               round(sum(CASE WHEN n1.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_year
    """,
    "q9_product_profit": """
        SELECT n_name AS nation,
               CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.8) * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS sum_profit_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_type = 'STANDARD'
        GROUP BY n_name, o_year
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    "q18_large_volume_customers": """
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q19_discounted_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    "q22_global_sales_opportunity": """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY c_nationkey
    """,
    "q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS supplycost
            FROM lineitem GROUP BY 1, 2
        ), eur AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), ps_eur AS (
            SELECT ps.l_partkey, ps.supplycost, eur.s_name, eur.s_acctbal, eur.n_name
            FROM ps JOIN eur ON l_suppkey = s_suppkey
        ), mc AS (
            SELECT l_partkey, min(supplycost) AS min_cost FROM ps_eur GROUP BY 1
        )
        SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
               round(supplycost, 6) AS supplycost
        FROM part
        JOIN ps_eur ON p_partkey = ps_eur.l_partkey
        JOIN mc ON ps_eur.l_partkey = mc.l_partkey AND supplycost = min_cost
        WHERE p_size BETWEEN 10 AND 15 AND p_type = 'STANDARD'
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q11_important_part_value": """
        WITH scoped AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'
        )
        SELECT l_partkey, round(sum(val), 2) AS part_value
        FROM scoped GROUP BY 1
        HAVING sum(val) > 0.001 * (SELECT sum(val) FROM scoped)
        ORDER BY part_value DESC, l_partkey
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = part.p_partkey)
    """,
    "q20_excess_shippers": """
        WITH shipped AS (
            SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2
        ), tot AS (
            SELECT l_partkey, sum(qty) AS tot_qty FROM shipped GROUP BY 1
        )
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (
              SELECT l_suppkey FROM shipped
              JOIN tot ON shipped.l_partkey = tot.l_partkey
              WHERE qty > 0.5 * tot_qty)
        ORDER BY s_name
    """,
    "q21_late_shippers": """
        WITH fli AS (
            SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        )
        SELECT s_name, count(*) AS numwait
        FROM fli l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 365 DAY
          AND EXISTS (
              SELECT 1 FROM fli l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM fli l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > l3.o_orderdate + INTERVAL 365 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "filter_dsl_in_gt": """
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 1000.0
    """,
    "filter_dsl_and_or": """
        SELECT event_id, user_id, event_type, round(value, 2) AS value
        FROM events
        WHERE (event_type = 'purchase' AND value >= 100.0)
           OR event_type IN ('error')
    """,
    "backfill_time_range": """
        SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderstatus
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    """,
    "join_left_ordered_agg": """
        SELECT c_custkey, c_name, oa.order_ids, COALESCE(oa.n_orders, 0) AS n_orders
        FROM customer
        LEFT JOIN (
            SELECT o_custkey,
                   string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey DESC) AS order_ids,
                   count(*) AS n_orders
            FROM orders
            WHERE o_orderstatus <> 'F'
            GROUP BY o_custkey
        ) oa ON c_custkey = oa.o_custkey
    """,
    "events_value_delta": """
        SELECT user_id, event_id,
               round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2) AS value_delta
        FROM events
    """,
    "rollup_revenue": """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "cube_order_stats": """
        SELECT o_orderstatus, o_orderpriority,
               round(avg(o_totalprice), 4) AS avg_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "distinct_buyers_per_segment": """
        SELECT c_mktsegment,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_buyers,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "semi_join_buyers": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "anti_join_never_urgent": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "range_join_shipments": """
        SELECT o_orderpriority,
               count(*) AS n_fast_lines,
               round(sum(l_extendedprice), 2) AS fast_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
                   AND l_shipdate >= o_orderdate
                   AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        GROUP BY o_orderpriority
    """,
    "asof_latest_order_per_event": """
        SELECT event_id, user_id, o_orderkey
        FROM (
            SELECT e.event_id, e.user_id, o.o_orderkey,
                   row_number() OVER (PARTITION BY e.event_id
                                      ORDER BY o.o_orderdate DESC NULLS LAST,
                                               o.o_orderkey DESC NULLS LAST) AS rn
            FROM events e
            LEFT JOIN orders o
              ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
            WHERE e.event_type = 'purchase'
        )
        WHERE rn = 1
    """,
    "embedding_near_dup_pairs": """
        SELECT id_a, id_b,
               round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 4) AS cos_sim
        FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS num,
                   sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) AS den
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        )
        WHERE CASE WHEN den > 0 THEN num / den ELSE 0.0 END >= 0.5
    """,
    "dedup_exact_documents": """
        SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, event_type, round(value, 2) AS value
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "window_topn_per_group": """
        SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        )
        WHERE rn <= 3
    """,
    "top1_order": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 1
    """,
    "salted_event_stats": """
        SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    "exists_late_shipment_orders": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    "scalar_subquery_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1
        WHERE l_quantity < (
            SELECT 0.5 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
        )
    """,
    "moving_avg_user_value": """
        SELECT user_id, event_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
               ), 4) AS trailing_avg
        FROM events
    """,
    "percentile_price_by_flag": """
        SELECT l_returnflag,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4)
                   AS price_p50,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4)
                   AS price_p90
        FROM lineitem GROUP BY l_returnflag
    """,
    "corr_price_quantity": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               round(stddev_samp(l_quantity), 4) AS qty_stddev,
               round(stddev_samp(l_extendedprice), 2) AS price_stddev
        FROM lineitem GROUP BY l_returnflag
    """,
    "ntile_balance_quartiles": """
        SELECT c_custkey, c_nationkey,
               ntile(4) OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
               ) AS balance_quartile
        FROM customer
    """,
    "pivot_revenue_by_year": """
        SELECT o_orderpriority,
               round(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
                              THEN o_totalprice END), 2) AS rev_1995,
               round(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                              THEN o_totalprice END), 2) AS rev_1996,
               round(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
                              THEN o_totalprice END), 2) AS rev_1997
        FROM orders GROUP BY o_orderpriority
    """,
    "set_intersect_buyers": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
    "set_except_no_orders": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
    """,
    "json_extract_sum": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    "hex_projection": """
        SELECT doc_id, '0x' || lower(hex(source)) AS source_hex FROM documents
    """,
    "tumbling_event_counts": """
        SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "sessionize_events": """
        SELECT user_id, session_idx,
               min(es) AS session_start,
               max(es) AS session_end,
               count(*) AS n_events
        FROM (
            SELECT user_id, es,
                   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM (
                SELECT user_id, ts, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS es,
                       CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT))
                                 OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                              OR CAST(floor(epoch(ts)) AS BIGINT)
                                 - lag(CAST(floor(epoch(ts)) AS BIGINT))
                                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
            )
        )
        GROUP BY user_id, session_idx
    """,
    "text_token_count": """
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]+')) AS INTEGER) AS n_bpe_tokens
        FROM documents
    """,
    "text_quality": """
        SELECT doc_id, round((
                 least(1.0, n_tokens / 20.0)
                 + alpha / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END)
                 + (1.0 - punct / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END))
                 + least(1.0, 5.0 * sw / (CASE WHEN n_tokens > 0 THEN n_tokens ELSE 1.0 END))
               ) / 4.0, 6) AS quality
        FROM (
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS DOUBLE) AS n_tokens,
                   CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS DOUBLE) AS nonspace,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                   CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
                   CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS DOUBLE) AS sw
            FROM documents
        )
    """,
    "text_lang_id": """
        SELECT doc_id,
               CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                    WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                    WHEN de > 0 AND de >= fr THEN 'de'
                    WHEN fr > 0 THEN 'fr'
                    ELSE 'und' END AS lang_pred
        FROM (
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS en,
                   len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|por|con|los)\\b')) AS es,
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b')) AS de,
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|en|un|du|que|pour)\\b')) AS fr
            FROM documents
        )
    """,
    "text_fingerprint": """
        SELECT doc_id, md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fp
        FROM documents
    """,
    "text_repetition": """
        SELECT doc_id,
               round(CASE WHEN length(trim(text)) = 0 THEN 0.0
                     ELSE 1.0 - CAST(len(list_distinct(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+'))) AS DOUBLE)
                              / CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS DOUBLE)
                     END, 6) AS repetition
        FROM documents
    """,
    "text_pii_redaction": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) AS n_ipv4,
               md5(regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g')) AS redacted_fp
        FROM documents
    """,
    "dedup_ngram_jaccard_allpairs": """
        -- Jaccard over df-capped shingle sets: shingles in more than 5%
        -- of the corpus (the engine's FRACTIONAL stop-shingle rule) are
        -- removed from both sides of the ratio before pairing.
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
                  FROM documents)
        ), shx AS (
            SELECT doc_id, unnest(s) AS shingle FROM base
        ), hot AS (
            SELECT shingle FROM shx GROUP BY shingle
            HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
        ), capped AS (
            SELECT doc_id, list(shingle) AS s
            FROM shx ANTI JOIN hot USING (shingle)
            GROUP BY doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.5
    """,
    "dedup_ngram_jaccard": """
        -- the LSH rerank's ground truth: at jaccard >= 0.8 the 16x4
        -- banding collides with probability ~1 - 3e-4 per pair, so the
        -- reranked candidate set equals the capped all-pairs set at 0.8
        -- (verified at every test sf; banding recall property-tested)
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
                  FROM documents)
        ), shx AS (
            SELECT doc_id, unnest(s) AS shingle FROM base
        ), hot AS (
            SELECT shingle FROM shx GROUP BY shingle
            HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
        ), capped AS (
            SELECT doc_id, list(shingle) AS s
            FROM shx ANTI JOIN hot USING (shingle)
            GROUP BY doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.8
    """,
    "dedup_clusters": """
        WITH RECURSIVE base AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
                  FROM documents)
        ), shx AS (
            SELECT doc_id, unnest(s) AS shingle FROM base
        ), hot AS (
            -- the engine's fractional stop-shingle rule (df > 5%)
            SELECT shingle FROM shx GROUP BY shingle
            HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
        ), sh AS (
            SELECT doc_id, list(shingle) AS s
            FROM shx ANTI JOIN hot USING (shingle)
            GROUP BY doc_id
        ), pairs AS (
            SELECT id_a, id_b FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       round(len(list_intersect(a.s, b.s))::DOUBLE
                             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                             6) AS jaccard
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            ) WHERE jaccard >= 0.7
        ), edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach(src, dst) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
        )
        SELECT src AS doc_id,
               least(src, min(dst)) AS component,
               (src = least(src, min(dst))) AS keep
        FROM reach
        GROUP BY src
    """,
    "embedding_cosine_scores": """
        SELECT vec_id, round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS cos_sim
        FROM (
            SELECT e.vec_id,
                   list_dot_product(e.embedding::DOUBLE[], q.q) AS num,
                   sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(q.q, q.q)) AS den
            FROM embeddings e
            CROSS JOIN (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0) q
        )
    """,
    "embedding_topk": """
        SELECT vec_id, round(cos_raw, 6) AS cos_sim
        FROM (
            SELECT vec_id, CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS cos_raw
            FROM (
                SELECT e.vec_id,
                       list_dot_product(e.embedding::DOUBLE[], q.q) AS num,
                       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                         * sqrt(list_dot_product(q.q, q.q)) AS den
                FROM embeddings e
                CROSS JOIN (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0) q
            )
        )
        ORDER BY cos_raw DESC, vec_id
        LIMIT 20
    """,
    "graph_edges": """
        SELECT user_id AS src_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst_id,
               event_type AS rel_type
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    "graph_nodes": """
        SELECT user_id AS node_id FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        UNION
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS node_id FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    "graph_degrees": """
        WITH edges AS (
            SELECT user_id AS src_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst_id
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        ), outd AS (
            SELECT src_id AS node_id, count(*) AS out_degree FROM edges GROUP BY src_id
        ), ind AS (
            SELECT dst_id AS node_id, count(*) AS in_degree FROM edges GROUP BY dst_id
        )
        SELECT COALESCE(outd.node_id, ind.node_id) AS node_id,
               COALESCE(out_degree, 0) AS out_degree,
               COALESCE(in_degree, 0) AS in_degree
        FROM outd FULL OUTER JOIN ind ON outd.node_id = ind.node_id
    """,
    "sample_docs_hash": f"""
        SELECT doc_id, lang FROM documents
        WHERE {smp.hash_hex_sql(['doc_id'], 'sample')} < '{smp.threshold_hex(0.1)}'
    """,
    "train_val_test_counts": f"""
        SELECT {smp.split_case_sql(['doc_id'], _SPLIT_WEIGHTS, 'split')} AS split,
               count(*) AS n_docs
        FROM documents
        GROUP BY split
    """,
    "stratified_sample_by_lang": f"""
        -- fraction >= 1.0 strata keep EVERYTHING (mirrors the engine's
        -- short-circuit: the strict < 'ffffffff' form deterministically
        -- drops hash-boundary rows from keep-all strata)
        SELECT doc_id, lang FROM documents
        WHERE CASE lang
                {' '.join(f"WHEN '{v}' THEN " + ("TRUE" if fr >= 1.0 else f"{smp.hash_hex_sql(['doc_id'], 'stratified')} < '{smp.threshold_hex(fr)}'") for v, fr in _STRAT_FRACTIONS.items())}
                ELSE FALSE END
    """,
    "domain_capped_sample": f"""
        SELECT doc_id, source, lang FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY source
            ORDER BY {smp.hash_hex_sql(['doc_id'], 'cap')}, doc_id
        ) <= 15
    """,
    # the shingle CTE below mirrors operators.dedup._shingle_stream exactly:
    # tokens = whitespace-split of trim(lower(text)); complete 3-grams, or
    # one whole-text shingle for documents shorter than 3 tokens
    "contamination_vs_benchmark": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM toks
        ), shingle_rows AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
        ), bench AS (
            SELECT DISTINCT shingle FROM shingle_rows WHERE doc_id % 20 = 0
        )
        SELECT c.doc_id,
               count(*) AS n_shingles,
               count(b.shingle) AS n_contaminated,
               round(count(b.shingle) / count(*), 6) AS contamination
        FROM (SELECT * FROM shingle_rows WHERE doc_id % 20 <> 0) c
        LEFT JOIN bench b USING (shingle)
        GROUP BY c.doc_id
    """,
    "tfidf_top_terms": """
        WITH terms AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM terms WHERE term <> '' GROUP BY doc_id, term
        ), dfreq AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln(n.n_docs / dfreq.df), 4) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS INTEGER) AS rnk
        FROM scored
        QUALIFY rnk <= 3
    """,
    "top_trigrams": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM toks
        ), shingle_rows AS (
            SELECT doc_id, unnest(shingles) AS shingle FROM sh
        )
        SELECT shingle,
               count(*) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM shingle_rows
        GROUP BY shingle
        ORDER BY n_occurrences DESC, shingle
        LIMIT 20
    """,
    "token_count_histogram": """
        SELECT least(CAST(floor(n_tokens / 10) * 10 AS BIGINT), 200) AS bucket,
               count(*) AS n_docs
        FROM (
            SELECT CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tokens
            FROM documents
        )
        GROUP BY bucket
    """,
    "lang_mixing_weights": """
        WITH counts AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        )
        SELECT lang, n_docs,
               round(n_docs / sum(n_docs) OVER (), 6) AS share,
               round(sum(n_docs) OVER () / (count(*) OVER () * n_docs), 6) AS weight
        FROM counts
    """,
    "lang_mixing_temperature": """
        WITH counts AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ), shares AS (
            SELECT lang, n_docs,
                   n_docs / sum(n_docs) OVER () AS p,
                   pow(n_docs / sum(n_docs) OVER (), 0.3) AS pa
            FROM counts
        )
        SELECT lang, n_docs,
               round(p, 6) AS share,
               round(pa / sum(pa) OVER (), 6) AS temp_share,
               round((pa / sum(pa) OVER ()) / p, 6) AS sample_weight
        FROM shares
    """,
    "text_gopher_repetition": """
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
            FROM documents
        ), bi AS (
            SELECT doc_id, unnest(s) AS g FROM (
                SELECT doc_id,
                       CASE WHEN len(t) >= 2
                            THEN list_transform(
                                   generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])
                            ELSE [array_to_string(t, ' ')] END AS s
                FROM words)
        ), bc AS (
            SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g
        ), bstat AS (
            SELECT doc_id, max(c) AS b_top, sum(c) AS b_n FROM bc GROUP BY doc_id
        ), tri AS (
            SELECT doc_id, unnest(s) AS g FROM (
                SELECT doc_id,
                       CASE WHEN len(t) >= 3
                            THEN list_transform(
                                   generate_series(1, len(t) - 2),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                            ELSE [array_to_string(t, ' ')] END AS s
                FROM words)
        ), tc AS (
            SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g
        ), tstat AS (
            SELECT doc_id,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS t_dup,
                   sum(c) AS t_n
            FROM tc GROUP BY doc_id
        )
        SELECT b.doc_id,
               round(b_top / b_n::DOUBLE, 6) AS top_bigram_frac,
               round(t_dup / t_n::DOUBLE, 6) AS dup_trigram_frac,
               (round(b_top / b_n::DOUBLE, 6) <= 0.20
                AND round(t_dup / t_n::DOUBLE, 6) <= 0.30) AS repetition_ok
        FROM bstat b JOIN tstat USING (doc_id)
    """,
    "quality_filter_funnel": """
        WITH feats AS (
            SELECT length(trim(text)) > 0 AS nonempty,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS DOUBLE) AS n_tokens,
                   CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS DOUBLE) AS nonspace,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                   CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS en,
                   len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|por|con|los)\\b')) AS es,
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b')) AS de,
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|en|un|du|que|pour)\\b')) AS fr
            FROM documents
        ), gates AS (
            SELECT nonempty,
                   nonempty AND n_tokens >= 10 AS min_tok,
                   round((
                     least(1.0, n_tokens / 20.0)
                     + alpha / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END)
                     + (1.0 - punct / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END))
                     + least(1.0, 5.0 * CAST(en AS DOUBLE) / (CASE WHEN n_tokens > 0 THEN n_tokens ELSE 1.0 END))
                   ) / 4.0, 6) AS quality,
                   (en > 0 AND en >= es AND en >= de AND en >= fr) AS is_en
            FROM feats
        )
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN nonempty THEN 1 ELSE 0 END) AS BIGINT) AS n_nonempty,
               CAST(sum(CASE WHEN min_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_min_tokens,
               CAST(sum(CASE WHEN min_tok AND quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(sum(CASE WHEN min_tok AND quality >= 0.5 AND is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_english
        FROM gates
    """,
    "embedding_norm_stats": """
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               round(avg(nrm), 4) AS avg_norm,
               round(min(nrm), 4) AS min_norm,
               round(max(nrm), 4) AS max_norm
        FROM (
            SELECT label,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        )
        GROUP BY label
    """,
}


def _pretrain_curated_cte() -> str:
    """Oracle CTE chain replicating plans.pretrain.pretrain_pipeline stage
    by stage; every fragment is the already-proven oracle twin of the
    operator it mirrors (token count / quality / fingerprint / shingles /
    md5 sampling thresholds)."""
    from .pretrain import DEFAULT_SPLIT_WEIGHTS, DEFAULT_STRAT_FRACTIONS

    # fraction >= 1.0 strata keep everything (the engine's short-circuit)
    strat_arms = " ".join(
        "WHEN '%s' THEN %s"
        % (
            v,
            "TRUE"
            if fr >= 1.0
            else "%s < '%s'"
            % (smp.hash_hex_sql(["doc_id"], "pretrain-mix"), smp.threshold_hex(fr)),
        )
        for v, fr in DEFAULT_STRAT_FRACTIONS.items()
    )
    return f"""
        WITH f0 AS (
            SELECT doc_id, lang, text,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS INTEGER) AS n_tokens,
                   CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS DOUBLE) AS nonspace,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                   CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct,
                   CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS DOUBLE) AS sw,
                   md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fp
            FROM documents
            WHERE doc_id % 20 <> 0
        ), feats AS (
            SELECT doc_id, lang, text, n_tokens, fp,
                   round((
                     least(1.0, CAST(n_tokens AS DOUBLE) / 20.0)
                     + alpha / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END)
                     + (1.0 - punct / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END))
                     + least(1.0, 5.0 * sw / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) ELSE 1.0 END))
                   ) / 4.0, 6) AS quality
            FROM f0
        ), gated AS (
            SELECT * FROM feats
            WHERE length(trim(text)) > 0 AND n_tokens >= 5 AND quality >= 0.3
        ), deduped AS (
            SELECT * FROM gated
            QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
        ), ctoks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l FROM deduped
        ), csh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM ctoks
        ), corpus_sh AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest(shingles) AS shingle FROM csh)
        ), btoks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l
            FROM documents WHERE doc_id % 20 = 0
        ), bsh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM btoks
        ), bench_sh AS (
            SELECT DISTINCT shingle FROM (SELECT unnest(shingles) AS shingle FROM bsh)
        ), contam AS (
            SELECT c.doc_id, round(count(b.shingle) / count(*), 6) AS contamination
            FROM corpus_sh c LEFT JOIN bench_sh b USING (shingle)
            GROUP BY c.doc_id
        ), decont AS (
            SELECT d.doc_id, d.lang, d.n_tokens, d.quality,
                   COALESCE(ct.contamination, 0.0) AS contamination
            FROM deduped d LEFT JOIN contam ct USING (doc_id)
            WHERE COALESCE(ct.contamination, 0.0) <= 0.5
        ), curated AS (
            SELECT doc_id, lang, n_tokens, quality, contamination,
                   {smp.split_case_sql(['doc_id'], DEFAULT_SPLIT_WEIGHTS, 'pretrain-split')} AS split
            FROM decont
            WHERE CASE lang {strat_arms} ELSE FALSE END
        )
    """


ORACLE_SQL["pretrain_curated_docs"] = (
    _pretrain_curated_cte()
    + """
        SELECT doc_id, lang, n_tokens, quality, contamination, split FROM curated
    """
)

ORACLE_SQL["pretrain_corpus_summary"] = (
    _pretrain_curated_cte()
    + """
        SELECT split, lang,
               count(*) AS n_docs,
               sum(n_tokens) AS n_tokens,
               round(avg(quality), 4) AS avg_quality
        FROM curated
        GROUP BY split, lang
    """
)

ORACLE_SQL["passage_dedup_docs"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
        FROM words, UNNEST(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)
    ),
    ranked AS (
        SELECT doc_id, chunk_idx, chunk,
               row_number() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           md5(COALESCE(string_agg(
               CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY chunk_idx), ''))
               AS kept_text_md5
    FROM ranked
    GROUP BY doc_id
"""

ORACLE_SQL["doc_novelty"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ),
    d AS (
        SELECT doc_id, unnest(s) AS shingle FROM (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM words)
    ),
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM d GROUP BY shingle)
    SELECT d.doc_id, count(*) AS n_shingles,
           round(avg(CASE WHEN d.doc_id = f.first_doc THEN 1.0 ELSE 0.0 END), 4) AS novelty
    FROM d JOIN firsts f USING (shingle)
    GROUP BY d.doc_id
"""

ORACLE_SQL["q15_top_supplier"] = """
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""

ORACLE_SQL["orders_export_sorted"] = """
    SELECT CAST(o_orderdate AS DATE) AS o_orderdate, o_orderkey, o_custkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_orderdate, o_orderkey
"""

ORACLE_SQL["sliding_event_counts"] = """
    WITH base AS (
        SELECT event_type, value,
               (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS anchor
        FROM events
    ), expanded AS (
        SELECT event_type, value, anchor - i * 600 AS window_start
        FROM base, unnest([0, 1, 2]) u(i)
    )
    SELECT window_start, event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["event_transition_matrix"] = """
    WITH seq AS (
        SELECT user_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type
        FROM events
    )
    SELECT prev_type, next_type, count(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["copurchase_part_pairs"] = """
    WITH pairs AS (
        SELECT DISTINCT x.l_orderkey,
               x.l_partkey AS part_a, y.l_partkey AS part_b
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    )
    SELECT part_a, part_b, count(*) AS n_orders
    FROM pairs GROUP BY 1, 2
    HAVING count(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
"""

ORACLE_SQL["event_funnel_steps"] = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT 1 AS step_order, 'view' AS step, count(*) AS n_users,
           sum(CAST(floor(epoch(t1)) AS BIGINT)) AS step_ts_checksum FROM s1
    UNION ALL
    SELECT 2, 'click', count(*),
           sum(CAST(floor(epoch(t2)) AS BIGINT)) FROM s2
    UNION ALL
    SELECT 3, 'purchase', count(*),
           sum(CAST(floor(epoch(t3)) AS BIGINT)) FROM s3
    ORDER BY step_order
"""

ORACLE_SQL["cohort_retention"] = """
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_idx
        FROM events
    ),
    f AS (SELECT user_id, min(week_idx) AS cohort_week FROM uw GROUP BY user_id)
    SELECT f.cohort_week, uw.week_idx - f.cohort_week AS week_offset,
           count(*) AS active_users
    FROM uw JOIN f USING (user_id)
    GROUP BY 1, 2
"""

ORACLE_SQL["unigram_logprob_score"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT sum(c) AS n FROM freq)
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(-ln(f.c / tot.n)), 4) AS avg_neg_logprob
    FROM tok t JOIN freq f USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
"""

ORACLE_SQL["q12_priority_shipping"] = """
    SELECT CAST(quarter(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_quarter,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_quarter
"""

ORACLE_SQL["balance_distribution_by_segment"] = """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6)
               AS bal_percent_rank,
           round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6)
               AS bal_cume_dist
    FROM customer
"""

ORACLE_SQL["user_first_last_event"] = """
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_event_type,
           last_value(event_type) OVER w AS last_event_type,
           count(*) OVER w AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

ORACLE_SQL["multimodal_features"] = """
    SELECT doc_id AS media_id,
           'text/plain' AS mime_type,
           CAST(COALESCE(octet_length(CAST(text AS BLOB)), 0) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256,
           array_to_string(
             list_transform(range(8), i ->
               printf('%.4f',
                 CAST(CAST(
                   (strpos('0123456789abcdef', substr(sha256(text), 1 + 2*i, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(sha256(text), 2 + 2*i, 1)) - 1)
                 AS DOUBLE) / 255.0 AS REAL))),
             ',') AS feature_r4
    FROM documents
"""

ORACLE_SQL["pack_training_sequences"] = """
    WITH toks AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END
                    AS INTEGER) AS n_tokens
        FROM documents
    ),
    offs AS (
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                    AS BIGINT) AS "offset"
        FROM toks
    )
    SELECT doc_id, n_tokens, "offset",
           CAST(floor("offset" / 512.0) AS BIGINT) AS first_seq,
           CAST(floor(("offset" + greatest(n_tokens, 1) - 1) / 512.0) AS BIGINT) AS last_seq,
           CAST(floor(("offset" + greatest(n_tokens, 1) - 1) / 512.0)
                - floor("offset" / 512.0) + 1 AS BIGINT) AS n_seqs
    FROM offs
"""

ORACLE_SQL["table_profile_orders"] = """
    WITH w AS (
        SELECT
            sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS k_nulls,
            count(DISTINCT o_orderkey) AS k_distinct,
            CAST(min(o_orderkey) AS VARCHAR) AS k_min,
            CAST(max(o_orderkey) AS VARCHAR) AS k_max,
            sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS c_nulls,
            count(DISTINCT o_custkey) AS c_distinct,
            CAST(min(o_custkey) AS VARCHAR) AS c_min,
            CAST(max(o_custkey) AS VARCHAR) AS c_max,
            sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS s_nulls,
            count(DISTINCT o_orderstatus) AS s_distinct,
            CAST(min(o_orderstatus) AS VARCHAR) AS s_min,
            CAST(max(o_orderstatus) AS VARCHAR) AS s_max,
            sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS t_nulls,
            count(DISTINCT o_totalprice) AS t_distinct,
            printf('%.2f', min(o_totalprice)) AS t_min,
            printf('%.2f', max(o_totalprice)) AS t_max,
            sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS p_nulls,
            count(DISTINCT o_orderpriority) AS p_distinct,
            CAST(min(o_orderpriority) AS VARCHAR) AS p_min,
            CAST(max(o_orderpriority) AS VARCHAR) AS p_max
        FROM orders
    )
    SELECT 'o_orderkey' AS column_name, CAST(k_nulls AS BIGINT) AS n_nulls,
           CAST(k_distinct AS BIGINT) AS n_distinct, k_min AS min_value, k_max AS max_value FROM w
    UNION ALL
    SELECT 'o_custkey', CAST(c_nulls AS BIGINT), CAST(c_distinct AS BIGINT), c_min, c_max FROM w
    UNION ALL
    SELECT 'o_orderstatus', CAST(s_nulls AS BIGINT), CAST(s_distinct AS BIGINT), s_min, s_max FROM w
    UNION ALL
    SELECT 'o_totalprice', CAST(t_nulls AS BIGINT), CAST(t_distinct AS BIGINT), t_min, t_max FROM w
    UNION ALL
    SELECT 'o_orderpriority', CAST(p_nulls AS BIGINT), CAST(p_distinct AS BIGINT), p_min, p_max FROM w
"""

ORACLE_SQL["embedding_dedup_clusters"] = """
    WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE c >= 0.4
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS vec_id,
           least(src, min(dst)) AS component,
           (src = least(src, min(dst))) AS keep
    FROM reach
    GROUP BY src
"""

ORACLE_SQL["contrastive_triplets"] = """
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    ), pairs AS (
        SELECT id_a AS anchor, id_b AS positive FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.5
    ), ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) - 1 AS rnk,
               count(*) OVER () AS n_total
        FROM documents
    ), anchors AS (
        SELECT doc_id, rnk, n_total, unnest(generate_series(0, 1)) AS neg_idx
        FROM ranked
    ), targets AS (
        SELECT doc_id, neg_idx,
               (rnk + 1 + (CAST(concat('0x', substr(md5(
                    'neg:' || CAST(rnk AS VARCHAR) || ':' || CAST(neg_idx AS VARCHAR)
                ), 1, 8)) AS BIGINT) % (n_total - 1))) % n_total AS tr
        FROM anchors
    ), negs AS (
        SELECT t.doc_id AS anchor, t.neg_idx, r.doc_id AS negative
        FROM targets t JOIN ranked r ON r.rnk = t.tr
    )
    SELECT anchor, positive, neg_idx, negative
    FROM pairs JOIN negs USING (anchor)
    WHERE negative != positive
"""

ORACLE_SQL["contrastive_negative_samples"] = """
    WITH ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) - 1 AS rnk,
               count(*) OVER () AS n_total
        FROM documents
    ), anchors AS (
        SELECT doc_id, rnk, n_total, unnest(generate_series(0, 3)) AS neg_idx
        FROM ranked
    ), targets AS (
        SELECT doc_id, neg_idx,
               (rnk + 1 + (CAST(concat('0x', substr(md5(
                    'neg:' || CAST(rnk AS VARCHAR) || ':' || CAST(neg_idx AS VARCHAR)
                ), 1, 8)) AS BIGINT) % (n_total - 1))) % n_total AS tr
        FROM anchors
    )
    SELECT t.doc_id, t.neg_idx, r.doc_id AS neg_doc_id
    FROM targets t JOIN ranked r ON r.rnk = t.tr
"""

ORACLE_SQL["lang_label_confusion"] = """
    SELECT lang AS declared,
           CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                WHEN de > 0 AND de >= fr THEN 'de'
                WHEN fr > 0 THEN 'fr'
                ELSE 'und' END AS predicted,
           count(*) AS n_docs
    FROM (
        SELECT lang,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS en,
               len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|por|con|los)\\b')) AS es,
               len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b')) AS de,
               len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|en|un|du|que|pour)\\b')) AS fr
        FROM documents
    )
    GROUP BY declared, predicted
"""

# ONE oracle-side definition of the capped near-dup pair scan (trigram
# shingles, fractional df-cap 0.05, exact Jaccard >= 0.5) and of the
# component closure over it — composed into every 0.5-threshold twin
# below exactly the way the Spark side shares dd.jaccard_all_pairs /
# _near_dup_components, so the cluster definition cannot silently
# de-synchronize between oracles either.
_ORACLE_CAPPED_PAIRS_05 = """base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    ), pairs AS (
        SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.5
    )"""

_ORACLE_COMPONENT_CTES = """edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ), comp AS (
        SELECT src AS doc_id, least(src, min(dst)) AS component
        FROM reach GROUP BY src
    )"""

ORACLE_SQL["source_near_dup_matrix"] = f"""
    WITH {_ORACLE_CAPPED_PAIRS_05}
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs,
           round(avg(jaccard), 6) AS avg_jaccard
    FROM pairs
    JOIN documents da ON da.doc_id = id_a
    JOIN documents db ON db.doc_id = id_b
    GROUP BY source_a, source_b
"""

ORACLE_SQL["length_curriculum_buckets"] = """
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+'))
               END AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT n_tokens,
               row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rnk,
               count(*) OVER () AS n_total
        FROM toks
    )
    SELECT (rnk * 8) // n_total + 1 AS bucket,
           count(*) AS n_docs,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM ranked
    GROUP BY bucket
"""

ORACLE_SQL["split_leakage_pairs"] = f"""
    WITH {_ORACLE_CAPPED_PAIRS_05}, splits AS (
        SELECT doc_id,
               {smp.split_case_sql(["doc_id"], _SPLIT_WEIGHTS, "split")} AS split
        FROM documents
    )
    SELECT id_a, id_b, jaccard, sa.split AS split_a, sb.split AS split_b
    FROM pairs
    JOIN splits sa ON sa.doc_id = id_a
    JOIN splits sb ON sb.doc_id = id_b
    WHERE sa.split != sb.split
"""

ORACLE_SQL["split_cluster_safe"] = f"""
    WITH RECURSIVE {_ORACLE_CAPPED_PAIRS_05}, {_ORACLE_COMPONENT_CTES}, keyed AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, split_key,
           {smp.split_case_sql(["split_key"], _SPLIT_WEIGHTS, "split")} AS split
    FROM keyed
"""

ORACLE_SQL["soft_dedup_weights"] = f"""
    WITH RECURSIVE {_ORACLE_CAPPED_PAIRS_05}, {_ORACLE_COMPONENT_CTES}, sizes AS (
        SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT d.doc_id,
           coalesce(s.cluster_size, 1) AS cluster_size,
           round(1.0 / coalesce(s.cluster_size, 1), 6) AS weight
    FROM documents d
    LEFT JOIN comp c ON d.doc_id = c.doc_id
    LEFT JOIN sizes s ON c.component = s.component
"""

ORACLE_SQL["rag_passage_windows"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(generate_series(
                   0,
                   (CAST(greatest(ceil((len(t) - 32) / 24.0) + 1, 1) AS INTEGER) - 1) * 24,
                   24)) AS s
        FROM words
    )
    SELECT doc_id,
           CAST(s / 24 AS INTEGER) AS passage_idx,
           array_to_string(t[s+1:s+32], ' ') AS passage,
           CAST(least(32, len(t) - s) AS INTEGER) AS n_tokens
    FROM starts
"""

ORACLE_SQL["dsir_importance_weights"] = """
    WITH src AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents WHERE doc_id % 20 != 0
    ), tgt AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents WHERE doc_id % 20 = 0
    ), sc AS (
        SELECT tok, count(*) AS ns FROM src GROUP BY tok
    ), tc AS (
        SELECT tok, count(*) AS nt FROM tgt GROUP BY tok
    ), stats AS (
        SELECT tok, COALESCE(ns, 0) AS ns, COALESCE(nt, 0) AS nt
        FROM sc FULL OUTER JOIN tc USING (tok)
    ), tot AS (
        SELECT CAST(sum(ns) AS DOUBLE) AS tot_s,
               CAST(sum(nt) AS DOUBLE) AS tot_t,
               CAST(count(*) AS DOUBLE) AS vocab
        FROM stats
    )
    SELECT doc_id, count(*) AS n_tokens,
           -- + 0.0 normalizes IEEE -0.0 (see dsir_log_weights)
           round(sum(
               ln((nt + 0.5) / (tot_t + 0.5 * vocab))
               - ln((ns + 0.5) / (tot_s + 0.5 * vocab))
           ), 4) + 0.0 AS log_weight
    FROM src JOIN stats USING (tok) CROSS JOIN tot
    GROUP BY doc_id
"""

ORACLE_SQL["text_substring_dup_stats"] = """
    -- positional 10-gram stream with the engine's short-doc contract:
    -- for len < 10 the single window is the whole text (the slice
    -- t[i:i+9] truncates to available tokens, so one formula covers
    -- both); a position is duplicated when its gram occurs > 1 time
    -- corpus-wide; runs decompose via the pos - row_number gap trick
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), pos AS (
        SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+9], ' ') AS g
        FROM words,
             unnest(generate_series(1, greatest(len(t) - 9, 1))) AS u(i)
    ), occ AS (
        SELECT g, count(*) AS n FROM pos GROUP BY g
    ), marked AS (
        SELECT doc_id, pos, (n > 1) AS dup
        FROM pos JOIN occ USING (g)
    ), runs AS (
        SELECT doc_id, dup,
               pos - row_number() OVER (
                   PARTITION BY doc_id, dup ORDER BY pos) AS grp
        FROM marked
    ), per_run AS (
        SELECT doc_id, dup, grp, count(*) AS run_len
        FROM runs GROUP BY doc_id, dup, grp
    ), run_stats AS (
        SELECT doc_id,
               CAST(max(CASE WHEN dup THEN run_len ELSE 0 END) AS BIGINT)
                   AS max_dup_run
        FROM per_run GROUP BY doc_id
    ), doc_stats AS (
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_grams
        FROM marked GROUP BY doc_id
    )
    SELECT doc_id, n_grams, dup_grams,
           round(dup_grams / n_grams::DOUBLE, 6) AS dup_fraction,
           max_dup_run
    FROM doc_stats JOIN run_stats USING (doc_id)
"""

ORACLE_SQL["dedup_simhash"] = """
    -- full SimHash recomputation: md5-derived signed-64 token hashes,
    -- per-bit majority votes, packed signature, exact hamming pairs.
    -- (The engine's pigeonhole blocking is exact for hamming <= 3, so
    -- the all-pairs form here defines the same output set.)
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(
                   string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+'))) AS tok
        FROM documents
    ), h AS (
        SELECT doc_id,
               (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                 * 4294967296 + lo AS h
        FROM (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
                   CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS lo
            FROM toks)
    ), bits AS (
        SELECT doc_id, b,
               sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h CROSS JOIN range(0, 64) t(b)
        GROUP BY doc_id, b
    ), sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN
                   CASE WHEN b = 63 THEN -9223372036854775808
                        ELSE (1::BIGINT << b) END
                 ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""

ORACLE_SQL["embedding_knn_join"] = """
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 5
    ), scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(e.embedding::DOUBLE[], q.qv) AS num,
               sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(q.qv, q.qv)) AS den
        FROM embeddings e CROSS JOIN q
    ), ranked AS (
        SELECT query_id, neighbor_id,
               CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS c,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CASE WHEN den > 0 THEN num / den ELSE 0.0 END DESC,
                            neighbor_id
               ) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, round(c, 6) AS cos_sim, rnk
    FROM ranked WHERE rnk <= 10
"""

ORACLE_SQL["embedding_dedup_clusters_lsh"] = """
    -- the adaptive dispatch runs the exact blocked scan below its corpus
    -- crossover, so at test scales the output is the deterministic exact
    -- pair set at threshold 0.5 -> same closure oracle as
    -- embedding_dedup_clusters
    WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE c >= 0.5
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS vec_id,
           least(src, min(dst)) AS component,
           (src = least(src, min(dst))) AS keep
    FROM reach
    GROUP BY src
"""

ORACLE_SQL["events_interval_pairs"] = """
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b ON a.user_id = b.user_id
      AND epoch_us(b.ts) > epoch_us(a.ts)
      AND epoch_us(b.ts) - epoch_us(a.ts) <= 600 * 1000000
    GROUP BY a.user_id
"""

ORACLE_SQL["weighted_sample_docs"] = """
    SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
               -ln((CAST(concat('0x', substr(md5('wdocs' || ':' ||
                        CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                   / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS score
        FROM documents
        WHERE CAST(n_chars AS DOUBLE) > 0
        ORDER BY score ASC, doc_id
        LIMIT 50
    )
"""

ORACLE_SQL["sketch_order_stats"] = """
    -- exact twin of the group/count columns; the sketch columns are
    -- error-bound predicates the engine must satisfy (TRUE here), so the
    -- hash compare checks the sketch CONTRACT, not engine-internal values
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_buyers,
           TRUE AS hll_within_bound,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM orders
    GROUP BY o_orderstatus
"""

ORACLE_SQL["boilerplate_chunk_removal"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
        FROM words, UNNEST(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)
    ),
    hot AS (
        SELECT chunk FROM chunks GROUP BY chunk
        HAVING count(DISTINCT doc_id) > 2
    ),
    marked AS (
        SELECT c.doc_id, c.chunk_idx, c.chunk,
               (h.chunk IS NOT NULL) AS is_hot
        FROM chunks c LEFT JOIN hot h ON c.chunk = h.chunk
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN NOT is_hot THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_chunks,
           md5(COALESCE(string_agg(
               CASE WHEN NOT is_hot THEN chunk END, ' ' ORDER BY chunk_idx), ''))
               AS kept_text_md5
    FROM marked
    GROUP BY doc_id
"""

ORACLE_SQL["epoch_shuffle_docs"] = f"""
    SELECT doc_id,
           {smp.hash_hex_sql(['doc_id'], 'epoch-1')} AS sort_key
    FROM documents
    ORDER BY sort_key, doc_id
"""

ORACLE_SQL["bigram_logprob_score"] = """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS w
        FROM documents
    ),
    pairs AS (
        SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(w) - 1),
                       i -> {'w1': w[i], 'w2': w[i+1]})) AS b
            FROM t WHERE len(w) >= 2
        )
    ),
    bf AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY w1, w2),
    cf AS (SELECT w1, count(*) AS cc FROM pairs GROUP BY w1)
    SELECT p.doc_id, count(*) AS n_bigrams,
           round(avg(-ln(bf.cb * 1.0 / cf.cc)), 4) AS avg_neg_logprob
    FROM pairs p JOIN bf USING (w1, w2) JOIN cf USING (w1)
    GROUP BY p.doc_id
"""

ORACLE_SQL["dedup_minhash_lsh"] = """
    -- full MinHash/LSH recomputation with the engine-portable member
    -- family: md5(shingle) -> two 32-bit halves (h1, h2); member i =
    -- min((h1 + i*h2) mod (2^31 - 1)) (Kirsch-Mitzenmacher double
    -- hashing). A pair is a candidate iff SOME 4-member band agrees
    -- fully (the engine's band bucket-hash equality, exact up to a
    -- ~2^-64 xxhash64 bucket collision), and est_jaccard is the
    -- 64-member agreement fraction; the >= 0.5 filter is agree >= 32.
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hh AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM shx
    ), mem AS (
        SELECT doc_id, i, min((h1 + i * h2) % 2147483647) AS m
        FROM hh CROSS JOIN range(0, 64) t(i)
        GROUP BY doc_id, i
    ), sig AS (
        SELECT doc_id, list(m ORDER BY i) AS sg FROM mem GROUP BY doc_id
    ), scored AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_filter(range(1, 65), i -> a.sg[i] = b.sg[i])) AS agree,
               len(list_filter(range(0, 16), bb ->
                   a.sg[4*bb+1] = b.sg[4*bb+1] AND a.sg[4*bb+2] = b.sg[4*bb+2]
                   AND a.sg[4*bb+3] = b.sg[4*bb+3] AND a.sg[4*bb+4] = b.sg[4*bb+4]
               )) > 0 AS collide
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(agree / 64.0, 6) AS est_jaccard
    FROM scored
    WHERE collide AND agree >= 32
"""

ORACLE_SQL["embedding_semdedup"] = """
    -- the crossover's exact single-cell limit at test scale: exact
    -- cosine pairs >= 0.45 -> transitive closure -> min-id keeper,
    -- identical contract to the engine's cluster-and-keep output
    WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE c >= 0.45
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS vec_id,
           least(src, min(dst)) AS component,
           (src = least(src, min(dst))) AS keep
    FROM reach
    GROUP BY src
"""


def _lsh_topk_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_lsh_topk: the hyperplanes are a pure
    seeded function (make_planes' LCG), so they embed as DOUBLE[] literals
    and DuckDB replays the exact bucketing — sign of the same left-to-right
    dot product — the multiprobe hamming filter, and the pruned top-k.
    The plane width is read from the corpus (the literal planes must
    match the dim the engine derives at runtime)."""
    dim = len(_oracle_embeddings(sf_dir, limit=1)[0])
    planes = sim.make_planes(dim, 8)
    values = ",\n            ".join(
        f"({i}, {planes[i]!r}::DOUBLE[])" for i in range(len(planes))
    )
    return f"""
        WITH planes(pid, plane) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), b AS (
            SELECT e.vec_id,
                   CAST(sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
                                 THEN CAST(pow(2, p.pid) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS bucket
            FROM e CROSS JOIN planes p
            GROUP BY e.vec_id
        ), q AS (
            SELECT e.v AS qv, b.bucket AS qb
            FROM e JOIN b USING (vec_id) WHERE e.vec_id = 0
        )
        SELECT vec_id, round(cos_raw, 6) AS cos_sim
        FROM (
            SELECT c.vec_id,
                   CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS cos_raw
            FROM (
                SELECT e.vec_id,
                       list_dot_product(e.v, q.qv) AS num,
                       sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv)) AS den
                FROM e JOIN b USING (vec_id) CROSS JOIN q
                WHERE bit_count(xor(b.bucket, q.qb)) <= 1
            ) c
        )
        ORDER BY cos_raw DESC, vec_id
        LIMIT 20
    """


def _oracle_embeddings(sf_dir: str, where: str = "", limit: int | None = None):
    """Fetch ``sf_dir``'s embedding vectors OUTSIDE Spark in the exact
    order the Spark trainers sample them (ORDER BY vec_id), for oracle
    generation — the trained-artifact twins must replay training on the
    same corpus the oracle SQL will be executed against."""
    import duckdb

    con = duckdb.connect()
    sql = (
        "SELECT embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') "
        f"{where} ORDER BY vec_id"
    )
    if limit is not None:
        sql += f" LIMIT {limit}"
    rows = con.execute(sql).fetchall()
    con.close()
    return [[float(x) for x in r[0]] for r in rows]


def _ivf_topk_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_ivf_topk: the coarse quantizer is a
    deterministic function of the corpus sample (spherical_kmeans_core —
    the SAME numpy code path the Spark query trains with, so the centroid
    floats are bitwise identical) and embeds as DOUBLE[] literals; DuckDB
    then replays assignment (argmax dot, ties to the higher cid — the
    engine's array_max-over-structs rule), the nprobe=6 probe selection,
    and the pruned top-k."""
    cents = sim.spherical_kmeans_core(_oracle_embeddings(sf_dir, limit=2048), 16)
    values = ",\n            ".join(
        f"({i}, {cents[i]!r}::DOUBLE[])" for i in range(len(cents))
    )
    return f"""
        WITH cents(cid, c) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), q AS (
            SELECT v AS qv FROM e WHERE vec_id = 0
        ), probe AS (
            SELECT cid FROM cents CROSS JOIN q
            ORDER BY list_dot_product(c, q.qv) DESC, cid DESC LIMIT 6
        ), assigned AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, cents.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_dot_product(e.v, cents.c) DESC,
                                    cents.cid DESC) AS rn
                FROM e CROSS JOIN cents
            ) WHERE rn = 1
        )
        SELECT vec_id, round(cos_raw, 6) AS cos_sim
        FROM (
            SELECT s.vec_id,
                   CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS cos_raw
            FROM (
                SELECT e.vec_id,
                       list_dot_product(e.v, q.qv) AS num,
                       sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv)) AS den
                FROM e
                JOIN assigned USING (vec_id)
                CROSS JOIN q
                WHERE assigned.cid IN (SELECT cid FROM probe)
            ) s
        )
        ORDER BY cos_raw DESC, vec_id
        LIMIT 20
    """


def _pq_topk_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_pq_topk: codebooks replay through
    pq_codebooks_core (bitwise-identical floats), the query's ADC
    distance TABLE is computed with the same Python arithmetic pq_topk
    uses and embedded as literals, per-row codes are recomputed in SQL
    (normalized subvector, L2-argmin with numpy's first-index tie rule
    -> ORDER BY dist, cid), and the row distance is the same left-
    associated chain of 8 table lookups."""
    books = sim.pq_codebooks_core(_oracle_embeddings(sf_dir, limit=2048), 8, 16)
    qvec = _oracle_embeddings(sf_dir, where="WHERE vec_id = 0")[0]
    n_sub, sub = len(books), len(books[0][0])
    # ONE shared arithmetic path with pq_topk: the embedded table floats
    # are the engine's exact values by construction
    dtable = sim.pq_adc_table(qvec, books)
    book_vals = ",\n            ".join(
        f"({s}, {c}, {books[s][c]!r}::DOUBLE[])"
        for s in range(n_sub)
        for c in range(len(books[s]))
    )
    dt_vals = ",\n            ".join(
        # ::DOUBLE so the 8-lookup addition chain is double-stepped like
        # the engine's (a bare literal types DECIMAL, whose sum is exact
        # decimal — not "the same left-associated chain" at all)
        f"({s}, {c}, {dtable[s][c]!r}::DOUBLE)"
        for s in range(n_sub)
        for c in range(len(dtable[s]))
    )
    dist_expr = " + ".join(
        f"(SELECT d FROM dt WHERE dt.s = {s} AND dt.cid = codes.c{s})"
        for s in range(n_sub)
    )
    code_cols = ",\n                   ".join(
        f"max(CASE WHEN s = {s} THEN cid END) AS c{s}" for s in range(n_sub)
    )
    return f"""
        WITH books(s, cid, c) AS (VALUES
            {book_vals}
        ), dt(s, cid, d) AS (VALUES
            {dt_vals}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), n AS (
            SELECT vec_id,
                   CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
                        ELSE v END AS u
            FROM (SELECT vec_id, v,
                         sqrt(list_dot_product(v, v)) AS nrm FROM e)
        ), assigned AS (
            SELECT vec_id, s, cid FROM (
                SELECT n.vec_id, b.s, b.cid,
                       row_number() OVER (
                           PARTITION BY n.vec_id, b.s
                           ORDER BY list_distance(
                               list_slice(n.u, b.s * {sub} + 1,
                                          b.s * {sub} + {sub}), b.c),
                                    b.cid) AS rn
                FROM n CROSS JOIN books b
            ) WHERE rn = 1
        ), codes AS (
            SELECT vec_id,
                   {code_cols}
            FROM assigned GROUP BY vec_id
        )
        SELECT vec_id, round(1.0 - ({dist_expr}) / 2.0, 6) AS approx_cos
        FROM codes
        ORDER BY approx_cos DESC, vec_id
        LIMIT 20
    """


def _lsh_pairs_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_near_dup_lsh — the last formerly
    rows-only probe: every ingredient of the multi-table hyperplane LSH
    pipeline is a deterministic seeded function, so DuckDB replays it
    whole. Plane matrices (make_planes LCG, per-table seeds) embed as
    literals; a pair is a candidate iff SOME table puts the two bucket
    codes within the multiprobe hamming radius (the engine's left-XOR
    expansion is exactly that predicate); candidates rerank by exact
    cosine >= threshold after the same round-to-4. The auto plane/table
    rules are replayed from the corpus row count."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    # the SAME auto rules the engine applies (shared helpers — no drift)
    n_planes = sim.planes_for_corpus(n)
    n_tables = sim._tables_for_recall(n_planes, 1)
    dim = len(_oracle_embeddings(sf_dir, limit=1)[0])
    tables = [
        sim.make_planes(dim, n_planes, seed=1009 + 7919 * t)
        for t in range(n_tables)
    ]
    plane_vals = ",\n            ".join(
        f"({t}, {i}, {tables[t][i]!r}::DOUBLE[])"
        for t in range(n_tables)
        for i in range(n_planes)
    )
    return f"""
        WITH planes(t, pid, plane) AS (VALUES
            {plane_vals}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), b AS (
            SELECT e.vec_id, p.t,
                   CAST(sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
                                 THEN CAST(pow(2, p.pid) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS bucket
            FROM e CROSS JOIN planes p
            GROUP BY e.vec_id, p.t
        ), cand AS (
            SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
            FROM b a JOIN b c
              ON a.t = c.t AND a.vec_id < c.vec_id
            WHERE bit_count(xor(a.bucket, c.bucket)) <= 1
        )
        SELECT id_a, id_b, cos_sim FROM (
            SELECT s.id_a, s.id_b,
                   round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END,
                         4) AS cos_sim
            FROM (
                SELECT cand.id_a, cand.id_b,
                       list_dot_product(ea.v, eb.v) AS num,
                       sqrt(list_dot_product(ea.v, ea.v))
                         * sqrt(list_dot_product(eb.v, eb.v)) AS den
                FROM cand
                JOIN e ea ON ea.vec_id = cand.id_a
                JOIN e eb ON eb.vec_id = cand.id_b
            ) s
        )
        WHERE cos_sim >= 0.5
    """


# Bloom family: DuckDB replays the identical md5 -> (h1, h2) ->
# Kirsch-Mitzenmacher position -> 32-bit-word bit_or arithmetic; every
# value stays positive and < 2^36, overflow-free on both engines.
# Count-min sketch: exact int64 counters over md5/KM probe cells; the
# whole build/probe/min chain replays in SQL with no tolerance.
ORACLE_SQL["heavy_hitters_cms"] = """
    WITH hh AS (
        SELECT user_id,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                 AS h1,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8) AS BIGINT)
                 AS h2
        FROM events
    ),
    cells AS (SELECT i AS r, ((h1 + i*h2) % 256) AS c
              FROM hh, unnest(range(0,4)) u(i)),
    sk AS (SELECT r, c, count(*)::BIGINT AS cnt FROM cells GROUP BY r, c),
    truth AS (SELECT user_id, count(*)::BIGINT AS true_count
              FROM events GROUP BY user_id),
    keys AS (
        SELECT user_id,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                 AS h1,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8) AS BIGINT)
                 AS h2
        FROM truth
    ),
    probes AS (SELECT user_id, i AS r, ((h1 + i*h2) % 256) AS c
               FROM keys, unnest(range(0,4)) u(i)),
    est AS (SELECT p.user_id, min(coalesce(s.cnt, 0)) AS est_count
            FROM probes p LEFT JOIN sk s ON s.r = p.r AND s.c = p.c
            GROUP BY p.user_id)
    SELECT t.user_id, t.true_count, e.est_count
    FROM truth t JOIN est e USING (user_id)
    WHERE e.est_count >= 60
"""

# Hashed linear classifier: integer milli-weights make the per-doc sum
# exact int64 on both engines; the logit is one double division.
ORACLE_SQL["quality_classifier_scores"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents
    ),
    tb AS (SELECT doc_id,
                  (CAST('0x'||substr(md5(tok),1,8) AS BIGINT) % 4096) AS bucket
           FROM tok WHERE tok <> ''),
    w AS (SELECT i AS bucket,
                 (CAST('0x'||substr(md5(CAST(i AS VARCHAR)),9,8) AS BIGINT)
                    % 2001 - 1000) AS w_milli
          FROM unnest(range(0, 4096)) u(i)),
    j AS (SELECT tb.doc_id, coalesce(w.w_milli, 0) AS wm
          FROM tb LEFT JOIN w USING (bucket))
    SELECT doc_id,
           count(*) AS n_terms,
           sum(wm)::BIGINT AS w_milli_sum,
           (sum(wm)::BIGINT / (1000.0 * count(*))) > 0 AS keep
    FROM j GROUP BY doc_id
"""

# SQ8: the one index family whose full pipeline (train = per-dim min/max
# aggregates, compress, score, rerank) is static SQL — every step is
# IEEE-double sub/div/floor, bit-identical across engines.
ORACLE_SQL["embedding_sq8_topk"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    pm AS (SELECT d, min(v[d]) AS mn, max(v[d]) AS mx
           FROM e, unnest(range(1, len(v)+1)) u(d) GROUP BY d),
    pma AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
            FROM pm),
    deq AS (
        SELECT e.vec_id,
               list_transform(range(1, len(e.v)+1), i ->
                   CASE WHEN pma.mxs[i] > pma.mns[i]
                        THEN pma.mns[i]
                             + GREATEST(0.0, LEAST(255.0,
                                 floor((e.v[i] - pma.mns[i])
                                       / ((pma.mxs[i] - pma.mns[i]) / 255.0))))
                               * ((pma.mxs[i] - pma.mns[i]) / 255.0)
                        ELSE pma.mns[i] END) AS dq
        FROM e CROSS JOIN pma),
    scored AS (
        SELECT d.vec_id,
               CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS sq_cos_raw
        FROM (
            SELECT d.vec_id,
                   list_dot_product(d.dq, q.q) AS num,
                   sqrt(list_dot_product(d.dq, d.dq))
                     * sqrt(list_dot_product(q.q, q.q)) AS den
            FROM deq d CROSS JOIN q
        ) d),
    top AS (SELECT vec_id, sq_cos_raw FROM scored
            ORDER BY sq_cos_raw DESC, vec_id LIMIT 20)
    SELECT t.vec_id,
           round(t.sq_cos_raw, 6) AS sq_cos,
           round(CASE WHEN eden > 0 THEN enum / eden ELSE 0.0 END, 6)
             AS exact_cos
    FROM (
        SELECT t.vec_id, t.sq_cos_raw,
               list_dot_product(e.v, q.q) AS enum,
               sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.q, q.q)) AS eden
        FROM top t JOIN e ON e.vec_id = t.vec_id CROSS JOIN q
    ) t
"""

ORACLE_SQL["bloom_incremental_dedup"] = """
    WITH hist AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
    inc AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 2 = 1),
    hh AS (SELECT CAST('0x'||substr(md5(text),1,8) AS BIGINT) AS h1,
                  CAST('0x'||substr(md5(text),9,8) AS BIGINT) AS h2
           FROM hist),
    hpos AS (SELECT ((h1 + i*h2) % 1024) AS pos
             FROM hh, unnest(range(0,4)) u(i)),
    words AS (SELECT pos // 32 AS word_idx,
                     bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
              FROM hpos GROUP BY 1),
    ih AS (SELECT doc_id, source, text,
                  CAST('0x'||substr(md5(text),1,8) AS BIGINT) AS h1,
                  CAST('0x'||substr(md5(text),9,8) AS BIGINT) AS h2
           FROM inc),
    probes AS (SELECT doc_id, ((h1 + i*h2) % 1024) AS pos
               FROM ih, unnest(range(0,4)) u(i)),
    hit AS (SELECT p.doc_id,
                   bool_and(w.word IS NOT NULL
                            AND ((w.word >> CAST(p.pos % 32 AS INT)) & 1) = 1)
                     AS maybe
            FROM probes p LEFT JOIN words w ON w.word_idx = p.pos // 32
            GROUP BY p.doc_id),
    labeled AS (
        SELECT i.source, h.maybe,
               (h.maybe AND EXISTS (SELECT 1 FROM hist x WHERE x.text = i.text))
                 AS is_dup
        FROM ih i JOIN hit h ON h.doc_id = i.doc_id)
    SELECT source,
           count(*) AS n_incoming,
           sum(CASE WHEN NOT maybe THEN 1 ELSE 0 END)::BIGINT AS n_definite_new,
           sum(CASE WHEN maybe THEN 1 ELSE 0 END)::BIGINT AS n_candidate_dup,
           sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_true_dup,
           sum(CASE WHEN maybe AND NOT is_dup THEN 1 ELSE 0 END)::BIGINT
             AS n_false_pos
    FROM labeled GROUP BY source
"""

_WINNOW_FPS_CTE = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, u.i - 1 AS pos,
               array_to_string(t[u.i : u.i + 4], ' ') AS shingle
        FROM toks, unnest(generate_series(1, len(t) - 4)) u(i)
        WHERE len(t) >= 5
        UNION ALL
        SELECT doc_id, 0 AS pos, array_to_string(t, ' ') AS shingle
        FROM toks WHERE len(t) < 5
    ), hx AS (
        SELECT doc_id, pos,
               CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS hi,
               CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS lo
        FROM grams
    ), hv AS (
        -- the engine's shiftleft(hi,32)|lo wraps into the sign bit; the
        -- same two's-complement value via signed arithmetic
        SELECT doc_id, pos,
               (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                 * 4294967296 + lo AS hv
        FROM hx
    ), wmin AS (
        SELECT doc_id,
               min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
        FROM hv
    ), fps AS (
        SELECT DISTINCT doc_id, fp FROM wmin
    )
"""

ORACLE_SQL["winnow_plagiarism_pairs"] = _WINNOW_FPS_CTE + """
    , dfc AS (
        SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 50
    ), sel AS (
        SELECT f.doc_id, f.fp FROM fps f JOIN dfc USING (fp)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared
    FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""

ORACLE_SQL["winnow_fingerprint_stats"] = _WINNOW_FPS_CTE + """
    , ng AS (
        SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
    ), nf AS (
        SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id
    )
    SELECT ng.doc_id AS doc_id, n_grams, n_fp,
           n_fp / n_grams::DOUBLE AS fp_frac
    FROM ng JOIN nf USING (doc_id)
"""

ORACLE_SQL["bloom_words_profile"] = """
    WITH hh AS (SELECT CAST('0x'||substr(md5(text),1,8) AS BIGINT) AS h1,
                       CAST('0x'||substr(md5(text),9,8) AS BIGINT) AS h2
                FROM documents),
    pos AS (SELECT ((h1 + i*h2) % 32768) AS pos
            FROM hh, unnest(range(0,4)) u(i)),
    words AS (SELECT pos // 32 AS word_idx,
                     bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
              FROM pos GROUP BY 1)
    SELECT count(*) AS n_words,
           sum(bit_count(word))::BIGINT AS n_set_bits,
           sum(word_idx * word)::BIGINT AS words_checksum,
           min(word_idx) AS min_word_idx,
           max(word_idx) AS max_word_idx
    FROM words
"""

ORACLE_SQL["hll_distinct_users"] = f"""
    WITH est AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)",
                                    ["event_type"], p=10)}),
    exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
              FROM events GROUP BY 1)
    SELECT est.event_type, est.estimate, exact.exact_distinct,
           round(abs(est.estimate - exact.exact_distinct)
                 / exact.exact_distinct, 4) AS rel_err
    FROM est JOIN exact ON est.event_type = exact.event_type
    ORDER BY est.event_type
"""

# the union-by-max of per-type registers collapses to the same GROUP BY
# as a direct build (max of maxes), so the oracle replays both sides
# from one register CTE and the equality check is exact by construction
# on the DuckDB side too — what's being checked cross-engine is that the
# DISTRIBUTED merge produced the identical registers/estimate
ORACLE_SQL["hll_register_union"] = f"""
    WITH u_est AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)",
                                      [], p=10)}),
    regs AS (
        SELECT CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                 % 1024 AS bucket,
               max(CASE WHEN CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8)
                                  AS BIGINT) = 0 THEN 33
                        ELSE 33 - length(bin(
                            CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8)
                                 AS BIGINT))) END) AS register
        FROM events WHERE user_id IS NOT NULL GROUP BY 1)
    SELECT u.estimate AS union_estimate,
           u.estimate AS direct_estimate,
           TRUE AS union_equals_direct,
           (SELECT sum(bucket * register)::BIGINT FROM regs) AS register_checksum,
           (SELECT count(*) FROM regs) AS n_registers
    FROM u_est u
"""

ORACLE_SQL["hll_intersection_users"] = f"""
    WITH ea AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)", [],
                                   p=10, where="WHERE event_type = 'view'")}),
    eb AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)", [],
                              p=10,
                              where="WHERE event_type = 'purchase'")}),
    eu AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)", [],
                              p=10,
                              where="WHERE event_type IN ('view', 'purchase')")}),
    exact AS (
        SELECT count(*) AS exact_both FROM (
            SELECT user_id FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase')
    )
    SELECT ea.estimate AS est_viewers, eb.estimate AS est_buyers,
           eu.estimate AS est_union,
           round(ea.estimate + eb.estimate - eu.estimate, 4) AS est_both,
           exact_both
    FROM ea, eb, eu, exact
"""

ORACLE_SQL["bm25_topk_docs"] = rtr.bm25_oracle_sql(_BM25_QUERIES, k=5)

# shared replay of the degree-oriented triangle pipeline (canonical
# edges -> degrees -> (deg, id) orientation -> wedge join -> canonical
# closure) for both cosupplier_* oracles
_TRIANGLE_CTE = """
    WITH li AS (
        SELECT l_orderkey, l_suppkey FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00')
    ), edges AS (
        SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a,
                        greatest(x.l_suppkey, y.l_suppkey) AS b
        FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                           AND x.l_suppkey <> y.l_suppkey
    ), deg AS (
        SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM edges
            UNION ALL SELECT b AS node FROM edges) t
        GROUP BY 1
    ), oriented AS (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                    THEN a ELSE b END AS u,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                    THEN b ELSE a END AS v
        FROM edges
        JOIN deg da ON da.node = a
        JOIN deg db ON db.node = b
    ), wedges AS (
        SELECT w1.u, w1.v AS v1, w2.v AS v2
        FROM oriented w1 JOIN oriented w2
          ON w1.u = w2.u AND w1.v < w2.v
    ), tri AS (
        SELECT u, v1, v2 FROM wedges
        WHERE EXISTS (SELECT 1 FROM edges e WHERE e.a = v1 AND e.b = v2)
    )
"""

ORACLE_SQL["cosupplier_triangle_stats"] = _TRIANGLE_CTE + """
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
           (SELECT count(*) FROM tri) AS n_triangles,
           round(3.0 * (SELECT count(*) FROM tri)
                 / (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) FROM deg),
                 6) AS clustering_coeff
"""

ORACLE_SQL["zorder_events_profile"] = f"""
    WITH base AS (
        SELECT user_id AS uid,
               CAST(floor(epoch(ts)) AS BIGINT) AS secs
        FROM events
    ), rng AS (
        SELECT min(uid) AS umin, max(uid) AS umax,
               min(secs) AS smin, max(secs) AS smax
        FROM base
    ), q AS (
        SELECT ((uid - umin) * 65535) // greatest(umax - umin, 1) AS qx,
               ((secs - smin) * 65535) // greatest(smax - smin, 1) AS qy
        FROM base, rng
    ), zb AS (
        SELECT ({lay.morton_z_sql("qx", "qy", 16)}) >> 26 AS bucket,
               qx AS x, qy AS y
        FROM q
    )
    SELECT bucket, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max,
           max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
    FROM zb GROUP BY bucket ORDER BY bucket
"""

ORACLE_SQL["zorder_write_audit"] = f"""
    WITH base AS (
        SELECT CAST(event_id AS BIGINT) AS eid,
               CAST(user_id AS BIGINT) AS uid,
               CAST(floor(epoch(ts)) AS BIGINT) AS secs
        FROM events
    ), rng AS (
        SELECT min(uid) AS umin, max(uid) AS umax,
               min(secs) AS smin, max(secs) AS smax
        FROM base
    ), q AS (
        SELECT eid, uid, secs,
               ((uid - umin) * 65535) // greatest(umax - umin, 1) AS qx,
               ((secs - smin) * 65535) // greatest(smax - smin, 1) AS qy
        FROM base, rng
    ), zb AS (
        SELECT ({lay.morton_z_sql("qx", "qy", 16)}) >> 26 AS zbucket,
               eid, uid, secs
        FROM q
    )
    SELECT zbucket, count(*) AS n_rows,
           min(uid) AS u_min, max(uid) AS u_max,
           min(secs) AS s_min, max(secs) AS s_max,
           sum(eid)::BIGINT AS id_checksum
    FROM zb GROUP BY zbucket ORDER BY zbucket
"""

ORACLE_SQL["snapshot_diff_orders"] = """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 6
    ), new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.5
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 4
    ), diff AS (
        SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                     AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT status, count(*) AS n_rows, sum(o_orderkey)::BIGINT AS key_checksum
    FROM diff GROUP BY status ORDER BY status
"""

ORACLE_SQL["cosupplier_triangle_nodes"] = _TRIANGLE_CTE + """
    SELECT node, count(*) AS n_triangles
    FROM (SELECT unnest([u, v1, v2]) AS node FROM tri) corners
    GROUP BY 1
    ORDER BY n_triangles DESC, node
    LIMIT 25
"""

ORACLE_SQL["bm25_term_stats"] = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS term
        FROM documents
    ), postings AS (
        SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
        GROUP BY 1, 2
    ), dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, round(avg(dl), 4) AS avgdl FROM dl),
    dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df
        FROM postings
        WHERE term IN ({", ".join(sorted({f"'{t}'" for ts in _BM25_QUERIES.values() for t in ts}))})
        GROUP BY 1)
    SELECT term, df,
           round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf,
           n_docs, avgdl
    FROM dfreq, stats
    ORDER BY term
"""

ORACLE_SQL["events_daily_resampled"] = """
    WITH obs AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_start,
               count(*) AS n_events,
               sum(CAST(floor(value * 1000000) AS BIGINT))
                   / (count(value) * 1000000.0) AS day_avg
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT user_id, min(day_start) AS b0, max(day_start) AS b1
        FROM obs GROUP BY 1
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(b0, b1, 86400)) AS day_start
        FROM spans
    )
    SELECT g.user_id, g.day_start,
           CAST(coalesce(o.n_events, 0) AS BIGINT) AS n_events,
           last_value(o.day_avg IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.day_start)
               AS filled_avg_value
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.day_start = g.day_start
"""

ORACLE_SQL["user_scd2_type_history"] = """
    WITH ordered AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS es,
               row_number() OVER w AS rn,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    ), changes AS (
        SELECT user_id, event_type, es, event_id FROM ordered
        WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           es AS valid_from,
           lead(es) OVER w AS valid_to,
           CAST(row_number() OVER w AS INTEGER) AS version_n,
           lead(es) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
"""

ORACLE_SQL["orders_quality_audit"] = """
    WITH base AS (
        SELECT 'orders.o_custkey.complete' AS "constraint",
               round(CAST(count(o_custkey) AS DOUBLE) / count(*), 6) AS metric
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderkey.unique',
               round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey.unique_probe',
               round(CAST(count(DISTINCT o_custkey) AS DOUBLE) / count(*), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_totalprice.positive',
               round(avg(CASE WHEN o_totalprice > 0 THEN 1.0 ELSE 0.0 END), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderstatus.domain',
               round(avg(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                              THEN 1.0 ELSE 0.0 END), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey.ref_customer',
               round(avg(CASE WHEN c._pk IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
        FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey AS _pk
                                 FROM customer) c
          ON o.o_custkey = c._pk
    )
    SELECT "constraint", metric, metric >= 1.0 AS passed
    FROM base ORDER BY "constraint"
"""

# shared dirty-customer + blocked-pair replay for both linkage oracles:
# the same per-key perturbation arithmetic as _DIRTY_NAME_EXPR, verbatim
_LINKAGE_CTE = f"""
    WITH dirty AS (
        SELECT c_custkey AS d_key, c_nationkey,
               {_DIRTY_NAME_EXPR} AS d_name
        FROM customer
    ), pairs AS (
        SELECT d.d_key, c.c_custkey,
               levenshtein(substr(d.d_name, 10), substr(c.c_name, 10))
                   AS distance
        FROM dirty d JOIN customer c ON d.c_nationkey = c.c_nationkey
        WHERE abs(length(d.d_name) - length(c.c_name)) <= 2
          AND levenshtein(substr(d.d_name, 10), substr(c.c_name, 10)) <= 2
    )
"""

ORACLE_SQL["fuzzy_customer_linkage"] = _LINKAGE_CTE + """
    SELECT CAST(distance AS INTEGER) AS distance,
           count(*) AS n_pairs,
           sum(d_key) AS dirty_checksum,
           sum(c_custkey) AS clean_checksum
    FROM pairs GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["fuzzy_linkage_auto_dispatch"] = ORACLE_SQL["fuzzy_customer_linkage"]

# two-pass fine blocking replayed verbatim: same keys, UNION dedup,
# same length prefilter + banded-metric acceptance as blocked_pairs
ORACLE_SQL["fuzzy_customer_linkage_fine_block"] = f"""
    WITH dirty AS (
        SELECT c_custkey AS d_key, c_nationkey,
               {_DIRTY_NAME_EXPR} AS d_name
        FROM customer
    ), d2 AS (
        SELECT d_key, c_nationkey, substr(d_name, 10) AS d_suffix
        FROM dirty
    ), c2 AS (
        SELECT c_custkey, c_nationkey, substr(c_name, 10) AS c_suffix
        FROM customer
    ), cand AS (
        SELECT d.d_key, d.d_suffix, c.c_custkey, c.c_suffix
        FROM d2 d JOIN c2 c
          ON d.c_nationkey = c.c_nationkey
         AND substr(d.d_suffix, 1, 5) = substr(c.c_suffix, 1, 5)
        UNION
        SELECT d.d_key, d.d_suffix, c.c_custkey, c.c_suffix
        FROM d2 d JOIN c2 c
          ON d.c_nationkey = c.c_nationkey
         AND substr(d.d_suffix, length(d.d_suffix) - 3, 4)
             = substr(c.c_suffix, length(c.c_suffix) - 3, 4)
    ), pairs AS (
        SELECT d_key, c_custkey,
               levenshtein(d_suffix, c_suffix) AS distance
        FROM cand
        WHERE abs(length(d_suffix) - length(c_suffix)) <= 2
          AND levenshtein(d_suffix, c_suffix) <= 2
    )
    SELECT CAST(distance AS INTEGER) AS distance,
           count(*) AS n_pairs,
           sum(d_key) AS dirty_checksum,
           sum(c_custkey) AS clean_checksum,
           sum(CASE WHEN d_key = c_custkey THEN 1 ELSE 0 END)::BIGINT
               AS n_true
    FROM pairs GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["linkage_self_match_rate"] = _LINKAGE_CTE + """
    , best AS (
        SELECT d_key, c_custkey,
               row_number() OVER (PARTITION BY d_key
                                  ORDER BY distance, c_custkey) AS rn
        FROM pairs
    )
    SELECT count(*) AS n_matched,
           sum(CASE WHEN d_key = c_custkey THEN 1 ELSE 0 END)::BIGINT
               AS n_self,
           round(avg(CASE WHEN d_key = c_custkey THEN 1.0 ELSE 0.0 END), 6)
               AS self_match_rate
    FROM best WHERE rn = 1
"""

ORACLE_SQL["event_value_quantile_hist"] = """
    WITH hist AS (
        -- 8e0-style literals: a bare 8.0 is DECIMAL in DuckDB and
        -- would silently retype the arithmetic away from Spark's
        SELECT event_type,
               CAST(least(greatest(floor((value - 0e0) / 8e0), 0), 63)
                    AS INTEGER) AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bin,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n_total
        FROM hist
    ), probs AS (
        SELECT CAST(0.5 AS DOUBLE) AS p
        UNION ALL SELECT CAST(0.9 AS DOUBLE)
        UNION ALL SELECT CAST(0.99 AS DOUBLE)
    ), hit AS (
        SELECT c.event_type, pr.p, c.n_total, min(c.bin) AS bin
        FROM cum c CROSS JOIN probs pr
        WHERE c.cum >= ceil(pr.p * c.n_total)
        GROUP BY 1, 2, 3
    )
    SELECT event_type, p,
           CAST(ceil(p * n_total) AS BIGINT) AS rank,
           n_total, bin,
           0e0 + (bin + 1) * 8e0 AS q_upper
    FROM hit
"""

# recursive min-dist reachability over the SAME canonical co-supplier
# edges the triangle CTE defines (RECURSIVE applies to the whole WITH
# clause; the unused deg/oriented/wedges/tri CTEs bind lazily)
ORACLE_SQL["khop_supplier_reach"] = _TRIANGLE_CTE.replace(
    "WITH li AS (", "WITH RECURSIVE li AS (", 1
) + """
    , und AS (
        SELECT a AS src, b AS dst FROM edges
        UNION ALL
        SELECT b AS src, a AS dst FROM edges
    ), seeds AS (
        SELECT node AS root FROM (
            SELECT a AS node FROM edges
            UNION
            SELECT b AS node FROM edges
        ) ORDER BY node LIMIT 3
    ), reach(root, node, dist) AS (
        SELECT root, root, 0 FROM seeds
        UNION
        SELECT r.root, u.dst, r.dist + 1
        FROM reach r JOIN und u ON u.src = r.node
        WHERE r.dist < 3
    ), mind AS (
        SELECT root, node, min(dist) AS dist FROM reach GROUP BY 1, 2
    )
    SELECT root, CAST(dist AS INTEGER) AS dist,
           count(*) AS n_nodes, sum(node) AS node_checksum
    FROM mind GROUP BY 1, 2 ORDER BY 1, 2
"""


def _pagerank_oracle_sql(sf_dir: str) -> str:
    """Independent single-process replay of the distributed PageRank:
    fetch the SAME distinct customer-supplier edge set outside Spark,
    run the identical integer recursion (graph.pagerank.pagerank_replay
    — python ints, no floats anywhere), and embed the resulting top-20
    supplier masses as a VALUES literal. Nothing is shared with the
    Spark path but the formulas; a wrong distributed join/aggregation
    shows up as a mass mismatch."""
    import duckdb
    import numpy as np

    from ..graph.pagerank import pagerank_replay_np

    con = duckdb.connect()
    pairs = con.execute(
        "SELECT DISTINCT o.o_custkey * 2 AS s, l.l_suppkey * 2 + 1 AS d "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') l "
        f"JOIN read_parquet('{sf_dir}/orders.parquet') o "
        "ON l.l_orderkey = o.o_orderkey"
    ).fetchnumpy()
    con.close()
    # the vectorized replay is bit-equal to graph.pagerank.pagerank_replay
    # (tests/test_pagerank.py) and makes the sf1 oracle build seconds
    # instead of tens of minutes (round-7 verdict #2)
    s = np.asarray(pairs["s"], dtype=np.int64)
    d = np.asarray(pairs["d"], dtype=np.int64)
    mass = pagerank_replay_np(
        np.concatenate([s, d]), np.concatenate([d, s]), n_iter=5
    )
    supp = [((node - 1) // 2, m) for node, m in mass.items() if node % 2 == 1]
    top = sorted(supp, key=lambda t: (-t[1], t[0]))[:20]
    values = ",\n            ".join(f"({k}, {m})" for k, m in top)
    return f"""
        SELECT suppkey, mass FROM (VALUES
            {values}
        ) AS t(suppkey, mass)
    """


def _lpa_oracle_sql(sf_dir: str) -> str:
    """Independent single-process replay of the distributed label
    propagation: fetch the SAME canonical co-supplier edge set outside
    Spark (1997 Q1 window, matching _cosupplier_edges), run the
    identical synchronous integer recursion (graph.lpa.lpa_replay), and
    embed the community sizes as a VALUES literal. Only the rules are
    shared with the Spark path — a wrong distributed join/aggregate
    shows up as a size mismatch."""
    import duckdb
    import numpy as np

    from ..graph.lpa import lpa_replay_np

    con = duckdb.connect()
    pairs = con.execute(
        "SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a, "
        "       greatest(x.l_suppkey, y.l_suppkey) AS b "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') x "
        f"JOIN read_parquet('{sf_dir}/lineitem.parquet') y "
        "  ON x.l_orderkey = y.l_orderkey AND x.l_suppkey <> y.l_suppkey "
        "WHERE x.l_orderkey IN ("
        f"  SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet')"
        "   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"
        "     AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00')"
    ).fetchnumpy()
    con.close()
    # vectorized replay, bit-equal to graph.lpa.lpa_replay
    # (tests/test_lpa.py) — sf1 oracle-build speed (round-7 verdict #2)
    a = np.asarray(pairs["a"], dtype=np.int64)
    b = np.asarray(pairs["b"], dtype=np.int64)
    labels = lpa_replay_np(
        np.concatenate([a, b]), np.concatenate([b, a]), n_iter=4
    )
    from collections import Counter

    sizes = Counter(labels.values())
    rows = sorted(sizes.items(), key=lambda t: (-t[1], t[0]))
    values = ",\n            ".join(f"({c}, {n})" for c, n in rows)
    return f"""
        SELECT community, n_members FROM (VALUES
            {values}
        ) AS t(community, n_members)
    """


def _kcore_oracle_sql(sf_dir: str) -> str:
    """Independent single-process replay of the distributed k-core peel
    (graph.kcore.kcore_replay) over the SAME co-supplier edge set,
    embedded as a 1-row VALUES literal. The fixpoint is unique, so any
    correct peel must land on these exact counts/checksum."""
    import duckdb
    import numpy as np

    from ..graph.kcore import kcore_replay_np

    con = duckdb.connect()
    pairs = con.execute(
        "SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a, "
        "       greatest(x.l_suppkey, y.l_suppkey) AS b "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') x "
        f"JOIN read_parquet('{sf_dir}/lineitem.parquet') y "
        "  ON x.l_orderkey = y.l_orderkey AND x.l_suppkey <> y.l_suppkey "
        "WHERE x.l_orderkey IN ("
        f"  SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet')"
        "   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"
        "     AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00')"
    ).fetchnumpy()
    con.close()
    # vectorized peel, bit-equal to graph.kcore.kcore_replay
    # (tests/test_kcore.py) — sf1 oracle-build speed (round-7 verdict #2)
    a = np.asarray(pairs["a"], dtype=np.int64)
    b = np.asarray(pairs["b"], dtype=np.int64)
    n_edges = int(len(a))
    n_nodes = int(len(np.unique(np.concatenate([a, b]))))
    # the SAME relative-k rule as kcore_supplier_stats: 70% of average
    # degree in exact integer arithmetic
    k = max(1, (14 * n_edges) // (10 * max(n_nodes, 1)))
    core = kcore_replay_np(a, b, k=k)
    nodes = {v for e in core for v in e}
    return f"""
        SELECT k, n_core_nodes, n_core_edges, node_checksum FROM (VALUES
            ({k}, {len(nodes)}, {len(core)}, {sum(nodes)})
        ) AS t(k, n_core_nodes, n_core_edges, node_checksum)
    """


def _kmeans_replay_centroids(sf_dir: str, k: int = 8, n_iter: int = 4):
    """INDEPENDENT single-process replay of the distributed k-means
    training (queries must pass k/n_iter matching _kmeans_cents): fetch
    the full gate corpus outside Spark, quantize with the same
    floor(x*2^20), seed from the same md5-of-id order, and iterate the
    same shared arithmetic (clu.assign_rows + clu.centroids_from_sums).
    Fixed-point sums are exact integers on both paths, so the returned
    centroids are bitwise-equal to Spark's IFF the distributed
    aggregation is correct — this is the check."""
    import hashlib

    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [int(r[0]) for r in rows]
    x = np.array([[float(v) for v in r[1]] for r in rows], dtype=np.float64)
    q = np.floor(x * float(clu.QUANT_SCALE)).astype(np.int64)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    cents = [
        [float(v) / clu.QUANT_SCALE for v in q[i]] for i in order[:k]
    ]
    for _ in range(n_iter):
        a, _ = clu.assign_rows(q, cents)
        stats = {}
        for cid in range(len(cents)):
            m = a == cid
            n = int(m.sum())
            if n:
                stats[cid] = (n, [int(s) for s in q[m].sum(axis=0)])
        cents = clu.centroids_from_sums(cents, stats)
    return cents, q.shape[1]


def _kmeans_cents_values_sql(sf_dir: str) -> tuple[str, int]:
    cents, dim = _kmeans_replay_centroids(sf_dir)
    values = ",\n            ".join(
        f"({i}, {cents[i]!r}::DOUBLE[])" for i in range(len(cents))
    )
    return values, dim


def _kmeans_assign_ctes(sf_dir: str) -> str:
    """Shared CTE chain: quantize -> dequantize -> distance to every
    centroid literal -> first-index argmin (ORDER BY d2, cid = numpy
    argmin tie rule). Float-parity scope (the build_artifact_oracles
    caveat): numpy sums d2 pairwise, DuckDB's list_sum sequentially, so
    per-row d2 can differ by ulps — which perturbs not only the rounded
    avg_dist2 but, for a vector near-EQUIDISTANT from two centroids
    (|Δd2| within ~1 ulp), the argmin itself, flipping that row's
    cluster and with it the integer count/sum columns. Same ~1e-9-per-
    run class as the IVF/PQ assignment replays; the integer columns are
    exact GIVEN agreeing assignments, not unconditionally."""
    values, dim = _kmeans_cents_values_sql(sf_dir)
    return f"""
        WITH cents(cid, c) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id,
                   list_transform(
                       embedding,
                       x -> CAST(floor(x * {float(clu.QUANT_SCALE)!r}) AS BIGINT)
                   ) AS q
            FROM embeddings
        ), x AS (
            SELECT vec_id,
                   list_transform(q, v -> v / {float(clu.QUANT_SCALE)!r}) AS xv
            FROM e
        ), d AS (
            SELECT vec_id, cid,
                   list_sum(list_transform(
                       range(1, {dim + 1}),
                       i -> (xv[i] - c[i]) * (xv[i] - c[i])
                   )) AS d2
            FROM x CROSS JOIN cents
        ), assigned AS (
            SELECT vec_id, cid, d2,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid)
                     AS rn
            FROM d
        )"""


def _kmeans_oracle_sql(sf_dir: str) -> str:
    return (
        _kmeans_assign_ctes(sf_dir)
        + """
        SELECT cid AS cluster,
               count(*) AS n_vecs,
               sum(vec_id) AS sum_vec_id,
               round(avg(d2), 6) AS avg_dist2
        FROM assigned WHERE rn = 1
        GROUP BY cid
    """
    )


def _kmeans_profile_oracle_sql(sf_dir: str) -> str:
    return (
        _kmeans_assign_ctes(sf_dir)
        + """
        SELECT a.cid AS cluster,
               dc.source AS source,
               count(*) AS n_docs,
               sum(dc.n_chars) AS sum_chars
        FROM assigned a JOIN documents dc ON dc.doc_id = a.vec_id
        WHERE a.rn = 1
        GROUP BY a.cid, dc.source
    """
    )


_ARTIFACT_ORACLE_CACHE: dict[tuple, dict[str, str]] = {}


def _ivf_knn_join_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_ivf_knn_join: centroids embed as
    DOUBLE[] literals (spherical_kmeans_core — the identical numpy
    trainer), then DuckDB replays per-query probe selection (dot DESC,
    cid DESC, nprobe=4), corpus assignment (argmax dot, ties to the
    higher cid), the pruned cosine, and the per-query (cos desc,
    neighbor asc) top-10 — a full value-check of the batch ANN join."""
    cents = sim.spherical_kmeans_core(_oracle_embeddings(sf_dir, limit=2048), 16)
    values = ",\n            ".join(
        f"({i}, {cents[i]!r}::DOUBLE[])" for i in range(len(cents))
    )
    return f"""
        WITH cents(cid, c) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
        ), probe AS (
            SELECT query_id, cid, qv FROM (
                SELECT q.query_id, cents.cid, q.qv,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(cents.c, q.qv) DESC,
                                    cents.cid DESC) AS rn
                FROM q CROSS JOIN cents
            ) WHERE rn <= 4
        ), assigned AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, cents.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_dot_product(e.v, cents.c) DESC,
                                    cents.cid DESC) AS rn
                FROM e CROSS JOIN cents
            ) WHERE rn = 1
        ), cand AS (
            SELECT probe.query_id, e.vec_id AS neighbor_id,
                   CASE WHEN sqrt(list_dot_product(e.v, e.v))
                           * sqrt(list_dot_product(probe.qv, probe.qv)) > 0
                        THEN list_dot_product(e.v, probe.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(probe.qv, probe.qv)))
                        ELSE 0.0 END AS cos_raw
            FROM e
            JOIN assigned USING (vec_id)
            JOIN probe ON assigned.cid = probe.cid
        )
        SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim,
               CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_raw DESC, neighbor_id) AS rnk
            FROM cand
        ) WHERE rnk <= 10
        ORDER BY query_id, rnk
    """


def build_artifact_oracles(sf_dir: str) -> dict[str, str]:
    """Oracle SQL for the four index-probe queries whose twins embed
    corpus-derived artifacts (hyperplane tables, IVF centroids, PQ
    codebooks, the ADC distance table): the artifacts are deterministic
    functions of (corpus sample, seed), so the SQL must be generated for
    the corpus it will run against. Consumers merge this over ORACLE_SQL
    with the sf_dir their gate uses (__spark_entry__ pins the driver's
    sf0.01; tests/test_queries_oracle passes its own).

    Accepted float-parity risk (same class as every raw-float threshold
    filter in the static oracles): the engine computes dots/distances
    with numpy (BLAS/pairwise summation) while DuckDB sums sequentially,
    so a plane dot within ~1 ulp of zero, a near-exact centroid-distance
    tie, or a cosine landing exactly on a rounding boundary could
    diverge. At the gate corpus (500-2000 vectors) the probability is
    ~1e-9 per run; the tie-break rules themselves (numpy argmin first
    index, array_max-over-structs last max) ARE replicated exactly."""
    # BOTH mtimes key the cache: the BPE members replay documents.parquet
    # (an embeddings-only key served stale BPE SQL after a documents
    # rewrite, and permanently omitted the members when documents.parquet
    # appeared after the first call)
    key = (_emb_cache_key(sf_dir), _docs_cache_key(sf_dir))
    if key not in _ARTIFACT_ORACLE_CACHE:
        _ARTIFACT_ORACLE_CACHE[key] = {
            "embedding_lsh_topk": _lsh_topk_oracle_sql(sf_dir),
            "embedding_ivf_topk": _ivf_topk_oracle_sql(sf_dir),
            "embedding_ivf_knn_join": _ivf_knn_join_oracle_sql(sf_dir),
            "embedding_pq_topk": _pq_topk_oracle_sql(sf_dir),
            "embedding_near_dup_lsh": _lsh_pairs_oracle_sql(sf_dir),
            "kmeans_corpus_clusters": _kmeans_oracle_sql(sf_dir),
            "kmeans_domain_profile": _kmeans_profile_oracle_sql(sf_dir),
            "pca_label_compression": _pca_label_oracle_sql(sf_dir),
            "pca_component_variance": _pca_variance_oracle_sql(sf_dir),
        }
        # the PageRank replay reads the relational tables, which planted
        # test corpora (embeddings-only dirs) don't carry — per-file gate
        if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
            _ARTIFACT_ORACLE_CACHE[key]["pagerank_supplier_rank"] = (
                _pagerank_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["lpa_supplier_communities"] = (
                _lpa_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["kcore_supplier_stats"] = (
                _kcore_oracle_sql(sf_dir)
            )
        # the BPE replay reads documents.parquet, which embeddings-only
        # planted corpora don't carry — same per-file gate
        if os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            _ARTIFACT_ORACLE_CACHE[key]["bpe_learned_merges"] = (
                _bpe_merges_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["bpe_token_compression"] = (
                _bpe_compression_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["bpe_stable_merges"] = (
                _bpe_stable_oracle_sql(sf_dir)
            )
    return _ARTIFACT_ORACLE_CACHE[key]


# ---------------------------------------------------------------------------
# Prefix-filtering set-similarity join (SSJoin/AllPairs/PPJoin family)
# ---------------------------------------------------------------------------

def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs (capped Jaccard >= 0.8) via prefix filtering —
    the zero-false-negative scale path: only each doc's rarest-token
    prefix (~20% of the set at t=0.8) enters the inverted-index
    self-join, with PPJoin's length and positional filters pruning
    inside the join condition (see operators.dedup section comment;
    Bayardo WWW'07, Xiao WWW'08). t=0.8 is the family's high-confidence
    near-dup threshold (same as dedup_ngram_jaccard) and the regime
    prefix filtering is designed for — the operator docstring records
    the measured low-threshold blowup. Same fractional df-cap (5%) as
    the all-pairs twin, so the result must EQUAL the all-pairs ground
    truth — the oracle is the independent all-pairs DuckDB twin with the
    same exact-integer acceptance predicate (5*common >= 4*union), an
    algorithm-level differential check."""
    docs = _t(spark, sf_dir, "documents")
    return dd.prefix_filter_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.8, max_shingle_df=0.05
    )


def prefix_filter_candidate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix-filter pruning profile: corpus/posting sizes, prefix-row
    count, candidates surviving the in-join filters, the naive
    shared-token pair count an unfiltered inverted index would aggregate,
    and the verified pairs. All exact integers; the oracle replays the
    ENTIRE candidate pipeline (md5_signed64 hashes, global df order,
    ranks, all three integer filters) as static SQL — the algorithm's
    internals, value-checked."""
    docs = _t(spark, sf_dir, "documents")
    return dd.prefix_filter_stats(
        docs, "text", "doc_id", shingle_n=3, threshold=0.8, max_shingle_df=0.05
    )


QUERIES["dedup_prefix_filter_pairs"] = dedup_prefix_filter_pairs
QUERIES["prefix_filter_candidate_stats"] = prefix_filter_candidate_stats

ORACLE_SQL["dedup_prefix_filter_pairs"] = """
    -- INDEPENDENT all-pairs twin of the engine's prefix-filter join:
    -- same capped sets, same exact-integer predicate (5*inter >=
    -- 4*union, t = 4/5), different algorithm — a differential test of
    -- the prefix-filtering no-false-negative guarantee.
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    )
    SELECT id_a, id_b, round(inter::DOUBLE / un, 6) AS jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s)) AS inter,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS un
        FROM capped a JOIN capped b ON a.doc_id < b.doc_id
    )
    WHERE 5 * inter >= 4 * un
"""

ORACLE_SQL["prefix_filter_candidate_stats"] = """
    -- Full replay of the prefix-filter candidate pipeline: md5_signed64
    -- shingle hashes, corpus df, global (df, hash) order, per-doc ranks,
    -- prefix cut, and the length + positional integer filters
    -- (threshold 4/5 -> n=4, d=5).
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT DISTINCT doc_id, unnest(s) AS shingle FROM base
    ), hx AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS hi,
               CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS lo
        FROM shx
    ), hv AS (
        SELECT doc_id,
               (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                 * 4294967296 + lo AS shingle
        FROM hx
    ), dfreq AS (
        SELECT shingle, count(*) AS df FROM hv GROUP BY shingle
    ), joined AS (
        SELECT h.doc_id, h.shingle, d.df
        FROM hv h JOIN dfreq d USING (shingle)
        WHERE d.df <= 0.05 * (SELECT count(*) FROM documents)
    ), sized AS (
        SELECT doc_id, shingle, df,
               count(*) OVER (PARTITION BY doc_id) AS sz,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY df, shingle) AS rnk
        FROM joined
    ), prefix AS (
        SELECT * FROM sized WHERE 4 * sz <= 5 * (sz - rnk + 1)
    ), cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM prefix l JOIN prefix r
          ON l.shingle = r.shingle AND l.doc_id < r.doc_id
         AND 5 * least(l.sz, r.sz) >= 4 * greatest(l.sz, r.sz)
         AND (1 + least(l.sz - l.rnk, r.sz - r.rnk)) * 9 >= 4 * (l.sz + r.sz)
    ), naive AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM sized l JOIN sized r
          ON l.shingle = r.shingle AND l.doc_id < r.doc_id
    ), verified AS (
        SELECT id_a, id_b FROM (
            SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                   count(*) AS nc, min(l.sz) AS sa, min(r.sz) AS sb
            FROM sized l JOIN sized r
              ON l.shingle = r.shingle AND l.doc_id < r.doc_id
            GROUP BY 1, 2
        ) WHERE 5 * nc >= 4 * (sa + sb - nc)
    )
    SELECT (SELECT count(DISTINCT doc_id) FROM sized) AS n_docs,
           (SELECT count(*) FROM sized) AS n_set_rows,
           (SELECT count(*) FROM prefix) AS n_prefix_rows,
           (SELECT count(*) FROM naive) AS n_naive_pairs,
           (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM verified) AS n_verified
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense cosine, fused by reciprocal rank
# ---------------------------------------------------------------------------

# each lexical query is paired with a deterministic query VECTOR (the
# embedding row whose vec_id is the query's index in sorted order) — the
# plumbing a production hybrid search has, where a doc's embedding joins
# by id. The SQL mapping literal is generated from this dict so the two
# sides cannot drift.
_HYBRID_QUERY_VECS = {qid: i for i, qid in enumerate(sorted(_BM25_QUERIES))}


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-10 (lexical leg) and exact-cosine
    top-10 (dense leg, per mapped query vector) fused by reciprocal-rank
    fusion — the calibration-free combiner (retrieval.rrf_fuse;
    Cormack & Clarke SIGIR'09). Both legs rank on ROUNDED scores with id
    tie-breaks (the cross-engine ranking contract) and the fused score is
    an exact integer sum, so the final top-5 cut is boundary-proof. The
    dense leg is a broadcast of 3 query vectors against the corpus scan —
    no shuffle until the (30-row) per-query window."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    postings = rtr.term_postings(docs)
    lex = rtr.bm25_topk(
        postings, rtr.query_frame(spark, _BM25_QUERIES), k=10
    ).select("query_id", "doc_id", "rank")
    qmap = spark.createDataFrame(
        sorted(_HYBRID_QUERY_VECS.items()), "query_id string, qvec_id long"
    )
    qvecs = emb.join(
        F.broadcast(qmap), emb["vec_id"] == qmap["qvec_id"]
    ).select("query_id", F.col("embedding").alias("q"))
    joined = emb.crossJoin(F.broadcast(qvecs))
    dot = sim._dot(F.col("embedding"), F.col("q"))
    den = sim._norm(F.col("embedding")) * sim._norm(F.col("q"))
    cos = F.round(F.when(den > 0, dot / den).otherwise(F.lit(0.0)), 6)
    dw = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("doc_id")
    )
    dense = (
        joined.select("query_id", F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(dw))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    return rtr.rrf_fuse([lex, dense], k=5).orderBy("query_id", "rank")


QUERIES["hybrid_rrf_topk"] = hybrid_rrf_topk

_HYBRID_QMAP_VALUES = ", ".join(
    f"('{qid}', {vid})" for qid, vid in sorted(_HYBRID_QUERY_VECS.items())
)

ORACLE_SQL["hybrid_rrf_topk"] = f"""
    WITH lex AS (
        SELECT query_id, doc_id, rank
        FROM ({rtr.bm25_oracle_sql(_BM25_QUERIES, k=10)})
    ), qmap(query_id, qvec_id) AS (VALUES {_HYBRID_QMAP_VALUES}),
    qv AS (
        SELECT m.query_id, e.embedding::DOUBLE[] AS q
        FROM qmap m JOIN embeddings e ON e.vec_id = m.qvec_id
    ), ds AS (
        SELECT query_id, doc_id,
               round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS cos
        FROM (
            SELECT qv.query_id, e.vec_id AS doc_id,
                   list_dot_product(e.embedding::DOUBLE[], qv.q) AS num,
                   sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(qv.q, qv.q)) AS den
            FROM embeddings e CROSS JOIN qv
        )
    ), dr AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, doc_id) AS rank
        FROM ds
    ), dense AS (
        SELECT query_id, doc_id, rank FROM dr WHERE rank <= 10
    ), u AS (
        SELECT * FROM lex UNION ALL SELECT * FROM dense
    ), fused AS (
        SELECT query_id, doc_id,
               CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf_fp,
               count(*) AS n_systems
        FROM u GROUP BY 1, 2
    ), ranked AS (
        SELECT query_id, doc_id, rrf_fp, n_systems,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rrf_fp DESC, doc_id) AS rank
        FROM fused
    )
    SELECT query_id, rank, doc_id, rrf_fp, n_systems
    FROM ranked WHERE rank <= 5
"""


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric containment pairs (|Sa∩Sb|/|Sa| >= 0.9): the
    quote/subset detector symmetric Jaccard is blind to — an eval
    passage embedded in a 100x larger training doc has Jaccard ~0.01
    but containment ~1. One-sided prefix-filter candidates (only the
    contained side's rarest-token prefix joins the full posting rows —
    candidate volume linear in posting length, never quadratic), exact
    integer acceptance 10*common >= 9*|Sa|. Oracle: independent
    all-ordered-pairs DuckDB twin (the prefix-filter differential
    discipline)."""
    docs = _t(spark, sf_dir, "documents")
    return dd.containment_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.9, max_shingle_df=0.05
    )


QUERIES["dedup_containment_pairs"] = dedup_containment_pairs

ORACLE_SQL["dedup_containment_pairs"] = """
    -- INDEPENDENT all-ordered-pairs twin of the engine's one-sided
    -- prefix-filter containment join (t = 9/10): same capped sets, same
    -- exact-integer predicate, different algorithm.
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    )
    SELECT id_contained, id_container,
           round(inter::DOUBLE / sa, 6) AS containment
    FROM (
        SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
               len(list_intersect(a.s, b.s)) AS inter,
               len(a.s) AS sa
        FROM capped a JOIN capped b ON a.doc_id <> b.doc_id
    )
    WHERE 10 * inter >= 9 * sa
"""


def passjoin_doc_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PassJoin segment-filtered EXACT edit-distance join
    (``operators/linkage.passjoin_pairs`` — Li/Deng/Feng VLDB'12
    family) in its DESIGN REGIME: high-entropy text keys. A
    deterministically-perturbed 24-char document prefix (one char
    overwritten at a doc_id-dependent position, a second every third
    doc — distance 1-2 by construction, plus whatever natural
    collisions exist) links back to the clean prefixes at tau=2 with NO
    blocking key at all: the segment equi-join IS the blocking. On
    text, the tau+1 = 3 eight-char segments are near-unique, so
    candidate volume tracks true matches — measured at sf0.1 this runs
    ~5k x 5k unblocked in ~2 s where a naive cross-product pays 25M
    banded Levenshteins. The REGIME BOUNDARY is documented on the
    operator and pinned by test: on low-entropy zero-padded keys
    (customer names, where the segment "000" collides corpus-wide) the
    plain blocked join wins (measured 7 s vs 13 s at sf0.1), exactly as
    the prefix-filter Jaccard join degrades at low thresholds — the
    linkage queries therefore keep blocked_pairs and THIS query owns
    the text regime. Oracle: INDEPENDENT all-pairs DuckDB twin
    (cross-product + unbanded levenshtein) — an algorithm-level
    differential check of the pigeonhole segment selection."""
    docs = _t(spark, sf_dir, "documents")
    clean = docs.select(
        F.col("doc_id").alias("c_id"),
        F.expr("substr(lower(text), 1, 24)").alias("c_prefix"),
    )
    dirty = docs.select(
        F.col("doc_id").alias("d_id"),
        F.expr(_PASSJOIN_DIRTY_EXPR).alias("d_prefix"),
    )
    pairs = lk.passjoin_pairs(
        dirty, clean, "d_id", "c_id", "d_prefix", "c_prefix",
        max_distance=2,
    )
    return (
        pairs.groupBy("distance")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d_id").alias("dirty_checksum"),
            F.sum("c_id").alias("clean_checksum"),
        )
        .orderBy("distance")
    )


# one char overwritten at position (doc_id % 16) + 3; a second at
# position ((doc_id % 7) + 18) for every third doc — pure string
# arithmetic both engines evaluate identically
_PASSJOIN_DIRTY_EXPR = (
    "concat("
    "substr(substr(lower(text), 1, 24), 1, cast(doc_id % 16 + 2 as int)), '~',"
    "substr(substr(lower(text), 1, 24), cast(doc_id % 16 + 4 as int)))"
)
_PASSJOIN_DIRTY_EXPR = (
    "CASE WHEN doc_id % 3 = 0 THEN "
    "concat(substr(" + _PASSJOIN_DIRTY_EXPR + ", 1, cast(doc_id % 7 + 17 as int)), '#',"
    "substr(" + _PASSJOIN_DIRTY_EXPR + ", cast(doc_id % 7 + 19 as int)))"
    " ELSE " + _PASSJOIN_DIRTY_EXPR + " END"
)

QUERIES["passjoin_doc_prefix_pairs"] = passjoin_doc_prefix_pairs

ORACLE_SQL["passjoin_doc_prefix_pairs"] = f"""
    -- INDEPENDENT all-pairs twin of the engine's PassJoin segment join:
    -- plain cross-product + unbanded levenshtein, same perturbation
    -- arithmetic, same exact acceptance (distance <= 2)
    WITH clean AS (
        SELECT doc_id AS c_id, substr(lower(text), 1, 24) AS c_prefix
        FROM documents
    ), dirty AS (
        SELECT doc_id AS d_id, {_PASSJOIN_DIRTY_EXPR.replace('cast(', 'CAST(').replace(' as int)', ' AS INTEGER)')} AS d_prefix
        FROM documents
    ), pairs AS (
        SELECT d.d_id, c.c_id,
               levenshtein(d.d_prefix, c.c_prefix) AS distance
        FROM dirty d, clean c
        WHERE abs(length(d.d_prefix) - length(c.c_prefix)) <= 2
          AND levenshtein(d.d_prefix, c.c_prefix) <= 2
    )
    SELECT CAST(distance AS INTEGER) AS distance,
           count(*) AS n_pairs,
           sum(d_id) AS dirty_checksum,
           sum(c_id) AS clean_checksum
    FROM pairs GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches: distinct estimates + set overlap
# ---------------------------------------------------------------------------

def kmv_distinct_buyers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-buyer estimate per market segment next to the exact
    count — the bounded-shuffle path (``n_groups x k`` rows) a 100 TB
    pipeline uses when the exact distinct is too wide, with the exact
    count retained here as the in-query quality evidence. Sketch
    membership and ranks are md5-integer-exact; the lone float is the
    reported estimate (operators/kmv.py)."""
    from ..operators import kmv as kv

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    buyers = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("segment", "o_custkey")
    sk = kv.kmv_sketch(buyers, "o_custkey", ["segment"], k=64, seed="kmvq")
    est = kv.kmv_estimate(sk, ["segment"], k=64)
    exact = buyers.groupBy("segment").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return (
        est.join(exact, "segment")
        .select(
            "segment",
            "n_sketch",
            F.round("est", 4).alias("est"),
            "n_exact",
        )
        .orderBy("segment")
    )


def kmv_returnflag_part_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard / union / intersection estimates between the
    distinct-part sets of every return-flag pair, computed from per-flag
    KMV sketches ALONE — the sketch-only answer to "how much do these
    segments' vocabularies overlap" that drives corpus-mixture dedup
    budgeting without a second pass over the data (operators/kmv.py)."""
    from ..operators import kmv as kv

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), "l_partkey"
    )
    sk = kv.kmv_sketch(li, "l_partkey", ["flag"], k=64, seed="kmvp")
    ov = kv.kmv_pair_overlap(sk, "flag", k=64)
    return ov.select(
        "g1",
        "g2",
        "n_union_sketch",
        "n_both",
        F.round("jaccard_est", 6).alias("jaccard_est"),
        F.round("union_est", 4).alias("union_est"),
        F.round("intersection_est", 4).alias("intersection_est"),
    ).orderBy("g1", "g2")


QUERIES["kmv_distinct_buyers_per_segment"] = kmv_distinct_buyers_per_segment
QUERIES["kmv_returnflag_part_overlap"] = kmv_returnflag_part_overlap


def _kmv_hash_sql(key_expr: str, seed: str) -> str:
    from ..operators.kmv import kmv_hash_sql

    return kmv_hash_sql(key_expr, seed)


ORACLE_SQL["kmv_distinct_buyers_per_segment"] = f"""
    -- full KMV replay: distinct (segment, custkey), signed-64 md5 order,
    -- k=64 smallest per segment, (k-1)/F_k estimate, exact count twin
    WITH buyers AS (
        SELECT DISTINCT c.c_mktsegment AS segment, o.o_custkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), hashed AS (
        SELECT DISTINCT segment,
               {_kmv_hash_sql('o_custkey', 'kmvq')} AS hv
        FROM buyers
    ), ranked AS (
        SELECT segment, hv,
               row_number() OVER (PARTITION BY segment ORDER BY hv) AS rn
        FROM hashed
    ), sk AS (
        SELECT * FROM ranked WHERE rn <= 64
    ), est AS (
        SELECT segment,
               count(*) AS n_sketch,
               max(CASE WHEN rn = 64 THEN
                   (CAST(hv AS DOUBLE) + 9223372036854775808.0)
                   / 18446744073709551616.0 END) AS fk
        FROM sk GROUP BY segment
    ), exact AS (
        SELECT segment, count(DISTINCT o_custkey) AS n_exact
        FROM buyers GROUP BY segment
    )
    SELECT e.segment,
           e.n_sketch,
           round(CASE WHEN e.n_sketch < 64 THEN CAST(e.n_sketch AS DOUBLE)
                      ELSE 63.0 / e.fk END, 4) AS est,
           x.n_exact
    FROM est e JOIN exact x ON e.segment = x.segment
    ORDER BY e.segment
"""

ORACLE_SQL["kmv_returnflag_part_overlap"] = f"""
    -- full KMV overlap replay: per-mode k=64 sketches, pairwise union
    -- re-rank, presence flags from the retained sketches, Beyer et al.
    -- jaccard/union/intersection estimators
    WITH hashed AS (
        SELECT DISTINCT l_returnflag AS mode,
               {_kmv_hash_sql('l_partkey', 'kmvp')} AS hv
        FROM lineitem
    ), ranked AS (
        SELECT mode, hv,
               row_number() OVER (PARTITION BY mode ORDER BY hv) AS rn
        FROM hashed
    ), sk AS (
        SELECT * FROM ranked WHERE rn <= 64
    ), modes AS (
        SELECT DISTINCT mode FROM sk
    ), expanded AS (
        SELECT s.mode AS g1, m.mode AS g2, s.hv,
               1 AS in_a, 0 AS in_b
        FROM sk s JOIN modes m ON s.mode < m.mode
        UNION ALL
        SELECT m.mode AS g1, s.mode AS g2, s.hv,
               0 AS in_a, 1 AS in_b
        FROM sk s JOIN modes m ON s.mode > m.mode
    ), merged AS (
        SELECT g1, g2, hv, max(in_a) AS in_a, max(in_b) AS in_b
        FROM expanded GROUP BY g1, g2, hv
    ), union_sk AS (
        SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY hv) AS urn
        FROM merged
    ), agg AS (
        SELECT g1, g2,
               count(*) AS n_union_sketch,
               sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both,
               max(CASE WHEN urn = 64 THEN
                   (CAST(hv AS DOUBLE) + 9223372036854775808.0)
                   / 18446744073709551616.0 END) AS fk
        FROM union_sk WHERE urn <= 64
        GROUP BY g1, g2
    )
    SELECT g1, g2, n_union_sketch, n_both,
           round(CAST(n_both AS DOUBLE) / n_union_sketch, 6) AS jaccard_est,
           round(CASE WHEN n_union_sketch < 64
                      THEN CAST(n_union_sketch AS DOUBLE)
                      ELSE 63.0 / fk END, 4) AS union_est,
           round((CAST(n_both AS DOUBLE) / n_union_sketch)
                 * (CASE WHEN n_union_sketch < 64
                         THEN CAST(n_union_sketch AS DOUBLE)
                         ELSE 63.0 / fk END), 4) AS intersection_est
    FROM agg ORDER BY g1, g2
"""


# ---------------------------------------------------------------------------
# Corpus-trained bigram LM scoring (CCNet-style perplexity quality filter)
# ---------------------------------------------------------------------------

def lm_surprising_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The high-perplexity tail a CCNet-style curation pass cuts: top 15
    documents by average negative log-probability under the
    corpus-trained add-k bigram model (operators/lm.py). Ranking uses
    the 6-decimal ROUNDED score with doc_id as the tiebreak, so the
    selection boundary is engine-stable (a raw-float order could flip
    on sub-ulp ln/mean differences; the rounded order can't unless the
    rounding itself straddles a boundary — the accepted twin risk)."""
    from ..operators import lm

    docs = _t(spark, sf_dir, "documents")
    scored = lm.doc_nll(docs, "text", "doc_id", k_smooth=0.5)
    return (
        scored.select(
            F.col("id").alias("doc_id"),
            "n_bigrams",
            F.round("nll", 6).alias("nll"),
        )
        .orderBy(F.col("nll").desc(), F.col("doc_id"))
        .limit(15)
    )


def lm_source_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-model perplexity per source — the per-domain quality
    signal a mixture scheduler weighs against size: documents scored by
    the shared bigram model, averaged within source, exponentiated to
    perplexity (operators/lm.py)."""
    from ..operators import lm

    docs = _t(spark, sf_dir, "documents")
    scored = lm.doc_nll(docs, "text", "doc_id", k_smooth=0.5)
    joined = scored.join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.avg("nll")), 4).alias("perplexity"),
        )
        .orderBy("source")
    )


QUERIES["lm_surprising_docs"] = lm_surprising_docs
QUERIES["lm_source_perplexity"] = lm_source_perplexity


def _lm_ctes() -> str:
    from ..operators.lm import bigram_nll_sql

    return bigram_nll_sql("documents", "text", "doc_id", k_smooth=0.5)


ORACLE_SQL["lm_surprising_docs"] = (
    _lm_ctes()
    + """
    SELECT id AS doc_id, n_bigrams, round(nll, 6) AS nll
    FROM scored
    ORDER BY round(nll, 6) DESC, id
    LIMIT 15
"""
)

ORACLE_SQL["lm_source_perplexity"] = (
    _lm_ctes()
    + """
    SELECT d.source,
           count(*) AS n_docs,
           sum(s.n_bigrams) AS n_bigrams,
           round(avg(s.nll), 6) AS avg_nll,
           round(exp(avg(s.nll)), 4) AS perplexity
    FROM scored s JOIN documents d ON s.id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
"""
)


# ---------------------------------------------------------------------------
# PCA embedding compression (trained-artifact family, like IVF/PQ/kmeans)
# ---------------------------------------------------------------------------

_PCA_MODEL_CACHE: dict[tuple, tuple] = {}
_PCA_M = 4
_PCA_SAMPLE = 2048


def _pca_model_cached(emb: DataFrame, sf_dir: str):
    from ..operators import pca as pc

    key = _emb_cache_key(sf_dir)
    if key not in _PCA_MODEL_CACHE:
        _PCA_MODEL_CACHE[key] = pc.pca_fit(
            emb, _PCA_M, sample_size=_PCA_SAMPLE
        )
    return _PCA_MODEL_CACHE[key]


def pca_label_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-rank compression quality per label: squared reconstruction
    error of the 4-component PCA basis, averaged within each embedding
    label — the per-domain signal that says which corpus slices a
    compressed index represents faithfully. Basis trained driver-side on
    the deterministic id-ordered sample (the IVF-artifact discipline);
    the scan-side error uses the orthonormal identity
    ``||x-mean||^2 - sum p_i^2`` as pure Column folds
    (operators/pca.py)."""
    from ..operators import pca as pc

    emb = _t(spark, sf_dir, "embeddings")
    mean, comps, _eigs, _evr = _pca_model_cached(emb, sf_dir)
    scored = pc.reconstruction_error(emb, mean, comps)
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("err"), 6).alias("avg_err"),
        )
        .orderBy("label")
    )


def pca_component_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized variance along each trained component over the FULL
    corpus next to the sample eigenvalue and explained-variance ratio —
    the drift check between the persisted basis and the data it now
    serves (sample == corpus at gate scale, so realized ≈ eigenvalue;
    at 100 TB the gap is the retrain signal)."""
    from ..operators import pca as pc

    emb = _t(spark, sf_dir, "embeddings")
    mean, comps, eigs, evr = _pca_model_cached(emb, sf_dir)
    pr = pc.project(emb, mean, comps)
    agg = pr.agg(
        *[
            F.avg(F.col(f"p{i}") * F.col(f"p{i}")).alias(f"v{i}")
            for i in range(len(comps))
        ]
    )
    stacked = agg.selectExpr(
        "stack({n}, {args}) as (component, realized_var)".format(
            n=len(comps),
            args=", ".join(f"{i}, v{i}" for i in range(len(comps))),
        )
    )
    model = F.create_map(
        *[
            x
            for i in range(len(comps))
            for x in (F.lit(i), F.array(F.lit(eigs[i]), F.lit(evr[i])))
        ]
    )
    return (
        stacked.select(
            "component",
            F.round("realized_var", 6).alias("realized_var"),
            F.round(model[F.col("component")][0], 6).alias("eigenvalue"),
            F.round(model[F.col("component")][1], 6).alias("evr"),
        )
        .orderBy("component")
    )


QUERIES["pca_label_compression"] = pca_label_compression
QUERIES["pca_component_variance"] = pca_component_variance


def _pca_model_for_oracle(sf_dir: str):
    from ..operators.pca import pca_core

    return pca_core(_oracle_embeddings(sf_dir, limit=_PCA_SAMPLE), _PCA_M)


def _pca_err_expr(mean, comps) -> str:
    """The exact Spark-side error expression in DuckDB list arithmetic:
    same literals, same association order."""
    import numpy as _np

    from ..operators.pca import comp_sql, mean_sql

    mm = float(_np.dot(_np.asarray(mean), _np.asarray(mean)))
    p_terms = []
    for c in comps:
        md = float(_np.dot(_np.asarray(mean), _np.asarray(c)))
        # ::DOUBLE: a bare decimal literal types as DECIMAL (see
        # _pca_variance_oracle_sql) — promotion would still land on
        # DOUBLE here, but typed literals make that not depend on
        # DuckDB's promotion rules
        p_terms.append(
            f"(list_dot_product(d, {comp_sql(c)}) - ({md!r}::DOUBLE))"
        )
    proj2 = " + ".join(f"{p} * {p}" for p in p_terms)
    return (
        f"list_dot_product(d, d) - 2.0 * list_dot_product(d, {mean_sql(mean)})"
        f" + ({mm!r}::DOUBLE) - ({proj2})"
    )


def _pca_label_oracle_sql(sf_dir: str) -> str:
    mean, comps, _eigs, _evr = _pca_model_for_oracle(sf_dir)
    return f"""
        WITH e AS (
            SELECT label, embedding::DOUBLE[] AS d FROM embeddings
        )
        SELECT label,
               count(*) AS n_vecs,
               round(avg({_pca_err_expr(mean, comps)}), 6) AS avg_err
        FROM e GROUP BY label ORDER BY label
    """


def _pca_variance_oracle_sql(sf_dir: str) -> str:
    import numpy as _np

    from ..operators.pca import comp_sql

    mean, comps, eigs, evr = _pca_model_for_oracle(sf_dir)
    rows = []
    for i, c in enumerate(comps):
        md = float(_np.dot(_np.asarray(mean), _np.asarray(c)))
        # ::DOUBLE on every scalar literal: DuckDB types a bare decimal
        # VALUES literal as DECIMAL, whose string form keeps trailing
        # zeros ('0.021090') and hash-mismatches the float ('0.02109')
        # — surfaced by the sf1 probe, latent at smaller sfs
        rows.append(
            f"({i}, {comp_sql(c)}, {md!r}::DOUBLE,"
            f" {eigs[i]!r}::DOUBLE, {evr[i]!r}::DOUBLE)"
        )
    values = ",\n            ".join(rows)
    return f"""
        WITH model(i, c, mdotc, eig, evr) AS (VALUES
            {values}
        ), proj AS (
            SELECT m.i,
                   (list_dot_product(e.embedding::DOUBLE[], m.c) - m.mdotc)
                     AS p
            FROM embeddings e CROSS JOIN model m
        )
        SELECT CAST(p.i AS INTEGER) AS component,
               round(avg(p.p * p.p), 6) AS realized_var,
               round(any_value(m.eig), 6) AS eigenvalue,
               round(any_value(m.evr), 6) AS evr
        FROM proj p JOIN model m ON p.i = m.i
        GROUP BY p.i ORDER BY component
    """


# ---------------------------------------------------------------------------
# BPE tokenizer induction (trained-artifact family; integer-exact replay)
# ---------------------------------------------------------------------------

_BPE_N_MERGES = 12
_BPE_SAMPLE = 1024
_BPE_MERGE_CACHE: dict[tuple, list] = {}


def _bpe_sample(docs: DataFrame) -> DataFrame:
    return docs.orderBy("doc_id").limit(_BPE_SAMPLE)


def _docs_cache_key(sf_dir: str) -> tuple:
    """(path, 'documents', mtime) key for documents-derived artifacts —
    the embeddings-mtime key can't see a rewritten documents.parquet."""
    import os as _os

    path = _os.path.join(sf_dir, "documents.parquet")
    try:
        return (sf_dir, "documents", _os.path.getmtime(path))
    except OSError:
        return (sf_dir, "documents", None)


def _bpe_merges_cached(docs: DataFrame, sf_dir: str) -> list:
    from ..operators import bpe
    from ..operators.dedup import _release_ckpt

    key = _docs_cache_key(sf_dir)
    if key not in _BPE_MERGE_CACHE:
        merges, final = bpe.bpe_learn(
            _bpe_sample(docs), "text", _BPE_N_MERGES
        )
        _release_ckpt(final)
        _BPE_MERGE_CACHE[key] = merges
    return _BPE_MERGE_CACHE[key]


def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table itself — distributed BPE training
    (iterated pair-count aggregations + Arrow-batched merge rewrites,
    operators/bpe.py) on the deterministic id-ordered sample. Every
    value is an exact integer or a string and the tie rule is total
    (count desc, pair lexicographic), so the oracle is an INDEPENDENT
    single-process replay of training (bpe_learn_py) — the
    kmeans-twin discipline, a stronger check than sharing artifacts."""
    docs = _t(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(docs, sf_dir)
    return spark.createDataFrame(
        [(i + 1, a, b, int(c)) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, w1 string, w2 string, cnt long",
    )


def bpe_token_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide compression under the learned table: tokenize EVERY
    document with the sample-trained merges (one Arrow pass regardless
    of table length) and report sequence/symbol/vocab totals — the
    number a tokenizer build is accepted on. Integer-exact."""
    from ..operators import bpe

    docs = _t(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(docs, sf_dir)
    return bpe.token_length_stats(
        bpe.token_occurrences(docs, "text", merges)
    )


QUERIES["bpe_learned_merges"] = bpe_learned_merges
QUERIES["bpe_token_compression"] = bpe_token_compression


_BPE_STABLE_CACHE: dict[tuple, dict] = {}
# small enough that the validator's worst case (three distributed
# trainings) stays a single-digit-seconds gate query, large enough that
# the doubling ladder has three rungs (128 -> 256 -> 512) below the cap
_BPE_STABLE_PARAMS = {"n_merges": 4, "start": 128, "max_docs": 512}


def bpe_stable_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sequential-doubling sample validator AS a gate query
    (round-9 verdict #5): ``bpe.bpe_learn_stable`` runs its nested
    id-ordered doubling ladder on the corpus and the row exposes the
    full DECISION — sample size trained at, whether consecutive samples
    agreed (converged), whether the ladder hit the whole corpus
    (covered_corpus, where the table is exact by construction), the
    size it agreed with, and the learned table itself. The oracle is an
    INDEPENDENT single-process replay of the same ladder
    (bpe_learn_py per rung, same doubling and short-circuit rules), so
    the convergence decision — not just one trained table — is
    value-checked at the gate. On the word-soup gate corpus the honest
    outcome varies by scale: below the cap the ladder covers the corpus
    (exact); above it the noise ranking keeps disagreeing and the row
    must say converged=false."""
    from ..operators import bpe

    docs = _t(spark, sf_dir, "documents")
    key = _docs_cache_key(sf_dir)
    if key not in _BPE_STABLE_CACHE:
        _BPE_STABLE_CACHE[key] = bpe.bpe_learn_stable(
            docs, "doc_id", "text", **_BPE_STABLE_PARAMS
        )
    res = _BPE_STABLE_CACHE[key]
    table = "|".join(f"{a}+{b}" for a, b, _ in res["merges"])
    return spark.createDataFrame(
        [(
            int(res["sample_docs"]),
            bool(res["converged"]),
            bool(res["covered_corpus"]),
            None if res["agreed_with"] is None else int(res["agreed_with"]),
            len(res["merges"]),
            table,
        )],
        "sample_docs long, converged boolean, covered_corpus boolean, "
        "agreed_with long, n_merges long, merges string",
    )


QUERIES["bpe_stable_merges"] = bpe_stable_merges


def _oracle_documents(sf_dir: str, limit: int | None = None) -> list[str]:
    """Document texts OUTSIDE Spark in the trainers' sample order."""
    import duckdb

    con = duckdb.connect()
    sql = (
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    )
    if limit is not None:
        sql += f" LIMIT {limit}"
    rows = con.execute(sql).fetchall()
    con.close()
    return [r[0] for r in rows]


_BPE_ORACLE_MERGE_CACHE: dict[tuple, list] = {}


def _bpe_oracle_merges(sf_dir: str) -> list:
    """Single-process training replay, cached per documents mtime — the
    merges and compression builders both need it, and each replay
    re-reads the parquet and reruns the full n_merges training loop."""
    from ..operators.bpe import bpe_learn_py

    key = _docs_cache_key(sf_dir)
    if key not in _BPE_ORACLE_MERGE_CACHE:
        _BPE_ORACLE_MERGE_CACHE[key] = bpe_learn_py(
            _oracle_documents(sf_dir, limit=_BPE_SAMPLE), _BPE_N_MERGES
        )
    return _BPE_ORACLE_MERGE_CACHE[key]


def _sql_str(x: str) -> str:
    """SQL string literal with quote doubling (repr would emit Python
    escapes DuckDB can't parse)."""
    return "'" + x.replace("'", "''") + "'"


def _bpe_merges_oracle_sql(sf_dir: str) -> str:
    merges = _bpe_oracle_merges(sf_dir)
    if not merges:
        # types must match the non-empty branch (and the Spark frame's
        # int/long) even on the empty result, or the schema leg fails
        return (
            "SELECT CAST(1 AS INTEGER) AS merge_rank, '' AS w1, '' AS w2,"
            " CAST(1 AS BIGINT) AS cnt WHERE 1=0"
        )
    values = ",\n            ".join(
        f"({i + 1}, {_sql_str(a)}, {_sql_str(b)}, {c})"
        for i, (a, b, c) in enumerate(merges)
    )
    return f"""
        -- independent single-process replay of BPE training (same
        -- tokenizer, counts, tie rule, early stop) embedded as literals
        SELECT CAST(merge_rank AS INTEGER) AS merge_rank, w1, w2,
               CAST(cnt AS BIGINT) AS cnt
        FROM (VALUES
            {values}
        ) t(merge_rank, w1, w2, cnt)
    """


def _bpe_stable_oracle_sql(sf_dir: str) -> str:
    """Independent replay of the sequential-doubling validator: the
    same nested id-ordered prefixes (DuckDB ORDER BY doc_id mirrors the
    engine's orderBy — doc ids are unique, so the order is total), the
    same doubling ladder, the same covered-corpus short-circuit and
    convergence rule, each rung trained by the single-process
    ``bpe_learn_py`` replay — embedded as one literal row."""
    import duckdb

    from ..operators.bpe import bpe_learn_py

    p = _BPE_STABLE_PARAMS
    con = duckdb.connect()
    n_total = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    con.close()
    texts = _oracle_documents(sf_dir, limit=min(p["max_docs"], n_total))
    s = min(max(1, p["start"]), p["max_docs"])
    prev: list | None = None
    prev_size = 0
    while True:
        covered = s >= n_total
        merges = bpe_learn_py(texts[:s], p["n_merges"])
        table = [(a, b) for a, b, _ in merges]
        trained = min(s, n_total)
        if prev is not None and table == prev:
            res = (trained, True, covered, prev_size, merges)
            break
        if covered:
            res = (trained, True, True, None, merges)
            break
        prev, prev_size = table, trained
        if s >= p["max_docs"]:
            res = (trained, False, False, None, merges)
            break
        s = min(2 * s, p["max_docs"])
    trained, converged, covered, agreed, merges = res
    joined = "|".join(f"{a}+{b}" for a, b, _ in merges)
    aw = (
        "CAST(NULL AS BIGINT)"
        if agreed is None
        else f"CAST({agreed} AS BIGINT)"
    )
    return f"""
        -- independent single-process replay of the sequential-doubling
        -- sample validator (nested prefixes, doubling ladder,
        -- covered-corpus short-circuit, convergence rule)
        SELECT CAST({trained} AS BIGINT) AS sample_docs,
               {str(bool(converged)).upper()} AS converged,
               {str(bool(covered)).upper()} AS covered_corpus,
               {aw} AS agreed_with,
               CAST({len(merges)} AS BIGINT) AS n_merges,
               {_sql_str(joined)} AS merges
    """


def _bpe_compression_oracle_sql(sf_dir: str) -> str:
    from ..operators.bpe import MERGE_JOIN, _merge_seq, _tok_py

    merges = _bpe_oracle_merges(sf_dir)
    texts = _oracle_documents(sf_dir)
    n_seqs, total, vocab = 0, 0, set()
    for t in texts:
        if t is None:
            continue
        seq = _tok_py(t)
        for a, b, _c in merges:
            seq = _merge_seq(seq, a, b, a + MERGE_JOIN + b)
        n_seqs += 1
        total += len(seq)
        vocab.update(seq)
    return f"""
        -- full-corpus replay of tokenization under the learned table
        SELECT CAST({n_seqs} AS BIGINT) AS n_seqs,
               CAST({total} AS BIGINT) AS total_symbols,
               CAST({len(vocab)} AS BIGINT) AS distinct_symbols
    """
