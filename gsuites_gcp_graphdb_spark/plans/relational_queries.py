"""Relational + ETL-dataflow queries (SURVEY.md §2B/§2C): the
reference's Go-side dataflow operators re-expressed declaratively,
plus the standard-checklist categories (aggregation, window, rollup,
set ops, string/date/json functions) the contract exercises.

Money aggregates are computed in DECIMAL (exact, order-independent —
a float sum would depend on partition order and could never
hash-match DuckDB), then cast to double at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.fixtures import load_table
from .base import QueryDef

DEC = "decimal(18,2)"
DEC_HI = "decimal(38,6)"


# --- B1: early filter (ACTIVE-project analog: open orders) -----------
def filter_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """main.go:722 `LifecycleState == ACTIVE` analog: filter pushed to
    the scan (check .explain: PushedFilters on o_orderstatus)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("total"),
        )
    )


# --- B8: role->permission inversion ----------------------------------
def role_permission_inversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generateMap (main.go:839-907): roles' included permissions
    inverted to permission -> sorted role list. The reference builds
    this with driver-side linear scans + mutex'd maps; here it's one
    hash aggregate with map-side combine (explode + groupBy +
    collect_set). Output as csv string for cross-engine hashing."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            F.col("p_type").alias("permission"), F.col("p_brand").alias("role")
        )
        .dropDuplicates()
        .groupBy("permission")
        .agg(
            F.array_join(F.sort_array(F.collect_set("role")), ",").alias(
                "roles"
            ),
            F.count("*").cast("bigint").alias("n_roles"),
        )
    )


# --- B4/B6: member-string parsing (total, unlike main.go:563-564) ----
def member_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `type:email` member-string split (main.go:563: unguarded
    strings.Split index crash on e.g. 'allUsers'). Our parser is
    total: memberless pseudo-principals map to ('pseudoGroup', token).
    Members synthesized deterministically from customers."""
    customer = load_table(spark, sf_dir, "customer")
    member = F.when(
        F.col("c_custkey") % 10 == 0, F.lit("allUsers")
    ).otherwise(F.concat(F.lit("user:"), F.col("c_name")))
    parts = F.split(member, ":")
    return (
        customer.select(
            member.alias("member"),
            F.when(F.size(parts) >= 2, F.element_at(parts, 1))
            .otherwise(F.lit("pseudoGroup"))
            .alias("member_type"),
            F.when(F.size(parts) >= 2, F.element_at(parts, 2))
            .otherwise(F.element_at(parts, 1))
            .alias("principal"),
        )
        .groupBy("member_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("principal").alias("min_principal"),
        )
    )


# --- §2C aggregation: TPC-H Q1-shaped pricing summary ----------------
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum((price * (F.lit(1).cast(DEC) - disc)).cast(DEC_HI))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                (
                    (price * (F.lit(1).cast(DEC) - disc)).cast(DEC_HI)
                    * (F.lit(1).cast(DEC) + tax)
                ).cast(DEC_HI)
            )
            .cast("double")
            .alias("sum_charge"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


# --- §2C sorts/limits: top-k with deterministic tiebreak -------------
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(10)
        .select(
            "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal")
        )
    )


# --- §2C window functions --------------------------------------------
def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").cast("bigint").alias("custkey"),
            F.col("o_orderkey").cast("bigint").alias("top_orderkey"),
            F.col("o_totalprice").cast("double").alias("top_price"),
        )
    )


# --- §2C grouping sets / rollup --------------------------------------
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
        )
        .select("l_returnflag", "l_linestatus", "n", "qty")
    )


# --- §2C set ops ------------------------------------------------------
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join/except: customers with no OPEN order (the status
    filter keeps the result non-trivial at every SF)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    have = (
        o.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
        .dropDuplicates()
    )
    return (
        c.select("c_custkey", "c_name")
        .join(have, ["c_custkey"], "left_anti")
        .select(F.col("c_name").alias("c_name"))
    )


def nation_presence_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join coverage: per-nation customer and supplier
    presence reconciled in one pass — nations with only one side
    present surface with a zero on the other, the reconciliation
    shape (ledger-vs-ledger, catalog-vs-catalog) that inner/left
    joins silently drop. Full outer cannot broadcast (both sides
    must retain unmatched rows) so it shuffles on the join key —
    fine here because both inputs are PRE-AGGREGATED to nation
    grain before the join: aggregate-then-join is what keeps a
    full-outer reconciliation shuffle-light at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy("c_nationkey").agg(F.count("*").alias("n_customers"))
    sn = s.groupBy("s_nationkey").agg(F.count("*").alias("n_suppliers"))
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey")
            .cast("bigint")
            .alias("nationkey"),
            F.coalesce("n_customers", F.lit(0))
            .cast("bigint")
            .alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0))
            .cast("bigint")
            .alias("n_suppliers"),
        )
    )


def customers_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — the 'for all' query SQL can only phrase
    as double negation (customers with no priority class they lack):
    customers who placed at least one order in EVERY order-priority
    class. Spark plans it as the count-distinct-equals-total form —
    one hash-agg over distinct (customer, priority) pairs against a
    one-row broadcast domain count — which is the scale-safe shape;
    the NOT EXISTS spelling nests a correlated probe per (customer,
    class) pair. The oracle keeps the classic double-NOT-EXISTS
    spelling, so the two formulations verify each other."""
    o = load_table(spark, sf_dir, "orders")
    pairs = o.select("o_custkey", "o_orderpriority").dropDuplicates()
    domain = o.select("o_orderpriority").dropDuplicates().agg(
        F.count(F.lit(1)).alias("__n_classes")
    )
    c = load_table(spark, sf_dir, "customer")
    full = (
        pairs.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("__n"))
        .crossJoin(F.broadcast(domain))
        .filter(F.col("__n") == F.col("__n_classes"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.join(full, ["c_custkey"], "left_semi")
        .select(F.col("c_name"))
        .orderBy("c_name")
    )


# --- §2C date functions ----------------------------------------------
def orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
    )


# --- §2C string functions --------------------------------------------
def part_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.element_at(F.split("p_name", " "), 1).alias("first_word"))
        .groupBy("first_word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# --- §2C json functions ----------------------------------------------
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).cast("bigint").alias("k_sum"),
            F.max(k).cast("bigint").alias("k_max"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


# --- TPC-H Q3 shape: shipping priority -------------------------------
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + 3-way join + agg + deterministic top-10: the classic
    'selective dimensions join big fact' plan (dims broadcast, filter
    pushed to every scan — see PLANS.md)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast(DEC_HI)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("__rev"))
        .select(
            F.col("l_orderkey").cast("bigint").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("__rev").cast("double").alias("revenue"),
        )
        .orderBy(F.col("__rev").desc(), F.col("orderkey"))
        .limit(10)
    )


# --- TPC-H Q6 shape: pure filter + agg (pushdown showcase) -----------
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast(DEC)
                    * F.col("l_discount").cast(DEC)
                ).cast(DEC_HI)
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


# --- §2C set ops: intersect ------------------------------------------
def customers_in_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = open_c.intersect(done_c)
    return both.agg(F.count("*").cast("bigint").alias("n_customers"))


# --- §2C grouping sets: cube -----------------------------------------
def cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select("l_returnflag", "l_linestatus", "n")
    )


# --- §2C approximate aggregates --------------------------------------
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch counts with a bounds-style oracle: the sketch value
    itself is engine-specific, so what both engines CAN agree on is the
    exact cardinality plus the claim that the sketch landed within
    tolerance (2x the default 5% rsd). The oracle asserts TRUE; a
    drifting sketch flips the boolean and fails the hash match."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.agg(
        F.approx_count_distinct("l_partkey").alias("apx_parts"),
        F.approx_count_distinct("l_suppkey").alias("apx_supps"),
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.count_distinct("l_suppkey").cast("bigint").alias("exact_supps"),
    )
    return a.select(
        "exact_parts",
        "exact_supps",
        (
            F.abs(F.col("apx_parts") - F.col("exact_parts"))
            <= 0.1 * F.col("exact_parts")
        ).alias("parts_within_10pct"),
        (
            F.abs(F.col("apx_supps") - F.col("exact_supps"))
            <= 0.1 * F.col("exact_supps")
        ).alias("supps_within_10pct"),
    )


# --- B10-style nested structures: collect -> explode round-trip ------
def nested_collect_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getGCS walks a nested project->buckets->roles->members tree
    (main.go:384-524). The relational shape: build the nesting with
    collect_list, then explode it back — per-part line counts must
    survive the round-trip exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("parts")
    )
    return (
        nested.select(F.explode("parts").alias("partkey"))
        .groupBy(F.col("partkey").cast("bigint").alias("partkey"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# --- joins incl. broadcast + multi-way (§2C joins row) ---------------
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic star join: fact lineitem ⨝ orders ⨝ customer ⨝ nation.
    nation/customer broadcast under AQE; revenue summed in decimal."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast(DEC_HI)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --- §2C multi-way join with dual dimension aliasing (TPC-H Q7) ------
def trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: revenue shipped between DIFFERENT customer/supplier
    nations per year — the same dimension (nation) joins twice under
    two roles, the classic alias-disambiguation join. Exact decimal
    revenue; two shipping years."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust_n = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_n = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice").cast(DEC)
           * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))).cast(DEC_HI)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(cust_n, F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(supp_n, F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --- §2C conditional share-of-total (TPC-H Q8 shape) -----------------
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: the min-name nation's share of supplier revenue
    within its region, per year — a conditional decimal sum divided by
    the total (both exact; division in double at the edge, rounded)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    target_nation = nation.agg(F.min("n_name").alias("tn"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    # region of the target nation
    nr = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")
    tgt_region = (
        nr.join(target_nation, nr.n_name == F.col("tn"), "left_semi")
        .select(F.col("r_name").alias("tr"))
    )
    region_nations = nr.join(
        tgt_region, nr.r_name == F.col("tr"), "left_semi"
    ).select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice").cast(DEC)
           * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))).cast(DEC_HI)
    scored = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(region_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .crossJoin(F.broadcast(target_nation))
        .select(
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            rev.alias("rev"),
            F.when(F.col("n_name") == F.col("tn"), rev)
            .otherwise(F.lit(0).cast(DEC_HI))
            .alias("tn_rev"),
        )
    )
    return (
        scored.groupBy("l_year")
        .agg(
            F.round(
                F.sum("tn_rev").cast("double") / F.sum("rev").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# --- §2C exists semi-join + conditional count (TPC-H Q4 shape) -------
def priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: order counts per priority, restricted to orders that
    HAVE at least one returned lineitem — EXISTS as a left_semi join
    (never a fan-out join + distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )


# --- §2C distinct-count classes + exclusion (TPC-H Q16 shape) --------
def supplier_part_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: how many distinct suppliers serve each (brand,
    size) class, excluding one brand — countDistinct over the
    lineitem-derived supplier-part relation with a dimension
    anti-filter."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).dropDuplicates()
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    excl = part.agg(F.min("p_brand").alias("xb"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(excl, part.p_brand == F.col("xb"), "left_anti")
        .groupBy("p_brand", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# --- §2C having-equals-global-max (TPC-H Q15 shape) ------------------
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: supplier(s) achieving the maximum quarterly revenue
    — a decimal aggregate compared for EXACT equality against its own
    global max (only possible because revenue sums are decimal; float
    sums could never equality-join cross-engine)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    rev = (F.col("l_extendedprice").cast(DEC)
           * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))).cast(DEC_HI)
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("__tr"))
    mx = per_supp.agg(F.max("__tr").alias("__mx"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        per_supp.join(F.broadcast(mx), per_supp.__tr == F.col("__mx"))
        .join(supp, per_supp.l_suppkey == supp.s_suppkey)
        .select("s_name", F.col("__tr").cast("double").alias("total_revenue"))
    )


# --- §2C explicit GROUPING SETS via the SQL front door ---------------
def grouping_sets_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond rollup/cube) written in SQL over
    the registered fixture views, with grouping() flags disambiguating
    the NULLs — same statement runs on DuckDB as the oracle."""
    from ..sources.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_linestatus), ())
    HAVING count(*) > 0
"""


# --- §2C conditional counts over date arithmetic (TPC-H Q12 shape) ---
def late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped (the fixture has no l_shipmode/commitdate, so 'late'
    is shipped >90 days after the order date): per ship year, how many
    late lines belong to high- vs low-priority orders — conditional
    counts over a fact⨝dim join with interval arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint")
            .alias("low_line_count"),
        )
    )


# --- §2C outer-join aggregate-of-aggregate (TPC-H Q13 shape) ---------
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: the distribution of per-customer order counts,
    including zero — a filtered LEFT OUTER join whose null-preserving
    count feeds a second aggregation."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        # count(col) skips nulls: customers with no orders count 0
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


# --- §2C conditional share of revenue (TPC-H Q14 shape) --------------
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: PROMO parts' share of one year's revenue. Both
    operands are exact decimal sums; the single division happens in
    double at the edge and is rounded — identical IEEE ops on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice").cast(DEC)
           * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))).cast(DEC_HI)
    scored = li.join(part, li.l_partkey == part.p_partkey).select(
        rev.alias("rev"),
        F.when(F.col("p_type") == "PROMO", rev)
        .otherwise(F.lit(0).cast(DEC_HI))
        .alias("promo_rev"),
    )
    return scored.agg(
        F.round(
            F.lit(100.0)
            * F.sum("promo_rev").cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("promo_share_pct")
    )


# --- §2C correlated-average filter (TPC-H Q17 shape) -----------------
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped: revenue from lines whose quantity is below 20% of
    their part's average. The correlated AVG becomes a per-part
    aggregate re-joined to the fact; the boundary is the EXACT
    cross-multiplied form `5*qty*cnt < sum` in decimal, so no
    float-average rounding can flip a row cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    li = li.join(part, li.l_partkey == part.p_partkey, "left_semi")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("__sq"),
        F.count("*").cast("bigint").alias("__cq"),
    )
    return (
        li.join(per_part, li.l_partkey == F.col("__pk"))
        .filter(
            F.col("l_quantity").cast(DEC) * 5 * F.col("__cq") < F.col("__sq")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


# --- §2C having-over-join (TPC-H Q18 shape) --------------------------
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: customers whose single order exceeds 300 units —
    a HAVING aggregate on the fact drives a dimension join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__sq"))
        .filter(F.col("__sq") > 300)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("__sq").cast("double").alias("sum_qty"),
        )
    )


# --- §2C disjunctive multi-predicate join (TPC-H Q19 shape) ----------
def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: one decimal revenue total under an OR of three
    brand/size/quantity predicate blocks — the classic test that the
    optimizer pushes a disjunction into the join without a cartesian
    fallback (the equi-key p_partkey=l_partkey must stay the join
    condition; the OR is a post-join filter)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_size"
    )
    q = F.col("l_quantity")
    s = F.col("p_size")
    blocks = (
        ((F.col("p_type") == "SMALL") & s.between(1, 15) & q.between(1, 20))
        | ((F.col("p_type") == "MEDIUM") & s.between(10, 30) & q.between(10, 30))
        | ((F.col("p_type") == "LARGE") & s.between(20, 50) & q.between(20, 50))
    )
    rev = (F.col("l_extendedprice").cast(DEC)
           * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))).cast(DEC_HI)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(blocks)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --- §2C exists/not-exists pair (TPC-H Q21 shape) --------------------
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: suppliers who were the ONLY late supplier on a
    multi-supplier finished order. The correlated EXISTS / NOT EXISTS
    pair collapses into one per-order aggregate (distinct suppliers,
    distinct late suppliers) re-joined to the late lines — two
    shuffles total instead of two correlated subquery scans."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .alias("late"),
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey")))
        .alias("__n_late"),
    )
    waiting = (
        lines.filter(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("__ok"))
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
        .select("l_suppkey", "l_orderkey")
        .dropDuplicates()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
    )


# --- §2C window frames: running totals -------------------------------
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative monthly revenue per order priority — an explicit
    ROWS UNBOUNDED PRECEDING frame over a pre-aggregated relation.
    The cumulative sum runs over DECIMAL month totals (exact), so the
    running values are order-independent-exact too; only the final
    projection casts to double."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            "o_orderpriority",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("__m"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "o_orderpriority",
        "month",
        F.col("__m").cast("double").alias("month_total"),
        F.sum("__m").over(w).cast("double").alias("running_total"),
    )


# --- §2C exact percentiles (quantile aggregate coverage) -------------
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles of order totals per status —
    Spark `percentile` vs DuckDB `quantile_cont`. Both interpolate at
    rank (n-1)*p; the two engines phrase the interpolation differently
    (convex combination vs offset form), so results can differ in the
    last ulp — round(4) absorbs that, same policy as PageRank's
    round(6)."""
    o = load_table(spark, sf_dir, "orders")
    q = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    return (
        o.groupBy("o_orderstatus")
        .agg(q.alias("__q"), F.count("*").cast("bigint").alias("n"))
        .select(
            "o_orderstatus",
            F.round(F.col("__q")[0], 4).alias("p25"),
            F.round(F.col("__q")[1], 4).alias("p50"),
            F.round(F.col("__q")[2], 4).alias("p75"),
            "n",
        )
    )


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch quantiles with a bounds-style oracle (the approx-agg
    policy of rel_approx_distinct): percentile_approx's
    Greenwald-Khanna sketch is engine-specific, so the checkable
    claims are the exact quantiles plus within-relative-tolerance
    booleans. accuracy=1000 bounds rank error at n/1000; the 2%
    VALUE tolerance is ~20x the observed error on this distribution.
    The sketch is the 100 TB path: one pass, bounded memory per
    group, no sort — `percentile` (exact) needs the full value
    multiset per group."""
    o = load_table(spark, sf_dir, "orders")
    ex = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    ap = F.expr(
        "percentile_approx(o_totalprice, array(0.25, 0.5, 0.75), 1000)"
    )
    tol = 0.02
    agg = o.groupBy("o_orderstatus").agg(
        ex.alias("__ex"), ap.alias("__ap"),
        F.count("*").cast("bigint").alias("n"),
    )
    within = [
        (
            F.abs(F.col("__ap")[i] - F.col("__ex")[i])
            <= tol * F.abs(F.col("__ex")[i])
        ).alias(name)
        for i, name in enumerate(
            ("p25_within_2pct", "p50_within_2pct", "p75_within_2pct")
        )
    ]
    return agg.select(
        "o_orderstatus",
        F.round(F.col("__ex")[0], 4).alias("p25_exact"),
        F.round(F.col("__ex")[1], 4).alias("p50_exact"),
        F.round(F.col("__ex")[2], 4).alias("p75_exact"),
        *within,
        "n",
    )


# --- §2C scalar-average anti-join (TPC-H Q22 shape) ------------------
def sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: customers with above-average positive balance and
    no orders, grouped by nation. The scalar AVG subquery becomes a
    one-row broadcast; the boundary uses the exact cross-multiplied
    decimal form `bal * n > sum` so no float average can flip it.
    'No orders' means no OPEN orders (the fixture's every customer has
    historical orders)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("__s"),
        F.count("*").cast("bigint").alias("__n"),
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("__n") > F.col("__s"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("c_nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            .alias("totacctbal"),
        )
    )


def returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: top-20 customers by revenue lost to returned items
    in 1995Q4 (inside the fixture's 1995-2001 date range), the
    returned-item reporting query — completing
    the TPC-H pattern set. Revenue folds in exact DECIMAL before the
    double cast, and the top-20 boundary is totally ordered by
    (revenue DESC, custkey), so the LIMIT cut is deterministic
    cross-engine."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-10-01")
                & (F.col("o_orderdate") < "1996-01-01")
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            "n_name",
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return rev.orderBy(F.col("revenue").desc(), "c_custkey").limit(20)


def pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): per customer nation, order counts and
    revenue spread across the order-status domain as COLUMNS —
    Spark's ``groupBy().pivot()`` with the pivot values given
    EXPLICITLY (['F','O','P']), which is the scale-correct form: an
    unspecified pivot triggers a driver-side distinct scan over the
    full table to discover the domain before planning. With the
    domain literal, the pivot compiles to one hash-agg of conditional
    aggregates — exactly the CASE-WHEN shape the oracle writes by
    hand, and shuffle-equivalent to a plain groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    )
    wide = (
        j.groupBy(F.col("c_nationkey").cast("bigint").alias("nation"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            # count(*) is rejected inside pivot; count(lit(1)) is the
            # same aggregate
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("rev"),
        )
    )
    return wide.select(
        "nation",
        F.coalesce("F_n", F.lit(0)).alias("f_n"),
        F.coalesce("F_rev", F.lit(0.0)).alias("f_rev"),
        F.coalesce("O_n", F.lit(0)).alias("o_n"),
        F.coalesce("O_rev", F.lit(0.0)).alias("o_rev"),
        F.coalesce("P_n", F.lit(0)).alias("p_n"),
        F.coalesce("P_rev", F.lit(0.0)).alias("p_rev"),
    )


def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide pivot result back to long
    (nation, status, n) rows via DataFrame.unpivot — the inverse
    reshape, all projection (no shuffle beyond the pivot's own agg).
    The oracle is the direct long-form aggregate, so the pair pins
    pivot->unpivot as a lossless round-trip."""
    wide = pivot_status_by_nation(spark, sf_dir)
    return (
        wide.unpivot(
            "nation",
            ["f_n", "o_n", "p_n"],
            "status",
            "n",
        )
        .select(
            "nation",
            F.upper(F.substring("status", 1, 1)).alias("status"),
            F.col("n").cast("bigint").alias("n"),
        )
        .filter(F.col("n") > 0)
    )


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator (functions/ranking.skyline2d
    — Borzsony et al. ICDE 2001) over part: the parts where no other
    part is both cheaper-or-equal (p_retailprice) and
    larger-or-equal (p_size) with at least one strict — 'best
    price-for-size' candidates. The engine side is the banded
    prefix-max factorization (hash-aggs + band-partitioned window +
    broadcast band offsets, no self-join over the data, no global
    window); the oracle states the quadratic NOT EXISTS definition
    directly, so a green row proves the factorization IS the
    definition."""
    from ..functions.ranking import skyline2d

    part = load_table(spark, sf_dir, "part")
    return skyline2d(part, "p_retailprice", "p_size").select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("bigint").alias("p_size"),
    )


def bloom_prejoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning (operators/bloom.py): orders revenue
    per month restricted to BUILDING-segment customers. The Spark
    side builds the bitmap from the ~1/5-selective customer keys and
    prunes the orders scan MAP-SIDE (h broadcast word-table joins, no
    fact shuffle) before the exact join; the oracle states the plain
    join — identical results because bloom pruning has no false
    negatives and the exact join removes false positives. The prune
    is the 100 TB point: only matching orders (+ ~1e-3 FPs) reach
    the join exchange."""
    from ..operators.bloom import bloom_prejoin

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    j = bloom_prejoin(orders, cust, "o_custkey", "c_custkey")
    return (
        j.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("total_price"),
        )
    )


def trailing_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame — the one frame kind the catalog's
    other windows don't exercise (ROWS frames count rows; RANGE
    frames bound by VALUE distance): per order, the customer's
    trailing-30-day revenue, frame = RANGE [now-30d, now] over epoch
    seconds. Peers with equal order dates all enter each other's
    frames, so the result is tie-insensitive by construction (no
    tiebreak needed — the frame, not the order, defines membership).
    Customer-partitioned (never global); sums ride DECIMAL(18,2),
    cast to double at the end."""
    o = load_table(spark, sf_dir, "orders")
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; the session
    # timezone is pinned UTC so unix_timestamp IS the epoch.
    sec = F.unix_timestamp(F.col("o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(sec)
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d"),
    )


def price_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window DISTRIBUTION functions — percent_rank and cume_dist,
    the two ANSI window kinds the catalog's rank/ntile/lead windows
    don't cover: where each part's price sits within its brand
    (brand-partitioned, never global; both functions are exact
    rationals with one division, round6; price ties get equal values
    by definition so no tiebreak is needed)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    return p.select(
        "p_partkey",
        "p_brand",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


def cdc_orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff (operators/cdc.table_diff): classify every
    order key across two table versions as inserted / deleted /
    updated / unchanged with a changed-column mask, then census by
    (change_type, changed_cols) with the exact net price movement —
    the warehouse-sync audit every incremental materialization needs
    (the relational twin of g_snapshot_diff). Version 2 is derived
    from orders by md5-deterministic mutations both engines replay
    identically: 3% deleted, 10% price +1.00, 5% repriority to
    '9-CDC', 2% cloned under a shifted key (inserts). One key-equi
    full-outer join (co-partitioned SMJ at scale), map-side
    classification, census output; price arithmetic rides
    DECIMAL(18,2) so sums are order-free exact, cast to double at
    the very end."""
    from ..operators.cdc import table_diff

    orders = load_table(spark, sf_dir, "orders")

    def h(salt: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"), F.lit(salt)
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")

    cols = ["o_orderstatus", "o_totalprice", "o_orderpriority"]
    survivors = orders.filter(h(":cdc_del") >= 1966)
    mutated = survivors.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            h(":cdc_upd") < 6554, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(h(":cdc_pri") < 3277, F.lit("9-CDC"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    inserted = survivors.filter(h(":cdc_ins") < 1311).select(
        (F.col("o_orderkey") + F.lit(100000000000)).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    v2 = mutated.unionByName(inserted)
    d = table_diff(orders, v2, ["o_orderkey"], cols)
    dec = "decimal(18,2)"
    return (
        d.groupBy("change_type", "changed_cols")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(
                F.coalesce(
                    F.col("new_o_totalprice").cast(dec), F.lit(0).cast(dec)
                )
                - F.coalesce(
                    F.col("old_o_totalprice").cast(dec), F.lit(0).cast(dec)
                )
            )
            .cast("double")
            .alias("price_delta"),
        )
    )


def ivm_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the delta-join
    identity ns_incremental_agg proves for aggregates, proven here
    for the orders⋈customer enrichment view: instead of re-joining
    the new table version, the ENGINE maintains the old view with the
    CDC delta (drop deleted/updated keys via one anti-join, join only
    the upserted rows — O(|delta|) join work, the whole point when
    the base view is 100 TB and the delta is a day's changes). The
    delta is the same md5-deterministic mutation set as rel_cdc_diff;
    the ORACLE computes the view directly on the mutated table, so a
    hash match IS the maintenance-equals-recompute theorem for this
    view. Output: the maintained view keyed by order. The CATALOG
    entry wraps this in ivm_join_receipt — a maintained 100 TB view
    is written, not collected, so its cross-engine receipt must be
    O(1), and the full-view row equality lives in a sf0.001 unit
    test (r9 VERDICT item 1)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )

    def h(salt: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"), F.lit(salt)
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")

    base = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "o_custkey", "c_nationkey", "o_totalprice")

    # CDC delta (same generator as rel_cdc_diff): deletions, updated
    # rows (new values), and inserted clones under shifted keys.
    deleted_keys = orders.filter(h(":cdc_del") < 1966).select(
        "o_orderkey"
    )
    survivors = orders.filter(h(":cdc_del") >= 1966)
    updated = survivors.filter(h(":cdc_upd") < 6554).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
    )
    inserted = survivors.filter(h(":cdc_ins") < 1311).select(
        (F.col("o_orderkey") + F.lit(100000000000)).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    upserts = updated.unionByName(inserted)
    stale = deleted_keys.unionByName(updated.select("o_orderkey"))
    maintained = (
        base.join(stale, ["o_orderkey"], "left_anti")
        .unionByName(
            upserts.join(
                customer, upserts.o_custkey == customer.c_custkey
            ).select(
                "o_orderkey", "o_custkey", "c_nationkey", "o_totalprice"
            )
        )
        .select(
            "o_orderkey",
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            "o_totalprice",
        )
    )
    return maintained


def ivm_join_receipt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded receipt over the maintained join view (r9 VERDICT item
    1, dtype fixed per r10 VERDICT item 1): ``(n_rows, checksum_hi,
    checksum_lo)`` where the two checksum words are SUMs of the high
    24 and low 24 bits of a per-row 48-bit md5 fingerprint over the
    row's canonical integer form ``orderkey:nationkey:price_cents``
    — order-insensitive, computed entirely executor-side (three
    map-combinable aggregates), so the driver receives ONE row no
    matter how big the base view is. Exactness: cents =
    floor(price*100 + 0.5) uses only correctly-rounded IEEE ops
    (DESIGN.md float policy); each word sums n 24-bit values, which
    BIGINT holds exactly past 5e11 rows per word — and BIGINT (unlike
    the r10 DECIMAL(38,0) spelling, whose ~2^61 totals one harness
    float64-round-tripped into 2084523696445190144) survives any
    int64-preserving normalization. All wider arithmetic stays
    internal. The oracle replays the fingerprint from the direct
    recompute of the view on the mutated table: a two-word checksum
    match at equal n_rows IS the maintenance-equals-recompute
    theorem, with O(1) transfer instead of the r9 collected 2.37M
    rows (x16 bench ratio 6.15 was pure driver deserialization;
    compute-only was 1.3)."""
    v = ivm_join_maintenance(spark, sf_dir)
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("o_orderkey").cast("string"),
                    F.col("c_nationkey").cast("string"),
                    cents.cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    zero = F.lit(0).cast("bigint")
    return v.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(F.shiftright(fp, 24)), zero)
        .cast("bigint")
        .alias("checksum_hi"),
        F.coalesce(F.sum(fp.bitwiseAND(F.lit(0xFFFFFF))), zero)
        .cast("bigint")
        .alias("checksum_lo"),
    )


ENTRIES: dict[str, QueryDef] = {
    "rel_ivm_join": QueryDef(
        ivm_join_receipt,
        """
        WITH h AS (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || ':cdc_del'), 1, 4))::BIGINT AS hdel,
                 ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || ':cdc_upd'), 1, 4))::BIGINT AS hupd,
                 ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || ':cdc_ins'), 1, 4))::BIGINT AS hins
          FROM orders),
        v2 AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN hupd < 6554 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice
          FROM h WHERE hdel >= 1966
          UNION ALL
          SELECT o_orderkey + 100000000000, o_custkey, o_totalprice
          FROM h WHERE hdel >= 1966 AND hins < 1311
        ),
        view_rows AS (
          SELECT v2.o_orderkey,
                 CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
                 v2.o_totalprice
          FROM v2 JOIN customer c ON c.c_custkey = v2.o_custkey
        ),
        fp_rows AS (
          SELECT ('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || ':'
                   || CAST(c_nationkey AS VARCHAR) || ':'
                   || CAST(CAST(floor(o_totalprice * 100.0 + 0.5)
                           AS BIGINT) AS VARCHAR)
                 ), 1, 12))::BIGINT AS fp
          FROM view_rows
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(sum(fp >> 24), 0) AS BIGINT)
                 AS checksum_hi,
               CAST(COALESCE(sum(fp & 16777215), 0) AS BIGINT)
                 AS checksum_lo
        FROM fp_rows
        """,
    ),
    "rel_trailing_window": QueryDef(
        trailing_window_revenue,
        """
        SELECT o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_30d
        FROM orders
        """,
    ),
    "rel_rank_distribution": QueryDef(
        price_rank_distribution,
        """
        SELECT p_partkey, p_brand,
               round(percent_rank() OVER (
                 PARTITION BY p_brand ORDER BY p_retailprice),
                 6) AS price_pct_rank,
               round(cume_dist() OVER (
                 PARTITION BY p_brand ORDER BY p_retailprice),
                 6) AS price_cume_dist
        FROM part
        """,
    ),
    "rel_cdc_diff": QueryDef(
        cdc_orders_diff,
        """
        WITH h AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice,
                 o_orderpriority,
                 ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || ':cdc_del'), 1, 4))::BIGINT AS hdel,
                 ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || ':cdc_upd'), 1, 4))::BIGINT AS hupd,
                 ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || ':cdc_pri'), 1, 4))::BIGINT AS hpri,
                 ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || ':cdc_ins'), 1, 4))::BIGINT AS hins
          FROM orders),
        v2 AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN hupd < 6554 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice,
                 CASE WHEN hpri < 3277 THEN '9-CDC'
                      ELSE o_orderpriority END AS o_orderpriority
          FROM h WHERE hdel >= 1966
          UNION ALL
          SELECT o_orderkey + 100000000000, o_orderstatus,
                 o_totalprice, o_orderpriority
          FROM h WHERE hdel >= 1966 AND hins < 1311
        ),
        o1 AS (SELECT o_orderkey AS k1, TRUE AS op,
                      o_orderstatus AS s1, o_totalprice AS p1,
                      o_orderpriority AS r1
               FROM orders),
        n1 AS (SELECT o_orderkey AS k2, TRUE AS np,
                      o_orderstatus AS s2, o_totalprice AS p2,
                      o_orderpriority AS r2
               FROM v2),
        j AS (
          SELECT op, np, s1, p1, r1, s2, p2, r2,
                 concat_ws(',',
                   CASE WHEN r1 IS DISTINCT FROM r2
                        THEN 'o_orderpriority' END,
                   CASE WHEN s1 IS DISTINCT FROM s2
                        THEN 'o_orderstatus' END,
                   CASE WHEN p1 IS DISTINCT FROM p2
                        THEN 'o_totalprice' END) AS mask
          FROM o1 FULL OUTER JOIN n1 ON o1.k1 = n1.k2
        )
        SELECT CASE WHEN op IS NULL THEN 'inserted'
                    WHEN np IS NULL THEN 'deleted'
                    WHEN mask <> '' THEN 'updated'
                    ELSE 'unchanged' END AS change_type,
               CASE WHEN op IS NULL OR np IS NULL THEN ''
                    ELSE mask END AS changed_cols,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(coalesce(CAST(p2 AS DECIMAL(18,2)),
                                 CAST(0 AS DECIMAL(18,2)))
                        - coalesce(CAST(p1 AS DECIMAL(18,2)),
                                   CAST(0 AS DECIMAL(18,2))))
                    AS DOUBLE) AS price_delta
        FROM j GROUP BY 1, 2
        """,
    ),
    "rel_bloom_prejoin": QueryDef(
        bloom_prejoin_revenue,
        """
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                 AS order_month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY 1
        """,
    ),
    "rel_skyline_parts": QueryDef(
        skyline_parts,
        """
        SELECT CAST(a.p_partkey AS BIGINT) AS p_partkey,
               CAST(a.p_retailprice AS DOUBLE) AS p_retailprice,
               CAST(a.p_size AS BIGINT) AS p_size
        FROM part a
        WHERE NOT EXISTS (
          SELECT 1 FROM part b
          WHERE b.p_retailprice <= a.p_retailprice
            AND b.p_size >= a.p_size
            AND (b.p_retailprice < a.p_retailprice
                 OR b.p_size > a.p_size))
        """,
    ),
    "rel_returned_items": QueryDef(
        returned_item_ranking,
        """
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1995-10-01' AND o_orderdate < '1996-01-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
    ),
    "rel_unpivot_status": QueryDef(
        unpivot_status_counts,
        """
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
               o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
        """,
    ),
    "rel_pivot_status": QueryDef(
        pivot_status_by_nation,
        """
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
          CAST(coalesce(count(*) FILTER (o_orderstatus = 'F'), 0)
            AS BIGINT) AS f_n,
          CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (o_orderstatus = 'F'), 0) AS DOUBLE) AS f_rev,
          CAST(coalesce(count(*) FILTER (o_orderstatus = 'O'), 0)
            AS BIGINT) AS o_n,
          CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (o_orderstatus = 'O'), 0) AS DOUBLE) AS o_rev,
          CAST(coalesce(count(*) FILTER (o_orderstatus = 'P'), 0)
            AS BIGINT) AS p_n,
          CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (o_orderstatus = 'P'), 0) AS DOUBLE) AS p_rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
        """,
    ),
    "etl_filter_open_orders": QueryDef(
        filter_open_orders,
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
        """,
    ),
    "etl_role_permission_inversion": QueryDef(
        role_permission_inversion,
        """
        SELECT p_type AS permission,
               string_agg(DISTINCT p_brand, ',' ORDER BY p_brand) AS roles,
               CAST(count(DISTINCT p_brand) AS BIGINT) AS n_roles
        FROM part GROUP BY p_type
        """,
    ),
    "etl_member_parse": QueryDef(
        member_parse,
        """
        WITH m AS (
          SELECT CASE WHEN c_custkey % 10 = 0 THEN 'allUsers'
                      ELSE 'user:' || c_name END AS member
          FROM customer
        ),
        parsed AS (
          SELECT member,
                 CASE WHEN len(string_split(member, ':')) >= 2
                      THEN string_split(member, ':')[1]
                      ELSE 'pseudoGroup' END AS member_type,
                 CASE WHEN len(string_split(member, ':')) >= 2
                      THEN string_split(member, ':')[2]
                      ELSE string_split(member, ':')[1] END AS principal
          FROM m
        )
        SELECT member_type, CAST(count(*) AS BIGINT) AS n,
               min(principal) AS min_principal
        FROM parsed GROUP BY member_type
        """,
    ),
    "rel_pricing_summary": QueryDef(
        pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               AS DECIMAL(38,6))
               * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))
               AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
          CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
    ),
    "rel_top_customers": QueryDef(
        top_customers,
        """
        SELECT c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
        """,
    ),
    "rel_top_order_per_customer": QueryDef(
        top_order_per_customer,
        """
        SELECT CAST(o_custkey AS BIGINT) AS custkey,
               CAST(o_orderkey AS BIGINT) AS top_orderkey,
               CAST(o_totalprice AS DOUBLE) AS top_price
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1
        """,
    ),
    "rel_rollup_returns": QueryDef(
        rollup_returns,
        """
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        HAVING count(*) > 0
        """,
    ),
    "rel_division": QueryDef(
        customers_all_priorities,
        """
        SELECT c_name FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) p
          WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = p.o_orderpriority))
          AND EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey)
        ORDER BY c_name
        """,
    ),
    "rel_nation_presence": QueryDef(
        nation_presence_full_outer,
        """
        WITH cn AS (
          SELECT c_nationkey AS k, count(*) AS n_customers
          FROM customer GROUP BY 1),
        sn AS (
          SELECT s_nationkey AS k, count(*) AS n_suppliers
          FROM supplier GROUP BY 1)
        SELECT CAST(coalesce(cn.k, sn.k) AS BIGINT) AS nationkey,
               CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
               CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers
        FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
        """,
    ),
    "rel_customers_without_orders": QueryDef(
        customers_without_orders,
        """
        SELECT c_name FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        """,
    ),
    "rel_orders_per_month": QueryDef(
        orders_per_month,
        """
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1
        """,
    ),
    "rel_part_name_tokens": QueryDef(
        part_name_tokens,
        """
        SELECT string_split(p_name, ' ')[1] AS first_word,
               CAST(count(*) AS BIGINT) AS n
        FROM part GROUP BY 1
        """,
    ),
    "rel_event_props_json": QueryDef(
        event_props_json,
        """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_max,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
        """,
    ),
    "rel_shipping_priority": QueryDef(
        shipping_priority,
        """
        SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
               o_orderdate AS orderdate,
               CAST(rev AS DOUBLE) AS revenue
        FROM (
          SELECT l_orderkey, o_orderdate,
                 sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                   AS DECIMAL(38,6))) AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_orderkey, o_orderdate
        )
        ORDER BY rev DESC, orderkey LIMIT 10
        """,
    ),
    "rel_forecast_revenue": QueryDef(
        forecast_revenue,
        """
        SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,6)))
               AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
        """,
    ),
    "etl_nested_collect_explode": QueryDef(
        nested_collect_explode,
        """
        SELECT CAST(l_partkey AS BIGINT) AS partkey,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
        """,
    ),
    "rel_customers_in_both_statuses": QueryDef(
        customers_in_both_statuses,
        """
        SELECT CAST(count(*) AS BIGINT) AS n_customers FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        """,
    ),
    "rel_cube_returns": QueryDef(
        cube_returns,
        """
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        HAVING count(*) > 0
        """,
    ),
    "rel_approx_distinct": QueryDef(
        approx_distinct_parts,
        """
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
               TRUE AS parts_within_10pct,
               TRUE AS supps_within_10pct
        FROM lineitem
        """,
    ),
    "rel_trade_volume": QueryDef(
        trade_volume,
        """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2)))
                 AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE l_shipdate BETWEEN '1995-01-01' AND '1996-12-31'
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
        """,
    ),
    "rel_market_share": QueryDef(
        market_share,
        """
        WITH tn AS (SELECT min(n_name) AS tn FROM nation),
        tr AS (
          SELECT r_name AS tr FROM nation
          JOIN region ON n_regionkey = r_regionkey, tn
          WHERE n_name = tn.tn
        ),
        region_nations AS (
          SELECT n_nationkey, n_name FROM nation
          JOIN region ON n_regionkey = r_regionkey, tr
          WHERE r_name = tr.tr
        ),
        scored AS (
          SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(38,6)) AS rev,
            CASE WHEN rn.n_name = tn.tn THEN
              CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,6))
            ELSE CAST(0 AS DECIMAL(38,6)) END AS tn_rev
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN region_nations rn ON s_nationkey = rn.n_nationkey, tn
        )
        SELECT l_year,
               round(CAST(sum(tn_rev) AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
        FROM scored GROUP BY l_year
        """,
    ),
    "rel_priority_returns": QueryDef(
        priority_with_returns,
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """,
    ),
    "rel_supplier_part_classes": QueryDef(
        supplier_part_classes,
        """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM ps JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> (SELECT min(p_brand) FROM part)
        GROUP BY 1, 2
        """,
    ),
    "rel_top_supplier": QueryDef(
        top_supplier,
        """
        WITH r AS (
          SELECT l_suppkey,
            sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(38,6))) AS tr
          FROM lineitem
          WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-03-31'
          GROUP BY l_suppkey
        )
        SELECT s_name, CAST(tr AS DOUBLE) AS total_revenue
        FROM r JOIN supplier ON l_suppkey = s_suppkey
        WHERE tr = (SELECT max(tr) FROM r)
        """,
    ),
    "rel_grouping_sets": QueryDef(grouping_sets_returns, _GROUPING_SETS_SQL),
    "rel_late_shipments": QueryDef(
        late_shipments,
        """
        SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1
        """,
    ),
    "rel_customer_distribution": QueryDef(
        customer_order_distribution,
        """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN (
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderstatus <> 'P'
          ) ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) GROUP BY c_count
        """,
    ),
    "rel_promo_revenue": QueryDef(
        promo_revenue,
        """
        SELECT round(
          100.0
          * CAST(sum(CASE WHEN p_type = 'PROMO'
              THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,6))
              ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
          / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,6)))
              AS DOUBLE),
          6) AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
        """,
    ),
    "rel_small_qty_revenue": QueryDef(
        small_qty_revenue,
        """
        WITH eco AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem
          WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
        ),
        per_part AS (
          SELECT l_partkey AS pk,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                 CAST(count(*) AS BIGINT) AS cq
          FROM eco GROUP BY 1
        )
        SELECT round(
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
          2) AS avg_yearly
        FROM eco JOIN per_part ON l_partkey = pk
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq
        """,
    ),
    "rel_large_volume_customers": QueryDef(
        large_volume_customers,
        """
        WITH big AS (
          SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
          FROM lineitem GROUP BY 1 HAVING sq > 300
        )
        SELECT c_name, CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(sq AS DOUBLE) AS sum_qty
        FROM big JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        """,
    ),
    "rel_discounted_revenue": QueryDef(
        discounted_revenue,
        """
        SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_type = 'SMALL' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_type = 'MEDIUM' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_type = 'LARGE' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 50)
        """,
    ),
    "rel_waiting_suppliers": QueryDef(
        waiting_suppliers,
        """
        WITH lines AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ),
        per_order AS (
          SELECT l_orderkey AS ok,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
          FROM lines GROUP BY 1
        ),
        waiting AS (
          SELECT DISTINCT l_suppkey, l_orderkey
          FROM lines JOIN per_order ON l_orderkey = ok
          WHERE late AND n_supp > 1 AND n_late = 1
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM waiting JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        """,
    ),
    "rel_running_revenue": QueryDef(
        running_revenue,
        """
        WITH monthly AS (
          SELECT o_orderpriority,
                 CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                   AS month,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
          FROM orders GROUP BY 1, 2
        )
        SELECT o_orderpriority, month,
               CAST(m AS DOUBLE) AS month_total,
               CAST(sum(m) OVER (
                 PARTITION BY o_orderpriority ORDER BY month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS running_total
        FROM monthly
        """,
    ),
    "rel_price_quantiles": QueryDef(
        price_quantiles,
        """
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus
        """,
    ),
    "rel_approx_quantiles": QueryDef(
        approx_quantiles,
        """
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.25), 4) AS p25_exact,
               round(quantile_cont(o_totalprice, 0.50), 4) AS p50_exact,
               round(quantile_cont(o_totalprice, 0.75), 4) AS p75_exact,
               TRUE AS p25_within_2pct,
               TRUE AS p50_within_2pct,
               TRUE AS p75_within_2pct,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus
        """,
    ),
    "rel_sales_opportunity": QueryDef(
        sales_opportunity,
        """
        WITH stats AS (
          SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM customer WHERE c_acctbal > 0
        )
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS totacctbal
        FROM customer, stats
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
          AND c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        GROUP BY 1
        """,
    ),
    "rel_revenue_by_nation": QueryDef(
        revenue_by_nation,
        """
        SELECT n_name,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    ),
}
