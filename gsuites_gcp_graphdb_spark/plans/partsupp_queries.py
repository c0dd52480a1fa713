"""Derived-partsupp query family: the four TPC-H shapes (Q2, Q9,
Q11, Q20) that need a part-supplier relation, which the slimmed
fixture does not ship. We derive one deterministically instead of
synthesizing new data: partsupp := the DISTINCT (l_partkey,
l_suppkey) pairs actually observed in lineitem, with integer-exact
synthetic attributes that are pure functions of the keys —

    ps_availqty          = (partkey*7  + suppkey*11) % 9999  + 1
    ps_supplycost_cents  = (partkey*131 + suppkey*29) % 100000 + 100

Both BIGINT, so every oracle below hash-matches DuckDB without any
float discipline; money stays in integer cents until the final
cast-to-double (DESIGN.md §4). With these four shapes the catalog
covers all 22 TPC-H query patterns (adapted to the fixture).

Scale notes (100 TB): the derivation is one projection + one
map-combinable dropDuplicates on a 2-column key — the narrowest
possible shuffle (PROGRESS lesson: never dropDuplicates full rows).
Q2/Q11/Q20 then join partsupp against broadcast-sized dimension
scalars; Q9 is the classic star join where part/supplier/nation
broadcast and lineitem never shuffles before its aggregate.

Reference parity: the reference's Go ETL has no relational surface
(it emits Gremlin), so these map to SURVEY.md §2C "joins /
aggregations / correlated-subquery shapes" checklist rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.fixtures import load_table
from .base import QueryDef

DEC = "decimal(18,2)"
DEC_HI = "decimal(38,6)"


def derive_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp relation (module docstring). Projects to
    the 2 join keys BEFORE dropDuplicates so the dedup shuffle carries
    16 bytes/row, then computes attributes map-side (no extra pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    pk, sk = F.col("ps_partkey"), F.col("ps_suppkey")
    return (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .dropDuplicates()
        .withColumn("ps_availqty", (pk * 7 + sk * 11) % 9999 + 1)
        .withColumn(
            "ps_supplycost_cents", (pk * 131 + sk * 29) % 100000 + 100
        )
    )


# SQL fragment: the DuckDB twin of derive_partsupp, shared by all four
# oracles below (kept literally in sync with the Spark expressions).
PARTSUPP_SQL = """
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1
               AS ps_availqty,
             (ps_partkey * 131 + ps_suppkey * 29) % 100000 + 100
               AS ps_supplycost_cents
      FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                            l_suppkey AS ps_suppkey FROM lineitem)
    )
"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped: for every smallest-size part, the supplier(s) in the
    min region offering the minimum supply cost. TPC-H writes this as
    a correlated scalar subquery; Spark-first it's a window MIN over
    the (part) partition followed by an exact integer equality — no
    correlated re-scan, one shuffle on ps_partkey. Region/nation/
    supplier dims broadcast."""
    ps = derive_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region")

    min_region = region.agg(F.min("r_regionkey").alias("__rk"))
    min_size = part.agg(F.min("p_size").alias("__sz"))
    supp_in_region = (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(min_region), F.col("n_regionkey") == F.col("__rk"))
        .select("s_suppkey", "s_name")
    )
    eligible = (
        ps.join(F.broadcast(supp_in_region), ps.ps_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(
                part.join(
                    F.broadcast(min_size), part.p_size == F.col("__sz")
                ).select("p_partkey", "p_name")
            ),
            ps.ps_partkey == F.col("p_partkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn(
            "__min_cost", F.min("ps_supplycost_cents").over(w)
        )
        .filter(F.col("ps_supplycost_cents") == F.col("__min_cost"))
        .select(
            F.col("ps_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier"),
            F.col("ps_supplycost_cents").alias("supplycost_cents"),
        )
    )


MIN_COST_SUPPLIER_SQL = f"""
    WITH {PARTSUPP_SQL.strip()},
    supp_in_region AS (
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = (SELECT min(r_regionkey) FROM region)
    ),
    eligible AS (
      SELECT ps.ps_partkey, p.p_name, s.s_name, ps.ps_supplycost_cents
      FROM partsupp ps
      JOIN supp_in_region s ON ps.ps_suppkey = s.s_suppkey
      JOIN part p ON ps.ps_partkey = p.p_partkey
      WHERE p.p_size = (SELECT min(p_size) FROM part)
    )
    SELECT ps_partkey AS partkey, p_name AS part_name,
           s_name AS supplier, ps_supplycost_cents AS supplycost_cents
    FROM (
      SELECT *, min(ps_supplycost_cents)
                  OVER (PARTITION BY ps_partkey) AS mc
      FROM eligible
    ) WHERE ps_supplycost_cents = mc
"""


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: profit = revenue - supply cost, by supplier nation
    and order year, for parts whose name contains 'red'. Star join:
    part (filtered, broadcast), supplier+nation (broadcast), orders
    (key-projected) — lineitem shuffles once, for the final group-by.
    Money: 100*price*(1-disc) and cents*qty are both exact DECIMAL;
    the /100 happens once, in double, after the exact sum."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = derive_partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    qty = F.col("l_quantity").cast(DEC)
    amount_cents = (
        (price * (F.lit(1).cast(DEC) - disc) * 100).cast(DEC_HI)
        - (F.col("ps_supplycost_cents").cast(DEC) * qty).cast(DEC_HI)
    ).cast(DEC_HI)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey)
            & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_year").cast("bigint").alias("o_year"),
        )
        .agg(
            (F.sum(amount_cents).cast("double") / F.lit(100.0)).alias(
                "profit"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


PROFIT_BY_NATION_YEAR_SQL = f"""
    WITH {PARTSUPP_SQL.strip()}
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) * 100
               - ps_supplycost_cents
                 * CAST(l_quantity AS DECIMAL(18,2))
             AS DECIMAL(38,6))) AS DOUBLE) / 100.0 AS profit,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
    JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
"""


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: parts whose stock value at min-nation suppliers
    exceeds 1/10000 of the total. The TPC-H HAVING compares against a
    scalar subquery; here the total is a one-row broadcast cross-join
    and the threshold is cross-multiplied (10000 * part_value >
    total_value) so everything stays BIGINT-exact — no float
    fraction, no decimal division (DESIGN.md §13)."""
    ps = derive_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    min_nation = nation.agg(F.min("n_nationkey").alias("__nk"))
    supp_in_nation = supp.join(
        F.broadcast(min_nation), supp.s_nationkey == F.col("__nk")
    ).select("s_suppkey")
    value = F.col("ps_supplycost_cents") * F.col("ps_availqty")
    scoped = ps.join(
        F.broadcast(supp_in_nation), ps.ps_suppkey == F.col("s_suppkey")
    ).select("ps_partkey", value.alias("__v"))
    per_part = scoped.groupBy("ps_partkey").agg(
        F.sum("__v").alias("value_cents")
    )
    total = scoped.agg(F.sum("__v").alias("__total"))
    return (
        per_part.join(
            F.broadcast(total),
            per_part.value_cents * 10000 > F.col("__total"),
        )
        .select(
            F.col("ps_partkey").alias("partkey"),
            F.col("value_cents").cast("bigint").alias("value_cents"),
        )
    )


IMPORTANT_STOCK_SQL = f"""
    WITH {PARTSUPP_SQL.strip()},
    scoped AS (
      SELECT ps_partkey,
             ps_supplycost_cents * ps_availqty AS v
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      WHERE s_nationkey = (SELECT min(n_nationkey) FROM nation)
    )
    SELECT ps_partkey AS partkey, CAST(sum(v) AS BIGINT) AS value_cents
    FROM scoped
    GROUP BY ps_partkey
    HAVING sum(v) * 10000 > (SELECT sum(v) FROM scoped)
"""


def excess_availability_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q20-shaped: suppliers holding more than half a year's shipped
    quantity of some part they supply (1996 window). The TPC-H
    nested EXISTS chain becomes: aggregate lineitem once on
    (partkey, suppkey), inner-join partsupp on the same composite
    key, compare 2*availqty > sum_qty in exact DECIMAL, then a
    distinct-suppkey semi join. No correlated re-execution; the only
    shuffles are the lineitem aggregate and its join with partsupp
    (co-partitioned on the same composite key, so AQE plans SMJ
    without an extra exchange)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("__qty")
    )
    ps = derive_partsupp(spark, sf_dir)
    excess = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(
            (F.col("ps_availqty") * 2).cast(DEC) > F.col("__qty")
        )
        .select("ps_suppkey")
        .dropDuplicates()
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.ps_suppkey, "semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
        )
    )


EXCESS_AVAILABILITY_SQL = f"""
    WITH {PARTSUPP_SQL.strip()},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      GROUP BY 1, 2
    ),
    excess AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
      JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      WHERE CAST(ps_availqty * 2 AS DECIMAL(18,2)) > qty
    )
    SELECT s_name AS supplier, n_name AS nation
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
"""


ENTRIES: dict[str, QueryDef] = {
    "rel_min_cost_supplier": QueryDef(
        min_cost_supplier, MIN_COST_SUPPLIER_SQL
    ),
    "rel_profit_by_nation_year": QueryDef(
        profit_by_nation_year, PROFIT_BY_NATION_YEAR_SQL
    ),
    "rel_important_stock": QueryDef(important_stock, IMPORTANT_STOCK_SQL),
    "rel_excess_availability": QueryDef(
        excess_availability_suppliers, EXCESS_AVAILABILITY_SQL
    ),
}
