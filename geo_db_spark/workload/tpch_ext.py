"""Remaining TPC-H query shapes, adapted to the driver's simplified star
schema (TESTDATA.md has no partsupp table and no shipmode/commitdate/
receiptdate/phone columns — partsupp-dependent queries are re-expressed
against lineitem as the supplier-part bridge, and comment/phone
predicates become predicates on columns that exist).

Together with workload/tpch.py this covers every TPC-H query shape the
simplified schema can express: multi-way snowflake joins with
disjunctive nation pairs (q7), market-share conditional ratio (q8),
profit rollup (q9), late-shipment priority counts (q12), outer-join
count distribution (q13), max-revenue view (q15), distinct-supplier
counts with exclusion (q16), correlated per-group average threshold
(q17), OR-of-ANDs pushdown (q19), and anti-join + global scalar
threshold (q22).

Scale notes are per-query docstrings; the blanket rule (VERDICT r1,
tightened in r3): static broadcast hints ONLY on region/nation (truly
bounded: 5/25 rows at every SF) and single-row scalar aggregates. Part,
supplier, and customer all SCALE with SF (the driver's testdata grows
part 200->2k->20k and supplier 10->100->1k across sf0.001/0.01/0.1) —
they get NO hint; AQE promotes them to broadcast at runtime when their
measured size is under the threshold, and falls back to a shuffle join
at cluster scale where a forced broadcast would OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.session import tune
from geo_db_spark.workload.tpch import _one, _pct, _price

_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, both directions,
    by year. Snowflake with TWO nation lookups and a disjunctive
    nation-pair filter. nation is broadcast (25 rows at any sf); the
    lineitem⋈orders fact join is AQE's call."""
    tune(spark)
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") <= _TS("1997-12-31"))
    )
    volume = _price("l_extendedprice") * (_one() - _pct("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_12"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(volume).alias("_v"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.col("_v").cast("double").alias("revenue"),
        )
    )


ORACLE_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11')
      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) t
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue sold into
    AMERICA, by order year. Conditional-sum ratio over a 7-table
    snowflake. The ratio divides two exact DECIMAL sums cast to double —
    one IEEE division, oracle-identical."""
    tune(spark)
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = load(spark, sf_dir, "nation")  # customer side, region-filtered
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01"))
        & (F.col("o_orderdate") <= _TS("1997-12-31"))
    )
    li = load(spark, sf_dir, "lineitem")
    volume = _price("l_extendedprice") * (_one() - _pct("l_discount"))
    nat1 = n1.join(F.broadcast(region), n1.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("n1_key")
    )
    target = F.when(
        F.col("supp_nation") == "NATION_3", volume
    ).otherwise(F.lit(0).cast("decimal(14,2)"))
    out = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat1), cust.c_nationkey == F.col("n1_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(target).alias("_t"), F.sum(volume).alias("_v"))
        .select(
            "o_year",
            (F.col("_t").cast("double") / F.col("_v").cast("double")).alias("mkt_share"),
        )
    )
    return out


ORACLE_Q8 = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
) t
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: no partsupp/supplycost in the schema, so profit
    is the discounted revenue of 'red' parts, rolled up by supplier
    nation and order year."""
    tune(spark)
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    amount = _price("l_extendedprice") * (_one() - _pct("l_discount"))
    return (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).alias("_p"))
        .select("nation", "o_year", F.col("_p").cast("double").alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
"""


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted: no shipmode/commitdate columns — 'late' is a
    ship date more than 60 days after the order date, grouped by
    linestatus (the shipmode stand-in), counting high- vs low-priority
    orders. The date arithmetic stays a pushable column expression."""
    tune(spark)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        joined.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including
    zero-order customers — LEFT OUTER join with a join-side predicate
    (orderstatus, the comment-filter stand-in), double grouping."""
    tune(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: quarterly revenue per supplier, keep the max-revenue
    supplier(s). The scalar max comes from a 1-row aggregate joined back
    (broadcast) — no window over a single global partition, which would
    serialize at scale."""
    tune(spark)
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-04-01"))
        & (F.col("l_shipdate") < _TS("1996-07-01"))
    )
    revenue = _price("l_extendedprice") * (_one() - _pct("l_discount"))
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("_r"))
        .select("l_suppkey", F.col("_r").cast("double").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("_mr"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("_mr"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-04-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: no partsupp — lineitem is the part↔supplier
    bridge. Count distinct suppliers per (brand, type, size) for
    selected sizes, excluding one brand and negative-balance suppliers
    (the customer-complaint stand-in)."""
    tune(spark)
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lineitems whose quantity is under 20% of
    the part's average quantity — the correlated per-part average becomes
    a grouped aggregate joined back on partkey (one shuffle on the
    filtered brand's lineitems, not a per-row subquery)."""
    tune(spark)
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(part, li.l_partkey == part.p_partkey)
    avg_qty = (
        branded.groupBy(F.col("l_partkey").alias("_pk"))
        .agg(
            (
                F.sum(_price("l_quantity")).cast("double") / F.count(F.lit(1))
            ).alias("_avg")
        )
    )
    return (
        branded.join(avg_qty, branded.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg"))
        .agg(
            (F.sum(_price("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


ORACLE_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS _pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS _avg
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#11'
  GROUP BY l_partkey
) a ON l_partkey = _pk
WHERE p_brand = 'Brand#11'
  AND l_quantity < 0.2 * _avg
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs over part attributes and lineitem quantity.
    The disjunction is a single residual filter after one broadcast join
    — Catalyst pushes the common l_quantity bound into the scan."""
    tune(spark)
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    revenue = _price("l_extendedprice") * (_one() - _pct("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(revenue).alias("_r"))
        .select(F.col("_r").cast("double").alias("revenue"))
    )


ORACLE_Q19 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: no phone column — the country-code filter
    becomes a nationkey list, and "never ordered" becomes "no order since
    1999" (every synthetic customer has some order). Customers with
    above-average positive balance and no recent orders: global scalar
    threshold (1-row aggregate, broadcast) + anti-join, grouped by
    nation."""
    tune(spark)
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(3, 5, 7, 11, 13, 17, 19)
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _TS("1999-01-01"))
        .select("o_custkey")
    )
    avg_bal = (
        load(spark, sf_dir, "customer")
        .filter(
            (F.col("c_acctbal") > 0.0)
            & F.col("c_nationkey").isin(3, 5, 7, 11, 13, 17, 19)
        )
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg")
        )
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


ORACLE_Q22 = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (3, 5, 7, 11, 13, 17, 19)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
    FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (3, 5, 7, 11, 13, 17, 19)
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: no partsupp — the (part, supplier) supply cost
    becomes the minimum extended price at which that supplier has shipped
    that part. For SMALL parts of size 15, find the EUROPE supplier(s)
    with the per-part minimum cost.

    Shape: correlated-min subquery -> grouped MIN joined back on the
    group key (one shuffle over the brand-filtered lineitems). region/
    nation/part/supplier are true dimensions -> broadcast; the per-pair
    cost agg and the min-cost join are AQE's call."""
    tune(spark)
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation")
    nat = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    pair_cost = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(_price("l_extendedprice")).alias("_cost"))
    )
    min_cost = pair_cost.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("_cost").alias("_mc")
    )
    return (
        pair_cost.join(
            min_cost,
            (pair_cost.p_partkey == F.col("_pk")) & (pair_cost._cost == F.col("_mc")),
        )
        .join(supp, pair_cost.l_suppkey == supp.s_suppkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("_cost").cast("double").alias("supply_cost"),
        )
    )


ORACLE_Q2 = """
WITH euro_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pair_cost AS (
  SELECT p_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(14,2))) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN euro_supp ON l_suppkey = s_suppkey
  WHERE p_size = 15 AND p_type = 'SMALL'
  GROUP BY p_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey,
       CAST(cost AS DOUBLE) AS supply_cost
FROM pair_cost
JOIN euro_supp ON l_suppkey = s_suppkey
WHERE cost = (SELECT MIN(cost) FROM pair_cost p2
              WHERE p2.p_partkey = pair_cost.p_partkey)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: no partsupp availqty — a part's 'stock value'
    for one nation's suppliers is the total extendedprice*quantity those
    suppliers have shipped. Keep parts whose value exceeds 0.01% of the
    nation total.

    Shape: grouped agg + global scalar threshold. The 1-row global sum is
    broadcast back (never a single-partition window); the threshold
    compare stays in exact DECIMAL on both engines."""
    tune(spark)
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    value = _price("l_extendedprice") * _price("l_quantity")
    natl = li.join(supp, li.l_suppkey == supp.s_suppkey)
    per_part = natl.groupBy("l_partkey").agg(F.sum(value).alias("_v"))
    total = natl.agg(F.sum(value).alias("_t"))
    # threshold compare in double on BOTH engines (a decimal-vs-double
    # mixed compare could disagree exactly at the boundary)
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("_v").cast("double") > F.col("_t").cast("double") * F.lit(0.0001)
        )
        .select("l_partkey", F.col("_v").cast("double").alias("part_value"))
    )


ORACLE_Q11 = """
WITH natl AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2)) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_19'
)
SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
FROM natl
GROUP BY l_partkey
HAVING CAST(SUM(v) AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.0001 FROM natl)
"""


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: no partsupp availqty — a supplier qualifies if
    it shipped more than 45 units of 'red'-named parts during 1996.
    Nested semi-join chain: part-name filter -> per-(supp,part) quantity
    agg -> HAVING -> semi-join into the supplier dimension, nation-
    filtered. The quantity agg shuffles only the red-part lineitems."""
    tune(spark)
    part = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1997-01-01"))
    )
    qualifying = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_price("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 45)
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


ORACLE_Q20 = """
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_19'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 45
  )
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: no commit/receipt dates — a lineitem is 'late'
    when it ships more than 100 days after the order date. For finished
    orders, count per supplier the orders where it was the ONLY late
    supplier among several: EXISTS (another supplier on the order) AND
    NOT EXISTS (another LATE supplier on the order).

    Shape — the AGGREGATE formulation, not correlated self-joins:
    "EXISTS another supplier" ⟺ the order has >= 2 distinct suppliers;
    "NOT EXISTS another late supplier" ⟺ the order has exactly 1
    distinct late supplier (this one). So two orderkey-keyed aggregates
    (distinct late pairs; per-order supplier counts) and one join
    replace the semi+anti fact self-joins — at 100 TB that is ONE
    hashpartitioning(l_orderkey) exchange structure with map-side
    partial aggregation, instead of three co-partitioned full legs
    (the r3 10x envelope measured the self-join form at 3.8x/10x, the
    worst ratio in the suite; the oracle keeps the EXISTS form as the
    semantic cross-check)."""
    tune(spark)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    late_cnt = late.groupBy(F.col("l_orderkey").alias("_lo")).agg(
        F.count(F.lit(1)).alias("n_late")
    )
    supp_cnt = li.groupBy(F.col("l_orderkey").alias("_so")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    waited = (
        late.join(late_cnt, late.l_orderkey == F.col("_lo"))
        .join(supp_cnt, late.l_orderkey == F.col("_so"))
        .filter((F.col("n_late") == 1) & (F.col("n_supp") > 1))
        .join(supp, late.l_suppkey == supp.s_suppkey)
    )
    return waited.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


ORACLE_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 100 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey, s_name
  FROM late l1
  JOIN supplier ON l1.l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_19'
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
) t
GROUP BY s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q20_promotion_suppliers": q20_promotion_suppliers,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q12_late_shipments": q12_late_shipments,
    "q13_customer_order_distribution": q13_customer_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_dormant_customers": q22_dormant_customers,
}

ORACLES = {
    "q2_min_cost_supplier": ORACLE_Q2,
    "q11_important_parts": ORACLE_Q11,
    "q20_promotion_suppliers": ORACLE_Q20,
    "q21_suppliers_kept_waiting": ORACLE_Q21,
    "q7_volume_shipping": ORACLE_Q7,
    "q8_market_share": ORACLE_Q8,
    "q9_product_profit": ORACLE_Q9,
    "q12_late_shipments": ORACLE_Q12,
    "q13_customer_order_distribution": ORACLE_Q13,
    "q15_top_supplier": ORACLE_Q15,
    "q16_part_supplier_counts": ORACLE_Q16,
    "q17_small_quantity_revenue": ORACLE_Q17,
    "q19_disjunctive_revenue": ORACLE_Q19,
    "q22_dormant_customers": ORACLE_Q22,
}
