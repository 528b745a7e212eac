"""Driver-contract queries, batch 6: decorrelated-subquery relational shapes.

The reference never issues SQL (SURVEY.md §0), but a drop-in engine needs
the classic correlated-subquery shapes its users would run for data
validation: EXISTS / NOT EXISTS semi- and anti-joins, scalar-average
correlated predicates, and NOT IN subquery exclusion. Each query here is a
TPC-H shape (Q4 / Q16 / Q17 / Q21 / Q22) adapted to the fixture schema
(no l_commitdate/l_receiptdate/partsupp columns exist, so "late" is
derived from l_shipdate vs o_orderdate and the part-supplier relation from
distinct lineitem keys).

Determinism contract (shared with the other batches): every value that
crosses the DuckDB oracle boundary is an integer, a date, or a fixed-point
bigint; scalar-average predicates are evaluated by integer
cross-multiplication (``k * x * n < sum``) so no float division ever sits
on a comparison boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join + group count
# ---------------------------------------------------------------------------


def q4_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped > 90 days after the order
    date, counted per order priority (TPC-H Q4 shape: EXISTS decorrelated
    into a left-semi join). The semi-join carries the correlated predicate
    (l_shipdate > o_orderdate + 90 days) in the join condition, so Spark
    plans one hash semi-join on o_orderkey — the fact table is never
    duplicated and each order emits at most once regardless of how many of
    its lines are late. At scale the join key is the orders PK: no skew,
    and AQE picks the build side."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, count(*)::bigint AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# Q17 shape: correlated scalar-average predicate (decorrelated join-back)
# ---------------------------------------------------------------------------


def q17_small_quantity_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems whose quantity is below 20% of their part's average
    quantity, accounted per brand (TPC-H Q17 shape). The correlated scalar
    subquery ``avg(l_quantity) where l_partkey = ...`` is decorrelated
    into one partial-aggregated hash agg on l_partkey (sum + count) joined
    back to the fact table — the classic two-scan rewrite Catalyst also
    produces for correlated scalar aggregates. The average predicate is
    evaluated as ``5 * qty * n < sum`` (quantities are integral, cast to
    long): an exact integer cross-multiplication with no float division on
    the comparison boundary."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty")
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("n_lines")
    )
    small = (
        li.join(per_part.withColumnRenamed("l_partkey", "pk"),
                F.col("l_partkey") == F.col("pk"))
        .filter(5 * F.col("qty") * F.col("n_lines") < F.col("sum_qty"))
    )
    return (
        small.join(part, small["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.sum("qty").alias("sum_small_qty"),
        )
    )


Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey, sum(cast(l_quantity AS bigint))::bigint AS sum_qty,
         count(*)::bigint AS n_lines
  FROM lineitem GROUP BY l_partkey),
small AS (
  SELECT l.l_partkey, cast(l.l_quantity AS bigint) AS qty
  FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
  WHERE 5 * cast(l.l_quantity AS bigint) * p.n_lines < p.sum_qty)
SELECT p_brand, count(*)::bigint AS n_small,
       sum(qty)::bigint AS sum_small_qty
FROM small JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS chain on the same fact table
# ---------------------------------------------------------------------------

_LATE_DAYS = 1400


def q21_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on multi-supplier orders
    (TPC-H Q21 shape: a semi-join plus an anti-join of the fact table
    against itself). "Late" = shipped > 1400 days after the order date.
    For each late (order, supplier) pair: EXISTS another supplier on the
    order (left-semi), NOT EXISTS another *late* supplier on the order
    (left-anti) — both self-joins hash on l_orderkey, so the three passes
    over lineitem co-partition on the same key and AQE reuses the
    exchange. Counts are distinct (order, supplier) pairs; top 20 by
    (numwait desc, s_name) — s_name is unique so the limit boundary is
    total-ordered."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    lines = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        ).alias("late"),
    )
    pairs = lines.select("l_orderkey", "l_suppkey", "late").distinct()
    l1 = pairs.filter("late").select("l_orderkey", "l_suppkey")
    l2 = pairs.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = pairs.filter("late").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole = l1.join(
        l2, (l1["l_orderkey"] == F.col("o2")) & (l1["l_suppkey"] != F.col("s2")),
        "left_semi",
    ).join(
        l3, (l1["l_orderkey"] == F.col("o3")) & (l1["l_suppkey"] != F.col("s3")),
        "left_anti",
    )
    return (
        sole.join(sup, sole["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey,
    l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
l1 AS (SELECT l_orderkey, l_suppkey FROM pairs WHERE late)
SELECT s_name, count(*)::bigint AS numwait
FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM pairs p2
    WHERE p2.l_orderkey = l1.l_orderkey AND p2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM pairs p3
    WHERE p3.l_orderkey = l1.l_orderkey AND p3.l_suppkey <> l1.l_suppkey
      AND p3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 20
"""

# ---------------------------------------------------------------------------
# Q16 shape: NOT IN subquery exclusion + grouped distinct aggregate
# ---------------------------------------------------------------------------


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) over the part-supplier relation
    derived from lineitem, excluding suppliers in the NOT IN subquery
    (negative account balance) — TPC-H Q16 shape. The part-supplier
    relation is a distinct projection of the fact table (one hash agg);
    the exclusion is a left-anti join against a tiny dimension subquery
    (broadcast); the result is a grouped count-distinct (Expand plan).
    All counts exact integers."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = li.distinct()
    kept = ps.join(bad, ps["l_suppkey"] == bad["s_suppkey"], "left_anti")
    return (
        kept.join(part, kept["l_partkey"] == part["p_partkey"])
        .filter(F.col("p_size") <= 25)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_size, count(DISTINCT l_suppkey)::bigint AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""

# ---------------------------------------------------------------------------
# Q22 shape: scalar-average subquery + NOT EXISTS anti-join
# ---------------------------------------------------------------------------

_IDLE_CUTOFF = "2000-01-01"


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balances and no recent orders
    (TPC-H Q22 shape), per nation: the global scalar average is one
    scalar aggregate broadcast via crossJoin (never a partition-less
    window); "above average" is the integer cross-multiplication
    ``acctbal_fp * n_pos > sum_pos_fp`` over cent-exact fixed-point
    balances; "no order since 2000-01-01" is a left-anti join against the
    distinct recent-customer keys. Output sums are fixed-point bigints —
    no float crosses the oracle boundary."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_fp"),
    )
    recent = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") >= F.lit(_IDLE_CUTOFF).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    pos_stats = cust.filter(F.col("acctbal_fp") > 0).agg(
        F.sum("acctbal_fp").alias("sum_pos"), F.count("*").alias("n_pos")
    )
    rich = cust.crossJoin(F.broadcast(pos_stats)).filter(
        F.col("acctbal_fp") * F.col("n_pos") > F.col("sum_pos")
    )
    idle = rich.join(
        recent, rich["c_custkey"] == recent["o_custkey"], "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.sum("acctbal_fp").alias("total_acctbal_fp"),
    )


Q22_SQL = f"""
WITH fp AS (
  SELECT c_custkey, c_nationkey,
         cast(round(c_acctbal * 100, 0) AS bigint) AS acctbal_fp
  FROM customer),
pos AS (
  SELECT sum(acctbal_fp)::bigint AS sum_pos, count(*)::bigint AS n_pos
  FROM fp WHERE acctbal_fp > 0),
recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_IDLE_CUTOFF}')
SELECT c_nationkey, count(*)::bigint AS n_cust,
       sum(acctbal_fp)::bigint AS total_acctbal_fp
FROM fp CROSS JOIN pos
WHERE acctbal_fp * n_pos > sum_pos
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q15 shape: aggregate view + scalar-max argmax
# ---------------------------------------------------------------------------

# per-row fixed-point revenue: both engines compute the identical double
# product then round half-away-from-zero, so the integer SUM is
# summation-order-proof (the BM25/NLL fixed-point pattern)


def _rev_fp() -> Column:
    return F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")

_REV_FP_SQL = (
    "cast(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS bigint)"
)


def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum total revenue (TPC-H Q15 shape: an
    aggregate view joined against its own scalar max). Revenue is per-row
    fixed-point (cents, rounded before summing) so the bigint totals and
    the max comparison are summation-order-proof. The scalar max is one
    tiny agg broadcast via crossJoin — never a global sort or a
    partition-less window — and ties surface every argmax row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", _rev_fp().alias("rev_fp")
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum("rev_fp").alias("total_revenue_fp")
    )
    mx = per_supp.agg(F.max("total_revenue_fp").alias("mx"))
    top = per_supp.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue_fp") == F.col("mx")
    )
    return top.join(sup, top["l_suppkey"] == sup["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_revenue_fp"
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, sum({_REV_FP_SQL})::bigint AS total_revenue_fp
  FROM lineitem GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue_fp
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_fp = (SELECT max(total_revenue_fp) FROM rev)
"""

# ---------------------------------------------------------------------------
# Q19 shape: disjunction of per-branch conjunctions across the join
# ---------------------------------------------------------------------------


def q19_branded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three (brand, size-range, quantity-range) branches
    OR-ed together (TPC-H Q19 shape). The disjunction spans both join
    sides, so it evaluates as a post-join filter on a plain hash equi-join
    on the part key — never a nested loop; the common part of each branch
    (join key non-null) still pushes to the scans. One row out: exact
    fixed-point revenue plus the matched line count."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _rev_fp().alias("rev_fp"),
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & F.col("qty").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20)
           & F.col("qty").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30)
           & F.col("qty").between(20, 30))
    )
    return j.filter(branch).agg(
        F.sum("rev_fp").alias("revenue_fp"), F.count("*").alias("n_lines")
    )


Q19_SQL = f"""
SELECT sum({_REV_FP_SQL})::bigint AS revenue_fp, count(*)::bigint AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND cast(l_quantity AS bigint) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND cast(l_quantity AS bigint) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND cast(l_quantity AS bigint) BETWEEN 20 AND 30)
"""

# ---------------------------------------------------------------------------
# Q20 shape: nested semi-joins (grouped-HAVING subquery inside an IN)
# ---------------------------------------------------------------------------


def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped > 1.5x the per-supplier average quantity of
    any 'small *' part (TPC-H Q20 shape: a semi-join whose subquery is
    itself a grouped HAVING over a semi-joined fact slice). The per-(part,
    supplier) totals are one partial-aggregated hash agg; the 1.5x-average
    predicate is the integer cross-multiplication ``2*sq*n > 3*tot``; the
    part-name family filter is a broadcast semi-join BEFORE the heavy agg
    so the fact table is pruned first. Output: the qualifying suppliers."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty")
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    target = part.filter(F.col("p_name").startswith("small ")).select("p_partkey")
    sliced = li.join(
        F.broadcast(target), li["l_partkey"] == target["p_partkey"], "left_semi"
    )
    per_pair = sliced.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("sq")
    )
    per_part = per_pair.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").alias("tot"), F.count("*").alias("nsupp")
    )
    heavy = per_pair.join(per_part, F.col("l_partkey") == F.col("pk")).filter(
        2 * F.col("sq") * F.col("nsupp") > 3 * F.col("tot")
    )
    keys = heavy.select("l_suppkey").distinct()
    return sup.join(keys, sup["s_suppkey"] == keys["l_suppkey"], "left_semi").select(
        "s_suppkey", "s_name"
    )


Q20_SQL = """
WITH sliced AS (
  SELECT l_partkey, l_suppkey, cast(l_quantity AS bigint) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small %')),
per_pair AS (
  SELECT l_partkey, l_suppkey, sum(qty)::bigint AS sq
  FROM sliced GROUP BY l_partkey, l_suppkey),
per_part AS (
  SELECT l_partkey, sum(sq)::bigint AS tot, count(*)::bigint AS nsupp
  FROM per_pair GROUP BY l_partkey)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT a.l_suppkey
  FROM per_pair a JOIN per_part b ON a.l_partkey = b.l_partkey
  WHERE 2 * a.sq * b.nsupp > 3 * b.tot)
"""


# ---------------------------------------------------------------------------
# Q7 shape: two-dimension join with a symmetric nation-pair disjunction
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between two nations in both directions, by
    (supplier nation, customer nation, ship year) — TPC-H Q7 shape. The
    fact table joins two different dimension *paths* (supplier→nation and
    orders→customer→nation); the symmetric pair predicate is a post-join
    disjunction. Both nation dims broadcast; supplier and customer hash
    on their PKs. Revenue is fixed-point bigint so group totals are
    summation-order-proof."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", F.year("l_shipdate").alias("l_year"),
        _rev_fp().alias("rev_fp"),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        j.filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_fp").alias("revenue_fp"), F.count("*").alias("n_lines"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       sum(rev_fp)::bigint AS revenue_fp, count(*)::bigint AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate)::bigint AS l_year, {_REV_FP_SQL} AS rev_fp
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""

# ---------------------------------------------------------------------------
# Q8 shape: conditional-aggregate market share (ratio of two sums)
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of PROMO-part revenue sold to ASIA customers, by
    order year (TPC-H Q8 shape). The share is a conditional aggregate —
    ``sum(case when supp_nation = X)`` over ``sum(all)`` — never a second
    scan or self-join. Both sums are fixed-point bigints; the share is one
    double division of identical integers on both engines, rounded to 6.
    Part and the region-filtered customer-nation dims broadcast; the
    5-way star hashes on PKs."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev_fp().alias("rev_fp")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type"
    )
    asia_nations = (
        nat.join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            nat["n_regionkey"] == reg["r_regionkey"],
        ).select(F.col("n_nationkey").alias("cnk"))
    )
    supp_nat = nat.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    j = (
        li.join(F.broadcast(promo), li["l_partkey"] == promo["p_partkey"], "left_semi")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cnk"), "left_semi")
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("snk"))
    )
    agg = j.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("rev_fp")).otherwise(
                F.lit(0)
            )
        ).alias("nation_fp"),
        F.sum("rev_fp").alias("total_fp"),
    )
    return agg.select(
        "o_year",
        "nation_fp",
        "total_fp",
        F.round(F.col("nation_fp") / F.col("total_fp"), 6).alias("mkt_share"),
    )


Q8_SQL = f"""
SELECT o_year, nation_fp::bigint AS nation_fp, total_fp::bigint AS total_fp,
       round(nation_fp / total_fp, 6) AS mkt_share
FROM (
  SELECT year(o.o_orderdate)::bigint AS o_year,
    sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV_FP_SQL} ELSE 0 END) AS nation_fp,
    sum({_REV_FP_SQL}) AS total_fp
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND c.c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
  GROUP BY 1)
"""

# ---------------------------------------------------------------------------
# Q9 shape: product-family profit by nation and year
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from parts whose name contains 'widget', by supplier nation
    and ship year (TPC-H Q9 shape, profit simplified to discounted revenue
    — the fixture has no partsupp cost table). The name filter is a
    broadcast semi-join applied to the fact table BEFORE the wide joins;
    nation broadcasts; the group-by is a single hash agg on
    (nation, year) with map-side partials."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", F.year("l_shipdate").alias("l_year"),
        _rev_fp().alias("rev_fp"),
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    widgets = part.filter(F.col("p_name").contains("widget")).select("p_partkey")
    return (
        li.join(F.broadcast(widgets), li["l_partkey"] == widgets["p_partkey"], "left_semi")
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", "l_year")
        .agg(F.sum("rev_fp").alias("profit_fp"), F.count("*").alias("n_lines"))
    )


Q9_SQL = f"""
SELECT n.n_name AS nation, year(l.l_shipdate)::bigint AS l_year,
       sum({_REV_FP_SQL})::bigint AS profit_fp, count(*)::bigint AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Q10 shape: returned-revenue top customers
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returns (l_returnflag = 'R')
    on orders placed in 1996H1 — TPC-H Q10 shape. The date filter prunes
    orders before the fact join; the returnflag filter prunes lineitem at
    the scan; customer/nation join AFTER the per-customer aggregate so
    the wide name columns never ride the big shuffle. Total order is
    (revenue desc, c_custkey) — the limit boundary is deterministic."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", _rev_fp().alias("rev_fp"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("rev_fp").alias("revenue_fp"))
    )
    return (
        per_cust.join(cust, per_cust["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "nation", "revenue_fp")
        .orderBy(F.desc("revenue_fp"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
WITH per_cust AS (
  SELECT o.o_custkey, sum({_REV_FP_SQL})::bigint AS revenue_fp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY o.o_custkey)
SELECT c_custkey, c_name, n_name AS nation, revenue_fp
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue_fp DESC, c_custkey
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Q12 shape: conditional-count classification over a join
# ---------------------------------------------------------------------------


def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Among lineitems shipped > 90 days after their order date, count
    urgent (priority 1-2) vs non-urgent orders per line status — TPC-H
    Q12 shape (l_linestatus stands in for the fixture-absent l_shipmode).
    The urgency split is a conditional aggregate on one hash join; the
    lateness predicate rides the join output, and only 3 narrow columns
    cross the exchange."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(urgent.cast("long")).alias("high_line_count"),
        F.sum((~urgent).cast("long")).alias("low_line_count"),
    )


Q12_SQL = """
SELECT l_linestatus,
  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::bigint
    AS high_line_count,
  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)::bigint
    AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""

# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share in a date window
# ---------------------------------------------------------------------------


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of 1997 revenue from PROMO-type parts (TPC-H Q14 shape): a
    conditional sum over one broadcast join — the promo flag rides the
    part dim; no second pass. Numerator/denominator are fixed-point
    bigints; the share divides identical integers on both engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", _rev_fp().alias("rev_fp"))
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    agg = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).agg(
        F.sum(F.when(F.col("is_promo"), F.col("rev_fp")).otherwise(F.lit(0))).alias(
            "promo_fp"
        ),
        F.sum("rev_fp").alias("total_fp"),
    )
    return agg.select(
        "promo_fp",
        "total_fp",
        F.round(100.0 * F.col("promo_fp") / F.col("total_fp"), 6).alias("promo_pct"),
    )


Q14_SQL = f"""
SELECT promo_fp::bigint AS promo_fp, total_fp::bigint AS total_fp,
       round(100.0 * promo_fp / total_fp, 6) AS promo_pct
FROM (
  SELECT
    sum(CASE WHEN p_type = 'PROMO' THEN {_REV_FP_SQL} ELSE 0 END) AS promo_fp,
    sum({_REV_FP_SQL}) AS total_fp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01')
"""


# ---------------------------------------------------------------------------
# Q2 shape: groupwise-min correlated subquery with multi-dim decoration
# ---------------------------------------------------------------------------


def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each large part, the ASIA supplier with the minimum account
    balance among suppliers that shipped it (TPC-H Q2 shape: a correlated
    groupwise-min subquery decorated by dimension joins; the fixture has
    no partsupp, so the part-supplier relation derives from distinct
    lineitem keys and s_acctbal stands in for ps_supplycost). The
    correlated ``= (SELECT min(..) WHERE pk = ..)`` decorrelates into one
    per-part min joined back — ties keep EVERY minimal supplier (Q2
    semantics). Balances are cents-exact bigints; top 20 total-ordered by
    (balance desc, part, supplier)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    ).distinct()
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        (F.col("p_size") > 40) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_brand")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name", "s_nationkey",
        F.round(F.col("s_acctbal") * 100.0).cast("long").alias("bal_fp"),
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    asia = nat.join(
        F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
        nat["n_regionkey"] == reg["r_regionkey"],
    ).select(F.col("n_nationkey").alias("ank"), F.col("n_name").alias("nation"))
    cand = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("ank"))
        .select("l_partkey", "l_suppkey", "s_name", "nation", "bal_fp")
    )
    mins = cand.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("bal_fp").alias("min_bal")
    )
    best = cand.join(
        mins,
        (cand["l_partkey"] == mins["pk"]) & (cand["bal_fp"] == mins["min_bal"]),
    )
    return (
        best.join(F.broadcast(part), best["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "nation",
            F.col("bal_fp").alias("acctbal_fp"),
        )
        .orderBy(F.desc("acctbal_fp"), "p_partkey", "s_suppkey")
        .limit(20)
    )


Q2_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
big AS (SELECT p_partkey, p_brand FROM part WHERE p_size > 40 AND p_type = 'LARGE'),
asia AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'),
cand AS (
  SELECT ps.l_partkey, ps.l_suppkey, s.s_name, a.n_name AS nation,
         cast(round(s.s_acctbal * 100.0, 0) AS bigint) AS bal_fp
  FROM ps
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN asia a ON s.s_nationkey = a.n_nationkey
  WHERE ps.l_partkey IN (SELECT p_partkey FROM big))
SELECT c.l_partkey AS p_partkey, b.p_brand, c.l_suppkey AS s_suppkey,
       c.s_name, c.nation, c.bal_fp AS acctbal_fp
FROM cand c JOIN big b ON c.l_partkey = b.p_partkey
WHERE c.bal_fp = (SELECT min(bal_fp) FROM cand c2 WHERE c2.l_partkey = c.l_partkey)
ORDER BY acctbal_fp DESC, p_partkey, s_suppkey
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Q11 shape: group share vs a scalar-aggregate threshold
# ---------------------------------------------------------------------------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose total shipped value exceeds 1/1800 of the corpus-wide
    total (≈2× the uniform share at 2 000 parts, so the filter is
    genuinely selective on the fixture) (TPC-H Q11 shape: a grouped sum filtered against a scalar
    aggregate of the same relation). The global total is ONE tiny agg
    broadcast via crossJoin; the comparison is the exact integer
    cross-multiplication ``1000 * part_value > total`` — no float on the
    HAVING boundary, no second scan (the per-part aggregate feeds both
    sides)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * F.col("l_quantity") * 100.0)
        .cast("long")
        .alias("val_fp"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("val_fp").alias("part_val"))
    total = per_part.agg(F.sum("part_val").alias("total_val"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(1800 * F.col("part_val") > F.col("total_val"))
        .select("l_partkey", "part_val")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(cast(round(l_extendedprice * l_quantity * 100.0, 0) AS bigint))::bigint
           AS part_val
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, part_val
FROM per_part
WHERE 1800 * part_val > (SELECT sum(part_val) FROM per_part)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q4_priority_late_exists": q4_priority_late_exists,
    "q17_small_quantity_share": q17_small_quantity_share,
    "q21_sole_blame_suppliers": q21_sole_blame_suppliers,
    "q16_supplier_variety": q16_supplier_variety,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q15_top_revenue_supplier": q15_top_revenue_supplier,
    "q19_branded_revenue": q19_branded_revenue,
    "q20_heavy_suppliers": q20_heavy_suppliers,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q12_late_priority_lines": q12_late_priority_lines,
    "q14_promo_share": q14_promo_share,
    "q2_cheapest_supplier": q2_cheapest_supplier,
    "q11_important_stock": q11_important_stock,
}

ORACLE_SQL: dict[str, str] = {
    "q4_priority_late_exists": Q4_SQL,
    "q17_small_quantity_share": Q17_SQL,
    "q21_sole_blame_suppliers": Q21_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q22_idle_rich_customers": Q22_SQL,
    "q15_top_revenue_supplier": Q15_SQL,
    "q19_branded_revenue": Q19_SQL,
    "q20_heavy_suppliers": Q20_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_late_priority_lines": Q12_SQL,
    "q14_promo_share": Q14_SQL,
    "q2_cheapest_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
}
