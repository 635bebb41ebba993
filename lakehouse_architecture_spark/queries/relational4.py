"""TPC-H tail queries (Q8/Q9/Q11/Q12/Q14-Q17/Q19-Q21 shapes), adapted.

Completes the TPC-H-style relational surface started in relational.py /
relational2.py / relational3.py. The testdata star schema (TESTDATA.md) has
no ``partsupp`` table and no commit/receipt dates on lineitem, so the
affected queries are adapted while keeping their *shape* — the operator
pattern the original exercises:

* Q11/Q16/Q20: ``lineitem`` is the part<->supplier bridge.
* Q12/Q21: "late" is ``l_shipdate`` lagging ``o_orderdate``.
* Q9: ``p_retailprice`` stands in for ``ps_supplycost``.

Plan notes (checked with .explain("formatted")): dimension sides broadcast
(part is ~1/3000 of lineitem, supplier/nation/region smaller still); the
decorrelated Q17 per-part average and the Q11 HAVING-threshold scalar reuse
one aggregate; Q21's three lineitem roles resolve to semi/anti hash joins,
never a nested loop. All aggregates are decimal-exact (functions/
aggregates.py) so results hash-match the DuckDB oracle bit-for-bit.

Reference parity: the reference delegates all SQL to stock Spark (SURVEY.md
§2.6 — it contains no joins of its own), so this suite is north-star
coverage, not behavior ported from reference files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import davg, dsum, dsum_sql
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- q08: national market share within a region (TPC-H Q8 shape) ---
def _q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cust_nat = t["nation"].select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    supp_nat = t["nation"].select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    europe = t["region"].filter(F.col("r_name") == "EUROPE")
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_nationkey"))
        .join(F.broadcast(europe), F.col("cn_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(0.0), "nation_vol"),
            dsum(vol, "total_vol"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_vol") / F.col("total_vol"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


_Q08_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       ROUND({dsum_sql("CASE WHEN n2.n_name = 'NATION_7' "
                       "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


# --- q09: product-line profit by supplier nation x year (TPC-H Q9 shape) ---
def _q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_name").contains("widget"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount, "sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


_Q09_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       {dsum_sql('l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity')}
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE contains(p_name, 'widget')
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


# --- q11: high-value parts vs a global threshold (TPC-H Q11 shape) ---
def _q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    asia_supp = (
        t["supplier"]
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey")
    )
    # one aggregate, reused for both the per-part values and the threshold
    per_part = (
        t["lineitem"]
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice", "value"))
    )
    threshold = per_part.agg((dsum("value") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "value")
        .orderBy(F.col("value").desc(), F.col("partkey").asc())
    )


_Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, {dsum_sql('l_extendedprice')} AS value
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, value
FROM per_part
WHERE value > (SELECT {dsum_sql('value')} * 0.001 FROM per_part)
ORDER BY value DESC, partkey ASC
"""


# --- q12: shipping-speed buckets x order priority (TPC-H Q12 shape) ---
def _q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(F.datediff("l_shipdate", "o_orderdate") <= 60, "FAST")
            .otherwise("SLOW")
            .alias("ship_speed"),
            high.alias("is_high"),
        )
        .groupBy("ship_speed")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


_Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60
            THEN 'FAST' ELSE 'SLOW' END AS ship_speed,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1
"""


# --- q14: promo revenue percentage (TPC-H Q14 shape) ---
def _q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0), "promo_vol"),
            dsum(vol, "total_vol"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo_vol") / F.col("total_vol"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


_Q14_SQL = f"""
SELECT ROUND(100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' "
                               "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


# --- q15: top supplier(s) by quarter revenue == scalar max (TPC-H Q15 shape) ---
def _q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    # exact-decimal sums make the doubles identical across engines, so the
    # equality-with-max join is deterministic
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- q16: supplier count per part attribute group, NOT IN exclusion (Q16 shape) ---
def _q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # lineitem is the part<->supplier bridge (no partsupp table; module doc)
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# --- q17: small-quantity-order revenue via decorrelated avg (TPC-H Q17 shape) ---
def _q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    # decorrelate the per-part scalar subquery into one aggregate + join —
    # the same rewrite Catalyst applies to the SQL form
    per_part_avg = (
        li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(davg("l_quantity", "avg_qty"))
        .select(F.col("l_partkey").alias("ap_partkey"), "avg_qty")
    )
    return (
        li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round((dsum("l_extendedprice") / 7.0), 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q17_SQL = f"""
SELECT ROUND({dsum_sql('l_extendedprice')} / 7.0, 6) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l1
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
  AND l_quantity < 0.2 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


# --- q19: disjunctive multi-attribute join predicate (TPC-H Q19 shape) ---
def _q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q19_SQL = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- q20: suppliers with heavy shipments of a part family (TPC-H Q20 shape) ---
def _q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    widget_parts = t["part"].filter(F.col("p_name").contains("widget")).select("p_partkey")
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(widget_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity", "qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE contains(p_name, 'widget'))
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING {dsum_sql('l_quantity')} > 50.0)
ORDER BY s_suppkey
"""


# --- q21: sole late shipper in multi-supplier orders (TPC-H Q21 shape) ---
def _q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT-EXISTS over same-order suppliers, reformulated as ONE
    scan of lineitem and a two-level aggregate instead of semi+anti
    self-joins (which scan and shuffle lineitem two extra times): per
    (order, supplier) count late rows, then per order count suppliers and
    late suppliers. An order qualifies when it has >= 2 suppliers (the
    EXISTS) and exactly one late supplier (the NOT EXISTS); that sole
    supplier's late-row count is its numwait contribution."""
    t = tables(spark, sf_dir)
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
    is_late = (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    ).cast("int")
    per_supp = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(is_late).alias("late_rows")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("late_rows") > 0).cast("int")).alias("n_late"),
        F.max(
            F.when(F.col("late_rows") > 0, F.struct("l_suppkey", "late_rows"))
        ).alias("sole"),
    )
    return (
        per_order.filter((F.col("n_late") == 1) & (F.col("n_supp") >= 2))
        .groupBy(F.col("sole.l_suppkey").alias("l_suppkey"))
        .agg(F.sum("sole.late_rows").alias("numwait"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


RELATIONAL4_QUERIES: list[QuerySpec] = [
    QuerySpec("q08_market_share", "nation market share ratio per year (Q8 shape)", _q08, _Q08_SQL),
    QuerySpec("q09_product_profit", "profit by supplier nation x year (Q9 shape)", _q09, _Q09_SQL),
    QuerySpec("q11_important_parts", "per-part value vs global threshold subquery (Q11 shape)", _q11, _Q11_SQL),
    QuerySpec("q12_ship_priority", "date-lag buckets x priority conditional counts (Q12 shape)", _q12, _Q12_SQL),
    QuerySpec("q14_promo_revenue", "conditional revenue ratio (Q14 shape)", _q14, _Q14_SQL),
    QuerySpec("q15_top_supplier", "revenue CTE + scalar-max equality join (Q15 shape)", _q15, _Q15_SQL),
    QuerySpec("q16_supplier_cnt", "distinct-count by attrs + NOT IN exclusion (Q16 shape)", _q16, _Q16_SQL),
    QuerySpec("q17_small_qty", "decorrelated per-part avg scalar subquery (Q17 shape)", _q17, _Q17_SQL),
    QuerySpec("q19_disjunctive", "OR-of-conjuncts join predicate (Q19 shape)", _q19, _Q19_SQL),
    QuerySpec("q20_heavy_suppliers", "nested IN + grouped HAVING semi-join chain (Q20 shape)", _q20, _Q20_SQL),
    QuerySpec("q21_sole_late", "exists + not-exists self-join roles (Q21 shape)", _q21, _Q21_SQL),
]


# --- count-min sketch frequency estimates (portable-hash sketch) ----------
def _q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    t = tables(spark, sf_dir)
    sketch = count_min_sketch(t["lineitem"], "l_partkey", depth=3, width=256)
    keys = spark.range(1, 11).select(F.col("id").alias("l_partkey"))
    return (
        cms_estimate(sketch, keys, "l_partkey", depth=3, width=256)
        .orderBy("key")
    )


def _cms_sql() -> str:
    from lakehouse_architecture_spark.functions.hashing import (
        md5_hash64_sql,
        minhash_perm_sql,
    )

    kh = md5_hash64_sql("CAST(l_partkey AS VARCHAR)")
    qh = md5_hash64_sql("CAST(key AS VARCHAR)")
    return f"""
WITH cells AS (
  SELECT dd.d AS d, ({minhash_perm_sql(kh, 'dd.d')}) % 256 AS bucket,
         COUNT(*) AS cnt
  FROM lineitem, (SELECT unnest(range(0, 3)) AS d) dd
  GROUP BY 1, 2
),
probes AS (
  SELECT k.key AS key, dd.d AS d, ({minhash_perm_sql(qh, 'dd.d')}) % 256 AS bucket
  FROM (SELECT unnest(range(1, 11)) AS key) k,
       (SELECT unnest(range(0, 3)) AS d) dd
)
SELECT key, MIN(COALESCE(cnt, 0)) AS est_count
FROM probes LEFT JOIN cells USING (d, bucket)
GROUP BY key
ORDER BY key
"""


RELATIONAL4_QUERIES.append(
    QuerySpec(
        "q_cms_freq",
        "count-min sketch point frequency estimates (portable hashes)",
        _q_cms,
        _cms_sql(),
    )
)
