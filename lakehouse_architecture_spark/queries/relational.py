"""Relational core query suite (SURVEY.md §2.2-2.8) over the star schema.

Each query is the Spark-first formulation (broadcast hints for dimension
tables, decimal-exact aggregates, total-order ranking) paired with its ANSI
oracle. Plans were checked with .explain("formatted"): dimension joins go
broadcast-hash, scans carry PushedFilters, aggregates keep map-side partial
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import davg, davg_sql, dsum, dsum_sql
from lakehouse_architecture_spark.operators.relational import top_k_per_group
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- q01: TPC-H Q1-style pricing summary (filter + groupBy + 8 aggregates) ---
def _q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q02: projection / filter / conditional / arithmetic (P1-P7) ---
def _q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    o = t["orders"]
    return (
        o.filter(F.col("o_totalprice") > 1000.0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderstatus").alias("status"),
            F.when(F.col("o_orderstatus") == "F", 2)
            .when(F.col("o_orderstatus") == "O", 1)
            .otherwise(0)
            .alias("status_code"),
            F.round(F.col("o_totalprice") / 1000.0, 6).alias("kprice"),
            F.year("o_orderdate").alias("order_year"),
        )
    )


_Q02_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus AS status,
       CASE WHEN o_orderstatus = 'F' THEN 2
            WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS status_code,
       ROUND(o_totalprice / 1000.0, 6) AS kprice,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year
FROM orders
WHERE o_totalprice > 1000.0
"""


# --- q03: 3-way join + group + top-10 (TPC-H Q3 shape) ---
def _q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("2000-03-15").cast("timestamp"))
    li = t["lineitem"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_Q03_SQL = f"""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2000-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- q05: 6-way join through dims, grouped revenue per nation ---
def _q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]
    supp, nat, reg = t["supplier"], t["nation"], t["region"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


_Q05_SQL = f"""
SELECT r_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- q06: pure filter + single aggregate (TPC-H Q6 shape) ---
def _q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_Q06_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
"""


# --- joins: anti / semi / outer ---
def _q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # the reference's seen-ID ledger (app/bronze.py:113-116) as a left_anti;
    # anti-joined against *high-value* orders so the result is non-empty at
    # every scale factor (every customer has at least one order)
    big = t["orders"].filter(F.col("o_totalprice") > 250000.0)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_Q_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
"""


def _q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 200000.0)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


_Q_JOIN_SEMI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
"""


def _q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "total_spend"),
        )
    )


_Q_JOIN_OUTER_SQL = f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       {dsum_sql('COALESCE(o_totalprice, 0.0)')} AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# --- aggregates: distinct, rollup, cube ---
def _q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
            F.round(F.min("c_acctbal"), 6).alias("min_bal"),
            F.round(F.max("c_acctbal"), 6).alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


_Q_AGG_DISTINCT_SQL = f"""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       {dsum_sql('c_acctbal')} AS total_acctbal,
       ROUND(MIN(c_acctbal), 6) AS min_bal,
       ROUND(MAX(c_acctbal), 6) AS max_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "total_bal"))
    )


_Q_ROLLUP_SQL = f"""
SELECT r_name, n_name, COUNT(*) AS n_customers, {dsum_sql('c_acctbal')} AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def _q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


_Q_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


# --- windows ---
def _q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return top_k_per_group(
        t["orders"].select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
        rank_col="rnk",
    )


_Q_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def _q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_suppkey") <= 5)
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_qty"
        ),
        F.lag("l_quantity", 1).over(w).alias("prev_qty"),
        F.lead("l_quantity", 1).over(w).alias("next_qty"),
        F.rank().over(
            Window.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
        ).alias("qty_rank"),
    )


_Q_WINDOW_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS UNBOUNDED PRECEDING), 4) AS running_qty,
       LAG(l_quantity, 1) OVER (PARTITION BY l_suppkey
                                ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty,
       LEAD(l_quantity, 1) OVER (PARTITION BY l_suppkey
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber) AS next_qty,
       CAST(RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS INT) AS qty_rank
FROM lineitem
WHERE l_suppkey <= 5
"""


# --- sort / limit ---
def _q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(100)
    )


_Q_SORT_LIMIT_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
"""


# --- set operations ---
def _q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    o = t["orders"]
    y95 = (
        o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    )
    y96 = (
        o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    )
    # symmetric difference: customers ordering in exactly one of the years
    return y95.union(y96).distinct().subtract(y95.intersect(y96)).select(
        F.col("o_custkey").alias("custkey")
    )


_Q_SET_OPS_SQL = """
SELECT custkey FROM (
  (SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
   UNION
   SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
  EXCEPT
  (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
   INTERSECT
   SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
)
"""


# --- distinct (D1) ---
def _q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t["lineitem"].select("l_returnflag", "l_linestatus").dropDuplicates()


_Q_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --- pivot ---
def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
        .orderBy("l_returnflag")
    )


_Q_PIVOT_SQL = f"""
SELECT l_returnflag,
       {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
       {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- scalar string functions (U1-U3 belt, §2.8) ---
def _q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    p = t["part"]
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper(F.substring("p_type", 1, 5)).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "").alias("name_novowels"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").contains("red"), 1).otherwise(0).alias("has_red"),
    )


_Q_STRING_FUNCS_SQL = """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(substr(p_type, 1, 5)) AS type_prefix,
       CAST(length(p_name) AS INT) AS name_len,
       TRY_CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INT) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CASE WHEN contains(p_name, 'red') THEN 1 ELSE 0 END AS has_red
FROM part
"""


# --- date functions ---
def _q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "month_total"),
        )
        .orderBy("month")
    )


_Q_DATE_FUNCS_SQL = f"""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS month_total
FROM orders
GROUP BY 1
ORDER BY 1
"""


RELATIONAL_QUERIES: list[QuerySpec] = [
    QuerySpec("q01_pricing_summary", "TPC-H Q1-style groupBy+8 aggregates", _q01, _Q01_SQL),
    QuerySpec("q02_filter_project", "projection/filter/case/arith (P1-P7)", _q02, _Q02_SQL),
    QuerySpec("q03_top_revenue_orders", "3-way join + group + top-10", _q03, _Q03_SQL),
    QuerySpec("q05_nation_revenue", "6-way join through dims", _q05, _Q05_SQL),
    QuerySpec("q06_filtered_revenue", "pure filter + aggregate", _q06, _Q06_SQL),
    QuerySpec("q_join_left_anti", "anti-join (seen-ID ledger semantics, D2)", _q_join_anti, _Q_JOIN_ANTI_SQL),
    QuerySpec("q_join_left_semi", "semi-join (EXISTS)", _q_join_semi, _Q_JOIN_SEMI_SQL),
    QuerySpec("q_join_left_outer", "left outer join + grouped counts", _q_join_outer, _Q_JOIN_OUTER_SQL),
    QuerySpec("q_agg_distinct", "count-distinct + min/max aggregates", _q_agg_distinct, _Q_AGG_DISTINCT_SQL),
    QuerySpec("q_rollup", "hierarchical ROLLUP aggregate", _q_rollup, _Q_ROLLUP_SQL),
    QuerySpec("q_cube", "CUBE aggregate", _q_cube, _Q_CUBE_SQL),
    QuerySpec("q_window_topk", "top-k per group via row_number", _q_window_topk, _Q_WINDOW_TOPK_SQL),
    QuerySpec("q_window_running", "running sum / lag / lead / rank", _q_window_running, _Q_WINDOW_RUNNING_SQL),
    QuerySpec("q_sort_limit", "global sort + limit (total order)", _q_sort_limit, _Q_SORT_LIMIT_SQL),
    QuerySpec("q_set_ops", "union/intersect/except", _q_set_ops, _Q_SET_OPS_SQL),
    QuerySpec("q_distinct", "dropDuplicates (D1)", _q_distinct, _Q_DISTINCT_SQL),
    QuerySpec("q_pivot", "pivot vs conditional aggregation", _q_pivot, _Q_PIVOT_SQL),
    QuerySpec("q_string_funcs", "string/regex scalar belt (§2.8)", _q_string_funcs, _Q_STRING_FUNCS_SQL),
    QuerySpec("q_date_funcs", "date truncation + monthly rollup", _q_date_funcs, _Q_DATE_FUNCS_SQL),
]
