"""Second relational batch: subquery shapes (EXISTS / IN / scalar /
correlated), HAVING, GROUPING SETS, distribution aggregates, math and
array/higher-order-function belts, and the analytic-window long tail.

Determinism notes: every HAVING / filter threshold over a float aggregate
goes through the decimal-exact sum (a double sum's value depends on
accumulation order, so a threshold comparison could flip between engines);
math belt sticks to IEEE-exact functions (sqrt is correctly-rounded by
spec; exp/ln are libm-dependent and excluded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import (
    DECIMAL,
    davg_sql,
    dsum,
    dsum_sql,
)
from lakehouse_architecture_spark.operators.skew import exact_quantiles
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- q04: EXISTS subquery -> left_semi (TPC-H Q4 shape) -------------------
def _q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    big_items = t["lineitem"].filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        t["orders"]
        .join(big_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q07: cross-nation trade matrix (two roles of the nation dim) ---------
def _q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cust_nat = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nat = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


_Q07_SQL = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS volume,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name < sn.n_name
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- q10: returned-item revenue per customer, top 20 ----------------------
def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- q13: order-count distribution (aggregate of an aggregate) ------------
def _q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("c_count").desc())
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY n_customers DESC, c_count DESC
"""


# --- q18: HAVING over a decimal-exact grouped sum + semi-join back --------
def _q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
    )


_Q18_SQL = f"""
SELECT c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {dsum_sql('l_quantity')} > 150.0
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


# --- q22: scalar subquery (decimal-exact avg) + anti-join -----------------
def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cust = t["customer"]
    # decimal-exact global average — a double avg could flip boundary rows.
    # Scalar stays in the plan as a broadcast cross join (the q11/q15 style):
    # no driver round-trip, so the whole query is one lazily-planned job.
    avg_bal = cust.agg(
        (F.sum(F.col("c_acctbal").cast(DECIMAL)).cast("double") / F.count("c_acctbal")).alias(
            "__avg_bal"
        )
    )
    # anti-join against high-value orders (every customer has *some* order,
    # so a bare anti-join would be empty at every sf)
    big = t["orders"].filter(F.col("o_totalprice") > 300000.0)
    rich_idle = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich_idle.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "total_bal"))
        .orderBy("c_mktsegment")
    )


_Q22_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers, {dsum_sql('c_acctbal')} AS total_bal
FROM customer
WHERE c_acctbal > (SELECT {davg_sql('c_acctbal')} FROM customer)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- correlated subquery: above own-nation average balance ----------------
def _q_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cust = t["customer"]
    nation_avg = cust.groupBy("c_nationkey").agg(
        (F.sum(F.col("c_acctbal").cast(DECIMAL)).cast("double") / F.count("c_acctbal")).alias(
            "nation_avg"
        )
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", F.round("nation_avg", 6).alias("nation_avg"))
        .orderBy("c_custkey")
    )


_Q_CORRELATED_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal, ROUND(nation_avg, 6) AS nation_avg
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) OVER w AS DOUBLE)
           / COUNT(c_acctbal) OVER w AS nation_avg
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey)
)
WHERE c_acctbal > nation_avg
ORDER BY c_custkey
"""


# --- IN subquery -> left_semi over parts ----------------------------------
def _q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    shipped97 = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_partkey")
    )
    return (
        t["part"]
        .join(shipped97, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("p_brand")
    )


_Q_IN_SUBQUERY_SQL = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                      AND l_shipdate <  TIMESTAMP '1998-01-01')
GROUP BY p_brand
ORDER BY p_brand
"""


# --- GROUPING SETS through the SQL entry point (EP3 surface) --------------
def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {dsum_sql('o_totalprice')} AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_Q_GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- math scalar belt (IEEE-exact subset) ---------------------------------
def _q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_diff"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.signum(F.col("p_retailprice") - 1500.0).alias("sign_vs_1500"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.greatest("p_size", F.lit(25)).alias("size_floor25"),
        F.least("p_size", F.lit(25)).alias("size_cap25"),
        F.round(F.col("p_retailprice") * 0.1, 4).alias("tithe"),
    )


_Q_MATH_FUNCS_SQL = """
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS abs_diff,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       ROUND(sqrt(p_retailprice), 6) AS price_sqrt,
       CAST(sign(p_retailprice - 1500.0) AS DOUBLE) AS sign_vs_1500,
       p_size % 7 AS size_mod7,
       greatest(p_size, 25) AS size_floor25,
       least(p_size, 25) AS size_cap25,
       ROUND(p_retailprice * 0.1, 4) AS tithe
FROM part
"""


# --- array / higher-order-function belt over embeddings -------------------
def _q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    v = F.col("embedding")
    as_double = F.transform(v, lambda x: x.cast("double"))
    return t["embeddings"].select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(F.element_at(as_double, 1), 6).alias("first_elem"),
        F.round(F.array_max(as_double), 6).alias("max_elem"),
        F.round(F.array_min(as_double), 6).alias("min_elem"),
        F.size(F.filter(as_double, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 6
        ).alias("l1_norm"),
        F.round(
            F.aggregate(F.slice(as_double, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
    )


_Q_ARRAY_FUNCS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS max_elem,
       ROUND(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS min_elem,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS INT) AS n_positive,
       ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
             (acc, x) -> acc + x), 6) AS l1_norm,
       ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
             (acc, x) -> acc + x), 6) AS head8_sum
FROM embeddings
"""


# --- explode / posexplode --------------------------------------------------
def _q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 5)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("val"))
        .orderBy("vec_id", "pos")
    )


_Q_EXPLODE_SQL = """
SELECT vec_id, CAST(d - 1 AS INT) AS pos,
       ROUND(CAST(embedding[d] AS DOUBLE), 6) AS val
FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) dims
WHERE vec_id < 5
ORDER BY vec_id, pos
"""


# --- analytic windows: ntile / percent_rank / cume_dist / first / last ----
def _q_analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
    )


_Q_ANALYTIC_WINDOWS_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


# --- exact percentile / median ---------------------------------------------
def _q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles via :func:`exact_quantiles` — bounded
    state everywhere (Spark's ``percentile`` aggregate would buffer one
    value→count map per group, the first 100 TB OOM)."""
    t = tables(spark, sf_dir)
    o = t["orders"].select("o_orderstatus", "o_totalprice")
    qtl = exact_quantiles(
        o,
        ["o_orderstatus"],
        "o_totalprice",
        {"__med": 0.5, "__p90": 0.9},
        bucket_width=500.0,  # price range ~5e5 -> ~1k counted buckets
    )
    base = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    return (
        base.join(F.broadcast(qtl), on="o_orderstatus")
        .select(
            "o_orderstatus",
            F.round("__med", 4).alias("median_price"),
            F.round("__p90", 4).alias("p90_price"),
            "n",
        )
        .orderBy("o_orderstatus")
    )


_Q_PERCENTILE_SQL = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- conditional aggregates: count_if / bool_and / bool_or / filter -------
def _q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.expr("count_if(l_quantity > 25)").alias("n_bulk"),
            F.expr("bool_and(l_discount <= 0.1)").alias("all_low_disc"),
            F.expr("bool_or(l_tax > 0.07)").alias("any_high_tax"),
            dsum(
                F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice")),
                "f_revenue",
            ),
        )
        .orderBy("l_returnflag")
    )


_Q_CONDITIONAL_AGG_SQL = f"""
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
       bool_and(l_discount <= 0.1) AS all_low_disc,
       bool_or(l_tax > 0.07) AS any_high_tax,
       {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_extendedprice END")} AS f_revenue
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- approximate aggregates, verified as bounded-error claims -------------
def _q_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct counts + approximate quantiles. The sketch VALUES are
    engine-specific (no cross-engine oracle can reproduce them), but their
    accuracy contract is checkable: emit the group keys, the exact
    aggregates, and booleans asserting each sketch estimate landed within
    its documented error bound — all deterministic, so the row hash-matches
    an oracle that computes the exact side and asserts the bounds as
    literals. Raw sketch values stay covered by tests/test_queries.py."""
    t = tables(spark, sf_dir)

    def within(approx, exact, tol, name):
        return ((F.abs(approx - exact) / exact) <= F.lit(tol)).alias(name)

    li = t["lineitem"].select("l_returnflag", "l_partkey", "l_orderkey", "l_extendedprice")
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("__ap"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("__ao"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("__am"),
        )
        # exact median via bounded-state two-phase rank, not the value-map
        # percentile aggregate (bit-compatible interpolation)
        .join(
            F.broadcast(
                exact_quantiles(
                    li,
                    ["l_returnflag"],
                    "l_extendedprice",
                    {"__exact_med": 0.5},
                    bucket_width=100.0,
                )
            ),
            on="l_returnflag",
        )
    )
    return (
        agg.select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            F.round("__exact_med", 4).alias("exact_median"),
            # rsd=0.02 → 5x headroom; approx_percentile default accuracy
            # (1e4) is near-exact at any per-group size we test
            within(F.col("__ap"), F.col("exact_parts"), 0.10, "parts_ok"),
            within(F.col("__ao"), F.col("exact_orders"), 0.10, "orders_ok"),
            within(F.col("__am"), F.col("__exact_med"), 0.05, "median_ok"),
        )
        .orderBy("l_returnflag")
    )


_Q_APPROX_AGGS_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
       TRUE AS parts_ok, TRUE AS orders_ok, TRUE AS median_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


RELATIONAL2_QUERIES: list[QuerySpec] = [
    QuerySpec("q04_priority_exists", "EXISTS subquery via left_semi", _q04, _Q04_SQL),
    QuerySpec("q07_trade_matrix", "dimension in two roles (self-aliased join)", _q07, _Q07_SQL),
    QuerySpec("q10_returned_revenue", "filtered 3-way join, top-20", _q10, _Q10_SQL),
    QuerySpec("q13_order_distribution", "aggregate of an aggregate", _q13, _Q13_SQL),
    QuerySpec("q18_large_orders", "HAVING over decimal-exact grouped sum", _q18, _Q18_SQL),
    QuerySpec("q22_rich_idle", "scalar subquery + anti-join", _q22, _Q22_SQL),
    QuerySpec("q_correlated_subquery", "per-group average threshold (correlated)", _q_correlated, _Q_CORRELATED_SQL),
    QuerySpec("q_in_subquery", "IN subquery via left_semi", _q_in_subquery, _Q_IN_SUBQUERY_SQL),
    QuerySpec("q_grouping_sets", "GROUPING SETS via the SQL entry point", _q_grouping_sets, _Q_GROUPING_SETS_SQL),
    QuerySpec("q_math_funcs", "IEEE-exact math scalar belt", _q_math_funcs, _Q_MATH_FUNCS_SQL),
    QuerySpec("q_array_funcs", "array + higher-order functions", _q_array_funcs, _Q_ARRAY_FUNCS_SQL),
    QuerySpec("q_explode", "posexplode to long form", _q_explode, _Q_EXPLODE_SQL),
    QuerySpec("q_analytic_windows", "ntile/percent_rank/cume_dist/first_value", _q_analytic_windows, _Q_ANALYTIC_WINDOWS_SQL),
    QuerySpec("q_percentile", "exact interpolated percentiles", _q_percentile, _Q_PERCENTILE_SQL),
    QuerySpec("q_conditional_agg", "count_if / bool_and / bool_or / filtered sum", _q_conditional_agg, _Q_CONDITIONAL_AGG_SQL),
    QuerySpec("q_approx_aggs", "HLL++/approx-percentile bounded-error claims", _q_approx_aggs, _Q_APPROX_AGGS_SQL),
]
