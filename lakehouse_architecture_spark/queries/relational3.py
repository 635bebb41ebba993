"""Third coverage batch: map functions, RANGE window frames, deterministic
hash sampling, and the long tail of string functions.

Hash sampling note: ``df.sample()`` draws from an engine-private RNG, so two
engines can never agree row-for-row. The scalable, reproducible alternative
is systematic hash sampling — ``md5hash(key) % N < k`` — which is exactly
oracle-checkable, stable under retries/partitioning, and the standard way to
carve deterministic subsets of a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_architecture_spark.functions.aggregates import dsum, dsum_sql
from lakehouse_architecture_spark.functions.hashing import md5_hash64, md5_hash64_sql
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- map functions over JSON-derived maps ---------------------------------
def _q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return (
        t["events"]
        .withColumn("m", m)
        .select(
            "event_id",
            F.array_join(F.map_keys("m"), ",").alias("keys_csv"),
            F.element_at(F.col("m"), "k").alias("k_value"),
            F.size("m").alias("n_entries"),
            F.array_join(
                F.transform(F.map_values("m"), lambda v: v.cast("string")), ","
            ).alias("values_csv"),
        )
        .orderBy("event_id")
    )


_Q_MAP_FUNCS_SQL = """
SELECT event_id,
       array_to_string(json_keys(props), ',') AS keys_csv,
       TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       CAST(len(json_keys(props)) AS INT) AS n_entries,
       array_to_string(list_transform(json_keys(props),
            k -> json_extract_string(props, '$.' || k)), ',') AS values_csv
FROM events
ORDER BY event_id
"""


# --- RANGE window frame: trailing 7-day revenue per supplier --------------
def _q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_suppkey") <= 3).withColumn(
        # l_shipdate is TIMESTAMP_NTZ; cast to TIMESTAMP is instant-identical
        # under the pinned UTC session, and unix_micros needs it
        "ship_day",
        F.floor(
            F.unix_micros(F.col("l_shipdate").cast("timestamp")) / F.lit(86_400_000_000)
        ).cast("long"),
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("ship_day")
        .rangeBetween(-7, 0)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "ship_day",
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(w).cast("double"),
                4,
            ).alias("trailing7d_qty"),
        )
        .orderBy("l_suppkey", "ship_day", "l_orderkey", "l_linenumber")
    )


_Q_RANGE_FRAME_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber, ship_day,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (
         PARTITION BY l_suppkey ORDER BY ship_day
         RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS trailing7d_qty
FROM (
  SELECT *, epoch_us(l_shipdate) // 86400000000 AS ship_day
  FROM lineitem WHERE l_suppkey <= 3
)
ORDER BY l_suppkey, ship_day, l_orderkey, l_linenumber
"""


# --- deterministic hash sampling ------------------------------------------
def _q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # ~5% systematic sample keyed on the order id — reproducible anywhere
    sampled = t["orders"].filter(
        md5_hash64(F.col("o_orderkey").cast("string")) % 100 < 5
    )
    return sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        dsum("o_totalprice", "sampled_total"),
    ).orderBy("o_orderstatus")


_Q_HASH_SAMPLE_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_sampled,
       {dsum_sql('o_totalprice')} AS sampled_total
FROM orders
WHERE {md5_hash64_sql("CAST(o_orderkey AS VARCHAR)")} % 100 < 5
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- string long tail ------------------------------------------------------
def _q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.lpad("p_brand", 12, "0").alias("brand_pad"),
        F.reverse("p_name").alias("name_rev"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_upvowel"),
        F.substring_index("p_type", " ", 1).alias("type_first_word"),
        F.repeat(F.lit("ab"), 3).alias("abx3"),
        F.left(F.col("p_name"), F.lit(5)).alias("name_left5"),
        F.right(F.col("p_name"), F.lit(4)).alias("name_right4"),
        F.instr("p_name", "o").alias("first_o"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.split_part("p_type", F.lit(" "), F.lit(-1)).alias("type_last_word"),
    )


_Q_STRING_FUNCS2_SQL = """
SELECT p_partkey,
       lpad(p_brand, 12, '0') AS brand_pad,
       reverse(p_name) AS name_rev,
       translate(p_type, 'aeiou', 'AEIOU') AS type_upvowel,
       split_part(p_type, ' ', 1) AS type_first_word,
       repeat('ab', 3) AS abx3,
       left(p_name, 5) AS name_left5,
       right(p_name, 4) AS name_right4,
       CAST(instr(p_name, 'o') AS INT) AS first_o,
       trim('  pad  ') AS trimmed,
       split_part(p_type, ' ', -1) AS type_last_word
FROM part
"""


# --- date arithmetic belt ---------------------------------------------------
def _q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    d = F.to_date("o_orderdate")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
            (F.dayofweek(d) - 1).alias("dow"),  # Spark 1=Sun -> DuckDB 0=Sun
            F.quarter(d).alias("qtr"),
            F.dayofmonth(d).alias("dom"),
            F.month(d).alias("mth"),
        )
        .orderBy("o_orderkey")
    )


_Q_DATE_ARITH_SQL = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(month(o_orderdate) AS INT) AS mth
FROM orders
ORDER BY o_orderkey
"""


# --- null-handling belt ------------------------------------------------------
def _q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # left join produces genuine NULLs to exercise the belt
    joined = t["customer"].join(
        t["orders"].filter(F.col("o_totalprice") > 300000.0),
        F.col("c_custkey") == F.col("o_custkey"),
        "left",
    )
    return (
        joined.select(
            "c_custkey",
            F.col("o_orderkey").alias("big_order_key"),
            F.coalesce("o_totalprice", F.lit(-1.0)).alias("price_or_default"),
            F.isnull("o_orderkey").alias("has_no_big_order"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nonbuilding"),
            F.nvl2(F.col("o_orderkey"), F.lit("yes"), F.lit("no")).alias("flag"),
        )
        .orderBy("c_custkey", "big_order_key")
    )


_Q_NULL_FUNCS_SQL = """
SELECT c_custkey,
       o_orderkey AS big_order_key,
       coalesce(o_totalprice, -1.0) AS price_or_default,
       o_orderkey IS NULL AS has_no_big_order,
       nullif(c_mktsegment, 'BUILDING') AS seg_nonbuilding,
       CASE WHEN o_orderkey IS NOT NULL THEN 'yes' ELSE 'no' END AS flag
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0)
       ON c_custkey = o_custkey
ORDER BY c_custkey, big_order_key
"""


# --- bitwise operations ------------------------------------------------------
def _q_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    k = F.col("p_partkey")
    return t["part"].select(
        "p_partkey",
        (k.bitwiseAND(F.lit(255))).alias("low_byte"),
        (k.bitwiseOR(F.lit(4096))).alias("with_flag"),
        (k.bitwiseXOR(F.col("p_size").cast("bigint"))).alias("xored"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).alias("popcount"),
    )


_Q_BIT_OPS_SQL = """
SELECT p_partkey,
       p_partkey & 255 AS low_byte,
       p_partkey | 4096 AS with_flag,
       xor(p_partkey, CAST(p_size AS BIGINT)) AS xored,
       p_partkey << 3 AS shl3,
       p_partkey >> 2 AS shr2,
       CAST(bit_count(p_partkey) AS INT) AS popcount
FROM part
"""


# --- explicit cross join (small x small, intentionally cartesian) ----------
def _q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # deliberate cartesian of two tiny dims — the one place a cross product
    # is the right plan (5 x 25 rows); fact-side cross joins stay banned by
    # the plan guards
    return (
        t["region"]
        .crossJoin(t["nation"])
        .select(
            "r_name",
            "n_name",
            (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
        )
        .orderBy("r_name", "n_name")
    )


_Q_CROSS_JOIN_SQL = """
SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
"""


# --- regexp_extract_all: all matches per row as a joined list --------------
def _q_regexp_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.array_join(
            F.regexp_extract_all("p_name", F.lit(r"[a-z]{5,}"), 0), ","
        ).alias("long_words"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[a-z]{5,}"), 0)).alias(
            "n_long_words"
        ),
    ).orderBy("p_partkey")


# COALESCE: DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
_Q_REGEXP_ALL_SQL = """
SELECT p_partkey,
       COALESCE(array_to_string(regexp_extract_all(p_name, '[a-z]{5,}'), ','), '') AS long_words,
       CAST(len(regexp_extract_all(p_name, '[a-z]{5,}')) AS INT) AS n_long_words
FROM part
ORDER BY p_partkey
"""


# --- array/string aggregation (deterministic: sorted before joining) -------
def _q_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # collect_set order is partition-dependent; sort_array makes the result
    # well-defined — the only safe way to compare (or ship) collected arrays
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("o_custkey")), 1, 5).cast(
                    "array<string>"
                ),
                ",",
            ).alias("first5_custkeys"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# FILTER (WHERE ... IS NOT NULL) mirrors Spark's collect_set/collect_list
# null-dropping so the oracle stays equivalent even if the data ever grows
# NULLs in these columns.
_Q_COLLECT_SQL = """
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)
           FILTER (WHERE o_orderstatus IS NOT NULL)), ',') AS statuses,
       array_to_string(list_transform(
           list_sort(list(o_custkey) FILTER (WHERE o_custkey IS NOT NULL))[1:5],
           x -> CAST(x AS VARCHAR)), ',') AS first5_custkeys,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- unpivot via stack ------------------------------------------------------
def _q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["part"]
        .selectExpr(
            "p_partkey",
            "stack(2, 'size', CAST(p_size AS DOUBLE),"
            " 'retailprice', p_retailprice) AS (metric, value)",
        )
        .orderBy("p_partkey", "metric")
    )


_Q_UNPIVOT_SQL = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice', p_retailprice FROM part
ORDER BY p_partkey, metric
"""


# --- min_by / max_by (deterministic: unique ordering value) ----------------
def _q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.expr("max_by(o_orderstatus, o_orderkey)").alias("latest_key_status"),
            F.expr("min_by(o_totalprice, o_orderkey)").alias("first_key_price"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_custkey")
    )


_Q_MINMAX_BY_SQL = """
SELECT o_custkey,
       arg_max(o_orderstatus, o_orderkey) AS latest_key_status,
       arg_min(o_totalprice, o_orderkey) AS first_key_price,
       MAX(o_orderkey) AS max_key
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
"""


# --- equi-width histogram (two-pass: min/max broadcast, then one agg) ------
_HIST_BINS = 20


def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed equi-width histogram: pass 1 reduces to a (min, max)
    scalar pair (broadcast back in — no driver round-trip), pass 2 buckets
    every row with pure arithmetic and hash-aggregates the counts. The
    classic two-scan profile shape; both scans are full-speed columnar
    reads of ONE column and the groupBy keys are `_HIST_BINS` values, so
    the final shuffle is trivially small at any corpus size."""
    t = tables(spark, sf_dir)
    li = t["lineitem"].select(F.col("l_extendedprice").alias("x"))
    stats = li.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / F.lit(float(_HIST_BINS))
    bucket = F.least(
        F.floor((F.col("x") - F.col("mn")) / width), F.lit(_HIST_BINS - 1)
    ).cast("int")
    return (
        li.crossJoin(F.broadcast(stats))
        .withColumn("bucket", bucket)
        .withColumn("bin_lo", F.round(F.col("mn") + F.col("bucket") * width, 6))
        .groupBy("bucket", "bin_lo")
        .agg(F.count(F.lit(1)).alias("n"), dsum("x", "total"))
        .orderBy("bucket")
    )


_Q_HISTOGRAM_SQL = f"""
WITH s AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
           FROM lineitem),
b AS (
  SELECT CAST(LEAST(FLOOR((l_extendedprice - mn) / ((mx - mn) / {float(_HIST_BINS)!r})),
                    {_HIST_BINS - 1}) AS INT) AS bucket,
         l_extendedprice AS x, mn, mx
  FROM lineitem, s
)
SELECT bucket,
       ROUND(mn + bucket * ((mx - mn) / {float(_HIST_BINS)!r}), 6) AS bin_lo,
       COUNT(*) AS n,
       {dsum_sql('x')} AS total
FROM b
GROUP BY bucket, mn, mx
ORDER BY bucket
"""


RELATIONAL3_QUERIES: list[QuerySpec] = [
    QuerySpec("q_histogram", "two-pass equi-width histogram", _q_histogram, _Q_HISTOGRAM_SQL),
    QuerySpec("q_map_funcs", "map functions over JSON-derived maps", _q_map_funcs, _Q_MAP_FUNCS_SQL),
    QuerySpec("q_range_frame", "RANGE window frame (trailing 7 days)", _q_range_frame, _Q_RANGE_FRAME_SQL),
    QuerySpec("q_hash_sample", "deterministic systematic hash sampling", _q_hash_sample, _Q_HASH_SAMPLE_SQL),
    QuerySpec("q_string_funcs2", "string function long tail", _q_string_funcs2, _Q_STRING_FUNCS2_SQL),
    QuerySpec("q_unpivot", "unpivot wide->long via stack", _q_unpivot, _Q_UNPIVOT_SQL),
    QuerySpec("q_minmax_by", "min_by/max_by with unique ordering key", _q_minmax_by, _Q_MINMAX_BY_SQL),
    QuerySpec("q_date_arith", "date arithmetic belt (add/diff/last_day/dow)", _q_date_arith, _Q_DATE_ARITH_SQL),
    QuerySpec("q_null_funcs", "null-handling belt (coalesce/nullif/nvl2)", _q_null_funcs, _Q_NULL_FUNCS_SQL),
    QuerySpec("q_bit_ops", "bitwise operation belt", _q_bit_ops, _Q_BIT_OPS_SQL),
    QuerySpec("q_collect", "deterministic collect_set/collect_list aggregation", _q_collect, _Q_COLLECT_SQL),
    QuerySpec("q_cross_join", "explicit small-dim cross join", _q_cross_join, _Q_CROSS_JOIN_SQL),
    QuerySpec("q_regexp_all", "regexp_extract_all per-row match lists", _q_regexp_all, _Q_REGEXP_ALL_SQL),
]
