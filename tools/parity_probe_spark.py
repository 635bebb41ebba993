"""Spark side of the parity probes — compare against tools/parity_probe.py."""

from lakehouse_architecture_spark.session import get_spark

spark = get_spark("parity_probe")

probes = {
    "decimal_cast": "SELECT CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) FROM VALUES (1.1d),(2.23456789d),(3.3d) t(x)",
    "hex_to_bigint": "SELECT CAST(conv(substr(md5('hello'),1,15), 16, 10) AS BIGINT)",
    "regexp_extract": "SELECT regexp_extract('abc 123,45 m2', '[0-9,.]+', 0)",
    "json_extract": """SELECT get_json_object('{"a": 1, "b": "x"}', '$.b')""",
    "split_count": "SELECT size(split(trim('  a b  c '), '\\\\s+'))",
    "date_trunc": "SELECT date_trunc('hour', TIMESTAMP '2024-01-02 03:45:11')",
    "date_format": "SELECT date_format(TIMESTAMP '2024-01-02 03:45:11', 'yyyy-MM-dd')",
    "bitshift": "SELECT shiftright(CAST(conv(substr(md5('a'),1,15),16,10) AS BIGINT), 3) & 1",
    "cube": "SELECT x, sum(y) FROM VALUES ('a',1) t(x,y) GROUP BY CUBE(x)",
    "stddev": "SELECT stddev_samp(x), var_samp(x) FROM VALUES (1.0d),(2.0d),(3.0d) t(x)",
    "lower_unicode": "SELECT lower('TỶ ĐỒng')",
    "levenshtein": "SELECT levenshtein('kitten','sitting')",
    "bit_count": "SELECT bit_count(CAST(7 AS BIGINT))",
    "dot_aggregate": "SELECT aggregate(zip_with(array(1.0d,2.0d), array(3.0d,4.0d), (a,b) -> a*b), 0d, (acc,v) -> acc+v)",
    "sequence": "SELECT explode(sequence(0,3))",
}

for name, sql in probes.items():
    try:
        rows = spark.sql(sql).collect()
        print(f"{name:18s} -> {[tuple(r) for r in rows]}")
    except Exception as e:  # noqa: BLE001
        print(f"{name:18s} -> ERROR: {type(e).__name__}: {str(e).splitlines()[0][:120]}")

spark.stop()
