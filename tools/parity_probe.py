"""One-off probe: verify Spark<->DuckDB parity assumptions for the oracle.

Not part of the engine; used during development to confirm which SQL
constructs produce bit-identical results in both engines.
"""

import duckdb

con = duckdb.connect()

probes = {
    "decimal_cast": "SELECT CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) FROM (VALUES (1.1),(2.23456789),(3.3)) t(x)",
    "hex_to_bigint": "SELECT CAST(('0x' || substr(md5('hello'),1,15)) AS BIGINT)",
    "md5_number": "SELECT md5_number_lower('hello')",
    "regexp_extract": "SELECT regexp_extract('abc 123,45 m2', '[0-9,.]+', 0)",
    "regexp_extract_grp": "SELECT regexp_extract('abc 123 def', '([0-9]+)', 1)",
    "json_extract": """SELECT json_extract_string('{"a": 1, "b": "x"}', '$.b')""",
    "list_cosine": "SELECT list_cosine_similarity([1.0,2.0,3.0], [4.0,5.0,6.0])",
    "list_dot": "SELECT list_dot_product([1.0,2.0], [3.0,4.0])",
    "split_count": "SELECT len(regexp_split_to_array(trim('  a b  c '), '\\s+'))",
    "date_trunc": "SELECT date_trunc('hour', TIMESTAMP '2024-01-02 03:45:11')",
    "strftime": "SELECT strftime(TIMESTAMP '2024-01-02 03:45:11', '%Y-%m-%d')",
    "asof": "SELECT 1 FROM (VALUES (1)) a(x) ASOF JOIN (VALUES (0)) b(y) ON b.y <= a.x",
    "bitshift": "SELECT (CAST(('0x' || substr(md5('a'),1,15)) AS BIGINT) >> 3) & 1",
    "generate_series": "SELECT unnest(generate_series(0, 3))",
    "cube": "SELECT x, sum(y) FROM (VALUES ('a',1)) t(x,y) GROUP BY CUBE(x)",
    "stddev": "SELECT stddev_samp(x), var_samp(x) FROM (VALUES (1.0),(2.0),(3.0)) t(x)",
    "percentile": "SELECT quantile_cont(x, 0.5) FROM (VALUES (1.0),(2.0),(3.0),(10.0)) t(x)",
    "array_index": "SELECT ([10,20,30])[1]",
    "lower_unicode": "SELECT lower('TỶ ĐỒng')",
    "levenshtein": "SELECT levenshtein('kitten','sitting')",
    "bit_count": "SELECT bit_count(CAST(7 AS BIGINT))",
    "xor": "SELECT xor(CAST(5 AS BIGINT), CAST(3 AS BIGINT))",
}

for name, sql in probes.items():
    try:
        print(f"{name:18s} -> {con.execute(sql).fetchall()}")
    except Exception as e:  # noqa: BLE001
        print(f"{name:18s} -> ERROR: {type(e).__name__}: {str(e).splitlines()[0][:120]}")
