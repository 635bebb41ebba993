"""Driver-contract smoke tests: entry(), queries(), oracle_sql() wiring."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_queries_and_oracles_aligned():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 50
    # every oracle key has a matching query
    assert set(oracles) <= set(qs)
    # only sketch-based queries may lack an oracle (rows-only check)
    assert set(qs) - set(oracles) == {"q_approx_aggs"}


def test_multimodal_stub_plumbing(spark):
    from lakehouse_architecture_spark.operators.multimodal import decode_image_stub
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, b"\x89PNG fake")], "id int, payload binary")
    out = decode_image_stub(df, "payload").collect()
    assert out[0]["width"] is None
    assert "not installed" in out[0]["decode_error"]  # stub captured, not raised
