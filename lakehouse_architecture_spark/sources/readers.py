"""Bronze readers — schema-explicit, executor-side, corrupt-record tolerant.

The reference reads bronze two ways, both replaced here:

* ``spark.read.option("multiLine","true").json(glob)`` with inferred schema
  (``airflow/dags/realestate_pipeline.py:127-131``) — inference produces
  unstable wide schemas across crawl batches (dynamic Vietnamese attribute
  keys, SURVEY.md §1.2/§7.4).
* driver-side boto3 GET + ``json.loads`` + ``sc.parallelize`` round-trip
  (``app/sliver.py:123-139``) — ships the whole batch through the driver.

This engine always reads with an **explicit schema** (stable columns +
``attrs: map<string,string>`` for the dynamic keys), in PERMISSIVE mode with
a corrupt-record column so garbage files degrade to quarantined rows instead
of failed jobs (the reference's skip-and-move, ``app/sliver.py:124-136``,
done declaratively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Stable bronze listing schema (FIXTURES.md A1). Dynamic Vietnamese-labelled
#: attributes ride in ``attrs`` instead of becoming inferred columns.
LISTING_SCHEMA = T.StructType(
    [
        T.StructField("list_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("images", T.ArrayType(T.StringType())),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_bronze_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType = LISTING_SCHEMA,
    multi_line: bool = True,
) -> DataFrame:
    """Executor-side JSON scan with explicit schema + corrupt quarantine."""
    return (
        spark.read.schema(schema)
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumn("_ingest_file", F.input_file_name())
    )


def read_bronze_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """CSV fallback (DAG drop-file path, realestate_pipeline.py:133-137).

    With a schema, malformed lines quarantine into ``_corrupt_record``
    (the same bronze contract as the JSON reader — PERMISSIVE without a
    user schema is a no-op, so inference mode cannot quarantine; pass a
    schema for untrusted drops)."""
    reader = spark.read.option("header", True).option("mode", "PERMISSIVE")
    if schema is not None:
        if "_corrupt_record" not in [f.name for f in schema.fields]:
            schema = schema.add("_corrupt_record", T.StringType())
        reader = reader.schema(schema).option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.csv(path).withColumn("_ingest_file", F.input_file_name())
