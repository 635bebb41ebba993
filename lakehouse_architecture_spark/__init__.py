"""lakehouse_architecture_spark — a PySpark-native analytics engine.

A clean-room, Spark-first rebuild of the capabilities of the reference
lakehouse (theanhtran18/lakehouse-architecture): medallion bronze→silver→gold
pipeline, full relational operator surface, incremental/streaming ingest, and
the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) the 100 TB design point calls for.

Everything is expressed through the DataFrame/SQL API so Catalyst + Tungsten
pick the physical strategy; Python UDFs appear only as Arrow-vectorized
Pandas UDFs in the few places built-ins cannot express the semantics.
"""

from lakehouse_architecture_spark.session import SessionFactory, get_spark
from lakehouse_architecture_spark.catalog import Catalog, load_tables

__all__ = ["SessionFactory", "get_spark", "Catalog", "load_tables"]

__version__ = "0.1.0"
