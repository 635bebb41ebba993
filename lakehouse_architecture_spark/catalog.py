"""Catalog — table paths, formats, and view registration.

Replaces the reference's hand-built object-store key strings
(``app/sliver.py:161-171`` builds ``silver/date=YYYY-MM-DD/...`` by string
concatenation) with a declarative table registry: every table has a root
path, a format, and an optional partition spec, and partitioned writes go
through Spark's native ``partitionBy`` so readers get real partition pruning
(the reference's hand-written layout never registered the partition column,
so its own reads could not prune — SURVEY.md §4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The driver-generated benchmark tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class TableSpec:
    name: str
    path: str
    format: str = "parquet"
    partition_by: tuple[str, ...] = ()
    options: dict[str, str] = field(default_factory=dict)
    #: numeric columns whose per-file min/max stats are maintained in the
    #: catalog's manifest — range predicates on these prune the file list
    #: at plan time (sources/manifest.py); typically the z-order clustering
    #: columns (operators/partitioning.zordered_write keeps their boxes
    #: tight)
    stats_cols: tuple[str, ...] = ()
    #: high-cardinality columns with a per-file BLOOM manifest — equality
    #: predicates on these skip files the bloom rejects (no false
    #: negatives); the min/max boxes can't help a point lookup unless the
    #: table happens to be sorted by that column
    bloom_cols: tuple[str, ...] = ()
    #: bloom sizing: None = auto-size each file's filter from its own key
    #: count (~10 bits/key — sources/manifest._auto_bloom_bits; a fixed
    #: size saturates on big files and the read path silently degrades to
    #: a full scan + residual filter); set an int to pin the bit count
    bloom_bits: int | None = None
    bloom_hashes: int = 4


class Catalog:
    """Path+format registry with read/write helpers.

    Keeps all physical-layout decisions (format, partition columns, write
    options) out of job code, the way the Hive Metastore does for the
    reference's Thrift/BI path (``docker-compose.yml:21-35``) — but without
    requiring a metastore service for local/test use.
    """

    def __init__(self, spark: SparkSession, root: str | None = None) -> None:
        self.spark = spark
        self.root = root
        self._tables: dict[str, TableSpec] = {}
        self._manifests: dict[str, DataFrame] = {}

    def register(self, spec: TableSpec) -> TableSpec:
        self._tables[spec.name] = spec
        self._drop_manifests(spec.name)
        return spec

    def _drop_manifests(self, name: str) -> None:
        """Invalidate the stats manifest AND every bloom manifest of a
        table (bloom caches key as ``name#bloom:<col>``)."""
        self._manifests.pop(name, None)
        for k in [k for k in self._manifests if k.startswith(f"{name}#bloom:")]:
            self._manifests.pop(k, None)

    def table_spec(self, name: str) -> TableSpec:
        return self._tables[name]

    def define(
        self,
        name: str,
        relpath: str | None = None,
        format: str = "parquet",
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
        bloom_cols: tuple[str, ...] = (),
        bloom_bits: int | None = None,
        bloom_hashes: int = 4,
        **options: str,
    ) -> TableSpec:
        path = os.path.join(self.root, relpath or name) if self.root else (relpath or name)
        return self.register(
            TableSpec(
                name,
                path,
                format,
                partition_by,
                options,
                stats_cols,
                bloom_cols,
                bloom_bits,
                bloom_hashes,
            )
        )

    def read(
        self,
        name: str,
        where: tuple[str, float | None, float | None] | None = None,
    ) -> DataFrame:
        """Read a table; with ``where=(col, lo, hi)`` the read is
        manifest-pruned when ``col`` is one of the table's ``stats_cols``:
        the catalog's per-file min/max manifest turns the range predicate
        into an explicit file list BEFORE Spark plans the scan, and the
        residual predicate still applies (pruning is a superset filter).
        This makes pruning the DEFAULT read path for range predicates on
        clustered tables — callers never touch the manifest API. On a
        non-stats column the same call degrades to scan + filter, so query
        code is layout-independent.

        An EQUALITY predicate (``lo == hi``) on a ``bloom_cols`` column
        routes through the per-file bloom manifest instead — the point-
        lookup path min/max boxes cannot serve on an unsorted column.
        """
        spec = self._tables[name]
        if where is not None:
            col, lo, hi = where
            if (
                spec.format == "parquet"
                and col in spec.bloom_cols
                and lo is not None
                and lo == hi
            ):
                from lakehouse_architecture_spark.sources.manifest import (
                    bloom_pruned_read,
                )

                return bloom_pruned_read(
                    self.spark,
                    spec.path,
                    self.bloom_manifest(name, col),
                    col,
                    lo,
                    options=spec.options,
                )
            if spec.format == "parquet" and col in spec.stats_cols:
                from lakehouse_architecture_spark.sources.manifest import (
                    pruned_read,
                )

                return pruned_read(
                    self.spark,
                    spec.path,
                    self.manifest(name),
                    col,
                    lo,
                    hi,
                    options=spec.options,
                )
        df = self._plain_read(spec)
        if where is not None:
            col, lo, hi = where
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def _plain_read(self, spec: TableSpec) -> DataFrame:
        reader = self.spark.read.format(spec.format)
        for k, v in spec.options.items():
            reader = reader.option(k, v)
        return reader.load(spec.path)

    def manifest(self, name: str) -> DataFrame:
        """The table's per-file stats manifest (built lazily on first use,
        cached; invalidated by :meth:`write` / :meth:`register`, refreshed
        incrementally by :meth:`refresh_stats` after out-of-band appends)."""
        spec = self._tables[name]
        if not spec.stats_cols:
            raise ValueError(f"table {name!r} declares no stats_cols")
        if name not in self._manifests:
            from lakehouse_architecture_spark.sources.manifest import file_manifest

            self._manifests[name] = file_manifest(
                self.spark, spec.path, list(spec.stats_cols)
            ).localCheckpoint(eager=True)
        return self._manifests[name]

    def bloom_manifest(self, name: str, col: str) -> DataFrame:
        """The table's per-file bloom for ``col`` (built lazily, cached per
        (table, column); invalidated by :meth:`write` / :meth:`register`)."""
        spec = self._tables[name]
        if col not in spec.bloom_cols:
            raise ValueError(f"table {name!r} declares no bloom for {col!r}")
        key = f"{name}#bloom:{col}"
        if key not in self._manifests:
            from lakehouse_architecture_spark.sources.manifest import (
                file_bloom_manifest,
            )

            self._manifests[key] = file_bloom_manifest(
                self.spark,
                spec.path,
                col,
                num_bits=spec.bloom_bits,
                num_hashes=spec.bloom_hashes,
            ).localCheckpoint(eager=True)
        return self._manifests[key]

    def refresh_stats(self, name: str) -> DataFrame | None:
        """Incrementally refresh the manifest after appends — O(new files),
        never O(table) (sources/manifest.refresh_manifest). Cached BLOOM
        manifests are dropped here too (rebuilt lazily over the new file
        listing): a stale bloom that omits appended files would silently
        skip them — a false negative, the one failure mode blooms must
        never have. Returns None for a table with no ``stats_cols`` (the
        bloom invalidation still happens)."""
        spec = self._tables[name]
        for k in [
            k for k in self._manifests if k.startswith(f"{name}#bloom:")
        ]:
            self._manifests.pop(k, None)
        if not spec.stats_cols:
            return None
        if name in self._manifests:
            from lakehouse_architecture_spark.sources.manifest import (
                refresh_manifest,
            )

            # materialize eagerly like the build path: the refreshed
            # manifest unions a LAZY footer-read subtree for the new files,
            # and caching it unmaterialized would re-run those distributed
            # footer reads on every subsequent pruned read
            self._manifests[name] = refresh_manifest(
                self.spark, self._manifests[name], spec.path, list(spec.stats_cols)
            ).localCheckpoint(eager=True)
            return self._manifests[name]
        return self.manifest(name)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        spec = self._tables[name]
        writer = df.write.format(spec.format).mode(mode)
        if spec.partition_by:
            writer = writer.partitionBy(*spec.partition_by)
        for k, v in spec.options.items():
            writer = writer.option(k, v)
        writer.save(spec.path)
        # stats are stale now; next pruned read rebuilds (or caller calls
        # refresh_stats for the O(new files) path after an append)
        self._drop_manifests(name)

    def create_view(self, name: str) -> DataFrame:
        df = self.read(name)
        df.createOrReplaceTempView(name)
        return df

    def save_as_table(
        self,
        df: DataFrame,
        name: str,
        format: str = "parquet",
        partition_by: tuple[str, ...] = (),
        mode: str = "overwrite",
        bucket_by: tuple[int, tuple[str, ...]] | None = None,
        sort_by: tuple[str, ...] = (),
    ) -> None:
        """Register ``df`` in the session catalog as a named table.

        With a Hive-enabled session (``SessionFactory(hive_warehouse=...)``)
        the table definition lands in the metastore and survives the
        session — the persistent-catalog contract the reference gets from
        its Hive metastore + Thrift server (SURVEY.md S14/S15): a fresh
        session pointed at the same warehouse sees and queries the table by
        name, which is exactly what a BI/JDBC user needs. On a plain
        session this still works, scoped to the in-memory catalog.

        ``bucket_by=(n, cols)`` hash-buckets the table on ``cols`` into
        ``n`` buckets (optionally ``sort_by`` within each bucket) — the
        100 TB lever for repeated fact-fact joins: two tables bucketed the
        same way join with NO shuffle at read time, because the bucketing
        metadata lets Catalyst prove co-partitioning. Bucketed tables
        require the catalog (``saveAsTable``), which is why this lives
        here and not in sources/writers.
        """
        if sort_by and bucket_by is None:
            # Spark's sortBy requires bucketBy; silently dropping the sort
            # would let callers believe per-file order (and the pruning it
            # buys) is in place when it is not
            raise ValueError("sort_by requires bucket_by (Spark sortBy rule)")
        writer = df.write.format(format).mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if bucket_by is not None:
            n, cols = bucket_by
            writer = writer.bucketBy(n, *cols)
            if sort_by:
                writer = writer.sortBy(*sort_by)
        writer.saveAsTable(name)


#: Testdata columns written as parquet TIMESTAMP(NANOS) — Spark has no nanos
#: timestamp type, so they are read as long (nanosAsLong) and truncated to
#: microseconds, which is exactly what DuckDB does when it reads the same
#: files (TIMESTAMP_NS → TIMESTAMP, verified).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables and register temp views.

    Views let operators be written either via the DataFrame API or
    ``spark.sql`` — Catalyst produces the same plan for both, and the SQL
    path is exactly what the reference's Thrift/BI entry point (SURVEY.md
    EP3) exposes.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        for c in _NANO_TS_COLS.get(name, ()):
            if c in df.columns and dict(df.dtypes)[c] == "bigint":
                # integer div — nanos exceed double's 2^53 exact range, so
                # a float division here would corrupt timestamps
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
