"""Custom Python DataSource (Spark 4 pyspark.sql.datasource API).

A first-class, partition-parallel synthetic listing generator registered as
``spark.read.format("synthetic_listings")`` — the idiomatic Spark 4 way to
plug a bespoke source into the planner (the reference's equivalent is the
driver-side HTTP crawler, ``app/bronze.py``; this source shows how such an
ingest becomes executor-parallel when the upstream supports keyed reads).

Rows are a pure function of the row index (md5-seeded), so any reader at
any parallelism produces the identical table — the same determinism rule
the rest of the engine follows.

Options: ``rows`` (total row count, default 100), ``partitions``
(parallelism, default 4).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "list_id string, title string, price string, address string, "
    "area string, bedrooms string"
)

_CITIES = ("HCM", "HN", "DN", "Hue", "Cantho")


def _h(i: int, field: str) -> int:
    return int(hashlib.md5(f"{i}:{field}".encode()).hexdigest()[:12], 16)


def _row(i: int) -> tuple:
    price_style = _h(i, "style") % 3
    amount = _h(i, "amt") % 95 + 5
    if price_style == 0:
        price = f"{amount // 10},{amount % 10} tỷ"
    elif price_style == 1:
        price = f"{amount * 10} triệu"
    else:
        price = str(amount * 100_000_000)
    return (
        str(i),
        f"Listing {i}",
        price,
        _CITIES[_h(i, "city") % len(_CITIES)],
        f"{_h(i, 'area') % 150 + 20} m²",
        str(_h(i, "beds") % 5 + 1),
    )


class _Partition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticListingsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 100))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self):
        if self.n_rows <= 0:
            return [_Partition(0, 0)]  # the API requires >= 1 partition
        step = -(-self.n_rows // self.n_parts)  # ceil div
        return [
            _Partition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticListingsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: offsets are row indices, so a
    micro-batch [start, end) is exactly reproducible — ``readBetweenOffsets``
    (the crash-replay path Structured Streaming calls when a batch must be
    re-delivered from the checkpoint) regenerates identical rows by
    construction. ``rowsPerBatch`` bounds each trigger; ``maxRows`` makes
    the stream finite so AvailableNow/processAllAvailable terminate.
    """

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rowsPerBatch", 20))
        self.max_rows = int(options.get("maxRows", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = int(start["index"])
        # clamp below at the start offset: a restart whose maxRows is
        # SMALLER than the checkpointed index would otherwise produce a
        # backwards end offset (e < s), which violates Structured
        # Streaming's offset monotonicity — idle (s == e) is the correct
        # degradation
        e = max(s, min(s + self.rows_per_batch, self.max_rows))
        return iter([_row(i) for i in range(s, e)]), {"index": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["index"]), int(end["index"]))])


class SyntheticListingsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_listings"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticListingsReader:
        return SyntheticListingsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticListingsStreamReader:
        return SyntheticListingsStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session: then
    ``spark.read.format('synthetic_listings').option('rows', N).load()``.

    The DataSource class is cloudpickled to Python worker processes, which
    by default serialize module-level classes *by reference* — workers would
    then need this package on their own import path (true under pytest's
    cwd, false for e.g. a driver that only sys.path-inserted the repo).
    Registering the module for by-value pickling removes that requirement.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SyntheticListingsSource)
