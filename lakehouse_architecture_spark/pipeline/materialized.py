"""Incrementally-maintained materialized aggregates over versioned tables.

The lakehouse serving pattern the reference approximates with nightly full
rebuilds (gold = recompute-from-silver, ``airflow/dags/
realestate_pipeline.py:163-190``) done incrementally: a SUM/COUNT group-by
view refreshed by applying only the CDC delta between the last refreshed
source version and the latest one. At 100 TB a full gold rebuild scans the
world; the delta path scans only rows whose keys changed — the shuffle
carries the churn, not the table.

Algebra (standard incremental view maintenance for distributive
aggregates): removed/changed keys contribute their OLD values negated,
added/changed keys their NEW values; the per-group delta then merges into
the stored view by addition, and groups whose count reaches zero drop out.

The view itself is a :class:`~lakehouse_architecture_spark.pipeline.
table_format.VersionedTable` keyed by the group columns, each refresh
stamped (``epoch`` marker) with the source version it folded in — so the
refresh is resumable, auditable, and idempotent: refreshing with no new
source version is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.upsert import snapshot_diff
from lakehouse_architecture_spark.pipeline.table_format import VersionedTable


class MaterializedAggregate:
    """``SELECT group_cols, COUNT(*) AS n, SUM(c) AS sum_<c>... GROUP BY
    group_cols`` over a :class:`VersionedTable`, maintained incrementally.
    """

    # driver-side strategy thresholds (overridable per instance): a view
    # bigger than BIG_VIEW_BYTES is folded via broadcast touched-groups
    # joins (never shuffled) as long as the churn is under
    # SMALL_CHURN_BYTES (delta must broadcast)
    BIG_VIEW_BYTES = 64 * 1024 * 1024
    SMALL_CHURN_BYTES = 256 * 1024 * 1024

    def __init__(
        self,
        source: VersionedTable,
        view_path: str,
        group_cols: list[str],
        sum_cols: list[str],
    ) -> None:
        self.source = source
        self.view = VersionedTable(source.spark, view_path, keys=group_cols)
        self.group_cols = group_cols
        self.sum_cols = sum_cols
        # pre-built, reusable Column trees (round 9): Columns are immutable
        # expression trees analyzed per-plan, so building them once in
        # __init__ instead of per refresh cuts the py4j round-trips that
        # dominate refresh's driver-side fixed cost (round-6 cProfile: the
        # plan CONSTRUCTION, not the job, is the refresh-vs-rebuild gap at
        # fixture scale — one JVM call per F.col/alias/arithmetic)
        self._agg_exprs = [F.sum("n").alias("n")] + [
            F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols
        ]
        self._signed_pos = [
            F.lit(1).cast("bigint").alias("n"),
            *[F.col(c).alias(f"sum_{c}") for c in sum_cols],
        ]
        self._signed_neg = [
            F.lit(-1).cast("bigint").alias("n"),
            *[(F.col(c) * -1).alias(f"sum_{c}") for c in sum_cols],
        ]

    # -- state --------------------------------------------------------------
    def refreshed_through(self) -> int | None:
        """Highest source version folded into the view (epoch markers)."""
        import os

        best: int | None = None
        for v in self.view.versions():
            marker = os.path.join(self.view._vdir(v), "_epoch")
            try:
                with open(marker) as f:
                    e = int(f.read().strip())
            except (OSError, ValueError):
                continue
            best = e if best is None else max(best, e)
        return best

    # -- aggregation --------------------------------------------------------
    def _agg(self, df: DataFrame, sign: int = 1) -> DataFrame:
        if sign not in (1, -1):
            # only the two prebuilt column sets exist; any other int would
            # silently negate instead of scaling (ADVICE r9)
            raise ValueError(f"sign must be 1 or -1: {sign}")
        cols = self._signed_pos if sign == 1 else self._signed_neg
        signed = df.select(*self.group_cols, *cols)
        return signed.groupBy(*self.group_cols).agg(*self._agg_exprs)

    def _delta_agg(self, pre: DataFrame, post: DataFrame) -> DataFrame:
        """Per-group (n, sum_*) delta from pre-images (negated) and
        post-images — ONE row-level signed union and ONE hash aggregate,
        not two separate aggregates glued by a union (one shuffle over the
        churn instead of two)."""
        rows = pre.select(*self.group_cols, *self._signed_neg).unionByName(
            post.select(*self.group_cols, *self._signed_pos)
        )
        return rows.groupBy(*self.group_cols).agg(*self._agg_exprs)

    def read(self) -> DataFrame:
        return self.view.read()

    def refresh(self) -> int | None:
        """Fold all unapplied source versions into the view; returns the
        new view version, or None when already current (no-op)."""
        latest = self.source.latest_version()
        if latest is None:
            return None
        done = self.refreshed_through()
        if done is not None and done >= latest:
            return None
        if done is None:
            # first refresh: full build of the current snapshot
            full = self._agg(self.source.read(latest))
            return self.view.write(full, epoch=latest)

        # incremental: prefer the change feed captured at merge time —
        # O(churn) rows, zero snapshot scans. -pre + post telescopes across
        # consecutive versions, so pending feeds fold as one union.
        feeds = [
            self.source.change_feed(v) for v in range(done + 1, latest + 1)
        ]
        cols = self.group_cols + self.sum_cols
        # the feed path also needs every group/sum column present in every
        # pre/post frame — feeds captured BEFORE a schema evolution lack
        # the new columns and would crash the select; degrade to the
        # snapshot-diff fallback instead
        feeds_usable = all(f is not None for f in feeds) and all(
            set(cols) <= set(frame.columns) for f in feeds for frame in f
        )
        if feeds_usable:
            pres = [f[0].select(*cols) for f in feeds]
            posts = [f[1].select(*cols) for f in feeds]

            def cat(frames):
                out = frames[0]
                for f in frames[1:]:
                    out = out.unionByName(f)
                return out

            delta = self._delta_agg(cat(pres), cat(posts))
        else:
            # fallback (some commit didn't log changes, or a feed predates
            # a schema evolution): re-derive the delta by hash-diffing the
            # two snapshots — two scans, the shuffle still carries
            # (key, hash) + changed rows only. If version ``done`` has
            # been vacuumed away, the diff is impossible — degrade to a
            # FULL rebuild of the current snapshot rather than erroring on
            # every refresh forever.
            try:
                before = self.source.read(done)
            except FileNotFoundError:
                full = self._agg(self.source.read(latest))
                return self.view.write(full, epoch=latest)
            after = self.source.read(latest)
            diff = snapshot_diff(before, after, self.source.keys).filter(
                F.col("status") != "same"
            )
            old_rows = before.join(
                diff.filter(F.col("status").isin("removed", "changed")).select(
                    *self.source.keys
                ),
                on=self.source.keys,
                how="left_semi",
            )
            new_rows = after.join(
                diff.filter(F.col("status").isin("added", "changed")).select(
                    *self.source.keys
                ),
                on=self.source.keys,
                how="left_semi",
            )
            delta = self._delta_agg(old_rows, new_rows)

        # Fold strategy, decided DRIVER-SIDE from on-disk sizes (zero extra
        # Spark jobs — an earlier cache+count variant spent more on the
        # decision than it saved):
        #
        # * small view → one-shuffle union+groupBy fold. Re-aggregating a
        #   broadcast-sized view costs less than any join machinery.
        # * big view + small churn → TOUCHED-GROUPS broadcast fold: the
        #   churn-group-sized delta broadcasts into a left join against the
        #   view, so untouched groups stream through without a shuffle —
        #   the view (the thing that grows with key cardinality at 100 TB)
        #   is never exchanged.
        # * big view + big churn → shuffled fold (delta not broadcastable).
        view = self.read()
        view_bytes = self._snapshot_bytes(self.view)
        # the snapshot-diff fallback has no feed on disk, so feed bytes
        # would read 0 there no matter how big the delta is — never let
        # that path force a broadcast of a potentially table-sized delta
        churn_bytes = sum(
            self._feed_bytes(self.source, v) for v in range(done + 1, latest + 1)
        )
        big_view = view_bytes > self.BIG_VIEW_BYTES
        small_churn = feeds_usable and churn_bytes <= self.SMALL_CHURN_BYTES
        if big_view and small_churn:
            # all delta-side joins are NULL-SAFE on the group key: a NULL
            # group is one real group for the aggregate, and a NULL-unsafe
            # join would keep its view row stale AND re-add its delta as a
            # duplicate "new group" row
            d = delta.select(
                *[F.col(c).alias(f"__dk_{c}") for c in self.group_cols],
                F.col("n").alias("__d_n"),
                *[
                    F.col(f"sum_{c}").alias(f"__d_sum_{c}")
                    for c in self.sum_cols
                ],
            )
            cond = None
            for c in self.group_cols:
                piece = F.col(c).eqNullSafe(F.col(f"__dk_{c}"))
                cond = piece if cond is None else (cond & piece)
            folded = (
                view.join(F.broadcast(d), on=cond, how="left")
                .select(
                    *self.group_cols,
                    (F.col("n") + F.coalesce(F.col("__d_n"), F.lit(0))).alias("n"),
                    *[
                        (
                            F.col(f"sum_{c}")
                            + F.coalesce(F.col(f"__d_sum_{c}"), F.lit(0))
                        ).alias(f"sum_{c}")
                        for c in self.sum_cols
                    ],
                )
                .filter(F.col("n") > 0)
            )
            # delta groups with no view row yet: both sides of this anti
            # join are churn-sized (matched ≤ |delta|), so it broadcasts too
            matched = view.join(F.broadcast(d), on=cond, how="left_semi").select(
                *self.group_cols
            )
            m = matched.select(
                *[F.col(c).alias(f"__dk_{c}") for c in self.group_cols]
            )
            new_groups = delta.join(
                F.broadcast(m), on=cond, how="left_anti"
            ).filter(F.col("n") > 0)
            merged = folded.unionByName(new_groups.select(*folded.columns))
        else:
            merged = (
                view.unionByName(delta)
                .groupBy(*self.group_cols)
                .agg(*self._agg_exprs)
                .filter(F.col("n") > 0)
            )
        # full snapshot write, NOT a merge: groups whose count reached zero
        # must disappear, and a merge would keep them (unmatched targets)
        return self.view.write(merged, epoch=latest)

    @staticmethod
    def _snapshot_bytes(table: VersionedTable) -> int:
        """On-disk bytes of the latest snapshot (driver-side stat)."""
        import os

        v = table.latest_version()
        if v is None:
            return 0
        total = 0
        d = table._vdir(v)
        for root, _dirs, files in os.walk(d):
            if "_changes" in root:
                continue
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(("_", "."))
            )
        return total

    @staticmethod
    def _feed_bytes(table: VersionedTable, version: int) -> int:
        """On-disk bytes of a version's change feed (driver-side stat)."""
        import os

        d = os.path.join(table._vdir(version), "_changes")
        total = 0
        for root, _dirs, files in os.walk(d):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(("_", "."))
            )
        return total
