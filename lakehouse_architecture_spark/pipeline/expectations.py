"""Declarative data-quality expectations over DataFrames.

The reference pipeline cleans rows imperatively (``app/sliver.py``'s chain
of filters) but has no way to *declare* what clean means, measure how dirty
a batch was, or quarantine the failures. This module adds the
Delta-Live-Tables-style contract on plain Spark:

* an :class:`Expectation` is a named row predicate plus an action —
  ``"warn"`` (keep the row, count it), ``"drop"`` (filter it out), or
  ``"fail"`` (abort the job if any row violates);
* :func:`apply_expectations` enforces a suite in ONE pass: violation
  counters ride the action job via ``DataFrame.observe`` (an
  ``AggregatingAccumulator`` evaluated inside the scan), so at 100 TB the
  audit costs zero extra scans;
* :func:`quarantine_split` routes failing rows (with the list of violated
  expectation names) to a side output for repair instead of silently
  dropping them;
* :func:`dq_summary` is the batch-audit report as a DataFrame — per
  expectation: rows checked, violations, violation rate — computed as one
  aggregate (plus one hash-agg per table-level check), never a per-rule
  scan.

Row predicates are Catalyst expressions end-to-end — never Python UDFs — so
expectations fuse into whatever job enforces them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")


@dataclass(frozen=True)
class Expectation:
    """A named row-level contract: ``predicate`` must hold for a clean row.

    ``predicate`` is a SQL boolean expression string (kept as a string so
    suites are serializable into pipeline configs). NULL evaluates as a
    violation — a row that can't prove it's clean isn't.
    """

    name: str
    predicate: str
    action: str = "warn"

    def __post_init__(self) -> None:
        if self.action not in _ACTIONS:
            raise ValueError(f"action must be one of {_ACTIONS}: {self.action}")

    def holds(self) -> Column:
        return F.coalesce(F.expr(self.predicate), F.lit(False))


class ExpectationsViolated(RuntimeError):
    """Raised when an ``action="fail"`` expectation has violations."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(f"failed expectations (name -> violations): {counts}")


def expect(name: str, predicate: str, action: str = "warn") -> Expectation:
    return Expectation(name, predicate, action)


def violation_aggs(expectations: list[Expectation]):
    """The one aggregate-column set every enforcement path shares — a
    violation counter per rule. Single source of truth so batch validate,
    observe metrics, dq_summary, and the streaming audit can never drift
    apart on NULL/count semantics."""
    return [F.sum((~e.holds()).cast("long")).alias(e.name) for e in expectations]


def _check_suite(expectations: list[Expectation]) -> None:
    if not expectations:
        raise ValueError("empty expectation suite")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")


def apply_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, "ExpectationMetrics"]:
    """Enforce a suite and return ``(enforced_df, metrics)``.

    ``drop``/``fail`` rows are filtered from the returned DataFrame; every
    violation (including ``warn``) is counted by an ``observe`` metric that
    evaluates inside the NEXT action on the returned frame — no extra scan.
    Call ``metrics.counts()`` after that action; for ``fail`` expectations
    it raises :class:`ExpectationsViolated` if any violations were seen.
    """
    _check_suite(expectations)
    from pyspark.sql import Observation

    obs = Observation()
    metrics_cols = violation_aggs(expectations) + [
        F.count(F.lit(1)).alias("__rows_seen")
    ]
    observed = df.observe(obs, *metrics_cols)
    enforced = observed
    for e in expectations:
        if e.action in ("drop", "fail"):
            enforced = enforced.filter(e.holds())
    # NOTE the observe sits UPSTREAM of the filters: counts reflect the raw
    # input (what you want in an audit), while the output is clean.
    return enforced, ExpectationMetrics(obs, enforced, expectations)


class ExpectationMetrics:
    """Handle onto the ``Observation`` riding an enforced DataFrame."""

    def __init__(self, obs, enforced: DataFrame, expectations: list[Expectation]):
        self._obs = obs
        self._enforced = enforced
        self._expectations = expectations

    def counts(self, force: bool = False) -> dict[str, int]:
        """Violation counts per expectation (plus ``__rows_seen``).

        Blocks until the caller's action on the enforced frame completes;
        with ``force=True`` runs a ``count()`` action itself (the
        standalone-audit path). Raises :class:`ExpectationsViolated` when a
        ``fail`` expectation recorded violations.
        """
        if force:
            self._enforced.count()
        counts = {k: int(v or 0) for k, v in self._obs.get.items()}
        bad = {
            e.name: counts[e.name]
            for e in self._expectations
            if e.action == "fail" and counts.get(e.name, 0) > 0
        }
        if bad:
            raise ExpectationsViolated(bad)
        return counts


def validate(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, dict[str, int]]:
    """Eager one-shot enforcement: returns the clean frame and the counts.

    Uses a single aggregate job over the suite (all counters in one pass)
    rather than ``observe`` — for callers who want the counts NOW and will
    run their own action on the clean frame later.
    """
    _check_suite(expectations)
    row = df.agg(
        *violation_aggs(expectations), F.count(F.lit(1)).alias("__rows_seen")
    ).collect()[0]
    counts = {k: int(v or 0) for k, v in row.asDict().items()}
    bad = {
        e.name: counts[e.name]
        for e in expectations
        if e.action == "fail" and counts[e.name] > 0
    }
    if bad:
        raise ExpectationsViolated(bad)
    clean = df
    for e in expectations:
        if e.action in ("drop", "fail"):
            clean = clean.filter(e.holds())
    return clean, counts


def quarantine_split(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, quarantined) where quarantined rows carry
    ``_violations: array<string>`` naming every failed expectation.

    One shared upstream projection computes each predicate once; both
    outputs reuse it, so a write of clean + quarantine scans the input
    once per sink (Spark's limit without persist) but never re-evaluates
    predicates per rule.
    """
    checks = F.array(
        *[
            F.when(~e.holds(), F.lit(e.name)).otherwise(F.lit(None))
            for e in expectations
        ]
    )
    tagged = df.withColumn(
        "_violations", F.filter(checks, lambda x: x.isNotNull())
    )
    clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
    quarantined = tagged.filter(F.size("_violations") > 0)
    return clean, quarantined


def dq_summary(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Audit report: one output row per expectation —
    ``(expectation, action, n_rows, n_violations, violation_rate)``.

    All row-level counters are computed in ONE aggregate over the input
    (column-per-rule, then unpivoted driver-side since the result is
    suite-sized, not data-sized).
    """
    agg = df.agg(*violation_aggs(expectations), F.count(F.lit(1)).alias("__rows"))
    spark = df.sparkSession
    row = agg.collect()[0].asDict()
    n_rows = int(row["__rows"])
    data = [
        (
            e.name,
            e.action,
            n_rows,
            int(row[e.name] or 0),
        )
        for e in expectations
    ]
    out = spark.createDataFrame(
        data, "expectation string, action string, n_rows long, n_violations long"
    )
    return out.select(
        "expectation",
        "action",
        "n_rows",
        "n_violations",
        F.round(
            F.col("n_violations").cast("double") / F.col("n_rows"), 6
        ).alias("violation_rate"),
    ).orderBy("expectation")


# ---- table-level expectations (need their own aggregate/join shapes) -----


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicate-key report: keys violating uniqueness with their counts.

    One hash-aggregate on the key; empty result == expectation holds.
    """
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def expect_ref_integrity(
    fact: DataFrame, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    """Orphan foreign keys: fact rows whose ``fk`` misses from ``dim.pk``.

    Anti-join on the key — broadcast when the dim is small, shuffled
    otherwise; Catalyst/AQE picks. Empty result == integrity holds.
    """
    return (
        fact.select(F.col(fk).alias("orphan_key"))
        .join(dim.select(F.col(pk).alias("orphan_key")), "orphan_key", "left_anti")
        .groupBy("orphan_key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
