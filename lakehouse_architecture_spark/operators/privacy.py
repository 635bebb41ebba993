"""Privacy-audit operators: re-identification risk measures over tables.

Before a 100 TB table (or a training corpus's metadata) is shared or
joined with external data, audit how identifying its quasi-identifier
columns are:

* :func:`k_anonymity_violations` — QI combinations shared by fewer than
  ``k`` rows (the classic k-anonymity test, Sweeney 2002): each is a group
  an adversary can narrow to under ``k`` candidates.
* :func:`l_diversity_violations` — QI groups whose SENSITIVE attribute
  takes fewer than ``l`` distinct values (Machanavajjhala et al. 2007):
  k-anonymous groups still leak when everyone in them shares the secret.
* :func:`anonymity_summary` — the table-level verdict: achieved k (the
  minimum group size), achieved l, group counts, violating-row share.

Each is one or two hash aggregates on the QI key — the same plan shape at
any scale — and composes with the expectations engine
(pipeline/expectations.py) as a table-level gate: fail the publish job
when ``anonymity_summary().achieved_k < k_required``. PII *redaction* is
the complementary operator (operators/curation.redact_pii); these measure
what redaction must fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame, quasi_identifiers: list[str], k: int = 5
) -> DataFrame:
    """QI combinations with fewer than ``k`` rows: the groups to suppress
    or generalize before release. One hash aggregate."""
    return (
        df.groupBy(*quasi_identifiers)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive_col: str,
    l_required: int = 2,
) -> DataFrame:
    """QI groups whose sensitive column shows fewer than ``l_required``
    distinct NON-NULL values. Two-level aggregate (distinct on (QI,
    sensitive), then count per QI) keeps the count-distinct a plain hash
    aggregate — no Expand-based COUNT(DISTINCT) in the shuffle.

    NULL is a missing secret, not a secret: counting it as its own value
    would let a {flu, NULL} group report l=2 and pass an l>=2 gate even
    though every disclosed secret is identical (ADVICE r3). The second
    level counts ``sensitive_col`` itself (NULL-skipping), so an all-NULL
    group reports n_distinct_sensitive = 0 and is flagged."""
    distinct_pairs = df.select(*quasi_identifiers, sensitive_col).distinct()
    return (
        distinct_pairs.groupBy(*quasi_identifiers)
        .agg(F.count(F.col(sensitive_col)).alias("n_distinct_sensitive"))
        .filter(F.col("n_distinct_sensitive") < l_required)
    )


def anonymity_summary(
    df: DataFrame, quasi_identifiers: list[str], sensitive_col: str
) -> DataFrame:
    """One row: achieved k and l, group counts, and the share of rows in
    singleton (k=1, fully re-identifiable) groups."""
    groups = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # NULL-skipping count: achieved_l reflects only real sensitive-value
    # diversity (see l_diversity_violations).
    lgroups = (
        df.select(*quasi_identifiers, sensitive_col)
        .distinct()
        .groupBy(*quasi_identifiers)
        .agg(F.count(F.col(sensitive_col)).alias("n_sens"))
    )
    gstats = groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n_rows").alias("achieved_k"),
        F.sum("n_rows").alias("n_total"),
        F.sum(F.when(F.col("n_rows") == 1, F.col("n_rows")).otherwise(0)).alias(
            "n_singleton_rows"
        ),
    )
    lstats = lgroups.agg(F.min("n_sens").alias("achieved_l"))
    return (
        gstats.crossJoin(F.broadcast(lstats))
        .select(
            "n_groups",
            "achieved_k",
            "achieved_l",
            "n_total",
            F.round(
                F.col("n_singleton_rows").cast("double") / F.col("n_total"), 6
            ).alias("singleton_row_share"),
        )
    )
