"""Dataset integrity fingerprints — cheap content equality across runs.

"Did rerunning the pipeline produce the SAME table?" at 100 TB cannot be
answered by sorting and diffing. An order-insensitive fingerprint can:
hash every row portably (md5 — functions/hashing.py), reduce the hashes
with modular addition (commutative, so partitioning and row order cannot
change the result), and compare two 16-byte verdicts. Replica divergence,
nondeterministic UDFs, and silent reader drift all surface as a
fingerprint mismatch; the per-column variant localizes WHICH column
drifted. One scan, one scalar aggregate — the cheapest full-content check
possible.

Caller contract: row strings must be built deterministically. Integer,
string, date and decimal columns cast to string identically across
engines; raw DOUBLE→string does NOT (scientific-notation thresholds
differ) — route doubles through ``CAST(x AS DECIMAL(38,6))`` first, as
queries/quality.q_dataset_fingerprint demonstrates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.hashing import md5_hash64

#: Mersenne prime 2^31 - 1: per-row terms stay small, the exact decimal
#: sum never overflows, and the final residue fits any engine's int64.
FP_MOD = 2_147_483_647

_SEP = "\x1f"


def _framed(c: Column) -> Column:
    """``<char length>:<value>`` per value, bare ``n`` for NULL (round 11,
    in lockstep with ``operators/upsert.snapshot_diff`` and the
    q_dataset_fingerprint oracle): length-prefixed framing makes the
    canonicalization injective per field — the old separator-joined form
    let value content shift a column boundary (``('a\\x1f', 'b')`` ==
    ``('a', '\\x1fb')``) and a NULL collide with a literal marker string,
    SYSTEMATIC collisions on top of the fingerprint's inherent modular
    birthday ones."""
    s = c.cast("string")
    return F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.length(s).cast("string"), F.lit(":"), s)
    )


def _row_hash(cols: list[Column]) -> Column:
    canon = F.concat_ws(_SEP, *[_framed(c) for c in cols])
    return md5_hash64(canon) % FP_MOD


def dataset_fingerprint(df: DataFrame, cols: list[Column] | None = None) -> DataFrame:
    """One row ``(n_rows, fingerprint)``: modular sum of per-row md5
    hashes over the given columns (default: all, in schema order).
    Order- and partitioning-insensitive; identical content ⇒ identical
    fingerprint on any engine that follows the same canonicalization."""
    cols = [F.col(c) for c in df.columns] if cols is None else cols
    h = _row_hash(cols)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(h.cast("decimal(38,0)")) % FP_MOD).cast("bigint").alias("fingerprint"),
    )


def column_fingerprints(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-form ``(column, n_nonnull, fingerprint)`` — per-column content
    hashes from ONE aggregate pass (column count is plan-time fixed; the
    unpivot of the single result row happens driver-side)."""
    names = list(df.columns) if cols is None else cols
    aggs = []
    for c in names:
        h = md5_hash64(_framed(F.col(c))) % FP_MOD
        aggs.append(
            (F.sum(h.cast("decimal(38,0)")) % FP_MOD).cast("bigint").alias(f"__fp_{c}")
        )
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [(c, int(row[f"__n_{c}"]), int(row[f"__fp_{c}"] or 0)) for c in names]
    return spark.createDataFrame(
        out, "column string, n_nonnull long, fingerprint long"
    )


def fingerprints_match(a: DataFrame, b: DataFrame) -> bool:
    """Content equality of two frames over their common canonicalization —
    two tiny scalar aggregates, no join, no sort."""
    ra = dataset_fingerprint(a).collect()[0]
    rb = dataset_fingerprint(b).collect()[0]
    return (ra["n_rows"], ra["fingerprint"]) == (rb["n_rows"], rb["fingerprint"])


def snapshot_diff_audit(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Aggregated reconciliation audit between two snapshots — the
    per-column-drill companion of ``operators/upsert.snapshot_diff``
    (which emits the per-KEY status stream over a hash-compare join) and
    of :func:`dataset_fingerprint` (which answers only WHETHER). One
    full outer join on the primary key classifies every key as
    added / removed / changed / unchanged, and for changed keys counts
    which columns moved — localizing a drifting writer to the expression
    that drifted. Unlike the hash variant this must ship the compared
    columns through the join (per-column equality needs the values), so
    at 100 TB restrict ``compare_cols`` to the suspect columns; for a
    whole-row diff stream use the hash form.

    Output is a tall audit, one row per (kind, name, n):
    ``('status', 'added'|'removed'|'changed'|'unchanged', count)`` plus
    ``('column', <compare col>, rows where that column changed)`` — the
    per-column drill localizes a drifting writer to the expression that
    drifted. Comparison is null-safe (NULL == NULL; NULL vs value =
    changed).

    Shuffle shape: ONE shuffle each side for the key join (co-partitioned
    at 100 TB if both snapshots are bucketed by PK — the recommended
    layout for CDC tables), then a single hash aggregate onto a handful
    of counter cells expanded to tall rows with ``stack``. No collect, no
    per-column scans: every counter is a conditional sum in the same
    aggregate.
    """
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    col_changed = {
        c: (
            F.col("__in_old").isNotNull()
            & F.col("__in_new").isNotNull()
            & ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        ).cast("long")
        for c in compare_cols
    }
    any_changed = None
    for expr in col_changed.values():
        any_changed = expr if any_changed is None else F.greatest(any_changed, expr)
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(any_changed == 1, "changed")
        .otherwise("unchanged")
    )
    agg = j.select(
        status.alias("__st"),
        *[col_changed[c].alias(f"__ch_{c}") for c in col_changed],
    ).agg(
        *[
            F.sum((F.col("__st") == s).cast("long")).alias(f"n_{s}")
            for s in ("added", "removed", "changed", "unchanged")
        ],
        *[F.sum(f"__ch_{c}").alias(f"nc_{c}") for c in compare_cols],
    )
    cells = ", ".join(
        [f"'status', '{s}', n_{s}" for s in ("added", "removed", "changed", "unchanged")]
        + [f"'column', '{c}', nc_{c}" for c in compare_cols]
    )
    k = 4 + len(compare_cols)
    return agg.selectExpr(
        f"stack({k}, {cells}) as (kind, name, n)"
    ).orderBy("kind", "name")
