"""Property tests for driver-side hive-partition pruning (round 9).

``Catalog._partition_admitted_files`` was rewritten in round 9 to compare
numeric partition layouts numerically (the old lexicographic compare
silently dropped ``hour=10`` from ``hour BETWEEN 2 AND 10``). Pruning's
safety contract is CONSERVATIVE SUPERSET: for every partition whose value
satisfies the predicate under Spark's residual semantics, the partition's
files must be admitted — or the function must return ``None`` (no pruning
= full scan + residual). Dropping a satisfying partition is the only
failure mode that loses rows; admitting extra partitions is always safe.

These tests drive the pure path-walk logic with hypothesis-generated
layouts and predicates against a reference model of Spark's semantics —
no SparkSession needed (the method only walks directories), so hundreds
of cases run in seconds. Also covers ``queries/registry._stale_names``,
the round-9 rotation rule, as a pure function.

Spark-semantics model notes:
* a layout whose values all parse as numbers is inferred numeric; the
  residual compares numerically (float conversion is monotone, so float
  rounding can only spuriously ADMIT near 2^53 boundaries, never drop);
* a string layout compares lexicographically — but only string bounds
  have defined parity, anything else must degrade to no-prune;
* ``__HIVE_DEFAULT_PARTITION__`` rows are NULL keys: no range or IN
  predicate keeps them (except the degenerate unbounded range, which is
  not a filter at all and must not prune).
"""

from __future__ import annotations

import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_architecture_spark.catalog import Catalog, TableSpec

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# layout values: unpadded ints, zero-padded ints, floats, ISO-date-ish
# strings, arbitrary words, and the hive null marker
_num_vals = st.one_of(
    st.integers(0, 10_000).map(str),
    st.integers(0, 99).map(lambda i: f"{i:02d}"),
    st.floats(0, 100, allow_nan=False).map(lambda f: f"{f:.2f}"),
)
_str_vals = st.one_of(
    st.sampled_from(["2024-01-05", "2024-01-10", "2024-02-01", "a5", "b1"]),
    st.text(
        alphabet="abcxyz0123456789", min_size=1, max_size=6
    ).filter(lambda s: not s.isdigit()),
)
_values = st.lists(
    st.one_of(_num_vals, _str_vals, st.just(HIVE_NULL)),
    min_size=1,
    max_size=8,
    unique=True,
)
_bound = st.one_of(
    st.none(),
    st.integers(-5, 10_000),
    st.floats(-5, 200, allow_nan=False),
    st.sampled_from(["2024-01-07", "5", "a5", "zz"]),
)


def _is_num(v: str) -> bool:
    try:
        return not math.isnan(float(v))
    except ValueError:
        return False


def _model_satisfies(val: str, pred: tuple, numeric_layout: bool) -> bool:
    """Would a row in partition ``val`` survive Spark's residual filter?
    Returns True when the model is unsure (forcing the superset check)."""
    if len(pred) == 2:  # IN-list
        if val == HIVE_NULL:
            return False  # NULL IN (...) is never true
        if numeric_layout:
            want = set()
            for x in pred[1]:
                try:
                    want.add(float(x))
                except (TypeError, ValueError):
                    pass
            return float(val) in want
        return val in {x for x in pred[1] if isinstance(x, str)}
    _, lo, hi = pred
    if lo is None and hi is None:
        return True  # not a filter: every row (incl. NULL keys) survives
    if val == HIVE_NULL:
        return False  # NULL satisfies no bounded range
    if numeric_layout:
        try:
            v = float(val)
            return (lo is None or v >= float(lo)) and (
                hi is None or v <= float(hi)
            )
        except (TypeError, ValueError):
            return True  # unparseable bound on numeric layout: unsure
    if all(b is None or isinstance(b, str) for b in (lo, hi)):
        return (lo is None or val >= lo) and (hi is None or val <= hi)
    return True  # mixed-type compare on string layout: unsure


def _build_layout(tmp_path, values: list[str]) -> TableSpec:
    spec = TableSpec(name="t", path=str(tmp_path / "t"), partition_by=("k",))
    for i, v in enumerate(values):
        d = os.path.join(spec.path, f"k={v}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"part-{i}.parquet"), "w") as f:
            f.write("x")
    return spec


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=_values, lo=_bound, hi=_bound)
def test_range_pruning_never_drops_a_satisfying_partition(
    tmp_path_factory, values, lo, hi
):
    tmp = tmp_path_factory.mktemp("prune")
    spec = _build_layout(tmp, values)
    cat = Catalog(None)
    admitted = cat._partition_admitted_files(spec, ("k", lo, hi))
    if admitted is None:
        return  # no pruning: trivially safe
    numeric = all(_is_num(v) for v in values if v != HIVE_NULL) and any(
        v != HIVE_NULL for v in values
    )
    for v in values:
        if _model_satisfies(v, ("k", lo, hi), numeric):
            expect = os.path.join(spec.path, f"k={v}")
            assert any(
                f.startswith(expect + os.sep) for f in admitted
            ), f"satisfying partition k={v} dropped for bounds ({lo!r},{hi!r})"


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=_values,
    inlist=st.lists(
        st.one_of(
            st.integers(0, 10_000),
            st.sampled_from(["7", "07", "2024-01-05", "a5"]),
        ),
        min_size=0,
        max_size=5,
    ),
)
def test_inlist_pruning_never_drops_a_satisfying_partition(
    tmp_path_factory, values, inlist
):
    tmp = tmp_path_factory.mktemp("prune_in")
    spec = _build_layout(tmp, values)
    cat = Catalog(None)
    admitted = cat._partition_admitted_files(spec, ("k", inlist))
    if admitted is None:
        return
    numeric = all(_is_num(v) for v in values if v != HIVE_NULL) and any(
        v != HIVE_NULL for v in values
    )
    for v in values:
        if _model_satisfies(v, ("k", inlist), numeric):
            expect = os.path.join(spec.path, f"k={v}")
            assert any(
                f.startswith(expect + os.sep) for f in admitted
            ), f"satisfying partition k={v} dropped for IN {inlist!r}"


# --- rotation staleness rule (pure function) -----------------------------


def test_stale_names_flags_edits_after_green():
    from lakehouse_architecture_spark.queries.registry import _stale_names

    assert _stale_names(
        {"a": 1000.0, "b": 1000.0},
        {"a": 2000.0, "b": 500.0},
    ) == {"b"}  # b's module edited 500s after its green record


def test_stale_names_slack_absorbs_clone_skew():
    from lakehouse_architecture_spark.queries.registry import _stale_names

    # fresh clone: every file lands within seconds of the records — no
    # query may be marked stale or the rotation freezes at declared order
    assert (
        _stale_names({"a": 1030.0, "b": 1010.0}, {"a": 1000.0, "b": 1000.0})
        == set()
    )
    # beyond the slack the flag fires
    assert _stale_names(
        {"a": 1100.0}, {"a": 1000.0}, slack_sec=60.0
    ) == {"a"}


def test_stale_names_ignores_never_green():
    from lakehouse_architecture_spark.queries.registry import _stale_names

    # never-green names have no record mtime and are handled by the
    # age-based order, not the staleness rule
    assert _stale_names({"a": 1000.0}, {}) == set()
