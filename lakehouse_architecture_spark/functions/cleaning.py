"""Listing-domain cleaning expressions (reference UDFs rebuilt as Catalyst exprs).

The reference defines three row-at-a-time Python UDFs (``app/sliver.py:41-89``):

* ``parse_area``        — ``"80 m²"``   → 80.0       (sliver.py:41-51)
* ``parse_number``      — ``"3"``       → 3          (sliver.py:54-60)
* ``normalize_price``   — ``"5,2 tỷ"``  → 5.2 billion-VND units;
                          ``"800 triệu"`` → 0.8; plain digits → value/1e9
                          (sliver.py:63-83)

It *registers* them but never applies them (the silver projection at
sliver.py:143-155 selects raw strings — SURVEY.md §2.4). This engine
implements the intended semantics as **native Catalyst expressions** — they
run JVM-side inside whole-stage codegen, so the cleaning step is a zero-UDF
narrow map at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUMERIC = r"[\d,\.]+"


def _first_number(c: Column) -> Column:
    """First numeric token, Vietnamese comma-decimal normalized: '5,2' -> 5.2."""
    tok = F.regexp_extract(c, _NUMERIC, 0)
    return F.when(tok != "", F.regexp_replace(tok, ",", ".").cast("double"))


def parse_area_expr(c: Column | str) -> Column:
    """'80 m²' -> 80.0; '1.234,5 m²' handled as 1234.5 is NOT attempted —
    semantics follow the reference: first [\\d,.]+ token, comma → decimal
    point (sliver.py:46-48), unparseable → NULL."""
    c = F.col(c) if isinstance(c, str) else c
    return _first_number(c)


def parse_number_expr(c: Column | str) -> Column:
    """int(float(s)) with failure→NULL (sliver.py:54-60): truncation toward
    zero, which is exactly Spark's double→int cast."""
    c = F.col(c) if isinstance(c, str) else c
    return _first_number(c).cast("int")


def normalize_price_expr(c: Column | str) -> Column:
    """Price string → billions of VND (sliver.py:63-83).

    'tỷ' (billion) → value as-is; 'triệu' (million) → value/1000;
    bare digits → value/1e9; unparseable/empty → NULL.
    """
    c = F.col(c) if isinstance(c, str) else c
    lc = F.lower(c)
    num = _first_number(c)
    digits = F.regexp_replace(c, r"[^\d]", "")
    return (
        F.when(lc.contains("tỷ"), num)
        .when(lc.contains("triệu"), num / F.lit(1000.0))
        .when(digits != "", digits.cast("double") / F.lit(1e9))
    )
