"""Shared null/blank/placeholder conventions — SURVEY.md §2.2 P5 and §7
hard-part (e), centralized so every operator agrees bit-for-bit on replay.

Reference semantics these encode:

* **blank vs explicit negative** (``readme.md:99-101``; ``helpers.py:58,83,113``):
  a BLANK/NULL source value means "not mapped / not asked" and produces no
  output, while an explicit negative ("No", 0) maps to a real concept — so
  blank must normalize to NULL *before* any concept decode, never to 0.
* **placeholder date** ``1900-01-01`` marks unknown dates
  (``helpers.py:66-98``, ``create_observation_periods.py:18-35``).
* **sentinel relative day** ``-42368`` is the placeholder date expressed in
  relative-day space from the 2016-01-01 index date
  (``aalshxfx--condition_occurrence.py:74-78``): 2016-01-01 − 42368 days ==
  1900-01-01 exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

INDEX_DATE = "2016-01-01"
PLACEHOLDER_DATE = "1900-01-01"
SENTINEL_RELATIVE_DAY = -42368  # INDEX_DATE + SENTINEL_RELATIVE_DAY days == PLACEHOLDER_DATE


def is_blank(c: Column) -> Column:
    """True for NULL or whitespace-only strings (the "not asked" state)."""
    return c.isNull() | (F.trim(c.cast("string")) == "")


def blank_to_null(c: Column) -> Column:
    """Normalize blank/whitespace-only to NULL (leaves explicit values,
    including explicit negatives like '0'/'No', untouched)."""
    return F.nullif(F.trim(c.cast("string")), F.lit(""))


def placeholder_if_null(c: Column) -> Column:
    """Date column with NULLs replaced by the placeholder date."""
    return F.coalesce(c.cast("date"), F.to_date(F.lit(PLACEHOLDER_DATE)))


def is_placeholder(c: Column) -> Column:
    return c.cast("string") == PLACEHOLDER_DATE
