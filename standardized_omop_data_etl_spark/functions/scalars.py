"""Scalar function library — SURVEY.md §2.7 (F1-F16), re-expressed columnar.

Each function returns a Column (or list of Columns) built purely from
``pyspark.sql.functions`` so every call stays inside whole-stage codegen.
Reference citations are the pandas/procedural sites whose semantics these
reproduce; none of their per-row Python survives.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .conventions import INDEX_DATE as EPOCH_DEFAULT, PLACEHOLDER_DATE


def relative_day_to_date(days: Column, index_date: str = EPOCH_DEFAULT) -> Column:
    """F1 — relative-day offset → date (reference ``helpers.py:25-39``)."""
    return F.date_add(F.to_date(F.lit(index_date)), days.cast("int"))


def relative_day_to_birth_year(days: Column, index_date: str = EPOCH_DEFAULT) -> Column:
    """F2 — relative-day offset → birth year (reference ``helpers.py:6-22``)."""
    return F.year(relative_day_to_date(days, index_date))


def year_string_to_date(year_str: Column, lo: int = 1880, hi: int = 2030) -> Column:
    """F3 — year string → Jan-1 date; junk/out-of-range → 1900-01-01 fallback
    (reference ``helpers.py:66-98``)."""
    y = year_str.try_cast("int")  # ANSI-safe: junk year strings → NULL, not error
    return F.when(
        y.isNotNull() & (y >= lo) & (y <= hi), F.make_date(y, F.lit(1), F.lit(1))
    ).otherwise(F.to_date(F.lit(PLACEHOLDER_DATE)))


def reformat_date_dmy(s: Column) -> Column:
    """F4 — dd/mm/yyyy → yyyy-mm-dd; unparseable passes through unchanged
    (reference ``convert_omop_dates.py:7-17,28-36``)."""
    return F.coalesce(
        F.date_format(F.try_to_timestamp(s, F.lit("dd/MM/yyyy")), "yyyy-MM-dd"), s
    )


def date_columns(schema) -> list[str]:
    """F5 — date-column discovery by name (reference
    ``create_observation_periods.py:9-15``)."""
    return [f.name for f in schema.fields if "date" in f.name.lower()]


def is_real_date(c: Column) -> Column:
    """F6 — placeholder-date validity (reference
    ``create_observation_periods.py:18-35``)."""
    return c.isNotNull() & (c.cast("string") != PLACEHOLDER_DATE)


# F7 — unit conversions with round(x, 2) (reference
# ``vital_signs--measurement.py:20-32,207,382,414``).
def fahrenheit_to_celsius(c: Column) -> Column:
    return F.round((c - 32.0) * 5.0 / 9.0, 2)


def lb_to_kg(c: Column) -> Column:
    return F.round(c * 0.45359237, 2)


def inch_to_cm(c: Column) -> Column:
    return F.round(c * 2.54, 2)


def infer_temperature_celsius(value: Column, unit: Column) -> Column:
    """F8 — unit inference from value range when the unit column is NULL:
    35-40 → already °C, 95-104 → °F, else NULL (drop row)
    (reference ``vital_signs--measurement.py:214-234``); explicit units
    1=F, 2=C (``:105-146``)."""
    return (
        F.when(unit == 2, F.round(value, 2))
        .when(unit == 1, fahrenheit_to_celsius(value))
        .when((value >= 35.0) & (value <= 40.0), F.round(value, 2))
        .when((value >= 95.0) & (value <= 104.0), fahrenheit_to_celsius(value))
        .otherwise(F.lit(None))
    )


def sanitize_numeric(c: Column) -> Column:
    """F9 — strip non-numeric chars then cast; failure → NULL, matching
    ``errors="coerce"`` (reference ``vital_signs--measurement.py:35-59``)."""
    return F.regexp_replace(c.cast("string"), r"[^0-9.\-]", "").try_cast("double")


def transform_id_9digit(c: Column, prefix: str = "11") -> Column:
    """F10 — digits-only, keep last 7, left-pad to 7, prefix → 9-char ID
    (reference ``transform_ids.py:5-25,59-67``)."""
    digits = F.regexp_replace(c.cast("string"), r"[^0-9]", "")
    last7 = F.substring(digits, -7, 7)
    return F.concat(F.lit(prefix), F.lpad(last7, 7, "0"))


def provenance(*parts: Column | str, sep: str = " | ") -> Column:
    """F11 — per-row lineage string ``a | b | c`` (reference
    ``answer_als_medications_log--drug_exposure.py:23-36``, format spec
    ``readme.md:91-97``). NULL parts are skipped by concat_ws, matching the
    reference's conditional appends."""
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws(sep, *cols)


def composite_key(person: Column, visit: Column) -> Column:
    """F12 — ``{person}_{visit}`` with ``_0`` fallback for missing visit
    (reference ``helpers.py:101-115``)."""
    return F.concat_ws("_", person.cast("string"), F.coalesce(visit.cast("string"), F.lit("0")))


def decode_map(c: Column, mapping: dict, default=None) -> Column:
    """F13 — small code→value dictionary decode as a literal map lookup
    (reference ``demographics--person.py:14-30`` and 5 sibling dict sites).
    For large mappings use a broadcast-joined lookup table instead (J2)."""
    pairs = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    out = m[c]
    return F.coalesce(out, F.lit(default)) if default is not None else out


def default_concept(c: Column) -> Column:
    """F14 — missing-concept default: NULL/'' → 0 ("No Matching Concept")
    (reference ``helpers.py:42-63``)."""
    return F.coalesce(F.nullif(c.cast("string"), F.lit("")).try_cast("long"), F.lit(0))


def pack_years(years: Column, packs_per_day: Column) -> Column:
    """F15 — derived measure (reference
    ``environmental_questionnaire--observation.py:483-486``)."""
    return years * packs_per_day * F.lit(365.0)
