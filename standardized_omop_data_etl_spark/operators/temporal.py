"""Temporal operators: backward as-of join and gap sessionization.

Neither exists in Spark's built-in operator set, and both are staples of the
event-stream side of a training-data pipeline (feature attribution, activity
segmentation). The reference's closest analogue is the per-person date
clustering in ``create_observation_periods.py:38-143`` (its ``MAX_DAYS_APART``
gap rule IS sessionization, computed there one person at a time in pandas);
the as-of join generalizes its "most recent prior record" lookups.

Both are implemented as ONE hash exchange on the entity key + ONE
sort-within-partition — never a range-predicate join (which Spark can only
execute as a broadcast-nested-loop or a cartesian-with-filter: at 10^10 rows
the candidate cross product is the bottleneck, while the union/window form
moves each row exactly once and the per-key sort is linearithmic in the
partition, not quadratic in matches):

* ``asof_join`` — tag each side, ``unionByName``, one window ordered by
  ``(ts, side, tie)`` with ``last(ignorenulls)`` carrying the most recent
  right payload forward, filter back to left rows. Skew note: a hot entity
  key serializes its own window like any keyed op, but there is no
  multiplicative blow-up — cost stays O(rows-per-key log rows-per-key).
* ``sessionize`` — two window expressions (``lag`` gap test + running
  ``sum``) over the SAME partitioning and ordering, which Catalyst plans as
  a single exchange + single sort (verified on the physical plan in
  tests/test_temporal.py).

Determinism (reference O2 — no implicit order): both take an explicit
``tie_col`` so equal-timestamp rows resolve identically across runs,
partitionings, and engines; the DuckDB oracles in ``__spark_entry__.py``
encode the same tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _secs(c: Column) -> Column:
    """Epoch seconds (fractional) from a timestamp column. TIMESTAMP_NTZ has
    no direct double cast in Spark 4, so hop through TIMESTAMP first; both
    operands of every gap/tolerance comparison go through the same hop, so
    the session-timezone interpretation cancels out."""
    return c.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tie_col: str | None = None,
    how: str = "left",
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Attach to every left row the single most recent right row with
    ``right_ts <= left_ts`` for the same ``by`` key (backward as-of; the
    pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

    Right payload columns (everything but ``by``) come back ``prefix``-ed,
    including the matched timestamp — so a self-join on the same schema
    cannot collide. Equal timestamps match (<=), and among equal-timestamp
    right rows the LARGEST ``tie_col`` wins; pass ``tie_col`` whenever
    ``(by, right_ts)`` is not unique or results are order-nondeterministic.
    ``how="inner"`` drops left rows with no match; ``tolerance_seconds``
    nulls out (or with inner, drops) matches older than the window.
    """
    rpay = [c for c in right.columns if c not in by]
    clash = set(left.columns) & {prefix + c for c in rpay}
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {sorted(clash)}")
    tie = (
        F.col("_r").getField(tie_col)
        if tie_col is not None
        else F.lit(None).cast("long")
    )
    l_side = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_r"),
        *[c for c in left.columns if c not in by],
    )
    r_side = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_r"),
        F.struct(*[F.col(c) for c in rpay]).alias("_r"),
    )
    u = l_side.unionByName(r_side, allowMissingColumns=True)
    # ts asc; at equal ts right rows FIRST (so <= matches), ordered among
    # themselves by tie asc — last() then holds the max-tie right row.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts").asc(), F.col("_is_r").desc(), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("_r", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        in_window = (
            _secs(F.col("_ts")) - _secs(m.getField(right_ts))
        ) <= F.lit(float(tolerance_seconds))
        m = F.when(in_window, m)
    out = (
        u.withColumn("_m", m)
        .filter(F.col("_is_r") == 0)
        .select(
            *by,
            *[c for c in left.columns if c not in by],
            *[F.col("_m").getField(c).alias(prefix + c) for c in rpay],
        )
    )
    if how == "inner":
        return out.filter(F.col(prefix + right_ts).isNotNull())
    if how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out


def sessionize(
    df: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    tie_col: str | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization: per ``by`` key, rows ordered by ``ts_col``
    belong to one session until a gap larger than ``gap_seconds`` opens a new
    one. Adds ``out_col`` — a 1-based session ordinal within the key (so
    ``by + [out_col]`` is the session identity) — leaving every input row
    and column intact; session-level frames are a plain ``groupBy`` away.

    This is the reference's observation-period rule
    (``create_observation_periods.py:107-118``, ``MAX_DAYS_APART``) as a
    distributed operator: both window expressions share one partitioning and
    ordering, so the whole thing is a single exchange + sort.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_col).asc()] if tie_col is not None else []
    )
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev.isNull()
        | ((_secs(F.col(ts_col)) - _secs(prev)) > float(gap_seconds))
    ).cast("int")
    run = Window.partitionBy(*by).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(is_new).over(run).cast("long"))
