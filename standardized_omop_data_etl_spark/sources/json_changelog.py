"""Debezium-style JSON changelog adapter.

Real binlog tails (Debezium, Maxwell, DMS) deliver JSON envelopes:

    {"op": "u", "ts_ms": ..., "source": {"lsn": 123},
     "after": {"doc_id": "...", "tokens": [...], "n_tok": 7, "source": "web"},
     "before": {...}}

This adapter turns a DataFrame of such JSON strings (from a file source, a
Kafka value column, or a socket) into the engine's typed change-event schema
``(lsn, op, <payload...>)`` with pure ``from_json`` expressions — JVM-side,
streaming-safe (usable inside ``readStream`` plans), no UDFs.

Unparseable lines surface as op='invalid' rows (dead-letter filterable)
rather than failing the batch — the CDC analogue of the reference's
skip-and-log row handling (``vital_signs--measurement.py:483-489``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

# Debezium op codes → engine ops
_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}

DEFAULT_PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def envelope_schema(payload: T.StructType = DEFAULT_PAYLOAD) -> T.StructType:
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("source", T.StructType([T.StructField("lsn", T.LongType())])),
            T.StructField("before", payload),
            T.StructField("after", payload),
        ]
    )


def parse_json_changelog(
    raw: DataFrame,
    json_col: str = "value",
    payload: T.StructType = DEFAULT_PAYLOAD,
) -> DataFrame:
    """raw[json_col]: string → (lsn long, op string, <payload cols>).

    Delete events carry the ``before`` image's key with NULL payload values
    (the engine's delete contract); everything else takes ``after``.
    """
    env = F.from_json(F.col(json_col), envelope_schema(payload))
    mapped = F.element_at(
        F.create_map(*[F.lit(x) for kv in _OP_MAP.items() for x in kv]),
        env["op"],
    )
    op_expr = F.when(mapped.isNull(), F.lit("invalid")).otherwise(mapped)
    is_delete = op_expr == "delete"
    key_field = payload.fields[0].name  # first payload field is the table key
    cols = [
        env["source"]["lsn"].alias("lsn"),
        op_expr.alias("op"),
        F.coalesce(env["after"][key_field], env["before"][key_field]).alias(key_field),
    ]
    for f in payload.fields[1:]:
        cols.append(
            F.when(is_delete, F.lit(None).cast(f.dataType))
            .otherwise(env["after"][f.name])
            .alias(f.name)
        )
    return raw.select(*cols)


def split_dead_letter(
    events: DataFrame, lsn_col: str = "lsn", op_col: str = "op"
) -> tuple[DataFrame, DataFrame]:
    """(valid, dead_letter) split of a parsed changelog: rows with an unknown
    op or a NULL LSN go to the dead-letter side for counting/persisting.
    ``merge_into`` independently drops such rows (plans.merge.VALID_OPS
    guard); use this when the rejects must be observable rather than merely
    excluded."""
    valid_ops = ("insert", "update", "delete", "upsert")
    bad = (~F.col(op_col).isin(*valid_ops)) | F.col(lsn_col).isNull()
    return events.filter(~bad), events.filter(bad)


def to_json_changelog(events: DataFrame, lsn_col: str = "lsn", op_col: str = "op") -> DataFrame:
    """Inverse adapter (engine events → Debezium-ish envelopes), used by tests
    for round-trip checks and by CDC-out consumers."""
    payload_cols = [c for c in events.columns if c not in (lsn_col, op_col)]
    rev = {"insert": "c", "update": "u", "delete": "d", "upsert": "u"}
    op_code = F.element_at(
        F.create_map(*[F.lit(x) for kv in rev.items() for x in kv]), F.col(op_col)
    )
    body = F.struct(*[F.col(c) for c in payload_cols])
    env = F.struct(
        op_code.alias("op"),
        F.lit(None).cast("long").alias("ts_ms"),
        F.struct(F.col(lsn_col).alias("lsn")).alias("source"),
        F.when(F.col(op_col) == "delete", body).alias("before"),
        F.when(F.col(op_col) != "delete", body).alias("after"),
    )
    return events.select(F.to_json(env).alias("value"))
