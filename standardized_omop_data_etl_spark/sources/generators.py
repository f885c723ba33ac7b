"""Deterministic synthetic fixtures (FIXTURES.md §A) — pure Spark expressions.

Every value is a function of (seed, doc_id / lsn) via ``xxhash64``, so the
same parameters produce bit-identical tables at any parallelism, partitioning,
or cluster size — the property replay/bit-exactness tests depend on. No
``rand()``, no ``monotonically_increasing_id()`` (reference anti-pattern A6 —
IDs must be derived from data, not physical placement), no driver-side loops.

Generation is fully JVM-side (``transform(sequence(...))`` builds the token
arrays inside whole-stage codegen), so fixture creation itself scales to the
bench sizes without Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

VOCAB_SIZE = 50257
MAX_LEN_DEFAULT = 512
SOURCES = ["web", "books", "code", "wiki"]
OPS = ["insert", "update", "delete", "upsert"]
# cumulative weights for (insert .25, update .45, delete .10, upsert .20)
_OP_CUM = [25, 70, 80, 100]


def _u(seed: int, tag: str, *cols: Column) -> Column:
    """Deterministic uniform in [0, 1) keyed on (seed, tag, cols)."""
    h = F.xxhash64(F.lit(seed), F.lit(tag), *cols)
    return F.pmod(h, F.lit(1_000_000_007)).cast("double") / F.lit(1_000_000_007.0)


def _doc_id(idx: Column) -> Column:
    return F.concat(F.lit("doc-"), F.lpad(idx.cast("string"), 8, "0"))


def _tokens(seed: int, key: Column, n: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pmod(F.xxhash64(F.lit(seed), key, i), F.lit(VOCAB_SIZE)).cast("int"),
    )


def base_sequences(
    spark: SparkSession,
    num_docs: int,
    seed: int = 42,
    max_len: int = MAX_LEN_DEFAULT,
    partitions: int | None = None,
) -> DataFrame:
    """The initial target table: (doc_id, tokens array<int>, n_tok int, source)."""
    df = spark.range(0, num_docs, numPartitions=partitions)
    doc = _doc_id(F.col("id"))
    # log-uniform ("Zipf-ish") lengths in [1, max_len]
    n_tok = F.greatest(
        F.lit(1),
        F.pow(F.lit(float(max_len)), _u(seed, "len", doc)).cast("int"),
    ).cast("int")
    src = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]),
        (F.pmod(F.xxhash64(F.lit(seed), F.lit("src"), doc), F.lit(len(SOURCES))) + 1).cast("int"),
    )
    payload_key = F.concat(doc, F.lit("@base"))
    return df.select(
        doc.alias("doc_id"),
        _tokens(seed, payload_key, n_tok).alias("tokens"),
        n_tok.alias("n_tok"),
        src.alias("source"),
    )


def change_log(
    spark: SparkSession,
    num_events: int,
    num_base_docs: int,
    seed: int = 42,
    max_len: int = MAX_LEN_DEFAULT,
    novel_ratio: float = 0.2,
    skew: float = 3.0,
    partitions: int | None = None,
) -> DataFrame:
    """Binlog-style event stream: (lsn, op, doc_id, tokens, n_tok, source).

    * ``lsn`` strictly monotone & unique (= range id).
    * ``doc_id`` drawn power-law-skewed (``u**skew``) over base + novel ids —
      hot-key skew is part of the contract (FIXTURES.md A2).
    * delete events carry NULL payload.
    * payloads are keyed on (doc_id, lsn) so each update has fresh tokens.
    """
    df = spark.range(0, num_events, numPartitions=partitions)
    lsn = F.col("id")
    key_space = int(num_base_docs * (1.0 + novel_ratio)) or 1
    u_doc = _u(seed, "doc", lsn)
    doc_idx = F.least(
        F.lit(key_space - 1), (F.pow(u_doc, F.lit(skew)) * key_space).cast("long")
    )
    doc = _doc_id(doc_idx)
    op_roll = F.pmod(F.xxhash64(F.lit(seed), F.lit("op"), lsn), F.lit(100))
    op = (
        F.when(op_roll < _OP_CUM[0], F.lit("insert"))
        .when(op_roll < _OP_CUM[1], F.lit("update"))
        .when(op_roll < _OP_CUM[2], F.lit("delete"))
        .otherwise(F.lit("upsert"))
    )
    n_tok = F.greatest(
        F.lit(1),
        F.pow(F.lit(float(max_len)), _u(seed, "elen", doc, lsn)).cast("int"),
    ).cast("int")
    payload_key = F.concat(doc, F.lit("@"), lsn.cast("string"))
    src = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]),
        (F.pmod(F.xxhash64(F.lit(seed), F.lit("esrc"), lsn), F.lit(len(SOURCES))) + 1).cast("int"),
    )
    is_del = op == "delete"
    return df.select(
        lsn.alias("lsn"),
        op.alias("op"),
        doc.alias("doc_id"),
        F.when(is_del, F.lit(None)).otherwise(_tokens(seed, payload_key, n_tok)).alias("tokens"),
        F.when(is_del, F.lit(None)).otherwise(n_tok).cast("int").alias("n_tok"),
        F.when(is_del, F.lit(None)).otherwise(src).alias("source"),
    )


def with_duplicates(log: DataFrame, frac: float = 0.1, seed: int = 42) -> DataFrame:
    """Union the log with a deterministic sample of itself replayed verbatim
    (duplicate event delivery — idempotence scenario A2)."""
    dup = log.filter(
        F.pmod(F.xxhash64(F.lit(seed), F.lit("dup"), F.col("lsn")), F.lit(1000))
        < int(frac * 1000)
    )
    return log.unionByName(dup)


def with_added_column(log: DataFrame, from_lsn: int, seed: int = 42) -> DataFrame:
    """Schema-evolution scenario A3.1: events past ``from_lsn`` carry ``lang``."""
    langs = F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("ja"))
    return log.withColumn(
        "lang",
        F.when(
            (F.col("lsn") >= from_lsn) & (F.col("op") != "delete"),
            F.element_at(
                langs, (F.pmod(F.xxhash64(F.lit(seed), F.lit("lang"), F.col("lsn")), F.lit(4)) + 1).cast("int")
            ),
        ),
    )


def with_widened_n_tok(log: DataFrame, from_lsn: int) -> DataFrame:
    """Schema-evolution scenario A3.2: ``n_tok`` exceeds int32 past ``from_lsn``
    (values become ``2^32 + n``), forcing an int64 widening. ``tokens`` stays
    consistent with the true length; ``n_tok`` is the widened logical value."""
    return log.withColumn(
        "n_tok",
        F.when(
            (F.col("lsn") >= from_lsn) & F.col("n_tok").isNotNull(),
            F.col("n_tok").cast("long") + F.lit(2**32).cast("long"),
        ).otherwise(F.col("n_tok").cast("long")),
    )
