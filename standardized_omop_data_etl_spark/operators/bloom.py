"""Blocked-bloom prefilters for key-set joins — the no-driver-relation path.

Every MERGE epoch needs a handful of "is this row's key in that key set?"
joins: the narrow kernel's winner fetch, the metrics probe, and the
copy-on-write semi/anti filters. Under ``BROADCAST_KEYS_MAX`` these were
driver-broadcast hash relations — but building one is O(keys) SERIAL driver
time (~1.3 s at 1.6M keys), the per-epoch cost that grows with batch size
and not with cores, i.e. exactly what caps N→4N scaling efficiency at the
10^10-event grain. (On a real cluster it is also a driver hot spot: a 4M-key
relation is a 100-200 MB build THEN a fanout to every executor.)

The blocked bloom replaces the relation with a bitmap:

* one 64-bit block per element, ``BLOOM_PROBES`` bit positions inside it,
  derived from ``xxhash64`` — pure JVM integer expressions on both sides;
* built DISTRIBUTED: per-word ``bit_or`` aggregate on executors, only the
  ≤nwords (word, bits) pairs reach the driver (Arrow), which scatter-fills
  a dense numpy array — O(bitmap) driver work, not O(keys);
* attached as a ONE-ROW broadcast (BroadcastNestedLoopJoin) — the build of
  a 1-row relation is free, the payload is the array itself;
* false positives are resolved by an EXACT shuffle-hash join over only the
  bloom-positive rows, co-partitioned at the caller's partition count. With
  ``num_partitions = num_buckets`` that partitioning IS the lake's bucket
  layout (``sources.lake.bucket_expr`` deliberately equals Spark's Murmur3
  ``repartition`` hash), so a bloom-filtered rewrite stays bucket-clustered
  end to end — no post-hoc re-cluster exchange, unlike a plain shuffled
  semi/anti join.
* false negatives are impossible (every inserted element's bits are set),
  so ``bloom_semi``/``bloom_anti`` are exact.

Sizing is forgiving by construction: an undersized bitmap only raises the
false-positive rate — more rows through the exact join, never a wrong row
and never an OOM. ``_BLOOM_MAX_WORDS`` caps the bitmap at 16 MiB.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

# Key sets at or under this many rows are still broadcast directly: a small
# hash relation builds in well under 100 ms, cheaper than the bloom's extra
# bitmap job on a micro-batch. Env-tunable for campaign A/Bs
# (SODES_DIRECT_BCAST_MAX, read at CALL time by plans.merge._dbm — an export
# mid-session takes effect on the next epoch; this is the no-env fallback).
DIRECT_BCAST_MAX = int(os.environ.get("SODES_DIRECT_BCAST_MAX", 512_000))

BLOOM_BITS_PER_KEY = 16
BLOOM_PROBES = 4
_BLOOM_MIN_WORDS = 1 << 14   # 128 KiB floor: sizing noise on tiny batches
_BLOOM_MAX_WORDS = 1 << 21   # 16 MiB cap ≈ 4M keys × 16 bits (then fp rises)


def bloom_words(est_keys: int) -> int:
    """Bitmap size (64-bit words, power of two) for ``est_keys`` elements."""
    n = max(_BLOOM_MIN_WORDS, (max(est_keys, 1) * BLOOM_BITS_PER_KEY) // 64)
    return min(1 << (n - 1).bit_length(), _BLOOM_MAX_WORDS)


def bloom_widx_mask(hash_col: Column, nwords: int) -> tuple[Column, Column]:
    """(word index, in-word probe mask) for a 64-bit hash — pure JVM integer
    ops (dynamic shifts via ``call_function``), fully codegen'd."""
    widx = hash_col.bitwiseAND(F.lit(nwords - 1))
    h2 = F.call_function("shiftrightunsigned", hash_col, F.lit(32))
    mask = None
    for i in range(BLOOM_PROBES):
        pos = (
            F.call_function("shiftrightunsigned", h2, F.lit(6 * i))
            .bitwiseAND(F.lit(63)).cast("int")
        )
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), pos)
        mask = bit if mask is None else mask.bitwiseOR(bit)
    return widx, mask


def bloom_frame(elements: DataFrame, hash_col: Column, nwords: int) -> DataFrame:
    """One-row DataFrame carrying the bitmap (``_bf array<bigint>``) over
    ``hash_col`` evaluated against ``elements``. Build is distributed; the
    driver's work is O(bitmap) (Arrow collect of (word, bits) pairs + a
    vectorized scatter), never O(elements)."""
    import numpy as np

    widx, mask = bloom_widx_mask(hash_col, nwords)
    pairs = (
        elements.select(widx.alias("_w"), mask.alias("_m"))
        .groupBy("_w").agg(F.bit_or("_m").alias("_m"))
        .toArrow()
    )
    words = np.zeros(nwords, dtype=np.int64)
    if pairs.num_rows:
        words[pairs.column("_w").to_numpy()] = pairs.column("_m").to_numpy()
    spark = elements.sparkSession
    try:
        import pyarrow as pa

        return spark.createDataFrame(
            pa.table({"_bf": pa.array([words.tolist()], type=pa.list_(pa.int64()))})
        )
    except Exception:
        return spark.createDataFrame([(words.tolist(),)], "_bf array<bigint>")


def bloom_member(bf_col: Column, hash_col: Column, nwords: int) -> Column:
    widx, mask = bloom_widx_mask(hash_col, nwords)
    word = F.element_at(bf_col, (widx + F.lit(1)).cast("int"))
    return word.bitwiseAND(mask) == mask


def _split_by_bloom(base: DataFrame, keys_df: DataFrame, key: str,
                    n_keys: int) -> tuple[DataFrame, DataFrame]:
    """Split ``base`` into (bloom-positive, bloom-negative) frames.

    Deliberate trade-off: the two returned frames are two filters over the
    same uncached lineage, so a consumer that uses BOTH (``bloom_anti``)
    scans ``base`` twice and evaluates the membership expression twice.
    That is the cheaper side of the bargain on the cow-rewrite path where
    this runs: ``base`` there is a column-complete scan of bucket-clustered
    LOCAL parquet (~GB/s, no exchange), while the alternatives each cost
    more — persisting the tagged frame materializes array-bearing wide rows
    through the block manager (measured ~10× a parquet re-scan,
    plans/merge.py scratch-spill note), and a single-pass split would have
    to exchange the bloom-negatives, which is exactly what the bloom form
    exists to avoid. ``bloom_semi`` consumes only the positive frame, so it
    pays one scan."""
    h = F.xxhash64(F.col(key))
    nwords = bloom_words(n_keys)
    bf = bloom_frame(keys_df.select(key), h, nwords)
    tagged = base.join(F.broadcast(bf)).withColumn(
        "_bloom_hit", bloom_member(F.col("_bf"), h, nwords)
    ).drop("_bf")
    return (
        tagged.filter(F.col("_bloom_hit")).drop("_bloom_hit"),
        tagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit"),
    )


def bloom_semi(base: DataFrame, keys_df: DataFrame, key: str, n_keys: int,
               num_partitions: int) -> DataFrame:
    """Exact ``base ⋉ keys_df`` on ``key`` without a driver-built relation:
    bloom-negative rows are dropped map-side (no false negatives), only the
    positives (matches + ~0.1-0.5% fp) pay the exact shuffle-hash semi join,
    co-partitioned at ``num_partitions``."""
    pos, _ = _split_by_bloom(base, keys_df, key, n_keys)
    return pos.repartition(num_partitions, F.col(key)).join(
        keys_df.select(key).repartition(num_partitions, F.col(key))
        .hint("shuffle_hash"),
        on=key, how="left_semi",
    )


def bloom_anti(base: DataFrame, keys_df: DataFrame, key: str, n_keys: int,
               num_partitions: int) -> DataFrame:
    """Exact ``base ▷ keys_df`` on ``key``: bloom-negative rows survive
    map-side WITHOUT any exchange (they cannot be in the set), positives go
    through the exact anti join. With ``num_partitions = num_buckets`` every
    output partition stays bucket-pure (repartition's Murmur3-pmod IS the
    bucket function), so a bucketed writer downstream needs no re-cluster."""
    pos, neg = _split_by_bloom(base, keys_df, key, n_keys)
    kept = pos.repartition(num_partitions, F.col(key)).join(
        keys_df.select(key).repartition(num_partitions, F.col(key))
        .hint("shuffle_hash"),
        on=key, how="left_anti",
    )
    return neg.unionByName(kept)
