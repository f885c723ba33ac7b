"""Deduplication operators for training-data pipelines.

Four families, all shuffle-architected for 100 TB:

* **exact** — fingerprint groupBy (one shuffle on a 8-byte key, map-side
  combined);
* **MinHash + LSH** — shingle → minhash signature (one pass, JVM expressions)
  → band buckets → self-join within buckets only (candidate generation never
  goes quadratic: the join key is (band, band_hash));
* **SimHash** — 64-bit weighted-bit signature; near-dups = equal signatures
  per block or Hamming-adjacent via block keys;
* **n-gram Jaccard** — exact verification on LSH candidates (or standalone on
  small slices).

MinHash permutations use ``xxhash64(shingle, seed_i)`` — deterministic,
JVM-side, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text_analysis import fingerprint64, shingles

LONG_MAX = 2**63 - 1


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per duplicate
    group with member ids and count."""
    return (
        df.select(F.col(id_col), fingerprint64(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n_docs") >= 2)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per fingerprint — the keep-side of
    exact dedup."""
    fp = fingerprint64(F.col(text_col)).alias("_fp")
    ranked = df.withColumn("_fp", fp)
    from .lww import lww_latest

    # min-id representative == LWW with ascending order on id
    return lww_latest(ranked, "_fp", id_col, descending=False).drop("_fp")


def minhash_signature(text: Column, num_hashes: int = 32, k: int = 3) -> Column:
    """MinHash signature as array<long>: for each of ``num_hashes`` seeded
    hash functions, the min over the document's shingle set."""
    sh = shingles(text, k)

    # NB: closure factory, not `lambda s, i=i:` — PySpark derives higher-order
    # lambda variables from the Python lambda's arity, so an extra defaulted
    # param would silently become the array-index variable.
    def hash_i(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    mins = [F.array_min(F.transform(sh, hash_i(i))) for i in range(num_hashes)]
    return F.array(*[F.coalesce(m, F.lit(LONG_MAX)) for m in mins])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    signature → ``bands`` bands of ``num_hashes/bands`` rows; docs sharing any
    band hash land in the same bucket; pairs are generated per bucket with a
    self-join keyed on (band, hash) so work is proportional to bucket sizes,
    never |docs|². Returns distinct (id_a < id_b) pairs."""
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(text_col), num_hashes, k).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(",", *[F.col("_sig")[b * rows + r].cast("string") for r in range(rows)])
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact word-k-gram Jaccard similarity pairs ≥ threshold.

    Without ``candidates``: candidate pairs come from sharing at least one
    shingle (inverted-index join — exact, still sub-quadratic for natural
    corpora). With ``candidates`` (e.g. LSH output): verification only."""
    sh = df.select(
        F.col(id_col).alias("_id"), shingles(F.col(text_col), k).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    if candidates is None:
        inv = sh.select("_id", F.explode("_sh").alias("_g"))
        pairs = (
            inv.alias("a")
            .join(inv.alias("b"), (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("_inter"))
        )
        sizes = sh.select("_id", "_n")
        joined = (
            pairs.join(sizes.withColumnsRenamed({"_id": "id_a", "_n": "_na"}), "id_a")
            .join(sizes.withColumnsRenamed({"_id": "id_b", "_n": "_nb"}), "id_b")
        )
        jac = F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))
    else:
        joined = (
            candidates.join(sh.withColumnsRenamed({"_id": "id_a", "_sh": "_sha", "_n": "_na"}), "id_a")
            .join(sh.withColumnsRenamed({"_id": "id_b", "_sh": "_shb", "_n": "_nb"}), "id_b")
        )
        inter = F.size(F.array_intersect("_sha", "_shb"))
        jac = inter / (F.col("_na") + F.col("_nb") - inter)
    return (
        joined.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text: Column, k: int = 3) -> Column:
    """64-bit SimHash over word shingles, built from bit-vote aggregation in
    pure expressions: for each bit position, sum(+1/-1 votes) over shingles'
    xxhash64 bits; bit set iff the vote is positive."""
    sh = shingles(text, k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))

    def vote(b: int):  # closure factory — see minhash_signature note
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), vote(b)) for b in range(64)]
    out = F.lit(0).cast("long")
    for b, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(1).cast("long") * F.lit(2 ** b if b < 63 else -(2**63))).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    max_distance: int = 3,
    blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash block match (Manku et al. pigeonhole): split
    the 64-bit signature into ``max_distance + 1`` blocks — any pair within
    ``max_distance`` Hamming bits MUST share at least one whole block → join
    on (block_idx, block_value), then verify with the exact Hamming distance.

    Scale note: larger ``max_distance`` → narrower blocks → bigger collision
    buckets. The default (3 ⇒ four 16-bit blocks) is the classic web-dedup
    setting; recall-oriented callers can raise it at candidate-volume cost."""
    if blocks is None:
        blocks = min(max_distance + 1, 32)
    sig = df.select(F.col(id_col).alias("_id"), simhash64(F.col(text_col), k).alias("_sim"))
    # distribute 64 bits over `blocks` contiguous blocks (widths differ by ≤1)
    base_w, extra = divmod(64, blocks)
    bounds, off = [], 0
    for i in range(blocks):
        w = base_w + (1 if i < extra else 0)
        bounds.append((off, w))
        off += w
    blocked = sig.select(
        "_id",
        "_sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("_sim", off).bitwiseAND(F.lit((1 << w) - 1))
                    for off, w in bounds
                ]
            )
        ).alias("_blk", "_val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._val") == F.col("b._val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sim").alias("_sa"),
            F.col("b._sim").alias("_sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming_distance")).filter(
        F.col("hamming_distance") <= max_distance
    )
