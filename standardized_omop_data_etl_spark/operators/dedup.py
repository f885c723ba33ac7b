"""Deduplication operators for training-data pipelines.

Five families, all shuffle-architected for 100 TB:

* **exact** — fingerprint groupBy (one shuffle on a 8-byte key, map-side
  combined);
* **MinHash + LSH** — shingle → minhash signature (one pass, JVM expressions)
  → band buckets → per-bucket pair explode (candidate generation never goes
  quadratic: the join key is (band, band_hash));
* **SimHash** — 64-bit weighted-bit signature; near-dups = equal signatures
  per block or Hamming-adjacent via block keys;
* **n-gram Jaccard** — exact pairs via df-capped inverted index + full-set
  verification (or verification-only on LSH candidates);
* **embedding-cosine** — near-dup pairs over an embedding column: brute
  baseline, hyperplane-LSH bucketed scale path, candidate verification.

Skew guards everywhere a bucket/posting list could go hot: bucket membership
is counted map-side FIRST and oversized buckets dropped before any
``collect_list`` materializes them (``DEFAULT_MAX_BUCKET``), and Jaccard
postings carry a document-frequency cutoff (``DEFAULT_DF_MAX``) with exact
verification of the surviving pairs — the standard trades that keep
candidate generation bounded on mass-duplicated boilerplate at 100 TB.

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
    """MinHash signature as array<long>, built in ONE pass over the shingle
    array: a fold whose accumulator is the running per-function minimum.

    (The naive ``array_min(transform(...))`` per hash function re-evaluates
    the shingling under every hash — higher-order lambdas block Catalyst's
    subexpression elimination — measured ~``num_hashes``× the cost.)"""
    sh = shingles(text, k)
    init = F.array_repeat(F.lit(LONG_MAX), num_hashes)

    def step(acc, s):
        hs = F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)])
        return F.zip_with(acc, hs, lambda a, b: F.least(a, b))

    return F.aggregate(sh, init, step)


def minhash_signatures_df(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, k: int = 3
) -> DataFrame:
    """(id, _h0.._hN) MinHash signatures via explode → primitive min aggs.

    This is the scale path: shingles are computed exactly once per document
    (explode is a generator barrier, immune to projection-collapse
    recomputation), and the mins are codegen HashAggregate over longs with
    map-side partial aggregation. One shuffle keyed by doc id."""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(shingles(F.col(text_col), k)).alias("_s"),
    )
    # ONE aggregation pass: empty docs (explode_outer's NULL shingle — note
    # xxhash64(NULL) is a real hash, not NULL, so min() wouldn't skip it) are
    # detected by a count in the same agg and rewritten to the sentinel
    # signature afterwards. The previous union-of-two-branches formulation
    # consumed the explode twice — a full second shingle pass over the corpus.
    aggs = [
        F.min(F.xxhash64("_s", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)
    ] + [F.count("_s").alias("_nn")]
    g = ex.groupBy("_id").agg(*aggs)
    return g.select(
        "_id",
        *[
            F.when(F.col("_nn") == 0, F.lit(LONG_MAX))
            .otherwise(F.col(f"_h{i}"))
            .alias(f"_h{i}")
            for i in range(num_hashes)
        ],
    )


# Skew guards. A hot LSH bucket / posting list (mass-duplicated boilerplate,
# a stop-shingle) is the classic 100 TB failure mode: collect_list of the
# whole membership OOMs one task and Σ|bucket|² goes quadratic. Buckets past
# the cap are DROPPED from candidate generation (count-first, so the member
# list is never materialized); callers needing visibility use
# ``oversized_buckets`` to log/report what was skipped.
DEFAULT_MAX_BUCKET = 1000
DEFAULT_DF_MAX = 1000


def oversized_buckets(buckets: DataFrame, max_bucket: int) -> DataFrame:
    """(band, bucket, n_members) of buckets the cap would drop — the
    observability companion of ``_bucket_pairs``/``ngram_jaccard_pairs``."""
    return (
        buckets.groupBy("_band", "_bucket")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket)
    )


def drop_stats(buckets: DataFrame, max_bucket: int) -> DataFrame:
    """One-row accounting of what the skew cap removes from candidate
    generation: ``(dropped_buckets, dropped_members, max_bucket)``. Zero rows
    dropped ⇒ the candidate set is COMPLETE (no silent caps); non-zero ⇒ the
    run must surface it (the ``*_with_stats`` entry points return this next
    to the pairs, and the driver queries expose it as ``*_drop_stats``)."""
    return oversized_buckets(buckets, max_bucket).agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("dropped_buckets"),
        F.coalesce(F.sum("n_members"), F.lit(0)).cast("long").alias("dropped_members"),
        F.lit(max_bucket).cast("long").alias("max_bucket"),
    )


def _bucket_pairs(
    buckets: DataFrame,
    payload: list[str] | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(bucket → member list) → distinct (id_a < id_b) pairs, generated by a
    double explode of the collected member array — no self-join, so the
    upstream signature computation runs once, and work stays proportional to
    Σ bucket².

    ``max_bucket`` caps bucket size with a WINDOW count over
    (_band, _bucket): one shuffle, one pass over the input — the count and
    the filter happen inside the same exchange the member groupBy needs, and
    the upstream (signature computation) is consumed exactly ONCE. (The
    count-aggregate + semi-join formulation read the upstream twice —
    Catalyst does not reuse the exchange across the two consumers — which
    doubled the signature computation; verified by plan audit.) Oversized
    buckets are filtered before ``collect_list``, so no task ever
    materializes a hot bucket's member list."""
    from pyspark.sql import Window

    cols = ["_id"] + (payload or [])
    if max_bucket is not None:
        w = Window.partitionBy("_band", "_bucket")
        buckets = (
            buckets.withColumn("_bn", F.count(F.lit(1)).over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    member = F.struct(*[F.col(c) for c in cols])
    grouped = buckets.groupBy("_band", "_bucket").agg(
        F.collect_list(member).alias("_ms")
    ).filter(F.size("_ms") >= 2)
    a = grouped.select(F.explode("_ms").alias("_a"), "_ms")
    pairs = a.select(
        "_a",
        F.explode(F.filter(F.col("_ms"), lambda m: m["_id"] > F.col("_a._id"))).alias("_b"),
    )
    out = [F.col("_a._id").alias("id_a"), F.col("_b._id").alias("id_b")]
    for c in payload or []:
        out.append(F.col("_a." + c).alias(c + "_a"))
        out.append(F.col("_b." + c).alias(c + "_b"))
    return pairs.select(*out).distinct()


def _minhash_banded(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, bands: int, k: int
) -> DataFrame:
    rows = num_hashes // bands
    sig = minhash_signatures_df(df, text_col, id_col, num_hashes, k)
    return sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",", *[F.col(f"_h{b * rows + r}").cast("string") for r in range(rows)]
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    signature → ``bands`` bands of ``num_hashes/bands`` rows; docs sharing any
    band hash land in the same bucket; pairs come from a per-bucket member
    explode so work is proportional to bucket sizes, never |docs|². Returns
    distinct (id_a < id_b) pairs. Buckets with more than ``max_bucket``
    members are dropped (see ``_bucket_pairs``); use
    ``minhash_lsh_with_stats`` when the run must account for the drops."""
    banded = _minhash_banded(df, text_col, id_col, num_hashes, bands, k)
    return _bucket_pairs(banded, max_bucket=max_bucket)


def minhash_lsh_with_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """``minhash_lsh_candidates`` plus the drop accounting: returns
    ``(pairs, stats)`` where stats is the one-row ``drop_stats`` frame. A
    capped run is now distinguishable from a complete one — stats showing
    ``dropped_members == 0`` certifies the candidate set is exhaustive for
    the banding scheme."""
    banded = _minhash_banded(df, text_col, id_col, num_hashes, bands, k)
    cap = max_bucket if max_bucket is not None else (1 << 62)
    return _bucket_pairs(banded, max_bucket=max_bucket), drop_stats(banded, cap)


def jaccard_df_cutoff_stats(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, df_max: int = DEFAULT_DF_MAX
) -> DataFrame:
    """One-row accounting of the ``ngram_jaccard_pairs`` df-cutoff:
    ``(dropped_shingles, dropped_postings, df_max)`` — how many distinct
    shingles exceeded the document-frequency cap (and the total posting rows
    excluded with them). Zero dropped shingles certifies the inverted-index
    candidate set was EXACT; non-zero quantifies the only pairs the capped
    path can miss (pairs whose every common shingle is ultra-common)."""
    inv = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles(F.col(text_col), k)).alias("_g")
    )
    per = inv.groupBy("_g").agg(F.count(F.lit(1)).alias("_df")).filter(F.col("_df") > df_max)
    return per.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("dropped_shingles"),
        F.coalesce(F.sum("_df"), F.lit(0)).cast("long").alias("dropped_postings"),
        F.lit(df_max).cast("long").alias("df_max"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    df_max: int | None = DEFAULT_DF_MAX,
) -> DataFrame:
    """Exact word-k-gram Jaccard similarity pairs ≥ threshold.

    Without ``candidates``: candidate pairs come from sharing at least one
    shingle (inverted-index join — exact, still sub-quadratic for natural
    corpora). With ``candidates`` (e.g. LSH output): verification only.

    ``df_max`` is the document-frequency cutoff on postings lists (the skew
    guard): shingles shared by more than ``df_max`` docs are excluded from
    CANDIDATE generation (a stop-shingle shared by 10M docs would make
    Σ|posting|² quadratic), and the surviving candidate pairs are then
    verified against the FULL shingle sets — so the output stays exact for
    any pair that shares at least one sub-cutoff shingle. Only pairs whose
    every common shingle is ultra-common are missed (the standard
    inverted-index trade; pass ``df_max=None`` for the uncapped exact path)."""
    from pyspark.sql import Window

    sh = df.select(
        F.col(id_col).alias("_id"), shingles(F.col(text_col), k).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    if candidates is None and df_max is not None:
        # capped path: df-filtered inverted index → id pairs → exact verify.
        # The df cutoff is a WINDOW count per shingle — one shuffle, one pass
        # (a count-agg + semi-join would consume the shingle explode twice).
        inv = df.select(
            F.col(id_col).alias("_id"), F.explode(shingles(F.col(text_col), k)).alias("_g")
        )
        w = Window.partitionBy("_g")
        grouped = (
            inv.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter((F.col("_df") >= 2) & (F.col("_df") <= df_max))
            .groupBy("_g")
            .agg(F.collect_list("_id").alias("_ms"))
        )
        a = grouped.select(F.explode("_ms").alias("_ida"), "_ms")
        candidates = (
            a.select(
                F.col("_ida").alias("id_a"),
                F.explode(F.filter(F.col("_ms"), lambda m: m > F.col("_ida"))).alias("id_b"),
            ).distinct()
        )
        # verification below only needs the CANDIDATE docs' shingles: filter
        # the raw docs by candidate id BEFORE the shingle projection, so the
        # shingling cost of verification ∝ candidate docs, not corpus (AQE
        # converts the semi join to broadcast at runtime when the id set is
        # small — no eager count needed to decide).
        cand_ids = candidates.select(
            F.explode(F.array("id_a", "id_b")).alias(id_col)
        ).distinct()
        sh = (
            df.join(cand_ids, id_col, "left_semi")
            .select(F.col(id_col).alias("_id"), shingles(F.col(text_col), k).alias("_sh"))
            .withColumn("_n", F.size("_sh"))
        )
    if candidates is None:
        # inverted index WITHOUT a self-join: group per shingle, explode the
        # member list into ordered pairs, count shared shingles per pair.
        # (A self-join on the exploded index evaluates the shingling twice
        # and re-shuffles both sides; this is one explode + two groupBys.)
        inv = sh.select("_id", "_n", F.explode("_sh").alias("_g"))
        member = F.struct(F.col("_id"), F.col("_n"))
        grouped = inv.groupBy("_g").agg(F.collect_list(member).alias("_ms")).filter(
            F.size("_ms") >= 2
        )
        a = grouped.select(F.explode("_ms").alias("_a"), "_ms")
        pair_rows = a.select(
            "_a",
            F.explode(
                F.filter(F.col("_ms"), lambda m: m["_id"] > F.col("_a._id"))
            ).alias("_b"),
        )
        joined = pair_rows.groupBy(
            F.col("_a._id").alias("id_a"),
            F.col("_b._id").alias("id_b"),
            F.col("_a._n").alias("_na"),
            F.col("_b._n").alias("_nb"),
        ).agg(F.count(F.lit(1)).alias("_inter"))
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


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
    candidates: DataFrame | None = None,
    dim: int | None = None,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ≥ threshold
    (id_a < id_b, cosine_sim).

    Three modes, mirroring ``ngram_jaccard_pairs``:

    * ``candidates`` given — verification only: exact cosine on the candidate
      pairs (one narrow join back to the vectors).
    * ``dim`` given — scale path: random-hyperplane sign-bit sketches over
      ``tables`` independent tables bucket the corpus (reusing
      ``similarity._sketch``'s deterministic hyperplanes); pairs colliding in
      ≥1 table are verified exactly. Work ∝ Σ bucket² (capped by
      ``max_bucket``), never |corpus|². Recall follows the standard LSH
      curve — near-identical vectors (true near-dups) collide with
      probability ~1; use more ``tables`` for lower thresholds.
    * neither — exact brute force over all id_a < id_b pairs: the baseline
      for verification/oracles on SMALL slices (quadratic; not the 100 TB
      path).
    """
    from .similarity import _sketch, cosine as _cos

    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if candidates is None and dim is not None:
        sketched = vecs.select(
            "_id",
            F.posexplode(
                F.array(*[_sketch(F.col("_v"), dim, bits, seed, t) for t in range(tables)])
            ).alias("_band", "_bucket"),
        )
        candidates = _bucket_pairs(sketched, max_bucket=max_bucket)
    if candidates is not None:
        joined = (
            candidates.select("id_a", "id_b")
            .join(vecs.withColumnsRenamed({"_id": "id_a", "_v": "_va"}), "id_a")
            .join(vecs.withColumnsRenamed({"_id": "id_b", "_v": "_vb"}), "id_b")
        )
    else:
        a = vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
        b = vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(_cos(F.col("_va"), F.col("_vb")), 6)
    return (
        joined.select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def simhash_signatures_df(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(id, _sim) 64-bit SimHash signatures via explode → 64 primitive ±1
    vote sums (codegen HashAggregate, map-side combined), then one projection
    folding the concrete vote columns into the signature long. Shingles are
    evaluated once per document; the old per-bit ``F.aggregate`` formulation
    re-evaluated the shingling 64× (higher-order lambdas block Catalyst CSE).
    """
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(shingles(F.col(text_col), k)).alias("_s"),
    )
    h = F.xxhash64("_s")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(64)
    ]
    # ONE aggregation pass (cf. minhash_signatures_df): empty docs are the
    # groups whose only row is explode_outer's NULL — detected by a count in
    # the same agg and rewritten to signature 0 (the union-of-two-branches
    # formulation consumed the shingle explode twice).
    voted = ex.groupBy("_id").agg(*aggs, F.count("_s").alias("_nn"))
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(
            F.col(f"_v{b}") > 0,
            F.lit(2**b if b < 63 else -(2**63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return voted.select(
        "_id", F.when(F.col("_nn") == 0, F.lit(0).cast("long")).otherwise(sig).alias("_sim")
    )


def simhash_adaptive_blocks(
    n_docs: int,
    max_distance: int,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    margin: int = 16,
) -> int:
    """Block count for ``simhash_duplicates`` that keeps expected bucket
    population under the skew cap as the corpus grows.

    ``max_distance + 1`` blocks give the Manku pigeonhole GUARANTEE (any pair
    within the distance shares a whole block) — but wide distances over 64
    bits make each block narrow: at ``max_distance=12``, 13 blocks of ~5 bits
    ⇒ ≤32 distinct values per band, so past ~``32 × max_bucket`` docs EVERY
    bucket exceeds the cap and candidate generation silently returns nothing
    (the round-2 scale hazard). This helper caps blocks so each block keeps
    ``2^width ≥ margin × n_docs / max_bucket`` distinct values — buckets stay
    ~``max_bucket/margin`` even under a uniform signature distribution.

    When the returned count is BELOW ``max_distance + 1`` the guarantee
    degrades to high-probability recall (a pair must fit its ``max_distance``
    differing bits outside one of the wider blocks); the caller sees that by
    comparing the return value to ``max_distance + 1`` — at small corpora the
    two coincide and behavior is unchanged."""
    import math

    need = max(1, (margin * max(n_docs, 1)) // max(max_bucket, 1))
    width = max(2, math.ceil(math.log2(need)))  # 2^width distinct block values
    return max(1, min(max_distance + 1, 64 // width, 32))


def _simhash_blocked(
    df: DataFrame, text_col: str, id_col: str, k: int, blocks: int
) -> DataFrame:
    sig = simhash_signatures_df(df, text_col, id_col, k)
    # distribute 64 bits over `blocks` contiguous blocks (widths differ by ≤1)
    base_w, extra = divmod(64, blocks)
    bounds, off = [], 0
    for i in range(blocks):
        w = base_w + (1 if i < extra else 0)
        bounds.append((off, w))
        off += w
    return sig.select(
        "_id",
        "_sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("_sim", off).bitwiseAND(F.lit((1 << w) - 1))
                    for off, w in bounds
                ]
            )
        ).alias("_band", "_bucket"),
    )


def simhash_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    max_distance: int = 3,
    blocks: int | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    n_docs: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash block match (Manku et al. pigeonhole): split
    the 64-bit signature into ``max_distance + 1`` blocks — any pair within
    ``max_distance`` Hamming bits MUST share at least one whole block → join
    on (block_idx, block_value), then verify with the exact Hamming distance.

    Scale note: larger ``max_distance`` → narrower blocks → bigger collision
    buckets, to the point where the skew cap would drop EVERY bucket. Pass
    ``n_docs`` (an exact or estimated corpus size) to pick the block count
    adaptively via ``simhash_adaptive_blocks`` — at small corpora it returns
    the guaranteed ``max_distance + 1`` split; at scale it widens blocks so
    buckets stay under ``max_bucket`` (trading the hard guarantee for
    high-probability recall instead of silent zero recall). Explicit
    ``blocks`` overrides. ``simhash_with_stats`` additionally returns the
    drop accounting."""
    if blocks is None:
        if n_docs is not None and max_bucket is not None:
            blocks = simhash_adaptive_blocks(n_docs, max_distance, max_bucket)
        else:
            blocks = min(max_distance + 1, 32)
    blocked = _simhash_blocked(df, text_col, id_col, k, blocks)
    pairs = _bucket_pairs(blocked, payload=["_sim"], max_bucket=max_bucket)
    hamming = F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming_distance")).filter(
        F.col("hamming_distance") <= max_distance
    )


def simhash_with_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    max_distance: int = 3,
    blocks: int | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    n_docs: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """``simhash_duplicates`` plus the one-row ``drop_stats`` frame (cf.
    ``minhash_lsh_with_stats``): non-zero ``dropped_members`` means the pair
    set is incomplete for the chosen blocking and the caller must either
    widen blocks (smaller ``blocks`` / bigger ``n_docs`` hint) or raise the
    cap."""
    if blocks is None:
        if n_docs is not None and max_bucket is not None:
            blocks = simhash_adaptive_blocks(n_docs, max_distance, max_bucket)
        else:
            blocks = min(max_distance + 1, 32)
    blocked = _simhash_blocked(df, text_col, id_col, k, blocks)
    cap = max_bucket if max_bucket is not None else (1 << 62)
    pairs = _bucket_pairs(blocked, payload=["_sim"], max_bucket=max_bucket)
    hamming = F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
    out = pairs.select("id_a", "id_b", hamming.alias("hamming_distance")).filter(
        F.col("hamming_distance") <= max_distance
    )
    return out, drop_stats(blocked, cap)


def benchmark_contamination(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str,
    id_col: str,
    probe_id_col: str | None = None,
    k: int = 3,
    min_shared: int = 2,
    corpus_df_max: int | None = None,
) -> DataFrame:
    """Benchmark-decontamination sweep: ``(id, probe_id, shared_ngrams)``
    for every corpus document sharing ≥ ``min_shared`` DISTINCT word
    ``k``-grams with a probe document (an eval/benchmark set). The standard
    pre-training hygiene pass — corpus rows that echo benchmark text inflate
    eval scores and must be dropped or flagged. (No reference analogue; this
    belongs to the engine's LLM-pipeline family next to MinHash/SimHash.)

    Scale shape: the probe set (benchmarks are ~10³–10⁶ docs) is shingled,
    DISTINCT-ed, and broadcast; the 100 TB corpus streams through one
    explode + broadcast hash join + map-side-combined count — no corpus-side
    wide shuffle beyond the (id, probe_id) count exchange, whose size is
    bounded by actual hits. Shingle arrays are distinct per doc
    (``shingles``), so ``count(*)`` IS the distinct shared-gram count.

    ``corpus_df_max`` (optional) drops grams whose CORPUS document frequency
    exceeds the cap before the join — the stop-gram guard for small ``k``:
    a gram like "of the and" present in both a probe and most of the corpus
    fans the join out O(corpus) for zero decontamination signal. Costs one
    extra map-side-combined aggregate over the exploded corpus; leave None
    for k ≥ 5 where natural collisions are rare."""
    pid = probe_id_col or id_col
    p = (
        probes.select(
            F.col(pid).alias("probe_id"),
            F.explode(shingles(F.col(text_col), k)).alias("_g"),
        ).distinct()
    )
    d = docs.select(
        F.col(id_col).alias("_doc_id"),
        F.explode(shingles(F.col(text_col), k)).alias("_g"),
    )
    if corpus_df_max is not None:
        # anti-join the DROPPED grams: stop-grams are few by definition, so
        # the broadcast is bounded; broadcasting the keep-set would ship the
        # corpus's whole distinct-gram space.
        drop = (
            d.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > corpus_df_max)
            .select("_g")
        )
        d = d.join(F.broadcast(drop), "_g", "left_anti")
    hits = (
        d.join(F.broadcast(p), "_g")
        .filter(F.col("_doc_id") != F.col("probe_id"))
        .groupBy("_doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )
    return hits.select(F.col("_doc_id").alias(id_col), "probe_id", "shared_ngrams")
