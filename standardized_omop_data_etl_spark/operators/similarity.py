"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k of query vectors vs a corpus:
  broadcast the (small) query side, score with pure expressions
  (``zip_with`` + ``aggregate`` dot product inside codegen), rank per query
  with a window. The baseline and the "small q × huge corpus" scale path.
* ``lsh_topk`` — random-hyperplane LSH: corpus and queries are bucketed by
  sign-bit sketches over ``tables`` independent sketch sets; scoring happens
  only within matching buckets, turning the q×N cross product into
  q×(N/2^bits)·tables expected work — the 100 TB path.
* ``ivf_topk`` — IVF-style ANN: corpus rows are assigned to their nearest of
  C deterministic anchors (one narrow pass); each query scores only rows in
  its ``nprobe`` best anchor cells.

Hyperplanes/anchors are generated deterministically from a seed with
``xxhash64`` expressions — no driver-side RNG state, no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _rand_vector(dim: int, seed: int, *tags) -> Column:
    """Deterministic pseudo-random vector in [-1, 1]^dim as ONE array
    literal.

    The values are derived driver-side (sha256 over (seed, tags, j)) and
    shipped as a single ``F.lit(list)`` node. The previous per-component
    expression formulation (``pmod(xxhash64(lit...))`` × dim × bits × tables)
    built 10k+-node constant trees that Catalyst had to fold and codegen on
    every ANN query — tens of seconds of pure planning time for a
    milliseconds-of-execution sketch."""
    import hashlib

    vals = []
    for j in range(dim):
        h = hashlib.sha256(repr((seed, tags, j)).encode()).digest()
        u = int.from_bytes(h[:8], "big") % 2001
        vals.append((u - 1000.0) / 1000.0)
    return F.lit(vals)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force, broadcast queries).
    Self-matches (same id) excluded. Returns
    (query_id, neighbor_id, cosine_sim, rank)."""
    qid = query_id_col or id_col
    q = F.broadcast(queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("_qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine_sim"),
        )
    )
    return _topk(scored, k)


def _sketch(vec: Column, dim: int, bits: int, seed: int, table: int) -> Column:
    """Sign-bit sketch: bit_i = [dot(vec, hyperplane_i) > 0]."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        h = _rand_vector(dim, seed, "lsh", table, i)
        out = out + F.when(_dot(vec, h) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: score only pairs colliding in ≥1 sketch table."""
    qid = query_id_col or id_col

    def sketched(df: DataFrame, idc: str, out_id: str, out_vec: str) -> DataFrame:
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode(
                F.array(*[_sketch(F.col(vec_col), dim, bits, seed, t) for t in range(tables)])
            ).alias("_tbl", "_sketch"),
        )

    qs = sketched(queries, qid, "query_id", "_qv")
    cs = sketched(corpus, id_col, "neighbor_id", "_cv")
    cand = (
        qs.join(cs, ["_tbl", "_sketch"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine_sim"),
        )
        .distinct()
    )
    return _topk(cand, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    query_id_col: str | None = None,
) -> DataFrame:
    """IVF-style ANN with deterministic anchors."""
    qid = query_id_col or id_col

    def cell_scores(vec: Column) -> Column:
        return F.array(
            *[cosine(vec, _rand_vector(dim, seed, "ivf", c)) for c in range(num_centroids)]
        )

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
        .withColumn("_cells", cell_scores(F.col("_cv")))
        .withColumn("_cell", F.array_position(F.col("_cells"), F.array_max("_cells")) - 1)
        .drop("_cells")
    )
    q = (
        queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("_qv"))
        .select(
            "query_id",
            "_qv",
            F.posexplode(cell_scores(F.col("_qv"))).alias("_cell", "_cellscore"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cellscore").desc(), F.col("_cell").asc())
    q = (
        q.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", F.col("_cell").cast("long").alias("_cell"))
    )
    scored = (
        q.join(c, "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine_sim"),
        )
        .distinct()
    )
    return _topk(scored, k)
