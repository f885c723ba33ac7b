"""Operator-library unit tests (SURVEY.md §2 families) on small local frames."""

import pytest
from pyspark.sql import Row, functions as F

from standardized_omop_data_etl_spark.functions import scalars as FX
from standardized_omop_data_etl_spark.functions import text_analysis as TX
from standardized_omop_data_etl_spark.operators import dedup as DD
from standardized_omop_data_etl_spark.operators import relational as R
from standardized_omop_data_etl_spark.operators import similarity as SIM
from standardized_omop_data_etl_spark.operators.lww import lww_latest, priority_dedup


def rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------- LWW / A4


def test_lww_latest_basic(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k int, lsn int, v string"
    )
    out = {r["k"]: r["v"] for r in lww_latest(df, "k", "lsn").collect()}
    assert out == {1: "b", 2: "c"}


def test_lww_duplicate_lsn_deterministic(spark):
    # two different payloads with the same lsn: winner must be stable
    df = spark.createDataFrame([(1, 10, "a"), (1, 10, "b")], "k int, lsn int, v string")
    winners = {lww_latest(df, "k", "lsn").collect()[0]["v"] for _ in range(3)}
    assert len(winners) == 1


def test_priority_dedup_first_wins(spark):
    df = spark.createDataFrame(
        [(1, 2, "low"), (1, 1, "high"), (2, 3, "only")], "k int, prio int, v string"
    )
    out = {r["k"]: r["v"] for r in priority_dedup(df, "k", "prio").collect()}
    assert out == {1: "high", 2: "only"}


def test_lww_salted_count_with_adversarial_payload_column(spark):
    # a payload column literally named "_w" must not corrupt the count metric
    df = spark.createDataFrame(
        [(1, 10, 999), (1, 20, 999), (1, 30, 999), (2, 5, 999)],
        "k int, lsn int, _w int",
    )
    out = {r["k"]: (r["lsn"], r["n"]) for r in
           lww_latest(df, "k", "lsn", salt_partitions=4, count_col="n").collect()}
    assert out == {1: (30, 3), 2: (5, 1)}


# ---------------------------------------------------------------- joins


def test_sized_broadcast_fallback_matches_broadcast(spark, monkeypatch):
    # past the threshold the shuffled path must produce identical output
    df = spark.createDataFrame([(i, "v%d" % i) for i in range(20)], "k int, v string")
    keys = spark.createDataFrame([(i,) for i in range(0, 20, 2)], "k int")
    want_anti = {r["k"] for r in R.anti_join_delete(df, keys, ["k"], broadcast=True).collect()}
    want_semi = {r["k"] for r in R.semi_join_exists(df, keys, ["k"], broadcast=True).collect()}
    monkeypatch.setattr(R, "BROADCAST_KEYS_MAX", 3)  # force the shuffled path
    got_anti = {r["k"] for r in R.anti_join_delete(df, keys, ["k"]).collect()}
    got_semi = {r["k"] for r in R.semi_join_exists(df, keys, ["k"]).collect()}
    assert got_anti == want_anti and got_semi == want_semi


def test_anti_and_semi_join(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    keys = spark.createDataFrame([(2,)], "k int")
    assert {r["k"] for r in R.anti_join_delete(df, keys, ["k"]).collect()} == {1, 3}
    assert {r["k"] for r in R.semi_join_exists(df, keys, ["k"]).collect()} == {2}


def test_normalized_join_fanout(spark):
    left = spark.createDataFrame([("  Aspirin ",), ("unknown",)], "med string")
    right = spark.createDataFrame(
        [("aspirin", 1), ("ASPIRIN", 2)], "name string, cid int"
    )
    out = R.normalized_join(left, right, "med", "name")
    got = [(r["med"].strip(), r["cid"]) for r in out.collect()]
    # one-to-many fan-out: both mapping rows match
    assert sorted(got) == [("Aspirin", 1), ("Aspirin", 2), ("unknown", None)]


def test_fuzzy_ratio_matches_expectations(spark):
    df = spark.createDataFrame([("temporal", "Temporal"), ("axilla", "temporal")], "a string, b string")
    sims = [r["s"] for r in df.select(R.fuzzy_ratio(F.col("a"), F.col("b")).alias("s")).collect()]
    assert sims[0] == 1.0
    assert sims[1] < 0.5


# ---------------------------------------------------------------- reshape


def test_unpivot_drops_nulls(spark):
    df = spark.createDataFrame([(1, 10, None), (2, None, 30)], "id int, a int, b int")
    out = rows(R.unpivot_items(df, ["id"], ["a", "b"], "item", "val"))
    assert sorted(out) == [(1, "a", 10), (2, "b", 30)]


def test_fanout_concepts(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = rows(R.fanout_concepts(df, [7, 8]))
    assert sorted(out) == [(1, 7), (1, 8)]


def test_surrogate_ids_dense_and_deterministic(spark):
    df = spark.createDataFrame([(c,) for c in "dcabe"], "k string").repartition(4)
    out = {r["k"]: r["row_id"] for r in R.surrogate_ids(df, ["k"]).collect()}
    assert out == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}


def test_minmax_periods_union(spark):
    t1 = spark.createDataFrame([(1, "2020-01-05"), (1, "2020-03-01")], "pid int, d1 string")
    t2 = spark.createDataFrame([(1, "2019-12-25"), (2, "2021-06-01")], "pid int, d2 string")
    out = {
        r["pid"]: (str(r["period_start"])[:10], str(r["period_end"])[:10])
        for r in R.minmax_periods([t1, t2], "pid", [["d1"], ["d2"]]).collect()
    }
    assert out[1] == ("2019-12-25", "2020-03-01")
    assert out[2] == ("2021-06-01", "2021-06-01")


# ---------------------------------------------------------------- scalars


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [("12abc34.5", "31/12/2020", 100, 98.6, "CASE-NEU123456789")],
        "dirty string, dmy string, days int, temp_f double, pid string",
    )
    r = df.select(
        FX.sanitize_numeric(F.col("dirty")).alias("num"),
        FX.reformat_date_dmy(F.col("dmy")).alias("iso"),
        F.date_format(FX.relative_day_to_date(F.col("days")), "yyyy-MM-dd").alias("d"),
        FX.fahrenheit_to_celsius(F.col("temp_f")).alias("c"),
        FX.transform_id_9digit(F.col("pid")).alias("id9"),
        FX.year_string_to_date(F.lit("1975")).cast("string").alias("y"),
        FX.year_string_to_date(F.lit("junk")).cast("string").alias("yjunk"),
        FX.composite_key(F.lit("p1"), F.lit(None)).alias("ck"),
        FX.default_concept(F.lit("")).alias("dc"),
    ).collect()[0]
    assert r["num"] == 1234.5
    assert r["iso"] == "2020-12-31"
    assert r["d"] == "2016-04-10"
    assert r["c"] == 37.0
    assert r["id9"] == "113456789" and len(r["id9"]) == 9
    assert r["y"] == "1975-01-01"
    assert r["yjunk"] == "1900-01-01"
    assert r["ck"] == "p1_0"
    assert r["dc"] == 0


def test_infer_temperature(spark):
    df = spark.createDataFrame(
        [(98.6, None), (37.0, None), (98.6, 1), (37.0, 2), (200.0, None)],
        "v double, u int",
    )
    out = [r["c"] for r in df.select(FX.infer_temperature_celsius(F.col("v"), F.col("u")).alias("c")).collect()]
    assert out == [37.0, 37.0, 37.0, 37.0, None]


# ---------------------------------------------------------------- text / dedup


def test_text_analysis(spark):
    df = spark.createDataFrame(
        [("The cat and the dog sat in the yard. It is fine.",),
         ("der hund und die katze ist nicht ein zu",),
         ("",)],
        "text string",
    )
    out = df.select(
        TX.detect_lang(F.col("text")).alias("lang"),
        TX.token_count_ws(F.col("text")).alias("n"),
        TX.quality_score(F.col("text")).alias("q"),
        TX.fingerprint64(F.col("text")).alias("fp"),
    ).collect()
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "de"
    assert out[2]["lang"] == "und"
    assert out[0]["n"] == 12
    assert 0.0 <= out[0]["q"] <= 1.0


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "z z z q q")], "id long, text string"
    )
    pairs = rows(DD.ngram_jaccard_pairs(df, "text", "id", k=3, threshold=0.3))
    assert len(pairs) == 1
    a, b, j = pairs[0]
    assert (a, b) == (1, 2)
    # shingles: {abc,bcd,cde} vs {abc,bcd,cdx} → 2/4
    assert abs(j - 0.5) < 1e-9


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "other")], "id long, text string"
    )
    groups = rows(DD.exact_duplicates(df, "text", "id"))
    assert len(groups) == 1 and groups[0][1] == 2  # whitespace-normalized dup
    kept = {r["id"] for r in DD.dedup_exact(df, "text", "id").collect()}
    assert kept == {1, 3}


def test_ngram_df_cap_matches_uncapped_on_normal_data(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    capped = rows(DD.ngram_jaccard_pairs(docs, "text", "doc_id", k=3, threshold=0.5, df_max=1000))
    exact = rows(DD.ngram_jaccard_pairs(docs, "text", "doc_id", k=3, threshold=0.5, df_max=None))
    assert sorted(capped) == sorted(exact)


def test_ngram_df_cap_drops_stop_shingle_pairs(spark):
    # docs 1..40 share ONLY the stop-shingle; docs 100/101 are true near-dups
    rows_in = [(i, "common stop gram x%d y%d z%d" % (i, i, i)) for i in range(1, 41)]
    rows_in += [(100, "alpha beta gamma delta epsilon"), (101, "alpha beta gamma delta zeta")]
    df = spark.createDataFrame(rows_in, "id long, text string")
    got = rows(DD.ngram_jaccard_pairs(df, "text", "id", k=3, threshold=0.2, df_max=10))
    ids = {(a, b) for a, b, _ in got}
    assert (100, 101) in ids
    # every pair among 1..40 shares only 'common stop gram' (df=40 > 10) → dropped
    assert all(a >= 100 for a, b in ids)


def test_bucket_cap_drops_hot_bucket(spark):
    hot = [(i, "the exact same boilerplate text repeated verbatim") for i in range(200)]
    pair = [(1000, "alpha beta gamma delta epsilon zeta eta theta"),
            (1001, "alpha beta gamma delta epsilon zeta eta iota")]
    df = spark.createDataFrame(hot + pair, "id long, text string")
    got = rows(DD.minhash_lsh_candidates(df, "text", "id", num_hashes=16, bands=8, max_bucket=50))
    ids = {(a, b) for a, b in got}
    assert (1000, 1001) in ids
    assert all(a >= 1000 for a, b in ids), "hot bucket must be dropped, not exploded"
    # uncapped finds the 200*199/2 hot pairs
    un = DD.minhash_lsh_candidates(df, "text", "id", num_hashes=16, bands=8, max_bucket=None)
    assert un.count() == 200 * 199 // 2 + 1


def test_sized_side_is_lazy_and_never_sort_merge(spark):
    """Round-3: the default join-side strategy must not run an eager sizing
    count() (a hidden extra scan of the key side per call) and must never
    plan a sort-merge join for an existence probe; AQE upgrades the shuffle
    join to broadcast at runtime from the stats the shuffle already has."""
    sc = spark.sparkContext
    df = spark.range(10_000).selectExpr("id as k", "id * 2 as v")
    keys = spark.range(0, 10_000, 7).selectExpr("id as k")
    sc.setJobGroup("sized-side-lazy", "construction must schedule no jobs")
    anti = R.anti_join_delete(df, keys, on=["k"])
    semi = R.semi_join_exists(df, keys, on=["k"])
    plans = [anti._jdf.queryExecution().executedPlan().toString(),
             semi._jdf.queryExecution().executedPlan().toString()]
    jobs = sc.statusTracker().getJobIdsForGroup("sized-side-lazy")
    assert jobs == [], f"construction ran eager jobs: {jobs}"
    for p in plans:
        assert "SortMergeJoin" not in p
    assert anti.count() == 10_000 - len(range(0, 10_000, 7))
    assert semi.count() == len(range(0, 10_000, 7))
    # explicit declarations still honored
    bplan = R.semi_join_exists(df, keys, on=["k"], broadcast=True)
    assert "BroadcastHashJoin" in bplan._jdf.queryExecution().executedPlan().toString()


def test_hot_bucket_drop_stats(spark):
    """Round-3: a capped run must be DISTINGUISHABLE from a complete one.
    A 2000-member hot bucket (far past cap) stays bounded — no task ever
    materializes the member list — AND the drop accounting reports it."""
    hot = [(i, "the exact same boilerplate text repeated verbatim") for i in range(2000)]
    pair = [(10_000, "alpha beta gamma delta epsilon zeta eta theta"),
            (10_001, "alpha beta gamma delta epsilon zeta eta iota")]
    df = spark.createDataFrame(hot + pair, "id long, text string")

    pairs, stats = DD.minhash_lsh_with_stats(
        df, "text", "id", num_hashes=16, bands=8, max_bucket=1000
    )
    got = {(a, b) for a, b in rows(pairs)}
    st = stats.collect()[0]
    assert (10_000, 10_001) in got and all(a >= 10_000 for a, b in got)
    # identical docs share every band → 8 oversized buckets of 2000 members
    assert st["dropped_buckets"] == 8
    assert st["dropped_members"] == 8 * 2000

    spairs, sstats = DD.simhash_with_stats(
        df, "text", "id", max_distance=3, max_bucket=1000
    )
    sst = sstats.collect()[0]
    assert sst["dropped_buckets"] == 4 and sst["dropped_members"] == 4 * 2000
    assert all(a >= 10_000 for a, b, _ in [tuple(r) for r in spairs.collect()])

    # a clean corpus certifies completeness: zero drops reported
    _, clean = DD.minhash_lsh_with_stats(
        spark.createDataFrame(pair, "id long, text string"), "text", "id",
        num_hashes=16, bands=8,
    )
    c = clean.collect()[0]
    assert c["dropped_buckets"] == 0 and c["dropped_members"] == 0


def test_simhash_adaptive_blocks(spark):
    """Wide max_distance no longer zeroes recall at corpus scale: the block
    count narrows as n_docs grows, and small corpora keep the full
    pigeonhole split (13 blocks at max_distance=12)."""
    assert DD.simhash_adaptive_blocks(500, 12) == 13
    assert DD.simhash_adaptive_blocks(5_000, 12) < 13
    big = DD.simhash_adaptive_blocks(100_000_000, 12)
    assert 1 <= big < DD.simhash_adaptive_blocks(5_000, 12)
    # monotone non-increasing in corpus size
    sizes = [10**i for i in range(2, 10)]
    vals = [DD.simhash_adaptive_blocks(n, 12) for n in sizes]
    assert vals == sorted(vals, reverse=True)

    # behaviorally: with n_docs passed, a 40k-ish uniform corpus still finds
    # a planted near-dup pair (fixed 13 blocks with a 1000-cap at this scale
    # would need every ~5-bit bucket under the cap — guaranteed violated past
    # 32k docs). Use a smaller corpus + small cap to model the same regime.
    import random

    rng = random.Random(7)
    words = ["w%d" % i for i in range(500)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(30))) for i in range(3000)
    ]
    base30 = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two "
        "three four five six"
    )
    near = [  # one appended word over 30 → hamming 4: a true near-dup
        (20_000, base30 + " seven"),
        (20_001, base30 + " seven extra"),
    ]
    df = spark.createDataFrame(docs + near, "id long, text string")
    # fixed 13 blocks, cap 120: ~5-bit buckets hold 3000/32 ≈ 94 docs on
    # average — skewed ones blow the cap and recall quietly craters
    fixed, fstats = DD.simhash_with_stats(
        df, "text", "id", max_distance=12, max_bucket=120
    )
    adaptive, astats = DD.simhash_with_stats(
        df, "text", "id", max_distance=12, max_bucket=120, n_docs=3002
    )
    a_pairs = {(a, b) for a, b, _ in [tuple(r) for r in adaptive.collect()]}
    assert (20_000, 20_001) in a_pairs
    assert astats.collect()[0]["dropped_members"] == 0
    assert fstats.collect()[0]["dropped_members"] > 0  # fixed split was capped


def test_jaccard_df_cutoff_stats(spark):
    df = spark.createDataFrame(
        [(i, "common stop gram filler%d" % i) for i in range(40)]
        + [(100, "rare unique shingle one"), (101, "rare unique shingle two")],
        "id long, text string",
    )
    st = DD.jaccard_df_cutoff_stats(df, "text", "id", k=3, df_max=10).collect()[0]
    # 'common stop gram' appears in 40 docs (> 10); every other 3-gram is rare
    assert st["dropped_shingles"] == 1 and st["dropped_postings"] == 40
    clean = DD.jaccard_df_cutoff_stats(df, "text", "id", k=3, df_max=50).collect()[0]
    assert clean["dropped_shingles"] == 0 and clean["dropped_postings"] == 0


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, base), (2, base + " ok"), (3, "completely different words entirely here")],
        "id long, text string",
    )
    pairs = rows(DD.minhash_lsh_candidates(df, "text", "id", num_hashes=16, bands=8))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_near_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " mu"), (3, "totally unrelated content with other tokens")],
        "id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming_distance"] for r in
             DD.simhash_duplicates(df, "text", "id", max_distance=16).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 16
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_dup_pairs_lsh_matches_brute_on_planted(spark):
    # planted clusters: LSH-bucketed candidates must recover every true pair
    from pyspark.sql import functions as F

    base = spark.range(40)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: ((F.col("id") % 4) * 31 + j * 17).cast("double") % 13.0
        + ((F.col("id") * 53 + j * 29) % 7).cast("double") * 0.01,
    )
    df = base.select(F.col("id").alias("vid"), vec.alias("v"))
    brute = {(r["id_a"], r["id_b"]) for r in
             DD.embedding_dup_pairs(df, "v", "vid", threshold=0.999).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           DD.embedding_dup_pairs(df, "v", "vid", threshold=0.999, dim=16, bits=6, tables=4).collect()}
    assert brute and lsh == brute


# ---------------------------------------------------------------- similarity


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_cosine_topk_self_consistency(spark, emb):
    q = emb.filter(F.col("vec_id") < 2)
    out = SIM.cosine_topk(emb, q, "embedding", "vec_id", k=5)
    pdf = out.toPandas()
    assert set(pdf["query_id"]) == {0, 1}
    assert all(pdf.groupby("query_id")["rank"].max() == 5)
    assert (pdf["cosine_sim"] <= 1.0 + 1e-9).all()
    # ranks strictly ordered by sim desc within query
    for _, g in pdf.groupby("query_id"):
        sims = list(g.sort_values("rank")["cosine_sim"])
        assert sims == sorted(sims, reverse=True)


def test_ivf_topk_recall_vs_brute(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    brute = SIM.cosine_topk(emb, q, "embedding", "vec_id", k=3).toPandas()
    ivf = SIM.ivf_topk(
        emb, q, "embedding", "vec_id", dim=64, k=3, num_centroids=8, nprobe=4
    ).toPandas()
    b = set(zip(brute["query_id"], brute["neighbor_id"]))
    i = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    recall = len(b & i) / len(b)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


# --------------------------------------------------- narrow LWW size guard


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lww_narrow_auto_window_fallback_past_key_threshold(spark):
    """broadcast_winners='auto' must NOT broadcast a winner set larger than
    broadcast_keys_max: past the bound the narrow plan is abandoned for the
    window kernel (single payload exchange — no BroadcastExchange, no
    candidate join at all) with bit-identical output."""
    from standardized_omop_data_etl_spark.operators.lww import (
        lww_latest_narrow,
        unpersist_pinned,
    )

    df = spark.createDataFrame(
        [(f"k{i}", j, f"v{i}-{j}") for i in range(100) for j in range(3)],
        "k string, lsn int, v string",
    )
    out = lww_latest_narrow(df, "k", "lsn", count_col="_n", broadcast_keys_max=10)
    plan = _physical_plan(out)
    assert "BroadcastExchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    got = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in out.collect()}
    exp = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in
           lww_latest(df, "k", "lsn", count_col="_n").collect()}
    assert got == exp
    assert getattr(out, "_sodes_pinned", "missing") is None
    unpersist_pinned(out)  # must not raise; no-op-compatible release hook


def test_lww_narrow_explicit_shuffled_candidate_join(spark):
    """broadcast_winners=False is the explicit A/B path: a shuffled hash
    candidate join (never sort-merge, never broadcast), same winners."""
    from standardized_omop_data_etl_spark.operators.lww import lww_latest_narrow

    df = spark.createDataFrame(
        [(f"k{i}", j, f"v{i}-{j}") for i in range(100) for j in range(3)],
        "k string, lsn int, v string",
    )
    out = lww_latest_narrow(df, "k", "lsn", count_col="_n", broadcast_winners=False)
    plan = _physical_plan(out)
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    got = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in out.collect()}
    exp = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in
           lww_latest(df, "k", "lsn", count_col="_n").collect()}
    assert got == exp


def test_lww_narrow_auto_broadcasts_small_key_sets(spark):
    from standardized_omop_data_etl_spark.operators.lww import (
        lww_latest_narrow,
        unpersist_pinned,
    )

    df = spark.createDataFrame(
        [(f"k{i}", j, "x") for i in range(20) for j in range(2)],
        "k string, lsn int, v string",
    )
    out = lww_latest_narrow(df, "k", "lsn")
    assert "BroadcastExchange" in _physical_plan(out)
    assert out.count() == 20
    unpersist_pinned(out)


def test_lww_narrow_null_order_parity(spark):
    """NULL order values: narrow (F.min/F.max skip NULLs) and window
    (asc_nulls_last / desc) must pick identical winners in BOTH directions,
    including a key whose order values are all NULL. The bloom fetch is in
    the matrix because its candidate prefilter hashes (key, winning order)
    with xxhash64 — which SKIPS null inputs — so an all-NULL-order key's
    winner must still survive the bitmap + eqNullSafe resolution."""
    from standardized_omop_data_etl_spark.operators.lww import (
        lww_latest_narrow,
        unpersist_pinned,
    )

    df = spark.createDataFrame(
        [("a", 5, "a5"), ("a", None, "aN"), ("a", 1, "a1"),
         ("b", None, "bN1"), ("b", None, "bN2"),
         ("c", 7, "c7")],
        "k string, lsn int, v string",
    )
    for desc in (True, False):
        win = {(r["k"], r["lsn"], r["v"])
               for r in lww_latest(df, "k", "lsn", descending=desc).collect()}
        for fetch in (True, "bloom"):
            out = lww_latest_narrow(df, "k", "lsn", descending=desc,
                                    broadcast_winners=fetch)
            nar = {(r["k"], r["lsn"], r["v"]) for r in out.collect()}
            unpersist_pinned(out)
            assert win == nar, f"descending={desc} fetch={fetch}: {win} != {nar}"


def test_lww_narrow_fetch_paths(spark, monkeypatch):
    """The three winner-fetch paths agree bit-exactly with the window
    kernel. auto: a HARD keys_bound under the margin broadcasts with NO
    HLL probe job (one fewer batch scan per epoch). bloom: never builds a
    driver-side winner relation — the bitmap rides in as a one-row
    broadcast (BroadcastNestedLoopJoin) and the exact candidate join is a
    shuffled hash join, no BroadcastHashJoin anywhere. Past the cap both
    abandon the narrow plan for the window kernel."""
    import standardized_omop_data_etl_spark.operators.lww as lww

    df = spark.createDataFrame(
        [(f"k{i}", j, f"v{i}-{j}") for i in range(50) for j in range(2)],
        "k string, lsn int, v string",
    )
    probes = {"n": 0}
    real = lww.F.approx_count_distinct

    def counting(*a, **kw):
        probes["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(lww.F, "approx_count_distinct", counting)
    exp = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in
           lww_latest(df, "k", "lsn", count_col="_n").collect()}

    # auto + hard bound: broadcast fetch, no probe job
    out = lww.lww_latest_narrow(df, "k", "lsn", count_col="_n", keys_bound=100)
    assert probes["n"] == 0, "sub-margin keys_bound must skip the HLL probe"
    assert "BroadcastExchange" in _physical_plan(out)
    got = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in out.collect()}
    assert got == exp

    # bloom fetch: no driver-built winner relation, exact join shuffled
    outb = lww.lww_latest_narrow(df, "k", "lsn", count_col="_n",
                                 broadcast_winners="bloom")
    planb = _physical_plan(outb)
    assert "BroadcastHashJoin" not in planb, "winner set must not be a driver relation"
    assert "BroadcastNestedLoopJoin" in planb  # the one-row bitmap attach
    assert "ShuffledHashJoin" in planb  # the exact candidate join
    gotb = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in outb.collect()}
    lww.unpersist_pinned(outb)
    assert gotb == exp

    # past the cap: abandoned for the window kernel on both paths
    for kw in ({"broadcast_winners": "auto"}, {"broadcast_winners": "bloom"}):
        out2 = lww.lww_latest_narrow(df, "k", "lsn", count_col="_n",
                                     broadcast_keys_max=10, **kw)
        plan2 = _physical_plan(out2)
        assert "ShuffledHashJoin" not in plan2 and "BroadcastNestedLoopJoin" not in plan2
        got2 = {r["k"]: (r["lsn"], r["v"], r["_n"]) for r in out2.collect()}
        assert got2 == exp


def test_bloom_semi_anti_exact(spark):
    """bloom_semi/bloom_anti (operators.bloom) must be EXACT set filters —
    false positives die in the exact join, false negatives are impossible —
    including duplicate base rows, keys absent from the set, and an empty
    set; and the plan must contain no BroadcastHashJoin (the whole point is
    no driver-built relation)."""
    from standardized_omop_data_etl_spark.operators import bloom as B

    base = spark.createDataFrame(
        [(f"k{i % 700}", i) for i in range(3000)], "k string, v int"
    )
    ks = spark.createDataFrame([(f"k{i}",) for i in range(0, 700, 3)], "k string")

    exp_semi = base.join(ks, "k", "left_semi").orderBy("k", "v").collect()
    exp_anti = base.join(ks, "k", "left_anti").orderBy("k", "v").collect()

    got_semi = B.bloom_semi(base, ks, "k", 234, 8)
    got_anti = B.bloom_anti(base, ks, "k", 234, 8)
    for got in (got_semi, got_anti):
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
    assert got_semi.orderBy("k", "v").collect() == exp_semi
    assert got_anti.orderBy("k", "v").collect() == exp_anti

    # empty key set: semi -> nothing, anti -> everything
    empty = spark.createDataFrame([], "k string")
    assert B.bloom_semi(base, empty, "k", 0, 8).count() == 0
    assert B.bloom_anti(base, empty, "k", 0, 8).count() == base.count()
