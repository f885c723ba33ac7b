"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC query on sf0.001. ``queries()`` maps
every implemented operator family from SURVEY.md §2 (plus the training-data
ops) to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL. Column names/aliases match pairwise (the driver sorts
columns by name before value-hashing).

The ``events`` table plays the change-log analogue: ``event_id`` is the LSN,
``user_id`` the key, ``event_type='error'`` the delete op.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from standardized_omop_data_etl_spark.functions import scalars as FX
from standardized_omop_data_etl_spark.functions import text_analysis as TX
from standardized_omop_data_etl_spark.operators import dedup as DD
from standardized_omop_data_etl_spark.operators import relational as R
from standardized_omop_data_etl_spark.operators import similarity as SIM
from standardized_omop_data_etl_spark.operators.lww import lww_latest, priority_dedup

SF_SMALL = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _parquet_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — driver-side, O(files),
    zero Spark jobs. This is the 'manifest count' that feeds adaptive
    blocking: at corpus scale it comes from the lake manifest / catalog
    stats; a ``df.count()`` here would be an extra full-table job per query
    (round-3 verdict, wrong #2)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


# ---------------------------------------------------------------------------
# Flagship: CDC LWW final-state (A4/W1 kernel — the engine's MERGE resolution
# expressed as one query: latest event per key wins; latest=delete drops).
# ---------------------------------------------------------------------------


def q_cdc_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    latest = lww_latest(ev, "user_id", "event_id")
    return (
        latest.filter(F.col("event_type") != "error")
        .select(
            "user_id",
            F.col("event_id").alias("last_lsn"),
            "event_type",
            "value",
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_cdc_lww_state(spark, SF_SMALL)


# ---------------------------------------------------------------------------
# queries() / oracle_sql()
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    PRIORITY = {"signup": 1, "purchase": 2, "click": 3, "view": 4, "error": 5}

    def q_priority_dedup(spark, sf):
        ev = _t(spark, sf, "events").withColumn(
            "priority", FX.decode_map(F.col("event_type"), PRIORITY)
        )
        out = priority_dedup(ev, "user_id", "priority", tiebreak_cols=["event_id"])
        return out.select("user_id", "event_id", "event_type", "priority")

    def q_minmax_periods(spark, sf):
        ev = _t(spark, sf, "events")
        out = R.minmax_periods([ev], "user_id", [["ts"]])
        return out.select(
            "user_id",
            F.date_format("period_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("period_start"),
            F.date_format("period_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("period_end"),
        )

    def q_anti_join_delete(spark, sf):
        ev = _t(spark, sf, "events")
        dead = ev.filter(F.col("event_type") == "error").select(
            "user_id", F.to_date("ts").alias("day")
        )
        live = R.anti_join_delete(
            ev.withColumn("day", F.to_date("ts")), dead, on=["user_id", "day"]
        )
        return live.select("event_id", "user_id", "event_type")

    def q_semi_join_exists(spark, sf):
        ev = _t(spark, sf, "events")
        signups = ev.filter(F.col("event_type") == "signup").select("user_id")
        return R.semi_join_exists(
            ev.filter(F.col("event_type") == "purchase"), signups, on=["user_id"]
        ).select("event_id", "user_id", "value")

    def q_dedup_exact_keys(spark, sf):
        return _t(spark, sf, "events").select("user_id", "event_type").distinct()

    def q_surrogate_ids(spark, sf):
        c = _t(spark, sf, "customer")
        return R.surrogate_ids(c, ["c_custkey"], "row_id").select(
            "c_custkey", "c_name", "row_id"
        )

    def q_union_multi_source(spark, sf):
        ev = _t(spark, sf, "events")
        a = ev.filter(F.col("event_type") == "signup").select("user_id", "event_id", "value")
        b = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id")
        return R.union_all([a, b]).select("user_id", "event_id", "value")

    def q_unpivot_lineitem(spark, sf):
        li = _t(spark, sf, "lineitem")
        return R.unpivot_items(
            li,
            ids=["l_orderkey", "l_linenumber"],
            items=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            var_col="measure",
            val_col="val",
        )

    def q_fanout_concepts(spark, sf):
        p = _t(spark, sf, "part")
        return R.fanout_concepts(p.select("p_partkey"), [1001, 1002, 1003]).select(
            "p_partkey", F.col("concept_id").cast("int").alias("concept_id")
        )

    def q_normalized_join_fanout(spark, sf):
        docs = _t(spark, sf, "documents")
        mapping = spark.createDataFrame(
            [("SRC0", 100), (" src0 ", 101), ("Src1", 200), ("src2", 300)],
            "src_name string, concept_id int",
        )
        joined = R.normalized_join(docs, mapping, "source", "src_name", how="left")
        return joined.select(
            "doc_id", "source", F.coalesce("concept_id", F.lit(0)).alias("concept_id")
        )

    def q_regex_match_filter(spark, sf):
        docs = _t(spark, sf, "documents")
        return (
            docs.filter(F.col("text").rlike(r"(?i)\bthe\b"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    def q_fuzzy_match(spark, sf):
        docs = _t(spark, sf, "documents")
        ratio = R.fuzzy_ratio(F.col("source"), F.lit("src1"))
        return docs.select(
            "doc_id", "source", F.round(ratio, 4).alias("sim")
        ).filter(F.col("sim") > 0.6)

    def q_sanitize_numeric(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.select("event_id", FX.sanitize_numeric(F.col("props")).alias("props_num"))

    def q_id_transform(spark, sf):
        c = _t(spark, sf, "customer")
        return c.select(
            "c_custkey", FX.transform_id_9digit(F.col("c_custkey")).alias("id9")
        )

    def q_provenance_concat(spark, sf):
        ev = _t(spark, sf, "events")
        prov = FX.provenance(
            "events", F.col("event_type"), F.col("event_id").cast("string")
        )
        return ev.select("event_id", prov.alias("prov"))

    def q_date_reformat(spark, sf):
        o = _t(spark, sf, "orders")
        dmy = F.date_format("o_orderdate", "dd/MM/yyyy")
        return o.select(
            "o_orderkey",
            dmy.alias("dmy"),
            FX.reformat_date_dmy(dmy).alias("iso"),
        )

    def q_relative_day_date(spark, sf):
        ev = _t(spark, sf, "events")
        # explicit floor: Spark's double→int cast truncates while DuckDB's
        # rounds, so both sides floor first
        days = F.floor("value").cast("int")
        return ev.select(
            "event_id",
            F.date_format(FX.relative_day_to_date(days), "yyyy-MM-dd").alias("obs_date"),
            FX.relative_day_to_birth_year(days).alias("birth_year"),
        )

    def q_unit_conversion(spark, sf):
        li = _t(spark, sf, "lineitem")
        return li.select(
            "l_orderkey",
            "l_linenumber",
            FX.lb_to_kg(F.col("l_quantity")).alias("qty_kg"),
            FX.inch_to_cm(F.col("l_quantity")).alias("qty_cm"),
            FX.fahrenheit_to_celsius(F.col("l_quantity") + 60.0).alias("qty_c"),
        )

    def q_when_chain_decode(spark, sf):
        o = _t(spark, sf, "orders")
        code = FX.decode_map(
            F.col("o_orderpriority"),
            {"1-URGENT": 1, "2-HIGH": 2, "3-MEDIUM": 3, "4-NOT SPECIFIED": 4, "5-LOW": 5},
            default=0,
        )
        return o.select("o_orderkey", code.cast("int").alias("priority_code"))

    def q_groupby_count(spark, sf):
        return (
            _t(spark, sf, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_redundancy_report(spark, sf):
        ev = _t(spark, sf, "events")
        return R.redundancy_report(ev, ["user_id"], "event_type", min_tables=4).select(
            "user_id", F.col("n_tables").cast("long").alias("n_tables")
        )

    def q_tpch_q1(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    def q_tpch_q3(spark, sf):
        c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .groupBy("o_orderkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
            .limit(10)
        )

    def q_tpch_q5(spark, sf):
        r = _t(spark, sf, "region")
        n = _t(spark, sf, "nation")
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        s = _t(spark, sf, "supplier")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .filter(s["s_nationkey"] == c["c_nationkey"])
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
        )

    def q_doc_fingerprint(spark, sf):
        docs = _t(spark, sf, "documents")
        norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
        return docs.select("doc_id", F.md5(norm).alias("fp"))

    def q_exact_dup_groups(spark, sf):
        docs = _t(spark, sf, "documents")
        norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
        return (
            docs.select(F.md5(norm).alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        )

    def q_token_count(spark, sf):
        docs = _t(spark, sf, "documents")
        return docs.select(
            "doc_id",
            TX.token_count_ws(F.col("text")).cast("long").alias("n_tokens_ws"),
        )

    def q_quality_score(spark, sf):
        docs = _t(spark, sf, "documents")
        # scale path: tokenize once into a materialized words column, score
        # from the profile struct's cheap field references
        return TX.with_text_profile(docs, "text").select(
            "doc_id", TX.quality_from_profile(F.col("_p")).alias("quality")
        )

    def q_lang_detect(spark, sf):
        docs = _t(spark, sf, "documents")
        return TX.with_text_profile(docs, "text").select(
            "doc_id", TX.detect_lang_from_profile(F.col("_p")).alias("lang_pred")
        )

    def q_pii_redact(spark, sf):
        # PII shape-redaction (functions/text_analysis.py:redact_pii) + the
        # pii_counts audit: synthetic PII (email/phone/IP/SSN shapes) is
        # injected deterministically into every 3rd doc, then redacted by
        # the JVM regexp_replace chain; counts run on the pre-redaction
        # text. Patterns live in the Java∩RE2 dialect so the DuckDB oracle
        # applies the identical chain.
        docs = _t(spark, sf, "documents")
        pii_txt = F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567, host 10.0.0."),
            F.pmod("doc_id", F.lit(255)).cast("string"),
            F.lit(" ssn 123-45-6789"),
        )
        txt = F.when(F.pmod("doc_id", F.lit(3)) == 0, pii_txt).otherwise(F.col("text"))
        counts = TX.pii_counts(txt)
        return docs.select(
            "doc_id",
            TX.redact_pii(txt).alias("clean"),
            counts["email"].cast("long").alias("n_email"),
            counts["ip"].cast("long").alias("n_ip"),
            counts["ssn"].cast("long").alias("n_ssn"),
            counts["phone"].cast("long").alias("n_phone"),
        )

    def q_embedding_topk(spark, sf):
        emb = _t(spark, sf, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 5)
        return SIM.cosine_topk(emb, queries_df, "embedding", "vec_id", k=3).select(
            "query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank"
        )

    def q_ngram_jaccard(spark, sf):  # word-3-gram near-dup pairs (exact)
        docs = _t(spark, sf, "documents")
        return DD.ngram_jaccard_pairs(docs, "text", "doc_id", k=3, threshold=0.2)

    def q_benchmark_contamination(spark, sf):
        # decontamination sweep (operators/dedup.py:benchmark_contamination):
        # probes = every 25th document standing in for a benchmark set;
        # corpus docs sharing >=3 distinct word-3-grams with a probe are
        # flagged. Probe shingles broadcast; corpus streams one explode.
        docs = _t(spark, sf, "documents")
        probes = docs.filter(F.pmod("doc_id", F.lit(25)) == 0)
        return DD.benchmark_contamination(
            docs, probes, "text", "doc_id", k=3, min_shared=3
        )

    def q_minhash_lsh(spark, sf):
        # banded-LSH candidates VERIFIED by exact jaccard: the oracle is the
        # exact >=0.8 pair set, so the hash check asserts LSH recall == 1 on
        # this data (any missed true pair mismatches the oracle).
        docs = _t(spark, sf, "documents")
        # (16 hashes, 8 bands of 2): p(miss | j>=0.8) = (1-0.64)^8 ~ 3e-4 per
        # pair; measured recall 1.0 at sf0.01 AND sf0.1 (identical verified
        # pair set as (32,16)) at half the signature cost.
        cand = DD.minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=16, bands=8)
        return DD.ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.8, candidates=cand
        )

    def q_simhash(spark, sf):
        # simhash block-collision candidates VERIFIED by exact jaccard —
        # same oracle contract as minhash_lsh (candidate recall == 1).
        # max_distance=12: measured true->=0.8-pair hamming max is 10 at
        # sf0.01. n_docs makes the block count ADAPTIVE (dedup.
        # simhash_adaptive_blocks): at sf-test scale it returns the full
        # 13-block pigeonhole split; at corpus scale it widens blocks so the
        # skew cap stops silently zeroing recall (round-2 hazard #2).
        # n_docs comes from parquet footers (no count job).
        docs = _t(spark, sf, "documents")
        cand = DD.simhash_duplicates(
            docs, "text", "doc_id", max_distance=12, n_docs=_parquet_rows(sf, "documents")
        )
        return DD.ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.8, candidates=cand.select("id_a", "id_b")
        )

    def q_lsh_drop_stats(spark, sf):
        # "no silent caps": candidate generation now ACCOUNTS for what the
        # skew cap removes. The oracle pins both families to zero drops at
        # this sf — if any bucket exceeded the cap, dropped_members would be
        # non-zero and the hash check would fail (the non-zero detection path
        # is exercised by tests/test_operators.py::test_hot_bucket_drop_stats).
        docs = _t(spark, sf, "documents")
        n = _parquet_rows(sf, "documents")
        _, mh = DD.minhash_lsh_with_stats(docs, "text", "doc_id", num_hashes=16, bands=8)
        _, sh = DD.simhash_with_stats(docs, "text", "doc_id", max_distance=12, n_docs=n)
        return (
            mh.withColumn("family", F.lit("minhash"))
            .unionByName(sh.withColumn("family", F.lit("simhash")))
            .select("family", "dropped_buckets", "dropped_members", "max_bucket")
        )

    def q_jaccard_df_stats(spark, sf):
        # df-cutoff accounting for the inverted-index path: with a cutoff low
        # enough to bite at this sf, the dropped-shingle/posting counts must
        # equal DuckDB's exact document-frequency tally.
        docs = _t(spark, sf, "documents")
        return DD.jaccard_df_cutoff_stats(docs, "text", "doc_id", k=3, df_max=5)

    def _planted_corpus(spark, sf):
        """ANN fixture with planted cluster structure, derived from the
        embeddings table by SQL-expressible arithmetic (anchors = first 8
        vectors, 32 replicas each + deterministic per-dim noise). The raw
        embeddings are structureless random vectors — no sub-exhaustive ANN
        can deterministically match brute force on them; on this corpus the
        true neighbors are in-cluster and ANN must recover them exactly."""
        emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 8)
        reps = spark.range(32).select(F.col("id").alias("rep"))
        vec = F.zip_with(
            F.col("embedding"),
            F.sequence(F.lit(0), F.lit(63)),
            lambda e, j: e.cast("double")
            + ((F.col("vec_id") * 53 + F.col("rep") * 29 + j * 17) % 7) * 0.01,
        )
        return emb.crossJoin(reps).select(
            (F.col("vec_id") * 32 + F.col("rep")).alias("id"), vec.alias("vec")
        )

    def q_lsh_topk(spark, sf):  # hyperplane-LSH ANN vs brute-force oracle
        c = _planted_corpus(spark, sf)
        queries_df = c.filter(F.col("id").isin(0, 32, 64))
        out = SIM.lsh_topk(c, queries_df, "vec", "id", dim=64, k=3, bits=8, tables=2)
        return out.select(
            "query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank"
        )

    def q_ivf_topk(spark, sf):  # IVF-cell ANN vs brute-force oracle
        c = _planted_corpus(spark, sf)
        queries_df = c.filter(F.col("id").isin(0, 32, 64))
        out = SIM.ivf_topk(c, queries_df, "vec", "id", dim=64, k=3, num_centroids=8, nprobe=3)
        return out.select(
            "query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank"
        )

    def q_year_fallback(spark, sf):
        ev = _t(spark, sf, "events")
        # junk every 5th row; otherwise years spanning 1800-2099 so both the
        # parse fallback and the range fallback fire (F3 semantics)
        yr = F.when(F.pmod("event_id", F.lit(5)) == 0, F.lit("junk")).otherwise(
            (F.pmod("event_id", F.lit(300)) + 1800).cast("string")
        )
        return ev.select(
            "event_id",
            FX.year_string_to_date(yr).cast("string").alias("year_date"),
        )

    def q_temp_inference(spark, sf):
        ev = _t(spark, sf, "events")
        # value plays the temperature; unit cycles NULL/1/2 by event_id
        unit = F.when(F.pmod("event_id", F.lit(3)) == 1, 1).when(
            F.pmod("event_id", F.lit(3)) == 2, 2
        )
        return ev.select(
            "event_id",
            FX.infer_temperature_celsius(F.col("value"), unit).alias("temp_c"),
        )

    def q_composite_key(spark, sf):
        ev = _t(spark, sf, "events")
        visit = F.when(F.col("event_type") != "error", F.to_date("ts"))
        return ev.select(
            "event_id", FX.composite_key(F.col("user_id"), visit).alias("ck")
        )

    def q_pack_years(spark, sf):
        li = _t(spark, sf, "lineitem")
        return li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(FX.pack_years(F.col("l_quantity"), F.col("l_discount")), 4).alias("pack_years"),
        )

    def q_frame_sample(spark, sf):  # multimodal frame fan-out plumbing
        from standardized_omop_data_etl_spark.operators.multimodal import (
            frame_sample,
            synthetic_media,
        )

        media = synthetic_media(spark, 48, seed=7)
        return frame_sample(media, every_ms=500).select(
            "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
        )

    def q_redundancy_inner(spark, sf):
        # J4 — keys present in both the current source and the already-merged
        # output (reference combine_subtables.py:105-107)
        ev = _t(spark, sf, "events")
        cur = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.to_date("ts").cast("string").alias("day")
        )
        existing = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.to_date("ts").cast("string").alias("day")
        )
        return R.redundancy_inner(cur, existing, ["user_id", "day"])

    def q_date_column_discovery(spark, sf):
        # F5 — date-column discovery by name over real table schemas
        # (reference create_observation_periods.py:9-15)
        found = []
        for tname in ("orders", "lineitem", "events"):
            sch = _t(spark, sf, tname).schema
            found += [(tname, c) for c in FX.date_columns(sch)]
        return spark.createDataFrame(found, "table_name string, column_name string")

    def q_placeholder_date_validity(spark, sf):
        # F6 — placeholder-date validity (reference
        # create_observation_periods.py:18-35); every 7th key carries the
        # 1900-01-01 placeholder
        o = _t(spark, sf, "orders")
        d = F.when(
            F.pmod("o_orderkey", F.lit(7)) == 0, F.to_date(F.lit("1900-01-01"))
        ).otherwise(F.to_date("o_orderdate"))
        return o.select(
            "o_orderkey", d.cast("string").alias("d"), FX.is_real_date(d).alias("is_real")
        )

    def q_group_branch(spark, sf):
        # F16 — per-group conditional branch with per-branch constants incl.
        # the -42368 sentinel relative day (reference
        # aalshxfx--condition_occurrence.py:70-168,74-78): group 0 skipped,
        # group 1 onset from the event value, group 2 onset = placeholder date
        from standardized_omop_data_etl_spark.functions import conventions as CONV

        ev = _t(spark, sf, "events")
        grp = F.pmod("user_id", F.lit(3))
        onset_days = F.when(grp == 1, F.floor("value").cast("int")).otherwise(
            F.lit(CONV.SENTINEL_RELATIVE_DAY)
        )
        concept = F.when(grp == 1, 374623).otherwise(4099804)
        return ev.filter(grp != 0).select(
            "event_id",
            concept.cast("int").alias("concept_id"),
            F.date_format(FX.relative_day_to_date(onset_days), "yyyy-MM-dd").alias("onset_date"),
        )

    def q_gated_fanout(spark, sf):
        # U3 — fan-out gated by sibling flags (reference
        # aalshxfx--observation.py:148-160: limb side emitted only when its
        # flag is set); rows with neither flag emit nothing
        ev = _t(spark, sf, "events")
        sides = F.array(
            F.when(
                F.pmod("event_id", F.lit(2)) == 0,
                F.struct(F.lit("left").alias("side"), F.lit(1001).alias("concept_id")),
            ),
            F.when(
                F.pmod("event_id", F.lit(3)) == 0,
                F.struct(F.lit("right").alias("side"), F.lit(1002).alias("concept_id")),
            ),
        )
        out = ev.select(
            "event_id",
            F.explode(F.filter(sides, lambda s: s.isNotNull())).alias("s"),
        )
        return out.select("event_id", F.col("s.side").alias("side"), F.col("s.concept_id").alias("concept_id"))

    def q_windowed_counts(spark, sf):
        # §2.9 windowed agg: same definition serves the watermarked stream
        # (tests/test_streaming.py) and this batch form
        from standardized_omop_data_etl_spark.streaming.windowed import (
            windowed_event_counts,
        )

        ev = _t(spark, sf, "events")
        out = windowed_event_counts(
            ev, ts_col="ts", key_col="event_type", window_duration="1 hour"
        )
        return out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
        )

    def q_embedding_dup_pairs(spark, sf):
        # embedding-cosine near-dup: exact brute-force pairs (the oracle-able
        # baseline; LSH-bucketed scale path covered by pytest on planted data)
        emb = _t(spark, sf, "embeddings")
        return DD.embedding_dup_pairs(emb, "embedding", "vec_id", threshold=0.25)

    def q_token_count_bpe(spark, sf):
        docs = _t(spark, sf, "documents")
        return docs.select(
            "doc_id", TX.token_count_bpe(F.col("text")).cast("long").alias("n_tokens_bpe")
        )

    def q_asof_attribution(spark, sf):
        # backward as-of join (operators/temporal.py:asof_join): every
        # purchase gets its most recent preceding click by the same user —
        # union+window, one exchange, never a range join. Equal-ts ties break
        # on max click event_id, encoded identically in the oracle QUALIFY.
        from standardized_omop_data_etl_spark.operators.temporal import asof_join

        ev = _t(spark, sf, "events")
        buys = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts", "value"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts", "value"
        )
        out = asof_join(
            buys, clicks, by=["user_id"], tie_col="click_id", prefix="click_"
        )
        return out.select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            F.col("click_click_id").alias("click_id"),
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
            F.col("click_value").alias("click_value"),
        )

    def q_sessionize(spark, sf):
        # gap sessionization (operators/temporal.py:sessionize): 30-min
        # inactivity splits a user's events into sessions; session-level
        # rollup on top. lag + running sum share one exchange (plan-asserted
        # in tests/test_temporal.py); groupBy adds the rollup's own.
        from standardized_omop_data_etl_spark.operators.temporal import sessionize

        ev = _t(spark, sf, "events")
        s = sessionize(
            ev, by=["user_id"], ts_col="ts", gap_seconds=1800.0, tie_col="event_id"
        )
        return s.groupBy("user_id", "session_seq").agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )

    def q_chunk_pack(spark, sf):
        # concat-and-chunk packing (operators/packing.py:chunk_pack): one
        # window cumsum per shard + closed-form segment explode — the oracle
        # reproduces the same interval arithmetic in SQL. Shard is doc_id%8
        # here (portable to DuckDB); production uses xxhash64 via num_shards.
        from standardized_omop_data_etl_spark.operators.packing import chunk_pack

        d = (
            _t(spark, sf, "documents")
            .select(
                "doc_id",
                F.col("n_chars").alias("n_tok"),
                F.pmod(F.col("doc_id"), F.lit(8)).cast("int").alias("shard"),
            )
        )
        return chunk_pack(d, capacity=1000, shard_col="shard")

    def q_balanced_shards(spark, sf):
        # serpentine token-balanced sharding (operators/packing.py:
        # balanced_shards): rank by (len desc, doc_id), snake rank -> shard.
        from standardized_omop_data_etl_spark.operators.packing import (
            balanced_shards,
        )

        d = _t(spark, sf, "documents").select(
            "doc_id", F.col("n_chars").alias("n_tok")
        )
        return balanced_shards(d, 8).select(
            "doc_id", "n_tok", F.col("shard").cast("long").alias("shard")
        )

    def q_ffd_pack(spark, sf):
        # first-fit-decreasing no-split packing (operators/packing.py:
        # ffd_pack): per-shard greedy in one Arrow applyInPandas group over
        # metadata columns only. Greedy FFD is not SQL-expressible — no
        # oracle entry; the driver's rows-only check plus the invariant suite
        # in tests/test_packing.py cover it.
        from standardized_omop_data_etl_spark.operators.packing import ffd_pack

        d = _t(spark, sf, "documents").select(
            "doc_id", F.col("n_chars").alias("n_tok")
        )
        return ffd_pack(d, capacity=1000, num_shards=8)

    def q_cdc_lww_narrow(spark, sf):
        # narrow-max LWW kernel (operators/lww.py:lww_latest_narrow): winners
        # computed via map-side (key, max lsn) reduction + candidate join —
        # must match the same SQL LWW oracle as the window kernel bit-exact.
        from standardized_omop_data_etl_spark.operators.lww import lww_latest_narrow

        ev = _t(spark, sf, "events")
        latest = lww_latest_narrow(ev, "user_id", "event_id")
        return latest.filter(F.col("event_type") != "error").select(
            "user_id",
            F.col("event_id").alias("last_lsn"),
            "event_type",
            "value",
        )

    def q_cdc_mor_state(spark, sf):
        # merge-on-read MERGE path end to end: the events stream applied as
        # two out-of-order mor epochs (append-only deltas + read-time LWW),
        # final visible state == plain SQL LWW over the log. Exercises
        # plans/merge.py:_merge_mor_locked + sources/lake.py mor read resolve.
        from standardized_omop_data_etl_spark.plans.merge import merge_into
        from standardized_omop_data_etl_spark.sources.lake import LSN_COL, LakeTable

        ev = _t(spark, sf, "events")
        batch = ev.select(
            F.col("event_id").alias("lsn"),
            F.lit("upsert").alias("op"),
            "user_id",
            "event_type",
            "value",
        )
        payload = batch.drop("lsn", "op").schema
        tbl = LakeTable.create(
            spark, "/tmp/q_cdc_mor_tbl", schema=payload, key_col="user_id",
            num_buckets=8, overwrite=True,
        )
        # odd lsns first, then even: mor correctness may not depend on order
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 1), epoch="odd", mode="mor")
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 0), epoch="even", mode="mor")
        return tbl.read(
            include_hidden=True,
            columns=["user_id", "event_type", "value", LSN_COL],
        ).select(
            "user_id", F.col(LSN_COL).alias("last_lsn"), "event_type", "value"
        )

    def q_cdc_pipeline_state(spark, sf):
        # pipelined replay end to end (plans/replay.py:_replay_pipelined):
        # the events log applied as 4 mor epochs with the one-slot delta
        # lookahead AND an in-loop MaintenancePolicy (compaction + snapshot
        # GC mid-replay), final visible state == plain SQL LWW over the log.
        # The overlap must be invisible to everything but the clock — same
        # oracle as cdc_mor_state.
        from standardized_omop_data_etl_spark.plans.maintenance import MaintenancePolicy
        from standardized_omop_data_etl_spark.plans.replay import replay_log
        from standardized_omop_data_etl_spark.sources.lake import LSN_COL, LakeTable

        ev = _t(spark, sf, "events")
        batch = ev.select(
            F.col("event_id").alias("lsn"),
            F.lit("upsert").alias("op"),
            "user_id",
            "event_type",
            "value",
        )
        payload = batch.drop("lsn", "op").schema
        tbl = LakeTable.create(
            spark, "/tmp/q_cdc_pipeline_tbl", schema=payload, key_col="user_id",
            num_buckets=8, overwrite=True,
        )
        replay_log(
            tbl, batch, num_epochs=4, mode="mor", pipeline=True,
            maintenance=MaintenancePolicy(every_epochs=2, max_files_per_bucket=2),
        )
        return tbl.read(
            include_hidden=True,
            columns=["user_id", "event_type", "value", LSN_COL],
        ).select(
            "user_id", F.col(LSN_COL).alias("last_lsn"), "event_type", "value"
        )

    def q_cdc_sparse_state(spark, sf):
        # sparse (partial-column) CDC updates end to end
        # (plans/merge.py:densify_sparse_batch): ops derived from event_id,
        # 'update' events carry deterministically-masked NULL columns
        # meaning "unchanged"; two ascending sparse epochs must land on the
        # full per-key/per-column fold of the chain (DuckDB arg_max oracle).
        from standardized_omop_data_etl_spark.plans.replay import replay_log
        from standardized_omop_data_etl_spark.sources.lake import (
            DELETED_COL,
            LSN_COL,
            LakeTable,
        )

        ev = _t(spark, sf, "events")
        mod = F.pmod(F.col("event_id"), F.lit(10))
        sparse_mask = mod >= 4
        batch = ev.select(
            F.col("event_id").alias("lsn"),
            F.when(mod <= 1, F.lit("insert"))
            .when(mod == 2, F.lit("delete"))
            .when(mod == 3, F.lit("upsert"))
            .otherwise(F.lit("update")).alias("op"),
            "user_id",
            F.when(sparse_mask & (F.pmod(F.col("event_id"), F.lit(3)) == 0),
                   F.lit(None)).otherwise(F.col("event_type")).alias("event_type"),
            F.when(sparse_mask & (F.pmod(F.col("event_id"), F.lit(2)) == 0),
                   F.lit(None)).otherwise(F.col("value")).alias("value"),
        )
        payload = batch.drop("lsn", "op").schema
        tbl = LakeTable.create(
            spark, "/tmp/q_cdc_sparse_tbl", schema=payload, key_col="user_id",
            num_buckets=8, overwrite=True,
        )
        n = _parquet_rows(sf, "events")
        replay_log(tbl, batch, num_epochs=2, lsn_range=(0, n - 1),
                   mode="auto", sparse_updates=True)
        return tbl.read(
            include_hidden=True,
            columns=["user_id", "event_type", "value", LSN_COL, DELETED_COL],
        ).filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).select(
            "user_id", F.col(LSN_COL).alias("last_lsn"), "event_type", "value"
        )

    def q_cdc_sparse_stats(spark, sf):
        # the densify fold's no-silent-drops companion
        # (plans/merge.py:densify_sparse_stats): epoch-1 sparse events build
        # the resident state, then epoch 2's batch is classified —
        # tombstone/dense-image/fill keys, and fill keys without a resident
        # row (update-on-absent no-ops, the fold's only silent drop).
        from standardized_omop_data_etl_spark.plans.merge import (
            densify_sparse_stats,
            merge_into,
        )
        from standardized_omop_data_etl_spark.sources.lake import LakeTable

        ev = _t(spark, sf, "events")
        mod = F.pmod(F.col("event_id"), F.lit(10))
        sparse_mask = mod >= 4
        batch = ev.select(
            F.col("event_id").alias("lsn"),
            F.when(mod <= 1, F.lit("insert"))
            .when(mod == 2, F.lit("delete"))
            .when(mod == 3, F.lit("upsert"))
            .otherwise(F.lit("update")).alias("op"),
            "user_id",
            F.when(sparse_mask & (F.pmod(F.col("event_id"), F.lit(3)) == 0),
                   F.lit(None)).otherwise(F.col("event_type")).alias("event_type"),
            F.when(sparse_mask & (F.pmod(F.col("event_id"), F.lit(2)) == 0),
                   F.lit(None)).otherwise(F.col("value")).alias("value"),
        )
        n = _parquet_rows(sf, "events")
        half = n // 2
        payload = batch.drop("lsn", "op").schema
        tbl = LakeTable.create(
            spark, "/tmp/q_cdc_sparse_stats_tbl", schema=payload, key_col="user_id",
            num_buckets=8, overwrite=True,
        )
        merge_into(tbl, batch.filter(F.col("lsn") < half), epoch="e1",
                   sparse_updates=True, batch_rows_bound=half)
        # epoch 2 is a THIN slice (~4 events/key) so all six classes are
        # populated — a wide slice gives every key a full image and the
        # fill/dropped columns degenerate to zero.
        hi = half + max(n // 16, 1)
        return densify_sparse_stats(
            tbl,
            batch.filter((F.col("lsn") >= half) & (F.col("lsn") < hi)),
            batch_rows_bound=hi - half,
        )

    def q_cdc_change_feed(spark, sf):
        # incremental change-data-feed (plans/change_feed.py): the events log
        # applied as two MERGE epochs (odd lsns, then even); the feed between
        # the two snapshots must equal a SQL state-diff — keys whose LWW
        # winner changed in epoch 2, classified insert/update/delete, with
        # the after-image payload and the change LSN.
        from standardized_omop_data_etl_spark.plans.change_feed import (
            CHANGE_LSN_COL,
            CHANGE_OP_COL,
            read_changes,
        )
        from standardized_omop_data_etl_spark.plans.merge import merge_into
        from standardized_omop_data_etl_spark.sources.lake import LakeTable

        ev = _t(spark, sf, "events")
        batch = ev.select(
            F.col("event_id").alias("lsn"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("op"),
            "user_id",
            "event_type",
            "value",
        )
        payload = batch.drop("lsn", "op").schema
        tbl = LakeTable.create(
            spark, "/tmp/q_cdc_feed_tbl", schema=payload, key_col="user_id",
            num_buckets=8, overwrite=True,
        )
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 1), epoch="odd")
        v1 = tbl.current_version()
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 0), epoch="even")
        return read_changes(tbl, v1, tbl.current_version()).select(
            F.col(CHANGE_OP_COL).alias("change_op"),
            "user_id",
            "event_type",
            "value",
            F.col(CHANGE_LSN_COL).alias("change_lsn"),
        )

    def q_cdc_mv_refresh(spark, sf):
        # persisted materialized view maintained incrementally (plans/mv.py):
        # subscribe a (event_type -> count, sum(value)) view after epoch 1,
        # apply epoch 2, refresh from the change feed's before-images — the
        # refreshed view must equal a direct SQL aggregate over the final
        # LWW state. Exercises materialize_view/refresh_view + read_changes
        # (include_before) + the exactly-once view MERGE end to end.
        from standardized_omop_data_etl_spark.plans.merge import merge_into
        from standardized_omop_data_etl_spark.plans.mv import (
            COUNT_COL,
            materialize_view,
            refresh_view,
        )
        from standardized_omop_data_etl_spark.sources.lake import LakeTable

        ev = _t(spark, sf, "events")
        batch = ev.select(
            F.col("event_id").alias("lsn"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("op"),
            "user_id",
            "event_type",
            "value",
        )
        payload = batch.drop("lsn", "op").schema
        tbl = LakeTable.create(
            spark, "/tmp/q_cdc_mv_tbl", schema=payload, key_col="user_id",
            num_buckets=8, overwrite=True,
        )
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 1), epoch="odd")
        view, consumer = materialize_view(
            spark, "/tmp/q_cdc_mv_view", tbl, ["event_type"], ["value"], name="q"
        )
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 0), epoch="even")
        refresh_view(view, consumer, ["event_type"], ["value"])
        return view.read().select(
            "event_type",
            F.col(COUNT_COL).alias("n_rows"),
            F.round(F.col("mv_sum_value"), 2).alias("sum_value"),
        )

    def q_cdc_mv_minmax(spark, sf):
        # min/max materialized view maintained by TOUCHED-GROUP recompute
        # (plans/mv.py strategy="group_recompute"): min/max are not
        # delta-maintainable under deletes — epoch 2's 'error' deletes
        # remove rows that may hold a group's current extremum, and the
        # refresh re-aggregates exactly the groups the feed names (broadcast
        # semi-join on the base scan). The refreshed view must equal a
        # direct SQL MIN/MAX over the final LWW state.
        from standardized_omop_data_etl_spark.plans.merge import merge_into
        from standardized_omop_data_etl_spark.plans.mv import (
            COUNT_COL,
            materialize_view,
            refresh_view,
        )
        from standardized_omop_data_etl_spark.sources.lake import LakeTable

        ev = _t(spark, sf, "events")
        batch = ev.select(
            F.col("event_id").alias("lsn"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("op"),
            "user_id",
            "event_type",
            "value",
        )
        payload = batch.drop("lsn", "op").schema
        tbl = LakeTable.create(
            spark, "/tmp/q_cdc_mvmm_tbl", schema=payload, key_col="user_id",
            num_buckets=8, overwrite=True,
        )
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 1), epoch="odd")
        view, consumer = materialize_view(
            spark, "/tmp/q_cdc_mvmm_view", tbl, ["event_type"], ["value"],
            name="qmm", min_cols=["value"], max_cols=["value"],
        )
        merge_into(tbl, batch.filter(F.pmod("lsn", F.lit(2)) == 0), epoch="even")
        refresh_view(view, consumer, ["event_type"], ["value"],
                     strategy="group_recompute",
                     min_cols=["value"], max_cols=["value"])
        return view.read().select(
            "event_type",
            F.col(COUNT_COL).alias("n_rows"),
            F.round(F.col("mv_min_value"), 2).alias("min_value"),
            F.round(F.col("mv_max_value"), 2).alias("max_value"),
        )

    return {
        "cdc_lww_state": q_cdc_lww_state,
        "cdc_lww_narrow": q_cdc_lww_narrow,
        "cdc_mor_state": q_cdc_mor_state,
        "cdc_pipeline_state": q_cdc_pipeline_state,
        "cdc_sparse_state": q_cdc_sparse_state,
        "cdc_sparse_stats": q_cdc_sparse_stats,
        "cdc_change_feed": q_cdc_change_feed,
        "cdc_mv_refresh": q_cdc_mv_refresh,
        "cdc_mv_minmax": q_cdc_mv_minmax,
        "priority_dedup": q_priority_dedup,
        "minmax_periods": q_minmax_periods,
        "anti_join_delete": q_anti_join_delete,
        "semi_join_exists": q_semi_join_exists,
        "dedup_exact_keys": q_dedup_exact_keys,
        "surrogate_ids": q_surrogate_ids,
        "union_multi_source": q_union_multi_source,
        "unpivot_lineitem": q_unpivot_lineitem,
        "fanout_concepts": q_fanout_concepts,
        "normalized_join_fanout": q_normalized_join_fanout,
        "regex_match_filter": q_regex_match_filter,
        "fuzzy_match": q_fuzzy_match,
        "sanitize_numeric": q_sanitize_numeric,
        "id_transform": q_id_transform,
        "provenance_concat": q_provenance_concat,
        "date_reformat": q_date_reformat,
        "relative_day_date": q_relative_day_date,
        "unit_conversion": q_unit_conversion,
        "when_chain_decode": q_when_chain_decode,
        "groupby_count": q_groupby_count,
        "redundancy_report": q_redundancy_report,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dup_groups": q_exact_dup_groups,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "lang_detect": q_lang_detect,
        "pii_redact": q_pii_redact,
        "embedding_topk": q_embedding_topk,
        "ngram_jaccard": q_ngram_jaccard,
        "benchmark_contamination": q_benchmark_contamination,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "lsh_drop_stats": q_lsh_drop_stats,
        "jaccard_df_stats": q_jaccard_df_stats,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "year_fallback": q_year_fallback,
        "temp_inference": q_temp_inference,
        "composite_key": q_composite_key,
        "pack_years": q_pack_years,
        "frame_sample": q_frame_sample,
        "token_count_bpe": q_token_count_bpe,
        "redundancy_inner": q_redundancy_inner,
        "date_column_discovery": q_date_column_discovery,
        "placeholder_date_validity": q_placeholder_date_validity,
        "group_branch": q_group_branch,
        "gated_fanout": q_gated_fanout,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "windowed_counts": q_windowed_counts,
        "asof_attribution": q_asof_attribution,
        "sessionize": q_sessionize,
        "chunk_pack": q_chunk_pack,
        "balanced_shards": q_balanced_shards,
        "ffd_pack": q_ffd_pack,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_lww_state": """
            WITH w AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_id AS last_lsn, event_type, value
            FROM w WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_lww_narrow": """
            WITH w AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_id AS last_lsn, event_type, value
            FROM w WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_mor_state": """
            WITH w AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_id AS last_lsn, event_type, value
            FROM w WHERE rn = 1
        """,
        "cdc_pipeline_state": """
            WITH w AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_id AS last_lsn, event_type, value
            FROM w WHERE rn = 1
        """,
        "cdc_sparse_state": """
            WITH ev AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_id % 10 <= 1 THEN 'insert'
                          WHEN event_id % 10 = 2 THEN 'delete'
                          WHEN event_id % 10 = 3 THEN 'upsert'
                          ELSE 'update' END AS op,
                     user_id,
                     CASE WHEN event_id % 10 >= 4 AND event_id % 3 = 0 THEN NULL
                          ELSE event_type END AS event_type,
                     CASE WHEN event_id % 10 >= 4 AND event_id % 2 = 0 THEN NULL
                          ELSE value END AS value
              FROM events),
            agg AS (
              SELECT user_id,
                     max(lsn) AS last_lsn,
                     max(lsn) FILTER (op = 'delete') AS bd,
                     max(lsn) FILTER (op IN ('insert','upsert')) AS bf,
                     arg_max(struct_pack(et := event_type, v := value), lsn)
                         FILTER (op IN ('insert','upsert')) AS img,
                     arg_max(struct_pack(l := lsn, x := event_type), lsn)
                         FILTER (op = 'update' AND event_type IS NOT NULL) AS uet,
                     arg_max(struct_pack(l := lsn, x := value), lsn)
                         FILTER (op = 'update' AND value IS NOT NULL) AS uv
              FROM ev GROUP BY user_id),
            b AS (
              SELECT *, greatest(coalesce(bf, -1), coalesce(bd, -1)) AS boundary
              FROM agg)
            SELECT user_id, last_lsn,
                   COALESCE(CASE WHEN uet.l > boundary THEN uet.x END, img.et) AS event_type,
                   COALESCE(CASE WHEN uv.l > boundary THEN uv.x END, img.v) AS value
            FROM b
            WHERE coalesce(bf, -1) > coalesce(bd, -1)
        """,
        "cdc_sparse_stats": """
            WITH ev AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_id % 10 <= 1 THEN 'insert'
                          WHEN event_id % 10 = 2 THEN 'delete'
                          WHEN event_id % 10 = 3 THEN 'upsert'
                          ELSE 'update' END AS op,
                     user_id
              FROM events),
            half AS (SELECT CAST(count(*) / 2 AS BIGINT) AS h,
                            CAST(count(*) / 2 + greatest(count(*) / 16, 1) AS BIGINT) AS hi
                     FROM events),
            r AS (
              SELECT user_id FROM ev, half WHERE lsn < h GROUP BY user_id
              HAVING coalesce(max(lsn) FILTER (op IN ('insert','upsert')), -1)
                   > coalesce(max(lsn) FILTER (op = 'delete'), -1)),
            k AS (
              SELECT user_id,
                     coalesce(max(lsn) FILTER (op IN ('insert','upsert')), -1) AS bf,
                     coalesce(max(lsn) FILTER (op = 'delete'), -1) AS bd
              FROM ev, half WHERE lsn >= h AND lsn < hi GROUP BY user_id),
            c AS (
              SELECT user_id, bd > bf AS is_del,
                     bf = -1 AND bd = -1 AS needs_fill,
                     user_id IN (SELECT user_id FROM r) AS resident
              FROM k)
            SELECT CAST(count(*) AS BIGINT) AS keys_total,
                   CAST(sum(CASE WHEN is_del THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
                   CAST(sum(CASE WHEN NOT is_del AND NOT needs_fill THEN 1 ELSE 0 END) AS BIGINT) AS dense_images,
                   CAST(sum(CASE WHEN needs_fill THEN 1 ELSE 0 END) AS BIGINT) AS fill_keys,
                   CAST(sum(CASE WHEN needs_fill AND resident THEN 1 ELSE 0 END) AS BIGINT) AS fill_matched,
                   CAST(sum(CASE WHEN needs_fill AND NOT resident THEN 1 ELSE 0 END) AS BIGINT) AS fill_dropped
            FROM c
        """,
        "cdc_change_feed": """
            WITH w1 AS (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events WHERE event_id % 2 = 1),
            s1 AS (
              SELECT user_id, event_id AS lsn, (event_type = 'error') AS dead
              FROM w1 WHERE rn = 1),
            w2 AS (
              SELECT user_id, event_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events),
            s2 AS (SELECT * FROM w2 WHERE rn = 1)
            SELECT CASE WHEN s2.event_type = 'error' THEN 'delete'
                        WHEN s1.user_id IS NULL OR s1.dead THEN 'insert'
                        ELSE 'update' END AS change_op,
                   s2.user_id, s2.event_type, s2.value,
                   s2.event_id AS change_lsn
            FROM s2 LEFT JOIN s1 USING (user_id)
            WHERE (s1.user_id IS NULL OR s2.event_id > s1.lsn)
              AND NOT (s2.event_type = 'error' AND (s1.user_id IS NULL OR s1.dead))
        """,
        "cdc_mv_refresh": """
            WITH w AS (
              SELECT user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events),
            state AS (
              SELECT user_id, event_type, value FROM w
              WHERE rn = 1 AND event_type <> 'error')
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
            FROM state GROUP BY event_type
        """,
        "cdc_mv_minmax": """
            WITH w AS (
              SELECT user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events),
            state AS (
              SELECT user_id, event_type, value FROM w
              WHERE rn = 1 AND event_type <> 'error')
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   ROUND(CAST(MIN(value) AS DOUBLE), 2) AS min_value,
                   ROUND(CAST(MAX(value) AS DOUBLE), 2) AS max_value
            FROM state GROUP BY event_type
        """,
        "priority_dedup": """
            WITH p AS (
              SELECT user_id, event_id, event_type,
                     CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2
                          WHEN 'click' THEN 3 WHEN 'view' THEN 4 WHEN 'error' THEN 5 END AS priority
              FROM events),
            w AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY priority ASC, event_id ASC) rn
              FROM p)
            SELECT user_id, event_id, event_type, priority FROM w WHERE rn = 1
        """,
        "minmax_periods": """
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS period_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS period_end
            FROM events GROUP BY user_id
        """,
        "anti_join_delete": """
            SELECT e.event_id, e.user_id, e.event_type
            FROM events e
            WHERE NOT EXISTS (
              SELECT 1 FROM events d
              WHERE d.event_type = 'error' AND d.user_id = e.user_id
                AND CAST(d.ts AS DATE) = CAST(e.ts AS DATE))
        """,
        "semi_join_exists": """
            SELECT e.event_id, e.user_id, e.value
            FROM events e
            WHERE e.event_type = 'purchase'
              AND EXISTS (SELECT 1 FROM events s
                          WHERE s.event_type = 'signup' AND s.user_id = e.user_id)
        """,
        "dedup_exact_keys": "SELECT DISTINCT user_id, event_type FROM events",
        "surrogate_ids": """
            SELECT c_custkey, c_name,
                   row_number() OVER (ORDER BY c_custkey) AS row_id
            FROM customer
        """,
        "union_multi_source": """
            SELECT user_id, event_id, value FROM events WHERE event_type = 'signup'
            UNION ALL
            SELECT user_id, event_id, NULL AS value FROM events WHERE event_type = 'purchase'
        """,
        "unpivot_lineitem": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem WHERE l_quantity IS NOT NULL
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem WHERE l_extendedprice IS NOT NULL
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem WHERE l_discount IS NOT NULL
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem WHERE l_tax IS NOT NULL
        """,
        "fanout_concepts": """
            SELECT p_partkey, c.concept_id
            FROM part CROSS JOIN (VALUES (1001), (1002), (1003)) AS c(concept_id)
        """,
        "normalized_join_fanout": """
            SELECT d.doc_id, d.source, COALESCE(m.concept_id, 0) AS concept_id
            FROM documents d
            LEFT JOIN (VALUES ('SRC0', 100), (' src0 ', 101), ('Src1', 200), ('src2', 300))
                 AS m(src_name, concept_id)
              ON lower(trim(d.source)) = lower(trim(m.src_name))
        """,
        "regex_match_filter": r"""
            SELECT lang, count(*) AS n_docs
            FROM documents
            WHERE regexp_matches(text, '(?i)\bthe\b')
            GROUP BY lang
        """,
        "fuzzy_match": """
            WITH s AS (
              SELECT doc_id, source,
                     CASE WHEN greatest(length(lower(trim(source))), length('src1')) = 0 THEN 1.0
                          ELSE round(1.0 - levenshtein(lower(trim(source)), 'src1')
                               / CAST(greatest(length(lower(trim(source))), length('src1')) AS DOUBLE), 4)
                     END AS sim
              FROM documents)
            SELECT doc_id, source, sim FROM s WHERE sim > 0.6
        """,
        "sanitize_numeric": """
            SELECT event_id,
                   TRY_CAST(regexp_replace(props, '[^0-9.-]', '', 'g') AS DOUBLE) AS props_num
            FROM events
        """,
        "id_transform": """
            SELECT c_custkey,
                   '11' || lpad(right(regexp_replace(CAST(c_custkey AS VARCHAR), '[^0-9]', '', 'g'), 7), 7, '0') AS id9
            FROM customer
        """,
        "provenance_concat": """
            SELECT event_id, concat_ws(' | ', 'events', event_type, CAST(event_id AS VARCHAR)) AS prov
            FROM events
        """,
        "date_reformat": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%d/%m/%Y') AS dmy,
                   strftime(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y'), '%Y-%m-%d') AS iso
            FROM orders
        """,
        "relative_day_date": """
            SELECT event_id,
                   strftime(DATE '2016-01-01' + CAST(floor(value) AS INTEGER), '%Y-%m-%d') AS obs_date,
                   CAST(year(DATE '2016-01-01' + CAST(floor(value) AS INTEGER)) AS INTEGER) AS birth_year
            FROM events
        """,
        "unit_conversion": """
            SELECT l_orderkey, l_linenumber,
                   round(l_quantity * 0.45359237, 2) AS qty_kg,
                   round(l_quantity * 2.54, 2) AS qty_cm,
                   round((l_quantity + 60.0 - 32.0) * 5.0 / 9.0, 2) AS qty_c
            FROM lineitem
        """,
        "when_chain_decode": """
            SELECT o_orderkey,
                   CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                        WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                        WHEN '5-LOW' THEN 5 ELSE 0 END AS INTEGER) AS priority_code
            FROM orders
        """,
        "groupby_count": "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
        "redundancy_report": """
            SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_tables
            FROM events GROUP BY user_id HAVING count(DISTINCT event_type) >= 4
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "tpch_q5": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name
        """,
        "doc_fingerprint": r"""
            SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
            FROM documents
        """,
        "exact_dup_groups": r"""
            SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
                   count(*) AS n_docs, min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        "token_count": r"""
            SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens_ws
            FROM documents
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS cosine_sim
              FROM q CROSS JOIN embeddings e WHERE q.query_id <> e.vec_id),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 3
        """,
        "year_fallback": """
            SELECT event_id,
                   CAST(CASE
                     WHEN (event_id % 5) = 0 THEN DATE '1900-01-01'
                     WHEN (1800 + (event_id % 300)) BETWEEN 1880 AND 2030
                       THEN make_date(CAST(1800 + (event_id % 300) AS INTEGER), 1, 1)
                     ELSE DATE '1900-01-01' END AS VARCHAR) AS year_date
            FROM events
        """,
        "temp_inference": """
            SELECT event_id,
                   CASE WHEN (event_id % 3) = 2 THEN round(value, 2)
                        WHEN (event_id % 3) = 1 THEN round((value - 32.0) * 5.0 / 9.0, 2)
                        WHEN value BETWEEN 35.0 AND 40.0 THEN round(value, 2)
                        WHEN value BETWEEN 95.0 AND 104.0 THEN round((value - 32.0) * 5.0 / 9.0, 2)
                        ELSE NULL END AS temp_c
            FROM events
        """,
        "composite_key": """
            SELECT event_id,
                   concat_ws('_', CAST(user_id AS VARCHAR),
                     COALESCE(CASE WHEN event_type <> 'error'
                              THEN CAST(CAST(ts AS DATE) AS VARCHAR) END, '0')) AS ck
            FROM events
        """,
        "pack_years": """
            SELECT l_orderkey, l_linenumber,
                   round(l_quantity * l_discount * 365.0, 4) AS pack_years
            FROM lineitem
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)|\w+|[^\w\s]')) AS BIGINT) AS n_tokens_bpe
            FROM documents
        """,
        "quality_score": r"""
            WITH p AS (
              SELECT doc_id,
                     length(text) AS n,
                     length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
                     len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS n_words,
                     len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> list_contains(['the','and','of','to','is','in','that','it'], x))) AS hits_en
              FROM documents),
            b AS (
              SELECT doc_id,
                     CASE WHEN n BETWEEN 100 AND 20000 THEN 1.0 WHEN n >= 20 THEN 0.5 ELSE 0.0 END AS len_band,
                     CASE WHEN n_words > 0 AND (CAST(n AS DOUBLE) / n_words) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.3 END AS wlen_band,
                     CASE WHEN n > 0 AND (CAST(n_punct AS DOUBLE) / n) > 0.001
                               AND (CAST(n_punct AS DOUBLE) / n) < 0.2 THEN 1.0 ELSE 0.4 END AS punct_band,
                     CASE WHEN n_words > 0 AND (CAST(hits_en AS DOUBLE) / n_words) > 0.05 THEN 1.0
                          WHEN n_words > 0 AND (CAST(hits_en AS DOUBLE) / n_words) > 0.01 THEN 0.6
                          ELSE 0.2 END AS stop_band
              FROM p)
            SELECT doc_id,
                   round(0.35 * len_band + 0.2 * wlen_band + 0.2 * punct_band + 0.25 * stop_band, 4) AS quality
            FROM b
        """,
        "pii_redact": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or 555-123-4567, host 10.0.0.'
                            || CAST(doc_id % 255 AS VARCHAR) || ' ssn 123-45-6789'
                     ELSE text END AS txt
              FROM documents)
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                     '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
                     '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g') AS clean,
                   CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(txt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
                   CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
                   CAST(len(regexp_extract_all(txt, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone
            FROM t
        """,
        "lang_detect": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
              FROM documents),
            s AS (
              SELECT doc_id, len(ws) AS nw,
                     len(list_filter(ws, x -> list_contains(['the','and','of','to','is','in','that','it'], x))) AS h_en,
                     len(list_filter(ws, x -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], x))) AS h_de,
                     len(list_filter(ws, x -> list_contains(['le','la','et','les','des','est','une','que'], x))) AS h_fr,
                     len(list_filter(ws, x -> list_contains(['el','la','que','de','los','una','es','por'], x))) AS h_es
              FROM w),
            sc AS (
              SELECT doc_id,
                     CASE WHEN nw > 0 THEN CAST(h_en AS DOUBLE) / nw ELSE 0.0 END AS s_en,
                     CASE WHEN nw > 0 THEN CAST(h_de AS DOUBLE) / nw ELSE 0.0 END AS s_de,
                     CASE WHEN nw > 0 THEN CAST(h_fr AS DOUBLE) / nw ELSE 0.0 END AS s_fr,
                     CASE WHEN nw > 0 THEN CAST(h_es AS DOUBLE) / nw ELSE 0.0 END AS s_es
              FROM s)
            SELECT doc_id,
                   CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0.0 THEN 'und'
                        WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                        WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                        WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM sc
        """,
        "ngram_jaccard": _JACCARD_ORACLE.format(threshold=0.2),
        "benchmark_contamination": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 3 THEN
                            list_distinct(list_transform(range(1, len(ws) - 1),
                              i -> array_to_string(list_slice(ws, i, i + 2), ' ')))
                          WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                          ELSE [] END AS g
              FROM w),
            inv AS (SELECT doc_id, unnest(g) AS gram FROM sh),
            probes AS (SELECT doc_id AS probe_id, gram FROM inv WHERE doc_id % 25 = 0),
            hits AS (
              SELECT d.doc_id, p.probe_id, count(*) AS n
              FROM inv d JOIN probes p ON d.gram = p.gram AND d.doc_id <> p.probe_id
              GROUP BY 1, 2)
            SELECT doc_id, probe_id, CAST(n AS BIGINT) AS shared_ngrams
            FROM hits WHERE n >= 3
        """,
        # minhash_lsh / simhash output the exact >=0.8 jaccard pair set via
        # candidate generation + exact verification; the oracle is the
        # brute-force pair set, so hash equality asserts candidate recall==1.
        "minhash_lsh": _JACCARD_ORACLE.format(threshold=0.8),
        "simhash": _JACCARD_ORACLE.format(threshold=0.8),
        # both LSH families must report ZERO drops at this sf — a capped run
        # is no longer indistinguishable from a complete one, so any bucket
        # past the cap would surface here as a hash mismatch.
        "lsh_drop_stats": """
            SELECT 'minhash' AS family, CAST(0 AS BIGINT) AS dropped_buckets,
                   CAST(0 AS BIGINT) AS dropped_members, CAST(1000 AS BIGINT) AS max_bucket
            UNION ALL
            SELECT 'simhash', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1000 AS BIGINT)
        """,
        # exact document-frequency tally of word-3-gram shingles past df_max=5
        "jaccard_df_stats": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 3 THEN
                            list_distinct(list_transform(range(1, len(ws) - 1),
                              i -> array_to_string(list_slice(ws, i, i + 2), ' ')))
                          WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                          ELSE [] END AS g
              FROM w),
            inv AS (SELECT unnest(g) AS gram FROM sh),
            per AS (SELECT gram, count(*) AS df FROM inv GROUP BY 1 HAVING count(*) > 5)
            SELECT CAST(count(*) AS BIGINT) AS dropped_shingles,
                   CAST(coalesce(sum(df), 0) AS BIGINT) AS dropped_postings,
                   CAST(5 AS BIGINT) AS df_max
            FROM per
        """,
        "lsh_topk": _PLANTED_TOPK_ORACLE,
        "ivf_topk": _PLANTED_TOPK_ORACLE,
        "redundancy_inner": """
            SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
            FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
            FROM events WHERE event_type = 'click'
        """,
        "date_column_discovery": """
            SELECT * FROM (VALUES
              ('orders', 'o_orderdate'),
              ('lineitem', 'l_shipdate')) AS t(table_name, column_name)
        """,
        "placeholder_date_validity": """
            WITH d AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0 THEN DATE '1900-01-01'
                          ELSE CAST(o_orderdate AS DATE) END AS d
              FROM orders)
            SELECT o_orderkey, CAST(d AS VARCHAR) AS d,
                   (d IS NOT NULL AND CAST(d AS VARCHAR) <> '1900-01-01') AS is_real
            FROM d
        """,
        "group_branch": """
            SELECT event_id,
                   CAST(CASE WHEN user_id % 3 = 1 THEN 374623 ELSE 4099804 END AS INTEGER) AS concept_id,
                   strftime(DATE '2016-01-01' + CAST(
                     CASE WHEN user_id % 3 = 1 THEN floor(value) ELSE -42368 END AS INTEGER),
                     '%Y-%m-%d') AS onset_date
            FROM events WHERE user_id % 3 <> 0
        """,
        "gated_fanout": """
            SELECT event_id, 'left' AS side, 1001 AS concept_id
            FROM events WHERE event_id % 2 = 0
            UNION ALL
            SELECT event_id, 'right', 1002 FROM events WHERE event_id % 3 = 0
        """,
        "asof_attribution": """
            WITH l AS (
              SELECT user_id, event_id, ts, value FROM events
              WHERE event_type = 'purchase'),
            r AS (
              SELECT user_id, event_id AS click_id, ts, value FROM events
              WHERE event_type = 'click')
            SELECT l.user_id AS user_id, l.event_id AS event_id,
                   strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                   r.click_id AS click_id,
                   strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
                   r.value AS click_value
            FROM l LEFT JOIN r
              ON l.user_id = r.user_id AND r.ts <= l.ts
            QUALIFY row_number() OVER (
              PARTITION BY l.event_id
              ORDER BY r.ts DESC NULLS LAST, r.click_id DESC NULLS LAST) = 1
        """,
        "chunk_pack": """
            WITH d AS (
              SELECT doc_id, n_chars AS n_tok,
                     CAST(doc_id % 8 AS INT) AS shard
              FROM documents WHERE n_chars > 0),
            o AS (
              SELECT shard, doc_id, n_tok,
                     COALESCE(SUM(n_tok) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS c0
              FROM d)
            SELECT shard, k.k AS pack_id, doc_id,
                   CAST(GREATEST(c0, k.k * 1000) - c0 AS BIGINT) AS seg_start,
                   CAST(LEAST(c0 + n_tok, (k.k + 1) * 1000)
                     - GREATEST(c0, k.k * 1000) AS BIGINT) AS seg_len,
                   CAST(GREATEST(c0, k.k * 1000) - k.k * 1000 AS BIGINT) AS pack_pos
            FROM o
            CROSS JOIN UNNEST(generate_series(
              CAST(c0 // 1000 AS BIGINT),
              CAST((c0 + n_tok - 1) // 1000 AS BIGINT))) AS k(k)
        """,
        "balanced_shards": """
            SELECT doc_id, n_tok,
                   CASE WHEN r % 16 < 8 THEN r % 16 ELSE 15 - (r % 16) END AS shard
            FROM (SELECT doc_id, n_chars AS n_tok,
                         row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r
                  FROM documents)
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts, value, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts, value,
                     SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM g)
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                   strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                   COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
            FROM s GROUP BY user_id, session_seq
        """,
        "windowed_counts": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
                   event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2, 3
        """,
        "embedding_dup_pairs": """
            WITH p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, cosine_sim FROM p WHERE cosine_sim >= 0.25
        """,
        # frame_sample: synthetic_media(48, seed=7) metadata is arithmetic on
        # (id, seed); videos are ids with (id*7919+7)%3==2, duration
        # 1000+(id*997+217)%5000, sampled every 500 ms from 0..duration-1.
        "frame_sample": """
            WITH m AS (SELECT unnest(range(0, 48)) AS i),
            v AS (SELECT i, 1000 + ((i * 997 + 217) % 5000) AS dur
                  FROM m WHERE (i * 7919 + 7) % 3 = 2),
            f AS (SELECT i, unnest(generate_series(0, greatest(dur - 1, 0), 500)) AS ts FROM v)
            SELECT printf('m-%06d', i) AS media_id, CAST(ts AS BIGINT) AS frame_ts_ms FROM f
        """,
    }


# Exact word-3-gram jaccard pairs >= {threshold} over documents — inverted
# index formulation (mirrors operators/dedup.ngram_jaccard_pairs semantics:
# distinct shingles; n<k docs collapse to one whole-text shingle).
_JACCARD_ORACLE = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3 THEN
                    list_distinct(list_transform(range(1, len(ws) - 1),
                      i -> array_to_string(list_slice(ws, i, i + 2), ' ')))
                  WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                  ELSE [] END AS g
      FROM w),
    inv AS (SELECT doc_id, len(g) AS n, unnest(g) AS gram FROM sh),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS inter
      FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, round(inter / (na + nb - inter), 6) AS jaccard
    FROM p
    WHERE round(inter / (na + nb - inter), 6) >= {threshold}
"""

# Brute-force cosine top-3 over the planted-cluster corpus (see
# _planted_corpus): anchors = embeddings vec_id<8, 32 replicas each with
# deterministic arithmetic noise; queries are ids 0/32/64.
_PLANTED_TOPK_ORACLE = """
    WITH reps AS (SELECT unnest(range(0, 32)) AS rep),
    c AS (
      SELECT e.vec_id * 32 + r.rep AS id,
             list_transform(range(0, 64),
               j -> CAST(e.embedding[j + 1] AS DOUBLE)
                    + ((e.vec_id * 53 + r.rep * 29 + j * 17) % 7) * 0.01) AS vec
      FROM embeddings e CROSS JOIN reps r WHERE e.vec_id < 8),
    q AS (SELECT id AS query_id, vec AS qv FROM c WHERE id IN (0, 32, 64)),
    scored AS (
      SELECT q.query_id, c.id AS neighbor_id,
             list_cosine_similarity(q.qv, c.vec) AS sim
      FROM q CROSS JOIN c WHERE q.query_id <> c.id),
    ranked AS (
      SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 3
"""
