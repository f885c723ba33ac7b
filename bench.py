"""Driver benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "replay_events_per_sec": ...}

The query set covers the engine's kernels: CDC LWW state, priority dedup,
merge-shaped joins/aggregations, the TPC-H-style heavy hitters, text/dedup/
similarity ops — plus a replay-throughput measurement of the actual MERGE
pipeline (the north-rule metric) on a synthetic change log.
"""

from __future__ import annotations

import json
import os
import shutil
import time

HEADLINE = [
    "cdc_lww_state",
    "priority_dedup",
    "minmax_periods",
    "anti_join_delete",
    "unpivot_lineitem",
    "surrogate_ids",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "doc_fingerprint",
    "token_count",
    "quality_score",
    "lang_detect",
    "embedding_topk",
    "minhash_lsh",
    "asof_attribution",
    "chunk_pack",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    load_start = os.getloadavg()

    import __spark_entry__ as entrymod
    from standardized_omop_data_etl_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16)
    )
    qs = entrymod.queries()

    # Per-query session warm-up: one UNTIMED execution IMMEDIATELY before
    # that query's timed reps. r4's min-of-2 hid a ~2x first-rep penalty
    # (per-query codegen compile + input page-cache faults) that
    # contaminated the driver total on a loaded host; warming adjacent to
    # the timed reps (rather than in a separate global pass) keeps the JIT,
    # broadcast, and page-cache state hot for BOTH reps (target: reps
    # within ~20% on non-replay queries). Warm-up wall time is recorded in
    # provenance for transparency.
    # min-of-2 per query: this sandbox's shared host has measured 3x noise
    # spells; the min of two back-to-back runs is a far better estimate of
    # the uncontended cost than a single sample.
    warmup: dict[str, float] = {}
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        warmup[name] = round(time.time() - t0, 3)
        samples[name] = []
        for _rep in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples[name].append(round(time.time() - t0, 3))
        timings[name] = min(samples[name])

    # Replay throughput (north-rule metric): synthetic log at sf-scaled size.
    from standardized_omop_data_etl_spark.plans.maintenance import compact_buckets
    from standardized_omop_data_etl_spark.plans.replay import replay_log
    from standardized_omop_data_etl_spark.sources.generators import (
        base_sequences,
        change_log,
    )
    from standardized_omop_data_etl_spark.sources.lake import LakeTable

    n_events = int(2_000_000 * float(sf) * 10) or 200_000
    n_docs = max(n_events // 5, 1000)
    workdir = "/tmp/bench_replay_tbl"
    base = base_sequences(spark, n_docs, seed=42, max_len=64)
    log = change_log(spark, n_events, n_docs, seed=42, max_len=64).persist()
    log.count()  # materialize generation outside the timed window

    # replay-path warm-up: a throwaway mini-replay (cow + mor + compaction)
    # compiles the MERGE machinery's plans so the timed reps below measure
    # steady-state dataflow, not first-query codegen (same rationale as the
    # per-query warm-up above; replay_bench.py has done this since r2).
    t0 = time.time()
    warm_dir = workdir + "_warm"
    shutil.rmtree(warm_dir, ignore_errors=True)
    wtbl = LakeTable.create(spark, warm_dir, schema=base.schema, key_col="doc_id",
                            num_buckets=8, overwrite=True)
    wtbl.overwrite_full(base.limit(10_000))
    replay_log(wtbl, log.limit(50_000), num_epochs=1, epoch_prefix="warmc")
    replay_log(wtbl, log.limit(50_000), num_epochs=1, mode="mor",
               epoch_prefix="warmm")
    replay_log(wtbl, log.limit(50_000), num_epochs=1, sparse_updates=True,
               epoch_prefix="warms")
    compact_buckets(wtbl, max_files_per_bucket=1)
    shutil.rmtree(warm_dir, ignore_errors=True)
    warmup["replay_paths"] = round(time.time() - t0, 3)

    replay_sec = None
    for _rep in range(2):  # min-of-2, same as the per-query timings
        shutil.rmtree(workdir, ignore_errors=True)
        tbl = LakeTable.create(
            spark, workdir, schema=base.schema, key_col="doc_id", num_buckets=32,
            overwrite=True,
        )
        tbl.overwrite_full(base)
        t0 = time.time()
        # default lww_strategy="auto": resolves window at this shape (1M-event
        # epochs / 32 cores = 31k rows/core — measured ~1.7x faster than the
        # narrow kernel here; see BENCH/BASELINE.md r4 kernel-shape A/B)
        replay_log(tbl, log, num_epochs=2)
        dt = time.time() - t0
        replay_sec = dt if replay_sec is None else min(replay_sec, dt)
        samples.setdefault("cdc_replay", []).append(round(dt, 3))
    timings["cdc_replay"] = round(replay_sec, 3)

    # merge-on-read replay: same log, append-only delta path (O(batch) write
    # cost per epoch) + one materializing compaction at the end, so the
    # number covers the full mor cost story, not just the cheap appends.
    mor_sec = None
    for _rep in range(2):
        shutil.rmtree(workdir, ignore_errors=True)
        tbl = LakeTable.create(
            spark, workdir, schema=base.schema, key_col="doc_id", num_buckets=32,
            overwrite=True,
        )
        tbl.overwrite_full(base)
        t0 = time.time()
        replay_log(tbl, log, num_epochs=2, mode="mor")
        compact_buckets(tbl, max_files_per_bucket=1)
        dt = time.time() - t0
        mor_sec = dt if mor_sec is None else min(mor_sec, dt)
        samples.setdefault("cdc_replay_mor", []).append(round(dt, 3))
    timings["cdc_replay_mor"] = round(mor_sec, 3)

    # change-feed extraction (consumer-side cost): full-range incremental
    # diff of the replayed table — bucket-pruned scan + broadcast probe
    # (plans/change_feed.py). Uses the mor table left by the loop above
    # (post-compaction), diffing bootstrap → head.
    from standardized_omop_data_etl_spark.plans.change_feed import read_changes

    feed_sec = None
    for _rep in range(2):
        t0 = time.time()
        read_changes(tbl, 1, tbl.current_version()).count()
        dt = time.time() - t0
        feed_sec = dt if feed_sec is None else min(feed_sec, dt)
        samples.setdefault("cdc_change_feed", []).append(round(dt, 3))
    timings["cdc_change_feed"] = round(feed_sec, 3)

    # sparse (partial-column) replay: same log with update payloads
    # deterministically masked (tokens NULL on even lsns, source on lsn%3=0
    # — NULL = "unchanged"), applied through densify_sparse_batch. The delta
    # vs cdc_replay is the fold + resident-fill cost on an identical event
    # volume.
    import pyspark.sql.functions as F

    sparse_log = (
        log.withColumn(
            "tokens",
            F.when((F.col("op") == "update") & (F.pmod("lsn", F.lit(2)) == 0),
                   F.lit(None)).otherwise(F.col("tokens")),
        )
        .withColumn(
            "source",
            F.when((F.col("op") == "update") & (F.pmod("lsn", F.lit(3)) == 0),
                   F.lit(None)).otherwise(F.col("source")),
        )
        .persist()
    )
    sparse_log.count()
    sparse_sec = None
    for _rep in range(2):
        shutil.rmtree(workdir, ignore_errors=True)
        tbl = LakeTable.create(
            spark, workdir, schema=base.schema, key_col="doc_id", num_buckets=32,
            overwrite=True,
        )
        tbl.overwrite_full(base)
        t0 = time.time()
        replay_log(tbl, sparse_log, num_epochs=2, sparse_updates=True)
        dt = time.time() - t0
        sparse_sec = dt if sparse_sec is None else min(sparse_sec, dt)
        samples.setdefault("cdc_replay_sparse", []).append(round(dt, 3))
    timings["cdc_replay_sparse"] = round(sparse_sec, 3)
    sparse_log.unpersist()
    log.unpersist()
    shutil.rmtree(workdir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "replay_events": n_events,
                "replay_events_per_sec": round(n_events / replay_sec, 1),
                # provenance: a noise-contaminated sample is mechanically
                # detectable — loadavg ≫ cpus-in-use, or rep-to-rep spread
                # far beyond the min (min-of-2 is reported above).
                "provenance": {
                    "loadavg_start": [round(x, 2) for x in load_start],
                    "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                    "cpus": cpus,
                    "host_cpus": os.cpu_count(),
                    "reps_per_query": 2,
                    "aggregation": "min",
                    "warmup_sec": warmup,  # untimed first pass (codegen/cache)
                    "samples": samples,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
