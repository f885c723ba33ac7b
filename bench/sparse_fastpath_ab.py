"""Sparse fast-path A/B (r5 judge task #8 done-criterion).

An all-full-image change log (no partial `update` events) run through
`replay_log(sparse_updates=True)` should cost ≈ the dense replay: the r5
fast path proves `fill` empty with one cheap count over the pinned fold and
skips the resident read + join. This measures dense vs sparse-on-dense-log
vs sparse-on-masked-log (the true-sparse baseline, for context) on the same
input and prints one JSON line.

    spark-submit --master local[32] --py-files sodes.zip \
        bench/sparse_fastpath_ab.py --events 2000000 --docs 400000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

from pyspark.sql import SparkSession, functions as F

from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable


def timed_replay(spark, base, log, workdir, **kw) -> float:
    shutil.rmtree(workdir, ignore_errors=True)
    tbl = LakeTable.create(spark, workdir, schema=base.schema, key_col="doc_id",
                           num_buckets=32, overwrite=True)
    tbl.overwrite_full(base)
    t0 = time.time()
    replay_log(tbl, log, num_epochs=2, **kw)
    dt = time.time() - t0
    shutil.rmtree(workdir, ignore_errors=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/sparse_ab_tbl")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    base = base_sequences(spark, args.docs, seed=42, max_len=64)
    log = change_log(spark, args.events, args.docs, seed=42, max_len=64).persist()
    log.count()
    masked = (
        log.withColumn(
            "tokens",
            F.when((F.col("op") == "update") & (F.pmod("lsn", F.lit(2)) == 0),
                   F.lit(None)).otherwise(F.col("tokens")),
        ).persist()
    )
    masked.count()

    # warm-up (codegen for all three plans)
    timed_replay(spark, base.limit(10_000), log.limit(50_000), args.workdir + "_w")
    timed_replay(spark, base.limit(10_000), log.limit(50_000), args.workdir + "_w",
                 sparse_updates=True)

    lr = (0, args.events - 1)
    results = {"dense": [], "sparse_all_images": [], "sparse_masked": []}
    for _ in range(args.reps):
        results["dense"].append(timed_replay(spark, base, log, args.workdir, lsn_range=lr))
        results["sparse_all_images"].append(
            timed_replay(spark, base, log, args.workdir, lsn_range=lr, sparse_updates=True)
        )
        results["sparse_masked"].append(
            timed_replay(spark, base, masked, args.workdir, lsn_range=lr, sparse_updates=True)
        )
    best = {k: min(v) for k, v in results.items()}
    print(json.dumps({
        "metric": "sparse_fastpath_ab",
        "events": args.events,
        "docs": args.docs,
        "cores": spark.sparkContext.defaultParallelism,
        "best_sec": best,
        "samples": results,
        "all_images_over_dense": round(best["sparse_all_images"] / best["dense"], 3),
        "masked_over_dense": round(best["sparse_masked"] / best["dense"], 3),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
