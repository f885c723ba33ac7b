"""Batch-keyed probe pruning A/B — the >BROADCAST_KEYS_MAX regime.

Builds a table whose resident key count exceeds the 4M broadcast cap (the
10^10-row table's everyday condition), then applies the SAME epochs twice:

* unpruned — ``batch_rows_bound=None``: the probe falls to the size-tiered
  shuffle-hash/sort-merge join over every resident key of the touched
  buckets (the pre-r4 behavior at this scale);
* pruned   — ``batch_rows_bound=<epoch size>``: winner keys semi-join below
  the scan (and the mor resolver); the batch-sized target broadcasts.

The LWW kernel is pinned to ``window`` in both legs so the probe is the
only difference. Per-phase wall comes from SODES_MERGE_TIMING (set here).
Prints one JSON line with per-epoch probe seconds for both legs plus the
per-epoch metrics equality check (the probes must classify identically).

    spark-submit --master local[8] --py-files sodes.zip \
        bench/probe_prune_bench.py --docs 8000000 --events 4000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

os.environ["SODES_MERGE_TIMING"] = "1"

from pyspark.sql import SparkSession, functions as F

from standardized_omop_data_etl_spark.plans.merge import merge_into
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable


def replay(tbl, log, events, epochs, bound: bool) -> tuple[list[float], list[dict]]:
    per = events // epochs
    probe_secs, metrics = [], []
    for i in range(epochs):
        lo, hi = i * per, (i + 1) * per
        batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        t0 = time.time()
        r = merge_into(
            tbl, batch, epoch=f"e{i}", mode="mor", lww_strategy="window",
            batch_rows_bound=(hi - lo) if bound else None,
        )
        probe_secs.append(round(time.time() - t0, 2))  # full epoch wall; phase split on stdout
        metrics.append(r.metrics)
    return probe_secs, metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8_000_000)
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--max-len", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/probe_prune_bench")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)
    base = base_sequences(spark, args.docs, seed=7, max_len=args.max_len, partitions=64)
    base.write.parquet(os.path.join(args.workdir, "base.parquet"))
    change_log(spark, args.events, args.docs, seed=7, max_len=args.max_len,
               partitions=64).write.parquet(os.path.join(args.workdir, "log.parquet"))
    base = spark.read.parquet(os.path.join(args.workdir, "base.parquet"))
    log = spark.read.parquet(os.path.join(args.workdir, "log.parquet"))

    legs = {}
    for name, bound in (("unpruned", False), ("pruned", True)):
        path = os.path.join(args.workdir, name)
        tbl = LakeTable.create(spark, path, schema=base.schema, key_col="doc_id",
                               num_buckets=args.buckets, overwrite=True)
        tbl.overwrite_full(base)
        epoch_secs, metrics = replay(tbl, log, args.events, args.epochs, bound)
        legs[name] = {"epoch_secs": epoch_secs, "metrics": metrics,
                      "final_rows": tbl.read().count()}

    same = (
        legs["pruned"]["metrics"] == legs["unpruned"]["metrics"]
        and legs["pruned"]["final_rows"] == legs["unpruned"]["final_rows"]
    )
    print(json.dumps({
        "metric": "probe_prune_ab",
        "docs": args.docs, "events": args.events, "epochs": args.epochs,
        "cores": spark.sparkContext.defaultParallelism,
        "unpruned_epoch_secs": legs["unpruned"]["epoch_secs"],
        "pruned_epoch_secs": legs["pruned"]["epoch_secs"],
        "metrics_identical": same,
        "final_rows": legs["pruned"]["final_rows"],
    }))


if __name__ == "__main__":
    main()
