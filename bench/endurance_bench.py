"""Sustained-ingest endurance benchmark.

N epochs of MERGE interleaved with table maintenance (compaction, tombstone
vacuum, snapshot expiry) on a GROWING table — the evidence that epoch
wall-time stays flat and file counts stay bounded over a long ingest run,
i.e. that the maintenance operators actually hold the 10^10-event regime
together (a per-epoch cost that creeps with table age or epoch count is
exactly what this catches: manifest bloat, file-count creep, probe-side
scan growth).

    spark-submit --master local[32] bench/endurance_bench.py \
        --epochs 20 --events 2000000 --buckets 128 --mode mor \
        --compact-every 5 --out BENCH/endurance_r03.json

Prints (and optionally writes) one JSON object with the per-epoch series:
merge seconds, events/sec, manifest bytes, total data files, live rows —
plus the maintenance pauses, each timed separately from ingest.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

from pyspark.sql import SparkSession, functions as F

from standardized_omop_data_etl_spark.plans.maintenance import (
    compact_buckets,
    vacuum_tombstones,
)
from standardized_omop_data_etl_spark.plans.merge import merge_into
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable


def table_stats(tbl: LakeTable) -> dict:
    m = tbl.manifest()
    n_files = sum(len(fl) for fl in m["files"].values())
    manifest_bytes = tbl.fs.getsize(tbl._meta_path(f"v{m['version']}.json"))
    return {
        "version": m["version"],
        "data_files": n_files,
        "max_files_per_bucket": max((len(fl) for fl in m["files"].values()), default=0),
        "manifest_bytes": manifest_bytes,
        "mor_buckets": len(m.get("mor_buckets", [])),
        "visible_rows": sum(int(c) for c in m.get("row_counts", {}).values()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--events", type=int, default=2_000_000, help="events per epoch")
    ap.add_argument("--docs", type=int, default=400_000, help="base doc universe")
    ap.add_argument("--max-len", type=int, default=64)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--mode", choices=("cow", "mor"), default="cow")
    ap.add_argument("--lww", choices=("window", "narrow"), default="window")
    ap.add_argument("--compact-every", type=int, default=5,
                    help="run compact+vacuum+expire after every K epochs (0=never)")
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/endurance_bench")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    load_start = os.getloadavg()

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    # All epoch logs materialized to parquet UP FRONT: generation cost never
    # leaks into the timed merge loop, and the fixed file layout feeds every
    # parallelism level identically.
    base_path = os.path.join(args.workdir, "base.parquet")
    base_sequences(spark, args.docs, seed=args.seed, max_len=args.max_len,
                   partitions=64).write.parquet(base_path)
    log_paths = []
    for e in range(args.epochs):
        p = os.path.join(args.workdir, f"log_{e:04d}.parquet")
        (
            change_log(spark, args.events, args.docs, seed=args.seed + e,
                       max_len=args.max_len, partitions=64)
            .withColumn("lsn", F.col("lsn") + F.lit(e * args.events))
            .write.parquet(p)
        )
        log_paths.append(p)

    base = spark.read.parquet(base_path)
    table_path = os.path.join(args.workdir, f"table_{args.mode}")
    tbl = LakeTable.create(spark, table_path, schema=base.schema, key_col="doc_id",
                           num_buckets=args.buckets, overwrite=True)
    tbl.overwrite_full(base)

    # warm-up epoch on a throwaway table (JIT/codegen, not measured)
    warm = LakeTable.create(spark, table_path + "_warm", schema=base.schema,
                            key_col="doc_id", num_buckets=8, overwrite=True)
    warm.overwrite_full(base.limit(20_000))
    merge_into(warm, spark.read.parquet(log_paths[0]).limit(50_000),
               epoch="warm", mode=args.mode)
    shutil.rmtree(table_path + "_warm", ignore_errors=True)

    series = []
    maint = []
    for e, p in enumerate(log_paths):
        batch = spark.read.parquet(p)
        t0 = time.time()
        r = merge_into(
            tbl, batch, epoch=f"endurance:{e}",
            salt_partitions=args.salt or None, mode=args.mode,
            lww_strategy=args.lww,
        )
        dt = time.time() - t0
        series.append({
            "epoch": e,
            "merge_sec": round(dt, 2),
            "events_per_sec": round(args.events / dt, 1),
            "events_applied": r.metrics.get("events_applied", 0),
            **table_stats(tbl),
        })
        if args.compact_every and (e + 1) % args.compact_every == 0:
            t1 = time.time()
            compact_buckets(tbl, max_files_per_bucket=4)
            t_compact = time.time() - t1
            t1 = time.time()
            # upstream can't re-deliver below the epoch floor we just applied
            vacuum_tombstones(tbl, watermark_lsn=(e + 1 - args.compact_every) * args.events)
            t_vacuum = time.time() - t1
            t1 = time.time()
            tbl.expire_snapshots(keep_last=4)
            t_expire = time.time() - t1
            maint.append({
                "after_epoch": e,
                "compact_sec": round(t_compact, 2),
                "vacuum_sec": round(t_vacuum, 2),
                "expire_sec": round(t_expire, 2),
                **table_stats(tbl),
            })

    merge_secs = [s["merge_sec"] for s in series]
    half = len(merge_secs) // 2
    first_half = sum(merge_secs[:half]) / max(half, 1)
    second_half = sum(merge_secs[half:]) / max(len(merge_secs) - half, 1)
    out = {
        "metric": "endurance_epoch_seconds",
        "mode": args.mode,
        "lww": args.lww,
        "epochs": args.epochs,
        "events_per_epoch": args.events,
        "total_events": args.epochs * args.events,
        "docs": args.docs,
        "buckets": args.buckets,
        "compact_every": args.compact_every,
        "cores": cores,
        "mean_merge_sec": round(sum(merge_secs) / len(merge_secs), 2),
        "first_half_mean_sec": round(first_half, 2),
        "second_half_mean_sec": round(second_half, 2),
        # flatness: late epochs vs early epochs — creep shows up here
        "drift_ratio": round(second_half / first_half, 3),
        "max_data_files": max(s["data_files"] for s in series),
        "final": table_stats(tbl),
        "series": series,
        "maintenance": maint,
        "provenance": {
            "loadavg_start": [round(x, 2) for x in load_start],
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            "cores": cores,
            "host_cpus": os.cpu_count(),
        },
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
