"""Pipelined-replay A/B under injected commit latency.

Why this harness exists: the r04g/r04h campaigns showed that on LOCAL
metadata storage (`/dev/shm`, commit fsync ≈ 0) the one-slot lookahead
(`replay_log(pipeline=True)`) measures parity with the serial loop — there
is nothing to overlap when the per-epoch commit path costs microseconds.
The feature targets the DEPLOYED metadata store: an object store where
every manifest/ledger/lease operation is a network round trip (tens of ms
each, and a commit is many of them). This bench makes that regime
measurable in the sandbox: it wraps the table's `FileSystem` in
`FaultInjectingFileSystem` with a fixed per-operation sleep and replays the
SAME mor change log with `pipeline` off and on, interleaved.

What the numbers mean: with latency L per metadata op and K metadata ops in
an epoch's probe→commit tail, the serial loop pays `epochs × K × L` of
cluster-idle wall time; the pipelined loop hides up to `min(K×L,
delta_write)` of it behind the NEXT epoch's delta write. Correctness is not
at stake here (tests/test_pipeline.py pins bit-exact equivalence and
exactly-once under crash); this measures the Amdahl claim in README.md.

Run (in-process — the fs wrapper is a Python object, so no spark-submit):

    python bench/pipeline_latency_ab.py --events 1600000 --docs 200000 \
        --epochs 8 --latency-ms 25 --cores 8

Prints one JSON line per leg plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.fs import (
    FaultInjectingFileSystem,
    LocalFileSystem,
)
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_600_000)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--latency-ms", type=float, default=25.0,
                    help="injected sleep per metadata-filesystem operation "
                         "(an S3-class round trip is ~10-50 ms)")
    ap.add_argument("--reps", type=int, default=2,
                    help="interleaved off/on pairs; min per arm is reported")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/pipeline_latency_ab")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base_path = os.path.join(args.workdir, "base.parquet")
    log_path = os.path.join(args.workdir, "log.parquet")
    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    base_sequences(spark, args.docs, seed=args.seed, partitions=64).write.parquet(base_path)
    change_log(spark, args.events, args.docs, seed=args.seed,
               partitions=128).write.parquet(log_path)
    base = spark.read.parquet(base_path)
    log = spark.read.parquet(log_path)

    delay = args.latency_ms / 1000.0

    def run_leg(pipeline: bool, tag: str) -> dict:
        table_path = os.path.join(args.workdir, f"table_{tag}")
        fs = FaultInjectingFileSystem(
            LocalFileSystem(), hook=lambda op, path: time.sleep(delay)
        )
        # Bootstrap on the UNWRAPPED fs (bootstrap is outside the timed
        # window and outside the feature's scope).
        tbl = LakeTable.create(spark, table_path, schema=base.schema,
                               key_col="doc_id", num_buckets=args.buckets,
                               overwrite=True)
        tbl.overwrite_full(base)
        tbl = LakeTable.load(spark, table_path, fs=fs)
        t0 = time.time()
        results = replay_log(tbl, log, num_epochs=args.epochs,
                             lsn_range=(0, args.events - 1), mode="mor",
                             lww_strategy="auto", pipeline=pipeline)
        wall = time.time() - t0
        fs_ops = len(fs.calls)  # ops inside the timed window only
        rows = tbl.read().count()
        leg = {
            "pipeline": pipeline,
            "wall_sec": round(wall, 2),
            "events_per_sec": round(args.events / wall, 1),
            "fs_ops": fs_ops,
            "injected_sec_total": round(fs_ops * delay, 1),
            "final_rows": rows,
            "epochs_applied": sum(0 if r.skipped else 1 for r in results),
        }
        print(json.dumps({"leg": tag, **leg}), flush=True)
        shutil.rmtree(table_path, ignore_errors=True)
        return leg

    # Warm-up leg (JIT/codegen) — small, discarded.
    warm_log = log.limit(50_000)
    warm_tbl = LakeTable.create(spark, os.path.join(args.workdir, "warm"),
                                schema=base.schema, key_col="doc_id",
                                num_buckets=8, overwrite=True)
    warm_tbl.overwrite_full(base.limit(20_000))
    replay_log(warm_tbl, warm_log, num_epochs=1, epoch_prefix="warm", mode="mor")

    legs = []
    for rep in range(args.reps):
        legs.append(run_leg(False, f"off_rep{rep}"))
        legs.append(run_leg(True, f"on_rep{rep}"))

    best_off = min(l["wall_sec"] for l in legs if not l["pipeline"])
    best_on = min(l["wall_sec"] for l in legs if l["pipeline"])
    print(json.dumps({
        "metric": "pipeline_latency_ab",
        "latency_ms": args.latency_ms,
        "events": args.events,
        "epochs": args.epochs,
        "cores": args.cores,
        "best_wall_off": best_off,
        "best_wall_on": best_on,
        "speedup": round(best_off / best_on, 3),
        "legs": legs,
    }), flush=True)
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
