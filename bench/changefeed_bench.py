"""Change-data-feed cost evidence: what `read_changes` actually buys.

A consumer that wants "rows changed between v_from and v_to" has exactly two
alternatives on a lake table with no write-side changelog:

* ``naive_diff``   — read BOTH snapshots full-width and join them on the key
  (what you'd hand-write without the feed); O(2 × table payload) + a wide
  join, always, regardless of change volume.
* ``full_scan``    — give up on deltas and re-read everything (the
  reference's model: every run re-processes every subtable,
  ``combine_subtables.py:61-124``); O(table) per poll and the consumer must
  be idempotent over unchanged rows.

``read_changes`` (plans/change_feed.py) narrows both axes: the before side is
a 3-column (key, lsn, deleted) probe instead of a full payload, and manifest
bucket pruning drops every bucket whose file list didn't change. The second
axis only bites when an epoch's keys are bucket-local — a uniform 200k-key
epoch touches all 64 buckets and prunes nothing — so this harness measures
two regimes:

* uniform  — last epoch spread over all buckets (pruning inert; the win is
  the narrow before side vs naive_diff's full-width join);
* local    — last epoch restricted to keys hashing into ``--local-buckets``
  of the ``--buckets`` (hot-shard / backfill shape; pruning drops the rest).

Payload consumption is forced (xxhash64 over the tokens array) so no
measurement can be won by pruning the columns the consumer needs.

    spark-submit --master local[8] --py-files /tmp/sodes.zip \
        bench/changefeed_bench.py --docs 1000000 --epoch-events 200000

Prints one JSON line per regime.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

from pyspark.sql import SparkSession, functions as F

from standardized_omop_data_etl_spark.plans.change_feed import read_changes
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import (
    base_sequences,
    change_log,
)
from standardized_omop_data_etl_spark.sources.lake import LakeTable, bucket_expr


def consume(df) -> tuple[int, float]:
    """(rows, wall_sec) with payloads actually read: the hash covers the
    tokens array, so column pruning can't fake any leg's win."""
    t0 = time.time()
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        # mod a prime before summing: raw xxhash64 sums overflow ANSI long
        F.sum(
            F.pmod(F.xxhash64("doc_id", "n_tok", "tokens"), F.lit(2_147_483_647))
        ).alias("h"),
    ).collect()[0]
    return int(r["n"]), time.time() - t0


def naive_diff(tbl: LakeTable, v_from: int, v_to: int):
    """The hand-written alternative: full-width read of both snapshots,
    full outer join on the key, keep rows whose payload hash differs."""
    a = tbl.read(version=v_to)
    b = tbl.read(version=v_from)
    cols = sorted(a.columns)
    h = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(2_147_483_647))
    j = a.withColumn("_ah", h).join(
        b.withColumn("_bh", h).select("doc_id", "_bh"), "doc_id", "full"
    )
    return j.filter(
        F.col("_ah").isNull() | F.col("_bh").isNull() | (F.col("_ah") != F.col("_bh"))
    ).select(a.columns)


def run_regime(spark, args, workdir: str, local: bool) -> dict:
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    base = base_sequences(spark, args.docs, seed=args.seed, partitions=64)
    log = change_log(
        spark,
        args.epoch_events * (args.epochs + 1),
        args.docs,
        seed=args.seed,
        partitions=64,
    )
    if local:
        # last epoch's keys restricted to a bucket subset: the hot-shard /
        # backfill shape where manifest pruning has something to prune
        last_lo = args.epoch_events * args.epochs
        in_subset = (
            bucket_expr("doc_id", args.buckets) < F.lit(args.local_buckets)
        )
        log = log.filter((F.col("lsn") < last_lo) | in_subset)
    log.write.mode("overwrite").parquet(os.path.join(workdir, "log.parquet"))
    log = spark.read.parquet(os.path.join(workdir, "log.parquet"))

    tbl = LakeTable.create(
        spark,
        os.path.join(workdir, "table"),
        schema=base.schema,
        key_col="doc_id",
        num_buckets=args.buckets,
        overwrite=True,
    )
    tbl.overwrite_full(base)
    # epoch boundaries by LSN so the "last epoch" is exactly the local one
    for e in range(args.epochs + 1):
        lo, hi = e * args.epoch_events, (e + 1) * args.epoch_events
        batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        replay_log(tbl, batch, num_epochs=1, epoch_prefix=f"cf{e}")
    v_hi = tbl.current_version()

    # warm-up: JIT + page cache on the same plan shapes, untimed
    consume(read_changes(tbl, v_hi - 1, v_hi).drop("_change_op", "_change_lsn"))
    consume(tbl.read())

    feed_rows, feed_sec = consume(
        read_changes(tbl, v_hi - 1, v_hi).drop("_change_op", "_change_lsn")
    )
    diff_rows, diff_sec = consume(naive_diff(tbl, v_hi - 1, v_hi))
    scan_rows, scan_sec = consume(tbl.read())
    shutil.rmtree(workdir, ignore_errors=True)
    return {
        "metric": "changefeed_read_sec",
        "regime": "local" if local else "uniform",
        "docs": args.docs,
        "epoch_events": args.epoch_events,
        "buckets": args.buckets,
        "local_buckets": args.local_buckets if local else args.buckets,
        "table_rows": scan_rows,
        "feed_rows": feed_rows,
        "feed_sec": round(feed_sec, 3),
        "naive_diff_rows": diff_rows,
        "naive_diff_sec": round(diff_sec, 3),
        "full_scan_sec": round(scan_sec, 3),
        "diff_over_feed": round(diff_sec / max(feed_sec, 1e-9), 2),
        "scan_over_feed": round(scan_sec / max(feed_sec, 1e-9), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--epoch-events", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--local-buckets", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/cf_bench")
    ap.add_argument("--regimes", default="uniform,local")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for regime in args.regimes.split(","):
        r = run_regime(spark, args, args.workdir, local=(regime == "local"))
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
