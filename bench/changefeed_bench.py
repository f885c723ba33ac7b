"""Change-data-feed cost evidence: feed reads track CHANGE volume, not table
size (plans/change_feed.py's bucket-pruning + 3-column before-probe claim).

Builds a table of --docs rows, applies --epochs MERGE epochs of
--epoch-events each, then times with payload materialization forced
(xxhash64 over tokens, so column pruning can't fake the win):

* ``feed_last``  — read_changes over the LAST epoch only (the steady-state
  consumer cost);
* ``feed_full``  — read_changes over the whole applied range;
* ``full_scan``  — reading the whole table (what a consumer without a feed
  pays per poll — the reference's model: every run re-processes everything,
  ``combine_subtables.py:61-124``).

Run at two --docs scales with the SAME --epoch-events: feed_last should stay
~flat while full_scan grows with the table.

    spark-submit --master local[8] --py-files /tmp/sodes.zip \
        bench/changefeed_bench.py --docs 1000000 --epoch-events 200000

Prints one JSON line.
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
from standardized_omop_data_etl_spark.sources.lake import LakeTable


def consume(df) -> tuple[int, float]:
    """(rows, wall_sec) with payloads actually read (hash-reduced), so the
    measurement can't be won by pruning every column the consumer needs."""
    t0 = time.time()
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_id", "n_tok")).alias("h"),
    ).collect()[0]
    return int(r["n"]), time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--epoch-events", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/cf_bench")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)
    base = base_sequences(spark, args.docs, seed=args.seed, partitions=64)
    log = change_log(
        spark,
        args.epoch_events * args.epochs,
        args.docs,
        seed=args.seed,
        partitions=64,
    )
    log.write.parquet(os.path.join(args.workdir, "log.parquet"))
    log = spark.read.parquet(os.path.join(args.workdir, "log.parquet"))

    tbl = LakeTable.create(
        spark,
        os.path.join(args.workdir, "table"),
        schema=base.schema,
        key_col="doc_id",
        num_buckets=args.buckets,
        overwrite=True,
    )
    tbl.overwrite_full(base)
    v0 = tbl.current_version()
    replay_log(tbl, log, num_epochs=args.epochs, epoch_prefix="cf")
    v_hi = tbl.current_version()

    # warm-up: JIT + page cache on the same plan shapes, untimed
    consume(read_changes(tbl, v_hi - 1, v_hi).drop("_change_op", "_change_lsn"))
    consume(tbl.read())

    feed_last_rows, feed_last_sec = consume(
        read_changes(tbl, v_hi - 1, v_hi).drop("_change_op", "_change_lsn")
    )
    feed_full_rows, feed_full_sec = consume(
        read_changes(tbl, v0, v_hi).drop("_change_op", "_change_lsn")
    )
    scan_rows, scan_sec = consume(tbl.read())

    print(
        json.dumps(
            {
                "metric": "changefeed_read_sec",
                "docs": args.docs,
                "epoch_events": args.epoch_events,
                "epochs": args.epochs,
                "table_rows": scan_rows,
                "feed_last_rows": feed_last_rows,
                "feed_last_sec": round(feed_last_sec, 3),
                "feed_full_rows": feed_full_rows,
                "feed_full_sec": round(feed_full_sec, 3),
                "full_scan_sec": round(scan_sec, 3),
                "scan_over_feed_last": round(scan_sec / max(feed_last_sec, 1e-9), 2),
            }
        )
    )
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
