"""Materialized-view maintenance cost: incremental refresh vs re-aggregate.

The alternative to ``plans/mv.py`` is the reference's model — recompute the
aggregate from the whole table every time it must be fresh
(``combine_subtables.py:61-124`` generalized to analytics). This harness
applies one more epoch to a replayed table and times:

* ``refresh``   — ``refresh_view``: feed deltas (before-images, column-pruned
  to key/lsn/deleted/group/sum — plan-asserted in tests/test_mv.py) + a
  touched-groups MERGE into the view table;
* ``recompute`` — ``bootstrap_agg`` over the full table + overwrite of the
  view (what a cron'd CREATE-OR-REPLACE does).

Two regimes, as with the change feed: ``uniform`` (epoch touches every
bucket — refresh still reads only narrow columns of touched buckets, twice)
and ``local`` (epoch confined to a bucket subset — refresh cost tracks the
change locality while recompute stays O(table)).

    spark-submit --master local[8] --py-files /tmp/sodes.zip \
        bench/mv_bench.py --docs 1000000 --epoch-events 200000

Prints one JSON line per regime.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

from pyspark.sql import SparkSession, functions as F

from standardized_omop_data_etl_spark.plans.mv import (
    MV_KEY_COL,
    _mv_key,
    bootstrap_agg,
    materialize_view,
    refresh_view,
)
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import (
    base_sequences,
    change_log,
)
from standardized_omop_data_etl_spark.sources.lake import LakeTable, bucket_expr

GROUP, SUMS = ["source"], ["n_tok"]


def run_regime(spark, args, workdir: str, local: bool) -> dict:
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    base = base_sequences(spark, args.docs, seed=args.seed, partitions=64)
    log = change_log(
        spark, args.epoch_events * 2, args.docs, seed=args.seed, partitions=64
    )
    if local:
        last_lo = args.epoch_events
        in_subset = bucket_expr("doc_id", args.buckets) < F.lit(args.local_buckets)
        log = log.filter((F.col("lsn") < last_lo) | in_subset)
    log.write.mode("overwrite").parquet(os.path.join(workdir, "log.parquet"))
    log = spark.read.parquet(os.path.join(workdir, "log.parquet"))

    tbl = LakeTable.create(
        spark, os.path.join(workdir, "table"), schema=base.schema,
        key_col="doc_id", num_buckets=args.buckets, overwrite=True,
    )
    tbl.overwrite_full(base)
    # warm epoch applied BEFORE subscribing, so the timed refresh sees
    # exactly one epoch of changes
    # mode="auto" is the deployed configuration: it picks merge-on-read for
    # routine epochs on large tables, which ALSO makes the refresh's feed
    # range winner-only — the precondition for the feed's batch-keyed
    # pruning (plans/change_feed.py). Earlier r4 rows in BENCH/BASELINE.md
    # predate this and ran the delta epoch as cow.
    replay_log(
        tbl, log.filter(F.col("lsn") < args.epoch_events),
        num_epochs=1, epoch_prefix="warm", mode="auto",
    )
    view, consumer = materialize_view(
        spark, os.path.join(workdir, "view"), tbl, GROUP, SUMS, name="bench"
    )
    replay_log(
        tbl, log.filter(F.col("lsn") >= args.epoch_events),
        num_epochs=1, epoch_prefix="delta", mode="auto",
    )

    t0 = time.time()
    applied = refresh_view(view, consumer, GROUP, SUMS)
    refresh_sec = time.time() - t0

    # the fair recompute also PERSISTS the result (a cron'd
    # CREATE-OR-REPLACE rewrites the view table, it doesn't just count)
    view2 = LakeTable.create(
        spark, os.path.join(workdir, "view2"), schema=view.schema(),
        key_col=MV_KEY_COL, num_buckets=4, overwrite=True,
    )
    t0 = time.time()
    snap = bootstrap_agg(tbl.read(), GROUP, SUMS).withColumn(
        MV_KEY_COL, _mv_key(GROUP)
    )
    view2.overwrite_full(snap)
    recompute_sec = time.time() - t0
    recompute_rows = view2.read().count()

    # exactness cross-check: the refreshed view == the recompute
    got = view.read().drop(MV_KEY_COL)
    want = bootstrap_agg(tbl.read(), GROUP, SUMS)
    mismatch = got.exceptAll(want).count() + want.exceptAll(got).count()

    shutil.rmtree(workdir, ignore_errors=True)
    return {
        "metric": "mv_refresh_sec",
        "regime": "local" if local else "uniform",
        "docs": args.docs,
        "epoch_events": args.epoch_events,
        "buckets": args.buckets,
        "local_buckets": args.local_buckets if local else args.buckets,
        "epochs_applied": len(applied),
        "groups": recompute_rows,
        "refresh_sec": round(refresh_sec, 3),
        "recompute_sec": round(recompute_sec, 3),
        "recompute_over_refresh": round(recompute_sec / max(refresh_sec, 1e-9), 2),
        "mismatch_rows": mismatch,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--epoch-events", type=int, default=200_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--local-buckets", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/mv_bench")
    ap.add_argument("--regimes", default="uniform,local")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for regime in args.regimes.split(","):
        r = run_regime(spark, args, args.workdir, local=(regime == "local"))
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
