"""Point-lookup A/B — manifest file-skipping + pushed-down ``IN`` + key blooms.

A 10^10-row serving table answers "give me doc X's current tokens" constantly
(trainer cache misses, spot checks, debugging a bad sequence). The read cost
that matters is HOW MUCH of the table one key touches. Three legs over the
same logical data:

* head     — ``lookup()`` on a table with file stats + blooms (the default):
             bucket pruning -> manifest [min_key,max_key] file skipping ->
             literal ``IN`` pushed to parquet (row-group min/max + bloom).
* nostats  — same table built with ``write.file_stats=False`` and
             ``write.parquet.bloom.key=False``: bucket pruning only, every
             file of the key's bucket is opened (the pre-r4 path).
* fullscan — ``read()`` + ``isin`` filter with no bucket knowledge: what a
             plain parquet directory (no bucketed layout) would pay.

Each leg reports wall time (median over keys, after one JVM warm-up), files
planned per lookup, and bytes planned per lookup. Files/bytes come from the
executed scan's file list, so they measure what planning PRUNED; in-file
row-group pruning (stats leg vs bloom leg) shows up in wall time.

    spark-submit --master local[8] --py-files sodes.zip \
        bench/lookup_bench.py --docs 2000000 --buckets 64
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import time

from pyspark.sql import SparkSession, functions as F

from standardized_omop_data_etl_spark.plans.maintenance import compact_buckets
from standardized_omop_data_etl_spark.sources.generators import base_sequences
from standardized_omop_data_etl_spark.sources.lake import LakeTable


def build(spark, path: str, base, buckets: int, rows_per_file: int, props):
    shutil.rmtree(path, ignore_errors=True)
    tbl = LakeTable.create(
        spark, path, schema=base.schema, key_col="doc_id",
        num_buckets=buckets, overwrite=True, properties=props,
    )
    tbl.overwrite_full(base)
    # split each bucket into size-bounded key-sorted files so the manifest's
    # per-file key ranges have something to skip (a bucket == one file would
    # make file skipping vacuous)
    compact_buckets(tbl, max_files_per_bucket=0, target_rows_per_file=rows_per_file)
    return tbl


def probe(keys, fn):
    """fn(key) -> DataFrame. Returns (median_s, min_s, files, bytes)."""
    fn(keys[0]).collect()  # warm the JVM/code paths once, unmeasured
    walls, files, nbytes = [], [], []
    for k in keys:
        df = fn(k)
        t0 = time.perf_counter()
        rows = df.collect()
        walls.append(time.perf_counter() - t0)
        assert len(rows) == 1, (k, len(rows))
        fl = df.inputFiles()
        files.append(len(fl))
        nbytes.append(sum(os.path.getsize(f.removeprefix("file:")) for f in fl))
    return (
        statistics.median(walls), min(walls),
        statistics.median(files), statistics.median(nbytes),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--rows-per-file", type=int, default=4_000)
    ap.add_argument("--probes", type=int, default=12)
    ap.add_argument("--dir", default="/tmp/sodes_lookup_bench")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = base_sequences(spark, args.docs, seed=5, max_len=32)

    t_head = build(spark, f"{args.dir}/head", base, args.buckets,
                   args.rows_per_file, None)
    t_nost = build(spark, f"{args.dir}/nostats", base, args.buckets,
                   args.rows_per_file,
                   {"write.file_stats": False, "write.parquet.bloom.key": False})

    # deterministic probe keys spread across the key space (crc32 residue
    # picks ~probes keys scattered over every bucket, no full sort)
    step = max(args.docs // args.probes, 1)
    keys = [r[0] for r in
            base.select("doc_id")
                .where(F.pmod(F.crc32(F.col("doc_id")), F.lit(step)) == 7)
                .limit(args.probes).collect()]

    legs = {
        "head": lambda k: t_head.lookup([k]),
        "nostats": lambda k: t_nost.lookup([k]),
        "fullscan": lambda k: t_head.read().where(F.col("doc_id").isin([k])),
    }
    out = {"docs": args.docs, "buckets": args.buckets,
           "rows_per_file": args.rows_per_file, "probes": len(keys), "legs": {}}
    for name, fn in legs.items():
        med, mn, f_med, b_med = probe(keys, fn)
        out["legs"][name] = {
            "median_s": round(med, 4), "min_s": round(mn, 4),
            "files_planned": f_med, "bytes_planned": int(b_med),
        }
    h, n, fs = (out["legs"][x] for x in ("head", "nostats", "fullscan"))
    out["files_cut_vs_nostats"] = round(n["files_planned"] / max(h["files_planned"], 1), 1)
    out["files_cut_vs_fullscan"] = round(fs["files_planned"] / max(h["files_planned"], 1), 1)
    print(json.dumps(out))
    shutil.rmtree(args.dir, ignore_errors=True)


if __name__ == "__main__":
    main()
