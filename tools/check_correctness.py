"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` at sf0.01 via Spark AND the matching
``oracle_sql()[name]`` via DuckDB (tables pre-registered as views), compares
row count, column-name set, and an order-insensitive value hash (columns
sorted by name, rows sorted, values normalized). Exit 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from standardized_omop_data_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")


def norm_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if hasattr(v, "tolist"):  # numpy array / scalar
        t = v.tolist()
        return norm_value(t)
    return str(v)


def table_hash(pdf) -> tuple[int, str]:
    cols = sorted(pdf.columns)
    rows = [
        "|".join(norm_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows, cols={sorted(spdf.columns)} "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        sn, sh = table_hash(spdf)
        on, oh = table_hash(opdf)
        scols, ocols = sorted(spdf.columns), sorted(opdf.columns)
        ok = (sn == on) and (sh == oh) and (scols == ocols)
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name}: spark {sn} rows [{sh}] vs oracle {on} rows [{oh}] "
              f"({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
            if scols != ocols:
                print(f"     cols spark={scols} oracle={ocols}")
            elif sn == on:
                # show first differing row for debugging
                srows = sorted(
                    "|".join(norm_value(v) for v in r)
                    for r in spdf[scols].itertuples(index=False, name=None)
                )
                orows = sorted(
                    "|".join(norm_value(v) for v in r)
                    for r in opdf[ocols].itertuples(index=False, name=None)
                )
                for a, b in zip(srows, orows):
                    if a != b:
                        print(f"     spark : {a[:220]}")
                        print(f"     oracle: {b[:220]}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
