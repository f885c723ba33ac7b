"""Per-file manifest statistics (Iceberg data-file stats analogue) and the
file-skipping point-lookup path they power.

Correctness contract under test: skipping may only drop files that provably
contain NONE of the wanted keys — any file holding any version of a wanted
key (tombstones included) has min_key <= key <= max_key and must be kept, so
lookup results are bit-identical with and without stats.
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.plans.maintenance import compact_buckets
from standardized_omop_data_etl_spark.plans.merge import merge_into
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable

N_DOCS = 400


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    base = base_sequences(spark, N_DOCS, seed=11, max_len=32)
    tbl = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("fstats") / "t"), schema=base.schema,
        key_col="doc_id", num_buckets=4, overwrite=True,
    )
    tbl.overwrite_full(base)
    return tbl


def test_overwrite_collects_footer_exact_stats(table):
    m = table.manifest()
    stats = m.get("file_stats", {})
    all_files = [f for fl in m["files"].values() for f in fl]
    assert all_files and set(stats) == set(all_files)
    # every entry matches the file's actual contents
    for rel, s in stats.items():
        pdf = pq.read_table(table.fs.join(table.path, rel),
                            columns=["doc_id", "_lsn"]).to_pandas()
        assert s["rows"] == len(pdf)
        assert s["min_key"] == pdf["doc_id"].min()
        assert s["max_key"] == pdf["doc_id"].max()
        assert s["min_lsn"] == int(pdf["_lsn"].min())
        assert s["max_lsn"] == int(pdf["_lsn"].max())


def test_sorted_compaction_splits_disjoint_and_lookup_prunes(spark, tmp_path):
    base = base_sequences(spark, N_DOCS, seed=12, max_len=16)
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=2, overwrite=True,
    )
    tbl.overwrite_full(base)
    compact_buckets(tbl, max_files_per_bucket=0, target_rows_per_file=40)
    m = tbl.manifest()
    stats = m["file_stats"]
    keys = [r[0] for r in tbl.read(columns=["doc_id"]).collect()]
    for b, fl in m["files"].items():
        assert len(fl) > 1, "target_rows_per_file should split each bucket"
        ranges = sorted((stats[f]["min_key"], stats[f]["max_key"]) for f in fl)
        for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
            assert hi < lo2, "key-sorted rolled files must be range-disjoint"
    # point lookup: at most one file PER BUCKET survives the skipper (ranges
    # are disjoint within a bucket; across buckets they overlap by design)
    probe = sorted(keys)[len(keys) // 2]
    subset = LakeTable._skip_files_by_key(m, None, [probe])
    for b, fl in m["files"].items():
        assert len([f for f in fl if f in subset]) <= 1, f"bucket {b} kept >1 file"
    assert 1 <= len(subset) <= len(m["files"])
    got = tbl.lookup([probe]).collect()
    assert len(got) == 1 and got[0]["doc_id"] == probe
    # a key below every range prunes everything yet returns cleanly
    nothing = LakeTable._skip_files_by_key(m, None, [""])
    assert nothing == set()
    assert tbl.lookup([""]).count() == 0


def test_statless_files_never_skipped_and_deletes_never_resurrect(spark, tmp_path):
    base = base_sequences(spark, 100, seed=13, max_len=16)
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=2, overwrite=True,
    )
    tbl.overwrite_full(base)
    compact_buckets(tbl, max_files_per_bucket=0, target_rows_per_file=20)
    victim = tbl.read(columns=["doc_id"]).orderBy("doc_id").first()["doc_id"]
    # merge a delete for a key the compacted (stats-bearing) files contain;
    # per-epoch merges do NOT stamp stats by default -> delta file statless
    ops = spark.createDataFrame(
        [(10_000, "delete", victim, None, None, "src")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    merge_into(tbl, ops, epoch="del", mode="mor")
    m = tbl.manifest()
    statless = [f for fl in m["files"].values() for f in fl if f not in m["file_stats"]]
    assert statless, "mor delta should be statless by default"
    assert set(LakeTable._skip_files_by_key(m, None, [victim])) >= set(statless)
    # the tombstone must win through the skipping lookup: no resurrection
    assert tbl.lookup([victim]).count() == 0
    # untouched compacted files keep their carried-forward stats
    assert m["file_stats"], "stats must carry forward across the merge commit"


def test_analyze_backfills_and_merge_optin_stamps(spark, tmp_path):
    base = base_sequences(spark, 100, seed=14, max_len=16)
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=2, overwrite=True,
    )
    tbl.overwrite_full(base)
    log = change_log(spark, 200, 100, seed=14, max_len=16)
    merge_into(tbl, log, epoch="e0")
    m = tbl.manifest()
    missing = [f for fl in m["files"].values() for f in fl if f not in m["file_stats"]]
    assert missing, "cow rewrite files should be statless by default"
    v = tbl.analyze()
    m2 = tbl.manifest()
    assert v == m2["version"]
    assert all(f in m2["file_stats"] for fl in m2["files"].values() for f in fl)
    assert tbl.analyze() == v, "analyze with nothing to do is a no-op"
    # opt-in property makes merges stamp stats inline
    tbl.commit({}, set(), properties_update={"write.file_stats.on_merge": True},
               summary={"operation": "set_properties"})
    log2 = change_log(spark, 100, 100, seed=15, max_len=16)
    merge_into(tbl, log2, epoch="e1")
    m3 = tbl.manifest()
    assert all(f in m3["file_stats"] for fl in m3["files"].values() for f in fl)


def test_lookup_equivalence_with_and_without_stats(spark, tmp_path):
    base = base_sequences(spark, 200, seed=16, max_len=16)
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=4, overwrite=True,
    )
    tbl.overwrite_full(base)
    compact_buckets(tbl, max_files_per_bucket=0, target_rows_per_file=17)
    keys = sorted(r[0] for r in tbl.read(columns=["doc_id"]).collect())
    probes = keys[::37] + ["zz_absent"]
    with_stats = sorted(map(tuple, tbl.lookup(probes).collect()))
    # unpruned ground truth: full-scan isin filter over the same snapshot
    full = sorted(
        map(tuple, tbl.read().filter(F.col("doc_id").isin(probes)).collect())
    )
    assert with_stats == full and len(full) == len(probes) - 1


def test_lookup_pushes_literal_in_predicate(table):
    """The point-lookup key list must reach the parquet scan as a pushed-down
    ``In`` predicate (row-group min/max + bloom pruning), not be held back
    behind a semi-join."""
    keys = [r[0] for r in table.read().select("doc_id").limit(3).collect()]
    plan = table.lookup(keys)._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert scan_lines, plan
    assert any("In(doc_id" in l for l in scan_lines), scan_lines
    assert "BroadcastHashJoin" not in plan  # no join for a literal key list


def test_lookup_of_deleted_key_returns_nothing(spark, tmp_path):
    """A tombstoned key must stay invisible through the pushed-down path —
    the In predicate keeps the tombstone row in-scan (it carries the key) and
    the visibility filter still removes it above."""
    base = base_sequences(spark, 50, seed=21, max_len=16)
    tbl = LakeTable.create(spark, str(tmp_path / "t"), schema=base.schema,
                           key_col="doc_id", num_buckets=2, overwrite=True)
    tbl.overwrite_full(base)
    victim = tbl.read().select("doc_id").limit(1).collect()[0][0]
    batch = spark.createDataFrame(
        [(10_000, "delete", victim, None, None, None)],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    merge_into(tbl, batch, epoch="del-1")
    assert tbl.lookup([victim]).count() == 0
    # ... but time travel to the pre-delete snapshot still finds it
    assert tbl.lookup([victim], version=1).count() == 1


def test_clustered_rewrites_write_key_bloom(spark, tmp_path):
    """Compaction/overwrite files carry a key bloom filter (footer grows);
    the table property turns it off."""
    import glob, os
    base = base_sequences(spark, 2000, seed=22, max_len=16)
    sizes = {}
    for name, props in [("on", None), ("off", {"write.parquet.bloom.key": False})]:
        tbl = LakeTable.create(spark, str(tmp_path / name), schema=base.schema,
                               key_col="doc_id", num_buckets=1, overwrite=True,
                               properties=props)
        tbl.overwrite_full(base)
        files = glob.glob(str(tmp_path / name) + "/data/*/_bucket=0/*.parquet")
        sizes[name] = sum(os.path.getsize(f) for f in files)
        assert tbl.lookup([tbl.read().select("doc_id").limit(1).collect()[0][0]]).count() == 1
    assert sizes["on"] > sizes["off"]


def test_target_rows_per_file_property_bounds_every_write(spark, tmp_path):
    """write.target_rows_per_file bounds files from EVERY writer (overwrite,
    cow merge rewrite, mor delta, compaction) and keeps results bit-identical
    to an unbounded table fed the same ops."""
    base = base_sequences(spark, N_DOCS, seed=12, max_len=32)
    log = change_log(spark, num_events=800, num_base_docs=N_DOCS, seed=13, max_len=32)
    cap = 60

    def build(path, props, mode):
        tbl = LakeTable.create(
            spark, path, schema=base.schema, key_col="doc_id", num_buckets=4,
            overwrite=True, properties=props,
        )
        tbl.overwrite_full(base)
        merge_into(tbl, log.filter(F.col("lsn") < 400), epoch="e0", mode=mode)
        merge_into(tbl, log.filter(F.col("lsn") >= 400), epoch="e1", mode=mode)
        compact_buckets(tbl, max_files_per_bucket=0)
        return tbl

    for mode in ("cow", "mor"):
        bounded = build(str(tmp_path / f"b_{mode}"),
                        {"write.target_rows_per_file": cap}, mode)
        free = build(str(tmp_path / f"f_{mode}"), None, mode)
        # every physical file ever committed in the CURRENT snapshot is capped
        m = bounded.manifest()
        for fl in m["files"].values():
            for rel in fl:
                n = pq.read_metadata(bounded.fs.join(bounded.path, rel)).num_rows
                assert n <= cap, (mode, rel, n)
        # same logical state as the unbounded table
        a = sorted(map(tuple, bounded.read().orderBy("doc_id").collect()))
        b = sorted(map(tuple, free.read().orderBy("doc_id").collect()))
        assert a == b, mode
        # rolled files stay disjoint sorted runs: point lookup plans few files
        k = bounded.read(columns=["doc_id"]).limit(1).collect()[0][0]
        assert bounded.lookup([k]).count() == 1
