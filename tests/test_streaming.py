"""Structured-Streaming changelog tail: stream == batch replay semantics."""

import os
import time

import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import canonicalize, expected_final_state
from standardized_omop_data_etl_spark.streaming.changelog import stream_changelog


@pytest.mark.timeout(300)
def test_stream_matches_oracle(spark, tmp_path):
    base = base_sequences(spark, 200, seed=11, max_len=32)
    log = change_log(spark, 600, 200, seed=11, max_len=32)
    base_pdf, log_pdf = base.toPandas(), log.toPandas()

    # binlog dir: three "segments" arriving as files
    log_dir = str(tmp_path / "binlog")
    os.makedirs(log_dir)
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 600)]):
        log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)).coalesce(1).write.parquet(
            f"{log_dir}/seg{i}.parquet"
        )

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=4, overwrite=True,
    )
    tbl.overwrite_full(base)

    q = stream_changelog(
        spark, tbl, log_dir + "/*", str(tmp_path / "ckpt"), trigger_once=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(240)

    got = canonicalize(tbl.read().toPandas())
    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    assert len(got) == len(exp)
    assert got.equals(exp), "stream-applied state != oracle"

    # restart the stream with the same checkpoint: no new data → no change
    v = tbl.current_version()
    q2 = stream_changelog(
        spark, tbl, log_dir + "/*", str(tmp_path / "ckpt"), trigger_once=True
    )
    q2.awaitTermination(120)
    assert tbl.current_version() == v
