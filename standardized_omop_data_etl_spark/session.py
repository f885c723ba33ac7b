"""SparkSession factory with scale-appropriate defaults.

Defaults are tuned for correctness-at-scale first:

* AQE on (runtime partition coalescing + skew-join splitting);
* Arrow execution on (all pandas UDF / toPandas boundaries are vectorized);
* shuffle partitions sized by env (``SPARK_GRAFT_CPUS``) for local runs —
  a real cluster overrides via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "standardized-omop-data-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 if unset) so the
    same entry points work under the driver harness and under spark-submit
    (where ``--master`` wins and ``master=None`` must be passed).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None and "SPARK_GRAFT_MASTER" in os.environ:
        master = os.environ["SPARK_GRAFT_MASTER"]
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or max(cpus, 8)),
        # File scans target ≥2×cores splits even when FilePartition's 128 MB
        # packing would produce fewer: a replay epoch's scratch / narrow /
        # changed-bucket scans are ~64 medium files, and packing them into
        # `defaultParallelism` uneven splits leaves a one-wave stage whose
        # max-task straggler tail is pure serial time (r04l eventLog
        # decomposition). More, smaller splits pack the waves evenly; at
        # real-cluster file sizes the 128 MB cap still governs.
        "spark.sql.files.minPartitionNum": str(max(2 * cpus, 64)),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.compression.codec": "snappy",
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
