"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every config below is chosen for the
1000-executor / 100 TB case and is safe (or strictly better) locally too:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
- Arrow on: the embedding pandas UDF moves columnar batches, not rows.
- ``spark.sql.shuffle.partitions`` is a *starting* value; AQE coalesces it
  down locally and scales it up via ``advisoryPartitionSizeInBytes`` on a
  real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "whatsapp-vectordb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); read as long and
        # convert with integer DIV (see harness._events) for exactness
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # session-creation-time overrides (e.g. the stress tools re-enable the
    # UI so its REST API can report per-stage shuffle bytes); ignored if a
    # session already exists in the process, like every .config above
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
