"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "voluptuous_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a session.

    Defaults chosen for the validation workload:
    - AQE on (runtime shuffle coalescing + skew-join splitting — the codec
      column is intentionally skewed, FIXTURES.md F1);
    - Arrow enabled for the pandas-UDF PCM validators, with a bounded batch
      size so binary audio payloads don't blow executor memory;
    - shuffle partitions sized to cores locally (cluster deployments
      override via spark.sql.shuffle.partitions / AQE coalescing).
    """
    master = master or os.environ.get("SPARK_MASTER", None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    elif not SparkSession.getActiveSession():
        b = b.master(f"local[{cpus}]")
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
    }
    conf.update(extra_conf or {})
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
