"""SparkSession factory with scale-oriented defaults.

The reference adapts to host resources imperatively (``src/config.py:136-164``);
here the equivalents are declarative Spark confs: AQE for runtime re-planning
(size-adaptive joins, skew splitting — replaces the reference's 10k/1M cardinality
routing in ``src/database/postgres.py:213-223,386-395``), Arrow for the one
Python-land operator (the grouped merge kernel), UTC session time for deterministic
timestamp round-trips.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cnpj-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # AQE: runtime broadcast-threshold + skew-join splitting (free replacements
        # for the reference's size-based strategy routing).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow batches across the Python boundary (applyInPandas / pandas_udf);
        # never per-row pickling.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        # Timestamps are tz-naive UTC end-to-end (deterministic replay).
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.ui.enabled": "false",
        # local[K] runs executors inside the driver JVM; size the heap so the
        # shuffle of a full bench epoch never GC-thrashes (the sandbox has
        # 128 GiB; on a real cluster this is spark.executor.memory instead).
        # -Xms pre-commits the heap: lazy heap growth made the first big
        # shuffle 2-3x slower than steady state in measurements.
        "spark.driver.memory": "24g",
        "spark.driver.extraJavaOptions": "-Xms24g -XX:+AlwaysPreTouch",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
