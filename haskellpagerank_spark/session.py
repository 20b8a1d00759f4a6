"""SparkSession factory with scale-aware defaults.

Local sandbox runs on ``local[N]`` (single JVM); production runs via
``spark-submit --py-files`` on a multi-executor cluster. The knobs below are
the ones that matter at both scales:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  web link graphs have 1e6-degree hubs, AQE's skew handling is load-bearing.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  pass ``shuffle_partitions ~ 2-3x total cores``.
- Arrow enabled: every Python-side kernel in this engine is Arrow-batched
  (``mapInArrow`` / ``applyInPandas``), never per-row Python.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "haskellpagerank_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` honours $SPARK_GRAFT_CPUS (driver contract), falling back
    to all machine cores. An existing active session is reused as-is.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    n = cores or default_parallelism()
    sp = shuffle_partitions or n
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
