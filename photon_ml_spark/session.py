"""SparkSession construction with scale-appropriate defaults.

Defaults mirror what we would set on a 1000-executor cluster reading
~100 TB: AQE on (runtime coalescing + skew-join handling), broadcast
threshold high enough to broadcast dimension tables, Arrow enabled for
every pandas-UDF exchange. Locally we test on ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "photon-ml-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured — on a real cluster the
    submitter sets the master and these local settings are inert.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
        # default; read as long nanos and convert at the source
        # (sources/datasets.load_events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # optional classpath extension — the spark-avro datasource (and any
    # other format jar) is a separate artifact from pyspark's bundled
    # jars. SPARK_GRAFT_JARS: comma-separated local jar paths ->
    # spark.jars; SPARK_GRAFT_PACKAGES: maven coordinates ->
    # spark.jars.packages (resolved at session start; needs network).
    # Recipe (README "Avro"): SPARK_GRAFT_JARS=/path/to/spark-avro_2.13-
    # <spark-version>.jar flips read_avro/write_avro from the pure-
    # Python OCF fallback to the JVM datasource.
    if os.environ.get("SPARK_GRAFT_JARS"):
        builder = builder.config("spark.jars", os.environ["SPARK_GRAFT_JARS"])
    if os.environ.get("SPARK_GRAFT_PACKAGES"):
        builder = builder.config(
            "spark.jars.packages", os.environ["SPARK_GRAFT_PACKAGES"]
        )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
