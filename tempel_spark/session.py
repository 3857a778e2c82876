"""SparkSession factory tuned for the ER pipeline.

The reference hand-tunes reader/processor/writer process counts
(reference: README.md:71-76, s01_wikipedia_clean_and_tokenize.py:575-581);
here the equivalent knobs are executor cores + shuffle partitions + AQE.

Local mode (`local[N]`) is the sandbox stand-in for a multi-executor
cluster; every setting below is also the right default for a real
cluster run via `spark-submit --py-files` (BASELINE.json north_rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_CONF"]

# AQE handles runtime re-planning (skew-join splitting, partition
# coalescing); Arrow makes every pandas UDF batch-vectorized — the
# "no per-row Python" mandate of BASELINE.json input_hint.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.ui.enabled": "false",
    "spark.driver.extraJavaOptions": "-Duser.timezone=UTC",
    "spark.executor.extraJavaOptions": "-Duser.timezone=UTC",
    # ANSI off: reference semantics are permissive (bad casts -> null,
    # e.g. sentinel -1 page ids, s02_alias_table_generator.py:321-323).
    "spark.sql.ansi.enabled": "false",
}


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "tempel_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract).
    ``shuffle_partitions`` defaults to 2×cores — small enough that
    sf0.1 partitions stay cache-resident, large enough that AQE can
    split skewed ones; on a real cluster this is set to
    ~2-3× total executor cores instead.
    """
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * n))
        .config("spark.driver.memory", driver_memory or os.environ.get("TEMPEL_DRIVER_MEM", "24g"))
        .config("spark.default.parallelism", str(2 * n))
    )
    for k, v in DEFAULT_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
