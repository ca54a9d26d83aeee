"""SparkSession helpers tuned for the engine's workload.

The reference delegates execution to a vectorized OLAP cluster; here Catalyst +
Tungsten play that role. These defaults matter at 100 TB: AQE re-plans skewed
shuffles at runtime, Arrow keeps the (rare) pandas-UDF finalizers cheap, and
partial aggregation of our sufficient-statistics columns is what replaces the
reference UDAFs' update/merge/serialize cycle (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # the synthetic testdata writes TIMESTAMP(NANOS) parquet, which Spark
    # refuses by default; read as long and restore via sources.tables
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # co-locate shuffle sizing with the local test harness; a real cluster
    # would override via spark-defaults.conf
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.maxResultSize": "4g",
}


def configure_session(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine defaults to an existing builder."""
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    return builder


def get_session(app_name: str = "fast_causal_inference_spark",
                master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        builder = builder.master(f"local[{cpus}]" if cpus else "local[*]")
    return configure_session(builder).getOrCreate()
