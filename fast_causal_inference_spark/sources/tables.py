"""Typed loaders for the benchmark/test parquet tables.

The synthetic testdata (TESTDATA.md) writes parquet TIMESTAMP(NANOS) columns,
which Spark 4 rejects unless ``spark.sql.legacy.parquet.nanosAsLong=true`` is
set — and then surfaces them as raw nanosecond longs. This loader inspects the
parquet footer (driver-side metadata read only — no data scan) and restores
proper ``timestamp`` columns via ``timestamp_micros(ns div 1000)``, matching
DuckDB's microsecond timestamps for oracle parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as timestamp[ns] in the parquet footer."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        # directory-style parquet: inspect the first fragment
        import glob

        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return []
        schema = pq.read_schema(parts[0])
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with timestamps restored."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _nano_ts_columns(path):
        # INTEGER division: `/ 1000` casts the ns long (~1.8e18 for 2026
        # dates) to double whose ulp is 256 ns, so the truncated-µs value
        # could land 1 µs off the exact ns div 1000 the DuckDB oracle
        # computes
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load several tables; also registers each as a temp view."""
    out = {}
    for n in names:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
