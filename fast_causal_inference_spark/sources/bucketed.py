"""Bucketed tables — pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
by the join key.  Spark's bucketed tables pay that shuffle ONCE at write
time: `bucketBy(n, keys)` hashes rows into a fixed number of buckets per
partition file, and a join between two tables bucketed the same way
plans with ZERO exchanges (plan-audited in tests/test_plans.py).

Helpers here wrap the two sharp edges: bucketed writes only work through
``saveAsTable`` (not path-based ``save``), and both sides must agree on
bucket count and keys for the exchange elimination to fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "is_bucketed"]


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str] | str,
                   num_buckets: int = 64,
                   sort_cols: list[str] | str | None = None,
                   mode: str = "overwrite",
                   format: str = "parquet") -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations keyed on ``bucket_cols`` against OTHER tables
    bucketed with the SAME ``num_buckets`` skip their exchange entirely;
    ``sort_cols`` additionally lets sort-merge joins skip the sort.
    Pick ``num_buckets`` so one bucket ≈ 100–500 MB at target scale."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format(format) \
        .bucketBy(num_buckets, cols[0], *cols[1:])
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(sc[0], *sc[1:])
    w.saveAsTable(table)


def is_bucketed(spark: SparkSession, table: str) -> dict | None:
    """Bucket spec of a table ({'num_buckets', 'bucket_cols'}) or None."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return None
    cols = info.get("Bucket Columns", "").strip("[]` ")
    return {"num_buckets": int(info["Num Buckets"]),
            "bucket_cols": [c.strip(" `") for c in cols.split(",")
                            if c.strip()]}
