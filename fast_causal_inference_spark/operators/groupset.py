"""GroupSet — one-pass (count, sum, sum²) per treatment × column × value.

Parity target: reference ``group_set.h:45-281`` / CH ``GroupSet.cpp:55`` —
the binned sufficient statistics that drive CausalTree split search.

Spark-first: melt the candidate columns with an inline explode (stack) so one
``groupBy(column, value, treatment)`` covers every (column, value) cell in a
single pass with map-side combine. No pivot, no per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_set(df: DataFrame, y: str, treatment: str,
              group_cols: list[str]) -> DataFrame:
    """Returns (column, value, treatment, cnt, sum, sum2) for every distinct
    value of every listed column."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    ycol = F.expr(y).cast("double")
    t = F.col(treatment) if treatment.isidentifier() else F.expr(treatment)
    pairs = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in group_cols
    ])
    melted = (df.select(t.alias("treatment"), ycol.alias("__y"),
                        F.explode(pairs).alias("kv"))
                .select("treatment", "__y", "kv.column", "kv.value"))
    return (melted.groupBy("column", "value", "treatment")
            .agg(F.count("__y").alias("cnt"),
                 F.sum("__y").alias("sum"),
                 F.sum(F.col("__y") * F.col("__y")).alias("sum2")))
