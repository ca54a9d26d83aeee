"""Multiple-testing p-value adjustment: Bonferroni, Holm, Benjamini-
Hochberg — the companion to ``ttests_2samp`` (many metrics per
experiment) and grouped drill-downs (many cells per report).

Driver-side by design: the input is a RESULT relation (one row per
test), which is O(#metrics · #cells) — thousands, not billions.  A Spark
DataFrame input is collected through a hard cap; pandas passes through.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["adjust_pvalues"]

_MAX_TESTS = 1_000_000


def adjust_pvalues(results, p_col: str = "p_value",
                   method: str = "bh",
                   out_col: str | None = None):
    """Return the input with an adjusted-p column appended.

    ``method``: 'bonferroni' (p·m, capped), 'holm' (step-down), or 'bh'
    (Benjamini-Hochberg step-up FDR — q-values).  NaN p-values stay NaN
    and do not count toward m.  Input may be a pandas or Spark
    DataFrame; output matches the input kind (Spark input is collected —
    result relations are small by construction, capped at 1e6 rows).
    """
    out_col = out_col or f"{p_col}_{method}"
    is_spark = isinstance(results, DataFrame)
    if is_spark:
        pdf = results.limit(_MAX_TESTS + 1).toPandas()
        if len(pdf) > _MAX_TESTS:
            raise ValueError(
                f"adjust_pvalues caps at {_MAX_TESTS} tests; aggregate "
                f"first — adjusting more tests than that is almost "
                f"certainly a result-relation mistake")
    else:
        pdf = results.copy()
    if method not in ("bonferroni", "holm", "bh"):
        # validate BEFORE the m>0 gate: an empty/all-NaN input would
        # otherwise silently accept a typo'd method name
        raise ValueError("method must be bonferroni|holm|bh")
    p = pdf[p_col].to_numpy(dtype=float)
    ok = ~np.isnan(p)
    m = int(ok.sum())
    adj = np.full_like(p, np.nan)
    if m:
        pv = p[ok]
        if method == "bonferroni":
            adj[ok] = np.minimum(pv * m, 1.0)
        elif method == "holm":
            order = np.argsort(pv)
            ranked = pv[order] * (m - np.arange(m))
            ranked = np.maximum.accumulate(ranked)       # step-down monotone
            out = np.empty(m)
            out[order] = np.minimum(ranked, 1.0)
            adj[ok] = out
        elif method == "bh":
            order = np.argsort(pv)
            ranked = pv[order] * m / (np.arange(m) + 1)
            ranked = np.minimum.accumulate(ranked[::-1])[::-1]  # step-up
            out = np.empty(m)
            out[order] = np.minimum(ranked, 1.0)
            adj[ok] = out
    pdf[out_col] = adj
    if is_spark:
        from pyspark.sql.types import DoubleType, StructField, StructType

        # explicit schema: an EMPTY result would otherwise infer
        # NullType columns (Arrow) or fail inference (fallback)
        schema = StructType(list(results.schema.fields)
                            + [StructField(out_col, DoubleType(), True)])
        # toPandas widens nullable integral columns to float64/NaN;
        # feeding those floats back under the original LongType crashes
        # — restore pandas nullable integer dtypes first (NaN -> <NA>)
        for f in results.schema.fields:
            if (f.dataType.typeName() in ("long", "integer", "short",
                                          "byte")
                    and pdf[f.name].dtype.kind == "f"):
                pdf[f.name] = pdf[f.name].astype("Int64")
        return results.sparkSession.createDataFrame(pdf, schema)
    return pdf
