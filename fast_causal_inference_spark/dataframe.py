"""CausalDataFrame — the user-facing lazy DataFrame facade.

Mirrors the reference's client API surface (``dataframe/dataframe.py`` under
/root/reference: select/filter/withColumn/join/groupBy/agg plus statistical
methods) but wraps a *native* ``pyspark.sql.DataFrame`` — every relational verb
delegates straight to Spark so Catalyst owns optimization; only the statistical
verbs add behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class CausalDataFrame:
    """Thin statistical facade over a native Spark DataFrame.

    Unknown attributes delegate to the wrapped DataFrame; methods that would
    return a DataFrame are re-wrapped, so relational chaining stays fluent:
    ``cdf.filter("x > 0").groupBy("g")`` works as in vanilla PySpark.
    """

    def __init__(self, df: DataFrame):
        self._df = df

    # -- interop --------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def toSparkDf(self) -> DataFrame:
        return self._df

    def toPandas(self):
        return self._df.toPandas()

    def __getattr__(self, name):
        attr = getattr(self._df, name)
        if callable(attr):
            def wrapper(*args, **kwargs):
                out = attr(*args, **kwargs)
                return CausalDataFrame(out) if isinstance(out, DataFrame) else out
            return wrapper
        return attr

    def __repr__(self):
        return f"CausalDataFrame({self._df})"

    # -- statistical verbs ---------------------------------------------
    def delta_method(self, expr: str, std: bool = True, group_cols=None):
        from fast_causal_inference_spark.operators.deltamethod import delta_method
        return delta_method(self._df, expr, std=std, group_cols=group_cols)

    def ttest_1samp(self, Y: str, alternative: str = "two-sided", mu: float = 0.0,
                    X: str | None = None, alpha: float = 0.05, group_cols=None):
        from fast_causal_inference_spark.operators.ttest import ttest_1samp
        return ttest_1samp(self._df, Y, alternative, mu, X, alpha, group_cols)

    def ttest_2samp(self, Y: str, index: str, alternative: str = "two-sided",
                    X: str | None = None, alpha: float = 0.05,
                    treatment_values=(0, 1), group_cols=None,
                    pse: str | None = None):
        from fast_causal_inference_spark.operators.ttest import ttest_2samp
        return ttest_2samp(self._df, Y, index, alternative, X, alpha,
                           treatment_values, group_cols, pse)

    def srm(self, x: str, groupby: str, ratio=None):
        from fast_causal_inference_spark.operators.srm import srm
        return srm(self._df, x, groupby, ratio)

    def ols(self, formula: str, use_bias: bool = True):
        from fast_causal_inference_spark.operators.ols import ols
        return ols(self._df, formula, use_bias=use_bias)

    def describe(self, cols=None):
        from pyspark.sql import functions as F
        df = self._df
        if cols is None:
            cols = [f.name for f in df.schema.fields
                    if f.dataType.typeName() in
                    ("double", "float", "long", "integer", "short", "decimal")]
        aggs = []
        for c in cols:
            x = F.col(c).cast("double")
            aggs += [F.count(x).alias(f"{c}__count"), F.avg(x).alias(f"{c}__avg"),
                     F.stddev_samp(x).alias(f"{c}__std"), F.min(x).alias(f"{c}__min"),
                     F.percentile_approx(x, 0.25).alias(f"{c}__25%"),
                     F.percentile_approx(x, 0.5).alias(f"{c}__50%"),
                     F.percentile_approx(x, 0.75).alias(f"{c}__75%"),
                     F.percentile_approx(x, 0.9).alias(f"{c}__90%"),
                     F.percentile_approx(x, 0.99).alias(f"{c}__99%"),
                     F.max(x).alias(f"{c}__max")]
        row = df.agg(*aggs).collect()[0]
        import pandas as pd
        stats = ["count", "avg", "std", "min", "25%", "50%", "75%", "90%", "99%", "max"]
        return pd.DataFrame({c: [row[f"{c}__{s}"] for s in stats] for c in cols},
                            index=stats)


# ---------------------------------------------------------------------------
# sources (reference dataframe.py:1985-2046 readCsv/readSparkDf/readOlap)
# ---------------------------------------------------------------------------


def readCsv(path: str, spark: SparkSession | None = None, **options) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    opts = {"header": "true", "inferSchema": "true", **options}
    return CausalDataFrame(spark.read.options(**opts).csv(path))


def readParquet(path: str, spark: SparkSession | None = None) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    return CausalDataFrame(spark.read.parquet(path))


def readTable(name: str, spark: SparkSession | None = None) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    return CausalDataFrame(spark.table(name))


def readSparkDf(df: DataFrame) -> CausalDataFrame:
    return CausalDataFrame(df)
