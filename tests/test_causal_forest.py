import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.uplift.causal_forest import CausalForest


@pytest.fixture(scope="module")
def forest_pdf():
    rng = np.random.default_rng(23)
    n = 10000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    x3 = rng.normal(0, 1, n)
    t = rng.integers(0, 2, n).astype(float)
    tau = np.where(x1 > 0, 2.5, -0.5)
    y = 1.0 + 0.3 * x2 + tau * t + rng.normal(0, 1, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "x3": x3, "t": t, "y": y})


@pytest.fixture(scope="module")
def forest_df(spark, forest_pdf):
    return spark.createDataFrame(forest_pdf).repartition(4).cache()


def test_forest_recovers_heterogeneity(spark, forest_df):
    cf = CausalForest(["x1", "x2", "x3"], "y", "t", num_trees=8, max_depth=3,
                      min_node_size=50, mtry=2, seed=3).fit(forest_df)
    scored = cf.predict(forest_df).select("x1", "ite").toPandas()
    hi = scored[scored.x1 > 0.3].ite.mean()
    lo = scored[scored.x1 < -0.3].ite.mean()
    assert hi > 1.5 and lo < 0.5
    # correlation with the true tau structure
    true = np.where(scored.x1 > 0, 2.5, -0.5)
    assert np.corrcoef(scored.ite.fillna(0), true)[0, 1] > 0.7


def test_forest_feature_importance(spark, forest_df):
    cf = CausalForest(["x1", "x2", "x3"], "y", "t", num_trees=8, max_depth=3,
                      min_node_size=50, mtry=2, seed=3).fit(forest_df)
    imp = cf.feature_importance()
    assert imp.iloc[0].feature == "x1"          # the true effect modifier
    assert imp.iloc[0].importance > 0.4


def test_forest_deterministic(spark, forest_df):
    a = CausalForest(["x1", "x2"], "y", "t", num_trees=4, max_depth=2,
                     seed=11).fit(forest_df)
    b = CausalForest(["x1", "x2"], "y", "t", num_trees=4, max_depth=2,
                     seed=11).fit(forest_df)
    pa = a.predict(forest_df).agg(F.avg("ite")).collect()[0][0]
    pb = b.predict(forest_df).agg(F.avg("ite")).collect()[0][0]
    assert pa == pytest.approx(pb, rel=1e-12)
