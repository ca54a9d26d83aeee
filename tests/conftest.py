import os
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# python workers spawned by Spark must resolve the package too
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from fast_causal_inference_spark.session import configure_session
    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("fcis-tests")
               .master("local[4]")
               .config("spark.sql.shuffle.partitions", "4")
               .config("spark.ui.enabled", "false"))
    s = configure_session(builder).getOrCreate()
    yield s


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="session")
def ab_pdf():
    """Synthetic A/B fixture (pandas) mirroring FIXTURES.md §1 semantics:
    ratio metric with a correlated pre-period covariate for CUPED."""
    rng = np.random.default_rng(42)
    n = 4000
    treatment = rng.integers(0, 2, n)
    den_pre = rng.integers(1, 10, n).astype(float)
    num_pre = 2.0 * den_pre + rng.normal(0, 2.0, n)
    den = rng.integers(1, 10, n).astype(float)
    num = (2.0 + 0.15 * treatment) * den + 0.6 * (num_pre - 2.0 * den_pre) \
        + rng.normal(0, 2.0, n)
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 2, n)
    x3 = rng.normal(1, 1, n)
    y = 1.0 + 0.5 * x1 - 0.8 * x2 + 0.9 * treatment + rng.normal(0, 1, n)
    return pd.DataFrame({
        "treatment": treatment, "numerator": num, "denominator": den,
        "numerator_pre": num_pre, "denominator_pre": den_pre,
        "x1": x1, "x2": x2, "x3": x3, "y": y,
        "weight": rng.uniform(0, 1, n),
    })


@pytest.fixture(scope="session")
def ab_df(spark, ab_pdf):
    return spark.createDataFrame(ab_pdf).repartition(4).cache()
