"""Seeded replicas of the reference's demo fixture tables.

``make_test_data_small`` reproduces the schema and generation semantics of
the reference's primary fixture ``test_data_small``
(``examples/test_data_small.sql:1-25``; column semantics documented in
FIXTURES.md §1): ~10k rows, x1..x5 normals of varying σ, heavy-tailed
longtails, a categorical, randomized + confounded treatments, a linear
outcome, pre/post ratio-metric columns correlated for CUPED, and a weight.

The exact VALUES are this repo's own (the reference does not ship the
underlying CSVs), but they are deterministic given the seed, so golden
tests can pin results hard — see tests/test_reference_goldens.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_test_data_small_pdf(n: int = 10000, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 2, n)
    x3 = rng.normal(0, 1, n)
    x4 = rng.normal(1, 1, n)
    x5 = rng.normal(-1, 2, n)
    x_long_tail1 = rng.lognormal(0.0, 1.0, n)
    x_long_tail2 = rng.pareto(3.0, n) + 1.0
    x_cat1 = rng.choice(list("ABCDE"), n)
    treatment = rng.integers(0, 2, n)
    # confounded treatment: depends on x1
    t_ob = (rng.uniform(0, 1, n) < 1.0 / (1.0 + np.exp(-x1))).astype(int)
    y = (1.0 + 0.5 * x1 - 0.8 * x2 + 0.3 * x3 + 2.0 * treatment
         + rng.normal(0, 4.0, n))
    y_ob = 1.0 + 0.5 * x1 - 0.8 * x2 + 1.5 * t_ob + rng.normal(0, 4.0, n)
    denominator_pre = rng.integers(1, 10, n)
    numerator_pre = 2.0 * denominator_pre + rng.normal(0, 2.0, n)
    denominator = rng.integers(1, 10, n)
    numerator = ((2.0 + 0.15 * treatment) * denominator
                 + 0.6 * (numerator_pre - 2.0 * denominator_pre)
                 + rng.normal(0, 2.0, n))
    weight = rng.uniform(0, 1, n)
    return pd.DataFrame({
        "id": [f"u{i:06d}" for i in range(n)],
        "x1": x1, "x2": x2, "x3": x3, "x4": x4, "x5": x5,
        "x_long_tail1": x_long_tail1, "x_long_tail2": x_long_tail2,
        "x_cat1": x_cat1,
        "treatment": treatment.astype(np.int64),
        "t_ob": t_ob.astype(np.int64),
        "y": y, "y_ob": y_ob,
        "numerator": numerator, "numerator_pre": numerator_pre,
        "denominator": denominator.astype(np.int64),
        "denominator_pre": denominator_pre.astype(np.int64),
        "weight": weight,
    })


def make_test_data_small(spark, n: int = 10000, seed: int = 0,
                         partitions: int = 4):
    """Spark DataFrame variant (deterministic layout for golden tests)."""
    return spark.createDataFrame(make_test_data_small_pdf(n, seed)) \
        .coalesce(partitions)
