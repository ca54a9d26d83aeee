"""Skew utilities: salted_join semantics vs plain join; top_k_per_key vs
plain window."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.skew import (
    salted_join,
    top_k_per_key,
)


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(3)
    n = 20000
    # 70% of rows share one hot key
    keys = np.where(rng.uniform(size=n) < 0.7, 0,
                    rng.integers(1, 200, n))
    fact = pd.DataFrame({"k": keys, "v": rng.normal(size=n),
                         "rid": np.arange(n)})
    dim = pd.DataFrame({"k": np.arange(200),
                        "name": [f"k{i}" for i in range(200)]})
    return (spark.createDataFrame(fact).repartition(8),
            spark.createDataFrame(dim).repartition(2),
            fact, dim)


def test_salted_join_inner_matches_plain(skewed):
    f_df, d_df, fact, dim = skewed
    got = (salted_join(f_df, d_df, on="k", salt=8)
           .orderBy("rid").toPandas())
    want = fact.merge(dim, on="k").sort_values("rid").reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got.rid) == list(want.rid)
    assert list(got.name) == list(want.name)


def test_salted_join_left_keeps_unmatched(spark, skewed):
    f_df, d_df, fact, dim = skewed
    d_small = d_df.where(F.col("k") < 50)
    got = salted_join(f_df, d_small, on="k", how="left", salt=8)
    assert got.count() == len(fact)
    n_null = got.where(F.col("name").isNull()).count()
    assert n_null == (fact.k >= 50).sum()


def test_salted_join_rejects_ambiguity_and_how(skewed):
    f_df, d_df, *_ = skewed
    with pytest.raises(ValueError, match="how="):
        salted_join(f_df, d_df, on="k", how="full")
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(f_df, f_df, on="k")


def test_top_k_per_key_exact(skewed):
    f_df, _, fact, _ = skewed
    got = top_k_per_key(f_df, "k", "v", k=5, salt=8).toPandas()
    want_sizes = fact.groupby("k").size().clip(upper=5)
    got_sizes = got.groupby("k").size()
    assert got_sizes.sort_index().equals(want_sizes.sort_index())
    # values are exactly the per-key 5 largest
    for key, grp in got.groupby("k"):
        top = fact[fact.k == key].v.nlargest(min(5, (fact.k == key).sum()))
        assert sorted(grp.v) == pytest.approx(sorted(top))
    assert set(got["rank"]) <= {1, 2, 3, 4, 5}


def test_top_k_ascending(skewed):
    f_df, _, fact, _ = skewed
    got = top_k_per_key(f_df, "k", "v", k=3, descending=False).toPandas()
    for key, grp in list(got.groupby("k"))[:10]:
        bottom = fact[fact.k == key].v.nsmallest(
            min(3, (fact.k == key).sum()))
        assert sorted(grp.v) == pytest.approx(sorted(bottom))
