"""Training-corpus assembly operators (datapipe/training.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.datapipe.training import (
    domain_mixture_sample,
    global_shuffle,
    pack_sequences,
    quality_weighted_sample,
    write_training_shards,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    n = 6000
    pdf = pd.DataFrame({
        "doc_id": np.arange(n),
        "domain": rng.choice(["web", "code", "books"], n, p=[0.8, 0.15, 0.05]),
        "n_tokens": rng.integers(10, 900, n),
        "quality": rng.uniform(0.0, 1.0, n),
    })
    return spark.createDataFrame(pdf).repartition(4).cache()


def test_domain_mixture_targets(corpus):
    out = domain_mixture_sample(
        corpus, "domain",
        target_weights={"web": 1.0, "code": 1.0, "books": 1.0},
        id_cols=["doc_id"], seed=3)
    got = {r["domain"]: r["n"] for r in
           out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_out = sum(got.values())
    # equal thirds within sampling noise; books (~300 rows) is upsampled
    for d in ("web", "code", "books"):
        assert got[d] / n_out == pytest.approx(1 / 3, abs=0.03), (d, got)
    # total size preserved by default
    assert n_out == pytest.approx(6000, rel=0.05)
    # deterministic
    again = domain_mixture_sample(
        corpus, "domain",
        target_weights={"web": 1.0, "code": 1.0, "books": 1.0},
        id_cols=["doc_id"], seed=3)
    assert again.count() == n_out


def test_domain_mixture_temperature(corpus):
    nat = {r["domain"]: r["n"] for r in
           corpus.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    out = domain_mixture_sample(corpus, "domain", temperature=0.5,
                                id_cols=["doc_id"], seed=1)
    got = {r["domain"]: r["n"] for r in
           out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    # T<1 compresses the ratio between the largest and smallest domain
    assert got["web"] / got["books"] < nat["web"] / nat["books"] / 2


def test_domain_mixture_upsample_cap(corpus):
    out = domain_mixture_sample(
        corpus, "domain", target_weights={"books": 1.0},
        id_cols=["doc_id"], seed=5, max_upsample=2.0)
    per_doc = (out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("k"))
               .agg(F.max("k")).collect()[0][0])
    assert per_doc <= 2
    assert out.where(F.col("domain") != "books").count() == 0


def test_global_shuffle_deterministic_and_layout_free(corpus):
    a = global_shuffle(corpus, seed=9, key_cols=["doc_id"]).toPandas()
    b = global_shuffle(corpus.repartition(13), seed=9,
                       key_cols=["doc_id"]).toPandas()
    # same content, same order, regardless of input partitioning
    assert list(a.doc_id) == list(b.doc_id)
    c = global_shuffle(corpus, seed=10, key_cols=["doc_id"]).toPandas()
    assert list(a.doc_id) != list(c.doc_id)
    assert sorted(a.doc_id) == sorted(c.doc_id)


def test_pack_sequences_budget_and_coverage(corpus):
    out = pack_sequences(corpus, "n_tokens", max_tokens=2048).toPandas()
    assert len(out) == corpus.count()                      # every doc packed
    by_pack = out.groupby("pack_id").n_tokens.sum()
    assert (by_pack[~out.groupby("pack_id").oversize.any()]
            <= 2048).all()                                 # budget respected
    # fill factor is decent for 10-900-token docs in 2048 windows
    fill = by_pack.mean() / 2048
    assert fill > 0.6, fill
    # pack_fill is the running prefix inside each pack
    g = out.sort_values(["pack_id", "pack_pos"]).groupby("pack_id")
    for _, grp in list(g)[:20]:
        expect = 0
        for _, row in grp.iterrows():
            assert row.pack_fill == expect
            expect += row.n_tokens


def test_pack_sequences_oversize(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "n_tokens": [5000, 100]})
    d = spark.createDataFrame(pdf).coalesce(1)
    out = pack_sequences(d, "n_tokens", max_tokens=2048).toPandas()
    assert bool(out[out.doc_id == 1].oversize.iloc[0])
    assert not bool(out[out.doc_id == 2].oversize.iloc[0])
    assert out.pack_id.nunique() == 2
    with pytest.raises(Exception, match="max_tokens"):
        pack_sequences(d, "n_tokens", max_tokens=2048,
                       truncate_oversize=False).toPandas()


def test_quality_weighted_sample(corpus):
    out = quality_weighted_sample(corpus, "quality", fraction=0.5,
                                  id_cols=["doc_id"], seed=2)
    n = out.count()
    assert n == pytest.approx(3000, rel=0.1)
    # mean quality of the sample is strictly above the corpus mean
    m_in = corpus.agg(F.avg("quality")).collect()[0][0]
    m_out = out.agg(F.avg("quality")).collect()[0][0]
    assert m_out > m_in + 0.05
    # reproducible
    assert quality_weighted_sample(corpus, "quality", fraction=0.5,
                                   id_cols=["doc_id"], seed=2).count() == n


def test_write_training_shards(corpus, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(corpus, path, num_shards=8, seed=4,
                          key_cols=["doc_id"])
    import glob
    files = glob.glob(path + "/part-*")
    assert len(files) == 8
    back = corpus.sparkSession.read.parquet(path)
    assert back.count() == corpus.count()
    # shards are roughly even (hash partitioning)
    sizes = (back.groupBy(F.spark_partition_id().alias("p"))
             .count().toPandas()["count"])
    assert sizes.max() / sizes.min() < 1.5
