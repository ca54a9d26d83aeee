"""Regression tests for the round-7 review pass over uplift/temporal/
text/quality (each test pins a fixed defect)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_tokens_strip_all_whitespace(spark):
    """Leading tab/newline must not produce an empty first token; the
    whitespace-normalized fingerprint must be jitter-stable."""
    from fast_causal_inference_spark.datapipe.text import (
        fingerprint,
        token_count,
        tokens,
    )

    df = spark.createDataFrame(pd.DataFrame(
        {"text": ["hello world", "\thello world", "hello world\n",
                  "  hello   world  "]}))
    got = df.select(tokens("text").alias("tk"),
                    token_count("text").alias("n"),
                    fingerprint("text", method="md5").alias("fp")).collect()
    for r in got:
        assert r["tk"] == ["hello", "world"], r
        assert r["n"] == 2
        assert r["fp"] == got[0]["fp"]


def test_chunk_documents_tab_prefix(spark):
    from fast_causal_inference_spark.datapipe.text import chunk_documents

    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1], "text": ["\ta b c d e f"]}))
    out = chunk_documents(df, chunk_tokens=3, overlap=0).collect()
    assert [r["chunk_text"] for r in out] == ["a b c", "d e f"]


def test_asof_join_forward_null_ts(spark):
    """A NULL-timestamp left row must match NOTHING in either direction
    (forward's desc ordering used to fabricate a match to the earliest
    right row)."""
    from fast_causal_inference_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100.0, "a"), (1, None, "b")],
        "k int, ts double, lv string")
    right = spark.createDataFrame(
        [(1, 50.0, "r1"), (1, 150.0, "r2")],
        "k int, ts double, rv string")
    for direction in ("backward", "forward"):
        out = asof_join(left, right, on="k", left_ts="ts",
                        direction=direction).toPandas()
        nullrow = out[out.lv == "b"].iloc[0]
        assert pd.isna(nullrow["rv_right"]), direction


def test_dup_line_frac_crlf(spark):
    """CRLF documents: blank lines must stay blank (no '\\r' phantom
    content) so Windows formatting is not flagged as repetition."""
    from fast_causal_inference_spark.datapipe.quality import dup_line_frac

    df = spark.createDataFrame(pd.DataFrame(
        {"text": ["a\r\n\r\n\r\nb", "a\n\n\nb", "x\r\ny\r\nx\r\nz"]}))
    got = [r[0] for r in df.select(dup_line_frac("text")).collect()]
    assert got[0] == got[1] == 0.0
    assert got[2] == pytest.approx(0.25)      # one real duplicate line


def test_normalize_url_query_value_slash(spark):
    from fast_causal_inference_spark.datapipe.quality import normalize_url

    df = spark.createDataFrame(pd.DataFrame(
        {"url": ["http://h/p?q=a/?b", "http://h/p/?q=1", "http://h/p/"]}))
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    assert got[0] == "http://h/p?q=a/?b"       # query value untouched
    assert got[1] == "http://h/p?q=1"          # path trailing slash folded
    assert got[2] == "http://h/p"


def test_registered_domain_trailing_dot(spark):
    from fast_causal_inference_spark.datapipe.quality import (
        registered_domain,
    )

    df = spark.createDataFrame(pd.DataFrame(
        {"url": ["https://example.com./x", "https://example.com/x",
                 "https://a.bbc.co.uk./y"]}))
    got = [r[0] for r in df.select(registered_domain("url")).collect()]
    assert got[0] == got[1] == "example.com"
    assert got[2] == "bbc.co.uk"


def test_url_dedup_keep_validation(spark):
    from fast_causal_inference_spark.datapipe.quality import url_dedup

    df = spark.createDataFrame(pd.DataFrame(
        {"url": ["http://a/x", "http://a/x/"], "doc_id": [2, 1]}))
    with pytest.raises(ValueError, match="keep"):
        url_dedup(df, keep="first")
    assert url_dedup(df, keep="max").collect()[0]["doc_id"] == 2


def test_lift_gain_rejects_non_binary_treatment(spark):
    from fast_causal_inference_spark.uplift.evaluation import get_lift_gain

    pdf = pd.DataFrame({
        "ite": np.linspace(0, 1, 40), "y": np.ones(40),
        "t": [0.0, 1.0] * 19 + [None, 2.0]})
    with pytest.raises(ValueError, match="binary"):
        get_lift_gain(spark.createDataFrame(pdf), "ite", "y", "t", k=4)


def test_qini_row_level_threshold_defractured(spark):
    """A pre-existing row-varying 'threshold' column must not fracture
    the per-bucket grouping of the Qini curve."""
    from fast_causal_inference_spark.uplift.roi import estimate_qini

    rng = np.random.default_rng(3)
    n = 400
    pdf = pd.DataFrame({
        "bucket": np.repeat([1.0, 2.0, 3.0, 4.0], n // 4),
        "target": rng.normal(1, 0.2, n),
        "treatment": np.tile([0, 1], n // 2),
        "threshold": rng.uniform(0, 1, n)})    # row-level junk
    df = spark.createDataFrame(pdf)
    out = estimate_qini(df, bucket_colname="bucket",
                        target_colname="target")
    real = out[out.bucket.notna()]
    assert len(real) == 4                      # one row per bucket
    assert real["count"].max() == n            # cumulative count reaches n
