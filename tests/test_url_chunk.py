"""URL normalization/domain ops and document chunking."""

import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.datapipe.quality import (
    domain_filter,
    normalize_url,
    registered_domain,
    url_dedup,
    url_host,
)
from fast_causal_inference_spark.datapipe.text import chunk_documents


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (0, "HTTPS://WWW.Example.com:443/Path/?utm_source=x&q=1#frag"),
        (1, "https://example.com/Path?q=1"),
        (2, "http://news.bbc.co.uk/story"),
        (3, "http://sub.deep.example.com:80/a/"),
        (4, "https://example.com/Path?q=1&utm_campaign=z"),
        (5, "https://spam.bad-site.org/x"),
    ]
    return spark.createDataFrame(rows, "id long, url string")


def test_normalize_url(spark, urls):
    got = {r["id"]: r["n"] for r in
           urls.select("id", normalize_url("url").alias("n")).collect()}
    assert got[0] == "https://example.com/Path?q=1"
    assert got[1] == "https://example.com/Path?q=1"
    assert got[4] == "https://example.com/Path?q=1"
    assert got[3] == "http://sub.deep.example.com/a"


def test_normalize_url_edge_cases(spark):
    rows = [
        # tracking param mid-query must leave a VALID query string
        (0, "https://ex.com/p?a=1&utm_x=5&c=3"),
        (1, "https://ex.com/p?a=1&c=3"),
        # leading tracker with successor
        (2, "https://ex.com/p?utm_a=1&utm_b=2&c=3"),
        # scheme-mismatched ports must NOT collapse (different origins)
        (3, "http://ex.com:443/a"),
        (4, "https://ex.com:80/a"),
        # www inside the query must not be touched
        (5, "https://cdn.com/r?next=https://www.example.com/x"),
        # 'ref' is a content selector, not a tracker — keep it
        (6, "https://github.com/org/repo/tree/x?ref=main"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["n"] for r in
           df.select("id", normalize_url("url").alias("n")).collect()}
    assert got[0] == "https://ex.com/p?a=1&c=3"
    assert got[0] == got[1]
    assert got[2] == "https://ex.com/p?c=3"
    assert got[3] == "http://ex.com:443/a"
    assert got[4] == "https://ex.com:80/a"
    assert got[5] == "https://cdn.com/r?next=https://www.example.com/x"
    assert got[6] == "https://github.com/org/repo/tree/x?ref=main"


def test_url_host_protocol_relative(spark):
    df = spark.createDataFrame(
        [(0, "//www.Bad-Site.org/x"), (1, "mailto:a@b.com")],
        "id long, url string")
    got = {r["id"]: r["h"] for r in
           df.select("id", url_host("url").alias("h")).collect()}
    assert got[0] == "bad-site.org"
    assert got[1] == ""


def test_url_host_and_registered_domain(spark, urls):
    got = {r["id"]: (r["h"], r["d"]) for r in urls.select(
        "id", url_host("url").alias("h"),
        registered_domain("url").alias("d")).collect()}
    assert got[0] == ("example.com", "example.com")
    assert got[2] == ("news.bbc.co.uk", "bbc.co.uk")
    assert got[3] == ("sub.deep.example.com", "example.com")
    assert got[5] == ("spam.bad-site.org", "bad-site.org")


def test_url_dedup(spark, urls):
    out = url_dedup(urls)
    ids = sorted(r["id"] for r in out.collect())
    # 0, 1, 4 normalize identically -> keep exactly one of them (min id)
    assert 0 in ids and 1 not in ids and 4 not in ids
    assert len(ids) == 4


def test_domain_filter(spark, urls):
    kept = domain_filter(urls, blocklist=["bad-site.org"])
    assert sorted(r["id"] for r in kept.collect()) == [0, 1, 2, 3, 4]
    only = domain_filter(urls, allowlist=["example.com"])
    assert sorted(r["id"] for r in only.collect()) == [0, 1, 3, 4]
    with pytest.raises(ValueError):
        domain_filter(urls)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunk_documents(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(0, text), (1, "short doc"), (2, "")],
                               "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=0) \
        .orderBy("doc_id", "chunk_id").collect()
    d0 = [r for r in out if r["doc_id"] == 0]
    assert [r["chunk_text"] for r in d0] == [
        "t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9"]
    assert "text" not in out[0].asDict()  # text replaced by chunk_text
    assert [r["n_chunk_tokens"] for r in d0] == [4, 4, 2]
    d1 = [r for r in out if r["doc_id"] == 1]
    assert len(d1) == 1 and d1[0]["chunk_text"] == "short doc"
    # blank doc -> one empty chunk, not a dropped row
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["n_chunk_tokens"] == 0


def test_chunk_preserves_case_metadata_and_null(spark):
    df = spark.createDataFrame(
        [(0, 'The CEO said\n\n"NO"', "en", 1), (1, None, "de", 2)],
        "doc_id long, text string, lang string, rep long")
    out = chunk_documents(df, chunk_tokens=8).collect()
    d0 = [r for r in out if r["doc_id"] == 0][0]
    assert d0["chunk_text"] == 'The CEO said "NO"'  # case kept
    assert d0["lang"] == "en" and d0["rep"] == 1    # metadata kept
    d1 = [r for r in out if r["doc_id"] == 1]       # NULL text survives
    assert len(d1) == 1 and d1[0]["n_chunk_tokens"] == 0


def test_chunk_documents_overlap(spark):
    text = " ".join(f"t{i}" for i in range(8))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=2) \
        .orderBy("chunk_id").collect()
    assert [r["chunk_text"] for r in out] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7"]
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_reconstruction_no_overlap(spark, docs_sf):
    out = chunk_documents(docs_sf, chunk_tokens=16, overlap=0)
    rebuilt = (out.groupBy("doc_id")
               .agg(F.concat_ws(" ", F.array_sort(F.collect_list(
                   F.struct("chunk_id", "chunk_text"))
                   .cast("array<struct<chunk_id:int,chunk_text:string>>")
                   ).getField("chunk_text")).alias("joined")))
    orig = docs_sf.select("doc_id",
                          F.concat_ws(" ", F.split(
                              F.trim("text"), r"\s+"))
                          .alias("norm"))
    bad = rebuilt.join(orig, "doc_id") \
        .where(F.col("joined") != F.col("norm")).count()
    assert bad == 0


@pytest.fixture(scope="module")
def docs_sf(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").limit(200)
