"""N-gram language-model quality scoring (CCNet-style perplexity
filtering).

CCNet (Wenzek et al. 2020) and most published pretraining pipelines rank
web documents by the perplexity of a language model trained on a trusted
corpus; low-perplexity documents are "Wikipedia-like", high-perplexity
ones are boilerplate/gibberish. The production recipe uses KenLM; this
module implements the same signal as a **fully relational add-k-smoothed
bigram model** so it runs inside Catalyst with no model binary and no
UDF:

* **train**: one explode over the trusted corpus → map-side-combined
  bigram and unigram count relations (compressed: one row per distinct
  gram, never per token);
* **score**: explode the target corpus' bigrams → left join the count
  relations (broadcast when the LM vocabulary is small, plain hash join
  otherwise) → per-document mean log-probability via one groupBy.

Laplace (add-k) smoothing keeps out-of-vocabulary bigrams finite:
``p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)`` with V the unigram
vocabulary size. Perplexity = exp(−mean log p) over the document's
bigrams; documents shorter than 2 tokens score NULL (no bigram
evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import bind_once, tokens

__all__ = ["train_bigram_lm", "score_perplexity", "perplexity_filter"]


def _bigrams(text_col):
    """(w1, w2) adjacent-token pairs of normalized text."""
    return bind_once(tokens(text_col), lambda tk: F.when(
        F.size(tk) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(tk) - 1),
                    lambda i: F.struct(
                        F.element_at(tk, i).alias("w1"),
                        F.element_at(tk, i + 1).alias("w2"))))
        .otherwise(F.array()))


def train_bigram_lm(df: DataFrame, text_col: str = "text") -> dict:
    """Train an add-k-ready bigram LM on a trusted corpus.

    Returns ``{"bigrams": DataFrame(w1, w2, c12), "unigrams":
    DataFrame(w1, c1), "vocab_size": int}`` — count RELATIONS, not a
    driver-side model, so the trusted corpus can be arbitrarily large.
    """
    n_parts = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    toks = (df.repartition(n_parts)
            .select(F.explode(_bigrams(F.col(text_col))).alias("bg"))
            .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
            .where((F.col("w1") != "") & (F.col("w2") != "")))
    # cache both count relations: training already pays a mandatory
    # action (the vocab count), and every scoring/filter pass re-reads
    # them — without the cache each downstream action re-aggregates the
    # trusted corpus (the repo-wide reused-subtree convention)
    bigrams = toks.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")).cache()
    unis = (df.select(F.explode(tokens(F.col(text_col))).alias("w1"))
            .where(F.col("w1") != "")
            .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")).cache())
    # materialize both count relations concurrently — they are independent
    # aggregations of the same trusted corpus; the thread's exception (if
    # any) is re-raised on the caller so a Spark failure isn't masked
    import threading

    res: dict = {}

    def _count_unis():
        try:
            res["v"] = unis.count()
        except BaseException as exc:          # noqa: BLE001 — re-raised below
            res["err"] = exc

    th = threading.Thread(target=_count_unis)
    th.start()
    bigrams.count()
    th.join()
    if "err" in res:
        raise res["err"]
    return {"bigrams": bigrams, "unigrams": unis,
            "vocab_size": int(res["v"])}


def scored_bigram_logprobs(df: DataFrame, lm: dict, text_col: str,
                           key_cols: list, k: float,
                           broadcast_lm: bool | None) -> DataFrame:
    """Shared scoring core for the batch and streaming perplexity
    operators: explode the corpus' bigrams, LEFT-join the LM count
    relations, and aggregate mean add-k log-probability per key tuple.
    Keeping ONE implementation pins the streaming scorer to the batch
    semantics the stream-vs-batch agreement test checks."""
    V = lm["vocab_size"]
    bg_rel, uni_rel = lm["bigrams"], lm["unigrams"]
    if broadcast_lm:
        bg_rel, uni_rel = F.broadcast(bg_rel), F.broadcast(uni_rel)
    doc_bg = (df.select(*[F.col(c) for c in key_cols],
                        F.explode(_bigrams(F.col(text_col))).alias("bg"))
              .select(*key_cols, F.col("bg.w1").alias("w1"),
                      F.col("bg.w2").alias("w2"))
              .where((F.col("w1") != "") & (F.col("w2") != "")))
    joined = (doc_bg.join(bg_rel, ["w1", "w2"], "left")
              .join(uni_rel, "w1", "left")
              .withColumn("c12", F.coalesce("c12", F.lit(0)))
              .withColumn("c1", F.coalesce("c1", F.lit(0))))
    logp = F.log((F.col("c12") + F.lit(float(k)))
                 / (F.col("c1") + F.lit(float(k) * V)))
    return (joined.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.avg(logp).alias("logprob"))
            .withColumn("ppl", F.exp(-F.col("logprob"))))


def score_perplexity(df: DataFrame, lm: dict, text_col: str = "text",
                     id_col: str = "doc_id", k: float = 1.0,
                     broadcast_lm: bool | None = None) -> DataFrame:
    """Per-document bigram perplexity under a trained LM.

    Output: the input's ``id_col`` plus ``n_bigrams``, ``logprob``
    (mean natural-log probability) and ``ppl`` (exp(−logprob); NULL for
    documents with no bigram). ``broadcast_lm=True`` forces broadcast of
    the count relations (right for a bounded trusted vocabulary);
    ``None`` lets Catalyst/AQE decide from sizes.
    """
    scored = scored_bigram_logprobs(df, lm, text_col, [id_col], k,
                                    broadcast_lm)
    return (df.select(id_col).distinct()
            .join(scored, id_col, "left")
            .withColumn("n_bigrams",
                        F.coalesce("n_bigrams", F.lit(0))))


def perplexity_filter(df: DataFrame, lm: dict, max_ppl: float,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: float = 1.0) -> DataFrame:
    """Keep documents whose perplexity under the trusted-corpus LM is at
    most ``max_ppl`` (the CCNet head/middle cut). Documents with no
    bigram evidence are dropped (no basis to keep them)."""
    scored = score_perplexity(df, lm, text_col, id_col, k)
    keep = scored.where(F.col("ppl") <= max_ppl).select(id_col)
    return df.join(keep, id_col, "left_semi")
