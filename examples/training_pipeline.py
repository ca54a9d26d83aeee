"""End-to-end LLM training-data pipeline demo over the documents table.

Ingest → quality/PII → decontaminate → LM-perplexity filter → dedup
(exact + MinHash + transitive closure) → domain mixture → deterministic
epoch shuffle → context-window chunking → sequence packing → shard
writing → BM25 retrieval over the landed corpus.  Every stage is the scale-path operator (no collect, no
arrays through shuffles); this script narrates row counts per stage.

Run: python examples/training_pipeline.py [sf_dir] (default sf0.01).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F                            # noqa: E402

import fast_causal_inference_spark as fcis                        # noqa: E402
from fast_causal_inference_spark.sources.tables import load_table  # noqa: E402
from fast_causal_inference_spark.datapipe import dedup, quality    # noqa: E402
from fast_causal_inference_spark.datapipe.lm import (              # noqa: E402
    perplexity_filter,
    train_bigram_lm,
)
from fast_causal_inference_spark.datapipe.retrieval import bm25_search  # noqa: E402
from fast_causal_inference_spark.datapipe.text import (            # noqa: E402
    chunk_documents,
    language_id,
    quality_score,
    token_count,
)
from fast_causal_inference_spark.datapipe.training import (        # noqa: E402
    domain_mixture_sample,
    global_shuffle,
    pack_sequences,
    write_training_shards,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = fcis.get_session("fcis-training-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents") \
        .withColumn("domain", F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("books")),
            (F.col("doc_id") % 3 + 1).cast("int")))
    print(f"ingested: {docs.count()} docs")

    # 1. quality filter + PII redaction (pure Column expressions)
    scored = docs.withColumn("lang", language_id(F.col("text"))) \
                 .withColumn("q", quality_score(F.col("text"))) \
                 .withColumn("n_tokens", token_count(F.col("text")))
    kept = scored.where((F.col("q") >= 0.3) & (F.col("n_tokens") >= 5)) \
                 .withColumn("text", quality.pii_redact("text"))
    print(f"after quality/PII: {kept.count()}")

    # 2. benchmark decontamination (13-gram rule, broadcast benchmark)
    bench = docs.limit(5).select(F.col("text").alias("bench_text"))
    decon = quality.decontaminate(kept, bench, text_col="text", n=8,
                                  benchmark_text_col="bench_text")
    print(f"after decontamination: {decon.count()}")

    # 2.5 CCNet-style quality cut: keep the head+middle (lowest 70%) of
    # the perplexity distribution under a trusted-slice LM
    from fast_causal_inference_spark.datapipe.lm import score_perplexity
    lm = train_bigram_lm(docs.where(F.col("doc_id") % 5 == 0))
    p70 = score_perplexity(decon, lm).approxQuantile("ppl", [0.7], 0.01)[0]
    decon = perplexity_filter(decon, lm, max_ppl=p70)
    print(f"after perplexity filter (ppl <= {p70:.1f}): {decon.count()}")

    # 3. dedup: exact, then MinHash-LSH near-dup clusters → keep minima
    exact = dedup.exact_dedup(decon)
    pairs = dedup.minhash_lsh_pairs(exact, threshold=0.7)
    comp = dedup.connected_components(pairs)
    keep = comp.groupBy("component").agg(F.min("id").alias("doc_id"))
    deduped = exact.join(
        comp.select(F.col("id").alias("doc_id")), "doc_id", "left_anti") \
        .unionByName(exact.join(keep, "doc_id", "left_semi"))
    print(f"after dedup: {deduped.count()}")

    # 4. domain mixture (temperature-smoothed) + epoch shuffle
    mixed = domain_mixture_sample(deduped, "domain", temperature=0.7,
                                  id_cols=["doc_id"])
    shuffled = global_shuffle(mixed, seed=0,
                              key_cols=["doc_id", "__replica"])
    print("mixture:", {r["domain"]: r["n"] for r in
                       mixed.groupBy("domain")
                       .agg(F.count(F.lit(1)).alias("n")).collect()})

    # 5. chunk long docs to 512-token context windows, pack to 2048
    # (chunk_documents passes __replica through, so upsampled copies
    # stay distinguishable; chunk_id joins the shuffle/shard key)
    chunks = chunk_documents(shuffled, chunk_tokens=512, overlap=32) \
        .drop("n_tokens").withColumnRenamed("n_chunk_tokens", "n_tokens")
    print(f"chunked into {chunks.count()} context windows")
    packed = pack_sequences(chunks, "n_tokens", max_tokens=2048)
    n_packs = packed.select(F.countDistinct("pack_id")).collect()[0][0]
    print(f"packed into {n_packs} context windows")
    out_dir = tempfile.mkdtemp(prefix="fcis_shards_")
    write_training_shards(packed, out_dir, num_shards=8,
                          key_cols=["doc_id", "__replica", "chunk_id"])
    print(f"shards at {out_dir}: "
          f"{spark.read.parquet(out_dir).count()} rows")

    # 5.5 learned tokenizer: train BPE on the curated corpus, account
    # tokens with it (the number packing/mixture budgeting should use)
    from fast_causal_inference_spark.datapipe.tokenizer import (
        bpe_token_count,
        train_bpe,
    )
    bpe = train_bpe(deduped, vocab_size=300)
    tok_total = bpe_token_count(deduped, bpe).agg(
        F.sum("n_tokens_bpe")).collect()[0][0]
    print(f"BPE vocab {len(bpe['vocab'])}, corpus tokens {tok_total}")

    # 5.6 trainable NB quality classifier (trusted slice = positive)
    from fast_causal_inference_spark.datapipe.quality import (
        quality_classifier_score,
        train_quality_classifier,
    )
    labeled = docs.where(F.col("doc_id") % 5 <= 1).withColumn(
        "label", (F.col("doc_id") % 5 == 0).cast("int"))
    nb = train_quality_classifier(labeled, "label")
    n_pos = quality_classifier_score(deduped, nb) \
        .where(F.col("quality_logodds") > 0).count()
    print(f"NB classifier scores {n_pos} docs above the prior")

    # 5.7 exact repeated-substring audit (Lee et al. criterion)
    from fast_causal_inference_spark.datapipe.dedup import (
        repeated_substring_spans,
    )
    spans = repeated_substring_spans(deduped.limit(500), n=10,
                                     min_run_tokens=30)
    print(f"exact shared spans >=30 tokens: {spans.count()}")

    # 6. BM25 retrieval over the curated corpus (eval-set sourcing)
    qdf = spark.createDataFrame(
        [(0, "spark query join"), (1, "merge sort window")],
        "query_id bigint, query string")
    hits = bm25_search(deduped, qdf, k=3)
    print("bm25 top hits:")
    hits.orderBy("query_id", "rank").show(6, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
