"""Distributed BPE tokenizer training + encoding.

The training-data pipeline's tokenizer stage: learn a byte-pair-encoding
vocabulary from the corpus and tokenize documents with it.  (The reference
ships only statistics; a 100 TB curation pipeline needs the tokenizer
boundary — sequence packing and token-count accounting both key off it.)

Scale shape (the standard recipe — Sennrich et al. 2016 learn on word
frequencies, not raw text):

* ONE distributed pass builds the (word, count) relation — explode +
  map-side-combined groupBy; a distributed top-K (``orderBy desc limit``,
  TakeOrderedAndProject — no global sort) bounds the driver-side training
  set.  At any corpus size the driver sees ≤ ``max_words`` rows, and the
  top-K by frequency carries almost all token mass.
* BPE merge learning is inherently sequential → runs on the driver over
  the bounded word-count table with an incrementally-maintained pair
  index (cost per merge ∝ words containing that pair, the subword-nmt
  trick), never touching the corpus again.
* Encoding broadcasts the merge ranks and runs one Arrow-batched UDF with
  a per-batch word→tokens memo — each DISTINCT word in a batch is encoded
  once regardless of its frequency.  (Production pipelines push this into
  a native tokenizer; the plumbing — model broadcast, batch memo, array
  output — is identical.)

Determinism: merge ties break on (count desc, pair lexicographic), so the
learned vocabulary is a pure function of the word-count relation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.serialization import ensure_udf_serializable

__all__ = ["train_bpe", "bpe_encode", "bpe_token_count", "bpe_encode_word"]

_EOW = "</w>"


def _learn_merges(word_counts: list[tuple[str, int]],
                  n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table, with an
    incrementally-updated pair→words index."""
    words: list[list[str]] = [list(w) + [_EOW] for w, _ in word_counts]
    counts = [c for _, c in word_counts]

    import heapq

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(i)

    # lazy max-heap: stale entries are skipped on pop (their recorded
    # count no longer matches) — selection cost is O(log #pairs) per
    # merge instead of a full pair-table scan, and the (−count, pair)
    # ordering realizes the deterministic count-desc / lexicographic
    # tie-break directly
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p) == -negc:
                if -negc < 2:       # min pair frequency (subword-nmt default)
                    heap = []
                    break
                best = p
                break
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            syms = words[i]
            c = counts[i]
            # remove this word's contribution to its current pairs; a
            # decreased pair gets a fresh heap entry (its old, larger
            # entries go stale and are skipped on pop)
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                else:
                    heapq.heappush(heap,
                                   (-pair_counts[(a, b)], (a, b)))
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del pair_words[(a, b)]
            # apply the merge within the word
            out = []
            j = 0
            while j < len(syms):
                if (j + 1 < len(syms)
                        and (syms[j], syms[j + 1]) == best):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # add back the new pairs
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(i)
                heapq.heappush(heap, (-pair_counts[(a, b)], (a, b)))
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              vocab_size: int = 1000, max_words: int = 100_000,
              lowercase: bool = True) -> dict:
    """Learn a BPE vocabulary from the corpus.

    ``vocab_size`` counts base characters + learned merges; ``max_words``
    bounds the driver-side word-frequency table (distributed top-K by
    count — ties broken by word so the table is layout-independent).

    Returns ``{"merges": [(a, b), ...], "vocab": [token, ...],
    "lowercase": bool}``.
    """
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    wc = (df.select(F.explode(F.split(F.trim(c), r"\s+")).alias("w"))
          .where(F.col("w") != "")
          .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
          .orderBy(F.desc("c"), "w").limit(max_words)
          .collect())
    word_counts = [(r["w"], int(r["c"])) for r in wc]
    chars = sorted({ch for w, _ in word_counts for ch in w} | {_EOW})
    n_merges = max(vocab_size - len(chars), 0)
    merges = _learn_merges(word_counts, n_merges)
    # dedup preserving first occurrence: two merge pairs can concatenate
    # to the SAME string (('a','bc') and ('ab','c') both yield 'abc'),
    # and a duplicated vocab entry would both overstate vocab_size and
    # map one token to two ids in any enumerate-based id assignment
    vocab, seen = [], set()
    for tok in chars + [a + b for a, b in merges]:
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)
    return {"merges": merges, "vocab": vocab, "lowercase": lowercase}


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word: repeatedly merge the lowest-rank adjacent pair
    (standard greedy BPE inference)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_j = -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j:best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_encode(df: DataFrame, model: dict, text_col: str = "text",
               output_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize a text column with a trained BPE model → array<string>.

    One Arrow-batched UDF pass; the merge-rank table rides the closure
    (broadcast once per executor) and a per-batch memo encodes each
    DISTINCT word once."""
    import re

    ranks = {pair: i for i, pair in enumerate(model["merges"])}
    lowercase = bool(model.get("lowercase", True))
    # ASCII whitespace only, matching train_bpe's Java \s+ split (and
    # quality_classifier_udf): str.split() would also break on NBSP etc.,
    # producing words the training pass never saw.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_text(t):
            if t is None:
                return None
            if lowercase:
                t = t.lower()
            out: list[str] = []
            for w in ws.split(t):
                if not w:
                    continue
                toks = memo.get(w)
                if toks is None:
                    toks = bpe_encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(enc_text)

    ensure_udf_serializable()
    return df.withColumn(output_col, _enc(F.col(text_col)))


def bpe_token_count(df: DataFrame, model: dict, text_col: str = "text",
                    output_col: str = "n_tokens_bpe") -> DataFrame:
    """Exact learned-tokenizer token count per document (the accounting
    number sequence packing and mixture budgeting run on)."""
    enc = bpe_encode(df, model, text_col, "__toks")
    return enc.withColumn(output_col, F.size("__toks")).drop("__toks")
