"""Similarity search over embedding columns (``array<float>``).

* ``cosine`` / ``dot`` / ``l2_distance`` — pure higher-order-function Columns.
* ``knn_bruteforce`` — broadcast the (small) query set, score every row,
  window top-k per query. The exact baseline; one pass over the corpus.
* ``lsh_knn`` — random-hyperplane LSH: driver-generated deterministic
  projection matrix embedded as an array literal, signature = sign-bit pack,
  candidates from bucket equi-join (optionally multi-probe), exact rerank.
  The scale path: corpus is hashed once, the join touches only colliding
  buckets.
* ``embedding_near_dup_pairs`` — cosine near-duplicate detection via the same
  bucket join.
* ``ivf_knn`` — FAISS-style inverted-file index: seeded driver k-means
  coarse quantizer, GEMM-batched assignment pass, n_probe cells per query,
  exact rerank. The candidate-volume knob for corpus-scale ANN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    # nullif guard: an all-zeros embedding (padding row, failed encoder
    # output) has norm 0, and under Spark 4's default ANSI mode a plain
    # division would raise DIVIDE_BY_ZERO and kill the whole scan —
    # cosine with the zero vector is undefined, so NULL is the honest
    # value (NULL similarities drop out of top-k windows and joins)
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                              F.lit(0.0), lambda acc, v: acc + v))


def _validate_queries(queries: DataFrame, query_id_col: str,
                      query_vec_col: str, cap: int,
                      check_norm: bool = False) -> int:
    """Count the (small) query side and REFUSE NULL (and, for cosine,
    zero-norm) query vectors: they would otherwise yield all-NULL scores
    that the top-k NULL filter silently drops, so the query vanished
    from the output with no error — while ivf_knn raised for the same
    input.  One tiny aggregation over the broadcast-sized query side."""
    v = F.col(query_vec_col)
    bad = v.isNull()
    if check_norm:
        bad = bad | (F.aggregate(v, F.lit(0.0),
                                 lambda a, x: a + x * x) == 0)
    row = queries.limit(cap + 1).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(bad.cast("int")).alias("nbad")).first()
    if int(row["nbad"] or 0) > 0:
        raise ValueError(
            f"{int(row['nbad'])} query vector(s) are NULL"
            f"{' or zero-norm' if check_norm else ''} — they cannot be "
            "searched and would silently return no rows; filter them "
            "from the query side first")
    return int(row["n"])


def knn_bruteforce(df: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id",
                   query_vec_col: str = "query_vec",
                   metric: str = "cosine",
                   max_queries: int = 10_000) -> DataFrame:
    """Exact top-k neighbors per query. Query side is broadcast.

    Cost is O(|corpus|·|queries|): one corpus scan per ~10⁴ broadcast
    queries is the intended envelope.  A large query set silently degrades
    to an all-pairs cartesian, so sets above ``max_queries`` are rejected —
    use :func:`lsh_knn` (bucketed, output-proportional) for query sets at
    corpus scale, or raise the cap explicitly if you mean it.
    """
    score = {"cosine": cosine, "dot": dot}.get(metric)
    if score is None and metric != "l2":
        raise ValueError(f"unknown metric {metric!r}")
    nq = _validate_queries(queries, query_id_col, query_vec_col,
                           max_queries, check_norm=metric == "cosine")
    if nq > max_queries:
        raise ValueError(
            f">{max_queries} queries exceeds max_queries; brute force "
            f"is O(corpus x queries) — use lsh_knn for large query sets or "
            f"pass a higher max_queries deliberately")
    joined = df.crossJoin(F.broadcast(queries))
    if metric == "l2":
        s = -l2_distance(F.col(vec_col), F.col(query_vec_col))
    else:
        s = score(F.col(vec_col), F.col(query_vec_col))
    # NULL scores (NULL/zero-norm corpus vectors) must be filtered
    # BEFORE the top-k window: desc ordering puts NULLs last but
    # row_number still ranks them, so they would fill ranks after the
    # valid rows and be returned as garbage neighbors
    scored = joined.select(query_id_col, id_col, s.alias("score")) \
        .where(F.col("score").isNotNull())
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_signature(vec: Column, planes: np.ndarray) -> Column:
    """Pack sign(v·hᵢ) bits into a long (n_planes ≤ 63). Column-expression
    form — fine for a handful of planes; use :func:`bucket_signatures_udf`
    for many tables (one numpy matmul per Arrow batch beats hundreds of
    nested higher-order aggregates in codegen)."""
    n_planes = planes.shape[0]
    bits = []
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bits.append(F.when(dot(vec, h) > 0,
                           F.shiftleft(F.lit(1).cast("long"), i))
                    .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def bucket_signatures_udf(tables: list[np.ndarray]):
    """Arrow UDF: embedding → array of per-table bucket ids.

    All tables' hyperplanes are stacked into ONE (Σplanes × dim) matrix so a
    batch of B vectors costs a single (B × dim)·(dim × Σplanes) matmul.
    """
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    stacked = np.vstack(tables)                      # (total_planes, dim)
    sizes = [t.shape[0] for t in tables]
    offsets = np.cumsum([0] + sizes)
    pows = [2 ** np.arange(s, dtype=np.int64) for s in sizes]

    @F.pandas_udf("array<long>")
    def _sig(vecs: pd.Series) -> pd.Series:
        import numpy as _np

        # NULL embeddings get NULL signatures (np.stack over a batch
        # containing None raises; every sibling vector UDF in this file
        # masks the same way)
        mask = _np.array([v is not None for v in vecs])
        out = pd.Series([None] * len(vecs), dtype=object)
        if mask.any():
            X = _np.stack(vecs.to_numpy()[mask])     # (B', dim)
            bits = (X @ stacked.T) > 0               # (B', total_planes)
            # pack each table's sign bits with ONE matmul per table over
            # the whole batch (a per-row Python loop would dominate the
            # GEMM it was built to exploit)
            packed = _np.column_stack(
                [bits[:, offsets[t]:offsets[t + 1]].astype(_np.int64)
                 @ pows[t] for t in range(len(sizes))])
            vals = [row.tolist() for row in packed]
            out[mask] = pd.Series(vals, dtype=object).values
        return out

    ensure_udf_serializable()
    return _sig


def lsh_knn(df: DataFrame, queries: DataFrame, k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", query_vec_col: str = "query_vec",
            dim: int = 64, n_tables: int = 8, n_planes: int = 12,
            seed: int = 42) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane tables; rows
    colliding with the query in ANY table are candidates, reranked exactly."""
    _validate_queries(queries, query_id_col, query_vec_col,
                      cap=2 ** 31 - 2, check_norm=True)
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    sig = bucket_signatures_udf(tables)

    def with_buckets(frame: DataFrame, vcol: str, keep: list[str]) -> DataFrame:
        return (frame.withColumn("__sigs", sig(F.col(vcol)))
                .select(*keep, vcol,
                        F.posexplode("__sigs").alias("table", "bucket")))

    corpus_b = with_buckets(df, vec_col, [id_col])
    query_b = with_buckets(queries, query_vec_col, [query_id_col])
    cand = (corpus_b.join(F.broadcast(query_b), ["table", "bucket"])
            .select(query_id_col, id_col, vec_col, query_vec_col))
    # score BEFORE the candidate dedup: duplicate (query, id) collisions
    # carry the identical vectors, hence the identical score, so
    # dedup-after-scoring keeps the same rows while the dropDuplicates
    # exchange moves (qid, id, score) triples instead of both vectors
    scored = (cand.select(query_id_col, id_col,
                          cosine(F.col(vec_col), F.col(query_vec_col))
                          .alias("score"))
              .where(F.col("score").isNotNull())  # see knn_bruteforce note
              .dropDuplicates([query_id_col, id_col]))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             dim: int = 64, n_tables: int = 8,
                             n_planes: int = 14, seed: int = 42,
                             max_bucket_size: int | None = None) -> DataFrame:
    """Pairs with cosine ≥ threshold via LSH bucket self-join + exact verify.

    ``max_bucket_size`` — optional guard for ultra-dense corpora: the
    self-join volume is Σ cᵢ² over bucket sizes, so ONE degenerate bucket
    (a million identical vectors, an all-zeros embedding column) turns
    the job quadratic.  When set, over-full buckets are skipped with a
    WARNING stating how many (never a silent cap); members of a skipped
    bucket can still pair through their other ``n_tables − 1`` tables.
    Default ``None`` = exact LSH semantics, no skips.
    """
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    sig = bucket_signatures_udf(tables)
    b = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
           .withColumn("__sigs", sig(F.col("v")))
           .select("id", "v", F.posexplode("__sigs").alias("table", "bucket")))
    # cache + eager count: the bucket self-join reads `b` twice; lazily
    # the Pandas-UDF signature pass would run once per side (see the
    # ranked.count() note in dedup.ngram_jaccard_pairs)
    from fast_causal_inference_spark.datapipe.cachereg import register_cache

    b = register_cache(b.cache())
    b.count()
    if max_bucket_size is not None:
        import warnings

        big = (b.groupBy("table", "bucket")
               .agg(F.count(F.lit(1)).alias("__n"))
               .where(F.col("__n") > max_bucket_size)
               .select("table", "bucket"))
        n_big = big.count()
        if n_big:
            warnings.warn(
                f"embedding_near_dup_pairs: skipping {n_big} LSH buckets "
                f"with more than {max_bucket_size} members — pairs only "
                f"reachable through a skipped bucket are lost; raise "
                f"max_bucket_size or use semantic_dedup_pairs for dense "
                f"duplicate balls")
            b = b.join(F.broadcast(big), ["table", "bucket"], "left_anti")
    l, r = b.alias("l"), b.alias("r")
    cand = (l.join(r, [F.col("l.table") == F.col("r.table"),
                       F.col("l.bucket") == F.col("r.bucket"),
                       F.col("l.id") < F.col("r.id")])
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                    F.col("l.v").alias("va"), F.col("r.v").alias("vb")))
    # verify BEFORE the pair dedup (guide §2.3: filter/shrink before the
    # exchange): a pair colliding in several tables has the identical
    # cosine in each copy, so dedup-after-filter emits the same rows —
    # but the dropDuplicates exchange now carries only the few
    # (id_a, id_b, cosine) survivors instead of every candidate with BOTH
    # 64-float vectors attached (the map-side cosine costs at most the
    # n_tables-fold duplicate factor, far cheaper than shuffling payloads)
    return (cand.withColumn("cosine", cosine(F.col("va"), F.col("vb")))
                .where(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cosine")
                .dropDuplicates(["id_a", "id_b"]))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _sample_vectors(df: DataFrame, vec_col: str, n_lists: int,
                    n_sample: int, seed: int) -> np.ndarray:
    """Deterministic driver-side training sample, shared by the IVF and
    IVF-PQ trainers (the sampling recipe once lived in both and drifted).
    xxhash64 hashes the array natively (element-wise) — a deterministic
    layout-independent draw without the ~5× slower cast-to-string
    detour."""
    rows = (df.select(F.col(vec_col).alias("v"))
            .where(F.col("v").isNotNull())
            .orderBy(F.xxhash64(F.col("v"), F.lit(seed)))
            .limit(n_sample).collect())
    X = np.array([r["v"] for r in rows], dtype=float)
    if len(X) < n_lists:
        raise ValueError(f"need ≥{n_lists} vectors to train {n_lists} lists")
    return X


def _lloyd_kmeans(data: np.ndarray, k: int, iters: int, rng,
                  clamp_k: bool = False) -> np.ndarray:
    """Seeded Lloyd loop in GEMM form: argmin ||x−c||² = argmin
    (||c||² − 2 x·c) — the naive (X[:,None]−C[None])² broadcast builds
    an (n·k·d) temp (≈1 GB/iter at k=224, d=64) and was 30+ s of pure
    driver time at the ×10 bench point; the GEMM is milliseconds.
    ``clamp_k`` shrinks k to the sample size (PQ codebooks on short
    residual samples) instead of the trainers' raise-on-short contract.
    Consumes exactly one ``rng.choice`` so seeded call sequences are
    reproducible across callers."""
    if clamp_k:
        k = min(k, len(data))
    C = data[rng.choice(len(data), k, replace=False)].copy()
    for _ in range(iters):
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (data @ C.T)
        assign = d2.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = data[m].mean(axis=0)
    return C


def _train_centroids(df: DataFrame, vec_col: str, n_lists: int,
                     sample_per_list: int, iters: int,
                     seed: int) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side sample (the standard IVF
    training recipe — centroids are a tiny model, training data a bounded
    sample; the full corpus is only ever scanned for assignment)."""
    X = _sample_vectors(df, vec_col, n_lists, n_lists * sample_per_list,
                        seed)
    rng = np.random.default_rng(seed)
    return _lloyd_kmeans(X, n_lists, iters, rng)


def _assign_udf(C: np.ndarray):
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        import numpy as _np

        mask = vecs.notna().to_numpy()
        out = pd.Series([None] * len(vecs), dtype="Int32")
        if mask.any():
            X = _np.stack(vecs.to_numpy()[mask]).astype(float)  # (B, dim)
            # argmin ||x-c||² = argmax (x·c − ||c||²/2): one GEMM per batch
            scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
            out.iloc[_np.flatnonzero(mask)] = scores.argmax(axis=1) \
                .astype("int32")
        return out

    ensure_udf_serializable()
    return _assign


def ivf_knn(df: DataFrame, queries: DataFrame, k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", query_vec_col: str = "query_vec",
            n_lists: int = 64, n_probe: int = 8,
            sample_per_list: int = 40, train_iters: int = 8,
            seed: int = 42, max_queries: int = 10_000) -> DataFrame:
    """IVF approximate top-k: corpus vectors are partitioned into
    ``n_lists`` coarse-quantizer cells (one GEMM-batched assignment pass);
    each query probes its ``n_probe`` nearest cells and reranks exactly.

    Scale shape: candidate volume ≈ |corpus|·n_probe/n_lists per query —
    the knob production IVF indexes (FAISS-style) expose — and the
    assignment column can be precomputed/persisted once per corpus.  The
    (tiny) probe relation is broadcast; the only shuffle is the per-query
    top-k window over candidates.
    """
    C = _train_centroids(df, vec_col, n_lists, sample_per_list,
                         train_iters, seed)
    assign = _assign_udf(C)
    corpus = df.withColumn("__list", assign(F.col(vec_col)))

    q_rows = (queries.select(query_id_col, query_vec_col)
              .limit(max_queries + 1).collect())
    if len(q_rows) > max_queries:
        raise ValueError(
            f"ivf_knn collects the query side to build the probe relation; "
            f"got more than max_queries={max_queries} queries. Raise "
            f"max_queries only if the driver can hold them, or batch the "
            f"query set.")
    probes = []
    for r in q_rows:
        if r[query_vec_col] is None:
            raise ValueError(
                f"NULL query vector for {query_id_col}="
                f"{r[query_id_col]!r}; filter NULL queries before the "
                "probe build (the corpus side masks NULLs, the query "
                "side cannot search with one)")
        v = np.asarray(r[query_vec_col], dtype=float)
        d = v @ C.T - 0.5 * (C * C).sum(axis=1)
        for lst in np.argsort(-d)[:n_probe]:
            probes.append((r[query_id_col], int(lst), list(map(float, v))))
    sess = df.sparkSession
    qid_type = {f.name: f.dataType.simpleString()
                for f in queries.schema.fields}[query_id_col]
    probe_df = sess.createDataFrame(
        probes,
        f"{query_id_col} {qid_type}, __list int, "
        f"{query_vec_col} array<double>")

    cand = corpus.join(F.broadcast(probe_df), "__list")
    scored = cand.select(query_id_col, id_col,
                         cosine(F.col(vec_col).cast("array<double>"),
                                F.col(query_vec_col)).alias("score")) \
        .where(F.col("score").isNotNull())   # see knn_bruteforce note
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"),
                                                F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication via coarse clustering
# ---------------------------------------------------------------------------


def semantic_dedup_pairs(df: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding", n_lists: int = 64,
                         sample_per_list: int = 40, train_iters: int = 8,
                         seed: int = 42,
                         with_centroid_sim: bool = False,
                         block_rows: int = 4096) -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-style (Abbas et al. 2023):
    k-means the embeddings into ``n_lists`` coarse cells (the IVF
    quantizer machinery), then compare pairs ONLY within a cell.

    Scale shape: candidate volume is Σᵢ cᵢ² over cluster sizes — with
    n_lists ∝ √N (the paper's regime) that is O(N^1.5 / n_lists), never
    the all-pairs N². The cluster pass is one GEMM-batched Arrow UDF over
    the corpus; the self-join is an equi-join on the cell id with only
    (id, vector) shuffled. Exact duplicates always share a cell (identical
    vectors quantize identically), so recall on exact copies is 1.0;
    near-dups split across a cell boundary are missed — the approximation
    SemDeDup trades for the N² → within-cell bound.

    Skew: a popular cell's c² pairs would otherwise land in ONE shuffle
    task (measured as a lone straggler at the ×10 bench point), so cells
    larger than ``block_rows`` are 2-D block-decomposed — each row hashes
    to a block, the left side explodes to its upper-triangle target
    blocks, and the join key becomes (cell, block): the same pair set,
    spread over ~(c/block_rows)²/2 tasks per big cell.
    """
    from pyspark.sql import types as T

    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    C = _train_centroids(df, vec_col, n_lists, sample_per_list,
                         train_iters, seed)
    assign = _assign_udf(C)
    # NULL embeddings are dropped to match the training-sample filter —
    # np.stack inside the assignment UDF would otherwise fail the whole
    # job on the first NULL batch
    b = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
           .where(F.col("v").isNotNull())
           .withColumn("__list", assign(F.col("v"))))
    from fast_causal_inference_spark.datapipe.cachereg import register_cache

    b = register_cache(b.cache())
    b.count()
    # 2-D block decomposition: every row hashes to a block within its
    # cell (nb = ceil(c / block_rows) blocks for a c-row cell) and is
    # sent to each block-pair group (min(blk, j), max(blk, j)) — a
    # popular cell's c² pairs spread over ~nb²/2 tasks instead of one
    # straggler; for cells under block_rows this is a single group.
    sizes = b.groupBy("__list").agg(F.count(F.lit(1)).alias("__c"))
    nb = F.greatest(F.lit(1), F.ceil(F.col("__c") / F.lit(block_rows))) \
        .cast("int")
    grouped = (b.join(F.broadcast(sizes.select("__list",
                                               nb.alias("__nb"))),
                      "__list")
               .withColumn("__blk", F.pmod(F.xxhash64(F.col("id")),
                                           F.col("__nb")).cast("int"))
               .withColumn("__j", F.explode(
                   F.sequence(F.lit(0), F.col("__nb") - 1)))
               .select("id", "v", "__list", "__blk",
                       F.least("__blk", "__j").alias("__gi"),
                       F.greatest("__blk", "__j").alias("__gj")))
    id_type = df.schema[id_col].dataType
    fields = [T.StructField("id_a", id_type),
              T.StructField("id_b", id_type),
              T.StructField("cosine", T.DoubleType()),
              T.StructField("cluster", T.IntegerType())]
    if with_centroid_sim:
        fields += [T.StructField("centroid_sim_a", T.DoubleType()),
                   T.StructField("centroid_sim_b", T.DoubleType())]
    out_schema = T.StructType(fields)
    thr = float(threshold)
    want_cent = bool(with_centroid_sim)
    cols = ["id_a", "id_b", "cosine", "cluster"] \
        + (["centroid_sim_a", "centroid_sim_b"] if want_cent else [])

    # per-group verification is ONE numpy GEMM (cosine matrix of the
    # cell/block pair), not a per-pair higher-order-function column —
    # measured 27 s → ~3 s on the 11M-candidate ×10 bench point
    # no type hints: `from __future__ import annotations` stringifies
    # them and applyInPandas' eval-type inference warns on every call
    def _cell_pairs(key, pdf):
        import numpy as _np
        import pandas as _pd

        lst, gi, gj = int(key[0]), int(key[1]), int(key[2])
        empty = _pd.DataFrame({c: [] for c in cols})
        # indices are materialized ONLY for pairs that pass the
        # threshold (np.nonzero on the boolean matrix) — a full meshgrid
        # would build len(A)×len(B) int64 temps (~270 MB/task at 4096²)
        # for candidate sets where only a handful of pairs survive
        if gi == gj:
            ids = pdf["id"].to_numpy()
            if len(ids) < 2:
                return empty
            X = _np.stack(pdf["v"].to_numpy()).astype(float)
            na = _np.linalg.norm(X, axis=1)
            S = (X @ X.T) / _np.outer(na, na)
            keep2d = _np.triu(S >= thr, k=1)
            iu, ju = _np.nonzero(keep2d)
            if not len(iu):
                return empty
            ca = S[iu, ju]
            ia, ib = ids[iu], ids[ju]
            cs_i = cs_j = None
            if want_cent:
                cs = (X @ C[lst]) / (na * _np.linalg.norm(C[lst]))
                cs_i, cs_j = cs[iu], cs[ju]
        else:
            A = pdf[pdf["__blk"] == gi]
            B = pdf[pdf["__blk"] == gj]
            if not len(A) or not len(B):
                return empty
            XA = _np.stack(A["v"].to_numpy()).astype(float)
            XB = _np.stack(B["v"].to_numpy()).astype(float)
            na = _np.linalg.norm(XA, axis=1)
            nbn = _np.linalg.norm(XB, axis=1)
            S = (XA @ XB.T) / _np.outer(na, nbn)
            iu, ju = _np.nonzero(S >= thr)
            if not len(iu):
                return empty
            ca = S[iu, ju]
            ia = A["id"].to_numpy()[iu]
            ib = B["id"].to_numpy()[ju]
            cs_i = cs_j = None
            if want_cent:
                cn = _np.linalg.norm(C[lst])
                cs_i = ((XA @ C[lst]) / (na * cn))[iu]
                cs_j = ((XB @ C[lst]) / (nbn * cn))[ju]
        # canonical id order (cosine is symmetric; centroid sims follow
        # their ids — the centroid_far keep policy reads positionally)
        swap = ia > ib
        out_a = _np.where(swap, ib, ia)
        out_b = _np.where(swap, ia, ib)
        rec = {"id_a": out_a, "id_b": out_b, "cosine": ca,
               "cluster": _np.full(len(ca), lst, dtype="int32")}
        if want_cent:
            rec["centroid_sim_a"] = _np.where(swap, cs_j, cs_i)
            rec["centroid_sim_b"] = _np.where(swap, cs_i, cs_j)
        return _pd.DataFrame(rec)

    ensure_udf_serializable()
    return (grouped.groupBy("__list", "__gi", "__gj")
            .applyInPandas(_cell_pairs, out_schema))


def semantic_dedup(df: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_lists: int = 64, sample_per_list: int = 40,
                   train_iters: int = 8, seed: int = 42,
                   keep: str = "low_id") -> DataFrame:
    """Drop semantic near-duplicates (greedy per-pair drop — the
    transitive-closure variant is ``dedup.connected_components`` over
    :func:`semantic_dedup_pairs`).

    ``keep``: ``'low_id'`` keeps each pair's lowest id;
    ``'centroid_far'`` keeps the member FARTHEST from its cluster
    centroid — the SemDeDup paper's policy (Abbas et al. 2023 §2: the
    most typical member of a duplicate ball is the most redundant with
    the rest of the cluster).  Ties break to keeping the lower id."""
    if keep not in ("low_id", "centroid_far"):
        raise ValueError("keep must be 'low_id' or 'centroid_far'")
    pairs = semantic_dedup_pairs(df, threshold, id_col, vec_col, n_lists,
                                 sample_per_list, train_iters, seed,
                                 with_centroid_sim=(keep == "centroid_far"))
    if keep == "low_id":
        drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    else:
        drop_id = F.when(
            F.col("centroid_sim_a") > F.col("centroid_sim_b"),
            F.col("id_a")).when(
            F.col("centroid_sim_a") < F.col("centroid_sim_b"),
            F.col("id_b")).otherwise(F.col("id_b"))
        drops = pairs.select(drop_id.alias(id_col)).distinct()
    return df.join(drops, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Embedding PCA (the SemDeDup paper reduces embeddings before clustering;
# also the standard pre-step for IVF/whitening)
# ---------------------------------------------------------------------------


def embedding_pca(df: DataFrame, vec_col: str = "embedding",
                  k: int = 16) -> dict:
    """Fit PCA over an embedding column.

    Scale shape: ONE ``mapInPandas`` pass emits per-batch partial moments
    (n, Σx, flattened XᵀX — each batch a single numpy GEMM); the driver
    sums ≤ (partitions × batches) partial rows and runs ``eigh`` on the
    d×d covariance.  No row ever leaves the cluster; the model is
    O(k·d) — the classic tree-aggregate PCA.

    Returns ``{"mean": (d,), "components": (k, d) rows = top components,
    "explained_variance": (k,), "explained_variance_ratio": (k,),
    "dim": d}``.  Component SIGNS are fixed by making each component's
    largest-|coordinate| entry positive (eigh's sign is arbitrary).
    """
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    def _partials(batches):
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            X = np.stack(vecs.to_numpy()).astype(float)
            yield pd.DataFrame({
                "n": [float(len(X))],
                "s": [X.sum(axis=0).tolist()],
                "ss": [(X.T @ X).ravel().tolist()],
            })

    ensure_udf_serializable()
    rows = df.select(vec_col).mapInPandas(
        _partials, "n double, s array<double>, ss array<double>").collect()
    if not rows:
        raise ValueError("no embeddings to fit PCA on")
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    d = len(s)
    ss = np.sum([r["ss"] for r in rows], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                      # (k, d)
    # deterministic sign: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = np.maximum(evals[order], 0.0)
    total = max(float(evals.clip(min=0).sum()), 1e-300)
    return {"mean": mean, "components": comps,
            "explained_variance": ev,
            "explained_variance_ratio": ev / total, "dim": d}


def project_embeddings(df: DataFrame, model: dict,
                       vec_col: str = "embedding",
                       output_col: str = "pca",
                       whiten: bool = False) -> DataFrame:
    """Project embeddings onto the fitted components → ``array<double>``
    of length k.  One Arrow-batched GEMM per batch; the (k×d) component
    matrix rides the closure.  ``whiten`` scales each coordinate to unit
    variance (useful before cosine-metric clustering)."""
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    comps = np.asarray(model["components"], dtype=float)
    mean = np.asarray(model["mean"], dtype=float)
    scale = (1.0 / np.sqrt(np.maximum(model["explained_variance"], 1e-12))
             if whiten else None)

    @F.pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        def one_block(block):
            X = np.stack(block).astype(float) - mean[None, :]
            P = X @ comps.T
            if scale is not None:
                P = P * scale[None, :]
            return [row.tolist() for row in P]

        mask = vecs.notna().to_numpy()
        out = pd.Series([None] * len(vecs), dtype=object)
        if mask.any():
            vals = one_block(vecs.to_numpy()[mask])
            boxed = np.empty(len(vals), dtype=object)
            boxed[:] = vals
            out.iloc[np.flatnonzero(mask)] = boxed
        return out

    ensure_udf_serializable()
    return df.withColumn(output_col, _proj(F.col(vec_col)))


def embedding_kmeans(df: DataFrame, n_clusters: int = 64,
                     vec_col: str = "embedding",
                     output_col: str = "cluster",
                     sample_per_cluster: int = 40, train_iters: int = 8,
                     seed: int = 42) -> tuple[DataFrame, np.ndarray]:
    """Cluster an embedding column: seeded Lloyd k-means on a bounded
    driver-side sample (the IVF coarse-quantizer recipe — the corpus is
    only ever scanned for the GEMM-batched assignment pass).  Returns
    (df + cluster column, (k × d) centroid matrix); NULL embeddings get a
    NULL cluster.

    The public face of the quantizer behind :func:`ivf_knn` and
    :func:`semantic_dedup_pairs` — use it directly for corpus
    organization, per-cluster sampling, or SemDeDup-style pipelines over
    :func:`embedding_pca` projections."""
    C = _train_centroids(df, vec_col, n_clusters, sample_per_cluster,
                         train_iters, seed)
    assign = _assign_udf(C)
    out = df.withColumn(
        output_col,
        F.when(F.col(vec_col).isNotNull(), assign(F.col(vec_col))))
    return out, C


# ---------------------------------------------------------------------------
# IVF-PQ — product-quantized ANN (the 100 TB memory story: dim floats/vector
# compress to m code bytes, so a billion-vector index fits a small cluster)
# ---------------------------------------------------------------------------


def train_ivfpq(df: DataFrame, vec_col: str = "embedding",
                n_lists: int = 64, m: int = 8, ks: int = 256,
                sample_per_list: int = 40, train_iters: int = 8,
                seed: int = 42) -> dict:
    """Train an IVF-PQ model (FAISS ``IVFx,PQm`` recipe): a coarse
    quantizer of ``n_lists`` centroids plus ``m`` per-subspace codebooks
    of ``ks`` entries each, trained on the RESIDUALS x − C[list] of a
    bounded, layout-independent (xxhash64-ordered) driver sample.  All
    k-means steps are GEMM-batched numpy on that sample — the corpus is
    never scanned during training.

    Returns a plain dict model: ``C`` (n_lists × d), ``codebooks``
    (m × ks × d/m), plus the config ints — serialize it however you
    store models.
    """
    X = _sample_vectors(df, vec_col, n_lists, n_lists * sample_per_list,
                         seed)
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim={dim} must be divisible by m={m} subspaces")
    dsub = dim // m
    rng = np.random.default_rng(seed)

    C = _lloyd_kmeans(X, n_lists, train_iters, rng, clamp_k=True)
    d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
    R = X - C[d2.argmin(axis=1)]                  # residuals
    books = np.zeros((m, ks, dsub))
    for j in range(m):
        bj = _lloyd_kmeans(R[:, j * dsub:(j + 1) * dsub], ks,
                           train_iters, rng, clamp_k=True)
        books[j, :len(bj)] = bj                   # short sample → zero-pad
    return {"C": C, "codebooks": books, "n_lists": int(len(C)),
            "m": int(m), "ks": int(ks), "dim": int(dim)}


def ivfpq_encode(df: DataFrame, model: dict, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """One GEMM-batched Arrow pass over the corpus → ``(id, __list,
    __code)`` where ``__code`` is the m-byte PQ code of the residual.
    Persist the result once per corpus; every subsequent search scans
    codes (m bytes/vector), not vectors (4·dim bytes/vector)."""
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    C, books = model["C"], model["codebooks"]
    m, dsub = model["m"], model["dim"] // model["m"]
    id_type = {f.name: f.dataType.simpleString()
               for f in df.schema.fields}[id_col]
    schema = f"{id_col} {id_type}, __list int, __code array<int>"

    def _encode(batches):
        import numpy as _np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ok = pdf[vec_col].notna().to_numpy()
            sub = pdf.loc[ok]
            if len(sub) == 0:
                continue
            X = _np.stack(sub[vec_col].to_numpy()).astype(float)
            lists = (X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]) \
                .argmax(axis=1)
            R = X - C[lists]
            codes = _np.empty((len(X), m), dtype=_np.int64)
            for j in range(m):
                Bj = books[j]
                d2 = ((Bj * Bj).sum(axis=1)[None, :]
                      - 2.0 * (R[:, j * dsub:(j + 1) * dsub] @ Bj.T))
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: sub[id_col].to_numpy(),
                                "__list": lists.astype("int32"),
                                "__code": list(codes)})

    ensure_udf_serializable()
    return (df.select(id_col, vec_col)
            .where(F.col(vec_col).isNotNull())
            .mapInPandas(_encode, schema))


def ivfpq_knn(df: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              query_id_col: str = "query_id",
              query_vec_col: str = "query_vec",
              n_lists: int = 64, m: int = 8, ks: int = 256,
              n_probe: int = 8, refine: int = 4,
              sample_per_list: int = 40, train_iters: int = 8,
              seed: int = 42, max_queries: int = 1_000,
              model: dict | None = None,
              codes: DataFrame | None = None) -> DataFrame:
    """IVF-PQ approximate top-k with exact rerank.

    Search shape (asymmetric distance computation): each query probes its
    ``n_probe`` nearest coarse cells; candidates in those cells are
    scored from their PQ codes alone — approx q·x = q·C[list] +
    Σ_j LUT_q[j, code_j] with the per-query (m × ks) lookup table built
    driver-side — then the top ``k·refine`` per query are reranked with
    exact cosine against the true vectors and the top ``k`` returned.

    At scale: the codes relation (``codes=`` — persist
    :func:`ivfpq_encode` output once) is the only thing scanned per
    search wave, the probe relation is broadcast, and the rerank join
    touches ``|queries|·k·refine`` rows.  Scoring is Arrow-batched numpy
    gathers, never per-row Python.
    """
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    if model is None:
        model = train_ivfpq(df, vec_col, n_lists, m, ks, sample_per_list,
                            train_iters, seed)
    C, books = model["C"], model["codebooks"]
    m, dsub = model["m"], model["dim"] // model["m"]
    if codes is None:
        codes = ivfpq_encode(df, model, id_col, vec_col)

    q_rows = (queries.select(query_id_col, query_vec_col)
              .limit(max_queries + 1).collect())
    if len(q_rows) > max_queries:
        raise ValueError(
            f"ivfpq_knn holds a (m × ks) float LUT per query in the "
            f"executors' closure; got more than max_queries={max_queries} "
            f"queries — batch the query set or raise the cap deliberately")
    probes = []
    luts = {}
    qvecs = []
    for r in q_rows:
        qid = r[query_id_col]
        if r[query_vec_col] is None:
            raise ValueError(
                f"NULL query vector for {query_id_col}={qid!r}; filter "
                "NULL queries before the probe build")
        v = np.asarray(r[query_vec_col], dtype=float)
        base = v @ C.T                       # q·C[list], the ADC IP base
        # probe by the SAME L2 criterion the encoder assigns with
        # (argmax x·c − ||c||²/2) — ranking by raw q·C would chase
        # large-norm centroids and miss the cell holding the neighbors
        crit = base - 0.5 * (C * C).sum(axis=1)
        for lst in np.argsort(-crit)[:n_probe]:
            probes.append((qid, int(lst), float(base[lst])))
        luts[qid] = np.stack([
            v[j * dsub:(j + 1) * dsub] @ books[j].T for j in range(m)])
        qvecs.append((qid, list(map(float, v))))
    sess = df.sparkSession
    qid_type = {f.name: f.dataType.simpleString()
                for f in queries.schema.fields}[query_id_col]
    probe_df = sess.createDataFrame(
        probes, f"{query_id_col} {qid_type}, __list int, __base double")

    @F.pandas_udf("double")
    def _adc(qid_s: pd.Series, base_s: pd.Series,
             code_s: pd.Series) -> pd.Series:
        import numpy as _np

        if len(qid_s) == 0:
            return pd.Series([], dtype=float)
        codes_arr = _np.stack(code_s.to_numpy()).astype(int)   # (B, m)
        lut3 = _np.stack([luts[q] for q in qid_s])             # (B, m, ks)
        gather = _np.take_along_axis(
            lut3, codes_arr[:, :, None], axis=2)[:, :, 0]
        return pd.Series(base_s.to_numpy() + gather.sum(axis=1))

    ensure_udf_serializable()
    cand = codes.join(F.broadcast(probe_df), "__list")
    scored = cand.select(
        query_id_col, id_col,
        _adc(F.col(query_id_col), F.col("__base"),
             F.col("__code")).alias("__approx"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__approx"),
                                                 F.col(id_col))
    short = (scored.withColumn("rank", F.row_number().over(w))
             .where(F.col("rank") <= k * refine)
             .select(query_id_col, id_col))
    qvec_df = sess.createDataFrame(
        qvecs, f"{query_id_col} {qid_type}, {query_vec_col} array<double>")
    rerank = (df.select(id_col, vec_col)
              .join(F.broadcast(short), id_col)
              .join(F.broadcast(qvec_df), query_id_col)
              .select(query_id_col, id_col,
                      cosine(F.col(vec_col).cast("array<double>"),
                             F.col(query_vec_col)).alias("score"))
              .where(F.col("score").isNotNull()))  # see knn_bruteforce
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("score"),
                                                  F.col(id_col))
    return (rerank.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k))
