"""Training-corpus assembly operators: domain mixing, deterministic global
shuffle, sequence packing, shard writing, quality-weighted sampling.

These are the operations that sit BETWEEN the cleaning/dedup family
(``datapipe.dedup`` / ``datapipe.quality``) and a tokenizer: decide how much
of each source goes into the mix, give every epoch a reproducible global
order, pack variable-length documents into fixed token-budget context
windows, and land the result as evenly-sized shards.

Scale design, per operator:

* **domain mixture** — one tiny ``groupBy(domain)`` count, driver-side rate
  computation, then a single scan with a broadcast rate map: integer-part
  replication via ``explode(array_repeat(...))`` plus a Bernoulli remainder
  drawn from ``xxhash64`` (deterministic under retries, unlike ``rand()``).
  No shuffle of the corpus itself.
* **global shuffle** — ``repartition(hash)`` + ``sortWithinPartitions`` is
  the distributed Fisher-Yates stand-in: every row's position is a pure
  function of (content key, seed), independent of input layout, so two
  clusters reading different splits produce the SAME shard contents.
* **sequence packing** — greedy first-fit inside each partition via
  ``mapInPandas`` (Arrow-batched); pack ids are namespaced by partition id.
  Cross-partition packing would need a global sort for ~1% better fill —
  per-partition greedy on a shuffled corpus is the standard trade.
* **quality-weighted sampling** — pure Column expression; the acceptance
  draw is ``xxhash64``-based so the sample is reproducible and join-stable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fast_causal_inference_spark.serialization import ensure_udf_serializable

__all__ = [
    "domain_mixture_sample",
    "global_shuffle",
    "pack_sequences",
    "quality_weighted_sample",
    "reservoir_sample",
    "stratified_sample",
    "write_training_shards",
]


# above this many distinct domains the mixture rate map becomes a
# broadcast join instead of a literal WHEN chain (codegen method size)
_RATE_CHAIN_MAX = 64


def _unit_draw(*cols: Column | str, seed: int) -> Column:
    """Deterministic U(0,1) per row from xxhash64 — reproducible under task
    retries and input re-splitting (``F.rand`` is neither)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return (F.pmod(F.xxhash64(*cs, F.lit(seed)), F.lit(1_000_000))
            .cast("double") / 1_000_000.0)


def domain_mixture_sample(df: DataFrame, domain_col: str,
                          target_weights: dict | None = None,
                          temperature: float = 1.0,
                          total_rows: int | None = None,
                          id_cols: list[str] | None = None,
                          seed: int = 42,
                          max_upsample: float = 100.0) -> DataFrame:
    """Resample a multi-source corpus to a target domain mixture.

    ``target_weights`` maps domain → relative weight (normalized
    internally); with ``target_weights=None`` the natural distribution is
    temperature-smoothed instead: w_d ∝ p_d^temperature (T < 1 upweights
    rare domains — the multilingual-sampling rule of Conneau & Lample).
    ``total_rows`` sets the output size (default: input size).  Domains
    may be both down- and up-sampled; upsampling replicates rows
    (integer part via ``array_repeat`` explode + Bernoulli remainder) and
    is capped at ``max_upsample`` copies to keep a typo'd weight from
    exploding the corpus.  The replica index is returned as ``__replica``
    so downstream shuffling can separate copies.

    One count aggregation + one corpus scan; the rate map is a broadcast
    literal, so the corpus itself never shuffles.
    """
    counts = {r["d"]: r["n"] for r in
              df.groupBy(F.col(domain_col).alias("d"))
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    if not counts:
        return df.withColumn("__replica", F.lit(0))
    n_in = sum(counts.values())
    if target_weights is None:
        target_weights = {d: (n / n_in) ** temperature for d, n in
                          counts.items()}
    tot_w = sum(target_weights.get(d, 0.0) for d in counts)
    if tot_w <= 0:
        raise ValueError("target_weights assign zero mass to every "
                         "observed domain")
    n_out = total_rows if total_rows is not None else n_in
    rates = {}
    for d, n in counts.items():
        want = n_out * target_weights.get(d, 0.0) / tot_w
        rates[d] = min(want / n, max_upsample) if n else 0.0

    # default draw keys: EVERY column, not the domain — hashing only the
    # (low-cardinality) domain gives all rows of a domain the same
    # U(0,1) draw, keeping or dropping whole domains wholesale instead
    # of sampling within them (stratified/reservoir already default to
    # df.columns for the same reason)
    draw_cols = id_cols or list(df.columns)
    work = df
    use_join = len(rates) > _RATE_CHAIN_MAX
    if use_join:
        # high-cardinality domains: a literal WHEN chain over thousands
        # of keys blows Janino's 64 KB codegen method limit (interpreted
        # fallback, ~10× slower) — broadcast-join the rate relation
        # instead.  eqNullSafe: a NULL domain is a real (counted,
        # weighted) key.
        # dtype via a resolved projection, NOT df.schema[domain_col]:
        # the schema lookup raises KeyError for nested field references
        # ('meta.domain') that F.col resolves fine
        dom_type = df.select(F.col(domain_col)).schema[0].dataType
        rate_rel = df.sparkSession.createDataFrame(
            [(d, float(r)) for d, r in rates.items()],
            T.StructType([
                T.StructField("__dom", dom_type),
                T.StructField("__rate", T.DoubleType()),
            ]))
        work = (df.join(F.broadcast(rate_rel),
                        F.col(domain_col).eqNullSafe(F.col("__dom")),
                        "left")
                .drop("__dom"))
        rate = F.coalesce(F.col("__rate"), F.lit(0.0))
    else:
        expr = None
        for d, r in rates.items():
            # null-safe: a NULL domain is a real (counted, weighted) key
            # — plain == against lit(None) is never true and would
            # silently drop the whole NULL-domain mass from the output
            cond = (F.col(domain_col).isNull() if d is None
                    else F.col(domain_col) == F.lit(d))
            expr = F.when(cond, r) if expr is None else expr.when(cond, r)
        rate = expr.otherwise(F.lit(0.0)) if expr is not None \
            else F.lit(0.0)
    u = _unit_draw(*draw_cols, seed=seed)
    n_copies = (F.floor(rate)
                + (u < (rate - F.floor(rate))).cast("long")).cast("int")
    out = (work.withColumn("__n_copies", n_copies)
           .where(F.col("__n_copies") > 0)
           .withColumn("__replica",
                       F.explode(F.sequence(F.lit(0),
                                            F.col("__n_copies") - 1)))
           .drop("__n_copies"))
    return out.drop("__rate")        # no-op on the WHEN-chain path


def global_shuffle(df: DataFrame, seed: int = 42,
                   key_cols: list[str] | None = None,
                   num_partitions: int | None = None) -> DataFrame:
    """Deterministic global pseudorandom shuffle for epoch ordering.

    Every row's position is a pure function of (key columns, seed): rows
    are hash-repartitioned and sorted by ``xxhash64(keys, seed)``, so the
    result is reproducible across runs, clusters, and input layouts —
    unlike ``orderBy(rand())``.  Different seeds give independent epoch
    orders.  Cost: exactly one shuffle + in-partition sort (no global
    sort barrier — shard boundaries are hash boundaries, which is what a
    training loader needs)."""
    cols = key_cols or df.columns
    h = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    out = df.withColumn("__shuffle_key", h)
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return (out.repartition(n, F.col("__shuffle_key"))
            .sortWithinPartitions("__shuffle_key")
            .drop("__shuffle_key"))


def pack_sequences(df: DataFrame, size_col: str, max_tokens: int,
                   id_col: str = "doc_id",
                   truncate_oversize: bool = True) -> DataFrame:
    """Greedy first-fit packing of documents into fixed token budgets.

    Adds ``pack_id`` (globally unique: partition-namespaced), ``pack_pos``
    (document's index inside its pack) and ``pack_fill`` (tokens already
    in the pack BEFORE this document).  Documents larger than
    ``max_tokens`` get a pack of their own (``truncate_oversize=True``
    marks them with ``oversize=true`` for a downstream splitter to deal
    with; ``False`` raises on first encounter).

    Packing runs per partition over Arrow batches: first-fit against the
    list of open packs, closing a pack once nothing fits.  Shuffle-free;
    run :func:`global_shuffle` first if input order correlates with
    length (sorted-by-source corpora pack ~worse by a few percent).
    """
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("pack_id", T.LongType()),
        T.StructField("pack_pos", T.IntegerType()),
        T.StructField("pack_fill", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ])
    cols = [f.name for f in df.schema.fields]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << 40                      # partition-namespaced ids
        open_packs: list[tuple[int, int, int]] = []  # (pack_id, fill, npos)
        next_pack = 0

        for pdf in batches:
            pack_ids, poss, fills, overs = [], [], [], []
            for sz in pdf[size_col]:
                sz = int(sz) if sz == sz else 0
                oversize = sz > max_tokens
                if oversize and not truncate_oversize:
                    raise ValueError(
                        f"document of {sz} tokens exceeds max_tokens="
                        f"{max_tokens}; pass truncate_oversize=True or "
                        f"split upstream")
                placed = None
                if not oversize:
                    for i, (pk, fill, npos) in enumerate(open_packs):
                        if fill + sz <= max_tokens:
                            placed = (pk, fill, npos)
                            open_packs[i] = (pk, fill + sz, npos + 1)
                            if fill + sz == max_tokens:
                                open_packs.pop(i)
                            break
                if placed is None:
                    pk = base + next_pack
                    next_pack += 1
                    placed = (pk, 0, 0)
                    if not oversize and sz < max_tokens:
                        open_packs.append((pk, sz, 1))
                    if len(open_packs) > 64:   # bound open-pack state
                        open_packs.pop(0)
                pack_ids.append(placed[0])
                fills.append(placed[1])
                poss.append(placed[2])
                overs.append(oversize)
            pdf = pdf.copy()
            pdf["pack_id"] = pd.Series(pack_ids, dtype="int64").values
            pdf["pack_pos"] = pd.Series(poss, dtype="int32").values
            pdf["pack_fill"] = pd.Series(fills, dtype="int64").values
            pdf["oversize"] = overs
            yield pdf[cols + ["pack_id", "pack_pos", "pack_fill",
                              "oversize"]]

    return df.mapInPandas(pack, out_schema)


def quality_weighted_sample(df: DataFrame, weight_col: str,
                            fraction: float, seed: int = 42,
                            id_cols: list[str] | None = None) -> DataFrame:
    """Bernoulli sample with per-row acceptance ∝ quality weight.

    Acceptance probability is ``fraction · w / E[w]`` (clamped to 1), so
    the EXPECTED output size is ``fraction`` of the input while
    high-quality rows are over-represented.  The draw is xxhash64-based
    (reproducible, retry-stable).  One mean aggregation + one scan."""
    mean_w = df.agg(F.avg(F.col(weight_col).cast("double"))).collect()[0][0]
    # NaN check matters: avg() propagates a NaN weight, NaN is truthy
    # and NaN <= 0 is False, so the old guard passed and `u < NaN·…`
    # silently returned an EMPTY sample
    if mean_w is None or mean_w != mean_w or mean_w <= 0:
        raise ValueError(
            f"mean({weight_col}) must be a positive number, got {mean_w!r}"
            " — NaN weights poison the acceptance probability")
    p = F.least(F.lit(1.0),
                F.lit(fraction) * F.col(weight_col).cast("double") / mean_w)
    # default draw keys: every column — a discrete weight column alone
    # would give identical draws per weight tier (see
    # domain_mixture_sample's draw_cols note)
    u = _unit_draw(*(id_cols or list(df.columns)), seed=seed)
    return df.where(u < p)


def stratified_sample(df: DataFrame, strata_cols: list[str] | str,
                      fractions: dict | float | None = None,
                      n_per_stratum: int | None = None, seed: int = 42,
                      id_cols: list[str] | None = None) -> DataFrame:
    """Deterministic stratified sampling — by rate or by exact count.

    Exactly one of ``fractions`` / ``n_per_stratum``:

    * ``fractions`` — a float (same rate everywhere) or, for a single
      stratum column, a dict mapping stratum value → rate. Pure
      projection + filter over an xxhash64 draw: NO shuffle, retry- and
      layout-stable (``df.sampleBy`` is neither).
    * ``n_per_stratum`` — exactly k rows per stratum, the k lowest hash
      draws (i.e., a per-stratum seeded reservoir). One shuffle by
      stratum; Spark's WindowGroupLimit pushes the rank ≤ k bound
      map-side, so hot strata never materialize a full sort.

    Dict ``fractions`` assign rate 0.0 to every stratum value NOT listed
    (same drop-by-default contract as ``domain_mixture_sample``'s
    ``target_weights``) — list a stratum explicitly to keep it.
    """
    strata = [strata_cols] if isinstance(strata_cols, str) else \
        list(strata_cols)
    if (fractions is None) == (n_per_stratum is None):
        raise ValueError("pass exactly one of fractions / n_per_stratum")
    u = _unit_draw(*(id_cols or df.columns), seed=seed)
    if fractions is not None:
        if isinstance(fractions, dict):
            if len(strata) != 1:
                raise ValueError("dict fractions require a single "
                                 "stratum column")
            expr = None
            for v, r in fractions.items():
                cond = F.col(strata[0]) == F.lit(v)
                expr = F.when(cond, float(r)) if expr is None \
                    else expr.when(cond, float(r))
            rate = expr.otherwise(F.lit(0.0))
        else:
            rate = F.lit(float(fractions))
        return df.where(u < rate)
    # rank by the FULL 64-bit hash (the 1e6-bucket unit draw collides at
    # the birthday bound), with the key columns as final tie-break so a
    # genuinely tied draw cannot fall back to physical layout order
    h = F.xxhash64(*[F.col(c) for c in (id_cols or df.columns)],
                   F.lit(seed))
    w = Window.partitionBy(*strata).orderBy(
        h.asc(), *[F.col(c).asc() for c in (id_cols or df.columns)])
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= int(n_per_stratum))
            .drop("__rk"))


def reservoir_sample(df: DataFrame, n: int, seed: int = 42,
                     id_cols: list[str] | None = None) -> DataFrame:
    """Deterministic uniform sample of exactly ``n`` rows — the n lowest
    xxhash64 draws, equivalent to a seeded reservoir but reproducible
    across runs, clusters, and input layouts. ``orderBy(draw).limit(n)``
    compiles to ``TakeOrderedAndProject``: each partition keeps only its
    local top-n and the driver merges heaps, so no global sort ever
    happens and memory is O(n · partitions) worst-case.

    The ordering key is the full 64-bit hash plus the key columns as
    tie-break, so rows straddling the limit boundary can never be
    resolved by physical layout order."""
    cols = id_cols or df.columns
    h = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    return (df.withColumn("__draw", h)
            .orderBy("__draw", *[F.col(c).asc() for c in cols])
            .limit(int(n)).drop("__draw"))


def write_training_shards(df: DataFrame, path: str, num_shards: int,
                          seed: int = 42,
                          key_cols: list[str] | None = None,
                          format: str = "parquet") -> None:
    """Land a deterministically shuffled corpus as ``num_shards`` evenly
    sized files — the final step of a training-data pipeline.  One
    shuffle (the epoch shuffle doubles as the shard partitioner)."""
    (global_shuffle(df, seed=seed, key_cols=key_cols,
                    num_partitions=num_shards)
     .write.mode("overwrite").format(format).save(path))
