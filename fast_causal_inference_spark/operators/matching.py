"""Propensity-score matching: caliper / exact matching, SMD balance check.

Parity targets (reference under /root/reference): ``match.py:13-226``,
``caliper_matching_info.h:45-337`` + scalar ``caliper_matching.cpp``,
``ExactMatchingParser.java:28-160``.

The reference needs a two-phase UDAF (pair-count info, then a scalar assigning
pair ids). In Spark the whole thing is a window computation over matching
cells: bucket the score by caliper width, count both arms per
(bucket, exact-keys) cell, give every row a random rank within its
(cell, arm), and keep ranks below the cell quota — rank ties the treated row
to its control(s). One shuffle on the cell key; no driver state; works for
any number of cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def caliper_matching(df: DataFrame, score: str, index: str,
                     caliper: float = 0.05, exacts: list[str] | None = None,
                     k: int = 1, seed: int = 42,
                     treatment_values: tuple = (0, 1),
                     match_col: str = "match_index") -> DataFrame:
    """1:k caliper matching on a (propensity) score.

    Adds ``match_col``: a pair id shared by a treated row and its k matched
    controls within a caliper bucket (+ exact keys); NULL for unmatched rows.
    """
    if caliper <= 0:
        raise ValueError("caliper must be > 0")
    exacts = list(exacts or [])
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    t = F.when(idx == F.lit(v1), 1).when(idx == F.lit(v0), 0)
    bucket = F.floor(F.expr(score).cast("double") / F.lit(float(caliper)))

    out = df.withColumn("__t", t).withColumn("__bucket", bucket)
    cell = ["__bucket", *exacts]

    # Within-arm random order via a DETERMINISTIC per-row hash draw over
    # every (atomic) input column + the seed, ranked in two levels:
    # row_number within (cell, arm, salt=draw mod 64) plus the cumulative
    # counts of lower salts.  The direct form — row_number().over(
    # partitionBy(cell, arm).orderBy(rand(seed))) — puts an entire cell
    # in ONE window partition, and a degenerate score distribution (all
    # scores inside one caliper, the common "matched everything" case)
    # serializes the whole table through a single-core sort: measured
    # 24 s of the 29 s matching family at the ×10 bench replica, and a
    # guaranteed straggler at 100 TB (guide §2.5: one giant key).  The
    # salted form shuffles the data ONCE, sorts bounded partitions, and
    # joins a cells×arms×64-row count relation back on the partitioning
    # keys (no second data exchange).  The hash draw also makes the
    # permutation a pure function of (data, seed) — the old rand(seed)
    # order was partition-layout-dependent — at the cost of changing
    # WHICH equally-eligible rows a given seed matches (counts, quotas,
    # and every oracle-checked aggregate are permutation-invariant).
    _N_SALT = 64                   # FIXED: part of the value contract
    hash_cols = [F.col(fld.name) for fld in df.schema.fields
                 if fld.dataType.typeName() not in
                 ("array", "map", "struct", "binary")]
    draw = F.xxhash64(F.lit(int(seed)), bucket, *hash_cols)
    out = (out.withColumn("__draw", draw)
              .withColumn("__salt", F.pmod(F.col("__draw"),
                                           F.lit(_N_SALT)).cast("int")))
    w_sub = Window.partitionBy(*cell, "__t", "__salt").orderBy("__draw")
    ranked = out.withColumn("__rnsub", F.row_number().over(w_sub))

    cnts = out.groupBy(*cell, "__t", "__salt") \
        .agg(F.count(F.lit(1)).alias("__c"))
    w_off = (Window.partitionBy(*cell, "__t").orderBy("__salt")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_cell = Window.partitionBy(*cell)
    cnts = (cnts
            .withColumn("__off", F.coalesce(F.sum("__c").over(w_off),
                                            F.lit(0)))
            .withColumn("__cnt1", F.sum(
                F.when(F.col("__t") == 1, F.col("__c")).otherwise(0))
                .over(w_cell))
            .withColumn("__cnt0", F.sum(
                F.when(F.col("__t") == 0, F.col("__c")).otherwise(0))
                .over(w_cell))
            .select(*cell, "__t", "__salt", "__off", "__cnt1", "__cnt0"))

    joined = ranked.join(cnts, [*cell, "__t", "__salt"], "left")
    rn = F.col("__rnsub") + F.col("__off")
    quota = F.least(F.col("__cnt1"), F.floor(F.col("__cnt0") / k))

    pair_local = (F.when((F.col("__t") == 1) & (rn <= quota), rn)
                  .when((F.col("__t") == 0) & (rn <= quota * k),
                        F.ceil(rn / k).cast("int")))
    # globally-unique, deterministic pair id from the cell key + local rank
    # NULL-score rows must stay UNMATCHED: a NULL __bucket would
    # otherwise form its own matching cell, pairing treated and control
    # rows purely on score-missingness
    pair_id = F.when(
        pair_local.isNotNull() & F.col("__bucket").isNotNull(),
        F.xxhash64(F.concat_ws("\x1f", F.col("__bucket").cast("string"),
                               *[F.col(c).cast("string") for c in exacts],
                               pair_local.cast("string"))))
    return (joined.withColumn(match_col, pair_id)
                  .drop("__t", "__bucket", "__draw", "__salt", "__rnsub",
                        "__off", "__cnt1", "__cnt0"))


def caliper_matching_signed(df: DataFrame, t_expr: str, score: str,
                            caliper: float = 0.05, k: int = 1,
                            seed: int = 42,
                            match_col: str = "match_index") -> DataFrame:
    """Reference-gateway ``caliperMatching(t_pm1, score, caliper)``
    surface (``CaliperMatchingParser.java`` with_template;
    SqlForwardTest testBasicOp): adds a per-row SIGNED pair index —
    positive on treated rows, negative on controls, 0 when unmatched —
    where a matched treated/control pair shares ``abs(index)``.
    ``t_expr`` evaluates to +1 (treated) / -1 (control), the gateway's
    ``if(x = 1, 1, -1)`` idiom.

    Scale note: the magnitude is the pair's globally-unique
    deterministic hash id rather than the reference's running-sum dense
    index — the dense form needs a single-partition window (a driver
    bottleneck at 100 TB); the sign/zero semantics and pair-sharing
    contract are identical.
    """
    sub = df.withColumn("__cm_t", F.expr(t_expr).cast("int"))
    out = caliper_matching(
        sub, score, "CAST(__cm_t > 0 AS INT)", caliper=caliper, k=k,
        seed=seed, treatment_values=(0, 1), match_col="__cm_pair")
    signed = (F.when(F.col("__cm_pair").isNull(), F.lit(0))
              .otherwise(F.abs(F.col("__cm_pair"))
                         * F.col("__cm_t").cast("long")))
    return (out.withColumn(match_col, signed)
               .drop("__cm_t", "__cm_pair"))


def exact_matching(df: DataFrame, index: str, exacts: list[str],
                   k: int = 1, seed: int = 42,
                   treatment_values: tuple = (0, 1),
                   match_col: str = "match_index") -> DataFrame:
    """Exact matching on key columns only (reference exactMatching macro)."""
    if not exacts:
        raise ValueError("exact_matching needs at least one key column")
    # a constant pseudo-score puts every row in bucket 0
    const = df.withColumn("__score", F.lit(0.0))
    out = caliper_matching(const, "__score", index, caliper=1.0,
                           exacts=exacts, k=k, seed=seed,
                           treatment_values=treatment_values,
                           match_col=match_col)
    return out.drop("__score")


def smd(df: DataFrame, index: str, cols: list[str],
        treatment_values: tuple = (0, 1)) -> pd.DataFrame:
    """Standardized mean differences (balance table) per covariate
    (reference ``match.py:159-226``): (m1 − m0) / √((v0 + v1)/2)."""
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    aggs = []
    for c in cols:
        x = F.expr(c).cast("double")
        for tag, v in (("0", v0), ("1", v1)):
            cond = F.when(idx == F.lit(v), x)
            aggs += [F.avg(cond).alias(f"{c}__m{tag}"),
                     F.var_samp(cond).alias(f"{c}__v{tag}")]
    row = df.agg(*aggs).collect()[0]
    recs = []
    for c in cols:
        m0, m1 = row[f"{c}__m0"], row[f"{c}__m1"]
        vv0, vv1 = row[f"{c}__v0"], row[f"{c}__v1"]
        # EITHER arm with <2 non-null rows leaves its var_samp NULL
        pooled = (np.sqrt((vv0 + vv1) / 2.0)
                  if vv0 is not None and vv1 is not None else float("nan"))
        recs.append({"covariate": c, "mean0": m0, "mean1": m1,
                     "smd": (m1 - m0) / pooled if pooled else float("nan")})
    return pd.DataFrame(recs)


def prognostic_score_matching(df: DataFrame, outcome: str, index: str,
                              covariates: list[str], caliper: float = 0.05,
                              k: int = 1, seed: int = 42,
                              treatment_values: tuple = (0, 1)) -> DataFrame:
    """PSM on a prognostic score: OLS of the outcome fit on CONTROLS only,
    scored on everyone, then caliper matching on the prediction
    (reference ``match.py:299-438``)."""
    from fast_causal_inference_spark.operators.ols import ols

    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, _ = treatment_values
    controls = df.where(idx == F.lit(v0))
    model = ols(controls, f"{outcome} ~ {' + '.join(covariates)}")
    scored = df.withColumn("__prognostic", model.predict_column())
    out = caliper_matching(scored, "__prognostic", index, caliper=caliper,
                           k=k, seed=seed, treatment_values=treatment_values)
    return out


def matching_plot(df: DataFrame, T: str, col: str, bins: int = 50,
                  xlim: tuple | None = None, sample_limit: int = 10000,
                  seed: int = 42, plot: bool = False):
    """Overlaid treatment/control density of ``col`` (reference
    ``dataframe/match.py:228-298`` — samples ≤10k per arm, seaborn
    distplot).  This container has no matplotlib, so the primitive returns
    the binned densities as a pandas DataFrame
    (bin_left, bin_right, density_control, density_treatment); pass
    ``plot=True`` to also draw when matplotlib IS importable.

    Scale: per-arm ``orderBy(rand()).limit(k)`` is a distributed top-k
    (TakeOrderedAndProject), not a global sort — same sampling semantics as
    the reference's ``order by rand() limit 10000``.
    """
    import numpy as np
    import pandas as pd

    tcol = F.expr(T)
    c = F.expr(col).cast("double").alias("v")
    take = lambda arm: [r["v"] for r in (df.where(tcol == arm).select(c)
                        .where(F.col("v").isNotNull())
                        .orderBy(F.rand(seed)).limit(sample_limit).collect())]
    x0 = np.array(take(0), dtype=float)
    x1 = np.array(take(1), dtype=float)
    if len(x0) == 0 or len(x1) == 0:
        raise ValueError("both arms must be non-empty")
    lo, hi = (xlim if xlim is not None
              else (min(x0.min(), x1.min()), max(x0.max(), x1.max())))
    edges = np.linspace(lo, hi, bins + 1)
    d0, _ = np.histogram(x0, bins=edges, density=True)
    d1, _ = np.histogram(x1, bins=edges, density=True)
    out = pd.DataFrame({
        "bin_left": edges[:-1], "bin_right": edges[1:],
        "density_control": d0, "density_treatment": d1,
    })
    if plot:
        try:
            import matplotlib.pyplot as plt
        except ImportError as e:
            raise ImportError("matplotlib not installed; use the returned "
                              "density table instead") from e
        mid = 0.5 * (edges[:-1] + edges[1:])
        plt.figure(figsize=(8, 8))
        plt.plot(mid, d0, label="Control")
        plt.plot(mid, d1, label="Treatment")
        plt.xlabel(col)
        plt.ylabel("density")
        plt.legend()
    return out


def matched_pairs_ttest(df: DataFrame, Y: str, index: str,
                        match_col: str = "match_index",
                        alternative: str = "two-sided",
                        alpha: float = 0.05,
                        treatment_values: tuple = (0, 1)) -> DataFrame:
    """Paired t-test on the matched sample: per pair, the treated outcome
    minus the MEAN of its k matched controls, then a one-sample t-test of
    the differences against 0 — the standard post-matching ATT readout
    (pairing absorbs the between-pair variance the two-sample test would
    pay for).

    ONE ``groupBy(match_index)`` pass builds the pair differences
    (treated sum minus control mean as conditional aggregates), and the
    one-sample test is a second aggregation over the (bounded) pair
    relation.  Unmatched rows (NULL ``match_col``) drop out.

    NULL policy (counts are of NON-NULL outcomes, so the filters agree
    with the sums they validate): a pair whose treated outcome is NULL is
    excluded; a 1:k pair with some NULL control outcomes stays, with the
    control side averaged over its non-NULL members.  ``Y`` is a
    ROW-LEVEL column expression (the outcome of one subject), not an
    aggregate metric formula.
    """
    import re

    from fast_causal_inference_spark.operators.ttest import ttest_1samp

    if re.search(r"\b(avg|mean|sum)\s*\(", Y):
        raise ValueError(
            f"matched_pairs_ttest takes a ROW-LEVEL outcome expression, "
            f"not an aggregate formula; got {Y!r} — pass the bare column "
            f"(the pairing defines the aggregation)")
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    y = F.expr(Y).cast("double")
    t1 = idx == F.lit(v1)
    t0 = idx == F.lit(v0)
    pairs = (df.where(F.col(match_col).isNotNull())
             .groupBy(match_col)
             .agg(F.sum(F.when(t1, y)).alias("__yt"),
                  F.avg(F.when(t0, y)).alias("__yc"),
                  F.count(F.when(t1, y)).alias("__nt"),
                  F.count(F.when(t0, y)).alias("__nc")))
    # a well-formed pair has exactly one treated row and >=1 controls;
    # anything else (collision, half-pair) is excluded, not averaged in
    diffs = (pairs.where((F.col("__nt") == 1) & (F.col("__nc") >= 1))
             .withColumn("__d", F.col("__yt") - F.col("__yc")))
    return ttest_1samp(diffs, "avg(__d)", alternative=alternative, mu=0.0,
                       alpha=alpha)
