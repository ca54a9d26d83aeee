"""quantileTestBucket — two-sample quantile test with bucket-bootstrap SEs.

Parity target: the reference gateway macro ``QuantileTestBucketParser.java``
(unparseClickHouse :52-162): per arm, exact quantiles of Y at the requested
percentiles; users hashed into 128 buckets whose per-bucket quantiles are
bootstrap-resampled to estimate each quantile's standard error; then a
normal-approximation test of the relative quantile difference with CI,
power at ``mde``, and a recommended sample size.

Spark-first: two aggregations — ``groupBy(arm)`` for exact arm quantiles
(native ``percentile``) and ``groupBy(arm, bucket)`` for the 128 bucket
quantiles (bounded state) — then the 2×128-row bootstrap runs in numpy on
the driver.  One data scan per aggregation regardless of B.

Deviation from the gateway output: test columns are NULL (not ``''``
strings) on control rows, and CI tuples are split into _lower/_upper
numeric columns.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

N_BUCKETS = 128


def quantile_test_bucket(df: DataFrame, Y: str, index: str, uin: str,
                         percentiles: tuple = (0.25, 0.5, 0.75),
                         alpha: float = 0.05, power: float = 0.8,
                         mde: float = 0.005, n_bootstrap: int = 500,
                         treatment_values: tuple = (0, 1),
                         seed: int = 42) -> pd.DataFrame:
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    ucol = F.col(uin) if uin.isidentifier() else F.expr(uin)
    ycol = F.expr(Y).cast("double")
    v0, v1 = treatment_values
    arm = F.when(idx == F.lit(v0), 0).when(idx == F.lit(v1), 1)
    pct = list(float(p) for p in percentiles)
    parr = F.array(*[F.lit(p) for p in pct])

    sub = (df.where(arm.isNotNull() & ycol.isNotNull())
             .select(arm.alias("arm"), ycol.alias("y"), ucol.alias("uin")))

    # arm-level exact quantiles + counts (quantilesExactExclusive analogue)
    arm_rows = (sub.groupBy("arm")
                .agg(F.percentile("y", parr).alias("q"),
                     F.count(F.lit(1)).alias("cnt")).collect())
    armq = {r["arm"]: (list(r["q"]), float(r["cnt"])) for r in arm_rows}
    if 0 not in armq or 1 not in armq:
        raise ValueError("both arms must be non-empty")

    # 128 hash buckets per arm (murmur3_32, like the gateway's
    # murmurHash3_32(uin)/2^25), per-bucket exact quantiles
    bucket = F.pmod(F.hash(F.col("uin")), F.lit(N_BUCKETS))
    brows = (sub.groupBy("arm", bucket.alias("bucket"))
             .agg(F.percentile("y", parr).alias("q")).collect())
    # sort by bucket id: collect order is partition-layout-dependent, and
    # the bootstrap draws index into this list — sorting makes the SEs
    # reproducible across layouts (and across the grouped variant)
    bq: dict[int, list[list[float]]] = {0: [], 1: []}
    for r in sorted(brows, key=lambda r: (r["arm"], r["bucket"])):
        bq[r["arm"]].append(list(r["q"]))
    return _qtb_finalize(armq, bq, pct, alpha, power, mde,
                         n_bootstrap, seed)


def _qtb_finalize(armq, bq, pct, alpha, power, mde, n_bootstrap,
                  seed) -> pd.DataFrame:
    """Driver-side finalizer over the tiny (arm, bucket) relations: the
    bucket bootstrap, the relative test, power, and the recommended n."""
    # bootstrap std of the bucket-quantile mean (gateway:
    # stddevPop(BootStrap('AVG',128,B)(quantile)))
    rng = np.random.default_rng(seed)
    qstd = np.zeros((2, len(pct)))
    for a in (0, 1):
        vals = np.array(bq[a])               # (n_buckets, n_pct)
        nb = len(vals)
        draws = rng.integers(0, nb, size=(n_bootstrap, nb))
        means = vals[draws].mean(axis=1)     # (B, n_pct)
        qstd[a] = means.std(axis=0, ddof=0)

    z_hi = float(dist.norm_ppf(1 - alpha / 2))
    z_lo = float(dist.norm_ppf(alpha / 2))
    point = z_hi - float(dist.norm_ppf(1 - power))

    out = []
    for j, p in enumerate(pct):
        qx, qy = armq[0][0][j], armq[1][0][j]
        cnt_y = armq[1][1]
        sx, sy = qstd[0, j], qstd[1, j]
        std_samp = sy * math.sqrt(cnt_y)
        abs_diff = qy - qx
        rela = (qy / qx - 1.0) if qx != 0 else (0.0 if qy == 0
                                                else float("inf"))
        # |ratio| scaling: a signed (rela+1) went NEGATIVE when the two
        # quantiles had opposite signs (inverted CIs, test_power 1.0)
        # and inf*0 = NaN when the control quantile was 0
        se_base = math.sqrt(sx * sx + sy * sy)
        se = (se_base * abs(qy / qx) if qx != 0
              else (0.0 if qy == 0 else float("inf")))
        if rela == 0:
            pv = 1.0
        elif math.isinf(rela):
            pv = float("nan")                  # relative scale undefined
        elif se == 0:
            pv = 0.0
        else:
            pv = 2.0 * float(dist.norm_sf(abs(rela / se)))
        # == z*se*qx == z*se_base*qy for the ordinary positive case,
        # but stays finite/ordered for qx == 0 or sign-flipped quantiles
        abs_w = z_hi * se_base * abs(qy)
        rela_w = z_hi * se
        shift = mde / se if se > 0 else float("inf")
        pw = (1.0 if se == 0 else
              1.0 - float(dist.norm_cdf(z_hi - shift))
              + float(dist.norm_cdf(z_lo - shift)))
        recom = (None if math.isinf(rela) else
                 float(math.ceil(se * se * cnt_y * point * point
                                 / (mde * mde))))
        # control row (test columns NULL, like the gateway's '' strings)
        out.append({"percentile": p, "treatment": 0,
                    "quantile_qtb": qx,
                    "std_samp_qtb": sx * math.sqrt(armq[0][1]),
                    "p_value": None, "abs_diff": None,
                    "abs_diff_lower": None, "abs_diff_upper": None,
                    "rela_diff_qtb": None, "rela_diff_lower": None,
                    "rela_diff_upper": None, "test_power": None,
                    "recom_sample_size": None})
        out.append({"percentile": p, "treatment": 1,
                    "quantile_qtb": qy, "std_samp_qtb": std_samp,
                    "p_value": pv, "abs_diff": abs_diff,
                    "abs_diff_lower": abs_diff - abs_w,
                    "abs_diff_upper": abs_diff + abs_w,
                    "rela_diff_qtb": rela,
                    "rela_diff_lower": rela - rela_w,
                    "rela_diff_upper": rela + rela_w,
                    "test_power": pw, "recom_sample_size": recom})
    return pd.DataFrame(out).sort_values(
        ["percentile", "treatment"]).reset_index(drop=True)


def quantile_test_bucket_spark(df: DataFrame, *args, **kwargs) -> DataFrame:
    pdf = quantile_test_bucket(df, *args, **kwargs)
    return df.sparkSession.createDataFrame(pdf)


def quantile_test_bucket_grouped(df: DataFrame, Y: str, index: str,
                                 uin: str, group_cols: list[str],
                                 percentiles: tuple = (0.25, 0.5, 0.75),
                                 alpha: float = 0.05, power: float = 0.8,
                                 mde: float = 0.005, n_bootstrap: int = 500,
                                 treatment_values: tuple = (0, 1),
                                 seed: int = 42,
                                 max_groups: int = 10000) -> pd.DataFrame:
    """Per-segment :func:`quantile_test_bucket` drill-down at
    segment-count-independent scan cost (the glm_grouped shape): ONE
    ``groupBy(segment, arm)`` quantile scan plus ONE
    ``groupBy(segment, arm, bucket)`` quantile scan — the per-segment
    bucket bootstrap then runs on the driver over the bounded
    (segments × 2 × 128) relation, re-seeded per segment so every
    segment's report equals the solo operator run on that segment's rows
    (pytest-equivalence-tested).  Segments missing an arm are skipped
    with a NaN-free absence (no row) rather than a NaN report."""
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    ucol = F.col(uin) if uin.isidentifier() else F.expr(uin)
    ycol = F.expr(Y).cast("double")
    v0, v1 = treatment_values
    arm = F.when(idx == F.lit(v0), 0).when(idx == F.lit(v1), 1)
    pct = list(float(p) for p in percentiles)
    parr = F.array(*[F.lit(p) for p in pct])

    sub = (df.where(arm.isNotNull() & ycol.isNotNull())
             .select(*group_cols, arm.alias("arm"), ycol.alias("y"),
                     ucol.alias("uin")))
    arm_rows = (sub.groupBy(*group_cols, "arm")
                .agg(F.percentile("y", parr).alias("q"),
                     F.count(F.lit(1)).alias("cnt"))
                .limit(2 * max_groups + 1).collect())
    if len(arm_rows) > 2 * max_groups:
        raise ValueError(
            f"more than {max_groups} segments — the per-segment reports "
            "collect to the driver; coarsen the grouping or raise "
            "max_groups")
    bucket = F.pmod(F.hash(F.col("uin")), F.lit(N_BUCKETS))
    brows = (sub.groupBy(*group_cols, "arm", bucket.alias("bucket"))
             .agg(F.percentile("y", parr).alias("q")).collect())

    def _key(r):
        return tuple(r[c] for c in group_cols)

    armq_by_seg: dict = {}
    for r in arm_rows:
        armq_by_seg.setdefault(_key(r), {})[r["arm"]] = \
            (list(r["q"]), float(r["cnt"]))
    bq_by_seg: dict = {}
    # stringified sort key: NULL group values (None) don't compare with
    # strings/numbers; only per-segment (arm, bucket) order must be exact
    for r in sorted(brows, key=lambda r: (tuple(map(str, _key(r))),
                                          r["arm"], r["bucket"])):
        bq_by_seg.setdefault(_key(r), {0: [], 1: []})[r["arm"]].append(
            list(r["q"]))

    frames = []
    for key in sorted(armq_by_seg, key=lambda k: tuple(map(str, k))):
        armq = armq_by_seg[key]
        if 0 not in armq or 1 not in armq:
            continue                         # one-armed segment: no test
        pdf = _qtb_finalize(armq, bq_by_seg[key], pct, alpha, power,
                            mde, n_bootstrap, seed)
        for c, v in zip(group_cols, key):
            pdf.insert(0, c, v)
        frames.append(pdf)
    if not frames:
        raise ValueError("no segment has both arms present")
    return pd.concat(frames, ignore_index=True)


def quantile_treatment_effect(df: DataFrame, Y: str, index: str,
                              quantiles: tuple = (0.25, 0.5, 0.75),
                              treatment_values: tuple = (0, 1),
                              n_bootstrap: int = 0, uin: str | None = None,
                              alpha: float = 0.05, exact: bool = True,
                              relative_error: float = 1e-4,
                              seed: int = 42) -> pd.DataFrame:
    """Quantile treatment effects: QTE(τ) = Q_τ(Y|treated) − Q_τ(Y|control)
    at each requested quantile level (beyond the reference — its quantile
    test reports relative differences of the same arm quantiles; this is
    the standard distributional-effect readout alongside the mean ATE).

    ONE ``groupBy(arm)`` aggregation computes every level's quantile per
    arm (an array of levels — one pass).  ``exact=True`` uses native
    ``percentile`` (exact interpolated, but its aggregation buffer holds
    the arm's VALUES — right for oracle checks and up to ~10⁸ rows/arm);
    ``exact=False`` switches to the Greenwald-Khanna sketch
    (``approx_percentile`` at ``relative_error``), whose state is bounded
    regardless of data size — the only shape that survives 100 TB arms.
    With ``n_bootstrap > 0`` and a ``uin`` column, standard errors come
    from the quantileTestBucket machinery: users hash into 128 buckets,
    per-bucket quantiles are Poisson-resampled in numpy on the driver (a
    second bounded-state aggregation — still one scan, no explode).

    Returns one row per level: quantile, q0, q1, qte [, stderr, lower,
    upper, z, p_value].
    """
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    y = F.expr(Y).cast("double")
    lv = list(float(q) for q in quantiles)
    arm = F.when(idx == F.lit(v0), 0).when(idx == F.lit(v1), 1)
    work = df.where(arm.isNotNull()).select(arm.alias("__arm"),
                                            y.alias("__y"))
    if exact:
        qagg = F.percentile("__y", F.array(*[F.lit(q) for q in lv]))
    else:
        acc = max(int(1.0 / relative_error), 100)
        qagg = F.percentile_approx(
            "__y", F.array(*[F.lit(q) for q in lv]), F.lit(acc))
    rows = work.groupBy("__arm").agg(qagg.alias("qs")).collect()
    for r in rows:
        if r["qs"] is None:
            arm_val = treatment_values[int(r["__arm"])]
            raise ValueError(
                f"quantile_treatment_effect: arm {arm_val!r} has no "
                f"non-NULL {Y!r} values — its percentile array is NULL")
    by_arm = {int(r["__arm"]): list(r["qs"]) for r in rows}
    if set(by_arm) != {0, 1}:
        raise ValueError(
            f"quantile_treatment_effect needs both arms; present: "
            f"{sorted(by_arm)}")
    out = pd.DataFrame({
        "quantile": lv,
        "q0": by_arm[0], "q1": by_arm[1],
        "qte": [a - b for a, b in zip(by_arm[1], by_arm[0])],
    })
    if n_bootstrap <= 0:
        return out
    if uin is None:
        raise ValueError("bootstrap SEs need uin (user/bucket hash column)")
    ucol = F.col(uin) if uin.isidentifier() else F.expr(uin)
    bucket = F.pmod(F.xxhash64(ucol), F.lit(N_BUCKETS))
    if exact:
        bq = F.percentile(y, F.array(*[F.lit(q) for q in lv]))
    else:
        # the bounded-state promise must hold per bucket too: an exact
        # percentile here would buffer 1/128 of the arm's values
        acc = max(int(1.0 / relative_error), 100)
        bq = F.percentile_approx(y, F.array(*[F.lit(q) for q in lv]),
                                 F.lit(acc))
    # NULL-Y rows are excluded like the arm-level pass; a bucket whose
    # Y values are ALL NULL yields qs = NULL and must be dropped (a None
    # inside np.array raised an inhomogeneous-shape ValueError)
    b = (df.where(arm.isNotNull() & y.isNotNull())
         .groupBy(arm.alias("__arm"), bucket.alias("__b"))
         .agg(bq.alias("qs")).collect())
    per_arm: dict[int, np.ndarray] = {}
    for a in (0, 1):
        m = np.array([list(r["qs"]) for r in b
                      if r["__arm"] == a and r["qs"] is not None])
        if m.size == 0:
            raise ValueError(
                f"quantile_treatment_effect: arm {treatment_values[a]!r} "
                f"has no populated buckets for the bootstrap")
        per_arm[a] = m                    # (n_buckets_present, n_levels)
    rng = np.random.default_rng(seed)
    reps = np.empty((n_bootstrap, len(lv)))

    def _weights(nb: int) -> np.ndarray:
        # all-zero Poisson draws (P = e^-nb, ~5% at 3 buckets) would
        # make the replica mean a 0-vector — a wild outlier inflating
        # the bootstrap se; redraw until at least one bucket is kept
        # (the standard conditional-Poisson convention)
        for _ in range(100):
            w = rng.poisson(1.0, nb).astype(float)
            if w.sum() > 0:
                return w
        return np.ones(nb)
    for i in range(n_bootstrap):
        w0 = _weights(per_arm[0].shape[0])
        w1 = _weights(per_arm[1].shape[0])
        m0 = (w0 @ per_arm[0]) / w0.sum()
        m1 = (w1 @ per_arm[1]) / w1.sum()
        reps[i] = m1 - m0
    se = reps.std(axis=0, ddof=1)
    z = float(dist.norm_ppf(1 - alpha / 2))
    out["stderr"] = se
    out["lower"] = out["qte"] - z * se
    out["upper"] = out["qte"] + z * se
    with np.errstate(divide="ignore", invalid="ignore"):
        zs = out["qte"] / se
    out["z"] = zs
    out["p_value"] = 2.0 * dist.norm_sf(np.abs(zs))
    return out
