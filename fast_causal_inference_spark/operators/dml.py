"""Double Machine Learning: LinearDML and NonParamDML by k-fold cross-fitting.

Parity targets: reference ``uplift.py:2163-2360`` (LinearDML — folds via
``rowNumberInAllBlocks() %% cv``, per-fold OLS residualization, final OLS of
ỹ on t̃ [+ t̃·X interactions]) and ``NonParamDMLParser.java:29-131`` (weighted
final stage: ỹ/t̃ on X with weight t̃²).

Spark-first: folds come from a deterministic row hash; ALL ``2·cv`` nuisance
fits are solved from ONE ``groupBy(fold)`` Gramian scan (the joint Gramian
over ``covariates+[Y,T]`` holds every cross-product both targets need, and a
fold's complement is the sum of the other folds' rows — Gramians are
additive); out-of-fold residual columns are pure ``CASE WHEN`` expressions,
so the final stage is one more aggregation over codegen'd columns. Two
passes over the data total, regardless of ``cv``. No row ever moves to the
driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.ols import OlsModel, ols


def _fold_column(df: DataFrame, cv: int, fold_col: str, seed: int,
                 fold_expr: str | None = None,
                 hash_cols: list[str] | None = None) -> DataFrame:
    """Deterministic fold id ∈ [0, cv) from a row hash (reference uses
    rowNumberInAllBlocks %% cv; a hash is order-stable under repartitioning).
    ``fold_expr`` overrides with a user expression (e.g. ``id % 3``).
    ``hash_cols`` restricts the default hash to pre-treatment columns —
    hashing the whole row would make fold membership a function of Y/T and
    weaken the cross-fitting independence argument."""
    if fold_expr is not None:
        return df.withColumn(fold_col,
                             F.pmod(F.expr(fold_expr), F.lit(cv)).cast("int"))
    cols = hash_cols if hash_cols else df.columns
    h = F.xxhash64(*[F.expr(c) for c in cols], F.lit(seed))
    return df.withColumn(fold_col, F.pmod(h, F.lit(cv)).cast("int"))


@dataclass
class DMLResult:
    """Final-stage model over treatment residuals.

    ``theta`` — constant effect (LinearDML without X-heterogeneity) or the
    coefficient vector over [1, X…] (CATE model).
    """

    theta: np.ndarray
    stderr: np.ndarray
    names: list[str]
    final_model: OlsModel
    hetero_exprs: list[str]

    @property
    def ate(self) -> float:
        return float(self.theta[0])

    def effect_column(self) -> Column:
        out: Column = F.lit(float(self.theta[0]))
        for b, e in zip(self.theta[1:], self.hetero_exprs):
            out = out + float(b) * F.expr(e).cast("double")
        return out

    def effect(self, df: DataFrame, alias: str = "effect") -> DataFrame:
        return df.withColumn(alias, self.effect_column())

    def summary(self):
        import pandas as pd

        from fast_causal_inference_spark import stats_distributions as dist

        z = self.theta / self.stderr
        return pd.DataFrame({
            "name": self.names, "estimate": self.theta, "stderr": self.stderr,
            "z_value": z, "p_value": 2.0 * dist.norm_sf(np.abs(z)),
        })


def _check_conditioned(model, fold: int, which: str,
                       threshold: float = 1e10) -> None:
    """Reject a nuisance fit whose normal equations are effectively
    singular — e.g. a binary control whose fold hash put each value in
    its own fold, leaving complements with zero covariate variance.
    cond(XᵀX) == cond((XᵀX)⁻¹), so the stored inverse suffices."""
    c = float(np.linalg.cond(model.xtx_inv))
    if not np.isfinite(c) or c > threshold:
        raise ValueError(
            f"fold {fold}: the {which} nuisance fit is rank-deficient "
            f"(cond≈{c:.2e}) — the fold partition is degenerate in the "
            f"covariates (low-cardinality controls hash into aligned "
            f"folds); pass fold_expr with a row id")


def _subrow(full: dict, idx: list[int]) -> dict:
    """Project a joint sufficient-statistics row (over ``m`` base exprs)
    down to the sub-model whose base positions are ``idx`` (y last),
    renamed to the ``n``/``s{i}``/``c{i}_{j}`` keys ``_fit_from_row``
    expects.  Gramians are additive and permutation-stable, so slicing
    loses nothing."""
    out = {"n": full["n"]}
    for a, i in enumerate(idx):
        out[f"s{a}"] = full[f"s{i}"]
        for b in range(a, len(idx)):
            j = idx[b]
            lo, hi = (i, j) if i <= j else (j, i)
            out[f"c{a}_{b}"] = full[f"c{lo}_{hi}"]
    return out


def _dml_residuals(df: DataFrame, Y: str, T: str, covariates: list[str],
                   cv: int, fold_col: str) -> DataFrame:
    """Out-of-fold OLS residual columns ``__res_y``/``__res_t`` for BOTH
    nuisances from ONE grouped scan.

    The joint Gramian over ``covariates + [Y, T]`` grouped by fold contains
    every cross-product both nuisance fits need; each fold's complement
    Gramian is the sum of the other folds' rows (Gramians are additive — the
    CUPAC pattern, ``operators/ttest.py:431``), so all ``2·cv`` fits cost one
    aggregation instead of ``2·cv`` full scans.  Rows where any of
    ``covariates + [Y, T]`` is NULL drop out of BOTH fits (DML needs complete
    cases anyway; the final-stage residual is NULL for them and the final
    OLS skips them).
    """
    from fast_causal_inference_spark.operators.ols import _fit_from_row
    from fast_causal_inference_spark.operators.suffstats import (
        suffstat_agg_columns,
    )

    base = list(covariates) + [Y, T]
    aggs = suffstat_agg_columns(base)
    rows = df.groupBy(fold_col).agg(*aggs).collect()
    by_fold = {int(r[fold_col]): r.asDict() for r in rows
               if r[fold_col] is not None}
    stat_keys = [k for k in (rows[0].asDict() if rows else {})
                 if k != fold_col]
    k = len(covariates)
    idx_y = list(range(k)) + [k]        # covariates + Y
    idx_t = list(range(k)) + [k + 1]    # covariates + T

    if len(by_fold) < cv:
        raise ValueError(
            f"only {len(by_fold)} of {cv} folds are populated — the "
            f"default fold hash of the covariates cannot spread "
            f"low-cardinality controls; pass fold_expr with a row id")
    pred_y = pred_t = None
    for f in range(cv):
        summed = {key: sum(float(by_fold[g][key] or 0.0)
                           for g in by_fold if g != f)
                  for key in stat_keys}
        # guard on COMPLETE CASES (the Gramian's n), not the raw row
        # count: NULL-heavy complements would otherwise pass and fit
        # silent pinv garbage
        if summed.get("n", 0.0) < k + 2:
            raise ValueError(
                f"fold {f}: only {int(summed.get('n', 0))} complete rows "
                f"outside the fold — not enough to fit {k} covariates; "
                f"check cv/fold_expr")
        # complete-case n (the Gramian's), matching ols()'s unweighted
        # df_resid contract
        n_c = summed["n"]
        my = _fit_from_row(_subrow(summed, idx_y), list(covariates), Y,
                           True, n_c, None)
        mt = _fit_from_row(_subrow(summed, idx_t), list(covariates), T,
                           True, n_c, None)
        _check_conditioned(my, f, "outcome")
        _check_conditioned(mt, f, "treatment")
        cy, ct = my.predict_column(), mt.predict_column()
        pred_y = F.when(F.col(fold_col) == f, cy) if pred_y is None \
            else pred_y.when(F.col(fold_col) == f, cy)
        pred_t = F.when(F.col(fold_col) == f, ct) if pred_t is None \
            else pred_t.when(F.col(fold_col) == f, ct)
    return (df.withColumn("__res_y", F.expr(Y).cast("double") - pred_y)
              .withColumn("__res_t", F.expr(T).cast("double") - pred_t))


def linear_dml(df: DataFrame, Y: str, T: str, X: list[str],
               W: list[str] | None = None, cv: int = 3, seed: int = 42,
               heterogeneity: list[str] | None = None,
               fold_expr: str | None = None) -> DMLResult:
    """LinearDML: residualize Y and T on X(+W) out-of-fold, then OLS of
    ỹ on [t̃, t̃·heterogeneity…] without intercept bias on t̃.

    ``heterogeneity`` — feature expressions whose interaction with t̃ models
    CATE; empty → constant-effect DML (partially linear model).
    """
    controls = list(X) + list(W or [])
    if not controls:
        raise ValueError("DML needs at least one control covariate")
    hetero = list(heterogeneity or [])
    work = _fold_column(df, cv, "__fold", seed, fold_expr, hash_cols=controls)
    work = _dml_residuals(work, Y, T, controls, cv, "__fold")

    terms = ["__res_t"] + [f"__res_t*({e})" for e in hetero]
    final = ols(work, f"__res_y ~ {' + '.join(terms)}", use_bias=True)
    # drop the (near-zero) intercept from the effect representation
    theta = final.beta[1:]
    stderr = final.stderr[1:]
    names = [T] + [f"{T}*{e}" for e in hetero]
    return DMLResult(theta=theta, stderr=stderr, names=names,
                     final_model=final, hetero_exprs=hetero)


def linear_dml_grouped(df: DataFrame, Y: str, T: str, X: list[str],
                       group_cols: list[str], W: list[str] | None = None,
                       cv: int = 3, seed: int = 42,
                       fold_expr: str | None = None,
                       max_cells: int = 10_000):
    """Per-segment constant-effect LinearDML — the xexpt-drill-down
    pattern applied to DML.

    ONE ``groupBy(*group_cols, fold)`` joint-Gramian scan yields every
    (segment × fold) sufficient-statistics row; each segment's ``2·cv``
    nuisance fits solve on the driver from its complement sums, and a
    SECOND scan aggregates every segment's final-stage residual moments
    (a broadcast join against the tiny per-(segment, fold) coefficient
    relation — plan size linear in segments, null-safe on the group
    values).  Two passes total for ANY number of segments — never a
    per-segment Spark job.

    Returns a pandas DataFrame (group_cols…, theta, stderr, n).
    """
    import pandas as pd

    from fast_causal_inference_spark.operators.ols import _fit_from_row
    from fast_causal_inference_spark.operators.suffstats import (
        suffstat_agg_columns,
    )

    controls = list(X) + list(W or [])
    if not controls:
        raise ValueError("DML needs at least one control covariate")
    if not group_cols:
        raise ValueError("group_cols must be non-empty (use linear_dml)")
    work = _fold_column(df, cv, "__fold", seed, fold_expr,
                        hash_cols=controls)

    base = list(controls) + [Y, T]
    aggs = suffstat_agg_columns(base)
    rows = (work.groupBy(*group_cols, "__fold").agg(*aggs)
            .limit(max_cells * cv + 1).collect())
    if len(rows) > max_cells * cv:
        raise ValueError(
            f"more than max_cells={max_cells} segments; coarsen "
            f"group_cols or raise max_cells")
    k = len(controls)
    idx_y = list(range(k)) + [k]
    idx_t = list(range(k)) + [k + 1]
    stat_keys = [c for c in (rows[0].asDict() if rows else {})
                 if c not in set(group_cols) | {"__fold"}]

    # one canonical NaN per process: Python hashes each float('nan')
    # object separately (a NaN-keyed segment would fragment into one
    # pseudo-segment per row and then miss the second-pass dict lookup),
    # while Spark's own grouping/eqNullSafe already treat NaN as one key
    _NAN = float("nan")

    def _norm_key(vals) -> tuple:
        return tuple(_NAN if isinstance(v, float) and v != v else v
                     for v in vals)

    by_seg: dict = {}
    for r in rows:
        key = _norm_key(r[c] for c in group_cols)
        if r["__fold"] is not None:
            by_seg.setdefault(key, {})[int(r["__fold"])] = r.asDict()

    # per-(segment, fold) nuisance coefficients -> a TINY broadcast
    # relation joined back on the actual group VALUES (null-safe equality,
    # so NULL segment keys and non-canonical stringifications are exact —
    # and the plan stays linear in segments, unlike a CASE WHEN chain)
    seg_models: dict = {}
    bad: list = []
    for key, folds in by_seg.items():
        preds = {}
        ok = True
        for f in range(cv):
            summed = {sk: sum(float(folds[g][sk] or 0.0)
                              for g in folds if g != f)
                      for sk in stat_keys}
            if summed.get("n", 0.0) < k + 2:
                ok = False
                break
            my = _fit_from_row(_subrow(summed, idx_y), controls, Y,
                               True, summed["n"], None)
            mt = _fit_from_row(_subrow(summed, idx_t), controls, T,
                               True, summed["n"], None)
            # same conditioning guard the ungrouped path applies: a
            # degenerate segment must surface as a NaN row, not as
            # confidently-wrong theta/stderr from a near-singular solve
            try:
                _check_conditioned(my, f, "outcome")
                _check_conditioned(mt, f, "treatment")
            except ValueError:
                ok = False
                break
            preds[f] = (my, mt)
        if ok:
            seg_models[key] = preds
        else:
            bad.append(key)

    if not seg_models:
        return pd.DataFrame(columns=[*group_cols, "theta", "stderr", "n"])

    coef_rows = []
    for key, preds in seg_models.items():
        for f, (my, mt) in preds.items():
            coef_rows.append((*key, f,
                              [float(b) for b in my.beta],
                              [float(b) for b in mt.beta]))
    gtypes = dict(work.select(*group_cols).dtypes)
    coef_schema = (", ".join(f"`{c}` {gtypes[c]}" for c in group_cols)
                   + ", __fold int, __by array<double>, __bt array<double>")
    coefs = work.sparkSession.createDataFrame(coef_rows, coef_schema)
    left = work.alias("w")
    right = F.broadcast(coefs.alias("c"))
    join_cond = F.col("w.__fold") == F.col("c.__fold")
    for c in group_cols:
        join_cond = join_cond & \
            F.col(f"w.`{c}`").eqNullSafe(F.col(f"c.`{c}`"))
    joined = left.join(right, join_cond, "inner").drop(F.col("c.__fold"))
    for c in group_cols:
        joined = joined.drop(F.col(f"c.`{c}`"))
    xdot = [F.expr(e).cast("double") for e in controls]

    def _pred(arr: str) -> Column:
        out: Column = F.col(arr)[0]
        for i, x in enumerate(xdot):
            out = out + F.col(arr)[i + 1] * x
        return out

    ry = F.expr(Y).cast("double") - _pred("__by")
    rt = F.expr(T).cast("double") - _pred("__bt")
    out_rows = (joined.withColumn("__ry", ry).withColumn("__rt", rt)
                .where(F.col("__ry").isNotNull() & F.col("__rt").isNotNull())
                .groupBy(*group_cols)
                .agg(F.sum(F.col("__rt") * F.col("__ry")).alias("sty"),
                     F.sum(F.col("__rt") * F.col("__rt")).alias("stt"),
                     F.sum(F.col("__ry") * F.col("__ry")).alias("syy"),
                     F.sum("__rt").alias("srt"), F.sum("__ry").alias("sry"),
                     F.count(F.lit(1)).alias("n")).collect())
    recs = []
    for r in out_rows:
        key = _norm_key(r[c] for c in group_cols)
        if key not in seg_models:
            continue
        stt, sty, syy = (float(r["stt"]), float(r["sty"]), float(r["syy"]))
        srt, sry, n = float(r["srt"]), float(r["sry"]), float(r["n"])
        # intercept-included simple OLS of ỹ on t̃ — the exact final stage
        # linear_dml runs, so per-segment values match a filtered call
        sxx = stt - srt * srt / n
        sxy = sty - srt * sry / n
        syy_c = syy - sry * sry / n
        theta = sxy / sxx if sxx > 0 else float("nan")
        ssr = max(syy_c - theta * sxy, 0.0)
        sigma2 = ssr / (n - 2) if n > 2 else float("nan")
        se = float(np.sqrt(sigma2 / sxx)) if sxx > 0 else float("nan")
        recs.append({**{c: r[c] for c in group_cols},
                     "theta": theta, "stderr": se, "n": n})
    for key in bad:
        recs.append({**dict(zip(group_cols, key)),
                     "theta": float("nan"), "stderr": float("nan"),
                     "n": float("nan")})
    return pd.DataFrame(recs).sort_values(group_cols) \
        .reset_index(drop=True)


def non_param_dml(df: DataFrame, Y: str, T: str, X: list[str],
                  W: list[str] | None = None, cv: int = 3, seed: int = 42,
                  heterogeneity: list[str] | None = None,
                  fold_expr: str | None = None) -> DMLResult:
    """NonParamDML: final stage regresses ỹ/t̃ on [1, heterogeneity…] with
    weight t̃² (reference NonParamDMLParser.java:29-131).

    SE conventions differ by path, deliberately: the intercept-only
    moment estimator carries the double-ML sandwich SE
    (Chernozhukov et al. 2018 — Var(θ) = Σ(t̃(ỹ−θt̃))²/(Σt̃²)²), while a
    heterogeneity final stage reports that WLS model's own classical
    inference, matching the reference's final-model summary."""
    controls = list(X) + list(W or [])
    if not controls:
        # _fold_column would otherwise hash ALL columns — including Y
        # and T — making fold membership outcome-dependent, the exact
        # hazard cross-fitting exists to avoid (same guard as linear_dml)
        raise ValueError("DML needs at least one control covariate")
    hetero = list(heterogeneity or [])
    work = _fold_column(df, cv, "__fold", seed, fold_expr, hash_cols=controls)
    work = _dml_residuals(work, Y, T, controls, cv, "__fold")
    # the division is guarded PER ROW (not only by the filter): under
    # ANSI mode a zero residual would raise DIVIDE_BY_ZERO during any
    # evaluation that happens before the filter (e.g. local-relation
    # constant folding), even though the row is about to be dropped
    safe = F.abs(F.col("__res_t")) > 1e-12
    work = (work.withColumn(
                "__ratio",
                F.when(safe, F.col("__res_y") / F.col("__res_t")))
                .withColumn("__w", F.col("__res_t") * F.col("__res_t"))
                .where(safe))
    if hetero:
        final = ols(work, f"__ratio ~ {' + '.join(hetero)}", use_bias=True,
                    weight="__w")
        theta, stderr = final.beta, final.stderr
    else:
        # intercept-only weighted mean: θ = Σw·r/Σw — which algebraically
        # equals the classic DML moment Σ(t̃·ỹ)/Σt̃², with a sandwich SE.
        # The sandwich numerator Σ(w(r−θ))² expands into three moments of
        # the SAME scan (Σw²r², Σw²r, Σw²), so one aggregation suffices
        row = work.agg(
            F.sum(F.col("__w") * F.col("__ratio")).alias("swr"),
            F.sum("__w").alias("sw"),
            F.sum(F.col("__w") * F.col("__w")
                  * F.col("__ratio") * F.col("__ratio")).alias("sw2r2"),
            F.sum(F.col("__w") * F.col("__w")
                  * F.col("__ratio")).alias("sw2r"),
            F.sum(F.col("__w") * F.col("__w")).alias("sw2"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        if not row["n"] or row["sw"] is None or float(row["sw"]) <= 0:
            raise ValueError(
                "non_param_dml: no usable rows — every treatment "
                "residual is (near-)zero, i.e. the controls predict T "
                "perfectly; theta is unidentified")
        theta0 = float(row["swr"]) / float(row["sw"])
        # Σ(w(r−θ))² = Σw²r² − 2θΣw²r + θ²Σw²
        s2 = max(float(row["sw2r2"]) - 2 * theta0 * float(row["sw2r"])
                 + theta0 * theta0 * float(row["sw2"]), 0.0)
        se0 = float(np.sqrt(s2) / float(row["sw"]))
        theta, stderr = np.array([theta0]), np.array([se0])
        final = None
    names = (["(Intercept)"] + hetero) if hetero else ["theta"]
    return DMLResult(theta=theta, stderr=stderr, names=names,
                     final_model=final, hetero_exprs=hetero)
