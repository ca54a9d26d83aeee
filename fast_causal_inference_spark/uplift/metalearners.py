"""Uplift meta-learners: S / T / X / R / DR-learner, class-variable
transformation, transformed outcome, propensity model.

The reference ships these as PySpark/MLlib code (``lib/spark_upliftml.py`` —
treated as a semantic spec; implementation here is fresh and built on this
package's closed-form OLS/logistic so the fits are single-pass Gramian
aggregations instead of iterative MLlib jobs; any scoring is a pure Column
dot-product).

All learners expose ``fit(df) -> self`` and ``predict(df, alias='ite')``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.logistic import logistic_regression
from fast_causal_inference_spark.operators.ols import ols, ols_grouped


def _formula(y: str, feats: list[str]) -> str:
    return f"{y} ~ {' + '.join(feats)}"


@dataclass
class SLearner:
    """Single model with the treatment as a feature (+ optional t·X
    interactions); ITE = f(x, 1) − f(x, 0)."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    interactions: bool = True
    model_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "SLearner":
        feats = list(self.features) + [self.treatment]
        if self.interactions:
            feats += [f"({self.treatment})*({x})" for x in self.features]
        self.model_ = ols(df, _formula(self.outcome, feats))
        return self

    def ite_column(self) -> Column:
        m = self.model_
        # f(x,1) − f(x,0) = β_t + Σ β_{t·x} x
        names = m.feature_exprs
        out: Column = F.lit(0.0)
        coefs = m.beta[1:]
        for b, name in zip(coefs, names):
            if name == self.treatment:
                out = out + float(b)
            elif name.startswith(f"({self.treatment})*"):
                xexpr = name[len(f"({self.treatment})*"):]
                out = out + float(b) * F.expr(xexpr).cast("double")
        return out

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())


@dataclass
class TLearner:
    """Separate outcome models per arm; ITE = f₁(x) − f₀(x)."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    # pre-fitted per-arm outcome models {0.0: m0, 1.0: m1} (one
    # ols_grouped result): T / X-stage-1 / DR-stage-1 all solve the SAME
    # grouped per-arm OLS when given the same data — fit it once and
    # share it, like propensity_model (identical coefficients either way)
    outcome_models: object = field(default=None, repr=False)
    model0_: object = field(default=None, repr=False)
    model1_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "TLearner":
        f = _formula(self.outcome, self.features)
        # BOTH arm models from ONE groupBy(arm) Gramian scan; the group
        # key casts to double so string-coded '0'/'1' arms keep working
        # (the old per-arm filter t == 0 relied on Spark's implicit cast)
        models = (self.outcome_models if self.outcome_models is not None
                  else ols_grouped(df, f,
                                   f"CAST(({self.treatment}) AS DOUBLE)"))
        try:
            self.model0_, self.model1_ = models[0.0], models[1.0]
        except KeyError:
            raise ValueError(
                f"TLearner needs both arms 0 and 1 in {self.treatment!r}; "
                f"arms present: {sorted(models, key=str)}") from None
        return self

    def ite_column(self) -> Column:
        return self.model1_.predict_column() - self.model0_.predict_column()

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())


@dataclass
class XLearner:
    """T-learner first stage, imputed-effect second stage, propensity blend:
    τ(x) = g(x)·τ₀(x) + (1−g(x))·τ₁(x)."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    # pre-fitted logistic propensity (e.g. PropensityModel(...).fit(df)
    # .model_): the X/R/DR learners all solve the SAME treatment ~ x
    # IRLS when given the same data — fitting it once and sharing it
    # removes the redundant iterative scans without changing any number
    propensity_model: object = field(default=None, repr=False)
    # pre-fitted per-arm outcome models (see TLearner.outcome_models)
    outcome_models: object = field(default=None, repr=False)
    model0_: object = field(default=None, repr=False)
    model1_: object = field(default=None, repr=False)
    tau0_: object = field(default=None, repr=False)
    tau1_: object = field(default=None, repr=False)
    prop_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "XLearner":
        t = F.expr(self.treatment)
        f = _formula(self.outcome, self.features)
        # stage 1: BOTH arm outcome models from ONE groupBy(arm) scan
        # (double-cast group key: string-coded arms keep working)
        models = (self.outcome_models if self.outcome_models is not None
                  else ols_grouped(df, f,
                                   f"CAST(({self.treatment}) AS DOUBLE)"))
        try:
            self.model0_, self.model1_ = models[0.0], models[1.0]
        except KeyError:
            raise ValueError(
                f"XLearner needs both arms 0 and 1 in {self.treatment!r}; "
                f"arms present: {sorted(models, key=str)}") from None
        # stage 2: imputed effects per arm — the target is a CASE column
        # (treated: y − f₀(x); control: f₁(x) − y), so BOTH tau models
        # again come from ONE grouped scan
        y = F.expr(self.outcome).cast("double")
        imp = df.withColumn(
            "__d", F.when(t == 1, y - self.model0_.predict_column())
                    .otherwise(self.model1_.predict_column() - y))
        taus = ols_grouped(imp, _formula("__d", self.features),
                           f"CAST(({self.treatment}) AS DOUBLE)")
        self.tau0_, self.tau1_ = taus[0.0], taus[1.0]
        self.prop_ = (self.propensity_model
                      if self.propensity_model is not None
                      else logistic_regression(df, _formula(self.treatment,
                                                            self.features)))
        return self

    def ite_column(self) -> Column:
        g = self.prop_.predict_proba_column()
        return g * self.tau0_.predict_column() \
            + (1 - g) * self.tau1_.predict_column()

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())


@dataclass
class TransformedOutcome:
    """Transformed-outcome regression: Y* = Y·(T−g)/(g(1−g)); an OLS of Y* on
    X estimates τ(x) directly (expected-value identity)."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    propensity: float | None = None      # None → fit logistic propensity
    trim: float = 0.01                   # fitted-propensity clip (overlap)
    model_: object = field(default=None, repr=False)
    prop_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "TransformedOutcome":
        if not 0 <= self.trim < 0.5:        # same guard as DRLearner —
            raise ValueError("trim must be in [0, 0.5)")  # trim >= 0.5
            # would pin g to a constant and silently discard the fit
        t = F.expr(self.treatment).cast("double")
        y = F.expr(self.outcome).cast("double")
        if self.propensity is None:
            self.prop_ = logistic_regression(
                df, _formula(self.treatment, self.features))
            # overlap trimming, same rationale as DRLearner: a fitted g
            # near 0/1 makes y(t−g)/(g(1−g)) explode and a handful of
            # poor-overlap rows then dominate the stage-2 Gramian
            g = self.prop_.predict_proba_column()
            g = F.greatest(F.lit(float(self.trim)),
                           F.least(F.lit(1.0 - float(self.trim)), g))
        else:
            if not 0.0 < float(self.propensity) < 1.0:
                raise ValueError(
                    f"propensity must lie strictly in (0, 1), got "
                    f"{self.propensity} — y(t-g)/(g(1-g)) is undefined "
                    f"at the boundary")
            g = F.lit(float(self.propensity))
        ystar = y * (t - g) / (g * (1 - g))
        work = df.withColumn("__ystar", ystar)
        self.model_ = ols(work, _formula("__ystar", self.features))
        return self

    def ite_column(self) -> Column:
        return self.model_.predict_column()

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())


@dataclass
class CVT:
    """Class-variable transformation (Jaskowski-Jaroszewicz): for binary Y
    with 50/50 assignment, Z = Y·T + (1−Y)(1−T); P(Z=1|x) maps to uplift
    2·P−1.  The transform is only valid under (approximately) balanced
    randomization — for unbalanced assignment use
    :class:`TransformedOutcome` (propensity-weighted) or
    :class:`DRLearner` instead."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    model_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "CVT":
        t = F.expr(self.treatment).cast("double")
        y = F.expr(self.outcome).cast("double")
        z = y * t + (1 - y) * (1 - t)
        work = df.withColumn("__z", z)
        self.model_ = logistic_regression(work, _formula("__z", self.features))
        return self

    def ite_column(self) -> Column:
        return 2 * self.model_.predict_proba_column() - 1

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())


@dataclass
class PropensityModel:
    """Logistic propensity g(x) = P(T=1|x) (building block for IPW/matching)."""

    features: list[str]
    treatment: str = "treatment"
    model_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "PropensityModel":
        self.model_ = logistic_regression(
            df, _formula(self.treatment, self.features))
        return self

    def predict(self, df: DataFrame, alias: str = "propensity") -> DataFrame:
        return df.withColumn(alias, self.model_.predict_proba_column())


@dataclass
class RLearner:
    """R-learner (Nie-Wager 2021): orthogonalized CATE regression.

    Stage 1 fits the nuisances m(x) = E[Y|X] (OLS) and g(x) = P(T=1|X)
    (logistic IRLS, or a known constant for randomized assignment);
    stage 2 minimizes the R-loss Σ ((y − m) − τ(x)·(t − g))² for linear
    τ(x) = β₀ + β'x.  Implemented WITHOUT the unstable (y−m)/(t−g)
    division: with τ linear the R-loss is exactly a no-intercept OLS of
    the outcome residual on the treatment residual and its x
    interactions, so stage 2 is ONE more Gramian scan and the fitted β
    ARE the CATE parameters.  Like LinearDML this is Neyman-orthogonal —
    robust to confounded assignment where S/T-learners need the outcome
    model exactly right — but fits on the full sample without
    cross-fitting (use ``operators.dml.linear_dml`` when honest folds
    are wanted)."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    propensity: float | None = None      # None → fit logistic propensity
    # pre-fitted logistic propensity shared across learners (see XLearner)
    propensity_model: object = field(default=None, repr=False)
    model_: object = field(default=None, repr=False)
    mean_model_: object = field(default=None, repr=False)
    prop_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "RLearner":
        t = F.expr(self.treatment).cast("double")
        y = F.expr(self.outcome).cast("double")
        self.mean_model_ = ols(df, _formula(self.outcome, self.features))
        if self.propensity_model is not None:
            self.prop_ = self.propensity_model
            g = self.prop_.predict_proba_column()
        elif self.propensity is None:
            self.prop_ = logistic_regression(
                df, _formula(self.treatment, self.features))
            g = self.prop_.predict_proba_column()
        else:
            g = F.lit(float(self.propensity))
        work = (df.withColumn("__yr", y - self.mean_model_.predict_column())
                .withColumn("__tr", t - g))
        feats = ["__tr"] + [f"(__tr)*({x})" for x in self.features]
        self.model_ = ols(work, _formula("__yr", feats), use_bias=False)
        return self

    def ite_column(self) -> Column:
        out: Column = F.lit(float(self.model_.beta[0]))
        for b, x in zip(self.model_.beta[1:], self.features):
            out = out + float(b) * F.expr(x).cast("double")
        return out

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())


@dataclass
class DRLearner:
    """DR-learner (Kennedy 2023): regress the doubly-robust AIPW
    pseudo-outcome on x.

    Stage 1 fits both per-arm outcome models from ONE groupBy(arm)
    Gramian scan plus the propensity; stage 2 is one OLS of

        φ = f₁(x) − f₀(x) + t·(y − f₁(x))/g − (1−t)·(y − f₀(x))/(1−g)

    on x — consistent if EITHER the outcome models or the propensity is
    right, and E[φ|x] = τ(x) exactly.  ``trim`` clips g away from {0,1}
    (standard overlap trimming: the IPW terms otherwise explode on thin
    support — at corpus scale a handful of extreme-propensity rows can
    dominate the fit)."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    propensity: float | None = None      # None → fit logistic propensity
    trim: float = 0.01
    # pre-fitted logistic propensity shared across learners (see XLearner)
    propensity_model: object = field(default=None, repr=False)
    # pre-fitted per-arm outcome models (see TLearner.outcome_models)
    outcome_models: object = field(default=None, repr=False)
    model_: object = field(default=None, repr=False)
    model0_: object = field(default=None, repr=False)
    model1_: object = field(default=None, repr=False)
    prop_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "DRLearner":
        if not 0 <= self.trim < 0.5:
            raise ValueError("trim must be in [0, 0.5)")
        t = F.expr(self.treatment).cast("double")
        y = F.expr(self.outcome).cast("double")
        models = (self.outcome_models if self.outcome_models is not None
                  else ols_grouped(df,
                                   _formula(self.outcome, self.features),
                                   f"CAST(({self.treatment}) AS DOUBLE)"))
        try:
            self.model0_, self.model1_ = models[0.0], models[1.0]
        except KeyError:
            raise ValueError(
                f"DRLearner needs both arms 0 and 1 in {self.treatment!r}; "
                f"arms present: {sorted(models, key=str)}") from None
        if self.propensity_model is not None:
            self.prop_ = self.propensity_model
            g = self.prop_.predict_proba_column()
        elif self.propensity is None:
            self.prop_ = logistic_regression(
                df, _formula(self.treatment, self.features))
            g = self.prop_.predict_proba_column()
        else:
            g = F.lit(float(self.propensity))
        if self.trim > 0:
            g = F.least(F.greatest(g, F.lit(float(self.trim))),
                        F.lit(1.0 - float(self.trim)))
        f0 = self.model0_.predict_column()
        f1 = self.model1_.predict_column()
        phi = (f1 - f0 + t * (y - f1) / g - (1 - t) * (y - f0) / (1 - g))
        work = df.withColumn("__phi", phi)
        self.model_ = ols(work, _formula("__phi", self.features))
        return self

    def ite_column(self) -> Column:
        return self.model_.predict_column()

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())


@dataclass
class RetrospectiveLearner:
    """Retrospective estimation (binary outcomes): model P(T=1 | Y=1, X)
    among converters; under randomized assignment with known treatment share
    the score ranks uplift (reference ships the same learner in its PySpark
    uplift library)."""

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    model_: object = field(default=None, repr=False)

    def fit(self, df: DataFrame) -> "RetrospectiveLearner":
        converters = df.where(F.expr(self.outcome).cast("double") == 1)
        self.model_ = logistic_regression(
            converters, _formula(self.treatment, self.features))
        return self

    def ite_column(self) -> Column:
        # monotone uplift score; calibrate externally if effect sizes needed
        return self.model_.predict_proba_column()

    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        return df.withColumn(alias, self.ite_column())
