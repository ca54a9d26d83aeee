"""OLS / WLS by closed-form normal equations, plus DID and 2SLS (IV).

Parity targets (reference under /root/reference): ``ols.h:40-756`` (R-style
summary at :505-547), Python facades ``regression.py:309-505`` (ols/wls),
``regression.py:780-953`` (did / iv_regression), Calcite macros
``DIDParser.java``, ``IvRegressionParser.java``.

Spark-first design: ONE ``groupBy().agg()`` over the shared
sufficient-statistics kernel yields the Gramian (XᵀX, Xᵀy, yᵀy) —
O(k²) doubles shuffled regardless of row count — and the driver solves the
k×k system with numpy. Prediction is a pure Column dot-product (no UDF), so
scoring 100 TB stays inside whole-stage codegen.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist
from fast_causal_inference_spark.operators.suffstats import suffstat_agg_columns


def parse_r_formula(formula: str) -> tuple[str, list[str]]:
    """``'y ~ x1 + x2'`` → ('y', ['x1', 'x2']). Terms are SQL expressions."""
    if "~" not in formula:
        raise ValueError(f"formula needs '~': {formula!r}")
    lhs, rhs = formula.split("~", 1)
    # paren-aware split: 'y ~ pow(x1+x2,2) + x3' keeps the first term whole
    feats = [t.strip() for t in _split_top_level(rhs) if t.strip()]
    if not feats:
        raise ValueError(f"no regressors in {formula!r}")
    return lhs.strip(), feats


@dataclass
class OlsModel:
    """Fitted linear model with inference statistics and Spark scoring."""

    y_expr: str
    feature_exprs: list[str]
    use_bias: bool
    beta: np.ndarray               # (p,) — intercept first when use_bias
    stderr: np.ndarray             # (p,)
    n: float
    sigma2: float                  # residual variance (SSR / df_resid)
    xtx_inv: np.ndarray            # (p, p)
    r2: float
    adj_r2: float
    f_stat: float
    f_pvalue: float
    weight_expr: str | None = None
    names: list[str] = field(default_factory=list)
    # inference-df override (cluster-robust SEs test against G−1)
    df_override: float | None = None

    def __post_init__(self):
        if not self.names:
            self.names = ((["(Intercept)"] if self.use_bias else [])
                          + list(self.feature_exprs))

    # -- inference ------------------------------------------------------
    @property
    def p(self) -> int:
        return len(self.beta)

    @property
    def df_resid(self) -> float:
        if self.df_override is not None:
            return self.df_override
        return self.n - self.p

    @property
    def t_values(self) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.beta / self.stderr

    @property
    def p_values(self) -> np.ndarray:
        return 2.0 * dist.t_sf(np.abs(self.t_values), self.df_resid)

    # -- scoring (pure Column expressions — no UDF) ---------------------
    def _x_columns(self) -> list[Column]:
        return [F.expr(e).cast("double") for e in self.feature_exprs]

    def predict_column(self) -> Column:
        xs = self._x_columns()
        out: Column = F.lit(float(self.beta[0])) if self.use_bias else F.lit(0.0)
        coefs = self.beta[1:] if self.use_bias else self.beta
        for b, x in zip(coefs, xs):
            out = out + float(b) * x
        return out

    def predict(self, df: DataFrame, alias: str = "prediction",
                interval: str | None = None, alpha: float = 0.05) -> DataFrame:
        """Score rows; ``interval='confidence'|'prediction'`` adds bounds
        (x(XᵀX)⁻¹xᵀ closed form — reference OlsInterval semantics)."""
        out = df.withColumn(alias, self.predict_column())
        if interval is None:
            return out
        xs = ([F.lit(1.0)] if self.use_bias else []) + self._x_columns()
        quad: Column = F.lit(0.0)
        for i in range(self.p):
            for j in range(self.p):
                quad = quad + float(self.xtx_inv[i, j]) * xs[i] * xs[j]
        var = F.lit(self.sigma2) * (quad + (1.0 if interval == "prediction" else 0.0))
        q = float(dist.t_ppf(1.0 - alpha / 2.0, self.df_resid))
        half = F.lit(q) * F.sqrt(var)
        return (out.withColumn(f"{alias}_lower", F.col(alias) - half)
                   .withColumn(f"{alias}_upper", F.col(alias) + half))

    def effect(self, df: DataFrame, alias: str = "effect") -> DataFrame:
        return self.predict(df, alias)

    # -- presentation ---------------------------------------------------
    def coef_table(self):
        import pandas as pd

        return pd.DataFrame({
            "name": self.names,
            "estimate": self.beta,
            "stderr": self.stderr,
            "t_value": self.t_values,
            "p_value": self.p_values,
        })

    def summary(self) -> str:
        """R-style lm() block, format-exact with the reference engine
        (``ols.h:505-547`` rendered through
        ``MathHelpers::to_string_with_precision`` — fields padded to 12,
        names to 16, fixed 6 decimals with a scientific fallback when the
        fixed form overflows the field)."""
        lines = [
            "\nCall:\n  lm( formula = " + self.y_expr + " ~ "
            + " + ".join(self.feature_exprs) + " )\n",
            "Coefficients:",
            (_pad(".", 16) + _pad("Estimate") + _pad("Std. Error")
             + _pad("t value") + _pad("Pr(>|t|)")),
        ]
        for name, b, se, t, p in zip(self.names, self.beta, self.stderr,
                                     self.t_values, self.p_values):
            lines.append(_pad(name, 16) + _pad(b) + _pad(se)
                         + _pad(t) + _pad(p))
        lines.append("")
        lines.append(f"Residual standard error: {math.sqrt(self.sigma2):.6f} "
                     f"on {int(self.df_resid)} degrees of freedom")
        lines.append(f"Multiple R-squared: {self.r2:.6f}, "
                     f"Adjusted R-squared: {self.adj_r2:.6f}")
        df_model = self.p - 1 if self.use_bias else self.p
        lines.append(f"F-statistic: {self.f_stat:.6f} on {df_model} and "
                     f"{int(self.df_resid)} DF,  p-value: {self.f_pvalue:.6f}")
        return "\n".join(lines)

    def __repr__(self):
        return self.summary()

    # -- model state round-trip (reference ols_train / eval_ml_method) --
    def to_json(self) -> str:
        return json.dumps({
            "y_expr": self.y_expr, "feature_exprs": self.feature_exprs,
            "use_bias": self.use_bias, "beta": self.beta.tolist(),
            "stderr": self.stderr.tolist(), "n": self.n, "sigma2": self.sigma2,
            "xtx_inv": self.xtx_inv.tolist(), "r2": self.r2,
            "adj_r2": self.adj_r2, "f_stat": self.f_stat,
            "f_pvalue": self.f_pvalue, "weight_expr": self.weight_expr,
            "df_override": self.df_override, "names": self.names,
        })

    @classmethod
    def from_json(cls, s: str) -> "OlsModel":
        d = json.loads(s)
        return cls(y_expr=d["y_expr"], feature_exprs=d["feature_exprs"],
                   use_bias=d["use_bias"], beta=np.array(d["beta"]),
                   stderr=np.array(d["stderr"]), n=d["n"], sigma2=d["sigma2"],
                   xtx_inv=np.array(d["xtx_inv"]), r2=d["r2"],
                   adj_r2=d["adj_r2"], f_stat=d["f_stat"],
                   f_pvalue=d["f_pvalue"], weight_expr=d.get("weight_expr"),
                   # cluster-robust df must survive the round-trip or the
                   # revived model silently tests against n-p
                   df_override=d.get("df_override"),
                   names=d.get("names") or [])


def _pad(v, length: int = 12, precision: int = 6) -> str:
    """Reference ``MathHelpers::to_string_with_precision`` semantics
    (math_helpers.hpp:129-162): fixed-precision render, scientific(4) when
    the fixed form overflows ``length``, right-pad with spaces to
    ``length``, and guarantee one trailing space."""
    if isinstance(v, float):
        s = f"{v:.{precision}f}"
        if len(s) > length:
            s = f"{v:.4e}"
    else:
        s = str(v)
    if len(s) < length:
        s = s + " " * (length - len(s))
    if not s.endswith(" "):
        s = s + " "
    return s


def _fit_from_row(row, feats: list[str], y_expr: str, use_bias: bool,
                  n_rows: float, weight_expr: str | None) -> OlsModel:
    """Solve the normal equations from one sufficient-statistics row."""
    k = len(feats)
    kk = k + 1
    n_w = float(row["n"])                      # Σw (or n when unweighted)
    s = np.array([row[f"s{i}"] for i in range(kk)], dtype=float)
    cross = np.empty((kk, kk))
    for i in range(kk):
        for j in range(i, kk):
            cross[i, j] = cross[j, i] = row[f"c{min(i,j)}_{max(i,j)}"]

    p = k + (1 if use_bias else 0)
    xtx = np.empty((p, p))
    xty = np.empty(p)
    if use_bias:
        xtx[0, 0] = n_w
        for i in range(k):
            xtx[0, i + 1] = xtx[i + 1, 0] = s[i]
            xty[i + 1] = cross[i, k]
            for j in range(k):
                xtx[i + 1, j + 1] = cross[i, j]
        xty[0] = s[k]
    else:
        for i in range(k):
            xty[i] = cross[i, k]
            for j in range(k):
                xtx[i, j] = cross[i, j]
    yty = cross[k, k]

    try:
        beta = np.linalg.solve(xtx, xty)
        xtx_inv = np.linalg.inv(xtx)
    except np.linalg.LinAlgError:
        xtx_inv = np.linalg.pinv(xtx)
        beta = xtx_inv @ xty

    ssr = float(yty - 2.0 * beta @ xty + beta @ xtx @ beta)
    ssr = max(ssr, 0.0)
    if use_bias:
        sst = float(yty - s[k] ** 2 / n_w)
    else:
        sst = float(yty)
    df_resid = n_rows - p
    sigma2 = ssr / df_resid if df_resid > 0 else float("nan")
    stderr = np.sqrt(np.maximum(np.diag(xtx_inv), 0.0) * sigma2)
    r2 = 1.0 - ssr / sst if sst > 0 else float("nan")
    df_model = p - 1 if use_bias else p
    adj_r2 = (1.0 - (1.0 - r2) * (n_rows - (1 if use_bias else 0)) / df_resid
              if df_resid > 0 else float("nan"))
    if df_model > 0 and sigma2 > 0:
        f_stat = (sst - ssr) / df_model / sigma2
        f_p = float(dist.f_sf(f_stat, df_model, df_resid))
    else:
        f_stat, f_p = float("nan"), float("nan")

    return OlsModel(y_expr=y_expr, feature_exprs=feats, use_bias=use_bias,
                    beta=beta, stderr=stderr, n=n_rows, sigma2=sigma2,
                    xtx_inv=xtx_inv, r2=r2, adj_r2=adj_r2,
                    f_stat=f_stat, f_pvalue=f_p, weight_expr=weight_expr)


def _complete_case_count(base_exprs: list[str],
                         wcol: Column | None = None) -> Column:
    """Count of rows entering the Gramian: every base expression (and the
    weight, when given) non-NULL — the row set suffstat_agg_columns
    sums over."""
    cc = None
    for e in base_exprs:
        nn = F.expr(e).cast("double").isNotNull()
        cc = nn if cc is None else (cc & nn)
    if wcol is not None:
        cc = cc & wcol.isNotNull()
    return F.count(F.when(cc, 1))


def ols(df: DataFrame, formula: str, use_bias: bool = True,
        weight: str | None = None) -> OlsModel:
    """Closed-form (W)LS fit of an R-style formula ``'y ~ x1 + x2'``.

    One aggregation pass builds the Gramian; numpy solves on the driver.
    """
    y_expr, feats = parse_r_formula(formula)
    base = feats + [y_expr]
    wcol = F.expr(weight).cast("double") if weight else None
    aggs = suffstat_agg_columns(base, weight=wcol)
    aggs.append(_complete_case_count(base, wcol).alias("n_cc__"))
    row = df.agg(*aggs).collect()[0]
    # df_resid counts COMPLETE CASES (the rows the Gramian actually
    # absorbed): a NULL y/feature/weight row contributes nothing to the
    # fit and must not inflate the residual degrees of freedom — for the
    # weighted path too (n is Σw there, but the CASE count drives df).
    n_rows = float(row["n"] or 0.0) if weight is None \
        else float(row["n_cc__"] or 0.0)
    return _fit_from_row(row, feats, y_expr, use_bias, n_rows, weight)


def wls(df: DataFrame, formula: str, weight: str,
        use_bias: bool = True) -> OlsModel:
    """Weighted least squares (reference ``regression.py:459-505``)."""
    return ols(df, formula, use_bias=use_bias, weight=weight)


def ols_grouped(df: DataFrame, formula: str, group_expr: str,
                use_bias: bool = True,
                weight: str | None = None) -> dict:
    """One model per group value from ONE ``groupBy`` Gramian scan.

    The per-arm fits of the T/X meta-learners (and any
    fit-a-model-per-segment workload) are the same Gramian aggregation
    conditioned on disjoint row sets — grouping computes them all in a
    single pass instead of one filtered scan per group.  Groups with
    fewer rows than parameters get a pinv solve (same degenerate
    behavior as :func:`ols` on a tiny frame).  Returns
    ``{group_value: OlsModel}``.
    """
    y_expr, feats = parse_r_formula(formula)
    base = feats + [y_expr]
    wcol = F.expr(weight).cast("double") if weight else None
    aggs = suffstat_agg_columns(base, weight=wcol)
    aggs.append(_complete_case_count(base, wcol).alias("n_cc__"))
    g = F.expr(group_expr).alias("__g")
    rows = df.groupBy(g).agg(*aggs).collect()
    return {r["__g"]: _fit_from_row(
        r, feats, y_expr, use_bias,
        float(r["n"] or 0.0) if weight is None
        else float(r["n_cc__"] or 0.0),
        weight) for r in rows}


def ols_coef_df(df: DataFrame, formula: str, use_bias: bool = True,
                weight: str | None = None) -> DataFrame:
    """Coefficient table as a Spark DataFrame (for the correctness gate)."""
    model = ols(df, formula, use_bias=use_bias, weight=weight)
    spark = df.sparkSession
    return spark.createDataFrame(model.coef_table())


# ---------------------------------------------------------------------------
# DID and IV
# ---------------------------------------------------------------------------


def did(df: DataFrame, Y: str, treatment: str, time: str,
        *covariates: str) -> OlsModel:
    """Difference-in-differences: OLS of
    ``Y ~ treatment + time + treatment*time + X`` (reference
    ``regression.py:780-862``).  Treatment/time may be boolean expressions
    (e.g. ``"ds >= '2024-06-01'"``) — cast so the interaction is numeric
    under ANSI mode."""
    t = f"CAST(({treatment}) AS DOUBLE)"
    s = f"CAST(({time}) AS DOUBLE)"
    feats = [t, s, f"{t}*{s}", *covariates]
    return ols(df, f"{Y} ~ {' + '.join(feats)}", use_bias=True)


def iv_regression(df: DataFrame, formula: str) -> OlsModel:
    """Two-stage least squares for ``'y ~ (t ~ z) + x1 + x2'``
    (reference ``regression.py:865-953``, ``IvRegressionParser.java:31-130``).

    Stage 1 fits t̂ = f(z, x) per endogenous regressor; stage 2 regresses y on
    fitted values + exogenous covariates, with the covariance corrected to use
    residuals from the ORIGINAL regressors (classic 2SLS sandwich).
    All passes are Gramian aggregations over one shared base-column set.
    """
    import re

    m = re.match(r"^\s*(?P<y>[^~]+?)\s*~\s*(?P<rhs>.+)$", formula)
    if not m:
        raise ValueError(f"bad IV formula {formula!r}")
    y_expr = m.group("y").strip()
    rhs = m.group("rhs")
    endo: list[tuple[str, list[str]]] = []   # (t, [z...])
    exog: list[str] = []
    for part in _split_top_level(rhs):
        im = re.match(r"^\((?P<t>[^~]+?)\s*~\s*(?P<z>.+)\)$", part.strip())
        if im:
            endo.append((im.group("t").strip(),
                         _split_top_level(im.group("z"))))
        else:
            exog.append(part.strip())
    if not endo:
        raise ValueError("IV formula needs at least one (t ~ z) term")

    t_exprs = [t for t, _ in endo]
    z_exprs = sorted({z for _, zs in endo for z in zs})
    instruments = z_exprs + exog             # first-stage regressors
    base = sorted(set(t_exprs + instruments + exog + [y_expr]))
    idx = {e: i for i, e in enumerate(base)}

    aggs = suffstat_agg_columns(base)
    row = df.agg(*aggs).collect()[0]
    k = len(base)
    # complete-case n: the Gramian skipped NULL rows, so the intercept
    # moment / df_resid / sst must count the same row set (a raw count
    # silently mixed 2SLS moments over different populations)
    n = float(row["n"] or 0.0)
    s = np.array([row[f"s{i}"] for i in range(k)], dtype=float)
    cross = np.empty((k, k))
    for i in range(k):
        for j in range(i, k):
            cross[i, j] = cross[j, i] = row[f"c{min(i,j)}_{max(i,j)}"]

    def gram(exprs_a: list[str], exprs_b: list[str], bias_a=True, bias_b=True):
        """Cross-product matrix [1?, A]ᵀ[1?, B] from shared sums."""
        ia = [idx[e] for e in exprs_a]
        ib = [idx[e] for e in exprs_b]
        pa, pb = len(ia) + bias_a, len(ib) + bias_b
        g = np.empty((pa, pb))
        if bias_a and bias_b:
            g[0, 0] = n
        if bias_a:
            for j, e in enumerate(ib):
                g[0, j + bias_b] = s[e]
        if bias_b:
            for i, e in enumerate(ia):
                g[i + bias_a, 0] = s[e]
        for i, ea in enumerate(ia):
            for j, eb in enumerate(ib):
                g[i + bias_a, j + bias_b] = cross[ea, eb]
        return g

    # stage 1: coefficients of each endogenous t on [1, instruments]
    zz = gram(instruments, instruments)
    first_stage = {}
    for t, _ in endo:
        zt = gram(instruments, [t])[:, 1]
        first_stage[t] = np.linalg.solve(zz, zt)

    # stage 2 design: X̂ = [1, t̂…, exog]; all Gramians of X̂ expand into
    # stage-1 coefficient combinations of the shared sums
    def proj_vec(t):
        """Column of cross-products between t̂ and the [1, instruments] basis."""
        return first_stage[t]

    p2 = 1 + len(endo) + len(exog)
    names = ["(Intercept)"] + t_exprs + exog
    xtx = np.empty((p2, p2))
    xty = np.empty(p2)
    zb = gram(instruments, instruments)               # [1,Z]ᵀ[1,Z]
    zy = gram(instruments, [y_expr])[:, 1]            # [1,Z]ᵀ y
    zx = {e: gram(instruments, [e])[:, 1] for e in exog + t_exprs}

    def col_repr(j):
        """Representation of design column j in the [1, instruments] basis
        (exact for intercept/exog; stage-1 coefs for t̂)."""
        if j == 0:
            v = np.zeros(1 + len(instruments))
            v[0] = 1.0
            return v, None
        j -= 1
        if j < len(endo):
            return first_stage[t_exprs[j]], t_exprs[j]
        e = exog[j - len(endo)]
        return None, e

    for i in range(p2):
        vi, ei = col_repr(i)
        for j in range(p2):
            vj, ej = col_repr(j)
            if vi is not None and vj is not None:
                xtx[i, j] = float(vi @ zb @ vj)
            elif vi is not None:
                xtx[i, j] = float(vi @ zx[ej])
            elif vj is not None:
                xtx[i, j] = float(vj @ zx[ei])
            else:
                xtx[i, j] = cross[idx[ei], idx[ej]]
        if vi is not None:
            xty[i] = float(vi @ zy)
        else:
            xty[i] = cross[idx[ei], idx[y_expr]]

    beta = np.linalg.solve(xtx, xty)
    xtx_inv = np.linalg.inv(xtx)

    # 2SLS residuals use ORIGINAL t, not t̂: SSR = Σ(y − Xβ)² over real X
    x_real = ["__one__"] + t_exprs + exog
    gr = np.empty((p2, p2))
    gy = np.empty(p2)
    for i, ea in enumerate(x_real):
        for j, eb in enumerate(x_real):
            if ea == "__one__" and eb == "__one__":
                gr[i, j] = n
            elif ea == "__one__":
                gr[i, j] = s[idx[eb]]
            elif eb == "__one__":
                gr[i, j] = s[idx[ea]]
            else:
                gr[i, j] = cross[idx[ea], idx[eb]]
        gy[i] = s[idx[y_expr]] if ea == "__one__" else cross[idx[ea], idx[y_expr]]
    yty = cross[idx[y_expr], idx[y_expr]]
    ssr = float(yty - 2.0 * beta @ gy + beta @ gr @ beta)
    df_resid = n - p2
    # degrade like _fit_from_row: n <= p2 gives NaN inference, not a
    # ZeroDivisionError
    sigma2 = ssr / df_resid if df_resid > 0 else float("nan")
    stderr = np.sqrt(np.maximum(np.diag(xtx_inv), 0.0) * sigma2)
    sst = float(yty - s[idx[y_expr]] ** 2 / n) if n > 0 else float("nan")
    r2 = 1.0 - ssr / sst if sst > 0 else float("nan")
    adj_r2 = (1.0 - (1.0 - r2) * (n - 1) / df_resid
              if df_resid > 0 else float("nan"))
    df_model = p2 - 1
    f_stat = (sst - ssr) / df_model / sigma2 if sigma2 > 0 else float("nan")
    f_p = float(dist.f_sf(f_stat, df_model, df_resid))

    return OlsModel(y_expr=y_expr, feature_exprs=t_exprs + exog, use_bias=True,
                    beta=beta, stderr=stderr, n=n, sigma2=sigma2,
                    xtx_inv=xtx_inv, r2=r2, adj_r2=adj_r2, f_stat=f_stat,
                    f_pvalue=f_p, names=names)


def _split_top_level(s: str) -> list[str]:
    """Split on '+' at paren depth 0."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "+" and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


def cluster_robust_ols(df: DataFrame, formula: str, cluster: str,
                       use_bias: bool = True) -> OlsModel:
    """OLS with cluster-robust (CR1 / Liang-Zeger) standard errors — the
    correct inference when randomization or sampling is by cluster
    (geo, store, classroom) and errors correlate within clusters.

    Sandwich: V = (XᵀX)⁻¹ [Σ_c (Xᵀe)_c (Xᵀe)_cᵀ] (XᵀX)⁻¹ · G/(G−1) ·
    (n−1)/(n−p).  Fully relational: after the one-pass Gramian fit, a
    single ``groupBy(cluster)`` aggregates the per-cluster score vector
    s_c = Σ_{i∈c} x_i e_i (p sums, residuals as Column expressions from
    the broadcast β), then ONE global aggregation of the p(p+1)/2 score
    products forms the meat — the cluster relation never reaches the
    driver, so millions of clusters are fine."""
    model = ols(df, formula, use_bias=use_bias)
    ccol = F.col(cluster) if cluster.isidentifier() else F.expr(cluster)
    resid = F.expr(model.y_expr).cast("double") - model.predict_column()
    xs = ([F.lit(1.0)] if use_bias else []) + model._x_columns()
    p = len(xs)
    s_aggs = [F.sum(x * resid).alias(f"s{i}") for i, x in enumerate(xs)]
    per_c = df.groupBy(ccol.alias("__c")).agg(
        *s_aggs, F.count(F.lit(1)).alias("__nc"))
    prod_aggs = [F.count(F.lit(1)).alias("G")]
    for i in range(p):
        for j in range(i, p):
            prod_aggs.append(F.sum(F.col(f"s{i}") * F.col(f"s{j}"))
                             .alias(f"m_{i}_{j}"))
    row = per_c.agg(*prod_aggs).collect()[0]
    G = float(row["G"])
    if G < 2:
        raise ValueError("need at least 2 clusters")
    meat = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            meat[i, j] = meat[j, i] = float(row[f"m_{i}_{j}"] or 0.0)
    n = model.n
    correction = (G / (G - 1.0)) * ((n - 1.0) / (n - p))
    bread = model.xtx_inv
    V = correction * bread @ meat @ bread
    se = np.sqrt(np.clip(np.diag(V), 0.0, None))
    import dataclasses

    # t-inference against G−1 df (the standard CR1 convention)
    return dataclasses.replace(model, stderr=se, df_override=G - 1.0)


def robust_ols(df: DataFrame, formula: str, use_bias: bool = True,
               hc: str = "HC1") -> OlsModel:
    """OLS with heteroskedasticity-robust (White sandwich) standard
    errors — HC0 or the df-corrected HC1 (the Stata ``robust`` default).

    Meat = Σ xᵢxᵢᵀ eᵢ²: ONE aggregation of the p(p+1)/2 products with
    residuals as Column expressions from the broadcast β — same one-scan
    shape as the Gramian itself."""
    if hc not in ("HC0", "HC1"):
        raise ValueError("hc must be 'HC0' or 'HC1'")
    model = ols(df, formula, use_bias=use_bias)
    resid = F.expr(model.y_expr).cast("double") - model.predict_column()
    xs = ([F.lit(1.0)] if use_bias else []) + model._x_columns()
    p = len(xs)
    e2 = resid * resid
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum(xs[i] * xs[j] * e2).alias(f"m_{i}_{j}"))
    row = df.agg(*aggs).collect()[0]
    meat = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            meat[i, j] = meat[j, i] = float(row[f"m_{i}_{j}"] or 0.0)
    n = model.n
    if hc == "HC1":
        meat *= n / (n - p)
    bread = model.xtx_inv
    V = bread @ meat @ bread
    se = np.sqrt(np.clip(np.diag(V), 0.0, None))
    import dataclasses

    return dataclasses.replace(model, stderr=se)
