"""Causal mediation analysis (product-of-coefficients / Baron-Kenny with
Sobel inference) — beyond-ref companion to the effect estimators.

Decomposes a total treatment effect into the indirect path through a
mediator and the direct remainder, under the standard
sequential-ignorability + linearity assumptions (Imai-Keele-Tingley's
ACME reduces to the product of coefficients in the
linear-structural-equation case implemented here):

    m = α₀ + a·t + αₓ'x + ε₁        (mediator model)
    y = β₀ + c'·t + b·m + βₓ'x + ε₂ (outcome model)

    ACME  = a·b          (average causal mediation effect)
    ADE   = c'           (average direct effect)
    total = c            (from y = γ₀ + c·t + γₓ'x)
    prop_mediated = a·b / (c' + a·b)

Sobel (delta-method) standard error for ACME:
√(a²·se_b² + b²·se_a²); the total-effect decomposition c = c' + a·b
holds exactly in the no-covariate case and up to fp error with shared
covariates, and is reported as a consistency check.

Spark shape: ONE Gramian aggregation over the joint column set
(1, t, m, x…, y) — every one of the three nested OLS systems is a
submatrix of that single moment matrix, so the driver solves three
k×k systems from one scan.  p(p+1)/2 doubles shuffle regardless of row
count; at 100 TB this is a single map-side-combined pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist


@dataclass
class MediationResult:
    acme: float
    acme_stderr: float
    ade: float
    ade_stderr: float
    total: float
    total_stderr: float
    prop_mediated: float
    sobel_z: float
    sobel_p: float
    a: float                  # t → m path
    a_stderr: float
    b: float                  # m → y path (treatment held fixed)
    b_stderr: float
    n: float

    def summary(self) -> str:
        return (f"Mediation (linear SEM, Sobel inference), n={int(self.n)}\n"
                f"  ACME  = {self.acme:.6g} (se={self.acme_stderr:.6g}, "
                f"z={self.sobel_z:.4g}, p={self.sobel_p:.4g})\n"
                f"  ADE   = {self.ade:.6g} (se={self.ade_stderr:.6g})\n"
                f"  total = {self.total:.6g} (se={self.total_stderr:.6g})\n"
                f"  proportion mediated = {self.prop_mediated:.6g}")


def _solve(G: np.ndarray, n: float, rows: list[int], yi: int):
    """OLS of column ``yi`` on columns ``rows`` of the joint moment
    matrix G (index 0 is the all-ones column): beta, classical SEs."""
    A = G[np.ix_(rows, rows)]
    v = G[np.ix_(rows, [yi])].ravel()
    try:
        beta = np.linalg.solve(A, v)
    except np.linalg.LinAlgError:
        raise ValueError(
            "mediation: a model design is singular — constant "
            "treatment, a mediator collinear with the treatment, or a "
            "duplicated covariate make the mediator/outcome regression "
            "unidentified") from None
    rss = float(G[yi, yi] - beta @ v)
    dof = n - len(rows)
    sigma2 = max(rss, 0.0) / max(dof, 1.0)
    cov = sigma2 * np.linalg.inv(A)
    return beta, np.sqrt(np.maximum(np.diag(cov), 0.0)), dof


def mediation(df: DataFrame, Y: str, treatment: str, mediator: str,
              covariates: list[str] | None = None) -> MediationResult:
    """Linear mediation decomposition of ``treatment``'s effect on ``Y``
    through ``mediator``, optionally adjusting both models for
    ``covariates`` (SQL expressions)."""
    covariates = list(covariates or [])
    exprs = [F.lit(1.0),
             F.expr(treatment).cast("double"),
             F.expr(mediator).cast("double"),
             *[F.expr(c).cast("double") for c in covariates],
             F.expr(Y).cast("double")]
    p = len(exprs)
    cc = exprs[1].isNotNull() & exprs[2].isNotNull() & exprs[-1].isNotNull()
    for e in exprs[3:-1]:
        cc = cc & e.isNotNull()
    work = df.where(cc)
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum(exprs[i] * exprs[j]).alias(f"g{i}_{j}"))
    row = work.agg(*aggs).collect()[0]
    G = np.empty((p, p))
    for i in range(p):
        for j in range(i, p):
            G[i, j] = G[j, i] = float(row[f"g{i}_{j}"] or 0.0)
    n = G[0, 0]                                  # Σ1·1 over complete cases
    if n < p + 1:
        raise ValueError(f"need more than {p + 1} complete rows, got {int(n)}")
    xi = list(range(3, p - 1))                   # covariate indices
    yi = p - 1
    # mediator model: m ~ 1 + t + x
    bm, sem, _ = _solve(G, n, [0, 1, *xi], 2)
    a, se_a = float(bm[1]), float(sem[1])
    # outcome model: y ~ 1 + t + m + x
    bo, seo, _ = _solve(G, n, [0, 1, 2, *xi], yi)
    ade, se_ade = float(bo[1]), float(seo[1])
    b, se_b = float(bo[2]), float(seo[2])
    # total model: y ~ 1 + t + x
    bt, sot, _ = _solve(G, n, [0, 1, *xi], yi)
    total, se_total = float(bt[1]), float(sot[1])
    acme = a * b
    se_acme = math.sqrt(a * a * se_b * se_b + b * b * se_a * se_a)
    z = acme / se_acme if se_acme > 0 else float("nan")
    pz = float(2 * dist.norm_sf(abs(z))) if se_acme > 0 else float("nan")
    denom = ade + acme
    prop = acme / denom if denom != 0 else float("nan")
    return MediationResult(
        acme=acme, acme_stderr=se_acme, ade=ade, ade_stderr=se_ade,
        total=total, total_stderr=se_total, prop_mediated=prop,
        sobel_z=z, sobel_p=pz, a=a, a_stderr=se_a, b=b, b_stderr=se_b,
        n=n)
