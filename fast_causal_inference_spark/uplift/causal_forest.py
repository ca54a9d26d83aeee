"""Causal forest — honest trees grown level-wise, ALL trees in one
aggregation pass per depth.

Parity target: reference ``causal_forest.h`` (2 241 LoC; TreeOptions
:182-235 — mtry, min_node_size, honesty/honesty_fraction, sample fraction,
quantile-sketch split candidates) driven by ``uplift.py:1898-2160`` (init
pass + passes per depth level with forest state carried between passes).

Spark-first restatement of that design: the forest state lives on the driver;
each depth level runs ONE job — rows are exploded over (tree × candidate
feature) with per-(row, tree) deterministic hash draws deciding subsample
membership and the honest half, and a single
``groupBy(tree, node, feature, bin, treatment)`` aggregates (cnt, Σy, Σy²).
Split search on the driver maximizes the CT-H heterogeneity criterion
n_l·n_r/n²·(τ_l−τ_r)² (the τ-moment member of the GRF family — the reference's
gradient trees share the same sufficient statistics). Prediction averages
per-tree honest leaf effects via one Arrow-batched UDF over the broadcast
forest.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.serialization import ensure_udf_serializable


@dataclass
class _Node:
    feature: str | None = None
    threshold: float | None = None
    left: int | None = None
    right: int | None = None
    tau: float = float("nan")
    n: float = 0.0


@dataclass
class CausalForest:
    """Honest causal forest (bagged heterogeneity trees).

    ``sample_fraction`` — per-tree row subsample (without replacement, by
    hash); ``mtry`` — features considered per tree (None → ceil(√p)).
    """

    features: list[str]
    outcome: str = "y"
    treatment: str = "treatment"
    num_trees: int = 10
    max_depth: int = 4
    min_node_size: int = 50
    n_bins: int = 16
    mtry: int | None = None
    sample_fraction: float = 0.7
    honesty: bool = True
    honesty_fraction: float = 0.5
    seed: int = 42
    trees_: list[dict[int, _Node]] = field(default_factory=list, repr=False)
    tree_feats_: list[list[str]] = field(default_factory=list, repr=False)
    edges_: dict[str, list[float]] = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    def _bin_col(self, feat: str) -> Column:
        edges = self.edges_[feat]
        c = F.expr(feat).cast("double")
        out = None
        for i, e in enumerate(edges):
            out = F.when(c <= e, i) if out is None else out.when(c <= e, i)
        return (out.otherwise(len(edges)) if out is not None
                else F.lit(0)).cast("int")

    def _node_col(self, t: int) -> Column:
        def descend(nid: int) -> Column:
            node = self.trees_[t][nid]
            if node.feature is None:
                return F.lit(nid)
            c = F.expr(node.feature).cast("double")
            return F.when(c <= node.threshold, descend(node.left)) \
                    .otherwise(descend(node.right))

        return descend(0)

    def fit(self, df: DataFrame) -> "CausalForest":
        rng = np.random.default_rng(self.seed)
        p = len(self.features)
        m = self.mtry or max(1, math.ceil(math.sqrt(p)))
        self.tree_feats_ = [
            list(rng.choice(self.features, size=min(m, p), replace=False))
            for _ in range(self.num_trees)
        ]
        self.trees_ = [{0: _Node()} for _ in range(self.num_trees)]

        tcol = F.expr(self.treatment).cast("int")
        ycol = F.expr(self.outcome).cast("double")
        feat_cols = sorted({c for f in self.features for c in
                            ([f] if f in df.columns else df.columns)})
        work = df.select(*feat_cols, tcol.alias("__t"), ycol.alias("__y"))
        rowh = F.xxhash64(*[F.col(c) for c in work.columns], F.lit(self.seed))
        work = work.withColumn("__h", rowh).cache()

        probs = [i / self.n_bins for i in range(1, self.n_bins)]
        for feat in self.features:
            edges = work.select(F.expr(feat).cast("double").alias("__f")) \
                .approxQuantile("__f", probs, 0.001)
            self.edges_[feat] = sorted(set(edges))

        frontier = [[0] for _ in range(self.num_trees)]
        next_ids = [1] * self.num_trees
        for _depth in range(self.max_depth):
            if not any(frontier):
                break
            stats = self._level_stats(work, split_half=True)
            for t in range(self.num_trees):
                new_front = []
                for nid in frontier[t]:
                    best = self._best_split(stats, t, nid)
                    if best is None:
                        continue
                    feat, thr = best
                    node = self.trees_[t][nid]
                    node.feature = feat
                    node.threshold = thr
                    node.left = next_ids[t]
                    node.right = next_ids[t] + 1
                    self.trees_[t][next_ids[t]] = _Node()
                    self.trees_[t][next_ids[t] + 1] = _Node()
                    new_front += [next_ids[t], next_ids[t] + 1]
                    next_ids[t] += 2
                frontier[t] = new_front

        # honest leaf effects on the estimation half
        eff = self._leaf_stats(work)
        for (t, nid), arms in eff.items():
            if 0 in arms and 1 in arms and arms[0][0] > 0 and arms[1][0] > 0:
                n0, s0 = arms[0]
                n1, s1 = arms[1]
                node = self.trees_[t][nid]
                node.tau = s1 / n1 - s0 / n0
                node.n = n0 + n1
        work.unpersist()
        return self

    # -- level machinery ------------------------------------------------
    def _membership(self, t: int) -> Column:
        """Deterministic per-(row, tree) subsample draw."""
        d = F.pmod(F.xxhash64(F.col("__h"), F.lit(t)), F.lit(10000))
        return d < int(self.sample_fraction * 10000)

    def _half(self, t: int) -> Column:
        """1 = split half, 0 = estimation half (honest)."""
        if not self.honesty:
            return F.lit(1)
        d = F.pmod(F.xxhash64(F.col("__h"), F.lit(t), F.lit(7)), F.lit(1000))
        return (d < int(self.honesty_fraction * 1000)).cast("int")

    def _level_stats(self, work: DataFrame, split_half: bool) -> pd.DataFrame:
        per_tree = F.array(*[
            F.struct(F.lit(t).alias("tree"),
                     self._node_col(t).alias("node"),
                     (self._membership(t)
                      & (self._half(t) == (1 if split_half else 0)))
                     .alias("inc"))
            for t in range(self.num_trees)
        ])
        melted = (work.select("__t", "__y", *self.features,
                              F.explode(per_tree).alias("tn"))
                  .where(F.col("tn.inc")))
        # only the features each tree actually considers
        fb = F.array(*[
            F.struct(F.lit(feat).alias("feature"),
                     self._bin_col(feat).alias("bin"))
            for feat in self.features
        ])
        melted = (melted.select(F.col("tn.tree").alias("tree"),
                                F.col("tn.node").alias("node"),
                                "__t", "__y", F.explode(fb).alias("fb"))
                  .select("tree", "node", "__t", "__y",
                          "fb.feature", "fb.bin"))
        agg = (melted.groupBy("tree", "node", "feature", "bin", "__t")
               .agg(F.count(F.lit(1)).alias("cnt"), F.sum("__y").alias("s")))
        return agg.toPandas()

    def _leaf_stats(self, work: DataFrame) -> dict:
        per_tree = F.array(*[
            F.struct(F.lit(t).alias("tree"),
                     self._node_col(t).alias("node"),
                     (self._membership(t) & (self._half(t)
                                             == (0 if self.honesty else 1)))
                     .alias("inc"))
            for t in range(self.num_trees)
        ])
        melted = (work.select("__t", "__y", F.explode(per_tree).alias("tn"))
                  .where(F.col("tn.inc"))
                  .select(F.col("tn.tree").alias("tree"),
                          F.col("tn.node").alias("node"), "__t", "__y"))
        rows = (melted.groupBy("tree", "node", "__t")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("__y").alias("s"))
                .collect())
        out: dict = {}
        for r in rows:
            out.setdefault((r["tree"], r["node"]), {})[r["__t"]] = (
                float(r["n"]), float(r["s"]))
        return out

    def _best_split(self, stats: pd.DataFrame, t: int, nid: int):
        sub = stats[(stats.tree == t) & (stats.node == nid)]
        if sub.empty:
            return None
        best_score, best = 0.0, None
        for feat in self.tree_feats_[t]:
            fs = sub[sub.feature == feat]
            if fs.empty:
                continue
            edges = self.edges_[feat]
            nb = len(edges) + 1
            cnt = np.zeros((2, nb))
            ssum = np.zeros((2, nb))
            for _, r in fs.iterrows():
                if r["__t"] in (0, 1):
                    cnt[int(r["__t"]), int(r["bin"])] = r["cnt"]
                    ssum[int(r["__t"]), int(r["bin"])] = r["s"]
            ccnt = cnt.cumsum(axis=1)
            csum = ssum.cumsum(axis=1)
            for b in range(nb - 1):
                l0, l1 = ccnt[0, b], ccnt[1, b]
                r0 = ccnt[0, -1] - l0
                r1 = ccnt[1, -1] - l1
                if min(l0, l1, r0, r1) < self.min_node_size:
                    continue
                tau_l = csum[1, b] / l1 - csum[0, b] / l0
                tau_r = ((csum[1, -1] - csum[1, b]) / r1
                         - (csum[0, -1] - csum[0, b]) / r0)
                nl, nr = l0 + l1, r0 + r1
                n = nl + nr
                score = nl * nr / (n * n) * (tau_l - tau_r) ** 2
                if score > best_score:
                    best_score, best = score, (feat, edges[b])
        return best

    # -- predict --------------------------------------------------------
    def predict(self, df: DataFrame, alias: str = "ite") -> DataFrame:
        """Average per-tree honest leaf effect — one Arrow UDF pass with the
        (tiny) forest broadcast in the closure."""
        forest = [
            {nid: (nd.feature, nd.threshold, nd.left, nd.right, nd.tau)
             for nid, nd in tree.items()}
            for tree in self.trees_
        ]
        feats = self.features
        ensure_udf_serializable()

        @F.pandas_udf("double")
        def _ite(*cols: pd.Series) -> pd.Series:
            X = {f: c.to_numpy(dtype=float) for f, c in zip(feats, cols)}
            n = len(cols[0])
            acc = np.zeros(n)
            used = np.zeros(n)
            for tree in forest:
                node_ids = np.zeros(n, dtype=int)
                active = np.ones(n, dtype=bool)
                for _ in range(64):
                    moved = False
                    for nid in np.unique(node_ids[active]):
                        feat, thr, left, right, _tau = tree[nid]
                        if feat is None:
                            continue
                        mask = active & (node_ids == nid)
                        goes_left = X[feat][mask] <= thr
                        idx = np.where(mask)[0]
                        node_ids[idx[goes_left]] = left
                        node_ids[idx[~goes_left]] = right
                        moved = True
                    if not moved:
                        break
                taus = np.array([tree[nid][4] for nid in node_ids])
                ok = ~np.isnan(taus)
                acc[ok] += taus[ok]
                used[ok] += 1
            with np.errstate(invalid="ignore", divide="ignore"):
                return pd.Series(np.where(used > 0, acc / used, np.nan))

        return df.withColumn(alias, _ite(*[F.expr(f).cast("double")
                                           for f in feats]))

    def feature_importance(self) -> pd.DataFrame:
        """Depth-decayed split importance (weight (1/4)^depth — shallow splits
        carry the heterogeneity signal; reference
        CausalForestVariableImportance exposes the same split-frequency idea)."""
        weights: dict[str, float] = {f: 0.0 for f in self.features}
        counts: dict[str, int] = {f: 0 for f in self.features}

        def walk(tree, nid, depth):
            node = tree[nid]
            if node.feature is None:
                return
            weights[node.feature] += 0.25 ** depth
            counts[node.feature] += 1
            walk(tree, node.left, depth + 1)
            walk(tree, node.right, depth + 1)

        for tree in self.trees_:
            walk(tree, 0, 0)
        total = max(sum(weights.values()), 1e-12)
        return pd.DataFrame(
            [{"feature": f, "splits": counts[f], "importance": w / total}
             for f, w in sorted(weights.items(), key=lambda kv: -kv[1])])
