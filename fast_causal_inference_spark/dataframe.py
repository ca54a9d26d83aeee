"""CausalDataFrame — the user-facing lazy DataFrame facade.

Mirrors the reference's client API surface (``dataframe/dataframe.py`` under
/root/reference: select/filter/withColumn/join/groupBy/agg plus statistical
methods) but wraps a *native* ``pyspark.sql.DataFrame`` — every relational verb
delegates straight to Spark so Catalyst owns optimization; only the statistical
verbs add behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class CausalDataFrame:
    """Thin statistical facade over a native Spark DataFrame.

    Unknown attributes delegate to the wrapped DataFrame; methods that would
    return a DataFrame are re-wrapped, so relational chaining stays fluent:
    ``cdf.filter("x > 0").groupBy("g")`` works as in vanilla PySpark.
    """

    def __init__(self, df: DataFrame):
        self._df = df

    # -- interop --------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def toSparkDf(self) -> DataFrame:
        return self._df

    def toPandas(self):
        return self._df.toPandas()

    def __getattr__(self, name):
        # dunder/private probes (pickle's __setstate__, deepcopy's
        # __deepcopy__, a half-initialized instance's _df) must raise,
        # not recurse through self._df
        if name.startswith("_"):
            raise AttributeError(name)
        attr = getattr(self._df, name)
        if callable(attr):
            def wrapper(*args, **kwargs):
                out = attr(*args, **kwargs)
                return CausalDataFrame(out) if isinstance(out, DataFrame) else out
            return wrapper
        return attr

    def __repr__(self):
        return f"CausalDataFrame({self._df})"

    def groupBy(self, *cols):
        """Reference drill-down UX: ``df.groupBy('ds').ttest_2samp(...)``
        (statistics.py docstrings) — returns a grouped view whose
        statistical verbs run per group.  Non-statistical names fall
        through to the native ``DataFrame.groupBy``.

        Expression keys are materialized as real columns first: the
        statistical verbs address their group columns BY NAME, and a
        recovered planned name like ``(x > 1)`` is not a resolvable
        column (same treatment as the SQL macro front-end's GROUP BY).
        A string that IS an existing column name — however odd
        (``"a-b"``, ``"Order Date"``) — is always taken as that column,
        never parsed as SQL; an aliased expression Column materializes
        under its alias.  Corner: an expression aliased to a name the
        frame already has resolves as that existing column."""
        from pyspark.sql import Column
        from pyspark.sql import functions as F

        existing = set(self._df.columns)
        names, out = [], self._df

        def _fresh(i: int, want: str | None) -> str:
            # planned alias when usable, else group_{i}; never clobber
            name = want if want and want.isidentifier() else f"group_{i}"
            while name in set(out.columns):
                name = f"_{name}"
            return name

        for i, c in enumerate(cols):
            if isinstance(c, Column):
                # Column args (valid in vanilla groupBy) would stringify
                # to "Column<'g'>" garbage — recover the planned name
                planned = self._df.select(c).columns[0]
                if planned in existing:
                    names.append(planned)
                else:
                    name = _fresh(i, planned)
                    out = out.withColumn(name, c)
                    names.append(name)
            elif isinstance(c, str) and c not in existing:
                # recover the planned name exactly like the Column branch:
                # a nested-field key ('probe.container') then materializes
                # under its leaf name ('container'), matching what vanilla
                # groupBy would call the output column — not group_{i}
                planned = self._df.select(F.expr(c)).columns[0]
                name = _fresh(i, planned)
                out = out.withColumn(name, F.expr(c))
                names.append(name)
            else:
                names.append(str(c))
        return CausalGroupedData(
            self if out is self._df else CausalDataFrame(out), names)

    # -- statistical verbs ---------------------------------------------
    def delta_method(self, expr: str, std: bool = True, group_cols=None):
        from fast_causal_inference_spark.operators.deltamethod import delta_method
        return delta_method(self._df, expr, std=std, group_cols=group_cols)

    def ttest_1samp(self, Y: str, alternative: str = "two-sided", mu: float = 0.0,
                    X: str | None = None, alpha: float = 0.05, group_cols=None):
        from fast_causal_inference_spark.operators.ttest import ttest_1samp
        return ttest_1samp(self._df, Y, alternative, mu, X, alpha, group_cols)

    def ttest_2samp(self, Y: str, index: str, alternative: str = "two-sided",
                    X: str | None = None, alpha: float = 0.05,
                    treatment_values=(0, 1), group_cols=None,
                    pse: str | None = None):
        from fast_causal_inference_spark.operators.ttest import ttest_2samp
        return ttest_2samp(self._df, Y, index, alternative, X, alpha,
                           treatment_values, group_cols, pse)

    def srm(self, x: str, groupby: str, ratio=None):
        from fast_causal_inference_spark.operators.srm import srm
        return srm(self._df, x, groupby, ratio)

    def ols(self, formula: str, use_bias: bool = True):
        from fast_causal_inference_spark.operators.ols import ols
        return ols(self._df, formula, use_bias=use_bias)

    def xexpt_ttest_2samp(self, numerator, denominator, index, uin, **kwargs):
        from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp
        return xexpt_ttest_2samp(self._df, numerator, denominator, index,
                                 uin, **kwargs)

    def mann_whitney_utest(self, data, index, **kwargs):
        from fast_causal_inference_spark.operators.mann_whitney import (
            mann_whitney_utest,
        )
        return mann_whitney_utest(self._df, data, index, **kwargs)

    def kolmogorov_smirnov_test(self, data, index, **kwargs):
        from fast_causal_inference_spark.operators.kstest import (
            kolmogorov_smirnov_test,
        )
        return kolmogorov_smirnov_test(self._df, data, index, **kwargs)

    def wls(self, formula: str, weight: str, use_bias: bool = True):
        from fast_causal_inference_spark.operators.ols import wls
        return wls(self._df, formula, weight, use_bias)

    def boot_strap(self, expr: str, **kwargs):
        from fast_causal_inference_spark.operators.resample import boot_strap
        return boot_strap(self._df, expr, **kwargs)

    def permutation(self, expr: str, index: str, **kwargs):
        from fast_causal_inference_spark.operators.resample import permutation
        return permutation(self._df, expr, index, **kwargs)

    # -- reference-named conveniences ----------------------------------
    # reference aggregate shorthands: df.stddevPop('x') → scalar
    def _agg1(self, fn_name: str, col: str):
        import fast_causal_inference_spark.functions as fn

        c = getattr(fn, fn_name)(col).alias("v")
        return self._df.agg(c).collect()[0]["v"]

    def any(self, col: str):
        return self._agg1("any_value", col)

    def anyLast(self, col: str):
        return self._agg1("anyLast", col)

    def anyMin(self, col: str, by: str | None = None):
        import fast_causal_inference_spark.functions as fn

        return self._df.agg(fn.anyMin(col, by or col).alias("v")) \
            .collect()[0]["v"]

    def anyMax(self, col: str, by: str | None = None):
        import fast_causal_inference_spark.functions as fn

        return self._df.agg(fn.anyMax(col, by or col).alias("v")) \
            .collect()[0]["v"]

    def stddevPop(self, col: str):
        return self._agg1("stddevPop", col)

    def stddevSamp(self, col: str):
        return self._agg1("stddevSamp", col)

    def varPop(self, col: str):
        return self._agg1("varPop", col)

    def varSamp(self, col: str):
        return self._agg1("varSamp", col)

    def covarPop(self, x: str, y: str):
        import fast_causal_inference_spark.functions as fn

        return self._df.agg(fn.covarPop(x, y).alias("v")).collect()[0]["v"]

    def covarSamp(self, x: str, y: str):
        import fast_causal_inference_spark.functions as fn

        return self._df.agg(fn.covarSamp(x, y).alias("v")).collect()[0]["v"]

    def brief(self):
        """Compact schema + size summary (reference ``brief``)."""
        n = self._df.count()
        cols = ", ".join(f"{f.name}:{f.dataType.simpleString()}"
                         for f in self._df.schema.fields)
        return f"rows={n} cols={len(self._df.columns)} [{cols}]"

    def student_ttest(self, value: str, index: str, **kwargs):
        from fast_causal_inference_spark.operators.ttest import student_ttest

        return student_ttest(self._df, value, index, **kwargs)

    def welch_ttest(self, value: str, index: str, **kwargs):
        from fast_causal_inference_spark.operators.ttest import welch_ttest

        return welch_ttest(self._df, value, index, **kwargs)

    def mean_z_test(self, value: str, index: str, var_x: float,
                    var_y: float, **kwargs):
        from fast_causal_inference_spark.operators.ttest import mean_z_test

        return mean_z_test(self._df, value, index, var_x, var_y, **kwargs)

    def matrix_multiplication(self, *cols, **kwargs):
        from fast_causal_inference_spark.operators.matrix import (
            matrix_multiplication,
        )

        return matrix_multiplication(self._df, *cols, **kwargs)

    def pearsonr(self, x: str, y: str, **kwargs):
        from fast_causal_inference_spark.operators.matrix import pearsonr

        return pearsonr(self._df, x, y, **kwargs)

    def quantile(self, col: str, level: float, exact: bool = False):
        import fast_causal_inference_spark.functions as fn

        return self._df.agg(
            fn.quantile(col, level, exact=exact).alias("quantile")) \
            .collect()[0]["quantile"]

    def quantiles(self, col: str, *levels: float, exact: bool = False):
        import fast_causal_inference_spark.functions as fn

        return list(self._df.agg(
            fn.quantiles(col, *levels, exact=exact).alias("q"))
            .collect()[0]["q"])

    def toClickHouse(self, table: str, **kwargs):
        """Alias of toOlap/toJdbc — point at a ClickHouse JDBC url via
        kwargs, else saves as a Spark table."""
        if "url" in kwargs:
            return self.toJdbc(kwargs.pop("url"), table, **kwargs)
        return self.toOlap(table)

    def toStarRocks(self, table: str, **kwargs):
        if "url" in kwargs:
            return self.toJdbc(kwargs.pop("url"), table, **kwargs)
        return self.toOlap(table)

    def boot_strap_ols(self, formula: str, **kwargs):
        from fast_causal_inference_spark.operators.resample import (
            boot_strap_ols,
        )

        return boot_strap_ols(self._df, formula, **kwargs)

    def boot_strap_multi(self, exprs, **kwargs):
        from fast_causal_inference_spark.operators.resample import (
            boot_strap_multi,
        )

        return boot_strap_multi(self._df, list(exprs), **kwargs)

    def quantile_test_bucket(self, Y, index, uin, **kwargs):
        from fast_causal_inference_spark.operators.quantile_test import (
            quantile_test_bucket,
        )

        return quantile_test_bucket(self._df, Y, index, uin, **kwargs)

    def stochastic_linear_regression(self, formula: str, **kwargs):
        from fast_causal_inference_spark.operators.logistic import (
            stochastic_linear_regression,
        )

        return stochastic_linear_regression(self._df, formula, **kwargs)

    def stochastic_logistic_regression(self, formula: str, **kwargs):
        from fast_causal_inference_spark.operators.logistic import (
            stochastic_logistic_regression,
        )

        return stochastic_logistic_regression(self._df, formula, **kwargs)

    def matching_plot(self, T: str, col: str, **kwargs):
        from fast_causal_inference_spark.operators.matching import (
            matching_plot,
        )

        return matching_plot(self._df, T, col, **kwargs)

    def did(self, Y: str, treatment: str, time: str, *covariates):
        from fast_causal_inference_spark.operators.ols import did

        return did(self._df, Y, treatment, time, *covariates)

    def regression_discontinuity(self, Y: str, running: str, cutoff: float,
                                 bandwidth: float, **kwargs):
        from fast_causal_inference_spark.operators.rdd import (
            regression_discontinuity,
        )

        return regression_discontinuity(self._df, Y, running, cutoff,
                                        bandwidth, **kwargs)

    def mccrary_density_test(self, running: str, cutoff: float,
                             bin_width: float, bandwidth: float, **kwargs):
        from fast_causal_inference_spark.operators.rdd import (
            mccrary_density_test,
        )

        return mccrary_density_test(self._df, running, cutoff, bin_width,
                                    bandwidth, **kwargs)

    def event_study(self, Y: str, unit: str, time: str, adoption: str,
                    **kwargs):
        from fast_causal_inference_spark.operators.eventstudy import (
            event_study,
        )

        return event_study(self._df, Y, unit, time, adoption, **kwargs)

    def synthetic_control(self, unit: str, time: str, Y: str,
                          treated_unit, treatment_time, **kwargs):
        from fast_causal_inference_spark.operators.synth import (
            synthetic_control,
        )

        return synthetic_control(self._df, unit, time, Y, treated_unit,
                                 treatment_time, **kwargs)

    def cluster_robust_ols(self, formula: str, cluster: str,
                           use_bias: bool = True):
        from fast_causal_inference_spark.operators.ols import (
            cluster_robust_ols,
        )

        return cluster_robust_ols(self._df, formula, cluster, use_bias)

    def iv_regression(self, formula: str):
        from fast_causal_inference_spark.operators.ols import iv_regression

        return iv_regression(self._df, formula)

    def kaplan_meier(self, time: str, event: str, group=None):
        from fast_causal_inference_spark.operators.survival import (
            kaplan_meier,
        )

        return kaplan_meier(self._df, time, event, group)

    def long_term(self, surrogates, treatment: str, **kwargs):
        """Recursive surrogate forecast with bootstrap CIs (reference
        LongTerm; dataframe/longterm.py:253-282)."""
        from fast_causal_inference_spark.operators.longterm import long_term

        return long_term(self._df, surrogates, treatment, **kwargs)

    def cox_ph(self, time: str, event: str, covariates, **kwargs):
        from fast_causal_inference_spark.operators.survival import cox_ph

        covariates = ([covariates] if isinstance(covariates, str)
                      else list(covariates))
        return cox_ph(self._df, time, event, covariates, **kwargs)

    def cupac_ttest_2samp(self, Y: str, index: str, features, **kwargs):
        """CUPED with a cross-fitted ML covariate (CUPAC)."""
        from fast_causal_inference_spark.operators.ttest import (
            cupac_ttest_2samp,
        )

        features = ([features] if isinstance(features, str)
                    else list(features))
        return cupac_ttest_2samp(self._df, Y, index, features, **kwargs)

    def get_lift_gain(self, ite: str, y: str, t: str, **kwargs):
        from fast_causal_inference_spark.uplift.evaluation import (
            get_lift_gain,
        )

        return get_lift_gain(self._df, ite, y, t, **kwargs)

    def estimate_ate(self, **kwargs):
        """Population diff-in-means ATE (+Poisson-bootstrap CI)."""
        from fast_causal_inference_spark.uplift.roi import estimate_ate

        return estimate_ate(self._df, **kwargs)

    def estimate_roi(self, **kwargs):
        from fast_causal_inference_spark.uplift.roi import estimate_roi

        return estimate_roi(self._df, **kwargs)

    def estimate_iroi(self, **kwargs):
        from fast_causal_inference_spark.uplift.roi import estimate_iroi

        return estimate_iroi(self._df, **kwargs)

    def estimate_qini(self, **kwargs):
        from fast_causal_inference_spark.uplift.roi import estimate_qini

        return estimate_qini(self._df, **kwargs)

    def estimate_cate_lift(self, **kwargs):
        from fast_causal_inference_spark.uplift.roi import (
            estimate_cate_lift,
        )

        return estimate_cate_lift(self._df, **kwargs)

    def estimate_cum_iroi(self, **kwargs):
        from fast_causal_inference_spark.uplift.roi import (
            estimate_cum_iroi,
        )

        return estimate_cum_iroi(self._df, **kwargs)

    def aipw_estimator(self, Y: str, T: str, X, **kwargs):
        """Doubly-robust AIPW ATE (outcome OLS + propensity model)."""
        from fast_causal_inference_spark.operators.estimators import (
            aipw_estimator,
        )

        X = [X] if isinstance(X, str) else list(X)
        return aipw_estimator(self._df, Y, T, X, **kwargs)

    def equivalence_ttest_2samp(self, Y: str, index: str, margin: float,
                                **kwargs):
        """TOST equivalence / non-inferiority test (margin in metric
        units); same formula/CUPED/grouping surface as ttest_2samp."""
        from fast_causal_inference_spark.operators.ttest import (
            equivalence_ttest_2samp,
        )

        return equivalence_ttest_2samp(self._df, Y, index, margin,
                                       **kwargs)

    def winsorized_ttest_2samp(self, Y: str, index: str,
                               lower: float = 0.01, upper: float = 0.99,
                               **kwargs):
        """t-test on the quantile-capped metric (whale-resistant)."""
        from fast_causal_inference_spark.operators.ttest import (
            winsorized_ttest_2samp,
        )

        return winsorized_ttest_2samp(self._df, Y, index, lower, upper,
                                      **kwargs)

    def cluster_ttest_2samp(self, Y: str, index: str, cluster: str,
                            **kwargs):
        """Two-sample t-test for cluster-randomized experiments (variance
        unit = cluster; delta method over cluster totals)."""
        from fast_causal_inference_spark.operators.ttest import (
            cluster_ttest_2samp,
        )

        return cluster_ttest_2samp(self._df, Y, index, cluster, **kwargs)

    def quantile_treatment_effect(self, Y: str, index: str, **kwargs):
        """QTE at each quantile level (exact per-arm quantiles, one scan;
        optional bucket-bootstrap SEs via uin=/n_bootstrap=)."""
        from fast_causal_inference_spark.operators.quantile_test import (
            quantile_treatment_effect,
        )

        return quantile_treatment_effect(self._df, Y, index, **kwargs)

    def linear_dml(self, Y: str, T: str, X, **kwargs):
        """LinearDML (reference ``uplift.py:2163`` class API as a method):
        cross-fitted residualization + final OLS; returns a DMLResult."""
        from fast_causal_inference_spark.operators.dml import linear_dml

        X = [X] if isinstance(X, str) else list(X)
        return linear_dml(self._df, Y, T, X, **kwargs)

    def linear_dml_grouped(self, Y: str, T: str, X, group_cols, **kwargs):
        """Per-segment LinearDML drill-down — 2 scans for ALL segments."""
        from fast_causal_inference_spark.operators.dml import (
            linear_dml_grouped,
        )

        X = [X] if isinstance(X, str) else list(X)
        group_cols = ([group_cols] if isinstance(group_cols, str)
                      else list(group_cols))
        return linear_dml_grouped(self._df, Y, T, X, group_cols, **kwargs)

    def non_param_dml(self, Y: str, T: str, X, **kwargs):
        """NonParamDML (reference NonParamDMLParser.java semantics)."""
        from fast_causal_inference_spark.operators.dml import non_param_dml

        X = [X] if isinstance(X, str) else list(X)
        return non_param_dml(self._df, Y, T, X, **kwargs)

    def caliper_matching(self, score: str, index: str, **kwargs):
        """1:k caliper matching on a score; adds ``match_index``."""
        from fast_causal_inference_spark.operators.matching import (
            caliper_matching,
        )

        return CausalDataFrame(caliper_matching(self._df, score, index,
                                                **kwargs))

    def exact_matching(self, index: str, exacts, **kwargs):
        """Exact matching on key columns; adds ``match_index``."""
        from fast_causal_inference_spark.operators.matching import (
            exact_matching,
        )

        exacts = [exacts] if isinstance(exacts, str) else list(exacts)
        return CausalDataFrame(exact_matching(self._df, index, exacts,
                                              **kwargs))

    def matched_pairs_ttest(self, Y: str, index: str,
                            match_col: str = "match_index", **kwargs):
        """Paired t-test on a matched sample (post-matching ATT).

        Unlike the other t-test methods, ``Y`` is a ROW-LEVEL outcome
        column — the pairing defines the aggregation."""
        from fast_causal_inference_spark.operators.matching import (
            matched_pairs_ttest,
        )

        return matched_pairs_ttest(self._df, Y, index, match_col, **kwargs)

    def prognostic_score_matching(self, outcome: str, index: str,
                                  covariates, **kwargs):
        """PSM on a control-fit prognostic score (reference match.py:299)."""
        from fast_causal_inference_spark.operators.matching import (
            prognostic_score_matching,
        )

        covariates = ([covariates] if isinstance(covariates, str)
                      else list(covariates))
        return CausalDataFrame(prognostic_score_matching(
            self._df, outcome, index, covariates, **kwargs))

    def roc_curve(self, label: str, score: str, **kwargs):
        from fast_causal_inference_spark.utility import roc_curve

        return roc_curve(self._df, label, score, **kwargs)

    def uplift_report(self, ite: str, y: str, t: str, **kwargs):
        """lift/gain + Qini + AUUC + calibration from ONE scan."""
        from fast_causal_inference_spark.uplift.evaluation import (
            uplift_report,
        )

        return uplift_report(self._df, ite, y, t, **kwargs)

    # -- temporal / pipeline verbs (round 4) ---------------------------
    def asof_join(self, right, on, left_ts: str = "ts", **kwargs):
        """Nearest-event join (distributed merge_asof); right may be a
        CausalDataFrame or a Spark DataFrame."""
        from fast_causal_inference_spark.operators.temporal import asof_join

        r = right._df if isinstance(right, CausalDataFrame) else right
        return CausalDataFrame(asof_join(self._df, r, on, left_ts,
                                         **kwargs))

    def range_join(self, intervals, on, point_ts: str, start_ts: str,
                   end_ts: str, **kwargs):
        from fast_causal_inference_spark.operators.temporal import (
            range_join,
        )

        iv = intervals._df if isinstance(intervals, CausalDataFrame) \
            else intervals
        return CausalDataFrame(range_join(self._df, iv, on, point_ts,
                                          start_ts, end_ts, **kwargs))

    def time_bucket_rollup(self, ts_col: str, resolutions, aggs,
                           group_cols=None):
        from fast_causal_inference_spark.operators.temporal import (
            time_bucket_rollup,
        )

        return CausalDataFrame(time_bucket_rollup(
            self._df, ts_col, list(resolutions), list(aggs), group_cols))

    def sessionize(self, user_col: str, ts_col: str,
                   gap: str = "30 minutes", value_col: str | None = None):
        from fast_causal_inference_spark.streaming.ops import sessionize

        return CausalDataFrame(sessionize(self._df, user_col, ts_col,
                                          gap, value_col))

    def anova_oneway(self, y: str, index: str, **kwargs):
        from fast_causal_inference_spark.operators.anova import anova_oneway

        return anova_oneway(self._df, y, index, **kwargs)

    def bartlett_test(self, y: str, index: str):
        from fast_causal_inference_spark.operators.anova import (
            bartlett_test,
        )

        return bartlett_test(self._df, y, index)

    def kruskal_wallis_test(self, y: str, index: str, **kwargs):
        from fast_causal_inference_spark.operators.anova import (
            kruskal_wallis_test,
        )

        return kruskal_wallis_test(self._df, y, index, **kwargs)

    def proportion_ztest(self, success: str, index: str, **kwargs):
        from fast_causal_inference_spark.operators.proportion import (
            proportion_ztest,
        )

        return proportion_ztest(self._df, success, index, **kwargs)

    def chi_square_independence(self, x: str, y: str, **kwargs):
        from fast_causal_inference_spark.operators.contingency import (
            chi_square_independence,
        )

        return chi_square_independence(self._df, x, y, **kwargs)

    def fisher_exact_2x2(self, x: str, y: str, **kwargs):
        from fast_causal_inference_spark.operators.contingency import (
            fisher_exact_2x2,
        )

        return fisher_exact_2x2(self._df, x, y, **kwargs)

    def near_dup_pairs(self, method: str = "minhash",
                       text_col: str = "text", id_col: str = "doc_id",
                       **kwargs):
        """Near-duplicate pair relation over a document frame:
        ``method`` ∈ {'minhash', 'simhash', 'ngram'} (datapipe.dedup)."""
        from fast_causal_inference_spark.datapipe import dedup

        fns = {"minhash": dedup.minhash_lsh_pairs,
               "simhash": dedup.simhash_pairs,
               "ngram": dedup.ngram_jaccard_pairs}
        if method not in fns:
            raise ValueError(f"method must be one of {sorted(fns)}")
        return CausalDataFrame(fns[method](self._df, text_col=text_col,
                                           id_col=id_col, **kwargs))

    def exact_dedup(self, text_col: str = "text", id_col: str = "doc_id"):
        from fast_causal_inference_spark.datapipe.dedup import exact_dedup

        return CausalDataFrame(exact_dedup(self._df, text_col, id_col))

    def effect_size(self, y: str, index: str, **kwargs):
        from fast_causal_inference_spark.operators.power import effect_size

        return effect_size(self._df, y, index, **kwargs)

    def bm25_search(self, queries, k: int = 10, **kwargs):
        """BM25 top-k retrieval against this frame as the corpus;
        ``queries`` is a small (query_id, query) frame (broadcast)."""
        from fast_causal_inference_spark.datapipe.retrieval import (
            bm25_search,
        )

        q = queries._df if isinstance(queries, CausalDataFrame) else queries
        return CausalDataFrame(bm25_search(self._df, q, k=k, **kwargs))

    def tfidf_search(self, queries, k: int = 10, **kwargs):
        from fast_causal_inference_spark.datapipe.retrieval import (
            tfidf_search,
        )

        q = queries._df if isinstance(queries, CausalDataFrame) else queries
        return CausalDataFrame(tfidf_search(self._df, q, k=k, **kwargs))

    def stratified_sample(self, strata_cols, **kwargs):
        from fast_causal_inference_spark.datapipe.training import (
            stratified_sample,
        )

        return CausalDataFrame(stratified_sample(self._df, strata_cols,
                                                 **kwargs))

    def reservoir_sample(self, n: int, **kwargs):
        from fast_causal_inference_spark.datapipe.training import (
            reservoir_sample,
        )

        return CausalDataFrame(reservoir_sample(self._df, n, **kwargs))

    def semantic_dedup(self, threshold: float = 0.95, **kwargs):
        """SemDeDup semantic deduplication over an embedding column."""
        from fast_causal_inference_spark.datapipe.similarity import (
            semantic_dedup,
        )

        return CausalDataFrame(semantic_dedup(self._df, threshold,
                                              **kwargs))

    def bpe_encode(self, model: dict, **kwargs):
        """Tokenize with a `train_bpe` model -> array<string> column."""
        from fast_causal_inference_spark.datapipe.tokenizer import bpe_encode

        return CausalDataFrame(bpe_encode(self._df, model, **kwargs))

    def quality_classifier_score(self, model: dict, **kwargs):
        """NB quality log-odds under a `train_quality_classifier` model."""
        from fast_causal_inference_spark.datapipe.quality import (
            quality_classifier_score,
        )

        return CausalDataFrame(
            quality_classifier_score(self._df, model, **kwargs))

    def repeated_substring_spans(self, **kwargs):
        """Exact cross-document repeated token spans (Lee et al.)."""
        from fast_causal_inference_spark.datapipe.dedup import (
            repeated_substring_spans,
        )

        return CausalDataFrame(
            repeated_substring_spans(self._df, **kwargs))

    def chunk_documents(self, chunk_tokens: int = 256, overlap: int = 0,
                        **kwargs):
        """Fixed-token-window chunking (context-window prep)."""
        from fast_causal_inference_spark.datapipe.text import (
            chunk_documents,
        )

        return CausalDataFrame(chunk_documents(
            self._df, chunk_tokens=chunk_tokens, overlap=overlap,
            **kwargs))

    def perplexity_filter(self, lm: dict, max_ppl: float, **kwargs):
        """CCNet-style perplexity cut under a `train_bigram_lm` model."""
        from fast_causal_inference_spark.datapipe.lm import (
            perplexity_filter,
        )

        return CausalDataFrame(perplexity_filter(self._df, lm, max_ppl,
                                                 **kwargs))

    def url_dedup(self, url_col: str = "url", **kwargs):
        from fast_causal_inference_spark.datapipe.quality import url_dedup

        return CausalDataFrame(url_dedup(self._df, url_col, **kwargs))

    def media_probe(self, payload_col: str = "payload", **kwargs):
        """Container-level media metadata probe struct per row
        (MP3/MP4/WAV/FLAC/Ogg/WebP/image headers — no decode)."""
        from fast_causal_inference_spark.datapipe.mediaprobe import (
            media_probe,
        )

        return CausalDataFrame(media_probe(self._df, payload_col,
                                           **kwargs))

    def image_stats(self, payload_col: str = "payload", **kwargs):
        """REAL decode stats (width/height/mean_pixel) for
        BMP/PPM/PNG/GIF/baseline-JPEG payload columns."""
        from fast_causal_inference_spark.datapipe.multimodal import (
            image_stats,
        )

        return CausalDataFrame(image_stats(self._df, payload_col,
                                           **kwargs))

    def image_features(self, payload_col: str = "payload", **kwargs):
        from fast_causal_inference_spark.datapipe.multimodal import (
            image_features,
        )

        return CausalDataFrame(image_features(self._df, payload_col,
                                              **kwargs))

    def audio_stats(self, payload_col: str = "payload", **kwargs):
        """REAL decode stats (n_samples/sample_rate/rms) for
        WAV/FLAC/Ogg-FLAC payload columns."""
        from fast_causal_inference_spark.datapipe.multimodal import (
            audio_stats,
        )

        return CausalDataFrame(audio_stats(self._df, payload_col,
                                           **kwargs))

    def audio_features(self, payload_col: str = "payload", **kwargs):
        from fast_causal_inference_spark.datapipe.multimodal import (
            audio_features,
        )

        return CausalDataFrame(audio_features(self._df, payload_col,
                                              **kwargs))

    def bayes_ab_binary(self, success: str, index: str, **kwargs):
        """Beta-Bernoulli Bayesian A/B readout (P(win), expected loss)."""
        from fast_causal_inference_spark.operators.bayes import (
            bayes_ab_binary,
        )

        return bayes_ab_binary(self._df, success, index, **kwargs)

    def bayes_ab_continuous(self, y: str, index: str, **kwargs):
        """Normal-posterior Bayesian A/B readout for continuous metrics."""
        from fast_causal_inference_spark.operators.bayes import (
            bayes_ab_continuous,
        )

        return bayes_ab_continuous(self._df, y, index, **kwargs)

    def experiment_scorecard(self, metrics: dict, index: str, **kwargs):
        """N-metric two-sample scorecard in one scan (+BH adjustment)."""
        from fast_causal_inference_spark.operators.scorecard import (
            experiment_scorecard,
        )

        return experiment_scorecard(self._df, metrics, index, **kwargs)

    def group_sequential_ttest(self, y: str, index: str, look: str,
                               **kwargs):
        """Scheduled-looks monitor with Lan-DeMets spending boundaries."""
        from fast_causal_inference_spark.operators.sequential import (
            group_sequential_ttest,
        )

        return group_sequential_ttest(self._df, y, index, look, **kwargs)

    def top_k_per_key(self, keys, order_col: str, k: int, **kwargs):
        from fast_causal_inference_spark.operators.skew import (
            top_k_per_key,
        )

        return CausalDataFrame(top_k_per_key(self._df, keys, order_col,
                                             k, **kwargs))

    def split(self, test_size: float = 0.5, seed: int | None = None):
        """Train/test split (reference dataframe.py:857-874)."""
        return [CausalDataFrame(d) for d in
                self._df.randomSplit([1 - test_size, test_size], seed=seed)]

    def materializedView(self, name: str | None = None,
                         physical: bool = False):
        """Persist the current plan (reference dataframe.py:1753-1790):
        temp view + cache by default, a saved table when ``physical``."""
        name = name or f"fcis_view_{abs(hash(self)) % 10**9}"
        if physical:
            self._df.write.mode("overwrite").saveAsTable(name)
        else:
            self._df.cache().createOrReplaceTempView(name)
        return name

    def readJdbc(self, url: str, table: str, **options):
        """JDBC source (the Spark-native analogue of the reference's
        readClickHouse/readStarRocks — point it at any JDBC OLAP engine)."""
        reader = self._df.sparkSession.read.format("jdbc") \
            .option("url", url).option("dbtable", table)
        for k, v in options.items():
            reader = reader.option(k, v)
        return CausalDataFrame(reader.load())

    def toJdbc(self, url: str, table: str, mode: str = "append", **options):
        """JDBC sink (toClickHouse/toStarRocks analogue)."""
        writer = self._df.write.format("jdbc").mode(mode) \
            .option("url", url).option("dbtable", table)
        for k, v in options.items():
            writer = writer.option(k, v)
        writer.save()
        return self

    def toCsv(self, path: str, **options):
        opts = {"header": True, **options}    # caller's header wins
        self._df.write.options(**opts).mode("overwrite").csv(path)

    def toOlap(self, table: str, mode: str = "overwrite"):
        self._df.write.mode(mode).saveAsTable(table)

    # NOTE: toClickHouse/toStarRocks are REAL methods above (JDBC-url
    # dispatch with a toOlap fallback) — a class-body alias here would
    # shadow them and kill the documented url= path

    def getExecutedSql(self) -> str:
        """Introspection parity (reference getExecutedSql): the optimized
        logical plan Catalyst will run."""
        return self._df._jdf.queryExecution().optimizedPlan().toString()

    def getTableName(self) -> str:
        plan = self._df._jdf.queryExecution().analyzed().toString()
        return plan.splitlines()[-1].strip()

    def describe(self, cols=None):
        from pyspark.sql import functions as F
        df = self._df
        if cols is None:
            cols = [f.name for f in df.schema.fields
                    if f.dataType.typeName() in
                    ("double", "float", "long", "integer", "short", "decimal")]
        import pandas as pd
        levels = [0.25, 0.5, 0.75, 0.9, 0.99]
        stats_names = ["count", "avg", "std", "min", "25%", "50%", "75%",
                       "90%", "99%", "max"]
        if not cols:
            # a numeric-free frame: df.agg() with zero aggregates raises
            # an opaque Py4J error — an empty summary is the honest answer
            return pd.DataFrame(index=stats_names)
        aggs = []
        for c in cols:
            x = F.col(c).cast("double")
            # ONE percentile sketch per column (array of levels), not one
            # per level — five scalar percentile_approx aggs each build
            # their own KLL sketch over the same values
            aggs += [F.count(x).alias(f"{c}__count"), F.avg(x).alias(f"{c}__avg"),
                     F.stddev_samp(x).alias(f"{c}__std"), F.min(x).alias(f"{c}__min"),
                     F.percentile_approx(
                         x, F.array(*[F.lit(p) for p in levels]))
                     .alias(f"{c}__q"),
                     F.max(x).alias(f"{c}__max")]
        row = df.agg(*aggs).collect()[0]
        import pandas as pd
        stats = ["count", "avg", "std", "min", "25%", "50%", "75%", "90%", "99%", "max"]

        def _col_stats(c):
            qv = row[f"{c}__q"] or [None] * len(levels)
            base = {s: row[f"{c}__{s}"] for s in
                    ("count", "avg", "std", "min", "max")}
            base.update(dict(zip(["25%", "50%", "75%", "90%", "99%"], qv)))
            return [base[s] for s in stats]

        return pd.DataFrame({c: _col_stats(c) for c in cols}, index=stats)


# ---------------------------------------------------------------------------
# sources (reference dataframe.py:1985-2046 readCsv/readSparkDf/readOlap)
# ---------------------------------------------------------------------------


class CausalGroupedData:
    """Grouped statistical verbs (the reference's drill-down chaining)."""

    _GROUPED_VERBS = {
        "delta_method", "ttest_1samp", "ttest_2samp", "xexpt_ttest_2samp",
    }

    def __init__(self, cdf: CausalDataFrame, cols: list[str]):
        self._cdf = cdf
        self._cols = cols

    def __getattr__(self, name):
        # same guard as CausalDataFrame.__getattr__: dunder/private
        # probes (pickle's __setstate__, deepcopy's __deepcopy__, a
        # half-initialized instance's _cdf) must raise, not recurse
        # through self._cdf — which itself resolves via __getattr__ here
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self._GROUPED_VERBS:
            fn = getattr(self._cdf, name)

            def wrapper(*args, **kwargs):
                kwargs.setdefault("group_cols", self._cols)
                return fn(*args, **kwargs)

            return wrapper
        if name == "mann_whitney_utest":
            def mw(data, index, **kwargs):
                from fast_causal_inference_spark.operators.mann_whitney \
                    import mann_whitney_utest_grouped

                return mann_whitney_utest_grouped(
                    self._cdf.df, data, index, self._cols, **kwargs)
            return mw
        if name == "kolmogorov_smirnov_test":
            def ks(data, index, **kwargs):
                from fast_causal_inference_spark.operators.kstest \
                    import kolmogorov_smirnov_test_grouped

                return kolmogorov_smirnov_test_grouped(
                    self._cdf.df, data, index, self._cols, **kwargs)
            return ks
        if name == "srm":
            def _srm(x, groupby, ratio=None, **kwargs):
                from fast_causal_inference_spark.operators.srm import (
                    srm_grouped,
                )

                return srm_grouped(self._cdf.df, x, groupby, self._cols,
                                   ratio, **kwargs)
            return _srm
        if name == "quantile_test_bucket":
            def _qtb(Y, index, uin, **kwargs):
                from fast_causal_inference_spark.operators.quantile_test \
                    import quantile_test_bucket_grouped

                return quantile_test_bucket_grouped(
                    self._cdf.df, Y, index, uin, self._cols, **kwargs)
            return _qtb
        # everything else: the native grouped API — re-wrap DataFrame
        # results so .agg(...) keeps the facade's statistical verbs
        attr = getattr(self._cdf.df.groupBy(*self._cols), name)
        if callable(attr):
            def wrapper(*args, **kwargs):
                out = attr(*args, **kwargs)
                return CausalDataFrame(out) if isinstance(out, DataFrame) \
                    else out
            return wrapper
        return attr


def readCsv(path: str, spark: SparkSession | None = None, **options) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    opts = {"header": "true", "inferSchema": "true", **options}
    return CausalDataFrame(spark.read.options(**opts).csv(path))


def readParquet(path: str, spark: SparkSession | None = None) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    return CausalDataFrame(spark.read.parquet(path))


def readTable(name: str, spark: SparkSession | None = None) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    return CausalDataFrame(spark.table(name))


def readJson(path: str, spark: SparkSession | None = None,
             **options) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    return CausalDataFrame(spark.read.options(**options).json(path))


def readOrc(path: str, spark: SparkSession | None = None) -> CausalDataFrame:
    spark = spark or SparkSession.getActiveSession()
    return CausalDataFrame(spark.read.orc(path))


def readOlap(name_or_url: str, table: str | None = None,
             spark: SparkSession | None = None, **options) -> CausalDataFrame:
    """Entry-point parity with the reference's ``readOlap`` /
    ``readClickHouse`` / ``readStarRocks`` (``dataframe.py:1985-2013``):
    with one argument it wraps a catalog table (lakehouse deployment); with
    a JDBC url + table it reads straight from the OLAP engine."""
    spark = spark or SparkSession.getActiveSession()
    if table is None:
        return readTable(name_or_url, spark)
    reader = spark.read.format("jdbc") \
        .option("url", name_or_url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return CausalDataFrame(reader.load())


readClickHouse = readOlap
readStarRocks = readOlap


def readSparkDf(df: DataFrame, na_fill: float | None = None) -> CausalDataFrame:
    """Wrap a Spark DataFrame; ``na_fill`` fills numeric NULLs first
    (the reference's ingest preprocessing — lib/tools.py:578 fills NA so
    sufficient-statistics counts and sums stay consistent)."""
    if na_fill is not None:
        num_cols = [f.name for f in df.schema.fields
                    if f.dataType.typeName() in
                    ("double", "float", "long", "integer", "short",
                     "byte") or f.dataType.typeName().startswith("decimal")]
        df = df.na.fill(na_fill, subset=num_cols)
    return CausalDataFrame(df)
