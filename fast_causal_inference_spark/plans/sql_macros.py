"""All-in-SQL macro front-end.

The reference exposes its operators as SQL "macro" functions expanded by a
forked Calcite gateway (``SqlForward.java``, parsers in ``sql/olap/`` —
deltamethod, ttest_1samp/2samp, srm, ols/wls, did, lift, linearDML,
caliperMatching, xexpt_ttest_2samp…). Here the same surface is a thin
pre-processor: ``sql(spark, "SELECT ttest_2samp('avg(n)/avg(d)', t) FROM
tbl WHERE ... GROUP BY g")`` detects a macro call in the select list, applies
WHERE/GROUP BY, and routes to the corresponding operator — no string-template
SQL generation, Catalyst sees the operator's native plan. Non-macro SQL falls
through to ``spark.sql`` untouched.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_MACRO_RE = re.compile(
    r"^\s*SELECT\s+(?P<fn>[A-Za-z_][A-Za-z_0-9]*)\s*\((?P<args>.*)\)\s*"
    r"FROM\s+(?P<table>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<groupby>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

MACROS = frozenset({
    "deltamethod", "delta_method", "avg_metric",
    "ttest_1samp", "ttest_2samp", "ttests_2samp",
    "xexpt_ttest_2samp", "srm",
    "mann_whitney_utest", "kolmogorov_smirnov_test",
    "ols", "wls", "did", "ivregression", "iv_regression",
    "lineardml", "nonparamdml", "lift", "calipermatching", "exactmatching",
    "boot_strap", "bootstrap", "permutation", "group_set", "pearsonr",
    "bootstrapmulti", "boot_strap_multi", "bootstrapols", "boot_strap_ols",
    "quantiletestbucket", "quantile_test_bucket", "cutbins",
    "olsstate", "predict",
    "recursiveforcasting", "recursive_forcasting",
})


def _split_args(s: str) -> list[str]:
    """Split on top-level commas (paren/quote aware)."""
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [a for a in out if a]


def _lit(arg: str):
    """Unquote string literals; parse numbers/booleans and kwarg forms."""
    a = arg.strip()
    if len(a) >= 2 and a[0] in "'\"" and a[-1] == a[0]:
        return a[1:-1]
    # SQL boolean literals: bool('false') is True in Python, so kwargs
    # like use_bias=false / std=false could never be turned off
    if a.lower() == "true":
        return True
    if a.lower() == "false":
        return False
    try:
        return int(a)
    except ValueError:
        pass
    try:
        return float(a)
    except ValueError:
        pass
    return a


def _kwargs(args: list[str]) -> tuple[list, dict]:
    pos, kw = [], {}
    for a in args:
        m = re.match(r"^([A-Za-z_][A-Za-z_0-9]*)\s*=\s*(?![=])(.*)$", a)
        if m:
            kw[m.group(1)] = _lit(m.group(2))
        else:
            pos.append(_lit(a))
    return pos, kw


def sql(spark: SparkSession, query: str):
    """Run a (possibly macro-bearing) SQL string.

    Returns whatever the macro returns (DataFrame or pandas DataFrame for
    report-style operators); plain SQL returns ``spark.sql(query)``.
    """
    m = _MACRO_RE.match(query)
    if not m or m.group("fn").lower() not in MACROS:
        return spark.sql(query)
    fn = m.group("fn").lower()
    df = spark.table(m.group("table"))
    if m.group("where"):
        df = df.where(m.group("where"))
    group_cols = None
    if m.group("groupby"):
        from pyspark.sql import functions as F

        group_cols = []
        # paren-aware split: a bare comma split would shred expression
        # keys like substr(city, 1, 3) into invalid fragments
        for i, g in enumerate(s.strip()
                              for s in _split_args(m.group("groupby"))):
            if g.isidentifier():
                group_cols.append(g)
            else:
                # expression keys are materialized so operators see plain names
                name = f"group_{i}"
                df = df.withColumn(name, F.expr(g))
                group_cols.append(name)
    pos, kw = _kwargs(_split_args(m.group("args")))
    return _dispatch(fn, df, pos, kw, group_cols)


def _dispatch(fn: str, df: DataFrame, pos: list, kw: dict,
              group_cols: list[str] | None):
    from fast_causal_inference_spark.operators import (
        deltamethod,
        dml,
        groupset,
        kstest,
        mann_whitney,
        matching,
        matrix,
        ols,
        resample,
        srm,
        ttest,
        xexpt,
    )

    if fn in ("deltamethod", "delta_method"):
        std = bool(kw.pop("std", pos[1] if len(pos) > 1 else True))
        return deltamethod.delta_method(df, pos[0], std=std,
                                        group_cols=group_cols, **kw)
    if fn == "avg_metric":
        return deltamethod.avg_metric(df, pos[0], group_cols=group_cols)
    if fn == "ttest_1samp":
        return ttest.ttest_1samp(df, pos[0],
                                 *(p for p in pos[1:]), group_cols=group_cols,
                                 **{k.lower(): v for k, v in kw.items()})
    if fn == "ttest_2samp":
        x = kw.pop("X", kw.pop("x", None))
        extra = [p for p in pos[2:]]
        alt = extra[0] if extra else kw.pop("alternative", "two-sided")
        return ttest.ttest_2samp(df, pos[0], str(pos[1]), alternative=alt,
                                 X=x, group_cols=group_cols,
                                 pse=kw.pop("pse", None))
    if fn == "ttests_2samp":
        return ttest.ttests_2samp(df, pos[0], str(pos[1]),
                                  alternatives=pos[2] if len(pos) > 2
                                  else "two-sided", group_cols=group_cols)
    if fn == "xexpt_ttest_2samp":
        return xexpt.xexpt_ttest_2samp_spark(
            df, str(pos[0]), str(pos[1]), str(pos[2]), str(pos[3]),
            group_cols=group_cols,
            **{("mde" if k == "MDE" else k): v for k, v in kw.items()})
    if fn == "srm":
        ratio = kw.pop("ratio", pos[2] if len(pos) > 2 else None)
        if isinstance(ratio, str):
            ratio = [float(x) for x in re.findall(r"[\d.]+", ratio)]
        return srm.srm_spark(df, str(pos[0]), str(pos[1]), ratio)
    if fn == "mann_whitney_utest":
        if group_cols:
            return mann_whitney.mann_whitney_utest_grouped(
                df, str(pos[0]), str(pos[1]), group_cols, **kw)
        return mann_whitney.mann_whitney_utest_spark(df, str(pos[0]),
                                                     str(pos[1]), **kw)
    if fn == "kolmogorov_smirnov_test":
        if group_cols:
            return kstest.kolmogorov_smirnov_test_grouped(
                df, str(pos[0]), str(pos[1]), group_cols, **kw)
        return kstest.kolmogorov_smirnov_test_spark(df, str(pos[0]),
                                                    str(pos[1]))
    if fn in ("ols", "wls"):
        # wls takes its weight as the LAST positional (or weight=...);
        # the weight must be peeled off BEFORE the formula is assembled
        # — otherwise wls('y~x', w) produced the malformed 'y~x ~ w'
        # and wls(y, x1, w) silently regressed on the weight column
        weight = kw.get("weight")
        args = list(pos)
        if fn == "wls" and weight is None:
            if len(args) < 2:
                raise ValueError(
                    "wls needs a weight: wls('y~x', w) or "
                    "wls('y~x', weight=w)")
            weight = args.pop()
        if len(args) == 1 and "~" in str(args[0]):
            formula = str(args[0])
        else:
            formula = f"{args[0]} ~ {' + '.join(str(p) for p in args[1:])}"
        if fn == "wls":
            return ols.wls(df, formula, weight=str(weight))
        return ols.ols(df, formula, use_bias=bool(kw.get("use_bias", True)))
    if fn == "did":
        return ols.did(df, str(pos[0]), str(pos[1]), str(pos[2]),
                       *(str(p) for p in pos[3:]))
    if fn in ("ivregression", "iv_regression"):
        return ols.iv_regression(df, str(pos[0]))
    if fn == "lineardml":
        x = kw.pop("X", None) or pos[2]
        xs = [p.strip() for p in str(x).split("+")]
        return dml.linear_dml(df, str(pos[0]), str(pos[1]), xs,
                              cv=int(kw.pop("cv", 3)), **kw)
    if fn == "nonparamdml":
        xs = [p.strip() for p in str(pos[2]).split("+")]
        return dml.non_param_dml(df, str(pos[0]), str(pos[1]), xs,
                                 cv=int(kw.pop("cv", 3)))
    if fn == "lift":
        from fast_causal_inference_spark.uplift import evaluation

        return evaluation.get_lift_gain(df, str(pos[0]), str(pos[1]),
                                        str(pos[2]),
                                        k=int(pos[3]) if len(pos) > 3 else 10)
    if fn == "calipermatching":
        return matching.caliper_matching(
            df, str(pos[0]), str(pos[1]),
            caliper=float(pos[2]) if len(pos) > 2 else 0.05,
            k=int(kw.get("k", 1)))
    if fn == "exactmatching":
        return matching.exact_matching(df, str(pos[0]),
                                       [str(p) for p in pos[1:]])
    if fn in ("boot_strap", "bootstrap"):
        return resample.boot_strap(df, str(pos[0]),
                                   n_resamples=int(pos[1]) if len(pos) > 1
                                   else 100,
                                   **{k: v for k, v in kw.items()})
    if fn == "permutation":
        import pandas as _pd

        out = resample.permutation(df, str(pos[0]), str(pos[1]),
                                   permutation_num=int(pos[2])
                                   if len(pos) > 2 else 100)
        return df.sparkSession.createDataFrame(_pd.DataFrame(out))
    if fn in ("bootstrapmulti", "boot_strap_multi"):
        exprs = [str(p) for p in pos if "(" in str(p)]
        return resample.boot_strap_multi(
            df, exprs, n_resamples=int(kw.pop("n_resamples", 100)), **kw)
    if fn in ("bootstrapols", "boot_strap_ols"):
        pdf = resample.boot_strap_ols(
            df, str(pos[0]), n_resamples=int(kw.pop("n_resamples",
                                                    pos[1] if len(pos) > 1
                                                    else 100)), **kw)
        return df.sparkSession.createDataFrame(pdf)
    if fn in ("quantiletestbucket", "quantile_test_bucket"):
        from fast_causal_inference_spark.operators import quantile_test

        pct = kw.pop("percentiles", None)
        if isinstance(pct, str):
            pct = tuple(float(x) for x in re.findall(r"[\d.]+", pct))
        return quantile_test.quantile_test_bucket_spark(
            df, str(pos[0]), str(pos[1]), str(pos[2]),
            percentiles=pct or (0.25, 0.5, 0.75),
            **{k.lower(): v for k, v in kw.items()})
    if fn in ("recursiveforcasting", "recursive_forcasting"):
        from fast_causal_inference_spark.operators import longterm

        surro = [s.strip() for s in str(pos[0]).split("+")]
        pdf = longterm.long_term_effect(
            df, surro, str(pos[1]), str(pos[2]),
            **{k.lower(): v for k, v in kw.items()})
        return df.sparkSession.createDataFrame(pdf)
    if fn == "olsstate":
        # olsState('y ~ x1 + x2') -> one-row relation with the serialized
        # model (reference gateway UDF dict: olsState / predict pair)
        formula = str(pos[0])
        model = ols.ols(df, formula,
                        use_bias=bool(kw.get("use_bias", True)))
        return df.sparkSession.createDataFrame(
            [(model.to_json(),)], "model string")
    if fn == "predict":
        # predict('<model-json>') -> FROM-table + prediction column
        from fast_causal_inference_spark.operators.ols import OlsModel

        model = OlsModel.from_json(str(pos[0]))
        return model.predict(df, alias=str(kw.get("alias", "prediction")))
    if fn == "cutbins":
        # cutbins(x, '[0, 10, 20]' [, labels]) — appends {x}_bin
        import json as _json

        from fast_causal_inference_spark.functions.features import cut_bins

        col = str(pos[0])
        bins = pos[1]
        if isinstance(bins, str):
            bins = _json.loads(bins)
        labels = kw.get("labels", pos[2] if len(pos) > 2 else None)
        if isinstance(labels, str):
            labels = _json.loads(labels)
        return df.withColumn(
            f"{col}_bin",
            cut_bins(col, list(bins),
                     labels=list(labels) if labels is not None else None))
    if fn == "group_set":
        return groupset.group_set(df, str(pos[0]), str(pos[1]),
                                  [str(p) for p in pos[2:]])
    if fn == "pearsonr":
        out = matrix.pearsonr(df, str(pos[0]), str(pos[1]),
                              group_cols=group_cols)
        return df.sparkSession.createDataFrame(out)
    raise ValueError(f"unknown macro {fn!r}")
