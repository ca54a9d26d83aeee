"""Round-10 self-review fixes (inline code-review findings on the
round diff): LIMIT in the macro fast path, the caliperMatching
argument convention, WHERE-before-matching semantics, unresolved-column
error transparency, the Edgeworth two-sided fast path, backtick
scanner desync, and alternative-vs-covariate binding."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.plans.sql_macros import (
    _quote_nonascii_identifiers,
    sql,
)


@pytest.fixture(scope="module", autouse=True)
def views(spark, ab_df):
    ab_df.createOrReplaceTempView("ab")
    yield


def test_limit_on_macro_fast_path(spark):
    """'SELECT macro(...) FROM t WHERE ... LIMIT n' previously matched
    the fast-path regex with the LIMIT swallowed into WHERE ->
    ParseException; now the limit group captures it."""
    out = sql(spark, "SELECT caliperMatching(treatment, weight, 0.1) "
                     "FROM ab WHERE x1 > 0 LIMIT 5")
    assert out.count() == 5
    out2 = sql(spark, "SELECT ttest_2samp('avg(y)', treatment) FROM ab "
                      "GROUP BY x3 > 1 LIMIT 1")
    assert out2.count() == 1


def test_caliper_macro_gateway_argument_order(spark):
    """caliperMatching(treatment_expr, score, caliper) everywhere —
    the sole-item form must bind pos[0] as the TREATMENT like the
    reference template (if(expr=1,1,-1)), not as the score."""
    out = sql(spark, "SELECT caliperMatching(treatment, weight, 0.1) "
                     "FROM ab").where("match_index != 0").toPandas()
    assert len(out) > 0
    assert ((out["match_index"] > 0) == (out["treatment"] == 1)).all()
    # a 0/1 treatment expr normalizes exactly like the gateway template
    out2 = sql(spark, "SELECT caliperMatching(if(treatment = 1, 1, 0),"
                      " weight, 0.1) FROM ab") \
        .where("match_index != 0").toPandas()
    assert set(np.sign(out2["match_index"])) == {-1, 1}


def test_star_caliper_where_filters_before_matching(spark):
    """A WHERE that does NOT reference the macro output filters BEFORE
    matching (SQL semantics): no kept row may be paired with a
    filtered-out one."""
    out = sql(spark, "select *, caliperMatching(if(treatment=1,1,-1), "
                     "weight, 0.1) AS mi from ab where x1 > 0") \
        .toPandas()
    assert (out["x1"] > 0).all()
    # every nonzero |mi| appears exactly twice WITHIN the filtered set
    nz = out[out["mi"] != 0]
    assert (nz.groupby(nz["mi"].abs()).size() == 2).all()


def test_unresolved_column_error_not_swallowed(spark):
    with pytest.raises(Exception, match="(?i)unresolved|resolve"):
        sql(spark, "select count(no_such_col) as c, "
                   "ttest_2samp('avg(y)', treatment) from ab")


def test_backtick_identifier_with_trailing_backslash():
    q = "SELECT `a\\` , 分子 FROM t"
    out = _quote_nonascii_identifiers(q)
    assert "`分子`" in out                      # scanner did not desync
    # string literals keep escapes and stay untouched
    q2 = "SELECT x FROM t WHERE s = 'don\\'t 分'"
    assert _quote_nonascii_identifiers(q2) == q2


def test_ttest_macro_bare_cuped_without_alternative(spark):
    """ttest_2samp(metric, idx, avg(x_pre)) — a bare covariate with the
    alternative omitted binds as CUPED, not as the alternative."""
    out = sql(spark, "SELECT ttest_2samp('avg(numerator)/"
                     "avg(denominator)', treatment, "
                     "'avg(numerator_pre)/avg(denominator_pre)') "
                     "FROM ab").toPandas()
    plain = sql(spark, "SELECT ttest_2samp('avg(numerator)/"
                       "avg(denominator)', treatment) FROM ab") \
        .toPandas()
    assert out["stderr"].iloc[0] < plain["stderr"].iloc[0]  # CUPED


def test_edgeworth_two_sided_skips_extra_pass(spark, ab_df):
    """two-sided edgeworth returns the plain p WITHOUT the third-moment
    aggregation (provable first-order cancellation)."""
    from unittest import mock

    from fast_causal_inference_spark.operators import ttest as tmod

    with mock.patch.object(tmod, "_edgeworth_gamma",
                           side_effect=AssertionError(
                               "gamma pass must be skipped")) as mk:
        out = tmod.ttest_2samp(ab_df, "avg(y)", "treatment",
                               alternative="two-sided",
                               edgeworth=True).toPandas()
    assert mk.call_count == 0
    plain = tmod.ttest_2samp(ab_df, "avg(y)", "treatment").toPandas()
    assert out["p_value"].iloc[0] == pytest.approx(
        plain["p_value"].iloc[0])
