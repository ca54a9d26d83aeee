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
    r"(?:\s+GROUP\s+BY\s+(?P<groupby>.*?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
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


def _gateway_inner(s: str, rewrite_ttest: bool = True) -> str:
    """Normalize a ClickHouse-gateway inner-expression string to the
    Spark macro surface (SqlForwardTest.java parity):

    * ``@str@`` -> ``'str'`` — the reference Python client transmits
      embedded single quotes as ``@`` (statistics.py:948,
      ``func.replace("'", "@")``) and the Calcite gateway restores
      them; we invert the same way.
    * ClickHouse parameterized aggregates ``fn(p1, ...)(args)`` ->
      ``fn(args, p1, ...)`` (e.g. ``quantile(0.5)(x1)`` ->
      ``quantile(x1, 0.5)``, the Spark-side calling convention).
    * ``ttest_2samp(avg(m), t_expr[, 'alt'])`` inside bootStrap ->
      the between-arm mean-difference formula
      ``avg(CASE WHEN ... ) - avg(CASE WHEN ...)`` — the Spark-first
      rendition of bootstrapping the two-sample statistic (replica
      values are arm differences; the alternative only affects the
      downstream p-value direction).
    """
    s = s.replace("@", "'")
    m = re.match(r"(?s)^\s*(\w+)\(([^()]*)\)\((.*)\)\s*$", s)
    if m and m.group(2).strip():
        s = f"{m.group(1)}({m.group(3)}, {m.group(2)})"
    mt = (re.match(r"(?is)^\s*ttest_2samp\s*\(\s*avg\s*\((.+?)\)\s*,"
                   r"\s*(.+?)\s*,\s*'(\w[\w-]*)'\s*\)\s*$", s)
          or re.match(r"(?is)^\s*ttest_2samp\s*\(\s*avg\s*\((.+?)\)"
                      r"\s*,\s*(.+?)\s*\)\s*$", s))
    # the gateway's synthesized-label sentinel is exactly-uppercase
    # TREATMENT (SqlForwardTest testPermutation); a real column that
    # happens to be named "treatment" stays a column reference
    if rewrite_ttest and mt and mt.group(2).strip() != "TREATMENT":
        x, t = mt.group(1), mt.group(2)
        # ratio-of-avgs arm means (avg(x·t)/avg(t)): the suff-stat
        # engine drops rows where ANY base is NULL, so CASE-WHEN arm
        # splits would null out every row
        ti = f"(CASE WHEN ({t}) = 1 THEN 1.0 ELSE 0.0 END)"
        return (f"avg(({x}) * {ti}) / avg({ti}) - "
                f"avg(({x}) * (1 - {ti})) / avg(1 - {ti})")
    return s


def _kwargs(args: list[str]) -> tuple[list, dict]:
    pos, kw = [], {}
    for a in args:
        m = re.match(r"^([A-Za-z_][A-Za-z_0-9]*)\s*=\s*(?![=])(.*)$", a)
        if m:
            kw[m.group(1)] = _lit(m.group(2))
        else:
            pos.append(_lit(a))
    return pos, kw


def _strip_line_comments(q: str) -> str:
    """Drop ``-- …`` line comments outside string literals (the reference
    gateway accepts commented scorecard SQL — SqlForwardTest.java:47-58)."""
    out, quote, i = [], None, 0
    while i < len(q):
        ch = q[i]
        if quote:
            out.append(ch)
            if ch == "\\" and i + 1 < len(q):
                # backslash-escaped char inside a literal (Spark accepts
                # 'don\'t'): never treat the escaped quote as the closer
                out.append(q[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            out.append(ch)
            i += 1
            continue
        if ch == "-" and q[i:i + 2] == "--":
            j = q.find("\n", i)
            i = len(q) if j < 0 else j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _quote_nonascii_identifiers(q: str) -> str:
    """Backtick-quote bare non-ASCII identifiers (sqlWithChineseTest:
    the reference gateway's Calcite/ClickHouse dialects accept
    ``select 分子 from tbl`` unquoted; Spark raises INVALID_IDENTIFIER
    unless back-quoted).  String literals and already-quoted
    identifiers pass through untouched — the Spark-dialect analogue of
    ``SqlForward.java``'s system-keyword mangling."""
    out, i, n, quote = [], 0, len(q), None
    while i < n:
        ch = q[i]
        if quote:
            out.append(ch)
            if ch == "\\" and i + 1 < n and quote in "'\"":
                # backslash-escaped char inside a STRING literal
                # ('don\'t') must not close it; backtick identifiers
                # escape by doubling, not backslash, so a trailing
                # backslash in `a\` must not desync the scanner
                out.append(q[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"`":
            quote = ch
            out.append(ch)
            i += 1
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (q[j].isalnum() or q[j] == "_"):
                j += 1
            tok = q[i:j]
            if any(ord(c) > 127 for c in tok):
                out.append(f"`{tok}`")
            else:
                out.append(tok)
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


_TOP_WORDS = ("WITH", "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING",
              "ORDER", "LIMIT", "UNION", "JOIN")


def _top_keywords(s: str) -> list[tuple[int, str]]:
    """(position, WORD) for every top-level (depth-0, unquoted) keyword."""
    res, depth, quote, i, n = [], 0, None, 0, len(s)
    while i < n:
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            j = i
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            w = s[i:j].upper()
            if w in _TOP_WORDS and (i == 0 or not (s[i - 1].isalnum()
                                                   or s[i - 1] == "_")):
                res.append((i, w))
            i = j
            continue
        i += 1
    return res


def _parse_general(q: str) -> dict | None:
    """Parse ``[WITH …] SELECT items FROM target [WHERE …] [GROUP BY …]``
    with a depth-aware scan (the FROM target may be a parenthesized
    subquery; CTE bodies sit at depth > 0 so their clauses don't
    interfere).  Returns None for shapes outside that grammar."""
    s = q.strip().rstrip(";").strip()
    kws = _top_keywords(s)
    words = [w for _, w in kws]
    if words.count("SELECT") != 1 or words.count("FROM") != 1:
        return None
    # trailing top-level LIMIT n (SqlForwardTest testPredict:
    # "... FROM test_data_small LIMIT 10")
    limit = None
    if words and words[-1] == "LIMIT":
        lp = kws[-1][0]
        m_l = re.match(r"(?is)^LIMIT\s+(\d+)\s*$", s[lp:])
        if not m_l:
            return None
        limit = int(m_l.group(1))
        s = s[:lp].rstrip()
        kws = kws[:-1]
        words = words[:-1]
    if any(w in ("HAVING", "ORDER", "LIMIT", "UNION", "JOIN")
           for w in words):
        return None
    pos = {w: p for p, w in kws}
    if "WITH" in words and (words[0] != "WITH" or kws[0][0] != 0):
        return None
    sel, frm = pos["SELECT"], pos["FROM"]
    if frm < sel:
        return None
    where = pos.get("WHERE")
    grp = pos.get("GROUP")
    if grp is not None:
        nxt = [w for p, w in kws if p > grp]
        if not nxt or nxt[0] != "BY":
            return None
    end = len(s)
    gb_text = None
    if grp is not None:
        by_pos = [p for p, w in kws if w == "BY" and p > grp][0]
        gb_text = s[by_pos + 2:end].strip()
        end = grp
    wh_text = None
    if where is not None:
        if grp is not None and where > grp:
            return None
        wh_text = s[where + 5:end].strip()
        end = where
    return {
        "ctes": s[4:sel].strip() if "WITH" in words else None,
        "items": s[sel + 6:frm].strip(),
        "from": s[frm + 4:end].strip(),
        "where": wh_text,
        "groupby": gb_text,
        "limit": limit,
    }


def _find_macro_call(item: str) -> tuple[str, str, int, int] | None:
    """First known-macro call in an expression: (fn, args, start, end+1)."""
    depth, quote, i, n = 0, None, 0, len(item)
    while i < n:
        ch = item[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            i += 1
            continue
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            i += 1
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (item[j].isalnum() or item[j] == "_"):
                j += 1
            k = j
            while k < n and item[k].isspace():
                k += 1
            if k < n and item[k] == "(" and item[i:j].lower() in MACROS:
                # balanced-paren extent of the call
                d, quote2, m = 0, None, k
                while m < n:
                    c = item[m]
                    if quote2:
                        if c == quote2:
                            quote2 = None
                    elif c in "'\"":
                        quote2 = c
                    elif c == "(":
                        d += 1
                    elif c == ")":
                        d -= 1
                        if d == 0:
                            return (item[i:j].lower(),
                                    item[k + 1:m], i, m + 1)
                    m += 1
                return None
            i = j
            continue
        i += 1
    return None


def _alias_split(item: str) -> tuple[str, str | None]:
    """Peel a trailing top-level ``AS alias`` off a select item."""
    m = re.search(r"\s+AS\s+([A-Za-z_][\w]*)\s*$", item, re.IGNORECASE)
    if m and _find_macro_call(item[m.start():]) is None:
        return item[:m.start()].strip(), m.group(1)
    return item.strip(), None


def _apply_limit(res, n: int | None):
    """Apply a parsed trailing LIMIT to whatever a macro returned:
    Spark DataFrames limit lazily, pandas reports head, scalar objects
    (e.g. a fitted OlsModel) pass through untouched."""
    if n is None:
        return res
    if isinstance(res, DataFrame):
        return res.limit(n)
    if hasattr(res, "head"):
        return res.head(n)
    return res


def sql(spark: SparkSession, query: str):
    """Run a (possibly macro-bearing) SQL string.

    Returns whatever the macro returns (DataFrame or pandas DataFrame for
    report-style operators); plain SQL returns ``spark.sql(query)``.

    Supported macro shapes (mirroring the reference gateway's
    ``SqlForwardTest.java`` surface):

    * ``SELECT macro(…) FROM tbl [WHERE …] [GROUP BY …]`` — sole item;
    * ``WITH … SELECT macro(…) FROM cte`` and ``… FROM (subquery)`` —
      the non-macro part evaluates through ``spark.sql`` untouched;
    * ``SELECT key1, key2, macro(…) FROM t GROUP BY key1, key2`` —
      leading bare columns that equal the GROUP BY keys become the
      operator's ``group_cols`` (the gateway's grouped-report form);
    * ``SELECT …, deltamethod(…) AS std, deltamethod(…)*expr … GROUP BY
      g`` — the scalar-aggregate macros (deltamethod / avg_metric) may
      appear INSIDE composite select lists: each call is computed once
      per group, broadcast-joined back on the keys, and the rewritten
      query runs through ``spark.sql`` with the call replaced by
      ``first(__m_i)``.
    ``--`` line comments are stripped first, as the gateway does.
    """
    q = _quote_nonascii_identifiers(_strip_line_comments(query))
    m = _MACRO_RE.match(q)
    if m and m.group("fn").lower() in MACROS:
        fn = m.group("fn").lower()
        df = spark.table(m.group("table"))
        if m.group("where"):
            df = df.where(m.group("where"))
        df, group_cols = _materialize_keys(df, m.group("groupby"))
        pos, kw = _kwargs(_split_args(m.group("args")))
        return _apply_limit(
            _dispatch(fn, df, pos, kw, group_cols),
            int(m.group("limit")) if m.group("limit") else None)
    p = _parse_general(q)
    if p is None:
        return spark.sql(q)
    items = [_alias_split(it) for it in _split_args(p["items"])]
    calls = [(_find_macro_call(body), body, alias) for body, alias in items]
    if not any(c for c, _, _ in calls):
        return spark.sql(q)
    base_sql = f"SELECT * FROM {p['from']}"
    if p["ctes"]:
        base_sql = f"WITH {p['ctes']} {base_sql}"

    macro_items = [(c, body, alias) for c, body, alias in calls
                   if c is not None]
    plain_bodies = [body for c, body, _ in calls if c is None]
    # row-level matching macro beside a star (SqlForwardTest
    # testBasicOp: "select *, caliperMatching(if(t=1,1,-1), score,
    # 0.1) AS matchingIndex from t where matchingIndex != 0").  A
    # WHERE that references the macro's OUTPUT column must apply AFTER
    # the signed index is attached (ClickHouse alias-in-WHERE
    # semantics, which the reference's full-table WITH template also
    # produces); any other predicate filters BEFORE matching so it
    # cannot pair kept rows with filtered-out ones
    if (len(macro_items) == 1
            and macro_items[0][0][0] == "calipermatching"
            and macro_items[0][0][2] == 0
            and macro_items[0][0][3] == len(macro_items[0][1])
            and plain_bodies
            and all(b.strip() == "*" for b in plain_bodies)):
        from fast_causal_inference_spark.operators import matching

        (fn, args, _, _), _, alias = macro_items[0]
        pos, kw = _kwargs(_split_args(args))
        mcol = alias or "match_index"
        where_txt = p["where"]
        defer = bool(where_txt) and re.search(
            rf"\b{re.escape(mcol)}\b", where_txt) is not None
        src = spark.sql(base_sql)
        if where_txt and not defer:
            src = src.where(where_txt)
        out = matching.caliper_matching_signed(
            src, f"if(({pos[0]}) = 1, 1, -1)", str(pos[1]),
            caliper=float(pos[2]) if len(pos) > 2 else 0.05,
            k=int(kw.get("k", 1)), match_col=mcol)
        if where_txt and defer:
            out = out.where(where_txt)
        return _apply_limit(out, p["limit"])

    df = spark.sql(base_sql)
    if p["where"]:
        df = df.where(p["where"])
    df, group_cols = _materialize_keys(df, p["groupby"])
    # report form: one whole-item macro, optionally preceded by bare key
    # columns that the GROUP BY lists (the gateway's grouped reports)
    whole = (len(macro_items) == 1
             and macro_items[0][0][2] == 0
             and macro_items[0][0][3] == len(macro_items[0][1]))
    keys_ok = (not plain_bodies
               or (all(b.isidentifier() for b in plain_bodies)
                   and group_cols is not None
                   and set(plain_bodies) <= set(group_cols)))
    if whole and keys_ok:
        fn, args, _, _ = macro_items[0][0]
        pos, kw = _kwargs(_split_args(args))
        if fn == "predict" and macro_items[0][2]:
            # "SELECT predict(...) AS res" names the output column
            # (SqlForwardTest testPredict) — only predict consumes it
            kw.setdefault("alias", macro_items[0][2])
        return _apply_limit(_dispatch(fn, df, pos, kw, group_cols),
                            p["limit"])
    # one report macro beside plain AGGREGATE items, ungrouped
    # (SqlForwardTest mannWhitneyUTestTest: "select count(1) as cnt,
    # mannWhitneyUTest(numerator, t, 'two-sided') from t"): both sides
    # reduce to ONE row, cross-joined back together
    if (len(macro_items) == 1 and group_cols is None
            and macro_items[0][0][2] == 0
            and macro_items[0][0][3] == len(macro_items[0][1])
            and plain_bodies
            and not all(b.isidentifier() for b in plain_bodies)):
        from pyspark.sql import functions as F

        try:
            left = df.agg(*[
                F.expr(b).alias(a or f"_c{i}")
                for i, (c, b, a) in enumerate(calls) if c is None])
        except Exception as exc:
            # only a "this isn't an aggregate" shape falls through; a
            # genuine analysis error (typo'd column) must surface as
            # itself, not as the misleading scalar-composite ValueError
            if "UNRESOLVED" in f"{type(exc).__name__}: {exc}".upper():
                raise
            left = None                      # not aggregates: fall through
        if left is not None:
            fn, args, _, _ = macro_items[0][0]
            pos, kw = _kwargs(_split_args(args))
            res = _dispatch(fn, df, pos, kw, None)
            if not isinstance(res, DataFrame):
                res = spark.createDataFrame(res)
            return _apply_limit(left.crossJoin(F.broadcast(res)),
                                p["limit"])

    # composite form: scalar-aggregate macros inline among other items
    scalar = {"deltamethod", "delta_method", "avg_metric"}
    if not all(c[0] in scalar for c, _, _ in macro_items):
        raise ValueError(
            "only the scalar-aggregate macros (deltamethod / avg_metric) "
            "can appear inside a composite select list; report-style "
            "macros must be the only select item (plus GROUP BY keys)")
    from pyspark.sql import functions as F

    from fast_causal_inference_spark.operators import deltamethod

    seen: dict[str, str] = {}
    joined = df
    rewritten = []
    for (c, body, alias) in calls:
        while c is not None:
            fn, args, start, stop = c
            call_text = body[start:stop]
            if call_text not in seen:
                name = f"__m{len(seen)}"
                seen[call_text] = name
                pos, kw = _kwargs(_split_args(args))
                if fn == "avg_metric":
                    mdf = deltamethod.avg_metric(
                        df, str(pos[0]), group_cols=group_cols, alias=name)
                else:
                    std = bool(kw.pop("std",
                                      pos[1] if len(pos) > 1 else True))
                    mdf = deltamethod.delta_method(
                        df, str(pos[0]), std=std, group_cols=group_cols,
                        alias=name)
                if group_cols:
                    # NULL-SAFE key equality: a plain equi-join's
                    # NULL != NULL would silently drop every NULL-keyed
                    # group that plain spark.sql (and delta_method's own
                    # groupBy) keeps
                    cond = None
                    for k in group_cols:
                        c = joined[k].eqNullSafe(mdf[k])
                        cond = c if cond is None else cond & c
                    joined = joined.join(F.broadcast(mdf), cond)
                    for k in group_cols:
                        joined = joined.drop(mdf[k])
                else:
                    joined = joined.crossJoin(F.broadcast(mdf))
            body = (body[:start] + f"first({seen[call_text]})"
                    + body[stop:])
            c = _find_macro_call(body)
        rewritten.append(body + (f" AS {alias}" if alias else ""))
    import uuid

    # per-call unique name: a query-hash name raced when two sessions'
    # threads ran the same composite query concurrently (A's finally
    # dropped the view B was about to analyze)
    view = f"__macro_base_{uuid.uuid4().hex[:12]}"
    joined.createOrReplaceTempView(view)
    try:
        final = f"SELECT {', '.join(rewritten)} FROM {view}"
        if p["groupby"]:
            # the ORIGINAL key text: a selected expression key must
            # appear verbatim in GROUP BY for Spark's aggregate check
            final += f" GROUP BY {p['groupby']}"
        # spark.sql analyzes eagerly (Dataset.ofRows → assertAnalyzed),
        # so the resolved plan survives the temp-view drop below
        return _apply_limit(spark.sql(final), p["limit"])
    finally:
        spark.catalog.dropTempView(view)


def _materialize_keys(df: DataFrame, groupby: str | None):
    """GROUP BY keys → plain column names (expression keys materialized)."""
    if not groupby:
        return df, None
    from pyspark.sql import functions as F

    group_cols = []
    # paren-aware split: a bare comma split would shred expression
    # keys like substr(city, 1, 3) into invalid fragments
    for i, g in enumerate(s.strip()
                          for s in _split_args(groupby)):
        if g.isidentifier():
            group_cols.append(g)
        else:
            # expression keys are materialized so operators see plain
            # names; never clobber an existing column of the same name
            # (same guard as the facade's groupBy)
            name = f"group_{i}"
            while name in df.columns:
                name = f"_{name}"
            df = df.withColumn(name, F.expr(g))
            group_cols.append(name)
    return df, group_cols


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
        # gateway trailing bare token (Parser.jj <EDGEWORTHTEST>) turns
        # on the Edgeworth-corrected one-sided p; bare expressions after
        # the alternative are CUPED covariates (edgeWorthTestClickHouse:
        # ttest_2samp(avg(y)/avg(1), idx, 'two-sided', avg(rand()),
        # edgeworthtest) -> Ttest_2samp('x1/x2','two-sided','X=x3',true))
        edge = False
        rest = []
        for p in pos[2:]:
            if isinstance(p, str) and p.strip().lower() == "edgeworthtest":
                edge = True
            else:
                rest.append(p)
        # rest[0] is the alternative ONLY when it is a valid one —
        # otherwise it is a bare CUPED covariate with the alternative
        # omitted (ttest_2samp(avg(y)/avg(1), idx, avg(x_pre)))
        if rest and str(rest[0]) in ("two-sided", "less", "greater"):
            alt = str(rest[0])
            cov = rest[1:]
        else:
            alt = kw.pop("alternative", "two-sided")
            cov = rest
        cuped = [str(p) for p in cov if isinstance(p, str)]
        if cuped and x is None:
            x = "+".join(c[2:] if c.startswith("X=") else c
                         for c in cuped)
        return ttest.ttest_2samp(df, pos[0], str(pos[1]), alternative=alt,
                                 X=x, group_cols=group_cols,
                                 pse=kw.pop("pse", None), edgeworth=edge)
    if fn == "ttests_2samp":
        return ttest.ttests_2samp(df, pos[0], str(pos[1]),
                                  alternatives=pos[2] if len(pos) > 2
                                  else "two-sided", group_cols=group_cols)
    if fn == "xexpt_ttest_2samp":
        # gateway positional order after (numerator, denominator, index,
        # uin): cuped formula, alpha, mde, power — SqlForwardTest
        # testNestedQuery's INPUT is xexpt_ttest_2samp(num, den, idx, uin,
        # avg(n_pre)/avg(d_pre), 0.05, 0.005, 0.8); they were silently
        # DROPPED here before.  Shape-aware binding also accepts the
        # reference Python-API order's metric_type at position 5
        # ('avg'/'sum') and an omitted cuped formula (numbers from
        # position 5 on) — the operator itself strips any leading 'X='.
        extras = {}
        rest = list(pos[4:])
        if rest and isinstance(rest[0], str) and rest[0] in ("avg", "sum"):
            extras["metric_type"] = rest.pop(0)
        if rest and isinstance(rest[0], str):
            extras["X"] = rest.pop(0)
        for val, name in zip(rest, ("alpha", "mde", "power")):
            extras[name] = float(val)
        return xexpt.xexpt_ttest_2samp_spark(
            df, str(pos[0]), str(pos[1]), str(pos[2]), str(pos[3]),
            group_cols=group_cols, **extras,
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
        # a trailing boolean is use_bias in BOTH gateway dialects
        # (SqlForwardTest testWls / testWlsStarRocks:
        # wls(y ~ x..., weight[, false])) — peel it before the weight
        use_bias = bool(kw.get("use_bias", True))
        if args and isinstance(args[-1], bool):
            use_bias = args.pop()
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
            return ols.wls(df, formula, weight=str(weight),
                           use_bias=use_bias)
        return ols.ols(df, formula, use_bias=use_bias)
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
        # gateway convention (CaliperMatchingParser, testCaliperMatching
        # :1309): caliperMatching(treatment_expr, score, caliper) — the
        # reference template normalizes ANY treatment expression via
        # if(expr = 1, 1, -1) and emits the signed per-row pair index
        return matching.caliper_matching_signed(
            df, f"if(({pos[0]}) = 1, 1, -1)", str(pos[1]),
            caliper=float(pos[2]) if len(pos) > 2 else 0.05,
            k=int(kw.get("k", 1)))
    if fn == "exactmatching":
        return matching.exact_matching(df, str(pos[0]),
                                       [str(p) for p in pos[1:]])
    if fn in ("boot_strap", "bootstrap"):
        expr = _gateway_inner(str(pos[0]))
        B = int(pos[1]) if len(pos) > 1 else 100
        mq = re.match(r"(?is)^\s*(?:quantile|percentile)\s*\("
                      r"\s*(.+?)\s*,\s*([\d.]+)\s*\)\s*$", expr)
        if mq:
            # gateway parameterized form bootStrap('quantile(0.5)(x)')
            # — routed to the mergeable-centroid SKETCH path by default
            # (round 11): the gateway targets cluster-scale tables, and
            # the sketch's shuffle is independent of row count where
            # the exact percentile path pays a B-fold explode.  Pass
            # method='exact' to override.
            kwq = dict(kw)
            kwq.setdefault("method", "sketch")
            return resample.boot_strap_quantile(
                df, mq.group(1), float(mq.group(2)), n_resamples=B,
                **kwq)
        return resample.boot_strap(df, expr, n_resamples=B,
                                   **{k: v for k, v in kw.items()})
    if fn == "permutation":
        import pandas as _pd

        inner = _gateway_inner(str(pos[0]), rewrite_ttest=False)
        m = (re.match(r"(?is)^\s*ttest_2samp\s*\(\s*(.+?)\s*,\s*(.+?)"
                      r"\s*,\s*'(\w[\w-]*)'\s*\)\s*$", inner)
             or re.match(r"(?is)^\s*ttest_2samp\s*\(\s*(.+?)\s*,"
                         r"\s*(.+?)\s*\)\s*$", inner))
        mx = re.match(r"(?is)^\s*xexpt_ttest_2samp\s*\(\s*(.+)\)\s*$",
                      inner)
        if m or mx:
            # SQL-gateway form (SqlForwardTest testPermutation): the
            # arm labels are synthesized per replica by the operator —
            # the TREATMENT keyword marks the label slot, and trailing
            # numerics are (permutation_num[, mde, mde_type]) with
            # mde_type 0 = additive x + mde·t, 1 = multiplicative
            # x·(1 + mde·t) (AggregateFunctionPermutation.h:270-276).
            if m:
                metric, t_expr = m.group(1), m.group(2)
            else:
                parts = _split_args(mx.group(1))
                metric = f"avg({parts[0]})/avg({parts[1]})"
                t_expr = parts[3] if len(parts) > 3 else "TREATMENT"
            pnum = int(pos[1]) if len(pos) > 1 else 100
            mde = float(pos[2]) if len(pos) > 2 else 0.0
            mde_type = int(pos[3]) if len(pos) > 3 else 1
            from pyspark.sql import functions as F

            if mde:
                # true reference parity (AggregateFunctionPermutation
                # .h:231-276): EVERY replicate draws a FRESH
                # Bernoulli(1/2) treatment column and shifts the data
                # with THAT replicate's labels — additive x + mde·t
                # (type 0) or multiplicative x·(1 + mde·t) (type 1) —
                # so the B replicate differences form the alternative
                # (power) distribution, not a fixed-label null
                out = resample.permutation_alt(
                    df, metric, permutation_num=pnum, mde=mde,
                    mde_type=mde_type)
            else:
                work = df
                if t_expr.strip() == "TREATMENT":
                    # random labels, as the reference UDAF draws them
                    work = df.withColumn(
                        "__perm_t", (F.rand(42) < 0.5).cast("int"))
                    t_expr = "__perm_t"
                out = resample.permutation(work, metric, t_expr,
                                           permutation_num=pnum)
        else:
            out = resample.permutation(df, inner, str(pos[1]),
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
        kw2 = {k.lower(): v for k, v in kw.items()}
        if "n_steps" in kw2:                 # gateway parameter name
            kw2["horizons"] = int(kw2.pop("n_steps"))
        pdf = longterm.long_term_effect(
            df, surro, str(pos[1]), str(pos[2]), **kw2)
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
        from fast_causal_inference_spark.operators.ols import OlsModel

        first = str(pos[0])
        m_in = re.match(r"(?is)^\s*(olsstate|ols)\s*\((.+)\)\s*$", first)
        if m_in:
            # gateway composite forms (SqlForwardTest testPredict:
            # 209-241): predict(olsState(y+x1+x2), x1, x2) and
            # predict(ols(y~x1+x2)[, 'confidence'|'prediction',
            # level], x1, x2) — the reference rewrites to a
            # scalar-subquery OlsState/OlsIntervalState model +
            # evalMLMethod over the SAME FROM relation; here that is
            # train-on-df then score-df (trailing feature names are
            # already fixed by the trained model)
            inner = m_in.group(2)
            if "~" not in inner:
                # olsState(y+x1+x2): first term is the response (the
                # gateway's predict path rewrites '~' to '+')
                terms = [t.strip() for t in inner.split("+")]
                formula = f"{terms[0]} ~ {' + '.join(terms[1:])}"
            else:
                formula = inner
            rest = [str(p) for p in pos[1:]]
            interval = None
            alpha = 0.05
            if rest and rest[0].lower() in ("confidence", "prediction"):
                interval = rest[0].lower()
                if len(rest) > 1:
                    try:
                        alpha = 1.0 - float(rest[1])
                    except ValueError:
                        pass
            model = ols.ols(df, formula, use_bias=True)
            return model.predict(
                df, alias=str(kw.get("alias", "prediction")),
                interval=interval, alpha=alpha)
        # predict('<model-json>') -> FROM-table + prediction column
        model = OlsModel.from_json(first)
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
