"""Structured Streaming experiment analytics.

The reference is batch-only (SURVEY.md §2.3: "no streaming of any kind");
this module is the Spark-native value-add: the SAME sufficient-statistics
kernel runs over event-time windows, so a live experiment readout
(estimate / SE / t / p per window per arm) is a standard
``withWatermark().groupBy(window(...)).agg(...)`` — incremental, late-data
tolerant, and restart-safe via checkpointing. All statistics are rendered as
closed-form Column expressions over the aggregated state (the columnar path —
no Python in the continuous query), with normal-approximation p-values via an
erf Arrow UDF in the output projection.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.formula import parse_formulas
from fast_causal_inference_spark.operators.suffstats import (
    StatView,
    suffstat_agg_columns,
)


def _with_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks demand TIMESTAMP (with local timezone); parquet written
    with ``timestamp_ntz`` types fails ``withWatermark`` with
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.  Cast NTZ event-time columns in
    place (wall-clock instants are preserved — session-timezone semantics
    only matter for window boundary formatting)."""
    from pyspark.sql import types as T

    for f in stream.schema.fields:
        if f.name == ts_col and isinstance(f.dataType, T.TimestampNTZType):
            return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def _norm_sf_col(z: Column) -> Column:
    """P(Z > z) as a Column (Arrow UDF over math.erfc — projection only)."""
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    @F.pandas_udf("double")
    def _sf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: 0.5 * math.erfc(v / math.sqrt(2.0))
                     if v == v else float("nan"))

    ensure_udf_serializable()
    return _sf(z)


def streaming_metric(stream: DataFrame, Y: str, ts_col: str,
                     window_duration: str = "1 minute",
                     slide: str | None = None,
                     watermark: str = "2 minutes") -> DataFrame:
    """Windowed metric estimate + delta-method SE of a formula of means.

    Returns a streaming DataFrame (window, n, estimate, stderr) suitable for
    ``writeStream`` in update/append mode.
    """
    nodes, base = parse_formulas([Y])
    node = nodes[0]
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    agged = (_with_event_time(stream, ts_col)
             .withWatermark(ts_col, watermark)
             .groupBy(win.alias("window"))
             .agg(*suffstat_agg_columns(base)))
    view = StatView(len(base))
    return agged.select(
        "window", view.n.alias("n"),
        view.value(node).alias("estimate"),
        F.sqrt(view.var_of_formula_mean(node)).alias("stderr"))


def streaming_ttest_2samp(stream: DataFrame, Y: str, index: str, ts_col: str,
                          window_duration: str = "1 minute",
                          slide: str | None = None,
                          watermark: str = "2 minutes",
                          treatment_values: tuple = (0, 1),
                          with_p_value: bool = True) -> DataFrame:
    """Continuously-updating two-sample t-test per event-time window.

    One stateful windowed aggregation; estimate/stderr/t are closed-form
    columns over the window state.
    """
    nodes, base = parse_formulas([Y])
    node = nodes[0]
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    aggs = (suffstat_agg_columns(base, "g0_", idx == F.lit(v0))
            + suffstat_agg_columns(base, "g1_", idx == F.lit(v1)))
    agged = (_with_event_time(stream, ts_col)
             .withWatermark(ts_col, watermark)
             .groupBy(win.alias("window")).agg(*aggs))
    v0v = StatView(len(base), "g0_")
    v1v = StatView(len(base), "g1_")
    est = v1v.value(node) - v0v.value(node)
    se = F.sqrt(v0v.var_of_formula_mean(node) + v1v.var_of_formula_mean(node))
    t = est / F.nullif(se, F.lit(0.0))
    out = agged.select("window",
                       v0v.n.alias("n0"), v1v.n.alias("n1"),
                       v0v.value(node).alias("mean0"),
                       v1v.value(node).alias("mean1"),
                       est.alias("estimate"), se.alias("stderr"),
                       t.alias("t_stat"))
    if with_p_value:
        out = out.withColumn("p_value", 2.0 * _norm_sf_col(F.abs(F.col("t_stat"))))
    return out


def streaming_srm(stream: DataFrame, index: str, ts_col: str,
                  window_duration: str = "1 minute",
                  watermark: str = "2 minutes",
                  ratio: tuple = (1.0, 1.0),
                  treatment_values: tuple = (0, 1)) -> DataFrame:
    """Continuous sample-ratio-mismatch chi-square (2 arms) per window."""
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    r0, r1 = float(ratio[0]), float(ratio[1])
    if r0 < 0 or r1 < 0 or r0 + r1 <= 0:
        raise ValueError(
            f"ratio must be two non-negative weights with a positive "
            f"sum, got {ratio!r}")
    win = F.window(F.col(ts_col), window_duration)
    agged = (_with_event_time(stream, ts_col)
             .withWatermark(ts_col, watermark)
             .groupBy(win.alias("window"))
             .agg(F.count(F.when(idx == F.lit(v0), 1)).alias("n0"),
                  F.count(F.when(idx == F.lit(v1), 1)).alias("n1")))
    tot = F.col("n0") + F.col("n1")
    e0 = tot * r0 / (r0 + r1)
    e1 = tot * r1 / (r0 + r1)

    # per-arm zero-expected semantics (ANSI-safe, never a raw /0, so a
    # poison window can never kill the continuous query or its restart):
    # expected 0 with observed 0 contributes 0; expected 0 with observed
    # > 0 is a CERTAIN mismatch — chi-square +inf, not NULL (the old
    # nullif guard silently masked exactly the most extreme SRM, e.g.
    # ratio=(0,1) with any arm-0 events).  A window with zero events in
    # both arms stays NULL (no data, nothing to test).
    def _term(n: Column, e: Column) -> Column:
        return (F.when(e > 0, (n - e) ** 2 / e)
                .when(n == 0, F.lit(0.0))
                .otherwise(F.lit(float("inf"))))

    chi2 = F.when(tot > 0, _term(F.col("n0"), e0)
                  + _term(F.col("n1"), e1))
    return agged.select("window", "n0", "n1",
                        e0.alias("expected0"), e1.alias("expected1"),
                        chi2.alias("chisquare"))


def run_to_memory(stream_out: DataFrame, query_name: str,
                  output_mode: str = "complete") -> None:
    """Drain an availableNow streaming query into an in-memory table
    (testing/demo helper)."""
    q = (stream_out.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()


# ---------------------------------------------------------------------------
# stateful: always-valid sequential testing (mSPRT)
# ---------------------------------------------------------------------------


def streaming_sequential_ttest(stream: DataFrame, Y: str, index: str,
                               ts_col: str, group_col: str | None = None,
                               tau: float = 1.0,
                               watermark: str = "10 minutes",
                               treatment_values: tuple = (0, 1)) -> DataFrame:
    """Always-valid sequential test over a live experiment stream — the
    mixture SPRT (mSPRT) with a N(0, τ²) mixture over the effect, the
    standard "peeking-safe" monitor for streaming A/B platforms.

    True custom stateful streaming: ``applyInPandasWithState`` keeps the
    cumulative per-arm moments (n, Σy, Σy²) and the running max of the
    mixture likelihood ratio Λ in ``GroupState``; each micro-batch folds its
    rows into the state and emits one row per experiment group:
    (n0, n1, estimate, stderr, z, lambda_, always_valid_p) where
    ``always_valid_p = min(1, 1/max_s Λ_s)`` is valid under continuous
    monitoring (optional stopping).

    Λ for the normal approximation: with δ̂ the mean difference and
    V = SE², Λ = sqrt(V/(V+τ²)) · exp(δ̂²·τ² / (2V(V+τ²))).

    State is O(1) doubles per experiment group — scale-independent.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    gcol = group_col or "__expt"
    base = stream if group_col else stream.withColumn(gcol, F.lit("all"))
    # the event-time column must SURVIVE the projection: dropping it
    # detaches the watermark and late data older than the horizon would
    # silently keep mutating the mSPRT state (streaming_cusum keeps its
    # ts column for the same reason)
    prepared = (_with_event_time(base, ts_col)
                .withWatermark(ts_col, watermark)
                .select(F.col(gcol).cast("string").alias("g"),
                        F.col(ts_col).alias("__ts"),
                        F.expr(Y).cast("double").alias("y"),
                        F.when(idx == F.lit(v0), 0)
                         .when(idx == F.lit(v1), 1).alias("arm"))
                # NaN is not NULL: one NaN y folded into the CUMULATIVE
                # (n, Σy, Σy²) state would poison every later emission of
                # the group — unlike a windowed agg, this state never
                # expires, so NaN must be dropped like NULL
                .where(F.col("arm").isNotNull() & F.col("y").isNotNull()
                       & ~F.isnan(F.col("y"))))

    out_schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("n0", T.DoubleType()),
        T.StructField("n1", T.DoubleType()),
        T.StructField("estimate", T.DoubleType()),
        T.StructField("stderr", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("lambda_", T.DoubleType()),
        T.StructField("always_valid_p", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n0", T.DoubleType()),
        T.StructField("s0", T.DoubleType()),
        T.StructField("ss0", T.DoubleType()),
        T.StructField("n1", T.DoubleType()),
        T.StructField("s1", T.DoubleType()),
        T.StructField("ss1", T.DoubleType()),
        T.StructField("max_lambda", T.DoubleType()),
    ])
    tau2 = float(tau) * float(tau)

    def update(key, pdfs, state: GroupState):
        import math as _math

        if state.exists:
            n0, s0, ss0, n1, s1, ss1, maxl = state.get
        else:
            n0 = s0 = ss0 = n1 = s1 = ss1 = 0.0
            maxl = 1.0
        for pdf in pdfs:
            a = pdf["arm"].to_numpy()
            y = pdf["y"].to_numpy(dtype=float)
            m1 = a == 1
            n1 += float(m1.sum()); s1 += float(y[m1].sum())
            ss1 += float((y[m1] ** 2).sum())
            m0 = a == 0
            n0 += float(m0.sum()); s0 += float(y[m0].sum())
            ss0 += float((y[m0] ** 2).sum())
        if n0 > 1 and n1 > 1:
            mu0, mu1 = s0 / n0, s1 / n1
            var0 = (ss0 - s0 * s0 / n0) / (n0 - 1)
            var1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
            V = var0 / n0 + var1 / n1
            est = mu1 - mu0
            if V > 0:
                lam = _math.sqrt(V / (V + tau2)) * _math.exp(
                    est * est * tau2 / (2.0 * V * (V + tau2)))
                maxl = max(maxl, lam)
                z = est / _math.sqrt(V)
            else:
                lam, z = float("nan"), float("nan")
            row = (key[0], n0, n1, est,
                   _math.sqrt(V) if V > 0 else float("nan"), z, lam,
                   min(1.0, 1.0 / maxl))
        else:
            row = (key[0], n0, n1, float("nan"), float("nan"),
                   float("nan"), float("nan"), 1.0)
        state.update((n0, s0, ss0, n1, s1, ss1, maxl))
        import pandas as _pd

        yield _pd.DataFrame([row], columns=[f.name for f in out_schema])

    ensure_udf_serializable()
    return prepared.groupBy("g").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap: str = "30 minutes",
               value_col: str | None = None) -> DataFrame:
    """Gap-based sessionization — the classic stateful event-pipeline
    operator, expressed with Spark's NATIVE ``session_window`` so Catalyst
    owns the state machine (works identically on static frames and on
    streams; for a stream, call :func:`streaming_sessionize` which adds
    the watermark so expired session state is dropped).

    Returns one row per (user, session): ``session_start``/``session_end``
    (event-time bounds + gap per Spark's session-window semantics),
    ``n_events``, ``duration_sec``, and ``value_sum`` when ``value_col``
    is given.  Scale: one shuffle on (user, session window) with
    merge-able partial state — no per-user driver work, no Python.
    """
    aggs = [F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("double")).alias("value_sum"))
    out = (df.groupBy(F.col(user_col),
                      F.session_window(F.col(ts_col), gap).alias("sw"))
           .agg(*aggs)
           .select(F.col(user_col),
                   F.col("sw.start").alias("session_start"),
                   F.col("sw.end").alias("session_end"),
                   "n_events",
                   (F.expr("timestampdiff(MICROSECOND, first_event, "
                           "last_event)") / 1e6)
                   .alias("duration_sec"),
                   *([F.col("value_sum")] if value_col is not None else [])))
    return out


def streaming_sessionize(stream: DataFrame, user_col: str, ts_col: str,
                         gap: str = "30 minutes",
                         value_col: str | None = None,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming gap sessionization: watermark + native session windows.
    A session row is emitted once the watermark passes its close (append
    mode); state per open session is O(1) and dropped on emission."""
    return sessionize(_with_event_time(stream, ts_col)
             .withWatermark(ts_col, watermark),
                      user_col, ts_col, gap, value_col)


def ingest_documents(df: DataFrame, text_col: str = "text",
                     ts_col: str | None = None,
                     min_quality: float = 0.4,
                     langs: list[str] | None = None,
                     redact_pii: bool = True,
                     dedup: str | None = "exact",
                     watermark: str = "1 hour",
                     nb_model: dict | None = None,
                     min_nb_logodds: float = 0.0) -> DataFrame:
    """Training-data ingestion pipeline — the document-side counterpart of
    the experiment readouts above, one declarative chain that runs
    identically on a static frame and on a stream:

    quality/language annotate+filter → optional trained-NB-classifier
    filter (in-process scorer, stateless) → PII redaction → exact dedup
    on the whitespace-normalized content fingerprint.

    On a stream (``df.isStreaming`` and ``ts_col`` given) the dedup step is
    ``dropDuplicatesWithinWatermark`` on the fingerprint: state holds one
    compact key per distinct document inside the watermark horizon and is
    dropped as event time advances — bounded memory at any corpus rate,
    where a plain ``dropDuplicates`` on an unbounded stream would grow state
    forever.  On a static frame the same chain is a hash aggregation.

    Every annotation is a pure Column expression (codegen; the only Python
    is nothing — redaction is ``regexp_replace``), so the filter runs at
    scan speed before the one dedup shuffle.  Returns the surviving rows
    with ``quality``, ``lang_pred`` and ``fingerprint`` attached.

    The dedup key is the 128-bit md5 content fingerprint, not the 64-bit
    xxhash64 variant: dropping a row on key collision is silent data loss,
    and at 10¹⁰⁺ documents 64-bit birthday collisions are expected while
    128-bit ones are not (same reasoning as batch ``exact_dedup``).
    """
    from fast_causal_inference_spark.datapipe.quality import pii_redact
    from fast_causal_inference_spark.datapipe.text import (
        fingerprint,
        language_id,
        quality_score,
    )

    c = F.col(text_col)
    out = (df.withColumn("quality", quality_score(c))
             .withColumn("lang_pred", language_id(c))
             .where(F.col("quality") >= min_quality))
    if nb_model is not None:
        # trained NB classifier as a STATELESS in-process filter stage —
        # the UDF form keeps the chain free of extra stateful operators
        # ahead of the watermarked dedup
        from fast_causal_inference_spark.datapipe.quality import (
            quality_classifier_udf,
        )

        scorer = quality_classifier_udf(nb_model)
        out = (out.withColumn("nb_logodds", scorer(c))
               .where(F.col("nb_logodds") > min_nb_logodds))
    if langs is not None:
        out = out.where(F.col("lang_pred").isin(list(langs)))
    # fingerprint BEFORE redaction: identity of the original content
    out = out.withColumn("fingerprint", fingerprint(c, method="md5"))
    if redact_pii:
        out = out.withColumn(text_col, pii_redact(c))
    if dedup is None:
        return out
    if dedup != "exact":
        raise ValueError(
            f"dedup must be 'exact' or None for ingestion, got {dedup!r}; "
            f"run the batch MinHash/SimHash family on the landed corpus for "
            f"near-dup passes")
    if out.isStreaming:
        if ts_col is None:
            raise ValueError(
                "streaming ingestion with dedup needs ts_col: without a "
                "watermark, dropDuplicates state grows one key per distinct "
                "document forever; pass ts_col (event-time column) or "
                "dedup=None")
        return (_with_event_time(out, ts_col)
                .withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["fingerprint"]))
    # static path: DETERMINISTIC keeper per fingerprint (bare
    # dropDuplicates keeps whichever row a task saw first, so two runs
    # over the same corpus could land different doc ids — same reasoning
    # as batch exact_dedup's min-id row_number)
    order_cols = (["doc_id"] if "doc_id" in out.columns else
                  [f.name for f in out.schema.fields
                   if f.name != "fingerprint"
                   and f.dataType.typeName() in
                   ("string", "integer", "long", "short", "byte",
                    "float", "double", "decimal", "boolean",
                    "timestamp", "date")])
    if not order_cols:
        return out.dropDuplicates(["fingerprint"])
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint") \
        .orderBy(*[F.col(c).asc_nulls_first() for c in order_cols])
    return (out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def streaming_perplexity(stream: DataFrame, lm: dict,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         ts_col: str = "ts", k: float = 1.0,
                         watermark: str = "1 hour",
                         broadcast_lm: bool | None = True) -> DataFrame:
    """Per-document bigram perplexity of STREAMING documents under a
    batch-trained LM (``datapipe.lm.train_bigram_lm``) — CCNet quality
    scoring at ingestion time instead of as a later batch pass.

    Plan shape: explode the document's bigrams, STREAM-STATIC join the
    (static, cluster-resident, typically broadcast) count relations, and
    aggregate per (document, event time) under a watermark. Stream-static
    joins are stateless; the only state is the per-document aggregation
    inside the watermark horizon, dropped as event time advances.
    Emission is append-mode: a document's row finalizes when the
    watermark passes its event time (a document's bigrams all carry its
    own timestamp, so the group completes immediately).

    Works identically on a static frame (the watermark is a no-op) —
    tested by the stream-vs-batch agreement suite.  ``broadcast_lm``
    defaults True (the bounded-trusted-vocabulary case); pass
    False/None for a web-scale LM whose count relations exceed the
    broadcast limit — the join then degrades to a (stream-static) hash
    join.
    """
    from fast_causal_inference_spark.datapipe.lm import (
        scored_bigram_logprobs,
    )

    src = stream
    if src.isStreaming:
        src = _with_event_time(src, ts_col).withWatermark(
            ts_col, watermark)
    return scored_bigram_logprobs(src, lm, text_col, [id_col, ts_col],
                                  k, broadcast_lm)


def streaming_quality_score(stream: DataFrame, model: dict,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            ts_col: str = "ts",
                            watermark: str = "1 hour") -> DataFrame:
    """Naive-Bayes quality log-odds of STREAMING documents under a
    batch-trained classifier (``datapipe.quality.train_quality_classifier``)
    — trainable quality filtering at ingestion time.

    Same shape as :func:`streaming_perplexity`: a stateless stream-static
    broadcast join of the token-count relation, then a per-(doc, event
    time) aggregation under the watermark; the shared scoring core pins
    the streaming semantics to the batch scorer.  Emits
    (id, ts, quality_logodds); token-free documents produce no row (they
    would score the bare prior)."""
    from fast_causal_inference_spark.datapipe.quality import (
        nb_logodds_rel,
        nb_prior,
    )

    src = stream
    if src.isStreaming:
        src = _with_event_time(src, ts_col).withWatermark(ts_col, watermark)
    rel = nb_logodds_rel(src, model, text_col, [id_col, ts_col])
    return rel.withColumn(
        "quality_logodds", F.col("__s") + F.lit(nb_prior(model))) \
        .drop("__s")


def streaming_cusum(stream: DataFrame, value: str, ts_col: str,
                    target: float, sd: float,
                    group_col: str | None = None,
                    k: float = 0.5, h: float = 5.0,
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming tabular CUSUM — the live twin of
    ``operators/changepoint.cusum_detect`` for Phase-II monitoring
    (``target``/``sd`` are the pinned in-control parameters; estimating
    them from the monitored stream itself would defeat the chart).

    ``applyInPandasWithState`` keeps (C⁺, C⁻, n, n_alarms, first_alarm_n)
    per series — O(1) doubles.  Within a micro-batch rows fold in
    event-time order via the same prefix-sum closed form as the batch
    operator (T = C₀ + cumsum(z−k); C = T − min(0, running-min T)), so
    the fold is vectorized numpy, not a Python loop.  Emits one row per
    series per micro-batch.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    if sd <= 0:
        raise ValueError("sd must be positive")
    if h <= 0 or k < 0:
        raise ValueError("need h > 0 and k >= 0")
    gcol = group_col or "__series"
    base = stream if group_col else stream.withColumn(gcol, F.lit("all"))
    prepared = (_with_event_time(base, ts_col)
                .withWatermark(ts_col, watermark)
                .select(F.col(gcol).cast("string").alias("g"),
                        F.col(ts_col).alias("ts"),
                        ((F.expr(value).cast("double")
                          - F.lit(float(target))) / F.lit(float(sd)))
                        .alias("z"))
                # NaN z would ride the cumsum fold into C⁺/C⁻ and stick
                # there for the life of the series (cumulative state, not
                # a window) — drop it like NULL
                .where(F.col("z").isNotNull() & ~F.isnan(F.col("z"))))

    out_schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("n", T.DoubleType()),
        T.StructField("cusum_pos", T.DoubleType()),
        T.StructField("cusum_neg", T.DoubleType()),
        T.StructField("n_alarms", T.DoubleType()),
        T.StructField("first_alarm_n", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("cp", T.DoubleType()),
        T.StructField("cn", T.DoubleType()),
        T.StructField("n", T.DoubleType()),
        T.StructField("n_alarms", T.DoubleType()),
        T.StructField("first_alarm_n", T.DoubleType()),
    ])
    kf, hf = float(k), float(h)

    def update(key, pdfs, state: GroupState):
        import numpy as _np
        import pandas as _pd

        if state.exists:
            cp, cn, n, n_al, first = state.get
        else:
            cp = cn = n = n_al = 0.0
            first = float("nan")

        def fold(c0, d):
            t = c0 + _np.cumsum(d)
            return t - _np.minimum(0.0, _np.minimum.accumulate(t))

        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            z = pdf["z"].to_numpy(dtype=float)
            if len(z) == 0:
                continue
            pos = fold(cp, z - kf)
            neg = fold(cn, -z - kf)
            al = (pos > hf) | (neg > hf)
            if al.any() and _np.isnan(first):
                first = n + float(al.argmax()) + 1.0
            n_al += float(al.sum())
            n += float(len(z))
            cp, cn = float(pos[-1]), float(neg[-1])
        state.update((cp, cn, n, n_al, first))
        yield _pd.DataFrame(
            [(key[0], n, cp, cn, n_al, first)],
            columns=[f.name for f in out_schema])

    ensure_udf_serializable()
    return prepared.groupBy("g").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)


def streaming_ewma(stream: DataFrame, value: str, ts_col: str,
                   target: float, sd: float,
                   group_col: str | None = None,
                   lam: float = 0.2, L: float = 3.0,
                   watermark: str = "10 minutes") -> DataFrame:
    """Streaming EWMA control chart — the live twin of
    ``operators/changepoint.ewma_detect`` (round 10; pairs with
    :func:`streaming_cusum` so both Phase-II charts have streaming
    forms).  ``target``/``sd`` are the pinned in-control parameters.

    ``applyInPandasWithState`` keeps (E, t, n_alarms, first_alarm_n)
    per series — O(1) doubles.  Within a micro-batch the recursion
    E_i = λz_i + (1−λ)E_{i−1} folds in event-time order via the
    closed form E_i = a^i·(E₀ + λ·Σ_{j≤i} z_j·a^{−j}) (a = 1−λ),
    chunked so a^{−j} never overflows — vectorized numpy, not a
    Python row loop.  The UCL uses the exact variance ramp
    L·√(λ/(2−λ)·(1−a^{2t})) with the GLOBAL index t carried in state,
    so emissions are bit-identical to the batch chart on the same
    ordered data (the property suite pins this).
    """
    import math

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    if sd <= 0:
        raise ValueError("sd must be positive")
    if not 0 < lam <= 1:
        raise ValueError("lam must lie in (0, 1]")
    if L <= 0:
        raise ValueError("L must be positive")
    gcol = group_col or "__series"
    base = stream if group_col else stream.withColumn(gcol, F.lit("all"))
    prepared = (_with_event_time(base, ts_col)
                .withWatermark(ts_col, watermark)
                .select(F.col(gcol).cast("string").alias("g"),
                        F.col(ts_col).alias("ts"),
                        ((F.expr(value).cast("double")
                          - F.lit(float(target))) / F.lit(float(sd)))
                        .alias("z"))
                # cumulative state: NaN must be dropped like NULL
                .where(F.col("z").isNotNull() & ~F.isnan(F.col("z"))))

    out_schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("n", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("ucl", T.DoubleType()),
        T.StructField("n_alarms", T.DoubleType()),
        T.StructField("first_alarm_n", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("e", T.DoubleType()),
        T.StructField("n", T.DoubleType()),
        T.StructField("n_alarms", T.DoubleType()),
        T.StructField("first_alarm_n", T.DoubleType()),
    ])
    lam_f, L_f = float(lam), float(L)
    a = 1.0 - lam_f
    # largest chunk with a^-chunk still far below float64 overflow
    chunk = 4096 if a <= 0 else \
        max(1, min(4096, int(300.0 / max(1e-12, -math.log10(a)))))

    def update(key, pdfs, state: GroupState):
        import numpy as _np
        import pandas as _pd

        if state.exists:
            e, n, n_al, first = state.get
        else:
            e, n, n_al, first = 0.0, 0.0, 0.0, float("nan")
        vf = lam_f / (2.0 - lam_f)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            z = pdf["z"].to_numpy(dtype=float)
            for c0 in range(0, len(z), chunk):
                zc = z[c0:c0 + chunk]
                m = len(zc)
                if a == 0.0:                 # lam == 1: E_i = z_i
                    ev = zc.copy()
                else:
                    i1 = _np.arange(1, m + 1, dtype=float)
                    ev = a ** i1 * (e + lam_f
                                    * _np.cumsum(zc * a ** (-i1)))
                t_glob = n + _np.arange(1, m + 1, dtype=float)
                ucl = L_f * _np.sqrt(vf * (1.0 - a ** (2.0 * t_glob)))
                al = _np.abs(ev) > ucl
                if al.any() and _np.isnan(first):
                    first = n + float(al.argmax()) + 1.0
                n_al += float(al.sum())
                n += float(m)
                e = float(ev[-1])
        state.update((e, n, n_al, first))
        t = n if n > 0 else 1.0
        yield _pd.DataFrame(
            [(key[0], n, e,
              L_f * math.sqrt(vf * (1.0 - a ** (2.0 * t))),
              n_al, first)],
            columns=[f.name for f in out_schema])

    ensure_udf_serializable()
    return prepared.groupBy("g").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
