"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship grouped CUPED t-test on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL oracle where the semantics
are SQL-expressible (p-values/CIs are not — DuckDB lacks erf — so oracle-gated
projections expose the arithmetic columns: estimates, stderr, t-statistics).

Float policy: operator outputs are double-sum based, so Spark and DuckDB can
differ in the last bits; every oracle-compared column is rounded to 6 decimals
on BOTH sides. Purely relational queries (q1) instead cast per-row doubles to
DECIMAL before summing — bitwise-deterministic on both engines.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Lazy-DataFrame memo: one (session, dir, table) → DataFrame plan.  Every
# family gate re-called ``spark.read.parquet`` for its base tables, and each
# call pays a driver file-listing plus a 1-task schema-inference job
# (~50-150 ms) — ~100 such jobs per suite run, pure fixed cost (guide §6:
# listing/planning overhead; §1.2: don't repeat work you can share).  The
# memo shares the LAZY plan only — no data is persisted, every action still
# recomputes from parquet, and the plan is identical to a fresh read, so
# per-query results and their oracle hashes are unchanged.  Keyed by the
# session's id so a stopped/restarted session never resurrects a stale plan.
_LOAD_MEMO: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from fast_causal_inference_spark.sources.tables import load_table

    # the memo pins the session object, so id() cannot be recycled while
    # the entry lives; a genuinely new session simply misses
    key = (id(spark), sf_dir, name)
    hit = _LOAD_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = load_table(spark, sf_dir, name)
    _LOAD_MEMO[key] = (spark, df)
    return df


def _round_all(df: DataFrame, keep: list[str], cols: list[str], nd: int = 6) -> DataFrame:
    return df.select(*keep, *[F.round(F.col(c), nd).alias(c) for c in cols])


def _symlink_parquet(src: str, dst_dir: str) -> None:
    """Symlink a parquet table into a file-stream source directory.

    The testdata tables are single FILES; Spark-written replicas (the
    sf1 bench data) are DIRECTORIES of part files — and the streaming
    file source does not list through a directory symlink, so link the
    actual part files individually in that case."""
    if os.path.isdir(src):
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(src, f), os.path.join(dst_dir, f))
    else:
        os.symlink(src, os.path.join(dst_dir, os.path.basename(src)))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Grouped two-sample CUPED t-test over the events table at sf0.001."""
    from fast_causal_inference_spark.operators.ttest import ttest_2samp

    ev = _load(spark, "/root/testdata/sf0.001", "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    return ttest_2samp(ev, "avg(value)", "treatment",
                       X="avg(event_id)", group_cols=["event_type"])


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------



def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (relational baseline; decimal-exact)."""
    li = _load(spark, sf_dir, "lineitem")
    dec = "decimal(27,7)"
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias("sum_base_price"),
                 F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast(dec)).cast("double").alias("sum_disc_price"),
                 F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax"))).cast(dec)).cast("double").alias("sum_charge"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,7))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,7))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,7))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,7))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: revenue per order for a market segment — fact-fact
    join with a broadcast customer dimension filter."""
    li = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    dec = "decimal(27,7)"
    cust = F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")
                        .select("c_custkey"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(cust, o.o_custkey == F.col("c_custkey"))
              .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
              .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                         .cast(dec)).cast("double").alias("revenue"))
              .orderBy(F.desc("revenue"), "o_orderkey")
              .limit(10)
              .select("o_orderkey", "o_orderpriority", "revenue"))


_Q3_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,7)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation within one region — a 5-way join
    where every dimension side is broadcast."""
    li = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    s = _load(spark, sf_dir, "supplier")
    n = _load(spark, sf_dir, "nation")
    r = _load(spark, sf_dir, "region")
    dec = "decimal(27,7)"
    nr = F.broadcast(n.join(r.where(F.col("r_name") == "ASIA"),
                            n.n_regionkey == r.r_regionkey)
                      .select("n_nationkey", "n_name"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(nr, (c.c_nationkey == F.col("n_nationkey"))
                        & (s.s_nationkey == F.col("n_nationkey")))
              .groupBy("n_name")
              .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                         .cast(dec)).cast("double").alias("revenue"))
              .orderBy(F.desc("revenue")))


_Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,7)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC
"""


def q_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRM family: batch observed/expected/chi-square across event_type
    arms PLUS a REAL Structured Streaming windowed two-sample t-test —
    the stream runs file-source micro-batches through
    ``streaming_ttest_2samp`` (event-time day windows, watermark,
    complete-mode memory sink) and every window's statistics are
    re-derived by the DuckDB oracle from the same events table."""
    from fast_causal_inference_spark.operators.srm import srm_spark

    ev = _load(spark, sf_dir, "events")
    out = srm_spark(ev, "value", "event_type")
    srm_rows = _round_all(out, ["groupname"],
                          ["observed", "expected", "chisquare"], 6) \
        .collect()
    rows = [("srm", str(r["groupname"]), stat, float(r[stat]))
            for r in srm_rows
            for stat in ("observed", "expected", "chisquare")]

    # streaming windowed t-test, executed for real
    import os
    import shutil
    import tempfile

    from fast_causal_inference_spark.streaming.ops import (
        streaming_ttest_2samp,
    )

    sch = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    tmp = tempfile.mkdtemp(prefix="srm_stream_")
    try:
        os.mkdir(tmp + "/in")
        _symlink_parquet(f"{sf_dir}/events.parquet", tmp + "/in")
        stream = spark.readStream.schema(sch).parquet(tmp + "/in")
        if dict(stream.dtypes)["ts"] in ("bigint", "long"):
            # TIMESTAMP(NANOS) parquet read as long under nanosAsLong
            stream = stream.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        stream = stream.withColumn("arm",
                                   (F.col("user_id") % 2).cast("int"))
        st = streaming_ttest_2samp(stream, "avg(value)", "arm", "ts",
                                   window_duration="1 day",
                                   watermark="1 day", with_p_value=False)
        # always-valid mSPRT monitor, ALSO executed as a real stream over
        # the same file source (applyInPandasWithState).  availableNow
        # with no maxFilesPerTrigger folds all input into ONE micro-batch,
        # so the emitted cumulative moments — and therefore Λ and the
        # always-valid p — are closed forms of the full-table per-arm
        # (n, Σy, Σy²), which the DuckDB oracle re-derives exactly.  The
        # final row (largest n0+n1) is the boundary row either way.
        from fast_causal_inference_spark.streaming.ops import (
            streaming_sequential_ttest,
        )

        st2 = streaming_sequential_ttest(stream, "value", "arm", "ts",
                                         tau=1.0, watermark="1 day")
        # scope both streams' shuffle partitions down (one state store
        # per partition; a handful of day-windows needs nowhere near
        # 32) — same knob as the corpus ingest gate, values
        # layout-independent.  Round 11: START both queries, then await
        # both — the two independent state machines overlap instead of
        # paying two serial stream walls.
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (st.writeStream.format("memory")
                 .queryName("srm_stream_gate")
                 .outputMode("complete").trigger(availableNow=True)
                 .start())
            q2 = (st2.writeStream.format("memory")
                  .queryName("srm_msprt_gate")
                  .outputMode("append").trigger(availableNow=True)
                  .start())
            if not q.awaitTermination(180):
                q.stop()
                raise TimeoutError(
                    "srm streaming t-test did not finish in 180s — "
                    "failing loudly instead of reading a partial window "
                    "set")
            if not q2.awaitTermination(180):
                q2.stop()
                raise TimeoutError(
                    "srm mSPRT stream did not finish in 180s — failing "
                    "loudly instead of reading a partial state")
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        landed = spark.table("srm_stream_gate").collect()
        # the memory sink registers a temp view holding the sink rows —
        # drop it so repeated bench runs don't stack retained sinks
        spark.catalog.dropTempView("srm_stream_gate")
        if not landed:
            raise RuntimeError(
                "srm streaming gate landed zero windows — the file-stream "
                "source saw no input (check the parquet symlinks)")
        msprt = spark.table("srm_msprt_gate").collect()
        spark.catalog.dropTempView("srm_msprt_gate")
        if not msprt:
            raise RuntimeError("srm mSPRT gate emitted zero rows")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    final = max(msprt, key=lambda r: r["n0"] + r["n1"])
    for stat in ("n0", "n1", "estimate", "stderr", "z", "lambda_",
                 "always_valid_p"):
        rows.append(("msprt", "final", stat, round(float(final[stat]), 6)))
    for r in landed:
        day = r["window"]["start"].strftime("%Y-%m-%d")
        for stat in ("n0", "n1", "mean0", "mean1", "estimate", "stderr",
                     "t_stat"):
            rows.append(("streaming_ttest", day, stat,
                         round(float(r[stat]), 6)))
    return spark.createDataFrame(
        rows, "variant string, item string, stat string, value double")


_SRM_SQL = """
WITH obs AS (
  SELECT event_type AS groupname, sum(value) AS observed
  FROM events GROUP BY event_type
), tot AS (SELECT sum(observed) AS t, count(*) AS k FROM obs),
win AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(count(*) FILTER (user_id % 2 = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (user_id % 2 = 1) AS DOUBLE) AS n1,
         avg(value) FILTER (user_id % 2 = 0) AS mean0,
         avg(value) FILTER (user_id % 2 = 1) AS mean1,
         var_samp(value) FILTER (user_id % 2 = 0) AS v0,
         var_samp(value) FILTER (user_id % 2 = 1) AS v1
  FROM events GROUP BY 1
), ms AS (
  SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (user_id % 2 = 1) AS DOUBLE) AS n1,
         avg(value) FILTER (user_id % 2 = 0) AS m0,
         avg(value) FILTER (user_id % 2 = 1) AS m1,
         var_samp(value) FILTER (user_id % 2 = 0) AS v0,
         var_samp(value) FILTER (user_id % 2 = 1) AS v1
  FROM events WHERE value IS NOT NULL
), msf AS (
  SELECT n0, n1, m1 - m0 AS est, v0/n0 + v1/n1 AS V FROM ms
), msl AS (
  SELECT n0, n1, est, V,
         sqrt(V/(V + 1.0)) * exp(est*est*1.0/(2.0*V*(V + 1.0))) AS lam
  FROM msf
)
SELECT 'srm' AS variant, groupname AS item, 'observed' AS stat,
       round(observed, 6) AS value FROM obs
UNION ALL
SELECT 'srm', groupname, 'expected',
       round((SELECT t FROM tot)/(SELECT k FROM tot), 6) FROM obs
UNION ALL
SELECT 'srm', groupname, 'chisquare',
       round((SELECT sum((o2.observed - (SELECT t FROM tot)/(SELECT k FROM tot))
                    * (o2.observed - (SELECT t FROM tot)/(SELECT k FROM tot))
                    / ((SELECT t FROM tot)/(SELECT k FROM tot))) FROM obs o2), 6)
FROM obs
UNION ALL
SELECT 'streaming_ttest', strftime(day, '%Y-%m-%d'), stat, round(value, 6)
FROM (
  SELECT day, 'n0' AS stat, n0 AS value FROM win
  UNION ALL SELECT day, 'n1', n1 FROM win
  UNION ALL SELECT day, 'mean0', mean0 FROM win
  UNION ALL SELECT day, 'mean1', mean1 FROM win
  UNION ALL SELECT day, 'estimate', mean1 - mean0 FROM win
  UNION ALL SELECT day, 'stderr', sqrt(v0/n0 + v1/n1) FROM win
  UNION ALL SELECT day, 't_stat',
    (mean1 - mean0) / sqrt(v0/n0 + v1/n1) FROM win
)
UNION ALL
SELECT 'msprt', 'final', stat, round(value, 6)
FROM (
  SELECT 'n0' AS stat, n0 AS value FROM msl
  UNION ALL SELECT 'n1', n1 FROM msl
  UNION ALL SELECT 'estimate', est FROM msl
  UNION ALL SELECT 'stderr', sqrt(V) FROM msl
  UNION ALL SELECT 'z', est / sqrt(V) FROM msl
  UNION ALL SELECT 'lambda_', lam FROM msl
  UNION ALL SELECT 'always_valid_p', least(1.0, 1.0/greatest(lam, 1.0))
  FROM msl
)
"""


def q_streaming_charts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM + EWMA control charts, executed as REAL
    ``applyInPandasWithState`` file-source streams (round 11 — the
    verdict's 'gate the streaming charts' ask).

    One availableNow micro-batch folds the whole events table per
    series (event_type), so each chart's single append emission is the
    batch chart's final state on the same ordered data — the equality
    the property suite (tests/test_streaming_properties.py) pins
    against the textbook recursions.  Event time is derived from the
    UNIQUE event_id (timestamp_micros), so the in-batch sort and the
    oracle's ORDER BY agree with no tie ambiguity.  The DuckDB oracle
    re-derives both charts with a recursive CTE running the textbook
    recursions C⁺ = max(0, C⁺+z−k) / E = λz+(1−λ)E over the same
    order — the closed-form prefix-sum folds inside the stream are
    the reflection identity of exactly these recursions.  NaN
    first_alarm_n (series that never alarm) maps to -1 on both sides.
    """
    import math
    import os
    import shutil
    import tempfile

    from fast_causal_inference_spark.streaming.ops import (
        streaming_cusum,
        streaming_ewma,
    )

    sch = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    tmp = tempfile.mkdtemp(prefix="charts_stream_")
    rows = []
    try:
        os.mkdir(tmp + "/in")
        _symlink_parquet(f"{sf_dir}/events.parquet", tmp + "/in")
        stream = spark.readStream.schema(sch).parquet(tmp + "/in")
        # strict per-series event-time from the unique event_id; the
        # %5 thinning bounds the oracle's recursive-CTE depth (~400
        # steps/series at sf0.01) while the stream still folds real
        # hundreds-of-steps state per series
        stream = (stream.where(F.col("event_id") % 5 == 0)
                  .withColumn("ets",
                              F.timestamp_micros(F.col("event_id"))))

        charts = {
            "cusum": streaming_cusum(stream, "value", "ets", 50.0, 50.0,
                                     group_col="event_type", k=0.5,
                                     h=5.0, watermark="1 day"),
            "ewma": streaming_ewma(stream, "value", "ets", 50.0, 50.0,
                                   group_col="event_type", lam=0.2,
                                   L=3.0, watermark="1 day"),
        }
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            # start BOTH chart queries, then await both — the two
            # independent state machines overlap (same pattern as the
            # srm gate's two streams)
            queries = {
                chart: st.writeStream.format("memory")
                .queryName(f"charts_gate_{chart}")
                .outputMode("append").trigger(availableNow=True).start()
                for chart, st in charts.items()}
            for chart, q in queries.items():
                if not q.awaitTermination(180):
                    q.stop()
                    raise TimeoutError(
                        f"streaming {chart} chart did not finish in 180s")
            for chart in charts:
                qname = f"charts_gate_{chart}"
                landed = spark.table(qname).collect()
                spark.catalog.dropTempView(qname)
                if not landed:
                    raise RuntimeError(
                        f"streaming {chart} chart landed zero emissions")
                stats = ("n", "cusum_pos", "cusum_neg") \
                    if chart == "cusum" else ("n", "ewma", "ucl")
                for r in landed:
                    for stat in stats + ("n_alarms", "first_alarm_n"):
                        v = r[stat]
                        # never-alarmed series carry NaN state, which
                        # lands as NULL through the Arrow sink
                        if stat == "first_alarm_n" and (
                                v is None or math.isnan(v)):
                            v = -1.0
                        rows.append((chart, str(r["g"]), stat,
                                     round(float(v), 6)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "chart string, g string, feature string, value double")


_STREAMING_CHARTS_SQL = """
WITH RECURSIVE src AS MATERIALIZED (
  SELECT event_type AS g,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY event_id) AS rn,
         (value - 50.0)/50.0 AS z
  FROM events WHERE value IS NOT NULL AND event_id % 5 = 0
), nmax AS (SELECT g, max(rn) AS n FROM src GROUP BY g),
rec AS (
  SELECT g, 0 AS rn,
         CAST(0 AS DOUBLE) AS cp, CAST(0 AS DOUBLE) AS cn,
         CAST(0 AS DOUBLE) AS ca, CAST(NULL AS DOUBLE) AS cf,
         CAST(0 AS DOUBLE) AS e, CAST(0 AS DOUBLE) AS ea,
         CAST(NULL AS DOUBLE) AS ef
  FROM nmax
  UNION ALL
  SELECT s.g, s.rn,
         greatest(0.0, r.cp + s.z - 0.5),
         greatest(0.0, r.cn - s.z - 0.5),
         r.ca + CASE WHEN greatest(0.0, r.cp + s.z - 0.5) > 5.0
                       OR greatest(0.0, r.cn - s.z - 0.5) > 5.0
                     THEN 1.0 ELSE 0.0 END,
         COALESCE(r.cf, CASE WHEN greatest(0.0, r.cp + s.z - 0.5) > 5.0
                               OR greatest(0.0, r.cn - s.z - 0.5) > 5.0
                             THEN CAST(s.rn AS DOUBLE) END),
         0.2*s.z + 0.8*r.e,
         r.ea + CASE WHEN abs(0.2*s.z + 0.8*r.e) >
                          3.0*sqrt(0.2/1.8*(1.0 - power(0.8, 2.0*s.rn)))
                     THEN 1.0 ELSE 0.0 END,
         COALESCE(r.ef, CASE WHEN abs(0.2*s.z + 0.8*r.e) >
                          3.0*sqrt(0.2/1.8*(1.0 - power(0.8, 2.0*s.rn)))
                             THEN CAST(s.rn AS DOUBLE) END)
  FROM rec r JOIN src s ON s.g = r.g AND s.rn = r.rn + 1
), fin AS (
  SELECT r.* FROM rec r JOIN nmax ON r.g = nmax.g AND r.rn = nmax.n
)
SELECT chart, g, feature, round(value, 6) AS value FROM (
  SELECT 'cusum' AS chart, g, 'n' AS feature,
         CAST(rn AS DOUBLE) AS value FROM fin
  UNION ALL SELECT 'cusum', g, 'cusum_pos', cp FROM fin
  UNION ALL SELECT 'cusum', g, 'cusum_neg', cn FROM fin
  UNION ALL SELECT 'cusum', g, 'n_alarms', ca FROM fin
  UNION ALL SELECT 'cusum', g, 'first_alarm_n', COALESCE(cf, -1.0)
  FROM fin
  UNION ALL SELECT 'ewma', g, 'n', CAST(rn AS DOUBLE) FROM fin
  UNION ALL SELECT 'ewma', g, 'ewma', e FROM fin
  UNION ALL SELECT 'ewma', g, 'ucl',
    3.0*sqrt(0.2/1.8*(1.0 - power(0.8, 2.0*rn))) FROM fin
  UNION ALL SELECT 'ewma', g, 'n_alarms', ea FROM fin
  UNION ALL SELECT 'ewma', g, 'first_alarm_n', COALESCE(ef, -1.0)
  FROM fin
)
"""


def q_ols_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple OLS l_discount ~ l_tax with full inference columns."""
    from fast_causal_inference_spark.operators.ols import ols_coef_df

    li = _load(spark, sf_dir, "lineitem")
    out = ols_coef_df(li, "l_discount ~ l_tax")
    return _round_all(out, ["name"], ["estimate", "stderr", "t_value"], 6)


_OLS_SIMPLE_SQL = """
WITH a AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(l_tax) AS mx, avg(l_discount) AS my,
         var_samp(l_tax) AS vx, var_samp(l_discount) AS vy,
         covar_samp(l_tax, l_discount) AS cxy
  FROM lineitem
), f AS (
  SELECT n, mx, my, vx, cxy / vx AS b1,
         (vy - cxy*cxy/vx) * (n-1) / (n-2) AS sigma2
  FROM a
)
SELECT '(Intercept)' AS name,
       round(my - b1*mx, 6) AS estimate,
       round(sqrt(sigma2 * (1.0/n + mx*mx/((n-1)*vx))), 6) AS stderr,
       round((my - b1*mx) / sqrt(sigma2 * (1.0/n + mx*mx/((n-1)*vx))), 6) AS t_value
FROM f
UNION ALL
SELECT 'l_tax' AS name,
       round(b1, 6) AS estimate,
       round(sqrt(sigma2 / ((n-1)*vx)), 6) AS stderr,
       round(b1 / sqrt(sigma2 / ((n-1)*vx)), 6) AS t_value
FROM f
"""


def q_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS (betas only): l_extendedprice ~ l_quantity + l_discount."""
    from fast_causal_inference_spark.operators.ols import ols_coef_df

    li = _load(spark, sf_dir, "lineitem")
    out = ols_coef_df(li, "l_extendedprice ~ l_quantity + l_discount")
    return _round_all(out, ["name"], ["estimate"], 4)


# Cramer's-rule solve of the 3x3 normal equations, entirely in SQL.
_OLS_MULTI_SQL = """
WITH a AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(l_quantity) AS s1, sum(l_discount) AS s2, sum(l_extendedprice) AS sy,
         sum(l_quantity*l_quantity) AS c11, sum(l_quantity*l_discount) AS c12,
         sum(l_discount*l_discount) AS c22,
         sum(l_quantity*l_extendedprice) AS c1y, sum(l_discount*l_extendedprice) AS c2y
  FROM lineitem
), d AS (
  SELECT *,
    n*(c11*c22 - c12*c12) - s1*(s1*c22 - c12*s2) + s2*(s1*c12 - c11*s2) AS det,
    sy*(c11*c22 - c12*c12) - s1*(c1y*c22 - c12*c2y) + s2*(c1y*c12 - c11*c2y) AS det0,
    n*(c1y*c22 - c2y*c12) - sy*(s1*c22 - c12*s2) + s2*(s1*c2y - c1y*s2) AS det1,
    n*(c11*c2y - c12*c1y) - s1*(s1*c2y - c1y*s2) + sy*(s1*c12 - c11*s2) AS det2
  FROM a
)
SELECT '(Intercept)' AS name, round(det0/det, 4) AS estimate FROM d
UNION ALL SELECT 'l_quantity', round(det1/det, 4) FROM d
UNION ALL SELECT 'l_discount', round(det2/det, 4) FROM d
"""


def q_wls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted simple regression: l_discount ~ l_tax, weight = l_quantity."""
    from fast_causal_inference_spark.operators.ols import wls

    li = _load(spark, sf_dir, "lineitem")
    model = wls(li, "l_discount ~ l_tax", weight="l_quantity")
    return spark.createDataFrame(
        [(n, round(float(b), 6)) for n, b in zip(model.names, model.beta)],
        "name string, estimate double")


_WLS_SQL = """
WITH a AS (
  SELECT sum(l_quantity) AS sw,
         sum(l_quantity*l_tax) AS swx, sum(l_quantity*l_discount) AS swy,
         sum(l_quantity*l_tax*l_tax) AS swxx,
         sum(l_quantity*l_tax*l_discount) AS swxy
  FROM lineitem
), f AS (
  SELECT (sw*swxy - swx*swy)/(sw*swxx - swx*swx) AS b1, sw, swx, swy FROM a
)
SELECT '(Intercept)' AS name, round((swy - b1*swx)/sw, 6) AS estimate FROM f
UNION ALL SELECT 'l_tax', round(b1, 6) FROM f
"""


def q_matrix_multiplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XᵀX over (l_quantity, l_discount, l_tax), scaled by 1/n for stability."""
    from fast_causal_inference_spark.operators.matrix import matrix_multiplication_df

    li = _load(spark, sf_dir, "lineitem")
    cnt = li.count()
    out = matrix_multiplication_df(li, "l_quantity", "l_discount", "l_tax")
    return out.select("i", "j", F.round(F.col("value") / cnt, 6).alias("value"))


_MATRIX_SQL = """
WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM lineitem),
g AS (
  SELECT sum(l_quantity*l_quantity) AS m00, sum(l_quantity*l_discount) AS m01,
         sum(l_quantity*l_tax) AS m02, sum(l_discount*l_discount) AS m11,
         sum(l_discount*l_tax) AS m12, sum(l_tax*l_tax) AS m22
  FROM lineitem)
SELECT i, j, round(v/(SELECT c FROM n), 6) AS value FROM (
  SELECT 0 AS i, 0 AS j, m00 AS v FROM g
  UNION ALL SELECT 0, 1, m01 FROM g UNION ALL SELECT 0, 2, m02 FROM g
  UNION ALL SELECT 1, 0, m01 FROM g UNION ALL SELECT 1, 1, m11 FROM g
  UNION ALL SELECT 1, 2, m12 FROM g UNION ALL SELECT 2, 0, m02 FROM g
  UNION ALL SELECT 2, 1, m12 FROM g UNION ALL SELECT 2, 2, m22 FROM g)
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U on events.value, arms by user parity."""
    from fast_causal_inference_spark.operators.mann_whitney import (
        mann_whitney_utest_spark,
    )

    ev = _load(spark, sf_dir, "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    out = mann_whitney_utest_spark(ev, "value", "treatment")
    return _round_all(out, [], ["u0", "u1", "z", "n0", "n1"], 6)


_MW_SQL = """
WITH s AS (
  SELECT value AS v, CAST(user_id % 2 = 1 AS INT) AS g FROM events
), w AS (
  SELECT g, v, rank() OVER (ORDER BY v) AS rnk,
         count(*) OVER (PARTITION BY v) AS t
  FROM s
), agg AS (
  SELECT sum(CASE WHEN g = 1 THEN rnk + (t - 1)/2.0 END) AS r1,
         CAST(sum(g) AS DOUBLE) AS n1, CAST(count(*) AS DOUBLE) AS n
  FROM w
), tie AS (
  SELECT sum(CAST(t AS DOUBLE)*t*t - t) AS tt
  FROM (SELECT count(*) AS t FROM s GROUP BY v)
), f AS (
  SELECT n, n1, n - n1 AS n0,
         r1 - n1*(n1+1)/2.0 AS u1,
         (n - n1)*n1 - (r1 - n1*(n1+1)/2.0) AS u0,
         sqrt((n - n1)*n1/12.0*((n+1) - (SELECT tt FROM tie)/(n*(n-1)))) AS sd
  FROM agg
)
SELECT round(u0, 6) AS u0, round(u1, 6) AS u1,
       round((abs(u1 - n0*n1/2.0) - 0.5)/sd, 6) AS z,
       round(n0, 6) AS n0, round(n1, 6) AS n1
FROM f
"""


def q_kstest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS of o_totalprice between order-key-parity arms."""
    from fast_causal_inference_spark.operators.kstest import (
        kolmogorov_smirnov_test_spark,
    )

    o = _load(spark, sf_dir, "orders") \
        .withColumn("arm", (F.col("o_orderkey") % 2).cast("int"))
    out = kolmogorov_smirnov_test_spark(o, "o_totalprice", "arm")
    return _round_all(out, [], ["d_statistic", "n0", "n1"], 6)


_KS_SQL = """
WITH s AS (
  SELECT o_totalprice AS v, CAST(o_orderkey % 2 = 1 AS INT) AS g FROM orders
), c AS (
  SELECT v, sum(1 - g) AS c0, sum(g) AS c1 FROM s GROUP BY v
), n AS (
  SELECT CAST(sum(c0) AS DOUBLE) AS n0, CAST(sum(c1) AS DOUBLE) AS n1 FROM c
), e AS (
  SELECT sum(c0) OVER (ORDER BY v) / (SELECT n0 FROM n) AS f0,
         sum(c1) OVER (ORDER BY v) / (SELECT n1 FROM n) AS f1
  FROM c
)
SELECT round(max(abs(f0 - f1)), 6) AS d_statistic,
       (SELECT round(n0, 6) FROM n) AS n0, (SELECT round(n1, 6) FROM n) AS n1
FROM e
"""


def q_xexpt_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xexpt drill-down by event_type — ONE grouped suff-stats pass for all
    report cells (reference groupBy('ds').xexpt_ttest_2samp semantics)."""
    from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp_spark

    ev = _load(spark, sf_dir, "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    out = xexpt_ttest_2samp_spark(ev, "value", "1 + event_id % 7", "treatment",
                                  "user_id", treatment_values=(0, 1),
                                  group_cols=["event_type"])
    return _round_all(out, ["event_type"],
                      ["numerator0", "numerator1", "denominator0",
                       "denominator1", "mean0", "mean1", "diff",
                       "diff_relative", "t_stat", "mde"], 6)


_XEXPT_GROUPED_SQL = """
WITH a AS (
  SELECT event_type, CAST(user_id % 2 = 1 AS INT) AS arm, value AS num,
         1 + event_id % 7 AS den
  FROM events
), g AS (
  SELECT event_type, arm, CAST(count(*) AS DOUBLE) AS n, sum(num) AS sn,
         sum(den) AS sd_, sum(num*num) AS cnn, sum(num*den) AS cnd,
         sum(den*den) AS cdd
  FROM a GROUP BY event_type, arm
), m AS (
  SELECT event_type, arm, n, sn, sd_, sn/n AS m1, sd_/n AS m2,
         (cnn - sn*sn/n)/(n-1) AS v11, (cnd - sn*sd_/n)/(n-1) AS v12,
         (cdd - sd_*sd_/n)/(n-1) AS v22
  FROM g
), d AS (
  SELECT event_type, arm, n, sn, sd_, m1/m2 AS mean,
         ((1/m2)*(1/m2)*v11 + 2*(1/m2)*(-m1/(m2*m2))*v12
          + (m1/(m2*m2))*(m1/(m2*m2))*v22)/n AS var_mean
  FROM m
), j AS (
  SELECT d0.event_type AS event_type,
         d0.sn AS numerator0, d1.sn AS numerator1,
         d0.sd_ AS denominator0, d1.sd_ AS denominator1,
         d0.mean AS mean0, d1.mean AS mean1,
         d1.mean - d0.mean AS diff,
         sqrt(d0.var_mean + d1.var_mean) AS stderr
  FROM (SELECT * FROM d WHERE arm = 0) d0
  JOIN (SELECT * FROM d WHERE arm = 1) d1 USING (event_type)
)
SELECT event_type,
       round(numerator0, 6) AS numerator0, round(numerator1, 6) AS numerator1,
       round(denominator0, 6) AS denominator0, round(denominator1, 6) AS denominator1,
       round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
       round(diff, 6) AS diff, round(diff/mean0, 6) AS diff_relative,
       round(diff/stderr, 6) AS t_stat,
       round((1.959963984540054 + 0.8416212335729143)*stderr/mean0, 6) AS mde
FROM j
"""


def q_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact arm-preserving permutation test (rows-only check — replica
    draws are seeded numpy, still partition-layout dependent)."""
    from fast_causal_inference_spark.operators.resample import permutation

    ev = _load(spark, sf_dir, "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    pdf = permutation(ev, "avg(value)", "treatment", permutation_num=20, seed=7)
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(float).round(6)
    return spark.createDataFrame(pdf)


def q_ttests_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector t-test: one row per alternative from ONE suff-stats pass
    (p/bounds are alternative- and erf-dependent — estimate/stderr/t are
    the oracle-checkable core)."""
    from fast_causal_inference_spark.operators.ttest import ttests_2samp

    ev = _load(spark, sf_dir, "events") \
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    out = ttests_2samp(ev, "avg(value)", "arm",
                       ["two-sided", "less", "greater"])
    return _round_all(out.select("alternative", "n0", "n1", "estimate",
                                 "stderr", "t_stat"),
                      ["alternative", "n0", "n1"],
                      ["estimate", "stderr", "t_stat"], 6)


_TTESTS_SQL = """
WITH s AS (
  SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (user_id % 2 = 1) AS DOUBLE) AS n1,
         avg(value) FILTER (user_id % 2 = 0) AS m0,
         avg(value) FILTER (user_id % 2 = 1) AS m1,
         var_samp(value) FILTER (user_id % 2 = 0) AS v0,
         var_samp(value) FILTER (user_id % 2 = 1) AS v1
  FROM events
), alts AS (SELECT unnest(['two-sided', 'less', 'greater']) AS alternative)
SELECT alternative, n0, n1,
       round(m1 - m0, 6) AS estimate,
       round(sqrt(v0/n0 + v1/n1), 6) AS stderr,
       round((m1 - m0)/sqrt(v0/n0 + v1/n1), 6) AS t_stat
FROM alts, s
"""


def q_iv_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2SLS, just-identified single endogenous regressor — the IV estimator
    collapses to cov(z,y)/cov(z,t), exactly oracle-able."""
    from fast_causal_inference_spark.operators.ols import iv_regression

    li = _load(spark, sf_dir, "lineitem") \
        .withColumn("z", (F.col("l_partkey") % 3).cast("double"))
    m = iv_regression(li, "l_extendedprice ~ (l_quantity ~ z)")
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame({
        "name": ["intercept", "l_quantity"],
        "beta": [round(float(b), 6) for b in m.beta]}))


_IV_SQL = """
WITH s AS (
  SELECT covar_samp(CAST(l_partkey % 3 AS DOUBLE), l_extendedprice) AS czy,
         covar_samp(CAST(l_partkey % 3 AS DOUBLE), l_quantity) AS czt,
         avg(l_extendedprice) AS my, avg(l_quantity) AS mt
  FROM lineitem
)
SELECT 'intercept' AS name, round(my - czy/czt * mt, 6) AS beta FROM s
UNION ALL SELECT 'l_quantity', round(czy/czt, 6) FROM s
"""


def g_did_event(spark: SparkSession, sf_dir: str,
                ev: DataFrame | None = None,
                panel: DataFrame | None = None) -> DataFrame:
    """Staggered event-study rows of the quasi-experimental family
    (golden sub-oracle: the k-feature OLS solve after the two-way within
    transform is a matrix inversion, not SQL-expressible).  Balanced
    panel: unit = user_id%12, period = event_id%10, cell outcome =
    avg(value); units 0-5 adopt at period 4 + unit%3, 6-11 never."""
    import pandas as pd

    from fast_causal_inference_spark.operators.eventstudy import (
        event_study,
    )

    if panel is None:
        if ev is None:
            ev = _load(spark, sf_dir, "events")
        panel = (ev.groupBy((F.col("user_id") % 12).alias("u"),
                            (F.col("event_id") % 10).alias("t"))
                 .agg(F.avg("value").alias("y")))
    out = event_study(
        panel, "y", "u", "t",
        "CASE WHEN u < 6 THEN 4 + u % 3 END", leads=2, lags=2)
    names, betas = [], []
    for r in out.itertuples():
        rp = int(r.rel_period)
        names.append(f"event_b_{rp}")
        betas.append(round(float(r.estimate), 6))
        names.append(f"event_se_{rp}")
        betas.append(round(float(r.stderr), 6))
    return spark.createDataFrame(pd.DataFrame({"name": names,
                                               "beta": betas}))


def g_did_synth(spark: SparkSession, sf_dir: str,
                ev: DataFrame | None = None,
                panel: DataFrame | None = None) -> DataFrame:
    """Synthetic-control rows of the quasi-experimental family (golden
    sub-oracle: the simplex-constrained FISTA solve is iterative, not
    SQL-expressible).  Panel: unit = user_id%8, period = event_id%12,
    y = avg(value); unit 0 'treated' from period 8."""
    import pandas as pd

    from fast_causal_inference_spark.operators.synth import (
        synthetic_control,
    )

    if panel is None:
        if ev is None:
            ev = _load(spark, sf_dir, "events")
        panel = ev.select((F.col("user_id") % 8).alias("u"),
                          (F.col("event_id") % 12).alias("t"), "value")
    out = synthetic_control(panel, "u", "t", "value", 0, 8)
    names = ["synth_att", "synth_pre_rmspe", "synth_post_rmspe",
             "synth_p_value"]
    betas = [out["att"], out["pre_rmspe"], out["post_rmspe"],
             out["p_value"]]
    for r in out["weights"].itertuples():
        names.append(f"synth_w_{int(r.unit)}")
        betas.append(float(r.weight))
    return spark.createDataFrame(pd.DataFrame({
        "name": names, "beta": [round(float(b), 6) for b in betas]}))


def _did_cs_rows(spark: SparkSession, sf_dir: str,
                 ev: DataFrame | None = None,
                 panel: DataFrame | None = None) -> DataFrame:
    """Callaway-Sant'Anna rows of the quasi-experimental family.  NOT a
    golden: every ATT(g,t) cell, aggregation, and influence-function
    variance is sum algebra over panel cells, so the DuckDB oracle
    re-derives all of it from scratch (``_DID_CS_SQL``).  Panel: unit =
    user_id%12, period = event_id%8, y = avg(value); units 0-5 adopt at
    3 + u%3 (groups 3,4,5), 6-11 never treated."""
    import pandas as pd

    from fast_causal_inference_spark.operators.csdid import (
        callaway_santanna,
    )

    if panel is None:
        if ev is None:
            ev = _load(spark, sf_dir, "events")
        panel = (ev.groupBy((F.col("user_id") % 12).alias("u"),
                            (F.col("event_id") % 8).alias("t"))
                 .agg(F.avg("value").alias("y")))
    res = callaway_santanna(panel, "y", "u", "t",
                            "CASE WHEN u < 6 THEN 3 + u % 3 END")
    names, betas = [], []
    for r in res.att_gt.itertuples():
        names += [f"cs_att_{r.group}_{r.time}", f"cs_se_{r.group}_{r.time}"]
        betas += [r.att, r.stderr]
    for r in res.event_study.itertuples():
        names += [f"cs_evt_{r.rel_period}", f"cs_evt_{r.rel_period}_se"]
        betas += [r.estimate, r.stderr]
    for r in res.group.itertuples():
        names += [f"cs_grp_{r.group}", f"cs_grp_{r.group}_se"]
        betas += [r.estimate, r.stderr]
    names += ["cs_overall", "cs_overall_se"]
    betas += [res.overall["att"], res.overall["stderr"]]
    return spark.createDataFrame(pd.DataFrame(
        {"name": names, "beta": [round(float(b), 6) for b in betas]}))


def g_did_its(spark: SparkSession, sf_dir: str,
              ev: DataFrame | None = None,
              grid: DataFrame | None = None) -> DataFrame:
    """Interrupted-time-series rows of the quasi-experimental family
    (golden sub-oracle: the segmented OLS + Newey-West sandwich is a
    driver-side matrix solve over the bounded daily grid).  The events
    table spans 2024-01 at every SF; intervention mid-month."""
    import pandas as pd

    from fast_causal_inference_spark.operators.its import (
        interrupted_time_series,
    )

    if grid is not None:
        # pre-bucketed daily means (one row per bucket): the operator's
        # internal avg over a single row reproduces each bucket value
        # bit-exactly and date_trunc is idempotent on truncated stamps,
        # so this is the SAME computation fed from the fused panel pass
        out = interrupted_time_series(grid, "y_day", "day", "2024-01-16",
                                      freq="1 day")
    else:
        if ev is None:
            ev = _load(spark, sf_dir, "events")
        out = interrupted_time_series(ev, "value", "ts", "2024-01-16",
                                      freq="1 day")
    names, betas = [], []
    for r in out.itertuples():
        names += [f"its_{r.name}", f"its_{r.name}_se"]
        betas += [round(float(r.coef), 6), round(float(r.stderr), 6)]
    return spark.createDataFrame(pd.DataFrame({"name": names,
                                               "beta": betas}))


def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-experimental designs family: difference-in-differences
    coefficients (saturated 2x2 — the OLS solution equals the
    closed-form cell-mean contrasts the oracle uses), sharp
    regression-discontinuity rows (triangular-kernel local-linear fits
    are closed forms of six weighted moments per side, fully
    SQL-re-derivable), Callaway-Sant'Anna group-time ATT rows (also
    fully SQL-re-derivable — cell-mean algebra plus an
    influence-function variance that is one more GROUP BY), and
    synthetic-control rows (golden sub-oracle — iterative simplex
    solve)."""
    import pandas as pd

    from fast_causal_inference_spark.operators.ols import did
    from fast_causal_inference_spark.operators.rdd import (
        regression_discontinuity,
    )

    # ONE persisted events scan feeds all six sub-oracles.  Round 12:
    # the four grid/panel aggregations (event-study u%12×t%10, CS-DiD
    # u%12×t%8, synthetic-control u%8×t%12 cell means, the ITS daily
    # grid) are FUSED into a single GROUPING SETS pass over the
    # persisted base (guide §2.4: four scans + four tiny shuffles become
    # one of each), and each sub-estimator receives its slice of the
    # cached ~350-cell result.  Cell values are bit-identical to the
    # separate aggregations (verified uint64-level at sf0.001/0.01/0.1:
    # the partial sums see the same rows in the same cached-partition
    # order), the synth cells ride avg-of-one-row identity, and the ITS
    # slice reproduces the operator's internal grid exactly (see
    # g_did_its).  did's OLS pass and the RDD moment pass keep their own
    # scans: their aggregates (Gramian, weighted moments) don't share
    # the panels' avg shape.
    base = _load(spark, sf_dir, "events").persist()
    base.count()
    ev = base \
        .withColumn("arm", (F.col("user_id") % 2).cast("int")) \
        .withColumn("post", (F.col("event_id") % 2).cast("int"))
    gcols = ["u12", "t10", "t8", "u8", "t12", "day"]
    sets = [["u12", "t10"], ["u12", "t8"], ["u8", "t12"], ["day"]]

    def _gid(included: list[str]) -> int:
        return sum((1 << (len(gcols) - 1 - i))
                   for i, c in enumerate(gcols) if c not in included)

    fused = (base.select(
        (F.col("user_id") % 12).alias("u12"),
        (F.col("event_id") % 10).alias("t10"),
        (F.col("event_id") % 8).alias("t8"),
        (F.col("user_id") % 8).alias("u8"),
        (F.col("event_id") % 12).alias("t12"),
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        "value")
        .groupingSets(sets, *[F.col(c) for c in gcols])
        .agg(F.avg("value").alias("y"), F.grouping_id().alias("gid"))
        .persist())
    fused.count()
    p_event = fused.where(F.col("gid") == _gid(["u12", "t10"])) \
        .select(F.col("u12").alias("u"), F.col("t10").alias("t"), "y")
    p_cs = fused.where(F.col("gid") == _gid(["u12", "t8"])) \
        .select(F.col("u12").alias("u"), F.col("t8").alias("t"), "y")
    p_synth = fused.where(F.col("gid") == _gid(["u8", "t12"])) \
        .select(F.col("u8").alias("u"), F.col("t12").alias("t"),
                F.col("y").alias("value"))
    grid = fused.where((F.col("gid") == _gid(["day"]))
                       & F.col("day").isNotNull()
                       & F.col("y").isNotNull()) \
        .select("day", F.col("y").alias("y_day"))
    try:
        m, rdd, synth_df, event_df, cs_df, its_df = _concurrent([
            lambda: did(ev, "value", "arm", "post"),
            # running variable: value around cutoff 50, bandwidth 30
            lambda: regression_discontinuity(
                ev.withColumn("y2",
                              F.col("value") * (1 + F.col("event_id") % 3)),
                "y2", "value", cutoff=50.0, bandwidth=30.0).iloc[0],
            lambda: g_did_synth(spark, sf_dir, panel=p_synth),
            lambda: g_did_event(spark, sf_dir, panel=p_event),
            lambda: _did_cs_rows(spark, sf_dir, panel=p_cs),
            lambda: g_did_its(spark, sf_dir, grid=grid),
        ])
    finally:
        fused.unpersist()
        base.unpersist()
    names = ["intercept", "treatment", "time", "interaction"]
    betas = [round(float(b), 6) for b in m.beta]
    for stat in ("estimate", "stderr", "t_stat", "n_left", "n_right",
                 "intercept_left", "intercept_right", "slope_left",
                 "slope_right"):
        names.append(f"rdd_{stat}")
        betas.append(round(float(rdd[stat]), 6))
    return spark.createDataFrame(pd.DataFrame({"name": names,
                                               "beta": betas})) \
        .unionByName(synth_df).unionByName(event_df).unionByName(cs_df) \
        .unionByName(its_df)


_DID_SQL = """
WITH cells AS (
  SELECT CAST(user_id % 2 AS INT) AS arm,
         CAST(event_id % 2 AS INT) AS post,
         avg(value) AS m
  FROM events GROUP BY 1, 2
), w AS (
  SELECT
    max(CASE WHEN arm = 0 AND post = 0 THEN m END) AS m00,
    max(CASE WHEN arm = 1 AND post = 0 THEN m END) AS m10,
    max(CASE WHEN arm = 0 AND post = 1 THEN m END) AS m01,
    max(CASE WHEN arm = 1 AND post = 1 THEN m END) AS m11
  FROM cells
), rdd_base AS (
  SELECT value - 50.0 AS x, value * (1 + event_id % 3) AS y,
         greatest(0, 1 - abs(value - 50.0) / 30.0) AS w
  FROM events WHERE value IS NOT NULL
), rdd_m AS (
  SELECT CASE WHEN x < 0 THEN 'l' ELSE 'r' END AS side,
         CAST(count(*) AS DOUBLE) AS n, sum(w) AS sw, sum(w*x) AS swx,
         sum(w*x*x) AS swxx, sum(w*y) AS swy, sum(w*x*y) AS swxy,
         sum(w*y*y) AS swyy
  FROM rdd_base WHERE w > 0 AND y IS NOT NULL GROUP BY 1
), rdd_f AS (
  SELECT side, n, sw, swx, swxx, swy, swxy, swyy,
         (swxx*swy - swx*swxy) / (sw*swxx - swx*swx) AS a,
         (sw*swxy - swx*swy) / (sw*swxx - swx*swx) AS b
  FROM rdd_m
), rdd_v AS (
  SELECT side, n, a, b,
         ((swyy - a*swy - b*swxy) / (n - 2)) * swxx
           / (sw*swxx - swx*swx) AS va
  FROM rdd_f
), rl AS (SELECT * FROM rdd_v WHERE side = 'l'),
rr AS (SELECT * FROM rdd_v WHERE side = 'r')
SELECT 'intercept' AS name, round(m00, 6) AS beta FROM w
UNION ALL SELECT 'treatment', round(m10 - m00, 6) FROM w
UNION ALL SELECT 'time', round(m01 - m00, 6) FROM w
UNION ALL SELECT 'interaction', round((m11 - m10) - (m01 - m00), 6) FROM w
UNION ALL SELECT 'rdd_estimate', round(rr.a - rl.a, 6) FROM rl, rr
UNION ALL SELECT 'rdd_stderr', round(sqrt(rr.va + rl.va), 6) FROM rl, rr
UNION ALL SELECT 'rdd_t_stat',
       round((rr.a - rl.a) / sqrt(rr.va + rl.va), 6) FROM rl, rr
UNION ALL SELECT 'rdd_n_left', round(n, 6) FROM rl
UNION ALL SELECT 'rdd_n_right', round(n, 6) FROM rr
UNION ALL SELECT 'rdd_intercept_left', round(a, 6) FROM rl
UNION ALL SELECT 'rdd_intercept_right', round(a, 6) FROM rr
UNION ALL SELECT 'rdd_slope_left', round(b, 6) FROM rl
UNION ALL SELECT 'rdd_slope_right', round(b, 6) FROM rr
"""

# Callaway-Sant'Anna from scratch: panel cells -> long differences vs the
# g-1 base period -> per-(g,t) Welch cells -> weighted aggregations with
# influence-function variances (sum psi_u^2 over units, psi summed across
# every cell a unit appears in BEFORE squaring).
_DID_CS_SQL = """
WITH cs_panel AS (
  SELECT CAST(user_id % 12 AS BIGINT) AS u,
         CAST(event_id % 8 AS BIGINT) AS t,
         avg(value) AS y
  FROM events GROUP BY 1, 2
), cs_units AS (
  SELECT DISTINCT u, CASE WHEN u < 6 THEN 3 + u % 3 END AS a FROM cs_panel
), cs_spec AS (
  SELECT gg.g, tt.t, gg.g - 1 AS b
  FROM (SELECT DISTINCT a AS g FROM cs_units WHERE a IS NOT NULL) gg
  CROSS JOIN (SELECT DISTINCT t FROM cs_panel) tt
  WHERE tt.t != gg.g - 1
), cs_role AS (
  SELECT s.g, s.t, p1.u, p1.y - p0.y AS d,
         CASE WHEN un.a = s.g THEN 1 ELSE 0 END AS role
  FROM cs_spec s
  JOIN cs_panel p1 ON p1.t = s.t
  JOIN cs_panel p0 ON p0.t = s.b AND p0.u = p1.u
  JOIN cs_units un ON un.u = p1.u
  WHERE un.a = s.g OR un.a IS NULL
), cs_att AS (
  SELECT g, t, n1, n0, s1 / n1 AS m1, s0 / n0 AS m0,
         s1 / n1 - s0 / n0 AS att,
         sqrt(greatest(ss1 - s1 * s1 / n1, 0) / (n1 - 1) / n1
              + greatest(ss0 - s0 * s0 / n0, 0) / (n0 - 1) / n0) AS se
  FROM (
    SELECT g, t,
           sum(CASE WHEN role = 1 THEN 1.0 ELSE 0 END) AS n1,
           sum(CASE WHEN role = 1 THEN d END) AS s1,
           sum(CASE WHEN role = 1 THEN d * d END) AS ss1,
           sum(CASE WHEN role = 0 THEN 1.0 ELSE 0 END) AS n0,
           sum(CASE WHEN role = 0 THEN d END) AS s0,
           sum(CASE WHEN role = 0 THEN d * d END) AS ss0
    FROM cs_role GROUP BY 1, 2
  ) WHERE n1 >= 2 AND n0 >= 2
), cs_w AS (
  SELECT 'evt_' || CAST(t - g AS VARCHAR) AS target, g, t, n1 AS w
  FROM cs_att
  UNION ALL
  SELECT 'grp_' || CAST(g AS VARCHAR), g, t, 1.0 FROM cs_att WHERE t >= g
  UNION ALL
  SELECT 'overall', g, t, n1 FROM cs_att WHERE t >= g
), cs_wn AS (
  SELECT target, g, t, w / sum(w) OVER (PARTITION BY target) AS w FROM cs_w
), cs_est AS (
  SELECT w.target, sum(w.w * a.att) AS est
  FROM cs_wn w JOIN cs_att a ON a.g = w.g AND a.t = w.t GROUP BY 1
), cs_psi AS (
  SELECT w.target, r.u,
         sum(w.w * CASE WHEN r.role = 1 THEN (r.d - a.m1) / a.n1
                        ELSE -(r.d - a.m0) / a.n0 END) AS p
  FROM cs_role r
  JOIN cs_att a ON a.g = r.g AND a.t = r.t
  JOIN cs_wn w ON w.g = r.g AND w.t = r.t
  GROUP BY 1, 2
), cs_var AS (SELECT target, sum(p * p) AS v FROM cs_psi GROUP BY 1)
SELECT 'cs_att_' || CAST(g AS VARCHAR) || '_' || CAST(t AS VARCHAR) AS name,
       round(att, 6) AS beta FROM cs_att
UNION ALL
SELECT 'cs_se_' || CAST(g AS VARCHAR) || '_' || CAST(t AS VARCHAR),
       round(se, 6) FROM cs_att
UNION ALL SELECT 'cs_' || target, round(est, 6) FROM cs_est
UNION ALL SELECT 'cs_' || target || '_se', round(sqrt(v), 6) FROM cs_var
"""


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve on integer-bucketed event durations."""
    from fast_causal_inference_spark.operators.survival import kaplan_meier

    ev = _load(spark, sf_dir, "events") \
        .withColumn("t_", F.round(F.col("value") / 10.0).cast("double")) \
        .withColumn("e_", (F.col("event_id") % 5 != 0).cast("int"))
    pdf = kaplan_meier(ev, "t_", "e_")
    pdf = pdf.round({"survival": 6})
    pdf["time"] = pdf["time"].astype(float)
    pdf["n_risk"] = pdf["n_risk"].astype(float)
    pdf["n_event"] = pdf["n_event"].astype(float)
    return spark.createDataFrame(pdf)


_KM_SQL = """
WITH a AS (
  SELECT CAST(round(value/10.0) AS DOUBLE) AS time,
         CAST(sum(CASE WHEN event_id % 5 != 0 THEN 1 ELSE 0 END) AS DOUBLE)
           AS n_event,
         count(*) AS n_obs
  FROM events GROUP BY 1
), b AS (
  SELECT time, n_event, n_obs,
         CAST((SELECT sum(n_obs) FROM a)
              - coalesce(sum(n_obs) OVER (ORDER BY time
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE) AS n_risk
  FROM a
)
SELECT time, n_risk, n_event,
       round(exp(sum(ln((n_risk - n_event) / n_risk))
                 OVER (ORDER BY time)), 6) AS survival
FROM b ORDER BY time
"""


def _tl_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_load(spark, sf_dir, "lineitem")
            .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
            .withColumn("disc_hi", (F.col("l_discount") > 0.05).cast("int")))


def _avg_ite_rows(learner, li: DataFrame, variant: str, nd: int = 6):
    pdf = (learner.predict(li, "ite")
           .groupBy("l_returnflag")
           .agg(F.avg("ite").alias("avg_ite"))
           .orderBy("l_returnflag").collect())
    return [(variant, str(r["l_returnflag"]), round(float(r["avg_ite"]), nd))
            for r in pdf]


def g_t_learner_cvt(spark: SparkSession, sf_dir: str,
                   li: DataFrame | None = None) -> DataFrame:
    """CVT rows of the meta-learner family (golden sub-oracle: logistic
    IRLS is a deterministic iterative solve, not SQL-expressible)."""
    from fast_causal_inference_spark.uplift.metalearners import CVT

    li = li if li is not None else _tl_base(spark, sf_dir)
    cvt = CVT(["l_quantity"], "disc_hi", "arm").fit(li)
    return spark.createDataFrame(_avg_ite_rows(cvt, li, "cvt"),
                                 "variant string, l_returnflag string, "
                                 "avg_ite double")


def g_t_learner_x(spark: SparkSession, sf_dir: str,
                 li: DataFrame | None = None, pm=None,
                 om=None) -> DataFrame:
    """X-learner rows (golden sub-oracle: logistic propensity blend)."""
    from fast_causal_inference_spark.uplift.metalearners import XLearner

    li = li if li is not None else _tl_base(spark, sf_dir)
    xl = XLearner(["l_quantity"], "l_extendedprice", "arm",
                  propensity_model=pm, outcome_models=om).fit(li)
    return spark.createDataFrame(_avg_ite_rows(xl, li, "x", nd=4),
                                 "variant string, l_returnflag string, "
                                 "avg_ite double")


def g_t_learner_prop(spark: SparkSession, sf_dir: str,
                    li: DataFrame | None = None, pm=None) -> DataFrame:
    """Propensity-model rows (golden sub-oracle: logistic IRLS): average
    fitted g(x) = P(T=1|x) by return flag — the IPW/matching building
    block scored over the whole table."""
    from fast_causal_inference_spark.uplift.metalearners import (
        PropensityModel,
    )

    li = li if li is not None else _tl_base(spark, sf_dir)
    if pm is None:
        pm = PropensityModel(["l_quantity"], "arm").fit(li)
    return spark.createDataFrame(_avg_ite_rows(pm, li, "prop"),
                                 "variant string, l_returnflag string, "
                                 "avg_ite double")


def g_t_learner_retro(spark: SparkSession, sf_dir: str,
                     li: DataFrame | None = None) -> DataFrame:
    """Retrospective-learner rows (golden sub-oracle: logistic IRLS on
    converters): average P(T=1 | Y=1, x) uplift score by return flag."""
    from fast_causal_inference_spark.uplift.metalearners import (
        RetrospectiveLearner,
    )

    li = li if li is not None else _tl_base(spark, sf_dir)
    rl = RetrospectiveLearner(["l_quantity"], "disc_hi", "arm").fit(li)
    return spark.createDataFrame(_avg_ite_rows(rl, li, "retro"),
                                 "variant string, l_returnflag string, "
                                 "avg_ite double")


def g_t_learner_r(spark: SparkSession, sf_dir: str,
                 li: DataFrame | None = None, pm=None) -> DataFrame:
    """R-learner rows (golden sub-oracle: logistic propensity nuisance +
    no-intercept residual-on-residual OLS): average orthogonalized
    CATE by return flag."""
    from fast_causal_inference_spark.uplift.metalearners import RLearner

    li = li if li is not None else _tl_base(spark, sf_dir)
    rl = RLearner(["l_quantity"], "l_extendedprice", "arm",
                  propensity_model=pm).fit(li)
    return spark.createDataFrame(_avg_ite_rows(rl, li, "r", nd=4),
                                 "variant string, l_returnflag string, "
                                 "avg_ite double")


def g_t_learner_dr(spark: SparkSession, sf_dir: str,
                  li: DataFrame | None = None, pm=None,
                  om=None) -> DataFrame:
    """DR-learner rows (golden sub-oracle: logistic propensity inside the
    AIPW pseudo-outcome): average doubly-robust CATE by return flag."""
    from fast_causal_inference_spark.uplift.metalearners import DRLearner

    li = li if li is not None else _tl_base(spark, sf_dir)
    dr = DRLearner(["l_quantity"], "l_extendedprice", "arm",
                   propensity_model=pm, outcome_models=om).fit(li)
    return spark.createDataFrame(_avg_ite_rows(dr, li, "dr", nd=4),
                                 "variant string, l_returnflag string, "
                                 "avg_ite double")


def _conformal_rows(spark: SparkSession, sf_dir: str,
                    li: DataFrame | None = None):
    """Split-conformal ITE band rows (beyond ref): per-returnflag average
    band plus the two conformal quantiles.  Fully SQL-re-derived — the
    fold is `l_suppkey % 2` (pre-treatment id), the per-arm fit-fold
    models are closed-form simple regressions, and the conformal
    quantile is the exact ceil((n+1)(1-alpha)) order statistic
    (approxQuantile rel=1e-6 == the row_number() re-derivation)."""
    from fast_causal_inference_spark.operators.conformal import conformal_fit

    li = li if li is not None else _tl_base(spark, sf_dir)
    m = conformal_fit(li, "l_extendedprice", "arm", ["l_quantity"],
                      alpha=0.1, fold_expr="l_suppkey")
    half = m.q1 + m.q0
    agg = (m.transform(li).groupBy("l_returnflag")
           .agg(F.avg("ite").alias("tau")).orderBy("l_returnflag").collect())
    rows = []
    for r in agg:
        rf, tau = str(r["l_returnflag"]), float(r["tau"])
        rows += [("conf", rf, round(tau, 4)),
                 ("conf_lo", rf, round(tau - half, 4)),
                 ("conf_hi", rf, round(tau + half, 4))]
    rows += [("conf_q", "q0", round(m.q0, 4)), ("conf_q", "q1", round(m.q1, 4))]
    return rows


def q_t_learner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-learner family: T / S / transformed-outcome / split-conformal
    ITE bands (SQL-re-derived)
    + CVT / X / propensity / retrospective / R / DR (golden, logistic
    stages):
    average predicted ITE (or score) by return flag.  The S-learner with a full t·x interaction is mathematically
    the two per-arm fits, so DuckDB's regr_* re-derivation covers it; the
    joint 4×4 solve vs two 2×2 solves differ only in fp round-off, hence
    its 4-decimal rounding."""
    from fast_causal_inference_spark.uplift.metalearners import (
        SLearner,
        TLearner,
        TransformedOutcome,
    )

    # NOT persisted: an A/B at sf1 measured the persisted shared base
    # SLOWER than the per-variant pruned parquet re-scans it replaced
    # (OS page cache makes the decodes nearly free; the serial
    # materialization barrier is pure added wall — see COVERAGE.md).
    # The genuine shared work is the logistic propensity NUISANCE: the
    # prop / X / R / DR variants all solve the identical arm ~ l_quantity
    # IRLS, so phase 1 fits it ONCE (overlapped with the variants that
    # don't need it) and phase 2 hands the fitted model to its four
    # consumers — same coefficients, every golden bit-identical.
    from fast_causal_inference_spark.uplift.metalearners import (
        PropensityModel,
    )

    from concurrent.futures import ThreadPoolExecutor

    from fast_causal_inference_spark.operators.ols import ols_grouped

    li = _tl_base(spark, sf_dir)
    # the TWO shared nuisances fit ONCE, as futures on their own threads
    # (not inside the consumer pool, which could fill with blocked
    # consumers): the logistic propensity (arm ~ l_quantity; consumed by
    # prop/X/R/DR) and the per-arm grouped outcome OLS (consumed by
    # T/X/DR) — identical solves, so every golden stays bit-identical
    # while three IRLS fits and two grouped Gramian scans disappear.
    # Futures instead of a two-phase barrier: a phase split measured
    # ~+2 s at sf0.1 because the six variants that need NO nuisance
    # still waited on phase 1's slowest member.
    nursery = ThreadPoolExecutor(max_workers=2)
    try:
        pm_f = nursery.submit(
            lambda: PropensityModel(["l_quantity"], "arm").fit(li))
        om_f = nursery.submit(
            lambda: ols_grouped(li, "l_extendedprice ~ l_quantity",
                                "CAST((arm) AS DOUBLE)"))
        (t_rows, s_rows, to_rows, conf_rows, cvt_df, retro_df, x_df,
         prop_df, r_df, dr_df) = _concurrent([
            lambda: _avg_ite_rows(
                TLearner(["l_quantity"], "l_extendedprice", "arm",
                         outcome_models=om_f.result()).fit(li), li, "t"),
            lambda: _avg_ite_rows(
                SLearner(["l_quantity"], "l_extendedprice", "arm").fit(li),
                li, "s", nd=4),
            lambda: _avg_ite_rows(
                TransformedOutcome(["l_quantity"], "l_extendedprice", "arm",
                                   propensity=0.5).fit(li), li, "to", nd=4),
            lambda: _conformal_rows(spark, sf_dir, li=li),
            lambda: g_t_learner_cvt(spark, sf_dir, li=li),
            lambda: g_t_learner_retro(spark, sf_dir, li=li),
            lambda: g_t_learner_x(spark, sf_dir, li=li,
                                  pm=pm_f.result().model_,
                                  om=om_f.result()),
            lambda: g_t_learner_prop(spark, sf_dir, li=li,
                                     pm=pm_f.result()),
            lambda: g_t_learner_r(spark, sf_dir, li=li,
                                  pm=pm_f.result().model_),
            lambda: g_t_learner_dr(spark, sf_dir, li=li,
                                   pm=pm_f.result().model_,
                                   om=om_f.result()),
        ])
    finally:
        nursery.shutdown(wait=False)
    sql_df = spark.createDataFrame(
        t_rows + s_rows + to_rows + conf_rows,
        "variant string, l_returnflag string, avg_ite double")
    return (sql_df.unionByName(cvt_df).unionByName(x_df)
            .unionByName(prop_df).unionByName(retro_df)
            .unionByName(r_df).unionByName(dr_df))


_T_LEARNER_SQL = """
WITH m AS (
  SELECT
    regr_intercept(l_extendedprice, l_quantity)
      FILTER (l_orderkey % 2 = 0) AS i0,
    regr_slope(l_extendedprice, l_quantity)
      FILTER (l_orderkey % 2 = 0) AS s0,
    regr_intercept(l_extendedprice, l_quantity)
      FILTER (l_orderkey % 2 = 1) AS i1,
    regr_slope(l_extendedprice, l_quantity)
      FILTER (l_orderkey % 2 = 1) AS s1
  FROM lineitem
), tom AS (
  SELECT
    regr_intercept(4 * l_extendedprice * ((l_orderkey % 2) - 0.5),
                   l_quantity) AS i,
    regr_slope(4 * l_extendedprice * ((l_orderkey % 2) - 0.5),
               l_quantity) AS s
  FROM lineitem
)
SELECT 't' AS variant, l_returnflag,
       round(avg((i1 + s1 * l_quantity) - (i0 + s0 * l_quantity)), 6)
         AS avg_ite
FROM lineitem, m GROUP BY l_returnflag
UNION ALL
SELECT 's', l_returnflag,
       round(avg((i1 + s1 * l_quantity) - (i0 + s0 * l_quantity)), 4)
FROM lineitem, m GROUP BY l_returnflag
UNION ALL
SELECT 'to', l_returnflag, round(avg(i + s * l_quantity), 4)
FROM lineitem, tom GROUP BY l_returnflag
UNION ALL SELECT variant, l_returnflag, avg_ite FROM (
  WITH cf AS (
    SELECT l_quantity AS x, l_extendedprice AS y, l_returnflag AS rf,
           l_orderkey % 2 AS arm, l_suppkey % 2 AS fold
    FROM lineitem
  ), cfit AS (          -- per-arm simple OLS on the fit fold
    SELECT arm, regr_intercept(y, x) AS a, regr_slope(y, x) AS b
    FROM cf WHERE fold = 0 GROUP BY arm
  ), cscore AS (        -- calibration-fold conformity scores
    SELECT c.arm, abs(c.y - (f.a + f.b * c.x)) AS s
    FROM cf c JOIN cfit f ON f.arm = c.arm WHERE c.fold = 1
  ), cq AS (            -- exact ceil((n+1)*0.9) order statistic per arm
    SELECT arm, s AS q FROM (
      SELECT arm, s, row_number() OVER (PARTITION BY arm ORDER BY s) AS rn,
             count(*) OVER (PARTITION BY arm) AS n
      FROM cscore) WHERE rn = CAST(ceil((n + 1) * 0.9) AS BIGINT)
  ), chalf AS (
    SELECT sum(q) AS half FROM cq
  ), ctau AS (
    SELECT c.rf, avg((f1.a - f0.a) + (f1.b - f0.b) * c.x) AS tau
    FROM cf c,
         (SELECT a, b FROM cfit WHERE arm = 1) f1,
         (SELECT a, b FROM cfit WHERE arm = 0) f0
    GROUP BY c.rf
  )
  SELECT 'conf' AS variant, rf AS l_returnflag, round(tau, 4) AS avg_ite
  FROM ctau
  UNION ALL SELECT 'conf_lo', rf, round(tau - half, 4) FROM ctau, chalf
  UNION ALL SELECT 'conf_hi', rf, round(tau + half, 4) FROM ctau, chalf
  UNION ALL SELECT 'conf_q', 'q' || CAST(arm AS VARCHAR), round(q, 4) FROM cq
) __conf
"""


def q_exact_matching(spark: SparkSession, sf_dir: str,
                     o: DataFrame | None = None) -> DataFrame:
    """Exact matching per o_orderpriority: deterministic per-key quotas."""
    from fast_causal_inference_spark.operators.matching import exact_matching

    if o is None:
        o = _load(spark, sf_dir, "orders") \
            .withColumn("arm", (F.col("o_orderkey") % 2).cast("int"))
    m = exact_matching(o, "arm", ["o_orderpriority"])
    return (m.where(F.col("match_index").isNotNull())
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n_matched"),
                  F.sum("arm").alias("n_treated"))
             .orderBy("o_orderpriority"))


_EXACT_MATCHING_SQL = """
WITH q AS (
  SELECT o_orderpriority,
         least(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END),
               sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)) AS quota
  FROM orders GROUP BY 1
)
SELECT o_orderpriority,
       CAST(2 * quota AS BIGINT) AS n_matched,
       CAST(quota AS BIGINT) AS n_treated
FROM q WHERE quota > 0 ORDER BY o_orderpriority
"""


def q_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATE family: difference-in-means point estimate plus the AIPW
    doubly-robust estimator with a linear-probability propensity and one
    covariate — the oracle re-derives BOTH per-arm simple regressions,
    the LPM, the clamped ψ influence column, and its mean/sd in
    closed-form SQL.  Off-policy rows (beyond ref): IPS / SNIPS / DR value
    of a fixed 70/30 target policy against a deterministic x-dependent
    logging propensity — weights, per-action q-models, and influence
    columns all re-derived in the same SQL."""
    from fast_causal_inference_spark.operators.estimators import (
        aipw_estimator,
        ate_estimator,
    )
    from fast_causal_inference_spark.operators.offpolicy import ope_report

    ev = _load(spark, sf_dir, "events") \
        .withColumn("arm", (F.col("user_id") % 2).cast("int")) \
        .withColumn("x", ((F.col("event_id") % 97) / 97.0))
    ev_ope = ev.withColumn(
        "mu", F.when(F.col("arm") == 1, 0.2 + 0.6 * F.col("x"))
               .otherwise(0.8 - 0.6 * F.col("x")))
    dm, aipw, ope = _concurrent([
        lambda: ate_estimator(ev, "value", "arm", B=10, seed=3),
        lambda: aipw_estimator(ev, "value", "arm", ["x"],
                               propensity="linear"),
        lambda: ope_report(ev_ope, "value", "arm", ["x"],
                           {1: "0.7", 0: "0.3"}, "mu"),
    ])
    rows = [("diff_means", "ATE", round(float(dm.ATE.iloc[0]), 6)),
            ("aipw_linear", "ATE", round(float(aipw.ATE.iloc[0]), 6)),
            ("aipw_linear", "stderr", round(float(aipw.stderr.iloc[0]), 6))]
    for _, r in ope.iterrows():
        rows.append((f"ope_{r.estimator}", "value", round(float(r.value), 6)))
        rows.append((f"ope_{r.estimator}", "stderr",
                     round(float(r.stderr), 6)))
    return spark.createDataFrame(rows, "variant string, stat string, value double")


_ATE_SQL = """
WITH base AS (
  SELECT value AS y, CAST(user_id % 2 AS DOUBLE) AS t,
         (event_id % 97)/97.0 AS x
  FROM events
), m1 AS (   -- per-arm simple OLS y ~ x on t = 1
  SELECT covar_samp(x, y)/var_samp(x) AS b,
         avg(y) - covar_samp(x, y)/var_samp(x)*avg(x) AS a
  FROM base WHERE t = 1
), m0 AS (
  SELECT covar_samp(x, y)/var_samp(x) AS b,
         avg(y) - covar_samp(x, y)/var_samp(x)*avg(x) AS a
  FROM base WHERE t = 0
), pm AS (   -- linear-probability propensity t ~ x
  SELECT covar_samp(x, t)/var_samp(x) AS b,
         avg(t) - covar_samp(x, t)/var_samp(x)*avg(x) AS a
  FROM base
), psi AS (
  SELECT b.t, b.y,
         (m1.a + m1.b*b.x) AS mu1, (m0.a + m0.b*b.x) AS mu0,
         greatest(0.01, least(0.99, pm.a + pm.b*b.x)) AS e
  FROM base b, m1, m0, pm
), scored AS (
  SELECT mu1 - mu0 + t*(y - mu1)/e - (1 - t)*(y - mu0)/(1 - e) AS p
  FROM psi
)
SELECT 'diff_means' AS variant, 'ATE' AS stat,
       round(avg(y) FILTER (t = 1) - avg(y) FILTER (t = 0), 6) AS value
FROM base
UNION ALL SELECT 'aipw_linear', 'ATE', round(avg(p), 6) FROM scored
UNION ALL SELECT 'aipw_linear', 'stderr',
       round(stddev_samp(p)/sqrt(count(*)), 6) FROM scored
UNION ALL SELECT 'ope_ips', 'value', round(avg(w*y), 6) FROM ope
UNION ALL SELECT 'ope_ips', 'stderr',
       round(stddev_samp(w*y)/sqrt(count(*)), 6) FROM ope
UNION ALL SELECT 'ope_snips', 'value',
       round(sum(w*y)/sum(w), 6) FROM ope
UNION ALL SELECT 'ope_snips', 'stderr', round(sx, 6) FROM snips_se
UNION ALL SELECT 'ope_dr', 'value', round(avg(phi), 6) FROM dr_phi
UNION ALL SELECT 'ope_dr', 'stderr',
       round(stddev_samp(phi)/sqrt(count(*)), 6) FROM dr_phi
"""

# off-policy CTEs spliced in front of the final SELECT: logging propensity
# mu = 0.2+0.6x (arm 1) / 0.8-0.6x (arm 0); target policy 70/30; per-action
# q-models are the same closed-form simple regressions as m1/m0
_ATE_SQL = _ATE_SQL.replace(
    ")\nSELECT 'diff_means'",
    """), ope AS (
  SELECT y, t, x,
         (CASE WHEN t = 1 THEN 0.7 ELSE 0.3 END)
         / (CASE WHEN t = 1 THEN 0.2 + 0.6*x ELSE 0.8 - 0.6*x END) AS w
  FROM base
), snips_v AS (
  SELECT sum(w*y)/sum(w) AS v, avg(w) AS wbar, count(*) AS n FROM ope
), snips_se AS (
  SELECT stddev_samp(o.w*(o.y - s.v)/s.wbar)/sqrt(s.n) AS sx
  FROM ope o, snips_v s
  GROUP BY s.n
), dr_phi AS (
  SELECT 0.7*(m1.a + m1.b*o.x) + 0.3*(m0.a + m0.b*o.x)
         + o.w*(o.y - CASE WHEN o.t = 1 THEN m1.a + m1.b*o.x
                           ELSE m0.a + m0.b*o.x END) AS phi
  FROM ope o, m1, m0
)
SELECT 'diff_means'""")


def q_stochastic_sgd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition mini-batch SGD + model averaging (rows-only: the
    update path depends on partition layout and a seeded shuffle)."""
    from fast_causal_inference_spark.operators.logistic import (
        stochastic_linear_regression,
    )

    li = _load(spark, sf_dir, "lineitem").coalesce(4)
    m = stochastic_linear_regression(
        li, "l_extendedprice ~ l_quantity + l_discount",
        learning_rate=0.05, l1=0.0, batch_size=64, epochs=3, seed=7,
        standardize=True)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame({
        "name": ["(Intercept)"] + m.feature_exprs,
        "beta": [round(float(b), 6) for b in m.beta]}))


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup family: whole-document dedup survivors (documents ∪
    copies at ids+100000) plus exact repeated-SUBSTRING spans (Lee et al.
    suffix-array criterion, realized as diagonal n-gram runs) on a corpus
    with planted splices (doc i ‖ doc i+1 at ids+200000) — the oracle
    re-derives every span from gram STRINGS where the engine joins 64-bit
    gram hashes."""
    from fast_causal_inference_spark.datapipe.dedup import (
        exact_dedup,
        repeated_substring_spans,
    )

    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.where(F.col("doc_id") < 50) \
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    out = exact_dedup(d.unionByName(copies))
    surv = out.select("doc_id")

    a, b = d.alias("a"), d.alias("b")
    spliced = (a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
               .where(F.col("a.doc_id") < 5)
               .select((F.col("a.doc_id") + 200000).alias("doc_id"),
                       F.concat(F.col("a.text"), F.lit(" "),
                                F.col("b.text")).alias("text")))
    spans = repeated_substring_spans(
        d.where(F.col("doc_id") < 10).unionByName(spliced),
        n=10, min_run_tokens=30)

    # one aggregation instead of three self-unioned ones (each ran the
    # full dedup pipeline again); stack reshapes to the same long rows
    rows_doc = surv.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("doc_id").cast("double").alias("__s"),
        F.sum(F.col("doc_id") * F.col("doc_id")).cast("double")
        .alias("__ss")
    ).select(
        F.lit("doc").alias("variant"), F.lit("survivors").alias("item"),
        F.expr("stack(3, 'n', __n, 'id_sum', __s, 'id_sq_sum', __ss) "
               "as (stat, value)"))
    rows_span = spans.select(
        F.lit("substring").alias("variant"),
        F.concat_ws("-", F.col("id_a").cast("string"),
                    F.col("id_b").cast("string"),
                    F.col("start_a").cast("string")).alias("item"),
        F.lit("run").alias("stat"),
        (F.col("run_tokens") * 1000000 + F.col("start_b"))
        .cast("double").alias("value"))
    return rows_doc.unionByName(rows_span)


_EXACT_DEDUP_SQL = r"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
), keyed AS (
  SELECT doc_id, md5(text) AS h,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM all_docs
), surv AS (
  SELECT doc_id FROM keyed WHERE rn = 1
), sub_corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT a.doc_id + 200000, a.text || ' ' || b.text
  FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
  WHERE a.doc_id < 5
), sub_tok AS (
  SELECT doc_id, string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') AS toks
  FROM sub_corpus
), sub_grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(toks, i, i + 9), ' ') AS g
  FROM sub_tok, unnest(range(1, greatest(len(toks) - 9, 0) + 1)) AS r(i)
), gdf AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM sub_grams
                 GROUP BY g)
  WHERE df BETWEEN 2 AND 50
), pruned AS (
  SELECT sub_grams.* FROM sub_grams JOIN gdf USING (g)
), matched AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, l.pos AS pos_a, r.pos AS pos_b,
         l.pos - r.pos AS diag
  FROM pruned l JOIN pruned r ON l.g = r.g AND l.doc_id < r.doc_id
), runs AS (
  SELECT id_a, id_b, diag,
         pos_a - row_number() OVER (PARTITION BY id_a, id_b, diag
                                    ORDER BY pos_a) AS grp,
         pos_a, pos_b
  FROM matched
), spans AS (
  SELECT id_a, id_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
         count(*) + 9 AS run_tokens
  FROM runs GROUP BY id_a, id_b, diag, grp
  HAVING count(*) + 9 >= 30
)
SELECT 'doc' AS variant, 'survivors' AS item, 'n' AS stat,
       CAST(count(*) AS DOUBLE) AS value FROM surv
UNION ALL SELECT 'doc', 'survivors', 'id_sum', CAST(sum(doc_id) AS DOUBLE)
FROM surv
UNION ALL SELECT 'doc', 'survivors', 'id_sq_sum',
       CAST(sum(doc_id * doc_id) AS DOUBLE) FROM surv
UNION ALL SELECT 'substring',
       CAST(id_a AS VARCHAR) || '-' || CAST(id_b AS VARCHAR) || '-'
         || CAST(start_a AS VARCHAR),
       'run', CAST(run_tokens * 1000000 + start_b AS DOUBLE)
FROM spans
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs (inverted-index join) over documents."""
    from fast_causal_inference_spark.datapipe.dedup import ngram_jaccard_pairs

    d = _load(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(d, threshold=0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_NGRAM_JACCARD_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
  FROM t
), inv AS (
  SELECT doc_id, length(grams) AS n_sh, unnest(grams) AS g FROM sh
), common AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b,
         any_value(l.n_sh) AS na, any_value(r.n_sh) AS nb,
         count(*) AS inter
  FROM inv l JOIN inv r ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(inter AS DOUBLE)/(na + nb - inter), 6) AS jaccard
FROM common
WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5
"""


def q_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k (rows-only: approximate index, seeded k-means)."""
    from fast_causal_inference_spark.datapipe.similarity import ivf_knn

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    out = ivf_knn(emb, q, k=5, n_lists=16, n_probe=6, seed=3)
    return out.select("query_id", "vec_id", "rank",
                      F.round("score", 4).alias("score"))


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters: connected components over the
    (oracle-stable) n-gram Jaccard pair graph."""
    from fast_causal_inference_spark.datapipe.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    d = _load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.5)
    return connected_components(pairs).orderBy("id")


_DEDUP_COMPONENTS_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
  FROM t
), inv AS (
  SELECT doc_id, length(grams) AS n_sh, unnest(grams) AS g FROM sh
), common AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b,
         any_value(l.n_sh) AS na, any_value(r.n_sh) AS nb, count(*) AS inter
  FROM inv l JOIN inv r ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM common
  WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), nodes AS (
  SELECT DISTINCT u AS id FROM edges
), reach AS (
  WITH RECURSIVE r(id, label) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.u, r.label FROM edges e JOIN r ON r.id = e.v
  )
  SELECT id, label FROM r
)
SELECT id, min(label) AS component FROM reach GROUP BY id ORDER BY id
"""


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 3 vectors."""
    from fast_causal_inference_spark.datapipe.similarity import knn_bruteforce

    e = _load(spark, sf_dir, "embeddings")
    queries_df = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    out = knn_bruteforce(e, queries_df, k=5)
    return out.select("query_id", "vec_id", "rank",
                      F.round("score", 4).alias("score"))


_KNN_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding, q.query_vec) AS score
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank, round(CAST(score AS DOUBLE), 4) AS score
FROM ranked WHERE rank <= 5
"""


# Okapi BM25 re-derived end-to-end in SQL (Lucene idf; k1=1.2, b=0.75):
# same tokenization as datapipe.text.tokens, postings/doclen/docfreq
# relations, per-(query,doc) score sum, top-5 window
_BM25_SQL = """
WITH queries(query_id, query) AS
  (VALUES (0, 'spark query join'), (1, 'merge sort window'),
          (2, 'customer big data stream')),
post AS (
  SELECT doc_id AS id, t.term, count(*) AS tf
  FROM documents,
       unnest(string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS t(term)
  WHERE t.term <> '' GROUP BY 1, 2
), doclen AS (SELECT id, sum(tf) AS dl FROM post GROUP BY 1),
docfreq AS (SELECT term, count(*) AS df_t FROM post GROUP BY 1),
consts AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclen),
qt AS (
  SELECT query_id, t.term FROM queries,
    unnest(list_distinct(string_split_regex(regexp_replace(lower(query), '^\\s+|\\s+$', '', 'g'), '\\s+')))
      AS t(term)
  WHERE t.term <> ''
), scored AS (
  SELECT qt.query_id, post.id,
         sum(ln(1.0 + (consts.n - docfreq.df_t + 0.5)
                      / (docfreq.df_t + 0.5))
             * post.tf * 2.2
             / (post.tf + 1.2 * (1.0 - 0.75
                                 + 0.75 * doclen.dl / consts.avgdl)))
           AS score
  FROM post JOIN qt USING (term) JOIN docfreq USING (term)
       JOIN doclen USING (id) CROSS JOIN consts
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, id) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, id AS vec_id, rank,
       round(CAST(score AS DOUBLE), 4) AS score
FROM ranked WHERE rank <= 5
"""


# TF-IDF cosine re-derived end-to-end in SQL: same tokenization, ln-scaled
# tf, smooth idf ln(1 + N/(1+df)), document/query L2 norms (the query norm
# keeps out-of-vocabulary terms at df=0 weight), sparse-dot cosine, top-5
_TFIDF_SQL = """
WITH tq(query_id, query) AS
  (VALUES (0, 'spark query join'), (1, 'data data stream zzqx')),
post AS (
  SELECT doc_id AS id, t.term, CAST(count(*) AS DOUBLE) AS tf
  FROM documents,
       unnest(string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS t(term)
  WHERE t.term <> '' GROUP BY 1, 2
), docfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df_t
               FROM post GROUP BY 1),
consts AS (SELECT CAST(count(DISTINCT id) AS DOUBLE) AS n FROM post),
wpost AS (
  SELECT post.id, post.term,
         (1.0 + ln(post.tf))
           * ln(1.0 + consts.n / (1.0 + docfreq.df_t)) AS w
  FROM post JOIN docfreq USING (term) CROSS JOIN consts
), norms AS (SELECT id, sqrt(sum(w*w)) AS norm FROM wpost GROUP BY 1),
qpost AS (
  SELECT query_id, t.term, CAST(count(*) AS DOUBLE) AS qtf
  FROM tq,
       unnest(string_split_regex(regexp_replace(lower(query), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS t(term)
  WHERE t.term <> '' GROUP BY 1, 2
), qw AS (
  SELECT qpost.query_id, qpost.term,
         (1.0 + ln(qpost.qtf))
           * ln(1.0 + consts.n / (1.0 + coalesce(docfreq.df_t, 0))) AS qw
  FROM qpost LEFT JOIN docfreq USING (term) CROSS JOIN consts
), qnorm AS (SELECT query_id, sqrt(sum(qw*qw)) AS qnorm
             FROM qw GROUP BY 1),
dots AS (
  SELECT qw.query_id, wpost.id, sum(wpost.w * qw.qw) AS dot
  FROM wpost JOIN qw USING (term) GROUP BY 1, 2
), scored AS (
  SELECT dots.query_id, dots.id,
         CASE WHEN norms.norm * qnorm.qnorm > 0
              THEN dots.dot / (norms.norm * qnorm.qnorm)
              ELSE 0.0 END AS score
  FROM dots JOIN norms USING (id) JOIN qnorm USING (query_id)
), ranked AS (
  SELECT query_id, id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, id) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, id AS vec_id, rank,
       round(CAST(score AS DOUBLE), 4) AS score
FROM ranked WHERE rank <= 5
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup family: hyperplane-LSH bucket join and
    SemDeDup-style k-means-cell join, BOTH checked against the exact
    all-pairs cosine relation — on this corpus (planted exact copies at
    threshold 0.999) each method's recall must be 1.0, so the exact
    relation IS the oracle for both and a recall regression turns the
    row red."""
    from fast_causal_inference_spark.datapipe.similarity import (
        embedding_near_dup_pairs,
        semantic_dedup_pairs,
    )

    e = _load(spark, sf_dir, "embeddings")
    copies = e.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding", "label")
    allv = e.unionByName(copies)
    # semantic_dedup_pairs trains its k-means quantizer eagerly at
    # construction — build both members concurrently.
    # n_lists ∝ √N, the SemDeDup regime: within-cell verification is
    # Σcᵢ² ≈ N²/L, so L = √N keeps it N^1.5.  At the sf0.01 correctness
    # point √(2000+20) rounds to exactly the historical 45, so the gated
    # values are unchanged; at the sf1 bench point a FIXED 45 was the
    # measured quadratic straggler (45 join keys × 1.1k-row cells).
    n_lists = max(45, int(round(allv.count() ** 0.5)))
    lsh, sem = _concurrent([
        lambda: embedding_near_dup_pairs(allv, threshold=0.999).select(
            F.lit("lsh").alias("variant"), "id_a", "id_b",
            F.round("cosine", 4).alias("cosine")),
        lambda: semantic_dedup_pairs(allv, threshold=0.999,
                                     n_lists=n_lists, seed=4).select(
            F.lit("semantic").alias("variant"), "id_a", "id_b",
            F.round("cosine", 4).alias("cosine")),
    ])
    return lsh.unionByName(sem).unionByName(g_emb_pca(spark, sf_dir))


def g_emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA rows of the embedding family (golden-snapshot sub-oracle:
    eigendecomposition is not SQL-expressible).  Encoded in the family's
    (variant, id_a, id_b, cosine) schema: id_a = component index, id_b =
    stat code (0 eigenvalue, 1 explained-variance ratio, 2 mean projected
    L2 norm over the corpus), cosine = value."""
    from fast_causal_inference_spark.datapipe.similarity import (
        embedding_pca,
        l2_norm,
        project_embeddings,
    )

    e = _load(spark, sf_dir, "embeddings")
    m = embedding_pca(e, k=4)
    rows = []
    for i in range(4):
        rows.append(("pca", i, 0,
                     round(float(m["explained_variance"][i]), 6)))
        rows.append(("pca", i, 1,
                     round(float(m["explained_variance_ratio"][i]), 6)))
    mean_norm = (project_embeddings(e, m, output_col="p")
                 .agg(F.avg(l2_norm(F.col("p")))).collect()[0][0])
    rows.append(("pca", -1, 2, round(float(mean_norm), 6)))
    return spark.createDataFrame(
        rows, "variant string, id_a long, id_b long, cosine double")


_EMB_NEAR_DUP_SQL = """
WITH all_vecs AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 50000, embedding FROM embeddings WHERE vec_id < 20
), exact_pairs AS (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         round(CAST(list_cosine_similarity(l.embedding, r.embedding)
                    AS DOUBLE), 4) AS cosine
  FROM all_vecs l JOIN all_vecs r ON l.vec_id < r.vec_id
  WHERE list_cosine_similarity(l.embedding, r.embedding) >= 0.999
)
SELECT 'lsh' AS variant, id_a, id_b, cosine FROM exact_pairs
UNION ALL
SELECT 'semantic' AS variant, id_a, id_b, cosine FROM exact_pairs
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (rows-only: banding depends on xxhash64,
    which DuckDB cannot reproduce; jaccard values are exact set Jaccards)."""
    from fast_causal_inference_spark.datapipe.dedup import minhash_lsh_pairs

    d = _load(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(d, threshold=0.5, num_hashes=64, bands=16)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (rows-only: xxhash64-based signature).

    max_hamming=8 with the default block-combination candidate scheme
    (Manku WWW'07): b=11 blocks, join on every C(11,3)=165 combination
    of 3 concatenated blocks (~17-bit keys) — same exact recall as the
    old 9x7-bit pigeonhole but near-linear candidates instead of the
    TH(n^2/128) join a 7-bit key implies (b=k+3 measured fastest at
    sf1: see the simhash_pairs docstring's block-count trade-off)."""
    from fast_causal_inference_spark.datapipe.dedup import simhash_pairs

    d = _load(spark, sf_dir, "documents")
    return simhash_pairs(d, max_hamming=8)


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full text-analysis + data-quality profile — every column value-checked
    against a DuckDB re-derivation: whitespace + BPE-ish token counts,
    stopword/CJK language ID (including the argmax tie rule), the 5-signal
    Gopher-style quality score, the whitespace-normalized md5 fingerprint
    (the xxhash64 variant stays the scale path in the library), PII
    email/IPv4 match counts, the Gopher duplicate-line fraction, and the
    GPT-3-style benchmark-decontamination flag (5-gram overlap vs the
    ``doc_id % 7 == 0`` slice standing in for an eval benchmark; the oracle
    re-joins on gram STRINGS where the engine joins 64-bit gram hashes —
    agreement also certifies the hashed join path), and CCNet-style
    bigram-LM perplexity under a trusted-slice model (``doc_id % 5 == 0``)
    — DuckDB re-derives the full add-1-smoothed log-probability — and the
    trainable Naive-Bayes quality classifier (trusted slice = good,
    ``doc_id % 5 == 1`` slice = bad; DuckDB re-derives every per-token
    log-ratio from the same count relations)."""
    from fast_causal_inference_spark.datapipe.lm import (
        score_perplexity,
        train_bigram_lm,
    )
    from fast_causal_inference_spark.datapipe.quality import (
        decontaminate,
        dup_line_frac,
        pii_count,
        quality_classifier_score,
        train_quality_classifier,
    )
    from fast_causal_inference_spark.datapipe.text import text_profile

    d = _load(spark, sf_dir, "documents")
    out = text_profile(d)
    out = (out
           .withColumn("pii_email_cnt", pii_count(F.col("text"), "email"))
           .withColumn("pii_ipv4_cnt", pii_count(F.col("text"), "ipv4"))
           .withColumn("dup_line_frac",
                       F.round(dup_line_frac(F.col("text")), 6)))
    bench = d.where(F.col("doc_id") % 7 == 0)
    out = decontaminate(out, bench, n=5, mode="flag")
    labeled = d.where(F.col("doc_id") % 5 <= 1).withColumn(
        "label", (F.col("doc_id") % 5 == 0).cast("int"))
    # both model trainings are eager count-relation builds — overlap them
    lm, nb = _concurrent([
        lambda: train_bigram_lm(d.where(F.col("doc_id") % 5 == 0)),
        lambda: train_quality_classifier(labeled, "label"),
    ])
    ppl = score_perplexity(d, lm, k=1.0).select(
        "doc_id", F.round("ppl", 6).alias("ppl"))
    out = out.join(ppl, "doc_id", "left")
    nbs = quality_classifier_score(d.select("doc_id", "text"), nb).select(
        "doc_id", F.round("quality_logodds", 6).alias("nb_logodds"))
    out = out.join(nbs, "doc_id", "left")
    return out.select("doc_id", "n_tokens", "n_tokens_bpe", "lang_pred",
                      F.round("quality", 6).alias("quality"),
                      "fingerprint_md5", "pii_email_cnt", "pii_ipv4_cnt",
                      "dup_line_frac",
                      F.col("contaminated").cast("long").alias("contaminated"),
                      "ppl", "nb_logodds")


_TEXT_PROFILE_SQL = r"""
WITH t AS (
  SELECT doc_id, text, regexp_replace(lower(text), '^\s+|\s+$', '', 'g') AS lt FROM documents
), tok AS (
  SELECT doc_id, text, lt, string_split_regex(lt, '\s+') AS toks,
         length(lt) = 0 AS blank
  FROM t
), base AS (
  SELECT doc_id, text, toks, blank,
         CASE WHEN blank THEN 0 ELSE len(toks) END AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z0-9]+'))
           + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
           AS n_tokens_bpe,
         len(list_filter(toks, x -> list_contains(
           ['the','a','of','and','to','in','is','it','that','for'], x))) AS h_en,
         len(list_filter(toks, x -> list_contains(
           ['el','la','de','que','y','en','un','los','se','por'], x))) AS h_es,
         len(list_filter(toks, x -> list_contains(
           ['der','die','das','und','ist','ein','zu','den','mit','von'], x))) AS h_de,
         len(list_filter(toks, x -> list_contains(
           ['le','la','de','et','les','un','des','en','du','est'], x))) AS h_fr,
         length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
         length(text) AS n_chars,
         length(regexp_replace(lt, '\s+', ' ', 'g')) AS norm_chars,
         len(toks) AS sz,
         len(list_distinct(toks)) AS dist_toks,
         length(regexp_replace(text, '[A-Za-z0-9\s\x{4e00}-\x{9fff}]', '', 'g')) AS syms
  FROM tok
), lang AS (
  SELECT *, greatest(h_en, h_es, h_de, h_fr) AS mx,
         h_en + h_es + h_de + h_fr AS sw_any
  FROM base
), lines AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)),
                     x -> length(x) > 0) AS ls
  FROM t
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS g
  FROM tok
), bench_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0
), contam AS (
  SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench_grams b ON gr.g = b.g
), tbg AS (
  SELECT tok.doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM tok, unnest(range(1, greatest(len(toks), 1))) AS r(i)
  WHERE toks[i] <> '' AND toks[i+1] <> ''
), trusted_bg AS (
  SELECT w1, w2, count(*) AS c12 FROM tbg WHERE doc_id % 5 = 0
  GROUP BY 1, 2
), trusted_uni AS (
  SELECT u.tk AS w1, count(*) AS c1
  FROM tok, unnest(tok.toks) AS u(tk)
  WHERE tok.doc_id % 5 = 0 AND u.tk <> '' GROUP BY 1
), lmconsts AS (SELECT count(*) AS v FROM trusted_uni),
ppl AS (
  SELECT d.doc_id,
         round(exp(-avg(ln((coalesce(b.c12, 0) + 1.0)
                           / (coalesce(u.c1, 0) + 1.0 * lmconsts.v)))),
               6) AS ppl
  FROM tbg d LEFT JOIN trusted_bg b USING (w1, w2)
       LEFT JOIN trusted_uni u USING (w1) CROSS JOIN lmconsts
  GROUP BY 1
), nbtok AS (
  SELECT tok.doc_id, CAST(tok.doc_id % 5 = 0 AS INT) AS y, u.tk AS w
  FROM tok, unnest(tok.toks) AS u(tk)
  WHERE tok.doc_id % 5 <= 1 AND u.tk <> ''
), nbcnt AS (
  SELECT w, sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS c_pos,
         sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS c_neg
  FROM nbtok GROUP BY w
), nbconst AS (
  SELECT sum(c_pos) AS np, sum(c_neg) AS nn, count(*) AS v FROM nbcnt
), nbprior AS (
  SELECT ln(count(*) FILTER (WHERE doc_id % 5 = 0))
         - ln(count(*) FILTER (WHERE doc_id % 5 = 1)) AS pri
  FROM documents WHERE doc_id % 5 <= 1
), nbdoctok AS (
  SELECT tok.doc_id, u.tk AS w
  FROM tok, unnest(tok.toks) AS u(tk) WHERE u.tk <> ''
), nbscore AS (
  SELECT d.doc_id,
         sum(ln(coalesce(c.c_pos, 0) + 1.0) - ln(np + 1.0 * v)
             - ln(coalesce(c.c_neg, 0) + 1.0) + ln(nn + 1.0 * v)) AS s
  FROM nbdoctok d LEFT JOIN nbcnt c USING (w) CROSS JOIN nbconst
  GROUP BY 1
)
SELECT lang.doc_id, n_tokens, n_tokens_bpe,
       CASE WHEN cjk * 3 > n_chars THEN 'zh'
            WHEN mx > 0 THEN (CASE WHEN h_fr = mx THEN 'fr'
                                   WHEN h_es = mx THEN 'es'
                                   WHEN h_en = mx THEN 'en'
                                   ELSE 'de' END)
            ELSE 'unknown' END AS lang_pred,
       round(CASE WHEN blank THEN 0.0 ELSE
           (CASE WHEN n_chars BETWEEN 30 AND 100000 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN (norm_chars - sz + 1.0)/sz BETWEEN 2.0 AND 12.0
                 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN sw_any > 0 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN syms * 1.0 / greatest(n_chars, 1) < 0.2
                 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN (sz - dist_toks) * 1.0 / greatest(sz, 1) < 0.3
                 THEN 0.2 ELSE 0.0 END)
         END, 6) AS quality,
       md5(array_to_string(toks, ' ')) AS fingerprint_md5,
       len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS pii_email_cnt,
       len(regexp_extract_all(text,
         '\b(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b')) AS pii_ipv4_cnt,
       round(CASE WHEN len(ls) = 0 THEN 0.0
             ELSE (len(ls) - len(list_distinct(ls))) * 1.0 / len(ls)
             END, 6) AS dup_line_frac,
       CAST(contam.doc_id IS NOT NULL AS BIGINT) AS contaminated,
       ppl.ppl AS ppl,
       round(coalesce(nbscore.s, 0.0) + (SELECT pri FROM nbprior), 6)
         AS nb_logodds
FROM lang
JOIN lines ON lang.doc_id = lines.doc_id
LEFT JOIN contam ON lang.doc_id = contam.doc_id
LEFT JOIN ppl ON lang.doc_id = ppl.doc_id
LEFT JOIN nbscore ON lang.doc_id = nbscore.doc_id
"""


# ---------------------------------------------------------------------------
# DML / uplift / logistic
# ---------------------------------------------------------------------------


def q_linear_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML family with deterministic folds (l_orderkey % 3): constant-effect
    LinearDML plus intercept-only NonParamDML (the weighted moment
    Σ(t̃·ỹ)/Σt̃² over |t̃|>1e-12 rows) — both re-derived by DuckDB from the
    same out-of-fold regr_* residualization."""
    from fast_causal_inference_spark.operators.dml import (
        linear_dml,
        non_param_dml,
    )

    from fast_causal_inference_spark.operators.dml import linear_dml_grouped

    li = _load(spark, sf_dir, "lineitem")
    lin, npm, grp = _concurrent([
        lambda: linear_dml(li, "l_extendedprice", "l_quantity",
                           ["l_discount"], cv=3, fold_expr="l_orderkey"),
        lambda: non_param_dml(li, "l_extendedprice", "l_quantity",
                              ["l_discount"], cv=3, fold_expr="l_orderkey"),
        lambda: linear_dml_grouped(li, "l_extendedprice", "l_quantity",
                                   ["l_discount"], ["l_returnflag"], cv=3,
                                   fold_expr="l_orderkey"),
    ])
    rows = [("linear", round(float(lin.theta[0]), 6)),
            ("nonparam", round(float(npm.theta[0]), 6))]
    rows += [(f"grouped_{r.l_returnflag}", round(float(r.theta), 6))
             for r in grp.itertuples()]
    return spark.createDataFrame(rows, "variant string, theta double")


_LINEAR_DML_SQL = """
WITH base AS (
  SELECT l_orderkey % 3 AS fold, l_extendedprice AS y,
         l_quantity AS t, l_discount AS x
  FROM lineitem
), folds AS (SELECT DISTINCT fold FROM base),
fy AS (
  SELECT f.fold,
         (SELECT regr_slope(y, x) FROM base b WHERE b.fold <> f.fold) AS s,
         (SELECT regr_intercept(y, x) FROM base b WHERE b.fold <> f.fold) AS i
  FROM folds f
), ft AS (
  SELECT f.fold,
         (SELECT regr_slope(t, x) FROM base b WHERE b.fold <> f.fold) AS s,
         (SELECT regr_intercept(t, x) FROM base b WHERE b.fold <> f.fold) AS i
  FROM folds f
), resid AS (
  SELECT b.y - (fy.i + fy.s * b.x) AS ry, b.t - (ft.i + ft.s * b.x) AS rt
  FROM base b JOIN fy ON b.fold = fy.fold JOIN ft ON b.fold = ft.fold
)
SELECT 'linear' AS variant,
       round(covar_samp(ry, rt) / var_samp(rt), 6) AS theta FROM resid
UNION ALL
SELECT 'nonparam',
       round(sum(rt * ry) / sum(rt * rt), 6)
FROM resid WHERE abs(rt) > 1e-12
UNION ALL
SELECT 'grouped_' || seg, round(theta, 6) FROM (
  WITH gbase AS (
    SELECT l_returnflag AS seg, l_orderkey % 3 AS fold,
           l_extendedprice AS y, l_quantity AS t, l_discount AS x
    FROM lineitem
  ), gcells AS (SELECT DISTINCT seg, fold FROM gbase),
  gfy AS (
    SELECT c.seg, c.fold,
           (SELECT regr_slope(y, x) FROM gbase b
            WHERE b.seg = c.seg AND b.fold <> c.fold) AS s,
           (SELECT regr_intercept(y, x) FROM gbase b
            WHERE b.seg = c.seg AND b.fold <> c.fold) AS i
    FROM gcells c
  ), gft AS (
    SELECT c.seg, c.fold,
           (SELECT regr_slope(t, x) FROM gbase b
            WHERE b.seg = c.seg AND b.fold <> c.fold) AS s,
           (SELECT regr_intercept(t, x) FROM gbase b
            WHERE b.seg = c.seg AND b.fold <> c.fold) AS i
    FROM gcells c
  ), gresid AS (
    SELECT b.seg, b.y - (gfy.i + gfy.s * b.x) AS ry,
           b.t - (gft.i + gft.s * b.x) AS rt
    FROM gbase b
    JOIN gfy ON b.seg = gfy.seg AND b.fold = gfy.fold
    JOIN gft ON b.seg = gft.seg AND b.fold = gft.fold
  )
  SELECT seg, regr_slope(ry, rt) AS theta FROM gresid GROUP BY seg
)
"""


def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed rank-formula ROC-AUC of value scoring user-parity labels."""
    from fast_causal_inference_spark.operators.logistic import auc

    ev = _load(spark, sf_dir, "events") \
        .withColumn("label", (F.col("user_id") % 2).cast("int"))
    val = auc(ev, "value", "label")
    return spark.createDataFrame([(round(val, 6),)], "auc double")


_AUC_SQL = """
WITH s AS (
  SELECT value AS v, CAST(user_id % 2 = 1 AS INT) AS g FROM events
), w AS (
  SELECT g, rank() OVER (ORDER BY v) AS rnk,
         count(*) OVER (PARTITION BY v) AS t
  FROM s
), agg AS (
  SELECT sum(CASE WHEN g = 1 THEN rnk + (t - 1)/2.0 END) AS r1,
         CAST(sum(g) AS DOUBLE) AS n1, CAST(count(*) AS DOUBLE) AS n
  FROM w
)
SELECT round((r1 - n1*(n1+1)/2.0) / ((n - n1) * n1), 6) AS auc FROM agg
"""


def q_lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative uplift lift/gain over 10 ITE-ranked buckets."""
    from fast_causal_inference_spark.uplift.evaluation import get_lift_gain

    ev = _load(spark, sf_dir, "events") \
        .withColumn("t", (F.col("user_id") % 2).cast("int")) \
        .withColumn("ite_hat", (F.col("event_id") % 100) / 100.0)
    pdf = get_lift_gain(ev, "ite_hat", "value", "t", k=10,
                        tiebreak="event_id")
    for c in ["ratio", "ite_avg", "lift", "gain", "ate_baseline",
              "random_gain"]:
        pdf[c] = pdf[c].round(6)
    return spark.createDataFrame(pdf)


_LIFT_GAIN_SQL = """
WITH s AS (
  SELECT (event_id % 100)/100.0 AS ite, value AS y,
         CAST(user_id % 2 AS INT) AS t, event_id
  FROM events
), b AS (
  SELECT *, ntile(10) OVER (ORDER BY ite DESC, event_id) AS bucket FROM s
), a AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) AS n, CAST(sum(t) AS DOUBLE) AS n1,
         sum(CASE WHEN t = 1 THEN y END) AS y1,
         sum(CASE WHEN t = 0 THEN y END) AS y0,
         avg(ite) AS ite_avg
  FROM b GROUP BY bucket
), tot AS (
  SELECT sum(n) AS tn,
         sum(y1)/sum(n1) - sum(y0)/sum(n - n1) AS ate
  FROM a
), c AS (
  SELECT bucket, ite_avg,
         sum(n) OVER w AS cn, sum(n1) OVER w AS cn1,
         sum(n - n1) OVER w AS cn0,
         sum(y1) OVER w AS cy1, sum(y0) OVER w AS cy0
  FROM a WINDOW w AS (ORDER BY bucket)
)
SELECT bucket,
       round(cn/(SELECT tn FROM tot), 6) AS ratio,
       round(ite_avg, 6) AS ite_avg,
       round(cy1/cn1 - cy0/cn0, 6) AS lift,
       round((cy1/cn1 - cy0/cn0)*cn/(SELECT tn FROM tot), 6) AS gain,
       round((SELECT ate FROM tot), 6) AS ate_baseline,
       round((SELECT ate FROM tot)*cn/(SELECT tn FROM tot), 6) AS random_gain
FROM c
"""


def _roi_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared uplift-economics frame: deterministic ntile(4) score buckets
    (higher bucket = higher score; event_id tiebreak so Spark and DuckDB
    agree exactly).  The global ntile window is gate-only — the production
    path is assign_score_buckets' sketch bucketing."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("treatment"),
        F.col("value").alias("outcome"),
        F.abs(F.col("value")).alias("revenue"),
        (F.abs(F.col("value")) * 0.2 + 0.01).alias("cost"),
        ((F.col("event_id") % 100) / 100.0).alias("score"),
        F.col("event_id"))
    w = Window.orderBy(F.desc("score"), F.col("event_id"))
    return ev.withColumn(
        "bucket", (F.lit(5) - F.ntile(4).over(w)).cast("double"))


def q_lift_gain_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-economics family: lift/gain curve plus the ROI evaluation
    suite (population ATE/ROI/iROI, per-bucket CATE, cumulative CATE lift,
    Qini curve with AUUC / Qini coefficient) in long format."""
    from fast_causal_inference_spark.uplift.roi import (
        compute_auuc,
        compute_qini_coefficient,
        estimate_cate_lift,
        estimate_cate_per_bucket,
        estimate_economics,
        estimate_qini,
    )

    b = _roi_frame(spark, sf_dir)
    b.persist()
    try:
        (lift, econ, cate, cum, qini) = _concurrent([
            lambda: q_lift_gain(spark, sf_dir).toPandas(),
            lambda: estimate_economics(b),      # ate+roi+iroi in ONE scan
            lambda: estimate_cate_per_bucket(b.drop("threshold", "score"),
                                             "bucket"),
            lambda: estimate_cate_lift(b, bucket_colname="bucket"),
            lambda: estimate_qini(b.drop("score"), bucket_colname="bucket"),
        ])
    finally:
        b.unpersist()
    rows = []
    for r in lift.itertuples():
        for stat in ("ratio", "ite_avg", "lift", "gain", "ate_baseline",
                     "random_gain"):
            rows.append({"variant": "lift_gain", "item": str(int(r.bucket)),
                         "stat": stat, "value": float(getattr(r, stat))})
    for stat in ("ate", "target_rate_treated", "target_rate_control"):
        rows.append({"variant": "ate", "item": "all", "stat": stat,
                     "value": float(econ[stat].iloc[0])})
    for stat in ("tot_benefit", "tot_cost", "roi"):
        rows.append({"variant": "roi", "item": "all", "stat": stat,
                     "value": float(econ[stat].iloc[0])})
    for stat in ("treatment_count", "control_count", "incremental_benefit",
                 "incremental_cost", "iroi"):
        rows.append({"variant": "iroi", "item": "all", "stat": stat,
                     "value": float(econ[stat].iloc[0])})
    for r in cate.itertuples():
        for stat in ("ate", "fraction"):
            rows.append({"variant": "cate_bucket", "item": str(int(r.bucket)),
                         "stat": stat, "value": float(getattr(r, stat))})
    for r in cum.itertuples():
        for stat in ("cum_cate", "fraction"):
            rows.append({"variant": "cum_cate", "item": str(int(r.bucket)),
                         "stat": stat, "value": float(getattr(r, stat))})
    for r in qini.itertuples():
        if not (r.bucket == r.bucket):          # skip the (0,0) anchor row
            continue
        rows.append({"variant": "qini", "item": str(int(r.bucket)),
                     "stat": "qini", "value": float(r.ate)})
    rows.append({"variant": "qini_scores", "item": "all", "stat": "auuc",
                 "value": compute_auuc(qini)})
    rows.append({"variant": "qini_scores", "item": "all",
                 "stat": "qini_coefficient",
                 "value": compute_qini_coefficient(qini)})
    return _long_rows(spark, rows)


# shared DuckDB scaffolding for the uplift-economics family: identical
# ntile(4) buckets (bucket 4 = top score quartile), per-bucket sufficient
# sums, cumulative (descending-bucket) sums
_ROI_BASE_SQL = """
base AS (
  SELECT CAST(user_id % 2 AS INT) AS t, value AS y,
         abs(value) AS rev, abs(value)*0.2 + 0.01 AS cost,
         (event_id % 100)/100.0 AS score, event_id
  FROM events
), rb AS (
  SELECT *, 5 - ntile(4) OVER (ORDER BY score DESC, event_id) AS bucket
  FROM base
), ra AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(t) AS DOUBLE) AS n1, CAST(sum(1 - t) AS DOUBLE) AS n0,
         sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS y1,
         sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS y0,
         sum(CASE WHEN t = 1 THEN rev ELSE 0 END) AS rev1,
         sum(CASE WHEN t = 0 THEN rev ELSE 0 END) AS rev0,
         sum(CASE WHEN t = 1 THEN cost ELSE 0 END) AS cost1,
         sum(CASE WHEN t = 0 THEN cost ELSE 0 END) AS cost0
  FROM rb GROUP BY bucket
), rtot AS (SELECT sum(n) AS tn FROM ra),
rc AS (
  SELECT bucket,
         sum(n) OVER w AS cn, sum(n1) OVER w AS cn1, sum(n0) OVER w AS cn0,
         sum(y1) OVER w AS cy1, sum(y0) OVER w AS cy0
  FROM ra WINDOW w AS (ORDER BY bucket DESC)
),
qpts AS (
  SELECT bucket, cn/(SELECT tn FROM rtot) AS frac,
         (cy1/cn1 - cy0/cn0) * cn/(SELECT tn FROM rtot) AS qini
  FROM rc
),
qcurve AS (
  SELECT * FROM qpts
  UNION ALL SELECT NULL, 0.0, 0.0
),
qarea AS (
  SELECT sum((frac - pf)*(qini + pq)/2.0) AS auuc,
         max(CASE WHEN frac = 1 THEN qini END) AS last_q
  FROM (SELECT frac, qini,
               lag(frac, 1) OVER (ORDER BY frac) AS pf,
               lag(qini, 1) OVER (ORDER BY frac) AS pq
        FROM qcurve) WHERE pf IS NOT NULL
)
"""

_LIFT_FAMILY_SQL = f"""
WITH lg AS ({_LIFT_GAIN_SQL}), {_ROI_BASE_SQL}
SELECT 'lift_gain' AS variant, CAST(bucket AS VARCHAR) AS item, stat,
       value FROM (
  SELECT bucket, 'ratio' AS stat, ratio AS value FROM lg
  UNION ALL SELECT bucket, 'ite_avg', ite_avg FROM lg
  UNION ALL SELECT bucket, 'lift', lift FROM lg
  UNION ALL SELECT bucket, 'gain', gain FROM lg
  UNION ALL SELECT bucket, 'ate_baseline', ate_baseline FROM lg
  UNION ALL SELECT bucket, 'random_gain', random_gain FROM lg
)
UNION ALL
SELECT 'ate', 'all', s.stat, round(s.value, 6) FROM (
  SELECT 'ate' AS stat, sum(y1)/sum(n1) - sum(y0)/sum(n0) AS value FROM ra
  UNION ALL SELECT 'target_rate_treated', sum(y1)/sum(n1) FROM ra
  UNION ALL SELECT 'target_rate_control', sum(y0)/sum(n0) FROM ra
) s
UNION ALL
SELECT 'roi', 'all', s.stat, round(s.value, 6) FROM (
  SELECT 'tot_benefit' AS stat, sum(rev1) + sum(rev0) AS value FROM ra
  UNION ALL SELECT 'tot_cost', sum(cost1) + sum(cost0) FROM ra
  UNION ALL SELECT 'roi', (sum(rev1)+sum(rev0))/(sum(cost1)+sum(cost0)) FROM ra
) s
UNION ALL
SELECT 'iroi', 'all', s.stat, round(s.value, 6) FROM (
  SELECT 'treatment_count' AS stat, sum(n1) AS value FROM ra
  UNION ALL SELECT 'control_count', sum(n0) FROM ra
  UNION ALL SELECT 'incremental_benefit',
    sum(rev1) - sum(rev0)*sum(n1)/sum(n0) FROM ra
  UNION ALL SELECT 'incremental_cost',
    sum(cost1) - sum(cost0)*sum(n1)/sum(n0) FROM ra
  UNION ALL SELECT 'iroi',
    (sum(rev1) - sum(rev0)*sum(n1)/sum(n0))
    / (sum(cost1) - sum(cost0)*sum(n1)/sum(n0)) FROM ra
) s
UNION ALL
SELECT 'cate_bucket', CAST(bucket AS VARCHAR), s.stat, round(s.value, 6)
FROM ra, LATERAL (
  SELECT 'ate' AS stat, y1/n1 - y0/n0 AS value
  UNION ALL SELECT 'fraction', n/(SELECT tn FROM rtot)
) s
UNION ALL
SELECT 'cum_cate', CAST(bucket AS VARCHAR), s.stat, round(s.value, 6)
FROM rc, LATERAL (
  SELECT 'cum_cate' AS stat, cy1/cn1 - cy0/cn0 AS value
  UNION ALL SELECT 'fraction', cn/(SELECT tn FROM rtot)
) s
UNION ALL
SELECT 'qini', CAST(bucket AS VARCHAR), 'qini', round(qini, 6) FROM qpts
UNION ALL
SELECT 'qini_scores', 'all', 'auuc', round(auuc, 6) FROM qarea
UNION ALL
SELECT 'qini_scores', 'all', 'qini_coefficient',
       round(auuc - last_q/2.0, 6) FROM qarea
"""


def g_glm_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLM rows of the classification/regression-scoring family (golden
    sub-oracle: IRLS is a deterministic iterative solve).  Poisson with
    an exposure offset on a count of events per user, plus gamma on the
    strictly-positive value column; ame_* rows are the response-scale
    average marginal effects (one extra aggregation per model)."""
    from fast_causal_inference_spark.operators.glm import glm

    from fast_causal_inference_spark.operators.glm import (
        negative_binomial_regression,
    )
    from fast_causal_inference_spark.operators.ordinal import ordered_logit

    ev = _load(spark, sf_dir, "events")
    # IRLS re-scans its input every iteration — collapse once, cache the
    # tiny per-user panel (and the filtered gamma input), fit all three
    # families concurrently
    per_user = (ev.groupBy("user_id")
                .agg(F.count(F.lit(1)).cast("double").alias("n_events"),
                     F.avg("value").alias("avg_value"),
                     F.sum(F.greatest(F.col("value"), F.lit(0.0)))
                     .alias("rev"),
                     (F.max("event_id") % 7 + 1.0).alias("expo"))
                .coalesce(1).cache())
    pos = ev.where(F.col("value") > 0) \
        .select("value", "user_id").cache()
    pois, gam, nb, prob, twe, olog = _concurrent([
        lambda: glm(per_user, "n_events ~ avg_value", family="poisson",
                    offset="ln(expo)"),
        lambda: glm(pos, "value ~ (user_id % 5)", family="gamma"),
        lambda: negative_binomial_regression(
            per_user, "n_events ~ avg_value", offset="ln(expo)"),
        # parity outcome: varies and is non-separable at every SF (any
        # threshold on n_events saturates as counts grow with the data)
        lambda: glm(per_user,
                    "cast(n_events % 2 = 0 as double)"
                    " ~ avg_value + (expo / 7)",
                    family="binomial", link="probit"),
        lambda: glm(per_user, "rev ~ avg_value", family="tweedie",
                    var_power=1.5, offset="ln(expo)"),
        lambda: ordered_logit(per_user,
                              "cast(1 + n_events % 3 as int) ~ avg_value"),
    ])
    from fast_causal_inference_spark.operators.margins import (
        average_marginal_effects_joint,
    )

    # both models average over the same per_user frame — ONE fused scan
    # (per-model complete-case masks ride as boolean columns)
    ame_po, ame_pr = average_marginal_effects_joint([pois, prob], per_user)
    per_user.unpersist()
    pos.unpersist()
    rows = []
    for ame, variant in ((ame_po, "ame_poisson"), (ame_pr, "ame_probit")):
        for r in ame.itertuples():
            rows.append({"variant": variant, "item": str(r.name),
                         "stat": "ame", "value": round(float(r.ame), 6)})
            rows.append({"variant": variant, "item": str(r.name),
                         "stat": "se", "value": round(float(r.stderr), 6)})
    for m, variant in ((pois, "glm_poisson"), (gam, "glm_gamma"),
                       (nb, "glm_negbin"), (prob, "glm_probit"),
                       (twe, "glm_tweedie")):
        for name, b, s in zip(m.names, m.beta, m.stderr):
            rows.append({"variant": variant, "item": name, "stat": "beta",
                         "value": round(float(b), 6)})
            rows.append({"variant": variant, "item": name, "stat": "se",
                         "value": round(float(s), 6)})
        rows.append({"variant": variant, "item": "all", "stat": "deviance",
                     "value": round(float(m.deviance), 4)})
        rows.append({"variant": variant, "item": "all",
                     "stat": "dispersion",
                     "value": round(float(m.dispersion), 6)})
    for r in olog.itertuples():
        for stat in ("coef", "stderr"):
            rows.append({"variant": "ordlogit", "item": str(r.name),
                         "stat": stat,
                         "value": round(float(getattr(r, stat)), 6)})
    rows.append({"variant": "ordlogit", "item": "model", "stat": "loglik",
                 "value": round(float(olog.attrs["loglik"]), 4)})
    return _long_rows(spark, rows)


def q_auc_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC family: rank-formula AUC + binned ROC curve at pinned
    thresholds (SQL-re-derived), + Poisson/gamma GLM rows (golden,
    IRLS), long format."""
    from fast_causal_inference_spark.operators.logistic import auc
    from fast_causal_inference_spark.utility import roc_curve

    ev = _load(spark, sf_dir, "events") \
        .withColumn("label", (F.col("user_id") % 2).cast("int"))
    thresholds = [20.0, 40.0, 60.0, 80.0, 100.0]
    val, roc, glm_df = _concurrent([
        lambda: auc(ev, "value", "label"),
        lambda: roc_curve(ev, "label", "value", thresholds=thresholds),
        lambda: g_glm_rows(spark, sf_dir),
    ])
    rows = [{"variant": "auc", "item": "all", "stat": "auc",
             "value": float(val)}]
    for r in roc.itertuples():
        for stat in ("tpr", "fpr", "tp", "fp"):
            rows.append({"variant": "roc",
                         "item": f"{r.threshold:.1f}", "stat": stat,
                         "value": float(getattr(r, stat))})
    return _long_rows(spark, rows).unionByName(glm_df)


_AUC_FAMILY_SQL = f"""
WITH a AS ({_AUC_SQL}),
thr AS (SELECT unnest([20.0, 40.0, 60.0, 80.0, 100.0]) AS threshold),
cnt AS (
  SELECT t.threshold,
         CAST(sum(CASE WHEN user_id % 2 = 1 AND value >= t.threshold
                       THEN 1 ELSE 0 END) AS DOUBLE) AS tp,
         CAST(sum(CASE WHEN user_id % 2 = 0 AND value >= t.threshold
                       THEN 1 ELSE 0 END) AS DOUBLE) AS fp,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS p,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS nn
  FROM events, thr t GROUP BY t.threshold
)
SELECT 'auc' AS variant, 'all' AS item, 'auc' AS stat, auc AS value FROM a
UNION ALL SELECT 'roc', printf('%.1f', threshold), 'tpr',
                 round(tp/p, 6) FROM cnt
UNION ALL SELECT 'roc', printf('%.1f', threshold), 'fpr',
                 round(fp/nn, 6) FROM cnt
UNION ALL SELECT 'roc', printf('%.1f', threshold), 'tp', tp FROM cnt
UNION ALL SELECT 'roc', printf('%.1f', threshold), 'fp', fp FROM cnt
"""


def q_smd(spark: SparkSession, sf_dir: str,
          li: DataFrame | None = None) -> DataFrame:
    """Standardized-mean-difference balance table on lineitem covariates."""
    from fast_causal_inference_spark.operators.matching import smd

    if li is None:
        li = _load(spark, sf_dir, "lineitem") \
            .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
    pdf = smd(li, "arm", ["l_quantity", "l_discount", "l_tax"])
    for c in ["mean0", "mean1", "smd"]:
        pdf[c] = pdf[c].round(6)
    return spark.createDataFrame(pdf)


_SMD_SQL = """
WITH m AS (
  SELECT 'l_quantity' AS covariate,
         avg(l_quantity) FILTER (WHERE l_orderkey % 2 = 0) AS mean0,
         avg(l_quantity) FILTER (WHERE l_orderkey % 2 = 1) AS mean1,
         var_samp(l_quantity) FILTER (WHERE l_orderkey % 2 = 0) AS v0,
         var_samp(l_quantity) FILTER (WHERE l_orderkey % 2 = 1) AS v1
  FROM lineitem
  UNION ALL
  SELECT 'l_discount',
         avg(l_discount) FILTER (WHERE l_orderkey % 2 = 0),
         avg(l_discount) FILTER (WHERE l_orderkey % 2 = 1),
         var_samp(l_discount) FILTER (WHERE l_orderkey % 2 = 0),
         var_samp(l_discount) FILTER (WHERE l_orderkey % 2 = 1)
  FROM lineitem
  UNION ALL
  SELECT 'l_tax',
         avg(l_tax) FILTER (WHERE l_orderkey % 2 = 0),
         avg(l_tax) FILTER (WHERE l_orderkey % 2 = 1),
         var_samp(l_tax) FILTER (WHERE l_orderkey % 2 = 0),
         var_samp(l_tax) FILTER (WHERE l_orderkey % 2 = 1)
  FROM lineitem
)
SELECT covariate, round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
       round((mean1 - mean0)/sqrt((v0 + v1)/2), 6) AS smd
FROM m
"""


def q_group_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cnt, sum, sum2) per treatment × column × value in one melted pass."""
    from fast_causal_inference_spark.operators.groupset import group_set

    li = _load(spark, sf_dir, "lineitem") \
        .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
    out = group_set(li, "l_extendedprice", "arm",
                    ["l_returnflag", "l_linestatus"])
    return out.select("column", "value", F.col("treatment").alias("arm"),
                      F.col("cnt").cast("long").alias("cnt"),
                      F.round("sum", 2).alias("sum"),
                      F.round(F.col("sum2") / F.lit(1e6), 4).alias("sum2_m"))


_GROUP_SET_SQL = """
WITH melted AS (
  SELECT 'l_returnflag' AS "column", l_returnflag AS value,
         CAST(l_orderkey % 2 AS INT) AS arm, l_extendedprice AS y
  FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', l_linestatus, CAST(l_orderkey % 2 AS INT),
         l_extendedprice
  FROM lineitem
)
SELECT "column", value, arm, count(*) AS cnt,
       round(sum(y), 2) AS sum, round(sum(y*y)/1e6, 4) AS sum2_m
FROM melted GROUP BY 1, 2, 3
"""


def q_caliper_matching(spark: SparkSession, sf_dir: str,
                       o: DataFrame | None = None) -> DataFrame:
    """Caliper matching cell accounting (rows-only: pair ids involve rand(),
    but the per-cell matched quota is deterministic and checked here)."""
    from fast_causal_inference_spark.operators.matching import caliper_matching

    if o is None:
        o = _load(spark, sf_dir, "orders") \
            .withColumn("arm", (F.col("o_orderkey") % 2).cast("int"))
    o = o.withColumn("score", F.col("o_totalprice") / 500000.0)
    m = caliper_matching(o, "score", "arm", caliper=0.1)
    return (m.where(F.col("match_index").isNotNull())
             .groupBy(F.floor(F.col("score") / 0.1).alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n_matched"),
                  F.sum("arm").alias("n_treated")))


_CALIPER_SQL = """
WITH b AS (
  SELECT CAST(floor(o_totalprice/500000.0/0.1) AS BIGINT) AS bucket,
         CAST(o_orderkey % 2 AS INT) AS arm
  FROM orders
), q AS (
  SELECT bucket,
         least(sum(arm), sum(1 - arm)) AS quota
  FROM b GROUP BY bucket
)
SELECT bucket, CAST(2*quota AS BIGINT) AS n_matched, CAST(quota AS BIGINT) AS n_treated
FROM q WHERE quota > 0
"""


def q_pearsonr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation with t-statistic per returnflag group."""
    from fast_causal_inference_spark.operators.matrix import pearsonr

    li = _load(spark, sf_dir, "lineitem")
    pdf = pearsonr(li, "l_quantity", "l_extendedprice",
                   group_cols=["l_returnflag"])
    pdf = pdf[["l_returnflag", "r", "n", "t_stat"]]
    pdf["r"] = pdf["r"].round(6)
    pdf["t_stat"] = pdf["t_stat"].round(6)
    return spark.createDataFrame(pdf)


_PEARSONR_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS r,
       count(*) AS n,
       round(corr(l_quantity, l_extendedprice)
             * sqrt((count(*) - 2)
                    / (1 - corr(l_quantity, l_extendedprice)
                         * corr(l_quantity, l_extendedprice))), 6) AS t_stat
FROM lineitem GROUP BY l_returnflag
"""


def q_causal_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honest causal tree leaves (rows-only: greedy split search is
    algorithmic, not SQL-expressible; leaf stats are deterministic)."""
    from fast_causal_inference_spark.uplift.causal_tree import CausalTree

    li = _load(spark, sf_dir, "lineitem") \
        .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
    tree = CausalTree(["l_quantity", "l_discount"], "l_extendedprice", "arm",
                      max_depth=2, min_node_size=100).fit(li)
    pdf = tree.leaves()[["node_id", "depth", "n", "n_treated", "tau"]].copy()
    pdf["tau"] = pdf["tau"].round(6)
    return spark.createDataFrame(pdf)


def q_causal_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal forest feature importance (rows-only: iterative algorithm)."""
    from fast_causal_inference_spark.uplift.causal_forest import CausalForest

    li = _load(spark, sf_dir, "lineitem") \
        .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
    cf = CausalForest(["l_quantity", "l_discount", "l_tax"],
                      "l_extendedprice", "arm", num_trees=4, max_depth=2,
                      min_node_size=50, seed=5).fit(li)
    imp = cf.feature_importance()
    num = [c for c in imp.columns if imp[c].dtype.kind == "f"]
    imp[num] = imp[num].round(6)
    return spark.createDataFrame(imp)


def q_quantile_test_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantileTestBucket arm quantiles (oracle checks the quantile columns;
    bucket-bootstrap SEs/p-values are pytest-covered — hash buckets are not
    oracle-able)."""
    from fast_causal_inference_spark.operators.quantile_test import (
        quantile_test_bucket,
    )

    ev = _load(spark, sf_dir, "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    pdf = quantile_test_bucket(ev, "value", "treatment", "user_id",
                               percentiles=(0.25, 0.5, 0.75), seed=5)
    pdf = pdf[["percentile", "treatment", "quantile_qtb"]].copy()
    pdf["quantile_qtb"] = pdf["quantile_qtb"].round(6)
    return spark.createDataFrame(pdf)


_QTB_SQL = """
WITH q AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS treatment,
         quantile_cont(value, 0.25) AS q25,
         quantile_cont(value, 0.50) AS q50,
         quantile_cont(value, 0.75) AS q75
  FROM events GROUP BY user_id % 2
)
SELECT CAST(0.25 AS DOUBLE) AS percentile, treatment,
       round(q25, 6) AS quantile_qtb FROM q
UNION ALL
SELECT CAST(0.50 AS DOUBLE) AS percentile, treatment,
       round(q50, 6) AS quantile_qtb FROM q
UNION ALL
SELECT CAST(0.75 AS DOUBLE) AS percentile, treatment,
       round(q75, 6) AS quantile_qtb FROM q
"""


# ---------------------------------------------------------------------------
# merged gate families — the round driver records correctness rows for at
# most 50 queries() entries (r2: 57 entries -> exactly the first 50 got rows),
# so closely-related variants are gated as ONE multi-row family query with a
# `variant` column and a UNION ALL oracle.  Coverage is unchanged: every
# operator still has a gated row, it just shares a key with its siblings.
# The dict below holds EXACTLY 50 keys — there is NO headroom; any new gate
# must merge into an existing family (or absorb another key) or the entries
# past #50 silently lose their correctness rows.
# ---------------------------------------------------------------------------

_T2_FAMILY_COLS = ["n0", "n1", "mean0", "mean1", "estimate", "stderr",
                   "t_stat"]


def q_ttest_2samp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All seven two-sample test variants as one family: delta-method
    t-test, CUPED, cross-fitted CUPAC, post-stratified, Welch, pooled
    Student, known-variance z — the oracle re-derives CUPAC's three
    per-fold control-only regressions, the fold-dispatched predictions,
    and the CUPED adjustment end-to-end in SQL."""
    import pandas as pd

    from fast_causal_inference_spark.operators.ttest import (
        cluster_ttest_2samp,
        cupac_ttest_2samp,
        edgeworth_components,
        equivalence_ttest_2samp,
        mean_z_test,
        student_ttest,
        ttest_2samp,
        welch_ttest,
        winsorized_ttest_2samp,
    )

    ev = _load(spark, sf_dir, "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    li = _load(spark, sf_dir, "lineitem") \
        .withColumn("treatment", (F.col("l_orderkey") % 2).cast("int"))
    o = _load(spark, sf_dir, "orders") \
        .withColumn("arm", (F.col("o_orderkey") % 2).cast("int"))
    parts = [
        ("plain", lambda: ttest_2samp(ev, "avg(value)", "treatment")),
        ("cuped", lambda: ttest_2samp(li, "avg(l_extendedprice)",
                                      "treatment", X="avg(l_quantity)")),
        ("cupac", lambda: cupac_ttest_2samp(li, "l_extendedprice",
                                            "treatment", ["l_quantity"],
                                            cv=3, fold_expr="l_orderkey")),
        ("pse", lambda: ttest_2samp(li, "avg(l_extendedprice)", "treatment",
                                    pse="l_linestatus")),
        ("welch", lambda: welch_ttest(o, "o_totalprice", "arm")),
        ("student", lambda: student_ttest(ev, "value", "treatment")),
        ("mean_z", lambda: mean_z_test(ev, "value", "treatment",
                                       900.0, 900.0)),
        # cluster-randomized: clusters user_id%101, arm constant per
        # cluster — the variance unit is the cluster total
        ("cluster", lambda: cluster_ttest_2samp(
            ev.withColumn("cl", F.col("user_id") % 101)
              .withColumn("carm", (F.col("cl") % 2).cast("int")),
            "avg(value)", "carm", "cl")),
        # winsorized: pooled [5%, 95%] caps over the two arms, then the
        # plain delta-method test on the capped metric — the oracle
        # re-derives the caps with quantile_disc (approxQuantile at
        # rel_err 1e-6 returns the same order statistic)
        ("winsorized", lambda: winsorized_ttest_2samp(
            ev, "value", "treatment", 0.05, 0.95, relative_error=1e-6)),
        # TOST equivalence at margin 5: the family's t_stat column holds
        # the TOST statistic min(z_lower, -z_upper) (the z whose one-sided
        # p is the max — the reported p_equiv's inverse image)
        ("tost", lambda: equivalence_ttest_2samp(
            ev, "avg(value)", "treatment", margin=5.0)
            .withColumn("t_stat",
                        F.least(F.col("z_lower"), -F.col("z_upper")))),
        # Edgeworth one-sided correction (r10 verdict ask): the row
        # value-checks the third-moment pass as arithmetic — per-arm
        # influence skewness ride mean0/mean1, gamma_eff rides estimate,
        # and the polynomial term gamma*(2t^2+1)/6 rides t_stat; only
        # the Phi/phi evaluation stays driver-side (pinned by the MC
        # suite in tests/test_edgeworth.py)
        ("edgeworth", lambda: edgeworth_components(
            ev, "avg(value)", "treatment", alternative="greater")
            .select("n0", "n1",
                    F.col("skew0").alias("mean0"),
                    F.col("skew1").alias("mean1"),
                    F.col("gamma_eff").alias("estimate"), "stderr",
                    F.col("poly_term").alias("t_stat"))),
    ]

    def _run(name, build):
        pdf = build().select(*_T2_FAMILY_COLS).toPandas()
        pdf.insert(0, "variant", name)
        return pdf

    def _scorecard():
        # experiment scorecard: per-metric rows are definitionally the
        # ttest_2samp result (same suffstats core), so the family gate
        # value-checks both the shared-base multi-metric parse and the
        # ratio delta-method path; the BH adjustment column is
        # pytest-covered (p-values are not oracle-checkable)
        from fast_causal_inference_spark.operators.scorecard import (
            experiment_scorecard,
        )

        pdf = experiment_scorecard(
            ev, {"v": "avg(value)",
                 "r": "avg(value)/avg(1 + user_id % 3)"},
            "treatment", adjust="bh")
        out = pdf[_T2_FAMILY_COLS].copy()
        out.insert(0, "variant", "scorecard_" + pdf["metric"])
        return out

    pdfs = _concurrent([
        lambda n=name, b=build: _run(n, b) for name, build in parts]
        + [_scorecard])
    merged = spark.createDataFrame(pd.concat(pdfs, ignore_index=True))
    return _round_all(merged, ["variant"], _T2_FAMILY_COLS, 6)


_TTEST_FAMILY_SQL = """
WITH ev_arms AS (
  SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS n1,
         avg(value) FILTER (WHERE user_id % 2 = 0) AS m0,
         avg(value) FILTER (WHERE user_id % 2 = 1) AS m1,
         var_samp(value) FILTER (WHERE user_id % 2 = 0) AS v0,
         var_samp(value) FILTER (WHERE user_id % 2 = 1) AS v1
  FROM events
), cuped_pool AS (
  SELECT covar_samp(l_extendedprice, l_quantity) / var_samp(l_quantity) AS theta,
         avg(l_quantity) AS x_pool
  FROM lineitem
), cuped_arms AS (
  SELECT l_orderkey % 2 AS arm, CAST(count(*) AS DOUBLE) AS n,
         avg(l_extendedprice) AS my, avg(l_quantity) AS mx,
         var_samp(l_extendedprice) AS vy, var_samp(l_quantity) AS vx,
         covar_samp(l_extendedprice, l_quantity) AS cxy
  FROM lineitem GROUP BY 1
), cuped_adj AS (
  SELECT arm, n,
         my - (SELECT theta FROM cuped_pool) * (mx - (SELECT x_pool FROM cuped_pool)) AS mean_adj,
         (vy + (SELECT theta FROM cuped_pool)*(SELECT theta FROM cuped_pool)*vx
             - 2*(SELECT theta FROM cuped_pool)*cxy) / n AS var_adj
  FROM cuped_arms
), cupac_base AS (
  SELECT l_extendedprice AS y, l_quantity AS x,
         l_orderkey % 3 AS fold, l_orderkey % 2 AS arm
  FROM lineitem
), cupac_fits AS (
  SELECT f.k,
         covar_samp(y, x)/var_samp(x) AS b,
         avg(y) - covar_samp(y, x)/var_samp(x)*avg(x) AS a
  FROM cupac_base, (SELECT unnest([0, 1, 2]) AS k) f
  WHERE fold != f.k AND arm = 0
  GROUP BY f.k
), cupac_pred AS (
  SELECT l.arm, l.y, ff.a + ff.b*l.x AS p
  FROM cupac_base l JOIN cupac_fits ff ON l.fold = ff.k
), cupac_pool AS (
  SELECT covar_samp(y, p)/var_samp(p) AS theta, avg(p) AS p_pool
  FROM cupac_pred
), cupac_arms AS (
  SELECT arm, CAST(count(*) AS DOUBLE) AS n, avg(y) AS my, avg(p) AS mp,
         var_samp(y) AS vy, var_samp(p) AS vp, covar_samp(y, p) AS cyp
  FROM cupac_pred GROUP BY 1
), cupac_adj AS (
  SELECT arm, n,
         my - (SELECT theta FROM cupac_pool)
              * (mp - (SELECT p_pool FROM cupac_pool)) AS mean_adj,
         (vy + (SELECT theta FROM cupac_pool)*(SELECT theta FROM cupac_pool)*vp
             - 2*(SELECT theta FROM cupac_pool)*cyp) / n AS var_adj
  FROM cupac_arms
), pse_cells AS (
  SELECT l_linestatus AS s, l_orderkey % 2 AS arm,
         CAST(count(*) AS DOUBLE) AS n, avg(l_extendedprice) AS m,
         var_samp(l_extendedprice) AS v
  FROM lineitem GROUP BY 1, 2
), pse_strata AS (
  SELECT a0.s, a0.n AS n0, a1.n AS n1, a0.m AS m0, a1.m AS m1,
         a0.v AS v0, a1.v AS v1
  FROM (SELECT * FROM pse_cells WHERE arm = 0) a0
  JOIN (SELECT * FROM pse_cells WHERE arm = 1) a1 USING (s)
  WHERE a0.n > 1 AND a1.n > 1
), pse_tot AS (SELECT sum(n0 + n1) AS n FROM pse_strata),
pse_f AS (
  SELECT sum(n0) AS n0, sum(n1) AS n1,
         sum((n0 + n1) * m0) / (SELECT n FROM pse_tot) AS mean0,
         sum((n0 + n1) * m1) / (SELECT n FROM pse_tot) AS mean1,
         sum((n0 + n1) * (n0 + n1) * (v0 / n0))
           / ((SELECT n FROM pse_tot) * (SELECT n FROM pse_tot)) AS var0,
         sum((n0 + n1) * (n0 + n1) * (v1 / n1))
           / ((SELECT n FROM pse_tot) * (SELECT n FROM pse_tot)) AS var1
  FROM pse_strata
), o_arms AS (
  SELECT CAST(count(*) FILTER (WHERE o_orderkey % 2 = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (WHERE o_orderkey % 2 = 1) AS DOUBLE) AS n1,
         avg(o_totalprice) FILTER (WHERE o_orderkey % 2 = 0) AS m0,
         avg(o_totalprice) FILTER (WHERE o_orderkey % 2 = 1) AS m1,
         var_samp(o_totalprice) FILTER (WHERE o_orderkey % 2 = 0) AS v0,
         var_samp(o_totalprice) FILTER (WHERE o_orderkey % 2 = 1) AS v1
  FROM orders
), cl_totals AS (
  SELECT user_id % 101 AS cl, CAST((user_id % 101) % 2 AS INT) AS arm,
         sum(value) AS s, CAST(count(*) AS DOUBLE) AS m
  FROM events GROUP BY 1, 2
), cl_arms AS (
  SELECT arm, CAST(count(*) AS DOUBLE) AS n, avg(s) AS ms, avg(m) AS mm,
         var_samp(s) AS vs, var_samp(m) AS vm, covar_samp(s, m) AS c
  FROM cl_totals GROUP BY arm
), cl_stats AS (
  SELECT arm, n, ms/mm AS r,
         (vs - 2*(ms/mm)*c + (ms/mm)*(ms/mm)*vm)/(mm*mm)/n AS v
  FROM cl_arms
), win_caps AS (
  SELECT quantile_disc(value, 0.05) AS lo, quantile_disc(value, 0.95) AS hi
  FROM events
), win_clip AS (
  SELECT user_id % 2 AS arm, least(greatest(value, lo), hi) AS v
  FROM events, win_caps WHERE value IS NOT NULL
), win_arms AS (
  SELECT CAST(count(*) FILTER (arm = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (arm = 1) AS DOUBLE) AS n1,
         avg(v) FILTER (arm = 0) AS m0, avg(v) FILTER (arm = 1) AS m1,
         var_samp(v) FILTER (arm = 0) AS v0,
         var_samp(v) FILTER (arm = 1) AS v1
  FROM win_clip
), sc_cells AS (
  SELECT CAST(user_id % 2 AS INT) AS arm, CAST(count(*) AS DOUBLE) AS n,
         avg(value) AS m1, avg(1 + user_id % 3) AS m2,
         var_samp(value) AS v11, var_samp(1 + user_id % 3) AS v22,
         covar_samp(value, 1 + user_id % 3) AS v12
  FROM events GROUP BY 1
), sc_stats AS (
  SELECT arm, n, m1/m2 AS r,
         ((1/m2)*(1/m2)*v11 + 2*(1/m2)*(-m1/(m2*m2))*v12
          + (m1/(m2*m2))*(m1/(m2*m2))*v22)/n AS v
  FROM sc_cells
), ew_arms AS (
  -- Edgeworth third-moment pass: per-arm POPULATION mu3/var of the
  -- influence value (= value - arm mean for a plain avg metric) via
  -- raw moments: mu3 = E[x^3] - 3 m E[x^2] + 2 m^3
  SELECT CAST(user_id % 2 AS INT) AS arm,
         CAST(count(value) AS DOUBLE) AS n,
         avg(value) AS m, var_samp(value) AS v,
         avg(value*value) - avg(value)*avg(value) AS varp,
         avg(value*value*value) - 3*avg(value)*avg(value*value)
           + 2*avg(value)*avg(value)*avg(value) AS mu3
  FROM events GROUP BY 1
), ew AS (
  SELECT a0.n AS n0, a1.n AS n1,
         a0.mu3/pow(a0.varp, 1.5) AS skew0,
         a1.mu3/pow(a1.varp, 1.5) AS skew1,
         sqrt(a0.v/a0.n + a1.v/a1.n) AS se,
         (a1.m - a0.m)/sqrt(a0.v/a0.n + a1.v/a1.n) AS t,
         (a1.mu3/(a1.n*a1.n) - a0.mu3/(a0.n*a0.n))
           / pow(sqrt(a0.v/a0.n + a1.v/a1.n), 3) AS gam
  FROM (SELECT * FROM ew_arms WHERE arm = 0) a0,
       (SELECT * FROM ew_arms WHERE arm = 1) a1
)
SELECT 'plain' AS variant, round(n0, 6) AS n0, round(n1, 6) AS n1,
       round(m0, 6) AS mean0, round(m1, 6) AS mean1,
       round(m1 - m0, 6) AS estimate,
       round(sqrt(v0/n0 + v1/n1), 6) AS stderr,
       round((m1 - m0)/sqrt(v0/n0 + v1/n1), 6) AS t_stat
FROM ev_arms
UNION ALL
SELECT 'scorecard_v', round(n0, 6), round(n1, 6),
       round(m0, 6), round(m1, 6), round(m1 - m0, 6),
       round(sqrt(v0/n0 + v1/n1), 6),
       round((m1 - m0)/sqrt(v0/n0 + v1/n1), 6)
FROM ev_arms
UNION ALL
SELECT 'scorecard_r', round(a0.n, 6), round(a1.n, 6),
       round(a0.r, 6), round(a1.r, 6), round(a1.r - a0.r, 6),
       round(sqrt(a0.v + a1.v), 6),
       round((a1.r - a0.r)/sqrt(a0.v + a1.v), 6)
FROM (SELECT * FROM sc_stats WHERE arm = 0) a0,
     (SELECT * FROM sc_stats WHERE arm = 1) a1
UNION ALL
SELECT 'cuped', round(a0.n, 6), round(a1.n, 6),
       round(a0.mean_adj, 6), round(a1.mean_adj, 6),
       round(a1.mean_adj - a0.mean_adj, 6),
       round(sqrt(a0.var_adj + a1.var_adj), 6),
       round((a1.mean_adj - a0.mean_adj)/sqrt(a0.var_adj + a1.var_adj), 6)
FROM (SELECT * FROM cuped_adj WHERE arm = 0) a0,
     (SELECT * FROM cuped_adj WHERE arm = 1) a1
UNION ALL
SELECT 'cupac', round(a0.n, 6), round(a1.n, 6),
       round(a0.mean_adj, 6), round(a1.mean_adj, 6),
       round(a1.mean_adj - a0.mean_adj, 6),
       round(sqrt(a0.var_adj + a1.var_adj), 6),
       round((a1.mean_adj - a0.mean_adj)/sqrt(a0.var_adj + a1.var_adj), 6)
FROM (SELECT * FROM cupac_adj WHERE arm = 0) a0,
     (SELECT * FROM cupac_adj WHERE arm = 1) a1
UNION ALL
SELECT 'pse', round(n0, 6), round(n1, 6), round(mean0, 6), round(mean1, 6),
       round(mean1 - mean0, 6), round(sqrt(var0 + var1), 6),
       round((mean1 - mean0)/sqrt(var0 + var1), 6)
FROM pse_f
UNION ALL
SELECT 'welch', round(n0, 6), round(n1, 6), round(m0, 6), round(m1, 6),
       round(m1 - m0, 6), round(sqrt(v0/n0 + v1/n1), 6),
       round((m1 - m0)/sqrt(v0/n0 + v1/n1), 6)
FROM o_arms
UNION ALL
SELECT 'student', round(n0, 6), round(n1, 6), round(m0, 6), round(m1, 6),
       round(m1 - m0, 6),
       round(sqrt(((n0-1)*v0 + (n1-1)*v1)/(n0+n1-2) * (1/n0 + 1/n1)), 6),
       round((m1 - m0)/sqrt(((n0-1)*v0 + (n1-1)*v1)/(n0+n1-2) * (1/n0 + 1/n1)), 6)
FROM ev_arms
UNION ALL
SELECT 'mean_z', round(n0, 6), round(n1, 6), round(m0, 6), round(m1, 6),
       round(m1 - m0, 6), round(sqrt(900.0/n0 + 900.0/n1), 6),
       round((m1 - m0)/sqrt(900.0/n0 + 900.0/n1), 6)
FROM ev_arms
UNION ALL
SELECT 'cluster', round(c0.n, 6), round(c1.n, 6),
       round(c0.r, 6), round(c1.r, 6), round(c1.r - c0.r, 6),
       round(sqrt(c0.v + c1.v), 6),
       round((c1.r - c0.r)/sqrt(c0.v + c1.v), 6)
FROM (SELECT * FROM cl_stats WHERE arm = 0) c0,
     (SELECT * FROM cl_stats WHERE arm = 1) c1
UNION ALL
SELECT 'winsorized', round(n0, 6), round(n1, 6), round(m0, 6), round(m1, 6),
       round(m1 - m0, 6), round(sqrt(v0/n0 + v1/n1), 6),
       round((m1 - m0)/sqrt(v0/n0 + v1/n1), 6)
FROM win_arms
UNION ALL
SELECT 'tost', round(n0, 6), round(n1, 6), round(m0, 6), round(m1, 6),
       round(m1 - m0, 6), round(sqrt(v0/n0 + v1/n1), 6),
       round(least((m1 - m0 + 5.0)/sqrt(v0/n0 + v1/n1),
                   -((m1 - m0 - 5.0)/sqrt(v0/n0 + v1/n1))), 6)
FROM ev_arms
UNION ALL
SELECT 'edgeworth', round(n0, 6), round(n1, 6),
       round(skew0, 6), round(skew1, 6), round(gam, 6),
       round(se, 6), round(gam*(2*t*t + 1)/6, 6)
FROM ew
"""


def q_ttest_1samp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample t-test family: ratio metric vs mu, and CUPED-adjusted."""
    import pandas as pd

    from fast_causal_inference_spark.operators.ttest import ttest_1samp

    ev = _load(spark, sf_dir, "events")
    li = _load(spark, sf_dir, "lineitem")
    cols = ["n", "mean", "estimate", "stderr", "t_stat"]
    parts = [
        ("plain", lambda: ttest_1samp(
            ev, "avg(value)/avg(1 + event_id % 7)", mu=10.0)),
        ("cuped", lambda: ttest_1samp(li, "avg(l_extendedprice)",
                                      mu=50000.0, X="avg(l_quantity)")),
    ]

    def _run(name, build):
        pdf = build().select(*cols).toPandas()
        pdf.insert(0, "variant", name)
        return pdf

    pdfs = _concurrent([
        lambda n=name, b=build: _run(n, b) for name, build in parts])
    merged = spark.createDataFrame(pd.concat(pdfs, ignore_index=True))
    return _round_all(merged, ["variant"], cols, 6)


_TTEST1_FAMILY_SQL = """
WITH a AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(value) AS s1, sum(1 + event_id % 7) AS s2,
         sum(value*value) AS c11, sum(value*(1 + event_id % 7)) AS c12,
         sum((1 + event_id % 7)*(1 + event_id % 7)) AS c22
  FROM events
), m AS (
  SELECT n, s1/n AS m1, s2/n AS m2,
         (c11 - s1*s1/n)/(n-1) AS v11,
         (c12 - s1*s2/n)/(n-1) AS v12,
         (c22 - s2*s2/n)/(n-1) AS v22
  FROM a
), li AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(l_extendedprice) AS my, avg(l_quantity) AS mx,
         var_samp(l_extendedprice) AS vy, var_samp(l_quantity) AS vx,
         covar_samp(l_extendedprice, l_quantity) AS cxy
  FROM lineitem
), lif AS (
  SELECT n, my, (vy + (cxy/vx)*(cxy/vx)*vx - 2*(cxy/vx)*cxy)/n AS var_adj
  FROM li
)
SELECT 'plain' AS variant, round(n, 6) AS n,
       round(m1/m2, 6) AS mean,
       round(m1/m2 - 10.0, 6) AS estimate,
       round(sqrt(((1/m2)*(1/m2)*v11 + 2*(1/m2)*(-m1/(m2*m2))*v12
                  + (m1/(m2*m2))*(m1/(m2*m2))*v22)/n), 6) AS stderr,
       round((m1/m2 - 10.0)/sqrt(((1/m2)*(1/m2)*v11 + 2*(1/m2)*(-m1/(m2*m2))*v12
                  + (m1/(m2*m2))*(m1/(m2*m2))*v22)/n), 6) AS t_stat
FROM m
UNION ALL
SELECT 'cuped', round(n, 6), round(my, 6), round(my - 50000.0, 6),
       round(sqrt(var_adj), 6), round((my - 50000.0)/sqrt(var_adj), 6)
FROM lif
"""


def q_delta_method_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method SE family: ratio metric per returnflag + 3-slot
    composite formula per linestatus (general symbolic autodiff)."""
    import pandas as pd

    from fast_causal_inference_spark.operators.deltamethod import delta_method

    li = _load(spark, sf_dir, "lineitem")
    ratio, comp = _concurrent([
        lambda: delta_method(li, "avg(l_extendedprice)/avg(l_quantity)",
                             std=True, group_cols=["l_returnflag"])
        .select(F.col("l_returnflag").alias("grp"), "std").toPandas(),
        lambda: delta_method(
            li, "avg(l_quantity)*avg(l_tax) + avg(l_discount)",
            std=True, group_cols=["l_linestatus"])
        .select(F.col("l_linestatus").alias("grp"), "std").toPandas(),
    ])
    ratio.insert(0, "variant", "ratio")
    comp.insert(0, "variant", "composite")
    merged = spark.createDataFrame(pd.concat([ratio, comp],
                                             ignore_index=True))
    return _round_all(merged, ["variant", "grp"], ["std"], 6)


_DELTA_FAMILY_SQL = """
WITH a AS (
  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
         sum(l_extendedprice) AS s1, sum(l_quantity) AS s2,
         sum(l_extendedprice*l_extendedprice) AS c11,
         sum(l_extendedprice*l_quantity) AS c12,
         sum(l_quantity*l_quantity) AS c22
  FROM lineitem GROUP BY l_returnflag
), m AS (
  SELECT l_returnflag, n, s1/n AS m1, s2/n AS m2,
         (c11 - s1*s1/n)/(n-1) AS v11,
         (c12 - s1*s2/n)/(n-1) AS v12,
         (c22 - s2*s2/n)/(n-1) AS v22
  FROM a
), comp AS (
  SELECT l_linestatus, CAST(count(*) AS DOUBLE) AS n,
         avg(l_quantity) AS m1, avg(l_tax) AS m2, avg(l_discount) AS m3,
         var_samp(l_quantity) AS v11, var_samp(l_tax) AS v22,
         var_samp(l_discount) AS v33,
         covar_samp(l_quantity, l_tax) AS v12,
         covar_samp(l_quantity, l_discount) AS v13,
         covar_samp(l_tax, l_discount) AS v23
  FROM lineitem GROUP BY l_linestatus
)
SELECT 'ratio' AS variant, CAST(l_returnflag AS VARCHAR) AS grp,
       round(sqrt(((1/m2)*(1/m2)*v11
                 + 2*(1/m2)*(-m1/(m2*m2))*v12
                 + (m1/(m2*m2))*(m1/(m2*m2))*v22)/n), 6) AS std
FROM m
UNION ALL
SELECT 'composite', CAST(l_linestatus AS VARCHAR),
       round(sqrt((m2*m2*v11 + m1*m1*v22 + v33
                 + 2*m2*m1*v12 + 2*m2*v13 + 2*m1*v23)/n), 6)
FROM comp
"""


def q_describe_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe() profile + exact interpolated quantiles as one long-format
    family: (variant, grp, stat, value)."""
    import fast_causal_inference_spark.functions as fn

    o = _load(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    desc = o.groupBy("o_orderpriority").agg(
        F.count(x).cast("double").alias("cnt"),
        F.avg(x).alias("avg"),
        F.stddev_samp(x).alias("std"),
        F.min(x).alias("min"),
        F.max(x).alias("max"))
    desc_long = desc.select(
        F.lit("describe").alias("variant"),
        F.col("o_orderpriority").alias("grp"),
        F.expr("stack(5, 'cnt', cnt, 'avg', avg, 'std', std, "
               "'min', min, 'max', max) AS (stat, value)"))
    li = _load(spark, sf_dir, "lineitem")
    # ONE exact-percentile aggregate with an array of levels — three
    # scalar percentile() aggs would each hold their own value buffer of
    # the whole column per group; the array form sorts once
    qs = fn.quantiles("l_extendedprice", 0.5, 0.9, 0.99, exact=True)
    q = (li.groupBy("l_returnflag")
         .agg(qs.alias("pq"))
         .select("l_returnflag",
                 F.col("pq")[0].alias("p50"),
                 F.col("pq")[1].alias("p90"),
                 F.col("pq")[2].alias("p99")))
    q_long = q.select(
        F.lit("quantile").alias("variant"),
        F.col("l_returnflag").alias("grp"),
        F.expr("stack(3, 'p50', p50, 'p90', p90, 'p99', p99)"
               " AS (stat, value)"))
    # quantile treatment effects: exact per-arm interpolated quantiles in
    # ONE groupBy(arm) percentile aggregation (beyond the reference)
    from fast_causal_inference_spark.operators.quantile_test import (
        quantile_treatment_effect,
    )

    qte = quantile_treatment_effect(
        li.withColumn("arm", (F.col("l_orderkey") % 2).cast("int")),
        "l_extendedprice", "arm", (0.25, 0.5, 0.9))
    qte_rows = []
    for r in qte.itertuples():
        for stat in ("q0", "q1", "qte"):
            qte_rows.append(("qte", f"p{int(r.quantile * 100)}", stat,
                             round(float(getattr(r, stat)), 6)))
    qte_long = spark.createDataFrame(
        qte_rows, "variant string, grp string, stat string, value double")
    out = desc_long.unionByName(q_long)
    return out.select("variant", "grp", "stat",
                      F.round("value", 6).alias("value")) \
        .unionByName(qte_long)


_DESCRIBE_QUANTILES_SQL = """
WITH d AS (
  SELECT o_orderpriority AS grp,
         CAST(count(o_totalprice) AS DOUBLE) AS cnt,
         avg(o_totalprice) AS avg, stddev_samp(o_totalprice) AS std,
         min(o_totalprice) AS "min", max(o_totalprice) AS "max"
  FROM orders GROUP BY o_orderpriority
), q AS (
  SELECT l_returnflag AS grp,
         quantile_cont(l_extendedprice, 0.5) AS p50,
         quantile_cont(l_extendedprice, 0.9) AS p90,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem GROUP BY l_returnflag
)
SELECT 'describe' AS variant, grp, stat, round(value, 6) AS value FROM (
  SELECT grp, 'cnt' AS stat, cnt AS value FROM d
  UNION ALL SELECT grp, 'avg', avg FROM d
  UNION ALL SELECT grp, 'std', std FROM d
  UNION ALL SELECT grp, 'min', "min" FROM d
  UNION ALL SELECT grp, 'max', "max" FROM d
)
UNION ALL
SELECT 'quantile', grp, stat, round(value, 6) FROM (
  SELECT grp, 'p50' AS stat, p50 AS value FROM q
  UNION ALL SELECT grp, 'p90', p90 FROM q
  UNION ALL SELECT grp, 'p99', p99 FROM q
)
UNION ALL
SELECT 'qte', 'p' || CAST(CAST(lvl * 100 AS INT) AS VARCHAR), stat,
       round(value, 6)
FROM (
  WITH qa AS (
    SELECT unnest([0.25, 0.5, 0.9]) AS lvl,
           unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.9])
                  FILTER (l_orderkey % 2 = 0)) AS q0,
           unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.9])
                  FILTER (l_orderkey % 2 = 1)) AS q1
    FROM lineitem
  )
  SELECT lvl, 'q0' AS stat, q0 AS value FROM qa
  UNION ALL SELECT lvl, 'q1', q1 FROM qa
  UNION ALL SELECT lvl, 'qte', q1 - q0 FROM qa
)
"""


def q_xexpt_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xexpt avg- and sum-metric reports as one family.  Sum-metric mean/
    numerator columns are bucket-structure-independent (S/r and S), so both
    variants are fully value-gated; per-variant t/power/mde live in the
    ungrouped pytest goldens and the grouped gate."""
    import pandas as pd

    from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp

    ev = _load(spark, sf_dir, "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    avg_rep, sum_rep = _concurrent([
        lambda: xexpt_ttest_2samp(ev, "value", "1 + event_id % 7",
                                  "treatment", "user_id",
                                  treatment_values=(0, 1)),
        lambda: xexpt_ttest_2samp(ev, "value", "1 + event_id % 7",
                                  "treatment", "user_id", metric_type="sum",
                                  group_buckets=(1, 1),
                                  treatment_values=(0, 1)),
    ])
    rows = []
    for name, rep, d0, d1 in [("avg", avg_rep, "denominator0", "denominator1"),
                              ("sum", sum_rep, "ratio0", "ratio1")]:
        r = rep.iloc[0]
        rows.append({
            "variant": name,
            "numerator0": r["numerator0"], "numerator1": r["numerator1"],
            "den0": r[d0], "den1": r[d1],
            "mean0": r["mean0"], "mean1": r["mean1"], "diff": r["diff"],
        })
    merged = spark.createDataFrame(pd.DataFrame(rows))
    return _round_all(merged, ["variant"],
                      ["numerator0", "numerator1", "den0", "den1",
                       "mean0", "mean1", "diff"], 6)


_XEXPT_FAMILY_SQL = """
WITH a AS (
  SELECT CAST(user_id % 2 = 1 AS INT) AS arm, value AS num,
         1 + event_id % 7 AS den
  FROM events
), g AS (
  SELECT arm, CAST(count(*) AS DOUBLE) AS n, sum(num) AS sn, sum(den) AS sd_
  FROM a GROUP BY arm
), j AS (
  SELECT g0.sn AS numerator0, g1.sn AS numerator1,
         g0.sd_ AS denominator0, g1.sd_ AS denominator1,
         g0.sn/g0.sd_ AS mean0, g1.sn/g1.sd_ AS mean1
  FROM (SELECT * FROM g WHERE arm = 0) g0, (SELECT * FROM g WHERE arm = 1) g1
)
SELECT 'avg' AS variant,
       round(numerator0, 6) AS numerator0, round(numerator1, 6) AS numerator1,
       round(denominator0, 6) AS den0, round(denominator1, 6) AS den1,
       round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
       round(mean1 - mean0, 6) AS diff
FROM j
UNION ALL
SELECT 'sum', round(numerator0, 6), round(numerator1, 6),
       1.0, 1.0,
       round(numerator0, 6), round(numerator1, 6),
       round(numerator1 - numerator0, 6)
FROM j
"""


def q_vector_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector function surface (§2.5): dot / cosine / L2 norm / L2 distance
    between consecutive embeddings — every value recomputed by DuckDB list
    functions (float32 inputs cast to double on both sides)."""
    import fast_causal_inference_spark.functions as fn

    emb = _load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50) \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    b = emb.select((F.col("vec_id") - 1).alias("vec_id"),
                   F.col("v").alias("w"))
    pairs = emb.join(b, "vec_id")
    out = pairs.select(
        "vec_id",
        fn.dotProduct(F.col("v"), F.col("w")).alias("dot"),
        fn.cosineSimilarity(F.col("v"), F.col("w")).alias("cosine"),
        fn.L2Norm(F.col("v")).alias("l2_norm"),
        fn.L2Distance(F.col("v"), F.col("w")).alias("l2_dist"))
    return _round_all(out, ["vec_id"],
                      ["dot", "cosine", "l2_norm", "l2_dist"], 6)


_VECTOR_FUNCTIONS_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 50
), p AS (
  SELECT a.vec_id, a.v, b.v AS w
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
)
SELECT vec_id,
       round(list_dot_product(v, w), 6) AS dot,
       round(CAST(list_cosine_similarity(v, w) AS DOUBLE), 6) AS cosine,
       round(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
       round(CAST(list_distance(v, w) AS DOUBLE), 6) AS l2_dist
FROM p
"""


def q_feature_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-engineering surface (§2.10): one-hot indicators and explicit
    cut_bins, reduced to (encoder, level, cnt) counts for the oracle."""
    import fast_causal_inference_spark.functions as fn
    from fast_causal_inference_spark.functions.features import (
        cut_bins as features_cut_bins,
        one_hot_encode,
    )

    li = _load(spark, sf_dir, "lineitem")
    oh = one_hot_encode(li.select("l_returnflag"), ["l_returnflag"])
    ind_cols = [c for c in oh.columns if c.startswith("l_returnflag_")]
    oh_long = oh.select(F.expr(
        "stack({n}, {args}) AS (level, flag)".format(
            n=len(ind_cols),
            args=", ".join(f"'{c.split('_')[-1]}', `{c}`"
                           for c in ind_cols)))) \
        .where(F.col("flag") == 1) \
        .groupBy("level").agg(F.count(F.lit(1)).alias("cnt")) \
        .select(F.lit("onehot").alias("encoder"), "level", "cnt")
    binned = li.select(
        features_cut_bins("l_quantity", [0.0, 10.0, 25.0, 40.0, 60.0],
                          labels=["q1", "q2", "q3", "q4"]).alias("level"))
    cb_long = (binned.where(F.col("level").isNotNull())
               .groupBy("level").agg(F.count(F.lit(1)).alias("cnt"))
               .select(F.lit("cut_bins").alias("encoder"), "level", "cnt"))
    return oh_long.unionByName(cb_long)


_FEATURE_ENCODING_SQL = """
SELECT 'onehot' AS encoder, l_returnflag AS level, count(*) AS cnt
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'cut_bins',
       CASE WHEN l_quantity > 0 AND l_quantity <= 10 THEN 'q1'
            WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'q2'
            WHEN l_quantity > 25 AND l_quantity <= 40 THEN 'q3'
            WHEN l_quantity > 40 AND l_quantity <= 60 THEN 'q4' END AS level,
       count(*) AS cnt
FROM lineitem
WHERE l_quantity > 0 AND l_quantity <= 60
GROUP BY 2
"""


def q_longterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LongTerm surrogate forecast: per-user per-period (value-sum, count)
    surrogates pivoted from events; transition model pooled on periods 1-2,
    rolled to periods 3-4 with Poisson-bootstrap CIs.  Partitioning is
    pinned (repartition by user + sort) so the seeded replica weights are
    layout-stable — golden-gated."""
    from fast_causal_inference_spark.operators.longterm import long_term

    ev = _load(spark, sf_dir, "events")
    per = F.pmod(F.dayofmonth("ts"), F.lit(4))
    wide = (ev.groupBy("user_id")
            .agg(*[F.sum(F.when(per == t, F.col("value")).otherwise(0.0))
                   .alias(f"y_t{t}") for t in range(4)],
                 *[F.sum(F.when(per == t, 1.0).otherwise(0.0))
                   .alias(f"m_t{t}") for t in range(4)])
            .withColumn("treatment", F.pmod(F.col("user_id"), F.lit(2)))
            .repartition(8, "user_id").sortWithinPartitions("user_id"))
    surr = [[f"y_t{t}", f"m_t{t}"] for t in range(4)]
    pdf = long_term(wide, surr, "treatment", key_metric=0, train_periods=2,
                    bs_num=50, seed=11)
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(float).round(6)
    return spark.createDataFrame(pdf)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal family, long format (doc_id, modality, feature, value):
    video frame-sampling (synthetic payloads), REAL BMP decode stats, REAL
    baseline-PNG decode stats (stdlib zlib inflate + unfilter), REAL
    baseline-JPEG decode stats (own Huffman + IDCT, datapipe/jpeg.py;
    q=100 constant-color payloads roundtrip bit-exactly), and REAL
    PCM-WAV decode stats, REAL FLAC round-trip decode stats (own
    Rice/fixed-prediction codec, datapipe/flac.py, over an LCG signal —
    Σx² is an exact integer DuckDB re-derives via generate_series), and
    REAL Ogg/WebP container probes.  The synthesized payloads derive
    dims/color/length/amplitude from sha256 hex substrings of the text,
    so DuckDB can recompute every value — the decode kernels are
    genuinely end-to-end value-checked (pure-Python BMP/PNG/JPEG/GIF/
    WAV/FLAC codecs; lossy mp3/mp4 decode still raises).

    Round 10 adds four oracle-gated modalities: image_tiff (LZW +
    predictor-2 + planar round trip), audio_aiff and audio_au (exact
    big-endian PCM-16 round trips), and audio_ima4 (Apple QuickTime
    IMA — constants at multiples of 128 are the exact class; batched
    packet-vectorized encode/decode with every 16th doc running the
    full AIFC container path).

    Round 11 adds audio_ulaw and audio_alaw (21 modalities, 51 rows/
    doc): AIFC G.711 companding — constants AT an expansion-table level
    round-trip exactly, and the signed 'mean' feature value-checks the
    full ITU closed-form expansion DuckDB re-derives from (sign, exp,
    mantissa) hex draws."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_audio,
        encode_wav,
    )

    # repartition once: the single parquet file scans as 1-4 splits,
    # which would serialize every per-row codec UDF on a wide executor
    d = (_load(spark, sf_dir, "documents").select("doc_id", "text")
         .repartition(int(spark.conf.get(
             "spark.sql.shuffle.partitions", "32"))))
    # round 11: the remaining three separate Arrow stages — video
    # (synthesize_media_column → video_frame_sample → groupBy), image
    # (synthesize_image_column → image_stats) and audio
    # (synthesize_audio_column → audio_stats) — are folded into the ONE
    # fused mapInPandas below, continuing the round-9/10 fusion: each
    # stage paid a full Arrow text-column transfer plus stage overhead
    # (and the video branch a shuffle) while its per-doc kernel work is
    # sub-millisecond.  The fused rows call the SAME public per-payload
    # kernels (image_payload_for_text → decode_image, encode_wav →
    # decode_audio, the sha256 frame-count derivation), so every value
    # is bit-identical; the column-pass operators stay exercised by the
    # datapipe pytest suites.
    # same derivation through the stdlib-zlib PNG decoder (inflate +
    # scanline unfilter) AND the own-Huffman-and-IDCT baseline JPEG
    # decoder (q=100 constant-color payloads roundtrip bit-exactly, so
    # the hash-derived oracle holds for JPEG too).  Both formats run the
    # SAME encode→decode→stats kernels as the public pipeline, fused into
    # ONE mapInPandas pass — the separate synthesize/stats stages cost
    # ~1 s of Arrow stage overhead each at gate scale while the actual
    # codec work is sub-millisecond per image.
    import pandas as _pd

    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_image,
        image_payload_for_text,
    )
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    ensure_udf_serializable()

    from fast_causal_inference_spark.datapipe.jpeg import encode_jpeg

    # round 10: the image-codec rows (png/jpeg/gif/jpeg_prog) and the
    # mp3/mp4 container probes are FUSED into the single
    # _flac_probe_stats mapInPandas below — the separate Arrow stages
    # each cost ~1 s of stage overhead at gate scale while the actual
    # per-doc work is sub-millisecond (the r9 verdict's item 8)
    # container probes (REAL bitstream parsing, no decode): serialize a
    # valid MPEG-1 Layer III stream and a valid ISO-BMFF skeleton per
    # doc with sha256-derived field values, run the public
    # probe_payload parse (the kernel media_probe wraps), and emit what
    # it recovers — frame counts, durations, track counts.  DuckDB
    # re-derives every value closed-form from the same hex substrings
    # (duration = n·1152/44100 etc.), so the frame-sync / Xing-offset /
    # box-walk arithmetic is value-gated end-to-end.  Since round 10
    # these rows ride the fused Arrow pass below.
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        build_mp3,
        build_mp4,
    )

    ensure_udf_serializable()
    # FLAC decode + Ogg/WebP probes (round 8): per doc, (1) an LCG
    # signal x[i] = (a·(i+1)+b) mod 2^16 − 2^15 (a odd → Rice-heavy
    # residuals, NOT a constant subframe) round-trips through the REAL
    # encode_flac → decode_audio kernels; n_samples and the exact
    # integer Σx² are emitted so DuckDB re-derives them closed-form
    # over generate_series with zero float-rounding risk.  (2) an
    # Ogg-Vorbis skeleton and a WebP header (hash-derived fields) run
    # the public media_probe parse.  One fused Arrow pass, same shape
    # as _codec_stats above.
    from fast_causal_inference_spark.datapipe.adpcm import (
        decode_ima4_batch,
        decode_ima_batch,
        decode_ms_batch,
        encode_ima4_batch,
        encode_ima_batch,
        encode_ms_batch,
        encode_wav_ima,
        encode_wav_ms,
    )
    from fast_causal_inference_spark.datapipe.multimodal import (
        encode_aifc_g711,
        encode_aifc_ima4,
        encode_aiff,
        encode_au,
        encode_tiff,
    )
    from fast_causal_inference_spark.datapipe.vp8l import (
        encode_webp_lossless,
    )
    from fast_causal_inference_spark.datapipe.flac import (
        encode_flac,
        encode_ogg_flac,
    )
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        build_ogg_vorbis,
        probe_payload,
    )

    def _flac_probe_stats(batches):
        import hashlib as _hashlib

        import numpy as _np
        for pdf in batches:
            rows = []
            adpcm_meta = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hx = _hashlib.sha256(str(text).encode()).hexdigest()
                # video / image / audio rows (former separate stages),
                # same public derivations: synthesize_media_column is
                # sha2-hex cast to binary = the hex string's bytes
                n_fr = int.from_bytes(
                    _hashlib.sha256(hx.encode()).digest()[:2],
                    "big") % 8 + 1
                rows.append((doc_id, "video", "n_frames", float(n_fr)))
                bmp = decode_image(image_payload_for_text(text, "bmp"))
                rows.append((doc_id, "image", "width",
                             float(bmp.shape[1])))
                rows.append((doc_id, "image", "height",
                             float(bmp.shape[0])))
                rows.append((doc_id, "image", "mean_pixel",
                             float(bmp.astype(_np.float64).mean())))
                n_wav = int(hx[10:14], 16) % 2000 + 100
                amp_w = int(hx[14:18], 16) % 30000
                xw, _rw = decode_audio(encode_wav(
                    _np.full(n_wav, amp_w, dtype=_np.int16), 16000))
                rows.append((doc_id, "audio", "n_samples",
                             float(len(xw))))
                rows.append((doc_id, "audio", "rms",
                             float(_np.sqrt(_np.mean(
                                 xw.astype(_np.float64) ** 2)))
                             if len(xw) else 0.0))
                # image codecs through the SAME public derivation +
                # dispatcher the synthesize/image_stats pipeline uses.
                # jpeg_prog: the identical hash-derived constant-color
                # image through the PROGRESSIVE encoder (q=100 DC-only
                # blocks roundtrip bit-exactly), value-gating the SOF2
                # multi-scan decoder end to end
                for modality, fmt in (("image_png", "png"),
                                      ("image_jpeg", "jpeg"),
                                      ("image_gif", "gif"),
                                      ("image_jpeg_prog", "jpeg_prog")):
                    if fmt == "jpeg_prog":
                        img = _np.full(
                            (int(hx[4:8], 16) % 16 + 1,
                             int(hx[0:4], 16) % 16 + 1, 3),
                            int(hx[8:10], 16), _np.uint8)
                        payload = encode_jpeg(img, quality=100,
                                              progressive=True)
                    else:
                        payload = image_payload_for_text(text, fmt)
                    out = decode_image(payload)
                    rows.append((doc_id, modality, "width",
                                 float(out.shape[1])))
                    rows.append((doc_id, modality, "height",
                                 float(out.shape[0])))
                    rows.append((doc_id, modality, "mean_pixel",
                                 float(out.astype(_np.float64).mean())))
                # mp3/mp4 container probes (probe_payload is the kernel
                # the public media_probe column pass wraps)
                nf = int(hx[18:21], 16) % 40 + 5
                dd = int(hx[21:24], 16) % 3000
                pr3 = probe_payload(build_mp3(
                    nf, xing=nf % 2 == 0, mono=nf % 3 == 0,
                    id3_size=64 if nf % 5 == 0 else 0, seed=nf))
                rows.append((doc_id, "probe_mp3", "n_frames",
                             float(pr3["n_frames"])))
                rows.append((doc_id, "probe_mp3", "duration_sec",
                             pr3["duration_sec"]))
                rows.append((doc_id, "probe_mp3", "channels",
                             float(pr3["channels"])))
                pr4 = probe_payload(build_mp4(
                    dd / 10.0, n_video=1 + dd % 2, n_audio=dd % 3))
                rows.append((doc_id, "probe_mp4", "duration_sec",
                             pr4["duration_sec"]))
                rows.append((doc_id, "probe_mp4", "n_video_tracks",
                             float(pr4["n_video_tracks"])))
                rows.append((doc_id, "probe_mp4", "n_audio_tracks",
                             float(pr4["n_audio_tracks"])))
                a = int(hx[24:28], 16) * 2 + 1
                b = int(hx[28:32], 16)
                n = int(hx[32:35], 16) % 500 + 64
                sig = (a * _np.arange(1, n + 1, dtype=_np.int64) + b) \
                    % 65536 - 32768
                x, _rate = decode_audio(encode_flac(sig, 16000))
                rows.append((doc_id, "audio_flac", "n_samples",
                             float(len(x))))
                rows.append((doc_id, "audio_flac", "sum_sq",
                             float(int((x.astype(_np.int64) ** 2).sum()))))
                # Ogg-FLAC: the SAME constant-amp derivation the WAV
                # 'audio' rows use, through encode_ogg_flac -> the Ogg
                # depacketizer -> the FLAC core (rms == amp exactly,
                # losslessness end to end)
                n_a = int(hx[10:14], 16) % 2000 + 100
                amp = int(hx[14:18], 16) % 30000
                xo, _ = decode_audio(encode_ogg_flac(
                    _np.full(n_a, amp, dtype=_np.int16), 16000))
                rows.append((doc_id, "audio_ogg_flac", "n_samples",
                             float(len(xo))))
                rows.append((doc_id, "audio_ogg_flac", "rms",
                             float(_np.sqrt(_np.mean(
                                 xo.astype(_np.float64) ** 2)))))
                n_ogg = int(hx[35:39], 16) + 1000
                ch = 1 + int(hx[39], 16) % 2
                nominal = (int(hx[40:43], 16) % 256 + 32) * 1000
                pr = probe_payload(build_ogg_vorbis(n_ogg, 44100, ch,
                                                    nominal))
                rows.append((doc_id, "probe_ogg", "duration_sec",
                             pr["duration_sec"]))
                rows.append((doc_id, "probe_ogg", "channels",
                             float(pr["channels"])))
                rows.append((doc_id, "probe_ogg", "bit_rate",
                             float(pr["bit_rate"])))
                # image_webp went probe-only -> REAL VP8L decode in
                # round 9: hash-derived constant-color image through
                # encode_webp_lossless with the subtract-green +
                # predictor transforms, decoded by the full prefix-
                # code/LZ77/inverse-transform pipeline in
                # datapipe/vp8l.py (losslessness makes mean_pixel ==
                # the constant, which DuckDB re-derives closed form)
                wv = int(hx[43:46], 16) % 16 + 1
                hv = int(hx[46:49], 16) % 16 + 1
                cval = int(hx[49], 16) * 17
                arr = decode_image(encode_webp_lossless(
                    _np.full((hv, wv, 3), cval, _np.uint8),
                    ("subtract_green", "predictor")))
                rows.append((doc_id, "image_webp", "width",
                             float(arr.shape[1])))
                rows.append((doc_id, "image_webp", "height",
                             float(arr.shape[0])))
                rows.append((doc_id, "image_webp", "mean_pixel",
                             float(arr.astype(_np.float64).mean())))
                # TIFF (round 10): a hash-derived GRADIENT image —
                # pixel (y, x) = (cval + 3x + 5y) mod 256 in every
                # channel — through the new LZW (compression 5,
                # early-change) + predictor-2 + PlanarConfiguration-2
                # path, so the horizontal differencing and the LZW
                # entropy stage decode NON-trivial data; losslessness
                # makes mean_pixel the closed form DuckDB re-derives
                # over generate_series
                gx, gy = _np.meshgrid(_np.arange(wv), _np.arange(hv))
                grad = ((cval + 3 * gx + 5 * gy) % 256).astype(_np.uint8)
                rgb3 = _np.repeat(grad[:, :, None], 3, axis=2)
                # round 11: the unused hash nibble picks between the
                # strip path (LZW + predictor-2 + planar) and the NEW
                # 16-bit TILED path (v16 = v8*257 reduces back exactly
                # via >>8, so the closed-form gradient oracle holds for
                # both layouts)
                if int(hx[56], 16) % 2:
                    tif = decode_image(encode_tiff(
                        rgb3.astype(_np.uint16) * 257, tile=(8, 8),
                        deflate=True, predictor=True))
                else:
                    tif = decode_image(encode_tiff(
                        rgb3, lzw=True, predictor=True, planar=True))
                rows.append((doc_id, "image_tiff", "width",
                             float(tif.shape[1])))
                rows.append((doc_id, "image_tiff", "height",
                             float(tif.shape[0])))
                rows.append((doc_id, "image_tiff", "mean_pixel",
                             float(tif.astype(_np.float64).mean())))
                # AIFF + AU (round 10): exact big-endian PCM-16 round
                # trips of the SAME constant-amp derivation the WAV
                # 'audio' rows use (rms == amp, losslessness end to end)
                xa, _ = decode_audio(encode_aiff(
                    _np.full(n_a, amp, dtype=_np.int16), 16000))
                rows.append((doc_id, "audio_aiff", "n_samples",
                             float(len(xa))))
                rows.append((doc_id, "audio_aiff", "rms",
                             float(_np.sqrt(_np.mean(
                                 xa.astype(_np.float64) ** 2)))))
                xu, _ = decode_audio(encode_au(
                    _np.full(n_a, amp, dtype=_np.int16), 16000,
                    encoding=3))
                rows.append((doc_id, "audio_au", "n_samples",
                             float(len(xu))))
                rows.append((doc_id, "audio_au", "rms",
                             float(_np.sqrt(_np.mean(
                                 xu.astype(_np.float64) ** 2)))))
                # AIFC G.711 ulaw/alaw (round 11): constants AT a G.711
                # expansion-table level are the exact class (the
                # nearest-code compressor returns the generating code,
                # so compress -> expand is the identity); the level
                # itself is the ITU closed form DuckDB re-derives from
                # (sign, exponent, mantissa) hex draws — the signed
                # 'mean' feature checks the full signed expansion, not
                # just a magnitude
                n_u = int(hx[18:21], 16) % 500 + 64
                sg_u = 1 if int(hx[21], 16) % 2 == 0 else -1
                ex_u = int(hx[22], 16) % 8
                mt_u = int(hx[23], 16)
                lvl_u = sg_u * ((((mt_u << 3) | 0x84) << ex_u) - 0x84)
                xg, _ = decode_audio(encode_aifc_g711(
                    _np.full(n_u, lvl_u, dtype=_np.int16), 8000, "ulaw"))
                rows.append((doc_id, "audio_ulaw", "n_samples",
                             float(len(xg))))
                rows.append((doc_id, "audio_ulaw", "mean",
                             float(_np.mean(xg.astype(_np.float64)))))
                n_al = int(hx[24:27], 16) % 500 + 64
                sg_a = 1 if int(hx[27], 16) % 2 == 0 else -1
                ex_a = int(hx[28], 16) % 8
                mt_a = int(hx[29], 16)
                mag_a = (mt_a << 4) + 0x8 if ex_a == 0 else \
                    ((mt_a << 4) + 0x108) << (ex_a - 1)
                xga, _ = decode_audio(encode_aifc_g711(
                    _np.full(n_al, sg_a * mag_a, dtype=_np.int16),
                    8000, "alaw"))
                rows.append((doc_id, "audio_alaw", "n_samples",
                             float(len(xga))))
                rows.append((doc_id, "audio_alaw", "mean",
                             float(_np.mean(xga.astype(_np.float64)))))
                # ADPCM (round 9): two exact-representable signal
                # classes make the LOSSY codecs value-checkable —
                # IMA at step-index 0 encodes constants exactly
                # (nibble 0 adds step 7 >> 3 == 0), and MSADPCM
                # predictor 1 (512, -256) extrapolates arithmetic
                # ramps exactly (pred = 2·s1 − s2).  Deferred to the
                # BATCHED block path below (encode/decode of every
                # doc's blocks in ONE vectorized pass — the numpy
                # per-step dispatch amortizes across the Arrow batch,
                # measured 14x vs per-doc); every 16th doc instead
                # runs the full per-doc WAV framing round trip
                # (encode_wav_* -> decode_audio -> decode_wav), whose
                # values are bit-identical by the encoder-mirror
                # property the pytest suite pins.
                adpcm_meta.append((
                    doc_id,
                    int(hx[50:53], 16) % 1500 + 100,
                    int(hx[53:56], 16) % 20000,
                    int(hx[57:60], 16) % 1500 + 100,
                    int(hx[60:63], 16) % 8000 - 4000,
                    int(hx[63], 16) % 7 - 3,
                    # ima4 (round 10): constants at multiples of 128
                    # are the exact class (step-index-0 holds, and the
                    # 9-bit packet-header quantization is lossless)
                    int(hx[50:53], 16) % 700 + 80,
                    (int(hx[53:56], 16) % 256 - 128) * 128))
            # batched ADPCM pass over the whole Arrow batch
            ima_sigs = [_np.full(ni, ai, dtype=_np.int16)
                        for _, ni, ai, *_ in adpcm_meta]
            ms_sigs = [(am + dm * _np.arange(nm)).astype(_np.int16)
                       for _, _, _, nm, am, dm, _, _ in adpcm_meta]
            ima4_sigs = [_np.full(n4, a4, dtype=_np.int16)
                         for *_, n4, a4 in adpcm_meta]
            ima_dec = decode_ima_batch(
                encode_ima_batch(ima_sigs, 32), 32,
                [len(s) for s in ima_sigs])
            ms_dec = decode_ms_batch(
                encode_ms_batch(ms_sigs, 32), 32,
                [len(s) for s in ms_sigs])
            ima4_dec = decode_ima4_batch(
                encode_ima4_batch(ima4_sigs),
                [len(s) for s in ima4_sigs])
            for i, (doc_id, ni, ai, nm, am, dm, n4, a4) in \
                    enumerate(adpcm_meta):
                if i % 16 == 0:      # full container framing round trip
                    xi, _ = decode_audio(encode_wav_ima(
                        ima_sigs[i], 16000, block_align=32))
                    xm, _ = decode_audio(encode_wav_ms(
                        ms_sigs[i], 16000, block_align=32))
                    x4, _ = decode_audio(encode_aifc_ima4(
                        ima4_sigs[i], 16000))
                else:
                    xi, xm, x4 = ima_dec[i], ms_dec[i], ima4_dec[i]
                rows.append((doc_id, "audio_adpcm_ima", "n_samples",
                             float(len(xi))))
                rows.append((doc_id, "audio_adpcm_ima", "rms",
                             float(_np.sqrt(_np.mean(
                                 xi.astype(_np.float64) ** 2)))))
                rows.append((doc_id, "audio_adpcm_ms", "n_samples",
                             float(len(xm))))
                rows.append((doc_id, "audio_adpcm_ms", "sum_sq",
                             float(int((xm.astype(_np.int64) ** 2)
                                       .sum()))))
                rows.append((doc_id, "audio_ima4", "n_samples",
                             float(len(x4))))
                rows.append((doc_id, "audio_ima4", "rms",
                             float(_np.sqrt(_np.mean(
                                 x4.astype(_np.float64) ** 2)))))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "modality", "feature", "value"])

    out = d.mapInPandas(
        _flac_probe_stats,
        "doc_id long, modality string, feature string, value double")
    return out.select("doc_id", "modality", "feature",
                      F.round("value", 6).alias("value"))


_MEDIA_FEATURES_SQL = """
WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
SELECT doc_id, 'video' AS modality, 'n_frames' AS feature,
       CAST(('0x' || substr(sha256(hx), 1, 4))::BIGINT % 8 + 1 AS DOUBLE)
         AS value
FROM h
UNION ALL
SELECT doc_id, 'image', 'width',
       CAST(('0x' || substr(hx, 1, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image', 'height',
       CAST(('0x' || substr(hx, 5, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image', 'mean_pixel',
       CAST(('0x' || substr(hx, 9, 2))::BIGINT AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_png', 'width',
       CAST(('0x' || substr(hx, 1, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_png', 'height',
       CAST(('0x' || substr(hx, 5, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_png', 'mean_pixel',
       CAST(('0x' || substr(hx, 9, 2))::BIGINT AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_jpeg', 'width',
       CAST(('0x' || substr(hx, 1, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_jpeg', 'height',
       CAST(('0x' || substr(hx, 5, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_jpeg', 'mean_pixel',
       CAST(('0x' || substr(hx, 9, 2))::BIGINT AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_gif', 'width',
       CAST(('0x' || substr(hx, 1, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_gif', 'height',
       CAST(('0x' || substr(hx, 5, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_gif', 'mean_pixel',
       CAST(('0x' || substr(hx, 9, 2))::BIGINT AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_jpeg_prog', 'width',
       CAST(('0x' || substr(hx, 1, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_jpeg_prog', 'height',
       CAST(('0x' || substr(hx, 5, 4))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_jpeg_prog', 'mean_pixel',
       CAST(('0x' || substr(hx, 9, 2))::BIGINT AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio', 'n_samples',
       CAST(('0x' || substr(hx, 11, 4))::BIGINT % 2000 + 100 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio', 'rms',
       CAST(('0x' || substr(hx, 15, 4))::BIGINT % 30000 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'probe_mp3', 'n_frames',
       CAST(('0x' || substr(hx, 19, 3))::BIGINT % 40 + 5 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'probe_mp3', 'duration_sec',
       round((('0x' || substr(hx, 19, 3))::BIGINT % 40 + 5)
             * 1152.0 / 44100.0, 6) FROM h
UNION ALL
SELECT doc_id, 'probe_mp3', 'channels',
       CAST(CASE WHEN (('0x' || substr(hx, 19, 3))::BIGINT % 40 + 5) % 3
                      = 0 THEN 1 ELSE 2 END AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'probe_mp4', 'duration_sec',
       round((('0x' || substr(hx, 22, 3))::BIGINT % 3000) / 10.0, 6) FROM h
UNION ALL
SELECT doc_id, 'probe_mp4', 'n_video_tracks',
       CAST(1 + ('0x' || substr(hx, 22, 3))::BIGINT % 2 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'probe_mp4', 'n_audio_tracks',
       CAST(('0x' || substr(hx, 22, 3))::BIGINT % 3 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_flac', 'n_samples',
       CAST(('0x' || substr(hx, 33, 3))::BIGINT % 500 + 64 AS DOUBLE) FROM h
UNION ALL
-- exact integer sum of squares of the LCG signal the FLAC row
-- round-trips: x[i] = (a*(i+1)+b) mod 2^16 - 2^15, a odd
SELECT doc_id, 'audio_flac', 'sum_sq',
       CAST(SUM(((p.a * (g.i + 1) + p.b) % 65536 - 32768)
                * ((p.a * (g.i + 1) + p.b) % 65536 - 32768)) AS DOUBLE)
FROM (SELECT doc_id,
             ('0x' || substr(hx, 25, 4))::BIGINT * 2 + 1 AS a,
             ('0x' || substr(hx, 29, 4))::BIGINT AS b,
             ('0x' || substr(hx, 33, 3))::BIGINT % 500 + 64 AS n
      FROM h) p
JOIN generate_series(0, 562) g(i) ON g.i < p.n
GROUP BY doc_id
UNION ALL
SELECT doc_id, 'audio_ogg_flac', 'n_samples',
       CAST(('0x' || substr(hx, 11, 4))::BIGINT % 2000 + 100 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_ogg_flac', 'rms',
       CAST(('0x' || substr(hx, 15, 4))::BIGINT % 30000 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'probe_ogg', 'duration_sec',
       round((('0x' || substr(hx, 36, 4))::BIGINT + 1000) / 44100.0, 6)
FROM h
UNION ALL
SELECT doc_id, 'probe_ogg', 'channels',
       CAST(1 + ('0x' || substr(hx, 40, 1))::BIGINT % 2 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'probe_ogg', 'bit_rate',
       CAST((('0x' || substr(hx, 41, 3))::BIGINT % 256 + 32) * 1000
            AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_adpcm_ima', 'n_samples',
       CAST(('0x' || substr(hx, 51, 3))::BIGINT % 1500 + 100 AS DOUBLE)
FROM h
UNION ALL
SELECT doc_id, 'audio_adpcm_ima', 'rms',
       CAST(('0x' || substr(hx, 54, 3))::BIGINT % 20000 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_adpcm_ms', 'n_samples',
       CAST(('0x' || substr(hx, 58, 3))::BIGINT % 1500 + 100 AS DOUBLE)
FROM h
UNION ALL
SELECT doc_id, 'audio_adpcm_ms', 'sum_sq',
       CAST(SUM((p.a + p.d * g.i) * (p.a + p.d * g.i)) AS DOUBLE)
FROM (SELECT doc_id,
             ('0x' || substr(hx, 58, 3))::BIGINT % 1500 + 100 AS n,
             ('0x' || substr(hx, 61, 3))::BIGINT % 8000 - 4000 AS a,
             ('0x' || substr(hx, 64, 1))::BIGINT % 7 - 3 AS d
      FROM h) p
JOIN generate_series(0, 1598) g(i) ON g.i < p.n
GROUP BY doc_id
UNION ALL
SELECT doc_id, 'image_webp', 'width',
       CAST(('0x' || substr(hx, 44, 3))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_webp', 'height',
       CAST(('0x' || substr(hx, 47, 3))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_webp', 'mean_pixel',
       CAST(('0x' || substr(hx, 50, 1))::BIGINT * 17 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_tiff', 'width',
       CAST(('0x' || substr(hx, 44, 3))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'image_tiff', 'height',
       CAST(('0x' || substr(hx, 47, 3))::BIGINT % 16 + 1 AS DOUBLE) FROM h
UNION ALL
-- gradient TIFF: mean over (cval + 3x + 5y) mod 256 on the w x h grid
SELECT doc_id, 'image_tiff', 'mean_pixel',
       round(AVG(CAST((p.cv + 3 * (g.i % p.w) + 5 * (g.i // p.w))
                      % 256 AS DOUBLE)), 6)
FROM (SELECT doc_id,
             ('0x' || substr(hx, 44, 3))::BIGINT % 16 + 1 AS w,
             ('0x' || substr(hx, 47, 3))::BIGINT % 16 + 1 AS h,
             ('0x' || substr(hx, 50, 1))::BIGINT * 17 AS cv
      FROM h) p
JOIN generate_series(0, 255) g(i) ON g.i < p.w * p.h
GROUP BY doc_id
UNION ALL
SELECT doc_id, 'audio_aiff', 'n_samples',
       CAST(('0x' || substr(hx, 11, 4))::BIGINT % 2000 + 100 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_aiff', 'rms',
       CAST(('0x' || substr(hx, 15, 4))::BIGINT % 30000 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_au', 'n_samples',
       CAST(('0x' || substr(hx, 11, 4))::BIGINT % 2000 + 100 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_au', 'rms',
       CAST(('0x' || substr(hx, 15, 4))::BIGINT % 30000 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_ima4', 'n_samples',
       CAST(('0x' || substr(hx, 51, 3))::BIGINT % 700 + 80 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_ima4', 'rms',
       CAST(ABS((('0x' || substr(hx, 54, 3))::BIGINT % 256 - 128) * 128)
            AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_ulaw', 'n_samples',
       CAST(('0x' || substr(hx, 19, 3))::BIGINT % 500 + 64 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_ulaw', 'mean',
       -- ITU G.711 mu-law expansion: sign * (((mant*8 + 132) << exp) - 132).
       -- All-integer (shift, not power()): the float form produced -0.0 for
       -- (sign=-1, exp=0, mant=0) while Spark's integer sample mean is +0.0
       CAST((CASE WHEN ('0x' || substr(hx, 22, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END)
            * ((('0x' || substr(hx, 24, 1))::BIGINT * 8 + 132)
               * (CAST(1 AS BIGINT)
                  << (('0x' || substr(hx, 23, 1))::BIGINT % 8)) - 132)
            AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_alaw', 'n_samples',
       CAST(('0x' || substr(hx, 25, 3))::BIGINT % 500 + 64 AS DOUBLE) FROM h
UNION ALL
SELECT doc_id, 'audio_alaw', 'mean',
       -- ITU G.711 A-law expansion: seg 0 = mant*16 + 8,
       -- seg e>0 = (mant*16 + 264) << (e-1).  All-integer like the mu-law
       -- row (the magnitude here is >= 8 so the -0.0 hazard cannot occur,
       -- but the shift keeps the whole form in BIGINT; value-identical on
       -- all 256 sign/exp/mant combinations)
       CAST((CASE WHEN ('0x' || substr(hx, 28, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END)
            * (CASE WHEN ('0x' || substr(hx, 29, 1))::BIGINT % 8 = 0
                    THEN ('0x' || substr(hx, 30, 1))::BIGINT * 16 + 8
                    ELSE (('0x' || substr(hx, 30, 1))::BIGINT * 16 + 264)
                         * (CAST(1 AS BIGINT)
                            << (('0x' || substr(hx, 29, 1))::BIGINT % 8 - 1))
               END)
            AS DOUBLE) FROM h
"""


def q_boot_strap_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap family in long format (variant, item, stat, value):
    metric replicas + bootstrap-of-OLS coefficient summary."""
    import pandas as pd

    from fast_causal_inference_spark.operators.resample import (
        boot_strap,
        boot_strap_ols,
    )

    ev = _load(spark, sf_dir, "events")
    li = _load(spark, sf_dir, "lineitem")
    reps, ols_pdf = _concurrent([
        lambda: boot_strap(ev, "avg(value)", n_resamples=20,
                           seed=7).toPandas(),
        lambda: boot_strap_ols(
            li, "l_extendedprice ~ l_quantity + l_discount",
            n_resamples=20, seed=7),
    ])
    rows = [{"variant": "metric", "item": str(int(r.replica_id)),
             "stat": "value", "value": float(r.value)}
            for r in reps.itertuples()]
    for r in ols_pdf.itertuples():
        for stat in ("estimate", "boot_mean", "boot_se", "lower", "upper"):
            rows.append({"variant": "ols", "item": r.name, "stat": stat,
                         "value": float(getattr(r, stat))})
    out = spark.createDataFrame(pd.DataFrame(rows))
    return _round_all(out, ["variant", "item", "stat"], ["value"], 6)


# ---------------------------------------------------------------------------
# Round-4 consolidated + new family gates.  The round driver records at most
# 50 correctness rows, so closely-related operators ride ONE family key in
# long format (variant, item, stat, value); every new round-3/4 operator
# (ANOVA family, contingency tests, robust OLS, temporal joins, multiple
# testing, corpus assembly, power/effect size) gets a first-class gate here.
# ---------------------------------------------------------------------------

_LONG_SCHEMA = "variant string, item string, stat string, value double"


def _concurrent(fns):
    """Run independent Spark actions concurrently on the shared session.

    Family gates bundle several operators; their driver-side finalizers
    serialize a handful of small jobs.  The Spark scheduler interleaves
    concurrent jobs fine (FIFO within a session), so issuing them from a
    thread pool overlaps their (fixed-cost-dominated) stages."""
    from concurrent.futures import ThreadPoolExecutor

    if len(fns) == 1:
        return [fns[0]()]
    with ThreadPoolExecutor(max_workers=min(8, len(fns))) as ex:
        return [f.result() for f in [ex.submit(fn) for fn in fns]]


def _long_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["variant", "item", "stat", "value"])
    pdf["value"] = pdf["value"].astype(float).round(6)
    return spark.createDataFrame(pdf, schema=_LONG_SCHEMA)


def q_ols_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS / two-regressor OLS / WLS coefficients+inference, plus the
    ols_train → save → load → predict/eval round-trip (reference
    ``ols_train``/``evalMLMethod``, regression.py:285-302; T/test_ols
    exercises train-then-score), long format (absorbs the former ols /
    ols_multi / wls gate keys)."""
    from fast_causal_inference_spark.operators.ols import (
        OlsModel,
        ols,
        ols_coef_df,
        wls,
    )

    li = _load(spark, sf_dir, "lineitem")

    def _predict_eval():
        # train, round-trip through JSON model state, score, evaluate —
        # the full evalMLMethod life-cycle as ONE downstream aggregation
        trained = ols(li, "l_extendedprice ~ l_quantity + l_discount")
        scored = OlsModel.from_json(trained.to_json()).predict(li, "pred")
        return (scored.groupBy("l_returnflag")
                .agg(F.avg("pred").alias("avg_pred"),
                     F.sqrt(F.avg(F.pow(F.col("l_extendedprice")
                                        - F.col("pred"), 2))).alias("rmse"))
                .collect())

    def _oaxaca():
        from fast_causal_inference_spark.operators.decompose import (
            oaxaca_blinder,
        )

        ob = oaxaca_blinder(
            li.withColumn("arm", (F.col("l_orderkey") % 2).cast("int")),
            "l_extendedprice", "arm", ["l_quantity"], reference="pooled")
        return [{"variant": "oaxaca", "item": str(r.component),
                 "stat": "value", "value": round(float(r.value), 6)}
                for r in ob.itertuples()]

    rows = []
    simple, multi, model, pe, med, heck, qreg, oax = _concurrent([
        lambda: ols_coef_df(li, "l_discount ~ l_tax").toPandas(),
        lambda: ols_coef_df(
            li, "l_extendedprice ~ l_quantity + l_discount").toPandas(),
        lambda: wls(li, "l_discount ~ l_tax", weight="l_quantity"),
        _predict_eval,
        lambda: _ols_mediation(li),
        lambda: g_ols_heckman(spark, sf_dir),
        lambda: g_ols_quantreg(spark, sf_dir),
        _oaxaca,
    ])
    for r in simple.itertuples():
        for stat in ("estimate", "stderr", "t_value"):
            rows.append({"variant": "simple", "item": r.name, "stat": stat,
                         "value": round(float(getattr(r, stat)), 6)})
    for r in multi.itertuples():
        rows.append({"variant": "multi", "item": r.name, "stat": "estimate",
                     "value": round(float(r.estimate), 4)})
    for name, b in zip(model.names, model.beta):
        rows.append({"variant": "wls", "item": name, "stat": "estimate",
                     "value": round(float(b), 6)})
    for r in pe:
        for stat in ("avg_pred", "rmse"):
            rows.append({"variant": "predict_eval",
                         "item": str(r["l_returnflag"]), "stat": stat,
                         "value": round(float(r[stat]), 2)})
    rows += med
    rows += oax
    return _long_rows(spark, rows).unionByName(heck).unionByName(qreg)


def g_ols_quantreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed quantile-regression rows of the OLS family (golden
    sub-oracle: the damped-Newton solve on the convolution-smoothed
    pinball loss is iterative, not SQL-expressible).  Median and upper
    quartile of l_discount on l_tax (semantics irrelevant for parity)."""
    from fast_causal_inference_spark.operators.quantreg import (
        quantile_regression_multi,
    )

    li = _load(spark, sf_dir, "lineitem")
    rows = []
    # explicit h: l_discount has 11 atoms at 0.01 spacing, so the
    # conquer-rule bandwidth (~4e-4 at sf0.1) lands far below the
    # data's resolution and the Newton solve crawls along atom
    # edges; h=0.005 (half an atom) keeps the smoothed problem
    # honest AND convergent in a handful of scans.  One shared
    # persisted design + OLS warm start for both levels; 0.75
    # warm-starts from the 0.5 optimum (same converged values to
    # ~1e-9, far inside the 1e-6 golden rounding).
    for m in quantile_regression_multi(li, "l_discount ~ l_tax",
                                       taus=[0.5, 0.75], h=0.005):
        for name, b, se in zip(m.names, m.beta, m.stderr):
            rows.append({"variant": f"quantreg_{m.tau}", "item": name,
                         "stat": "coef", "value": round(float(b), 6)})
            rows.append({"variant": f"quantreg_{m.tau}", "item": name,
                         "stat": "stderr", "value": round(float(se), 6)})
    return _long_rows(spark, rows)


def g_ols_heckman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heckman two-step rows of the OLS family (golden sub-oracle: the
    probit first stage is iterative Fisher scoring).  Selection =
    (l_orderkey % 3 = 0) on tax+quantity; outcome = extendedprice on
    quantity over the selected third (semantics irrelevant for parity)."""
    from fast_causal_inference_spark.operators.selection import heckman

    li = _load(spark, sf_dir, "lineitem") \
        .withColumn("sel", (F.col("l_orderkey") % 3 == 0).cast("double"))
    out = heckman(li, "l_extendedprice ~ l_quantity",
                  "sel ~ l_tax + l_quantity")
    rows = []
    for r in out.itertuples():
        for stat in ("coef", "stderr"):
            rows.append({"variant": "heckman", "item": str(r.name),
                         "stat": stat,
                         "value": round(float(getattr(r, stat)), 6)})
    for stat in ("rho", "sigma", "n_selected"):
        rows.append({"variant": "heckman", "item": "model", "stat": stat,
                     "value": round(float(out.attrs[stat]), 4)})
    return _long_rows(spark, rows)


def _ols_mediation(li: DataFrame) -> list:
    """Mediation rows of the OLS family (fully SQL-re-derivable: the
    three nested models are bivariate/3x3 closed forms of one joint
    moment matrix — see the med_* CTEs in ``_OLS_FAMILY_SQL``).
    Decomposition of l_quantity's effect on l_extendedprice 'through'
    l_discount (semantics irrelevant for parity)."""
    from fast_causal_inference_spark.operators.mediation import mediation

    res = mediation(li, "l_extendedprice", "l_quantity", "l_discount")
    rows = []
    for item, est, se in (("acme", res.acme, res.acme_stderr),
                          ("ade", res.ade, res.ade_stderr),
                          ("total", res.total, res.total_stderr),
                          ("path_a", res.a, res.a_stderr),
                          ("path_b", res.b, res.b_stderr)):
        rows.append({"variant": "mediation", "item": item,
                     "stat": "estimate", "value": round(float(est), 4)})
        rows.append({"variant": "mediation", "item": item,
                     "stat": "stderr", "value": round(float(se), 4)})
    rows.append({"variant": "mediation", "item": "prop_mediated",
                 "stat": "estimate",
                 "value": round(float(res.prop_mediated), 4)})
    rows.append({"variant": "mediation", "item": "sobel_z",
                 "stat": "estimate", "value": round(float(res.sobel_z), 4)})
    return rows


_OLS_FAMILY_SQL = f"""
WITH sf AS ({_OLS_SIMPLE_SQL}), mu AS ({_OLS_MULTI_SQL}), wf AS ({_WLS_SQL}),
pe_a AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(l_quantity) AS s1, sum(l_discount) AS s2,
         sum(l_extendedprice) AS sy,
         sum(l_quantity*l_quantity) AS c11,
         sum(l_quantity*l_discount) AS c12,
         sum(l_discount*l_discount) AS c22,
         sum(l_quantity*l_extendedprice) AS c1y,
         sum(l_discount*l_extendedprice) AS c2y
  FROM lineitem
), pe_d AS (
  SELECT
    (sy*(c11*c22 - c12*c12) - s1*(c1y*c22 - c12*c2y)
       + s2*(c1y*c12 - c11*c2y))
    / (n*(c11*c22 - c12*c12) - s1*(s1*c22 - c12*s2)
       + s2*(s1*c12 - c11*s2)) AS b0,
    (n*(c1y*c22 - c2y*c12) - sy*(s1*c22 - c12*s2) + s2*(s1*c2y - c1y*s2))
    / (n*(c11*c22 - c12*c12) - s1*(s1*c22 - c12*s2)
       + s2*(s1*c12 - c11*s2)) AS b1,
    (n*(c11*c2y - c12*c1y) - s1*(s1*c2y - c1y*s2) + sy*(s1*c12 - c11*s2))
    / (n*(c11*c22 - c12*c12) - s1*(s1*c22 - c12*s2)
       + s2*(s1*c12 - c11*s2)) AS b2
  FROM pe_a
), pe AS (
  SELECT l_returnflag,
         avg(b0 + b1*l_quantity + b2*l_discount) AS avg_pred,
         sqrt(avg(pow(l_extendedprice
                      - (b0 + b1*l_quantity + b2*l_discount), 2))) AS rmse
  FROM lineitem, pe_d GROUP BY l_returnflag
), med_a AS (
  -- joint moment matrix over (1, q=l_quantity, d=l_discount,
  -- y=l_extendedprice): every nested mediation model is a submatrix
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(l_quantity) AS sq, sum(l_discount) AS sd,
         sum(l_extendedprice) AS sy,
         sum(l_quantity*l_quantity) AS cqq,
         sum(l_quantity*l_discount) AS cqd,
         sum(l_discount*l_discount) AS cdd,
         sum(l_quantity*l_extendedprice) AS cqy,
         sum(l_discount*l_extendedprice) AS cdy,
         sum(l_extendedprice*l_extendedprice) AS cyy
  FROM lineitem
), med_m AS (
  -- mediator model d ~ 1 + q
  SELECT n, (n*cqd - sq*sd) / (n*cqq - sq*sq) AS a,
         (sd - (n*cqd - sq*sd) / (n*cqq - sq*sq) * sq) / n AS a0,
         n*cqq - sq*sq AS detm, cdd, sd, cqd
  FROM med_a
), med_m2 AS (
  SELECT a, sqrt((cdd - a0*sd - a*cqd) / (n - 2) * n / detm) AS se_a
  FROM med_m
), med_o AS (
  -- outcome model y ~ 1 + q + d (Cramer on the 3x3 system)
  SELECT n,
    n*(cqq*cdd - cqd*cqd) - sq*(sq*cdd - cqd*sd)
      + sd*(sq*cqd - cqq*sd) AS det3,
    (sy*(cqq*cdd - cqd*cqd) - sq*(cqy*cdd - cqd*cdy)
       + sd*(cqy*cqd - cqq*cdy)) AS b0n,
    (n*(cqy*cdd - cdy*cqd) - sy*(sq*cdd - cqd*sd)
       + sd*(sq*cdy - cqy*sd)) AS b1n,
    (n*(cqq*cdy - cqd*cqy) - sq*(sq*cdy - cqy*sd)
       + sy*(sq*cqd - cqq*sd)) AS b2n,
    sy, cqy, cdy, cyy, cqq, cdd, sq, sd
  FROM med_a
), med_o2 AS (
  SELECT b0n/det3 AS ob0, b1n/det3 AS ade, b2n/det3 AS b,
         (cyy - b0n/det3*sy - b1n/det3*cqy - b2n/det3*cdy) / (n - 3)
           AS sig2,
         (n*cdd - sd*sd) / det3 AS invqq,
         (n*cqq - sq*sq) / det3 AS invdd
  FROM med_o
), med_o3 AS (
  SELECT ade, b, sqrt(sig2 * invqq) AS se_ade, sqrt(sig2 * invdd) AS se_b
  FROM med_o2
), med_t AS (
  -- total model y ~ 1 + q
  SELECT (n*cqy - sq*sy) / (n*cqq - sq*sq) AS c,
         (sy - (n*cqy - sq*sy) / (n*cqq - sq*sq) * sq) / n AS c0,
         n*cqq - sq*sq AS dett, n, sy, cqy, cyy
  FROM med_a
), med_t2 AS (
  SELECT c, sqrt((cyy - c0*sy - c*cqy) / (n - 2) * n / dett) AS se_c
  FROM med_t
), med_f AS (
  SELECT m.a, m.se_a, o.ade, o.se_ade, o.b, o.se_b, t.c, t.se_c,
         m.a * o.b AS acme,
         sqrt(m.a*m.a*o.se_b*o.se_b + o.b*o.b*m.se_a*m.se_a) AS se_acme
  FROM med_m2 m, med_o3 o, med_t2 t
)
SELECT 'simple' AS variant, name AS item, 'estimate' AS stat,
       estimate AS value FROM sf
UNION ALL SELECT 'simple', name, 'stderr', stderr FROM sf
UNION ALL SELECT 'simple', name, 't_value', t_value FROM sf
UNION ALL SELECT 'multi', name, 'estimate', estimate FROM mu
UNION ALL SELECT 'wls', name, 'estimate', estimate FROM wf
UNION ALL SELECT 'predict_eval', l_returnflag, 'avg_pred',
       round(avg_pred, 2) FROM pe
UNION ALL SELECT 'predict_eval', l_returnflag, 'rmse',
       round(rmse, 2) FROM pe
UNION ALL SELECT 'mediation', 'acme', 'estimate', round(acme, 4) FROM med_f
UNION ALL SELECT 'mediation', 'acme', 'stderr', round(se_acme, 4) FROM med_f
UNION ALL SELECT 'mediation', 'ade', 'estimate', round(ade, 4) FROM med_f
UNION ALL SELECT 'mediation', 'ade', 'stderr', round(se_ade, 4) FROM med_f
UNION ALL SELECT 'mediation', 'total', 'estimate', round(c, 4) FROM med_f
UNION ALL SELECT 'mediation', 'total', 'stderr', round(se_c, 4) FROM med_f
UNION ALL SELECT 'mediation', 'path_a', 'estimate', round(a, 4) FROM med_f
UNION ALL SELECT 'mediation', 'path_a', 'stderr', round(se_a, 4) FROM med_f
UNION ALL SELECT 'mediation', 'path_b', 'estimate', round(b, 4) FROM med_f
UNION ALL SELECT 'mediation', 'path_b', 'stderr', round(se_b, 4) FROM med_f
UNION ALL SELECT 'mediation', 'prop_mediated', 'estimate',
       round(acme / (ade + acme), 4) FROM med_f
UNION ALL SELECT 'mediation', 'sobel_z', 'estimate',
       round(acme / se_acme, 4) FROM med_f
UNION ALL SELECT 'oaxaca', item, 'value', value FROM (
  WITH ob AS (
    SELECT l_extendedprice AS y, l_quantity AS x,
           CASE WHEN l_orderkey % 2 = 1 THEN 'A' ELSE 'B' END AS g
    FROM lineitem
  ), ob_g AS (
    SELECT g, avg(y) AS ybar, avg(x) AS xbar FROM ob GROUP BY g
  ), ob_p AS (
    SELECT regr_slope(y, x) AS b FROM ob
  ), ob_f AS (
    SELECT (a.ybar - b.ybar) AS gap,
           (a.xbar - b.xbar) * p.b AS explained
    FROM (SELECT * FROM ob_g WHERE g = 'A') a,
         (SELECT * FROM ob_g WHERE g = 'B') b, ob_p p
  )
  SELECT 'total_gap' AS item, round(gap, 6) AS value FROM ob_f
  UNION ALL SELECT 'explained', round(explained, 6) FROM ob_f
  UNION ALL SELECT 'unexplained', round(gap - explained, 6) FROM ob_f
  UNION ALL SELECT 'explained:l_quantity', round(explained, 6) FROM ob_f
) __ob
"""


def q_matrix_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix + grouped Pearson r/t as one family (absorbs the former
    matrix_multiplication / pearsonr gate keys)."""
    rows = []
    gram, pr = _concurrent([
        lambda: q_matrix_multiplication(spark, sf_dir).toPandas(),
        lambda: q_pearsonr(spark, sf_dir).toPandas(),
    ])
    for r in gram.itertuples():
        rows.append({"variant": "gram", "item": str(int(r.i)),
                     "stat": str(int(r.j)), "value": float(r.value)})
    for r in pr.itertuples():
        for stat in ("r", "n", "t_stat"):
            rows.append({"variant": "pearsonr", "item": str(r.l_returnflag),
                         "stat": stat, "value": float(getattr(r, stat))})
    return _long_rows(spark, rows)


_MATRIX_OPS_SQL = f"""
WITH g AS ({_MATRIX_SQL}), p AS ({_PEARSONR_SQL})
SELECT 'gram' AS variant, CAST(i AS VARCHAR) AS item, CAST(j AS VARCHAR) AS stat,
       round(value, 6) AS value FROM g
UNION ALL SELECT 'pearsonr', l_returnflag, 'r', round(r, 6) FROM p
UNION ALL SELECT 'pearsonr', l_returnflag, 'n', CAST(n AS DOUBLE) FROM p
UNION ALL SELECT 'pearsonr', l_returnflag, 't_stat', round(t_stat, 6) FROM p
"""


def g_survival_cox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-PH rows of the survival family in long format — BOTH tie
    approximations — plus the Weibull-AFT parametric fit (golden-snapshot
    sub-oracle: iterative Newton solves, not SQL-expressible)."""
    from fast_causal_inference_spark.operators.survival import (
        cox_ph,
        weibull_aft,
    )

    from fast_causal_inference_spark.operators.survival import (
        proportional_hazards_test,
    )

    ev = _load(spark, sf_dir, "events") \
        .withColumn("t_", F.round(F.col("value"), 0)) \
        .withColumn("e_", (F.col("event_id") % 4 != 0).cast("int")) \
        .withColumn("x_", (F.col("user_id") % 5).cast("double"))
    # the four solves (2 Cox ties, the Grambsch-Therneau grid scan at
    # the Breslow fit, Weibull AFT) are independent iterative fits —
    # overlap their (fixed-cost-dominated) Newton scans
    cox_b, cox_e, ph, aft = _concurrent([
        lambda: cox_ph(ev, "t_", "e_", ["x_"], ties="breslow"),
        lambda: cox_ph(ev, "t_", "e_", ["x_"], ties="efron"),
        lambda: proportional_hazards_test(ev, "t_", "e_", ["x_"],
                                          transform="km"),
        lambda: weibull_aft(
            ev.withColumn("t_", F.round(F.abs("value"), 0) + 1.0),
            "t_", "e_", ["x_"]),
    ])
    rows = []
    for variant, pdf in (("cox", cox_b), ("cox_efron", cox_e)):
        for r in pdf.itertuples():
            for stat in ("coef", "hazard_ratio", "stderr", "z", "p_value"):
                rows.append({"variant": variant, "item": str(r.name),
                             "stat": stat,
                             "value": round(float(getattr(r, stat)), 6)})
    for r in ph.itertuples():
        for stat in ("chi2", "p_value"):
            rows.append({"variant": "ph_test", "item": str(r.name),
                         "stat": stat,
                         "value": round(float(getattr(r, stat)), 6)})
    for r in aft.itertuples():
        for stat in ("coef", "time_ratio", "stderr", "z"):
            rows.append({"variant": "aft_weibull", "item": str(r.name),
                         "stat": stat,
                         "value": round(float(getattr(r, stat)), 6)})
    for stat in ("loglik", "scale", "n_events"):
        rows.append({"variant": "aft_weibull", "item": "model",
                     "stat": stat, "value": round(float(aft.attrs[stat]), 4)})
    return _long_rows(spark, rows)


def q_survival_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve + Cox PH (Breslow + Efron) + stratified
    log-rank + Aalen-Johansen competing-risks CIF as one survival family
    (absorbs the former survival_km / cox_ph gate keys).  The AJ rows
    are fully SQL-re-derived (window cumulative hazard products, same
    machinery as the KM oracle)."""
    from fast_causal_inference_spark.operators.survival import (
        aalen_johansen,
        stratified_logrank_test,
    )

    def _slr():
        li = _load(spark, sf_dir, "lineitem") \
            .withColumn("t_", (F.col("l_quantity") % 10 + 1)) \
            .withColumn("e_", (F.col("l_orderkey") % 3 > 0).cast("int")) \
            .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
        return stratified_logrank_test(li, "t_", "e_", "arm",
                                       ["l_returnflag"]).iloc[0]

    def _aj():
        ev = _load(spark, sf_dir, "events") \
            .withColumn("t_", F.round(F.col("value") / 10.0)
                        .cast("double")) \
            .withColumn("c_", (F.col("event_id") % 3).cast("int"))
        return aalen_johansen(ev, "t_", "c_")

    def _rmst():
        from fast_causal_inference_spark.operators.survival import rmst

        ev = _load(spark, sf_dir, "events") \
            .withColumn("t_", F.round(F.col("value") / 10.0)
                        .cast("double")) \
            .withColumn("e_", (F.col("event_id") % 5 != 0).cast("int"))
        return rmst(ev, "t_", "e_", tau=8.0)

    km, cox, slr, aj, rm = _concurrent([
        lambda: q_survival_km(spark, sf_dir).toPandas(),
        lambda: g_survival_cox(spark, sf_dir),
        _slr,
        _aj,
        _rmst,
    ])
    rows = []
    for r in km.itertuples():
        for stat in ("n_risk", "n_event", "survival"):
            rows.append({"variant": "km", "item": str(int(r.time)),
                         "stat": stat, "value": float(getattr(r, stat))})
    for stat in ("chi2", "observed1", "expected1", "n_strata"):
        rows.append({"variant": "logrank_strat", "item": "lineitem",
                     "stat": stat, "value": round(float(slr[stat]), 6)})
    for r in aj.itertuples():
        rows.append({"variant": "aj",
                     "item": f"{int(r.cause)}:{int(r.time)}",
                     "stat": "cif", "value": round(float(r.cif), 6)})
        rows.append({"variant": "aj",
                     "item": f"{int(r.cause)}:{int(r.time)}",
                     "stat": "n_event", "value": float(r.n_event)})
    for stat in ("rmst", "stderr", "events"):
        rows.append({"variant": "rmst", "item": "tau8", "stat": stat,
                     "value": round(float(rm[stat].iloc[0]), 6)})
    return _long_rows(spark, rows).unionByName(cox)


_KM_LONG_SQL = f"""
WITH km AS ({_KM_SQL})
SELECT 'km' AS variant, CAST(CAST(time AS BIGINT) AS VARCHAR) AS item,
       'n_risk' AS stat, n_risk AS value FROM km
UNION ALL SELECT 'km', CAST(CAST(time AS BIGINT) AS VARCHAR), 'n_event',
       n_event FROM km
UNION ALL SELECT 'km', CAST(CAST(time AS BIGINT) AS VARCHAR), 'survival',
       survival FROM km
UNION ALL SELECT 'aj', item, stat, value FROM (
  WITH aj_cells AS (
    SELECT CAST(round(value/10.0) AS DOUBLE) AS tm,
           CAST(event_id % 3 AS INT) AS cause, count(*) AS n
    FROM events GROUP BY 1, 2
  ), aj_grid AS (
    SELECT tm, CAST(sum(n) AS DOUBLE) AS n_leave,
           CAST(sum(CASE WHEN cause <> 0 THEN n ELSE 0 END) AS DOUBLE)
             AS d_all,
           CAST(sum(CASE WHEN cause = 1 THEN n ELSE 0 END) AS DOUBLE) AS d1,
           CAST(sum(CASE WHEN cause = 2 THEN n ELSE 0 END) AS DOUBLE) AS d2
    FROM aj_cells GROUP BY 1
  ), aj_risk AS (
    SELECT tm, d_all, d1, d2,
           sum(n_leave) OVER (ORDER BY tm DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS n_risk
    FROM aj_grid
  ), aj_s AS (
    SELECT tm, d1, d2, n_risk,
           coalesce(exp(sum(ln(1 - d_all/n_risk)) OVER (ORDER BY tm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 1.0)
             AS s_prev
    FROM aj_risk
  ), aj_cif AS (
    SELECT tm,
           sum(s_prev * d1 / n_risk) OVER (ORDER BY tm) AS cif1,
           sum(s_prev * d2 / n_risk) OVER (ORDER BY tm) AS cif2,
           d1, d2
    FROM aj_s
  )
  SELECT '1:' || CAST(CAST(tm AS BIGINT) AS VARCHAR) AS item,
         'cif' AS stat, round(cif1, 6) AS value FROM aj_cif
  UNION ALL SELECT '1:' || CAST(CAST(tm AS BIGINT) AS VARCHAR), 'n_event',
         d1 FROM aj_cif
  UNION ALL SELECT '2:' || CAST(CAST(tm AS BIGINT) AS VARCHAR), 'cif',
         round(cif2, 6) FROM aj_cif
  UNION ALL SELECT '2:' || CAST(CAST(tm AS BIGINT) AS VARCHAR), 'n_event',
         d2 FROM aj_cif
) __aj
UNION ALL SELECT 'rmst', 'tau8', stat, value FROM (
  WITH rm_km AS (
    SELECT CAST(round(value/10.0) AS DOUBLE) AS tm,
           CAST(sum(CASE WHEN event_id % 5 != 0 THEN 1 ELSE 0 END)
                AS DOUBLE) AS d,
           CAST(count(*) AS DOUBLE) AS n_leave
    FROM events GROUP BY 1
  ), rm_risk AS (
    SELECT tm, d,
           sum(n_leave) OVER (ORDER BY tm DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS n_risk
    FROM rm_km
  ), rm_s AS (   -- unrounded KM survival at each grid time
    SELECT tm, d, n_risk,
           exp(sum(ln((n_risk - d)/n_risk)) OVER (ORDER BY tm)) AS s
    FROM rm_risk
  ), rm_seg AS (
    SELECT tm, d, n_risk, s,
           s * greatest(0.0, least(coalesce(lead(tm) OVER (ORDER BY tm),
                                            1e300), 8.0)
                             - least(tm, 8.0)) AS area
    FROM rm_s
  ), rm_sfx AS (
    SELECT tm, d, n_risk,
           sum(area) OVER (ORDER BY tm DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS a_int
    FROM rm_seg
  ), rm_f AS (
    SELECT (SELECT least(min(tm), 8.0) FROM rm_km)
           + (SELECT sum(area) FROM rm_seg) AS mu,
           (SELECT sum(a_int * a_int * d / (n_risk * (n_risk - d)))
            FROM rm_sfx WHERE tm <= 8.0 AND d > 0 AND n_risk > d) AS v,
           (SELECT sum(d) FROM rm_km WHERE tm <= 8.0) AS ev
  )
  SELECT 'rmst' AS stat, round(mu, 6) AS value FROM rm_f
  UNION ALL SELECT 'stderr', round(sqrt(v), 6) FROM rm_f
  UNION ALL SELECT 'events', round(ev, 6) FROM rm_f
) __rm
UNION ALL
SELECT 'logrank_strat', 'lineitem', stat, round(value, 6) FROM (
  WITH slr_cells AS (
    SELECT l_returnflag AS s, l_quantity % 10 + 1 AS tm,
           CAST(count(*) FILTER (l_orderkey % 2 = 0) AS DOUBLE) AS n0,
           CAST(count(*) FILTER (l_orderkey % 2 = 1) AS DOUBLE) AS n1,
           CAST(count(*) FILTER (l_orderkey % 2 = 0
                                 AND l_orderkey % 3 > 0) AS DOUBLE) AS d0,
           CAST(count(*) FILTER (l_orderkey % 2 = 1
                                 AND l_orderkey % 3 > 0) AS DOUBLE) AS d1
    FROM lineitem GROUP BY 1, 2
  ), slr_risk AS (
    SELECT s, tm, d0, d1,
           sum(n0) OVER (PARTITION BY s ORDER BY tm DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS r0,
           sum(n1) OVER (PARTITION BY s ORDER BY tm DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS r1
    FROM slr_cells
  ), slr_terms AS (
    SELECT d1 - (d0 + d1) * r1 / (r0 + r1) AS ome,
           CASE WHEN r0 + r1 > 1 THEN
             (d0 + d1) * (r1/(r0+r1)) * (r0/(r0+r1))
             * (r0 + r1 - d0 - d1) / (r0 + r1 - 1)
           ELSE 0 END AS v,
           d1, (d0 + d1) * r1 / (r0 + r1) AS e1
    FROM slr_risk
  ), slr_f AS (
    SELECT sum(ome) AS ome, sum(v) AS v, sum(d1) AS obs1,
           sum(e1) AS exp1,
           (SELECT CAST(count(DISTINCT s) AS DOUBLE) FROM slr_cells) AS ns
    FROM slr_terms
  )
  SELECT 'chi2' AS stat, ome*ome/v AS value FROM slr_f
  UNION ALL SELECT 'observed1', obs1 FROM slr_f
  UNION ALL SELECT 'expected1', exp1 FROM slr_f
  UNION ALL SELECT 'n_strata', ns FROM slr_f
)
"""


def g_matching_entropy(spark: SparkSession, sf_dir: str,
                       li: DataFrame | None = None) -> DataFrame:
    """Entropy-balancing rows of the matching family (golden sub-oracle:
    the dual logsumexp Newton solve is iterative, not SQL-expressible).
    Balances quantity+discount of the control arm to the treated arm and
    reports the dual coefficients, weighted-ATT inference, and the
    control effective sample size."""
    from fast_causal_inference_spark.operators.balancing import (
        entropy_balancing,
    )

    if li is None:
        li = _load(spark, sf_dir, "lineitem") \
            .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
    eb = entropy_balancing(li, "arm", ["l_quantity", "l_discount"])
    att = eb.att(li, "l_extendedprice").iloc[0]
    rows = [{"variant": "entropy", "item": feat, "stat": "lambda",
             "value": round(float(lj), 6)}
            for feat, lj in zip(eb.features, eb.lam)]
    for stat in ("ATT", "stderr", "mu_control_weighted", "ess_control"):
        rows.append({"variant": "entropy", "item": "att", "stat": stat,
                     "value": round(float(att[stat]), 4)})
    return _long_rows(spark, rows)


def g_matching_prognostic(spark: SparkSession, sf_dir: str,
                          li: DataFrame | None = None) -> DataFrame:
    """Prognostic-score matching rows (golden sub-oracle: the score is a
    control-arm OLS prediction, and floor-bucketing an fp score makes a
    cross-engine SQL re-derivation boundary-fragile; the per-cell quota
    accounting is deterministic within Spark — proven by gen_goldens'
    two-process probe)."""
    from fast_causal_inference_spark.operators.matching import (
        prognostic_score_matching,
    )

    if li is None:
        li = _load(spark, sf_dir, "lineitem") \
            .withColumn("arm", (F.col("l_orderkey") % 2).cast("int"))
    m = prognostic_score_matching(li, "l_extendedprice", "arm",
                                  ["l_quantity"], caliper=2000.0)
    out = (m.where(F.col("match_index").isNotNull())
           .groupBy(F.floor(F.col("__prognostic") / 2000.0).alias("cell"))
           .agg(F.count(F.lit(1)).alias("n_matched"),
                F.sum("arm").alias("n_treated")))
    # one pass: the former self-unionByName of two projections of `out`
    # executed the whole window-matching pipeline TWICE (two identical
    # scan→window→agg subtrees in the plan); stack() emits both long
    # rows per cell from a single execution — same rows, order aside
    return out.select(
        F.lit("prognostic").alias("variant"),
        F.col("cell").cast("string").alias("item"),
        F.expr("stack(2, 'n_matched', cast(n_matched as double), "
               "'n_treated', cast(n_treated as double)) "
               "as (stat, value)"))


def q_paired_ttest(spark: SparkSession, sf_dir: str,
                   ev: DataFrame | None = None) -> DataFrame:
    """Matched-pairs t-test on a DETERMINISTIC 1:2 pairing (pair =
    event_id div 3, treated = the id divisible by 3): pairing is an
    INPUT to ``matched_pairs_ttest`` — the operator's job (per-pair
    conditional aggregation, the 1-treated/k-controls filter, NULL
    policy, the one-sample test on diffs) is exactly what DuckDB
    re-derives, with no dependence on a stochastic assignment."""
    from fast_causal_inference_spark.operators.matching import (
        matched_pairs_ttest,
    )

    if ev is None:
        ev = _load(spark, sf_dir, "events")
    pe = (ev.withColumn("pair", F.floor(F.col("event_id") / 3))
            .withColumn("parm", (F.col("event_id") % 3 == 0).cast("int")))
    return matched_pairs_ttest(pe, "value", "parm", "pair")


def q_matching_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact matching quotas + caliper cell accounting + SMD balance +
    matched-pairs t-test + prognostic-score matching + Rosenbaum Γ
    sensitivity bounds as one matching family (absorbs exact_matching /
    caliper_matching / smd; prognostic rides a golden sub-oracle; the
    Rosenbaum signed-rank stats are SQL-re-derived)."""
    from fast_causal_inference_spark.operators.sensitivity import (
        rosenbaum_bounds,
    )

    # ONE lazy base per source table threads through the sub-oracles
    # (events: paired t + Rosenbaum; orders: exact + caliper; lineitem:
    # smd + prognostic + entropy), but deliberately NOT persisted: an
    # A/B at sf1 measured the persisted variant ~2 s SLOWER than the
    # per-oracle pruned parquet re-scans it replaced (OS page cache
    # makes the decodes nearly free; the materialization barrier before
    # the fan-out is pure added wall — see COVERAGE.md).
    ev = _load(spark, sf_dir, "events")
    o = (_load(spark, sf_dir, "orders")
         .withColumn("arm", (F.col("o_orderkey") % 2).cast("int")))
    li = (_load(spark, sf_dir, "lineitem")
          .withColumn("arm", (F.col("l_orderkey") % 2).cast("int")))

    def _ros():
        return rosenbaum_bounds(ev, "value",
                                "cast(event_id % 3 = 0 as int)",
                                "floor(event_id / 3)", gammas=(1.0, 2.0))

    rows = []
    ex, cal, sm, pr, prog, ros, ent = _concurrent([
        lambda: q_exact_matching(spark, sf_dir, o=o).toPandas(),
        lambda: q_caliper_matching(spark, sf_dir, o=o).toPandas(),
        lambda: q_smd(spark, sf_dir, li=li).toPandas(),
        lambda: q_paired_ttest(spark, sf_dir, ev=ev).toPandas(),
        lambda: g_matching_prognostic(spark, sf_dir, li=li),
        _ros,
        lambda: g_matching_entropy(spark, sf_dir, li=li),
    ])
    for r in ros.itertuples():
        for stat in ("z_upper", "z_lower"):
            rows.append({"variant": "rosenbaum",
                         "item": f"gamma_{int(r.gamma)}", "stat": stat,
                         "value": round(float(getattr(r, stat)), 6)})
    rows.append({"variant": "rosenbaum", "item": "all", "stat": "n_pairs",
                 "value": float(ros.iloc[0].n_pairs)})
    rows.append({"variant": "rosenbaum", "item": "all", "stat": "t_plus",
                 "value": round(float(ros.iloc[0].t_plus), 4)})
    for r in ex.itertuples():
        rows.append({"variant": "exact", "item": str(r.o_orderpriority),
                     "stat": "n_matched", "value": float(r.n_matched)})
        rows.append({"variant": "exact", "item": str(r.o_orderpriority),
                     "stat": "n_treated", "value": float(r.n_treated)})
    for r in cal.itertuples():
        rows.append({"variant": "caliper", "item": str(int(r.bucket)),
                     "stat": "n_matched", "value": float(r.n_matched)})
        rows.append({"variant": "caliper", "item": str(int(r.bucket)),
                     "stat": "n_treated", "value": float(r.n_treated)})
    for r in sm.itertuples():
        for stat in ("mean0", "mean1", "smd"):
            rows.append({"variant": "smd", "item": str(r.covariate),
                         "stat": stat, "value": float(getattr(r, stat))})
    for stat in ("n", "estimate", "stderr", "t_stat"):
        rows.append({"variant": "paired", "item": "all", "stat": stat,
                     "value": round(float(pr.iloc[0][stat]), 6)})
    return _long_rows(spark, rows).unionByName(prog).unionByName(ent)


_MATCHING_FAMILY_SQL = f"""
WITH ex AS ({_EXACT_MATCHING_SQL}), cal AS ({_CALIPER_SQL}),
     sm AS ({_SMD_SQL}),
pr_cells AS (
  SELECT floor(event_id / 3) AS pair,
         sum(value) FILTER (event_id % 3 = 0) AS yt,
         avg(value) FILTER (event_id % 3 <> 0) AS yc,
         count(value) FILTER (event_id % 3 = 0) AS nt,
         count(value) FILTER (event_id % 3 <> 0) AS nc
  FROM events GROUP BY 1
), pr_d AS (SELECT yt - yc AS d FROM pr_cells WHERE nt = 1 AND nc >= 1),
pr_stats AS (
  SELECT CAST(count(d) AS DOUBLE) AS n, avg(d) AS m, var_samp(d) AS v
  FROM pr_d
),
ros_cells AS (
  SELECT floor(event_id / 3) AS pair,
         avg(value) FILTER (event_id % 3 = 0) AS yt,
         avg(value) FILTER (event_id % 3 <> 0) AS yc
  FROM events GROUP BY 1
),
ros_d AS (SELECT yt - yc AS d FROM ros_cells
          WHERE yt IS NOT NULL AND yc IS NOT NULL AND yt <> yc),
ros_r AS (
  SELECT d, rank() OVER (ORDER BY abs(d))
            + (count(*) OVER (PARTITION BY abs(d)) - 1) / 2.0 AS r
  FROM ros_d
),
ros_s AS (
  SELECT sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS tplus,
         sum(r) AS s1, sum(r * r) AS s2,
         CAST(count(*) AS DOUBLE) AS n
  FROM ros_r
),
ros_z AS (
  SELECT g.gamma, s.tplus, s.n,
         (s.tplus - (g.gamma/(1+g.gamma)) * s.s1)
           / sqrt((g.gamma/(1+g.gamma)) * (1/(1+g.gamma)) * s.s2) AS zu,
         (s.tplus - (1/(1+g.gamma)) * s.s1)
           / sqrt((1/(1+g.gamma)) * (g.gamma/(1+g.gamma)) * s.s2) AS zl
  FROM ros_s s CROSS JOIN (VALUES (1.0), (2.0)) g(gamma)
)
SELECT 'rosenbaum' AS variant, 'gamma_' || CAST(CAST(gamma AS INT) AS VARCHAR)
       AS item, 'z_upper' AS stat, round(zu, 6) AS value FROM ros_z
UNION ALL SELECT 'rosenbaum', 'gamma_' || CAST(CAST(gamma AS INT) AS VARCHAR),
       'z_lower', round(zl, 6) FROM ros_z
UNION ALL SELECT 'rosenbaum', 'all', 'n_pairs', n FROM ros_s
UNION ALL SELECT 'rosenbaum', 'all', 't_plus', round(tplus, 4) FROM ros_s
UNION ALL
SELECT 'exact' AS variant, o_orderpriority AS item, 'n_matched' AS stat,
       CAST(n_matched AS DOUBLE) AS value FROM ex
UNION ALL SELECT 'exact', o_orderpriority, 'n_treated',
       CAST(n_treated AS DOUBLE) FROM ex
UNION ALL SELECT 'caliper', CAST(bucket AS VARCHAR), 'n_matched',
       CAST(n_matched AS DOUBLE) FROM cal
UNION ALL SELECT 'caliper', CAST(bucket AS VARCHAR), 'n_treated',
       CAST(n_treated AS DOUBLE) FROM cal
UNION ALL SELECT 'smd', covariate, 'mean0', mean0 FROM sm
UNION ALL SELECT 'smd', covariate, 'mean1', mean1 FROM sm
UNION ALL SELECT 'smd', covariate, 'smd', smd FROM sm
UNION ALL SELECT 'paired', 'all', 'n', round(n, 6) FROM pr_stats
UNION ALL SELECT 'paired', 'all', 'estimate', round(m, 6) FROM pr_stats
UNION ALL SELECT 'paired', 'all', 'stderr', round(sqrt(v/n), 6)
FROM pr_stats
UNION ALL SELECT 'paired', 'all', 't_stat', round(m/sqrt(v/n), 6)
FROM pr_stats
"""


def g_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF rows of the knn family (golden-snapshot sub-oracle: the coarse
    quantizer is a seeded iterative k-means)."""
    return q_ivf_knn(spark, sf_dir).select(
        F.lit("ivf").alias("variant"), "query_id", "vec_id", "rank", "score")


def g_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN rows of the knn family (golden-snapshot
    sub-oracle: seeded random hyperplane tables; candidates reranked
    exactly, so the rows are deterministic given the seed)."""
    from fast_causal_inference_spark.datapipe.similarity import lsh_knn

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    out = lsh_knn(emb, q, k=5, dim=64, n_tables=8, n_planes=10, seed=7)
    return out.select(F.lit("lsh").alias("variant"), "query_id", "vec_id",
                      "rank", F.round("score", 4).alias("score"))


def g_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN rows of the knn family (golden-snapshot sub-oracle:
    seeded coarse + product-quantizer k-means; candidates are reranked
    with exact cosine, so rows are deterministic given the seed)."""
    from fast_causal_inference_spark.datapipe.similarity import ivfpq_knn

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    out = ivfpq_knn(emb, q, k=5, n_lists=16, m=8, ks=32, n_probe=6,
                    refine=4, seed=7)
    return out.select(F.lit("pq").alias("variant"), "query_id", "vec_id",
                      "rank", F.round("score", 4).alias("score"))


def g_knn_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text top-5 rows of the retrieval family (fully
    SQL-derivable: DuckDB re-derives postings, idf, and the Okapi score
    from the same tokenization)."""
    from fast_causal_inference_spark.datapipe.retrieval import bm25_search

    d = _load(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        [(0, "spark query join"), (1, "merge sort window"),
         (2, "customer big data stream")],
        "query_id bigint, query string")
    out = bm25_search(d, qdf, k=5)
    return out.select(F.lit("bm25").alias("variant"), "query_id",
                      F.col("id").alias("vec_id"), "rank",
                      F.round("score", 4).alias("score"))


def g_knn_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine top-5 rows of the retrieval family (fully
    SQL-derivable: DuckDB re-derives the ln-scaled postings weights, the
    smooth idf, both norms — including the out-of-vocabulary query-term
    contribution ('zzqx' never appears in the corpus but must still
    carry weight in the query norm) — and the sparse-dot cosine).  One
    query repeats a term so the ln(qtf) multiplicity path is checked."""
    from fast_causal_inference_spark.datapipe.retrieval import tfidf_search

    d = _load(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        [(0, "spark query join"), (1, "data data stream zzqx")],
        "query_id bigint, query string")
    out = tfidf_search(d, qdf, k=5)
    return out.select(F.lit("tfidf").alias("variant"), "query_id",
                      F.col("id").alias("vec_id"), "rank",
                      F.round("score", 4).alias("score"))


def q_knn_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval family: exact brute-force + IVF approximate cosine top-k
    over embeddings, and BM25 + TF-IDF full-text top-k over documents
    (absorbs the former knn_bruteforce / ivf_knn gate keys)."""
    # the IVF and BM25 members do eager driver-side model/index builds at
    # construction — build all members concurrently, then union
    exact_df, ivf_df, lsh_df, pq_df, bm25_df, tfidf_df = _concurrent([
        lambda: q_knn_bruteforce(spark, sf_dir).select(
            F.lit("exact").alias("variant"), "query_id", "vec_id", "rank",
            "score"),
        lambda: g_knn_ivf(spark, sf_dir),
        lambda: g_knn_lsh(spark, sf_dir),
        lambda: g_knn_pq(spark, sf_dir),
        lambda: g_knn_bm25(spark, sf_dir),
        lambda: g_knn_tfidf(spark, sf_dir),
    ])
    return (exact_df.unionByName(ivf_df).unionByName(lsh_df)
            .unionByName(pq_df).unionByName(bm25_df)
            .unionByName(tfidf_df))


def q_multi_arm_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-arm test family: classic one-way ANOVA, Welch ANOVA, Bartlett
    variance homogeneity, Kruskal-Wallis rank test — one suff-stats pass
    each over a 3-arm split of events (p-values are deterministic
    functions of (stat, df), pytest-checked; the gate pins stat+df) —
    plus the Bayesian A/B readout on a 2-arm split (posterior params are
    exact suff-stat functions, fully SQL-derivable; P(win)/expected loss
    need erf and stay pytest-gated)."""
    from fast_causal_inference_spark.operators.anova import (
        anova_oneway,
        bartlett_test,
        dunnett_test,
        kruskal_wallis_test,
    )
    from fast_causal_inference_spark.operators.bayes import (
        bayes_ab_binary,
        bayes_ab_continuous,
    )

    ev = _load(spark, sf_dir, "events") \
        .withColumn("arm", (F.col("user_id") % 3).cast("int"))
    ev2 = ev.withColumn("arm2", (F.col("user_id") % 2).cast("int")) \
        .withColumn("converted", (F.col("value") > 25).cast("int"))
    rows = []
    a, w, b, kw, bb, bc, dn = [pdf.iloc[0] if pdf.index.size == 1 else pdf
                               for pdf in _concurrent([
        lambda: anova_oneway(ev, "value", "arm"),
        lambda: anova_oneway(ev, "value", "arm", equal_var=False),
        lambda: bartlett_test(ev, "value", "arm"),
        lambda: kruskal_wallis_test(ev, "value", "arm"),
        lambda: bayes_ab_binary(ev2, "converted", "arm2"),
        lambda: bayes_ab_continuous(ev2, "value", "arm2"),
        lambda: dunnett_test(ev, "value", "arm", control=0),
    ])]
    for _, r in dn.iterrows():
        for stat in ("estimate", "stderr", "z"):
            rows.append({"variant": "dunnett", "item": f"arm{r['arm']}",
                         "stat": stat, "value": round(float(r[stat]), 6)})
    for _, r in bb.iterrows():
        for stat in ("n", "successes", "alpha", "beta", "posterior_mean"):
            rows.append({"variant": "bayes_binary",
                         "item": f"arm{int(r['arm'])}", "stat": stat,
                         "value": round(float(r[stat]), 6)})
    for _, r in bc.iterrows():
        for stat in ("n", "posterior_mean", "posterior_sd"):
            rows.append({"variant": "bayes_continuous",
                         "item": f"arm{int(r['arm'])}", "stat": stat,
                         "value": round(float(r[stat]), 6)})
    for stat in ("f_stat", "df_between", "df_within", "eta_squared",
                 "n", "k"):
        rows.append({"variant": "anova_classic", "item": "value",
                     "stat": stat, "value": float(a[stat])})
    for stat in ("f_stat", "df_between", "df_within"):
        rows.append({"variant": "anova_welch", "item": "value",
                     "stat": stat, "value": float(w[stat])})
    for stat in ("statistic", "df"):
        rows.append({"variant": "bartlett", "item": "value", "stat": stat,
                     "value": float(b[stat])})
    for stat in ("statistic", "df", "n", "k"):
        rows.append({"variant": "kruskal_wallis", "item": "value",
                     "stat": stat, "value": float(kw[stat])})
    return _long_rows(spark, rows)


_MULTI_ARM_SQL = """
WITH arms AS (
  SELECT CAST(user_id % 3 AS INT) AS arm,
         CAST(count(*) AS DOUBLE) AS n, avg(value) AS m,
         var_samp(value) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1
), tot AS (
  SELECT sum(n) AS n, count(*) AS k, sum(n*m)/sum(n) AS grand FROM arms
), classic AS (
  SELECT (SELECT n FROM tot) AS n, (SELECT k FROM tot) AS k,
         sum(n*(m - (SELECT grand FROM tot))*(m - (SELECT grand FROM tot)))
           AS ssb,
         sum((n-1)*v) AS ssw
  FROM arms
), welch_w AS (
  SELECT arm, n, m, v, n/v AS w FROM arms
), welch_g AS (
  SELECT sum(w) AS sw, sum(w*m)/sum(w) AS grand,
         (SELECT k FROM tot) AS k
  FROM welch_w
), welch AS (
  SELECT g.k,
         sum(w.w*(w.m - g.grand)*(w.m - g.grand)) / (g.k - 1) AS num,
         sum((1 - w.w/g.sw)*(1 - w.w/g.sw)/(w.n - 1)) AS lam
  FROM welch_w w, welch_g g GROUP BY g.k, g.sw
), bart AS (
  SELECT (SELECT n FROM tot) AS n, (SELECT k FROM tot) AS k,
         sum((n-1)*ln(v)) AS slnv,
         sum(1.0/(n-1)) AS sinv,
         sum((n-1)*v) AS ssw
  FROM arms
), vals AS (
  SELECT value AS val, CAST(user_id % 3 AS INT) AS arm FROM events
  WHERE value IS NOT NULL
), dv AS (
  SELECT val, arm, CAST(count(*) AS DOUBLE) AS c FROM vals GROUP BY 1, 2
), tv AS (
  SELECT val, sum(c) AS t,
         coalesce(sum(sum(c)) OVER (ORDER BY val
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before
  FROM dv GROUP BY val
), kw_arm AS (
  SELECT d.arm, sum(d.c) AS n_a,
         sum(d.c * (t.before + (t.t + 1.0)/2.0)) AS r_a
  FROM dv d JOIN tv t ON d.val = t.val GROUP BY d.arm
), kw AS (
  SELECT (SELECT sum(n_a) FROM kw_arm) AS n,
         (SELECT count(*) FROM kw_arm) AS k,
         (SELECT sum(r_a*r_a/n_a) FROM kw_arm) AS s,
         (SELECT sum(t*t*t - t) FROM tv) AS ties
)
SELECT 'anova_classic' AS variant, 'value' AS item, 'f_stat' AS stat,
       round((ssb/(k-1)) / (ssw/(n-k)), 6) AS value FROM classic
UNION ALL SELECT 'anova_classic', 'value', 'df_between',
       CAST(k - 1 AS DOUBLE) FROM classic
UNION ALL SELECT 'anova_classic', 'value', 'df_within', n - k FROM classic
UNION ALL SELECT 'anova_classic', 'value', 'eta_squared',
       round(ssb/(ssb + ssw), 6) FROM classic
UNION ALL SELECT 'anova_classic', 'value', 'n', n FROM classic
UNION ALL SELECT 'anova_classic', 'value', 'k', CAST(k AS DOUBLE) FROM classic
UNION ALL SELECT 'anova_welch', 'value', 'f_stat',
       round(num / (1.0 + 2.0*(k-2)/(k*k - 1.0)*lam), 6) FROM welch
UNION ALL SELECT 'anova_welch', 'value', 'df_between',
       CAST(k - 1 AS DOUBLE) FROM welch
UNION ALL SELECT 'anova_welch', 'value', 'df_within',
       round((k*k - 1.0)/(3.0*lam), 6) FROM welch
UNION ALL SELECT 'bartlett', 'value', 'statistic',
       round(((n-k)*ln(ssw/(n-k)) - slnv)
             / (1.0 + (sinv - 1.0/(n-k))/(3.0*(k-1))), 6) FROM bart
UNION ALL SELECT 'bartlett', 'value', 'df', CAST(k - 1 AS DOUBLE) FROM bart
UNION ALL SELECT 'kruskal_wallis', 'value', 'statistic',
       round((12.0/(n*(n+1.0))*s - 3.0*(n+1.0))
             / (1.0 - ties/(n*n*n - n)), 6) FROM kw
UNION ALL SELECT 'kruskal_wallis', 'value', 'df',
       CAST(k - 1 AS DOUBLE) FROM kw
UNION ALL SELECT 'kruskal_wallis', 'value', 'n', n FROM kw
UNION ALL SELECT 'kruskal_wallis', 'value', 'k', CAST(k AS DOUBLE) FROM kw
UNION ALL
SELECT 'dunnett', 'arm' || CAST(t.arm AS VARCHAR), stat, round(value, 6)
FROM (
  SELECT t.arm,
         t.m - c.m AS estimate,
         sqrt(t.v/t.n + c.v/c.n) AS stderr,
         (t.m - c.m) / sqrt(t.v/t.n + c.v/c.n) AS z
  FROM (SELECT * FROM arms WHERE arm <> 0) t,
       (SELECT * FROM arms WHERE arm = 0) c
) t, LATERAL (VALUES ('estimate', t.estimate), ('stderr', t.stderr),
              ('z', t.z)) AS s(stat, value)
UNION ALL SELECT 'bayes_binary', 'arm' || CAST(arm2 AS VARCHAR), stat, value
FROM (
  SELECT CAST(user_id % 2 AS INT) AS arm2,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN value > 25 THEN 1 ELSE 0 END) AS DOUBLE) AS s
  FROM events GROUP BY 1
) bb, LATERAL (VALUES
  ('n', bb.n), ('successes', bb.s),
  ('alpha', round(1.0 + bb.s, 6)), ('beta', round(1.0 + bb.n - bb.s, 6)),
  ('posterior_mean', round((1.0 + bb.s)/(2.0 + bb.n), 6))
) AS v(stat, value)
UNION ALL SELECT 'bayes_continuous', 'arm' || CAST(arm2 AS VARCHAR), stat,
       value
FROM (
  SELECT CAST(user_id % 2 AS INT) AS arm2,
         CAST(count(value) AS DOUBLE) AS n, avg(value) AS m,
         var_samp(value) AS var
  FROM events WHERE value IS NOT NULL GROUP BY 1
) bc, LATERAL (VALUES
  ('n', bc.n), ('posterior_mean', round(bc.m, 6)),
  ('posterior_sd', round(sqrt(bc.var / bc.n), 6))
) AS v(stat, value)
"""


def q_contingency_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-association family: chi-square independence (+Cramér's
    V), Fisher exact 2×2 (exact hypergeometric p — DuckDB re-derives it
    with lgamma + generate_series), CMH stratified test + MH common odds
    ratio, and the two-sample proportion z-test."""
    from fast_causal_inference_spark.operators.contingency import (
        chi_square_independence,
        cmh_test,
        fisher_exact_2x2,
    )
    from fast_causal_inference_spark.operators.proportion import (
        proportion_ztest,
    )

    o = _load(spark, sf_dir, "orders") \
        .withColumn("arm", (F.col("o_orderkey") % 2).cast("int")) \
        .withColumn("big", (F.col("o_totalprice") > 150000).cast("int"))
    rows = []
    chi, fe, cmh, pz = [pdf.iloc[0] for pdf in _concurrent([
        lambda: chi_square_independence(o, "o_orderpriority",
                                        "o_orderstatus"),
        lambda: fisher_exact_2x2(o, "arm", "big"),
        lambda: cmh_test(o, "arm", "big", "o_orderpriority"),
        lambda: proportion_ztest(o, "big", "arm"),
    ])]
    for stat in ("chi2", "df", "n", "cramers_v"):
        rows.append({"variant": "chi_square", "item": "priority_x_status",
                     "stat": stat, "value": float(chi[stat])})
    for stat in ("odds_ratio", "p_value", "n"):
        rows.append({"variant": "fisher_exact", "item": "arm_x_big",
                     "stat": stat, "value": float(fe[stat])})
    for stat in ("statistic", "df", "mh_odds_ratio", "n_strata"):
        rows.append({"variant": "cmh", "item": "arm_x_big|priority",
                     "stat": stat, "value": float(cmh[stat])})
    for stat in ("proportion0", "proportion1", "diff", "z", "n0", "n1"):
        rows.append({"variant": "proportion_z", "item": "big~arm",
                     "stat": stat, "value": float(pz[stat])})
    return _long_rows(spark, rows)


_CONTINGENCY_SQL = """
WITH tab AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y,
         CAST(count(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1, 2
), margins AS (
  SELECT t.x, t.y, t.n,
         sum(t.n) OVER (PARTITION BY t.x) AS rx,
         sum(t.n) OVER (PARTITION BY t.y) AS cy,
         sum(t.n) OVER () AS tot
  FROM tab t
), chi AS (
  SELECT sum((n - rx*cy/tot)*(n - rx*cy/tot)/(rx*cy/tot)) AS chi2,
         (count(DISTINCT x) - 1) * (count(DISTINCT y) - 1) AS dof,
         any_value(tot) AS n,
         least(count(DISTINCT x), count(DISTINCT y)) - 1 AS mink
  FROM margins
), f2 AS (
  SELECT CAST(sum(CASE WHEN o_orderkey % 2 = 0 AND o_totalprice <= 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS a,
         CAST(sum(CASE WHEN o_orderkey % 2 = 0 AND o_totalprice > 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS b,
         CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_totalprice <= 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS c,
         CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_totalprice > 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS d
  FROM orders
), fm AS (
  SELECT a, b, c, d, a + b AS r1, c + d AS r2, a + c AS c1,
         a + b + c + d AS n
  FROM f2
), fpmf AS (
  SELECT fm.a AS a_obs, gs.g AS aa,
         exp( (lgamma(fm.r1+1) - lgamma(gs.g+1) - lgamma(fm.r1-gs.g+1))
            + (lgamma(fm.r2+1) - lgamma(fm.c1-gs.g+1)
               - lgamma(fm.r2-(fm.c1-gs.g)+1))
            - (lgamma(fm.n+1) - lgamma(fm.c1+1) - lgamma(fm.n-fm.c1+1)) )
           AS p
  FROM fm, (SELECT unnest(generate_series(
                CAST(greatest(0, (SELECT c1 - r2 FROM fm)) AS BIGINT),
                CAST(least((SELECT r1 FROM fm), (SELECT c1 FROM fm))
                     AS BIGINT))) AS g) gs
), fisher AS (
  SELECT (SELECT (a*d)/(b*c) FROM fm) AS odds_ratio,
         least(sum(CASE WHEN p <= (SELECT p FROM fpmf
                                   WHERE aa = a_obs) * (1 + 1e-9)
                   THEN p ELSE 0 END), 1.0) AS p_value,
         (SELECT n FROM fm) AS n
  FROM fpmf
), strata AS (
  SELECT o_orderpriority AS s,
         CAST(sum(CASE WHEN o_orderkey % 2 = 0 AND o_totalprice <= 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS a,
         CAST(sum(CASE WHEN o_orderkey % 2 = 0 AND o_totalprice > 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS b,
         CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_totalprice <= 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS c,
         CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_totalprice > 150000
                  THEN 1 ELSE 0 END) AS DOUBLE) AS d
  FROM orders GROUP BY 1
), cmh AS (
  SELECT sum(a - (a+b)*(a+c)/(a+b+c+d)) AS num,
         sum((a+b)*(c+d)*(a+c)*(b+d)
             / ((a+b+c+d)*(a+b+c+d)*(a+b+c+d-1))) AS den,
         sum(a*d/(a+b+c+d)) AS or_num,
         sum(b*c/(a+b+c+d)) AS or_den,
         count(*) AS n_strata
  FROM strata WHERE a + b + c + d > 0
), pz AS (
  SELECT CAST(count(*) FILTER (o_orderkey % 2 = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (o_orderkey % 2 = 1) AS DOUBLE) AS n1,
         CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
              FILTER (o_orderkey % 2 = 0) AS DOUBLE) AS x0,
         CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
              FILTER (o_orderkey % 2 = 1) AS DOUBLE) AS x1
  FROM orders
)
SELECT 'chi_square' AS variant, 'priority_x_status' AS item, 'chi2' AS stat,
       round(chi2, 6) AS value FROM chi
UNION ALL SELECT 'chi_square', 'priority_x_status', 'df',
       CAST(dof AS DOUBLE) FROM chi
UNION ALL SELECT 'chi_square', 'priority_x_status', 'n', n FROM chi
UNION ALL SELECT 'chi_square', 'priority_x_status', 'cramers_v',
       round(sqrt(chi2/(n*mink)), 6) FROM chi
UNION ALL SELECT 'fisher_exact', 'arm_x_big', 'odds_ratio',
       round(odds_ratio, 6) FROM fisher
UNION ALL SELECT 'fisher_exact', 'arm_x_big', 'p_value',
       round(p_value, 6) FROM fisher
UNION ALL SELECT 'fisher_exact', 'arm_x_big', 'n', n FROM fisher
UNION ALL SELECT 'cmh', 'arm_x_big|priority', 'statistic',
       round((abs(num) - 0.5)*(abs(num) - 0.5)/den, 6) FROM cmh
UNION ALL SELECT 'cmh', 'arm_x_big|priority', 'df', 1.0 FROM cmh
UNION ALL SELECT 'cmh', 'arm_x_big|priority', 'mh_odds_ratio',
       round(or_num/or_den, 6) FROM cmh
UNION ALL SELECT 'cmh', 'arm_x_big|priority', 'n_strata',
       CAST(n_strata AS DOUBLE) FROM cmh
UNION ALL SELECT 'proportion_z', 'big~arm', 'proportion0',
       round(x0/n0, 6) FROM pz
UNION ALL SELECT 'proportion_z', 'big~arm', 'proportion1',
       round(x1/n1, 6) FROM pz
UNION ALL SELECT 'proportion_z', 'big~arm', 'diff',
       round(x1/n1 - x0/n0, 6) FROM pz
UNION ALL SELECT 'proportion_z', 'big~arm', 'z',
       round((x1/n1 - x0/n0)
             / sqrt(((x0+x1)/(n0+n1))*(1-(x0+x1)/(n0+n1))*(1/n0 + 1/n1)),
             6) FROM pz
UNION ALL SELECT 'proportion_z', 'big~arm', 'n0', n0 FROM pz
UNION ALL SELECT 'proportion_z', 'big~arm', 'n1', n1 FROM pz
"""


def q_robust_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sandwich-covariance OLS family: White HC1 heteroskedasticity-robust
    and CR1 cluster-robust (cluster = l_suppkey) standard errors on the
    single-regressor model l_discount ~ l_tax — closed-form enough that
    DuckDB re-derives both sandwiches exactly."""
    from fast_causal_inference_spark.operators.ols import (
        cluster_robust_ols,
        robust_ols,
    )

    li = _load(spark, sf_dir, "lineitem")
    rows = []
    hc, cr = _concurrent([
        lambda: robust_ols(li, "l_discount ~ l_tax", hc="HC1"),
        lambda: cluster_robust_ols(li, "l_discount ~ l_tax",
                                   cluster="l_suppkey"),
    ])
    for name, b, se in zip(hc.names, hc.beta, hc.stderr):
        rows.append({"variant": "hc1", "item": name, "stat": "estimate",
                     "value": round(float(b), 6)})
        rows.append({"variant": "hc1", "item": name, "stat": "stderr",
                     "value": round(float(se), 6)})
    for name, b, se in zip(cr.names, cr.beta, cr.stderr):
        rows.append({"variant": "cr1", "item": name, "stat": "estimate",
                     "value": round(float(b), 6)})
        rows.append({"variant": "cr1", "item": name, "stat": "stderr",
                     "value": round(float(se), 6)})
    return _long_rows(spark, rows)


_ROBUST_OLS_SQL = """
WITH base AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(l_tax) AS sx,
         sum(l_tax*l_tax) AS sxx, sum(l_discount) AS sy,
         sum(l_tax*l_discount) AS sxy
  FROM lineitem
), beta AS (
  SELECT n, sx, sxx, n*sxx - sx*sx AS det,
         (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         (sy*sxx - sx*sxy)/(n*sxx - sx*sx) AS b0
  FROM base
), hc_meat AS (
  SELECT sum((l_discount - b.b0 - b.b1*l_tax)
             *(l_discount - b.b0 - b.b1*l_tax)) AS m11,
         sum(l_tax*(l_discount - b.b0 - b.b1*l_tax)
             *(l_discount - b.b0 - b.b1*l_tax)) AS m12,
         sum(l_tax*l_tax*(l_discount - b.b0 - b.b1*l_tax)
             *(l_discount - b.b0 - b.b1*l_tax)) AS m22
  FROM lineitem, beta b
), hc AS (
  SELECT b.b0, b.b1,
         sqrt((b.n/(b.n-2))
              * (b.sxx*b.sxx*m.m11 - 2*b.sxx*b.sx*m.m12 + b.sx*b.sx*m.m22)
              / (b.det*b.det)) AS se0,
         sqrt((b.n/(b.n-2))
              * (b.sx*b.sx*m.m11 - 2*b.n*b.sx*m.m12 + b.n*b.n*m.m22)
              / (b.det*b.det)) AS se1
  FROM beta b, hc_meat m
), cl AS (
  SELECT l_suppkey,
         sum(l_discount - b.b0 - b.b1*l_tax) AS s1,
         sum(l_tax*(l_discount - b.b0 - b.b1*l_tax)) AS s2
  FROM lineitem, beta b GROUP BY l_suppkey, b.b0, b.b1
), cr_meat AS (
  SELECT sum(s1*s1) AS m11, sum(s1*s2) AS m12, sum(s2*s2) AS m22,
         CAST(count(*) AS DOUBLE) AS g
  FROM cl
), cr AS (
  SELECT b.b0, b.b1,
         sqrt((m.g/(m.g-1))*((b.n-1)/(b.n-2))
              * (b.sxx*b.sxx*m.m11 - 2*b.sxx*b.sx*m.m12 + b.sx*b.sx*m.m22)
              / (b.det*b.det)) AS se0,
         sqrt((m.g/(m.g-1))*((b.n-1)/(b.n-2))
              * (b.sx*b.sx*m.m11 - 2*b.n*b.sx*m.m12 + b.n*b.n*m.m22)
              / (b.det*b.det)) AS se1
  FROM beta b, cr_meat m
)
SELECT 'hc1' AS variant, '(Intercept)' AS item, 'estimate' AS stat,
       round(b0, 6) AS value FROM hc
UNION ALL SELECT 'hc1', '(Intercept)', 'stderr', round(se0, 6) FROM hc
UNION ALL SELECT 'hc1', 'l_tax', 'estimate', round(b1, 6) FROM hc
UNION ALL SELECT 'hc1', 'l_tax', 'stderr', round(se1, 6) FROM hc
UNION ALL SELECT 'cr1', '(Intercept)', 'estimate', round(b0, 6) FROM cr
UNION ALL SELECT 'cr1', '(Intercept)', 'stderr', round(se0, 6) FROM cr
UNION ALL SELECT 'cr1', 'l_tax', 'estimate', round(b1, 6) FROM cr
UNION ALL SELECT 'cr1', 'l_tax', 'stderr', round(se1, 6) FROM cr
"""


def q_temporal_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-join family, gated on aggregate checksums: as-of join
    (DuckDB re-derives with its native ASOF JOIN), bucketized range join
    (plain BETWEEN join in DuckDB), and multi-resolution time rollup."""
    from fast_causal_inference_spark.operators.temporal import (
        asof_join,
        range_join,
        time_bucket_rollup,
    )

    ev = _load(spark, sf_dir, "events")
    points = ev.where(F.col("event_id") % 5 == 0) \
        .select("user_id", "ts", "value")
    # collapse duplicate right timestamps so the as-of winner is unique —
    # both engines then agree without relying on tie-break order
    quotes = ev.where(F.col("event_id") % 5 != 0) \
        .groupBy("user_id", "ts").agg(F.max("value").alias("qvalue"))
    aj = asof_join(points, quotes, on="user_id", left_ts="ts")

    pts = _load(spark, sf_dir, "lineitem") \
        .select(F.col("l_extendedprice").alias("pt"),
                F.col("l_orderkey").alias("okey"))
    iv = _load(spark, sf_dir, "part").where(F.col("p_partkey") < 100) \
        .select(F.col("p_partkey").alias("ikey"),
                (F.col("p_retailprice") - 20.0).alias("lo"),
                (F.col("p_retailprice") + 20.0).alias("hi"))
    rj = range_join(pts, iv, on=None, point_ts="pt", start_ts="lo",
                    end_ts="hi", bucket_width=40.0)
    ru = time_bucket_rollup(
        ev, "ts", ["1 day", "1 hour"],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("vsum")])

    def _cusum():
        from fast_causal_inference_spark.operators.changepoint import (
            cusum_alarms,
        )

        series = ev.withColumn("g", (F.col("user_id") % 3).cast("int"))
        return (cusum_alarms(series, "value", "event_id", "g",
                             target=0.0, sd=50.0, k=0.5, h=4.0)
                .orderBy("g").collect())

    def _ewma():
        # batch EWMA control chart on a BOUNDED cell series (200 steps
        # per group — the scale-correct shape for the per-series
        # applyInPandas recursion); the oracle re-derives E_t from the
        # scaled-prefix-sum closed form E_t = λ·(1−λ)^t·Σ z_i(1−λ)^{−i}
        from fast_causal_inference_spark.operators.changepoint import (
            ewma_detect,
        )

        cells = (ev.groupBy((F.col("user_id") % 3).cast("int").alias("g"),
                            (F.col("event_id") % 200).alias("step"))
                 .agg(F.avg("value").alias("cellv")))
        ch = ewma_detect(cells, "cellv", "step", "g", target=50.0,
                         sd=10.0, lam=0.2, L=3.0)
        return (ch.groupBy("g")
                .agg(F.count(F.lit(1)).alias("n_points"),
                     F.count(F.when(F.col("alarm"), 1)).cast("double")
                     .alias("n_alarms"),
                     F.round(F.max(F.abs(F.col("ewma"))), 6)
                     .alias("max_abs_ewma"),
                     F.round(F.max_by("ewma", "step"), 6)
                     .alias("ewma_last"),
                     F.min(F.when(F.col("alarm"), F.col("step")))
                     .alias("first_alarm"))
                .orderBy("g").collect())

    a_rows, r_rows, ru_rows, cu_rows, ew_rows = _concurrent([
        lambda: aj.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("qvalue_right").alias("n_matched"),
            F.round(F.sum("qvalue_right"), 4).alias("qvalue_sum"),
            F.round(F.sum(
                (F.unix_micros(F.col("ts").cast("timestamp"))
                 - F.unix_micros(F.col("ts_right").cast("timestamp")))
                / 1e6), 2).alias("gap_sum")).collect(),
        lambda: rj.agg(F.count(F.lit(1)).alias("n_pairs"),
                       F.round(F.sum("pt"), 2).alias("pt_sum"),
                       F.sum("ikey").alias("ikey_sum")).collect(),
        lambda: (ru.groupBy("resolution")
                 .agg(F.count(F.lit(1)).alias("n_buckets"),
                      F.sum("n").alias("rows_total"),
                      F.round(F.sum("vsum"), 2).alias("value_total"))
                 .collect()),
        _cusum,
        _ewma,
    ])
    a = a_rows[0]
    rows = [{"variant": "asof", "item": "events", "stat": s,
             "value": float(a[s] or 0.0)}
            for s in ("n_rows", "n_matched", "qvalue_sum", "gap_sum")]
    r = r_rows[0]
    rows += [{"variant": "range", "item": "price_bands", "stat": s,
              "value": float(r[s] or 0.0)}
             for s in ("n_pairs", "pt_sum", "ikey_sum")]
    for rr in ru_rows:
        res = rr["resolution"].replace(" ", "_")
        for s in ("n_buckets", "rows_total", "value_total"):
            rows.append({"variant": "rollup", "item": res, "stat": s,
                         "value": float(rr[s])})
    for cr in cu_rows:
        for s in ("n_points", "n_alarms", "max_cusum_pos",
                  "max_cusum_neg"):
            rows.append({"variant": "cusum", "item": str(cr["g"]),
                         "stat": s, "value": float(cr[s])})
        fa = cr["first_alarm_event_id"]
        rows.append({"variant": "cusum", "item": str(cr["g"]),
                     "stat": "first_alarm",
                     "value": float(fa) if fa is not None else -1.0})
    for er in ew_rows:
        for s_ in ("n_points", "n_alarms", "max_abs_ewma", "ewma_last"):
            rows.append({"variant": "ewma", "item": str(er["g"]),
                         "stat": s_, "value": float(er[s_])})
        fa = er["first_alarm"]
        rows.append({"variant": "ewma", "item": str(er["g"]),
                     "stat": "first_alarm",
                     "value": float(fa) if fa is not None else -1.0})
    return _long_rows(spark, rows)


_TEMPORAL_SQL = """
WITH points AS (
  SELECT user_id, ts, value FROM events WHERE event_id % 5 = 0
), quotes AS (
  SELECT user_id, ts, max(value) AS qvalue
  FROM events WHERE event_id % 5 != 0 GROUP BY 1, 2
), aj AS (
  SELECT p.ts, q.ts AS ts_right, q.qvalue
  FROM points p ASOF LEFT JOIN quotes q
    ON p.user_id = q.user_id AND p.ts >= q.ts
), a AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
         CAST(count(qvalue) AS DOUBLE) AS n_matched,
         round(sum(qvalue), 4) AS qvalue_sum,
         round(sum(epoch(ts) - epoch(ts_right)), 2) AS gap_sum
  FROM aj
), rj AS (
  SELECT l.l_extendedprice AS pt, p.p_partkey AS ikey
  FROM lineitem l JOIN part p
    ON p.p_partkey < 100
   AND l.l_extendedprice >= p.p_retailprice - 20.0
   AND l.l_extendedprice < p.p_retailprice + 20.0
), r AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_pairs,
         round(sum(pt), 2) AS pt_sum,
         CAST(sum(ikey) AS DOUBLE) AS ikey_sum
  FROM rj
), ru_day AS (
  SELECT date_trunc('day', ts) AS b, count(*) AS n, sum(value) AS vsum
  FROM events GROUP BY 1
), ru_hour AS (
  SELECT date_trunc('hour', ts) AS b, count(*) AS n, sum(value) AS vsum
  FROM events GROUP BY 1
), cu_s AS (
  SELECT CAST(user_id % 3 AS INT) AS g, event_id,
         sum(value / 50.0 - 0.5) OVER w AS sp,
         sum(-value / 50.0 - 0.5) OVER w AS sn
  FROM events
  WINDOW w AS (PARTITION BY user_id % 3 ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), cu_c AS (
  SELECT g, event_id,
         sp - least(0, min(sp) OVER w) AS cp,
         sn - least(0, min(sn) OVER w) AS cn
  FROM cu_s
  WINDOW w AS (PARTITION BY g ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), cu AS (
  SELECT g, CAST(count(*) AS DOUBLE) AS n_points,
         CAST(count(*) FILTER (cp > 4.0 OR cn > 4.0) AS DOUBLE)
           AS n_alarms,
         round(max(cp), 6) AS max_cusum_pos,
         round(max(cn), 6) AS max_cusum_neg,
         coalesce(CAST(min(event_id)
                       FILTER (cp > 4.0 OR cn > 4.0) AS DOUBLE), -1.0)
           AS first_alarm
  FROM cu_c GROUP BY g
), ew_cell AS (
  SELECT CAST(user_id % 3 AS INT) AS g, event_id % 200 AS step,
         avg(value) AS cellv
  FROM events GROUP BY 1, 2
), ew_z AS (
  SELECT g, step,
         CAST(row_number() OVER (PARTITION BY g ORDER BY step)
              AS DOUBLE) AS t,
         (cellv - 50.0) / 10.0 AS z
  FROM ew_cell
), ew_e AS (
  -- E_t = 0.2*(0.8)^t * sum_{i<=t} z_i*(0.8)^(-i): the scaled prefix
  -- sum reproduces the E_0=0 EWMA recursion in one window pass
  SELECT g, step, t,
         0.2 * power(0.8, t) * sum(z * power(0.8, -t)) OVER
           (PARTITION BY g ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e,
         3.0 * sqrt(0.2 / 1.8 * (1 - power(0.8, 2 * t))) AS ucl
  FROM ew_z
), ew AS (
  SELECT g, CAST(count(*) AS DOUBLE) AS n_points,
         CAST(count(*) FILTER (abs(e) > ucl) AS DOUBLE) AS n_alarms,
         round(max(abs(e)), 6) AS max_abs_ewma,
         round(arg_max(e, t), 6) AS ewma_last,
         coalesce(CAST(min(step) FILTER (abs(e) > ucl) AS DOUBLE), -1.0)
           AS first_alarm
  FROM ew_e GROUP BY g
)
SELECT 'cusum' AS variant, CAST(g AS VARCHAR) AS item, 'n_points' AS stat,
       n_points AS value FROM cu
UNION ALL SELECT 'cusum', CAST(g AS VARCHAR), 'n_alarms', n_alarms FROM cu
UNION ALL SELECT 'cusum', CAST(g AS VARCHAR), 'max_cusum_pos',
       max_cusum_pos FROM cu
UNION ALL SELECT 'cusum', CAST(g AS VARCHAR), 'max_cusum_neg',
       max_cusum_neg FROM cu
UNION ALL SELECT 'cusum', CAST(g AS VARCHAR), 'first_alarm',
       first_alarm FROM cu
UNION ALL SELECT 'ewma', CAST(g AS VARCHAR), 'n_points',
       n_points FROM ew
UNION ALL SELECT 'ewma', CAST(g AS VARCHAR), 'n_alarms', n_alarms FROM ew
UNION ALL SELECT 'ewma', CAST(g AS VARCHAR), 'max_abs_ewma',
       max_abs_ewma FROM ew
UNION ALL SELECT 'ewma', CAST(g AS VARCHAR), 'ewma_last',
       ewma_last FROM ew
UNION ALL SELECT 'ewma', CAST(g AS VARCHAR), 'first_alarm',
       first_alarm FROM ew
UNION ALL
SELECT 'asof' AS variant, 'events' AS item, 'n_rows' AS stat,
       n_rows AS value FROM a
UNION ALL SELECT 'asof', 'events', 'n_matched', n_matched FROM a
UNION ALL SELECT 'asof', 'events', 'qvalue_sum', qvalue_sum FROM a
UNION ALL SELECT 'asof', 'events', 'gap_sum', gap_sum FROM a
UNION ALL SELECT 'range', 'price_bands', 'n_pairs', n_pairs FROM r
UNION ALL SELECT 'range', 'price_bands', 'pt_sum', pt_sum FROM r
UNION ALL SELECT 'range', 'price_bands', 'ikey_sum', ikey_sum FROM r
UNION ALL SELECT 'rollup', '1_day', 'n_buckets',
       CAST(count(*) AS DOUBLE) FROM ru_day
UNION ALL SELECT 'rollup', '1_day', 'rows_total',
       CAST(sum(n) AS DOUBLE) FROM ru_day
UNION ALL SELECT 'rollup', '1_day', 'value_total',
       round(sum(vsum), 2) FROM ru_day
UNION ALL SELECT 'rollup', '1_hour', 'n_buckets',
       CAST(count(*) AS DOUBLE) FROM ru_hour
UNION ALL SELECT 'rollup', '1_hour', 'rows_total',
       CAST(sum(n) AS DOUBLE) FROM ru_hour
UNION ALL SELECT 'rollup', '1_hour', 'value_total',
       round(sum(vsum), 2) FROM ru_hour
"""


def q_multiple_testing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bonferroni / Holm / BH adjustment over a deterministic result
    relation (pseudo p-values = fractional part of per-cell avg price, so
    DuckDB re-derives the full step-up/step-down paths with windows)."""
    from fast_causal_inference_spark.operators.multiple_testing import (
        adjust_pvalues,
    )

    o = _load(spark, sf_dir, "orders")
    res = (o.groupBy("o_orderpriority", "o_orderstatus")
           .agg((F.avg("o_totalprice")
                 - F.floor(F.avg("o_totalprice"))).alias("p_value")))
    rows = []
    methods = ("bonferroni", "holm", "bh")
    adjs = _concurrent([
        lambda m=m: adjust_pvalues(res, method=m, out_col="p_adj")
        .toPandas() for m in methods])
    for method, adj in zip(methods, adjs):
        for r in adj.itertuples():
            rows.append({
                "variant": method,
                "item": f"{r.o_orderpriority}/{r.o_orderstatus}",
                "stat": "p_adj", "value": round(float(r.p_adj), 6)})
    return _long_rows(spark, rows)


_MULTIPLE_TESTING_SQL = """
WITH res AS (
  SELECT o_orderpriority || '/' || o_orderstatus AS item,
         avg(o_totalprice) - floor(avg(o_totalprice)) AS p
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM res),
ranked AS (
  SELECT item, p, row_number() OVER (ORDER BY p, item) AS rk FROM res
), holm AS (
  SELECT item, least(max(p * ((SELECT m FROM m) - rk + 1))
                     OVER (ORDER BY rk
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW), 1.0) AS adj
  FROM ranked
), bh AS (
  SELECT item, least(min(p * (SELECT m FROM m) / rk)
                     OVER (ORDER BY rk
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING), 1.0) AS adj
  FROM ranked
)
SELECT 'bonferroni' AS variant, item, 'p_adj' AS stat,
       round(least(p * (SELECT m FROM m), 1.0), 6) AS value FROM res
UNION ALL SELECT 'holm', item, 'p_adj', round(adj, 6) FROM holm
UNION ALL SELECT 'bh', item, 'p_adj', round(adj, 6) FROM bh
"""


def q_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus assembly family (golden snapshot: every draw is a
    pure xxhash64 function of ids+seed, layout-independent — proven by
    gen_goldens' two-process determinism probe): domain mixture
    resampling, deterministic epoch shuffle, sequence packing,
    quality-weighted sampling, stratified sampling (rate + exact-n),
    reservoir sampling, and BPE tokenizer training + corpus token
    accounting (merges are a pure function of the word-count relation;
    count-desc/lexicographic tie-break)."""
    from fast_causal_inference_spark.datapipe.tokenizer import (
        bpe_token_count,
        train_bpe,
    )
    from fast_causal_inference_spark.datapipe.training import (
        domain_mixture_sample,
        global_shuffle,
        pack_sequences,
        quality_weighted_sample,
        reservoir_sample,
        stratified_sample,
    )

    d = _load(spark, sf_dir, "documents")
    rows = []

    def _streaming_ingest():
        # REAL Structured Streaming execution inside the gate: file-source
        # micro-batches → quality/lang annotate+filter → PII redact →
        # dropDuplicatesWithinWatermark → parquet sink (availableNow), then
        # aggregate the landed rows.  n_docs/avg_quality are representative-
        # independent (duplicates share text, hence quality and lang), so
        # the values are layout-stable — proven by gen_goldens' two-process
        # probe like every other variant in this family.
        import shutil
        import tempfile

        from fast_causal_inference_spark.streaming.ops import (
            ingest_documents,
        )

        sch = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        tmp = tempfile.mkdtemp(prefix="ingest_gate_")
        try:
            # the file stream source needs a DIRECTORY; symlink the table in
            import os
            os.mkdir(tmp + "/in")
            _symlink_parquet(f"{sf_dir}/documents.parquet", tmp + "/in")
            stream = (spark.readStream.schema(sch).parquet(tmp + "/in")
                      .withColumn("ts", F.timestamp_micros(F.col("doc_id"))))
            # a single parquet file arrives as 1-2 splits, which would run
            # the annotate/PII regex chain on one core; repartition the
            # micro-batch so the per-row work parallelizes (measured 33 s
            # -> 12 s at the x10 block; a real deployment's Kafka source
            # is already multi-partition)
            stream = stream.repartition(
                int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
            out = ingest_documents(stream, ts_col="ts", min_quality=0.4,
                                   watermark="1 hour")
            # the watermark dedup materializes one state store PER
            # shuffle partition; 8 is plenty for the gate volume and
            # cuts the per-store setup/maintenance 4x.  The landed
            # values are layout-independent (gen_goldens' two-process
            # probe varies shuffle settings), so this is purely a
            # wall-clock knob.  Scoped set + restore: the conf is read
            # once at stream planning.
            prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                q = (out.writeStream.format("parquet")
                     .option("path", tmp + "/data")
                     .option("checkpointLocation", tmp + "/ckpt")
                     .trigger(availableNow=True).start())
                # restore only after the batches are planned (the conf is
                # read per micro-batch); sibling gate tasks that plan in
                # this window just get 8 reduce partitions — their values
                # are layout-independent too
                if not q.awaitTermination(180):
                    q.stop()
                    raise TimeoutError(
                        "streaming ingest did not finish in 180s — "
                        "failing loudly instead of reading a partial "
                        "landing")
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
            landed = spark.read.parquet(tmp + "/data")
            return (landed.groupBy("lang_pred")
                    .agg(F.count(F.lit(1)).alias("n_docs"),
                         F.round(F.avg("quality"), 6).alias("avg_quality"))
                    .collect())
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def _facade_smoke():
        # sources/sinks facade round-trip with DETERMINISTIC counts:
        # readSparkDf(na_fill) → toCsv → readCsv → sample/split, all on
        # ONE partition — native sample is per-partition seeded, so a
        # single partition makes the draw layout-free (randomSplit
        # additionally sorts within partitions), and the CSV file order
        # follows the coalesced source order.
        import shutil
        import tempfile

        import fast_causal_inference_spark as fcis

        tmp = tempfile.mkdtemp(prefix="facade_gate_")
        try:
            src = (d.select("doc_id", "lang", "n_chars")
                   .withColumn("x", F.when(F.col("doc_id") % 7 == 0,
                                           F.lit(None).cast("double"))
                               .otherwise(F.col("n_chars").cast("double")))
                   .coalesce(1))
            filled = fcis.readSparkDf(src, na_fill=-1.0)
            filled.toCsv(tmp + "/docs_csv")
            back = fcis.readCsv(tmp + "/docs_csv", spark=spark) \
                .df.coalesce(1)
            out = [("csv_roundtrip", "n_rows", float(back.count())),
                   ("csv_roundtrip", "id_sum",
                    float(back.agg(F.sum("doc_id")).collect()[0][0])),
                   ("na_fill", "n_filled",
                    float(back.where(F.col("x") == -1.0).count())),
                   ("sample", "n",
                    float(back.sample(fraction=0.3, seed=7).count()))]
            tr, te = fcis.readSparkDf(back).split(test_size=0.4, seed=11)
            out.append(("split", "n_train", float(tr.df.count())))
            out.append(("split", "n_test", float(te.df.count())))
            # materializedView (round 10): the view must serve the SAME
            # relation back through spark.table — count/id_sum are the
            # DuckDB closed forms over documents (500 / 124750 at
            # sf0.01), not merely a smoke count
            vname = fcis.readSparkDf(back).materializedView(
                "fcis_gate_mview")
            mv = spark.table(vname)
            out.append(("materialized_view", "n_rows",
                        float(mv.count())))
            out.append(("materialized_view", "id_sum",
                        float(mv.agg(F.sum("doc_id")).collect()[0][0])))
            spark.catalog.dropTempView(vname)
            return out
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def _bpe_chain():
        # train + corpus accounting chained in ONE concurrent slot so the
        # driver-side merge loop overlaps the streaming ingest instead of
        # serializing ahead of the whole batch
        bpe = train_bpe(d.where(F.col("doc_id") % 5 == 0), vocab_size=300,
                        max_words=20000)
        counts = bpe_token_count(d, bpe).agg(
            F.sum("n_tokens_bpe").alias("tok_total"),
            F.sum(F.col("n_tokens_bpe") *
                  (F.col("doc_id") % 97)).alias("tok_weighted")).collect()
        return bpe, counts

    mix = domain_mixture_sample(
        d, "lang", target_weights={"en": 0.4, "de": 0.2, "zh": 0.2,
                                   "fr": 0.1, "es": 0.1},
        seed=7, id_cols=["doc_id"])
    sh = global_shuffle(d.select("doc_id"), seed=5, key_cols=["doc_id"],
                        num_partitions=8)
    pk = pack_sequences(
        d.select("doc_id", "n_chars").coalesce(1), "n_chars",
        max_tokens=4096)
    qw = quality_weighted_sample(
        d.withColumn("q", 1.0 / (1.0 + F.col("doc_id") % 7)), "q",
        fraction=0.3, seed=11, id_cols=["doc_id"])
    strat = stratified_sample(d, "lang", fractions=0.25, seed=13,
                              id_cols=["doc_id"])
    strat_n = stratified_sample(d, "lang", n_per_stratum=5, seed=17,
                                id_cols=["doc_id"])
    resv = reservoir_sample(d, 25, seed=19, id_cols=["doc_id"])
    (mix_rows, head_pdf, p_rows, w_rows, s_rows, sn_rows, r_rows, bpe_pair,
     si_rows, fac_rows) = _concurrent([
        lambda: mix.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum")).collect(),
        # only the first 10 shuffled positions are declared — limit(10)
        # is row-identical (CollectLimit drains the deterministic
        # partition-0 sort first) and keeps the 600k-id Arrow collect
        # off the driver (guide §5)
        lambda: sh.limit(10).toPandas(),
        lambda: pk.agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("oversize").cast("int")).alias("n_oversize"),
            F.max("pack_fill").alias("max_fill")).collect(),
        lambda: qw.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("doc_id").alias("id_sum")).collect(),
        lambda: strat.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum")).collect(),
        lambda: strat_n.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum")).collect(),
        lambda: resv.agg(F.count(F.lit(1)).alias("n"),
                         F.sum("doc_id").alias("id_sum")).collect(),
        _bpe_chain,
        _streaming_ingest,
        _facade_smoke,
    ])
    bpe, bpe_rows = bpe_pair
    for r in mix_rows:
        rows.append({"variant": "mixture", "item": str(r["lang"]),
                     "stat": "n", "value": float(r["n"])})
        rows.append({"variant": "mixture", "item": str(r["lang"]),
                     "stat": "id_sum", "value": float(r["id_sum"])})
    for i, doc_id in enumerate(head_pdf.head(10)["doc_id"]):
        rows.append({"variant": "shuffle", "item": f"pos_{i:02d}",
                     "stat": "doc_id", "value": float(doc_id)})
    p = p_rows[0]
    for s in ("n_packs", "n_docs", "n_oversize", "max_fill"):
        rows.append({"variant": "pack", "item": "n_chars@4096", "stat": s,
                     "value": float(p[s])})
    w = w_rows[0]
    rows.append({"variant": "quality_sample", "item": "q", "stat": "n",
                 "value": float(w["n"])})
    rows.append({"variant": "quality_sample", "item": "q", "stat": "id_sum",
                 "value": float(w["id_sum"])})
    for variant, rws in [("stratified_rate", s_rows),
                         ("stratified_exact_n", sn_rows)]:
        for r in rws:
            rows.append({"variant": variant, "item": str(r["lang"]),
                         "stat": "n", "value": float(r["n"])})
            rows.append({"variant": variant, "item": str(r["lang"]),
                         "stat": "id_sum", "value": float(r["id_sum"])})
    rv = r_rows[0]
    rows.append({"variant": "reservoir", "item": "n=25", "stat": "n",
                 "value": float(rv["n"])})
    rows.append({"variant": "reservoir", "item": "n=25", "stat": "id_sum",
                 "value": float(rv["id_sum"])})
    for i, (a, b) in enumerate(bpe["merges"][:10]):
        rows.append({"variant": "bpe", "item": f"merge_{i:02d}",
                     "stat": a + "⊕" + b, "value": float(i)})
    rows.append({"variant": "bpe", "item": "vocab", "stat": "size",
                 "value": float(len(bpe["vocab"]))})
    bp = bpe_rows[0]
    rows.append({"variant": "bpe", "item": "corpus", "stat": "tok_total",
                 "value": float(bp["tok_total"])})
    rows.append({"variant": "bpe", "item": "corpus", "stat": "tok_weighted",
                 "value": float(bp["tok_weighted"])})
    for r in si_rows:
        rows.append({"variant": "streaming_ingest",
                     "item": str(r["lang_pred"]), "stat": "n_docs",
                     "value": float(r["n_docs"])})
        rows.append({"variant": "streaming_ingest",
                     "item": str(r["lang_pred"]), "stat": "avg_quality",
                     "value": float(r["avg_quality"])})
    for item, stat, value in fac_rows:
        rows.append({"variant": "facade", "item": item, "stat": stat,
                     "value": value})
    return _long_rows(spark, rows)


def g_power_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-analysis rows of the power_effect_size family (golden
    snapshot: closed-form normal/t math, nothing for SQL to scan)."""
    from fast_causal_inference_spark.operators.power import (
        effect_size,
        events_logrank,
        mde_ttest,
        power_proportion,
        power_ttest,
        sample_size_logrank,
        sample_size_proportion,
        sample_size_ttest,
    )

    ev = _load(spark, sf_dir, "events") \
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    achieved = float(effect_size(ev, "value", "arm")
                     .iloc[0]["achieved_power"])
    rows = [
        {"variant": "power", "item": "achieved", "stat": "power",
         "value": round(achieved, 6)},
        {"variant": "power", "item": "d=0.2,n=400x400", "stat": "power",
         "value": round(float(power_ttest(0.2, 1.0, 400, 400)), 6)},
        {"variant": "power", "item": "d=0.2,80%", "stat": "n_per_arm",
         "value": float(sample_size_ttest(0.2, 1.0))},
        {"variant": "power", "item": "n=500x500", "stat": "mde",
         "value": round(float(mde_ttest(1.0, 500, 500)), 6)},
        {"variant": "power_prop", "item": "p=.10->.12,n=3841x3841",
         "stat": "power",
         "value": round(float(power_proportion(0.10, 0.12, 3841, 3841)),
                        6)},
        {"variant": "power_prop", "item": "p=.10->.12,80%",
         "stat": "n_per_arm",
         "value": float(sample_size_proportion(0.10, 0.12))},
        {"variant": "power_surv", "item": "hr=0.75,80%",
         "stat": "events", "value": float(events_logrank(0.75))},
        {"variant": "power_surv", "item": "hr=0.75,pe=0.6,80%",
         "stat": "n_total",
         "value": float(sample_size_logrank(0.75, 0.6)["n_total"])},
    ]
    from fast_causal_inference_spark.operators.sequential import (
        group_sequential_ttest,
    )

    gs = group_sequential_ttest(
        ev.withColumn("week", (F.col("event_id") % 4 + 1).cast("int")),
        "value", "arm", "week")
    for _, r in gs.iterrows():
        for stat in ("z", "boundary", "info_fraction", "n0", "n1"):
            rows.append({"variant": "group_sequential",
                         "item": f"look{int(r['look'])}", "stat": stat,
                         "value": round(float(r[stat]), 6)})
    return _long_rows(spark, rows)


def q_power_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect-size + power family: Cohen's d / Hedges' g (SQL-derivable)
    plus closed-form power/MDE/sample-size rows (golden sub-oracle)."""
    from fast_causal_inference_spark.operators.power import (
        effect_size,
        icc_oneway,
    )

    ev = _load(spark, sf_dir, "events") \
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    es_pdf, power_df, icc = _concurrent([
        lambda: effect_size(ev, "value", "arm"),
        lambda: g_power_closed_form(spark, sf_dir),
        lambda: icc_oneway(
            ev.withColumn("cl", F.col("user_id") % 101), "value", "cl"),
    ])
    es = es_pdf.iloc[0]
    rows = [{"variant": "effect", "item": "value~arm", "stat": s,
             "value": round(float(es[s]), 6)}
            for s in ("cohens_d", "hedges_g", "diff", "pooled_sd",
                      "n0", "n1")]
    rows += [{"variant": "icc", "item": "value~cl101", "stat": s,
              "value": round(float(icc[s]), 6)}
             for s in ("icc", "msb", "msw", "n_clusters", "n", "m_bar")]
    return _long_rows(spark, rows).unionByName(power_df)


_EFFECT_SIZE_SQL = """
WITH arms AS (
  SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (user_id % 2 = 1) AS DOUBLE) AS n1,
         avg(value) FILTER (user_id % 2 = 0) AS m0,
         avg(value) FILTER (user_id % 2 = 1) AS m1,
         var_samp(value) FILTER (user_id % 2 = 0) AS v0,
         var_samp(value) FILTER (user_id % 2 = 1) AS v1
  FROM events WHERE value IS NOT NULL
), es AS (
  SELECT n0, n1, m1 - m0 AS diff,
         sqrt(((n0-1)*v0 + (n1-1)*v1)/(n0+n1-2)) AS sp
  FROM arms
)
SELECT 'effect' AS variant, 'value~arm' AS item, 'cohens_d' AS stat,
       round(diff/sp, 6) AS value FROM es
UNION ALL SELECT 'effect', 'value~arm', 'hedges_g',
       round(diff/sp * (1.0 - 3.0/(4.0*(n0+n1) - 9.0)), 6) FROM es
UNION ALL SELECT 'effect', 'value~arm', 'diff', round(diff, 6) FROM es
UNION ALL SELECT 'effect', 'value~arm', 'pooled_sd', round(sp, 6) FROM es
UNION ALL SELECT 'effect', 'value~arm', 'n0', n0 FROM es
UNION ALL SELECT 'effect', 'value~arm', 'n1', n1 FROM es
UNION ALL
SELECT 'icc', 'value~cl101', stat, round(value, 6) FROM (
  WITH icc_cl AS (
    SELECT user_id % 101 AS cl, CAST(count(*) AS DOUBLE) AS m,
           sum(value) AS s, sum(value*value) AS ss
    FROM events WHERE value IS NOT NULL GROUP BY 1
  ), icc_agg AS (
    SELECT CAST(count(*) AS DOUBLE) AS C, sum(m) AS N, sum(s) AS S,
           sum(ss) AS SS, sum(s*s/m) AS sb, sum(m*m) AS m2
    FROM icc_cl
  ), icc_f AS (
    SELECT C, N,
           (sb - S*S/N)/(C - 1) AS msb,
           (SS - sb)/(N - C) AS msw,
           (N - m2/N)/(C - 1) AS nbar
    FROM icc_agg
  )
  SELECT 'icc' AS stat,
         (msb - msw)/(msb + (nbar - 1)*msw) AS value FROM icc_f
  UNION ALL SELECT 'msb', msb FROM icc_f
  UNION ALL SELECT 'msw', msw FROM icc_f
  UNION ALL SELECT 'n_clusters', C FROM icc_f
  UNION ALL SELECT 'n', N FROM icc_f
  UNION ALL SELECT 'm_bar', nbar FROM icc_f
)
"""


def _golden_fragment(key: str) -> str:
    """Wrap a golden VALUES oracle so it can ride UNION ALL by name."""
    frag = _golden_oracles().get(key)
    if frag is None:
        return ("SELECT NULL AS variant, NULL AS item, NULL AS stat, "
                "NULL AS value WHERE FALSE")
    return f"SELECT variant, item, stat, value FROM ({frag}) __g_{key}"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_shipping_priority": q_q3_shipping_priority,
        "q5_region_revenue": q_q5_region_revenue,
        "delta_method": q_delta_method_family,
        "ttest_1samp": q_ttest_1samp_family,
        "ttest_2samp": q_ttest_2samp_family,
        "ttests_2samp": q_ttests_2samp,
        "srm": q_srm,
        "streaming_charts": q_streaming_charts,
        "xexpt_ttest_2samp": q_xexpt_family,
        "xexpt_grouped": q_xexpt_grouped,
        "mann_whitney_utest": q_mann_whitney,
        "kolmogorov_smirnov_test": q_kstest,
        "quantile_test_bucket": q_quantile_test_bucket,
        "describe_quantiles": q_describe_quantiles,
        "matrix_ops": q_matrix_ops,
        "ols": q_ols_family,
        "robust_ols": q_robust_ols,
        "did": q_did,
        "iv_regression": q_iv_regression,
        "linear_dml": q_linear_dml,
        "auc": q_auc_family,
        "stochastic_sgd": q_stochastic_sgd,
        "boot_strap": q_boot_strap_family,
        "permutation": q_permutation,
        "survival": q_survival_family,
        "t_learner": q_t_learner,
        "ate": q_ate,
        "matching": q_matching_family,
        "multi_arm_tests": q_multi_arm_tests,
        "contingency_tests": q_contingency_tests,
        "multiple_testing": q_multiple_testing,
        "temporal_ops": q_temporal_ops,
        "power_effect_size": q_power_effect_size,
        "corpus_assembly": q_corpus_assembly,
        "group_set": q_group_set,
        "lift_gain": q_lift_gain_family,
        "causal_tree": q_causal_tree,
        "causal_forest": q_causal_forest,
        "longterm": q_longterm,
        "exact_dedup": q_exact_dedup,
        # ngram first: it builds the cached shingle+pair relations that
        # dedup_components and minhash reuse via plan-equality cache hits
        "ngram_jaccard_dedup": q_ngram_jaccard,
        "dedup_components": q_dedup_components,
        "minhash_lsh_dedup": q_minhash_lsh,
        "simhash_dedup": q_simhash,
        "knn": q_knn_family,
        "embedding_near_dup": q_embedding_near_dup,
        "text_profile": q_text_profile,
        "media_features": q_media_features,
        "vector_functions": q_vector_functions,
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Gates computed and timed by the bench but NOT in ``queries()``.

    The round driver records at most 50 correctness rows (see the note
    above the round-4 gates): round 11 declared 51 families and the
    51st (``feature_encoding``, the last dict entry) silently fell out
    of the driver's verified window — a declared-but-unverified query.
    The declared set is therefore held at exactly the 50 families the
    driver verifies; ``feature_encoding`` stays fully alive here — the
    bench still times it every run (its ``queries`` key is never
    removed from the bench record) and ``tests/test_oracle_parity.py``
    still checks it against its DuckDB oracle at sf0.01."""
    return {
        "feature_encoding": q_feature_encoding,
    }


def _golden_oracles() -> dict[str, str]:
    """Frozen-snapshot oracles (VALUES literals) for gates whose semantics
    DuckDB cannot re-derive (xxhash64 signatures, seeded draws, iterative
    solvers).  Generated by ``tests/gen_goldens.py``, which first proves
    each query produces identical output across sessions with different
    parallelism — the reference analogue is its golden-file UDF suites
    (``clickhouse_udf/tests/unit_test/start_test.sh:1-28``)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden_oracles.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def oracle_sql() -> dict[str, str]:
    # pseudo-keys ("family__part") are hybrid-oracle fragments composed
    # below, never standalone gates
    goldens = {k: v for k, v in _golden_oracles().items() if "__" not in k}
    return {
        **goldens,
        "q1_pricing_summary": _Q1_SQL,
        "q3_shipping_priority": _Q3_SQL,
        "q5_region_revenue": _Q5_SQL,
        "delta_method": _DELTA_FAMILY_SQL,
        "ttest_1samp": _TTEST1_FAMILY_SQL,
        "ttest_2samp": _TTEST_FAMILY_SQL,
        "ttests_2samp": _TTESTS_SQL,
        "srm": _SRM_SQL,
        "streaming_charts": _STREAMING_CHARTS_SQL,
        "xexpt_ttest_2samp": _XEXPT_FAMILY_SQL,
        "xexpt_grouped": _XEXPT_GROUPED_SQL,
        "mann_whitney_utest": _MW_SQL,
        "kolmogorov_smirnov_test": _KS_SQL,
        "quantile_test_bucket": _QTB_SQL,
        "describe_quantiles": _DESCRIBE_QUANTILES_SQL,
        "matrix_ops": _MATRIX_OPS_SQL,
        "ols": (_OLS_FAMILY_SQL + " UNION ALL "
                + "SELECT variant, item, stat, value FROM ("
                + _golden_oracles().get(
                    "ols__heckman", "SELECT NULL AS variant, NULL AS item, "
                    "NULL AS stat, NULL AS value WHERE FALSE") + ") __oh"
                + " UNION ALL SELECT variant, item, stat, value FROM ("
                + _golden_oracles().get(
                    "ols__quantreg", "SELECT NULL AS variant, NULL AS item, "
                    "NULL AS stat, NULL AS value WHERE FALSE") + ") __oq"),
        "robust_ols": _ROBUST_OLS_SQL,
        "did": (_DID_SQL + " UNION ALL SELECT name, beta FROM ("
                + _golden_oracles().get(
                    "did__synth", "SELECT NULL AS name, NULL AS beta "
                    "WHERE FALSE") + ") __ds"
                + " UNION ALL SELECT name, beta FROM ("
                + _golden_oracles().get(
                    "did__event", "SELECT NULL AS name, NULL AS beta "
                    "WHERE FALSE") + ") __de"
                + " UNION ALL SELECT name, beta FROM ("
                + _DID_CS_SQL + ") __cs"
                + " UNION ALL SELECT name, beta FROM ("
                + _golden_oracles().get(
                    "did__its", "SELECT NULL AS name, NULL AS beta "
                    "WHERE FALSE") + ") __di"),
        "iv_regression": _IV_SQL,
        "linear_dml": _LINEAR_DML_SQL,
        "auc": (_AUC_FAMILY_SQL + " UNION ALL "
                + "SELECT variant, item, stat, value FROM ("
                + _golden_oracles().get(
                    "auc__glm", "SELECT NULL AS variant, NULL AS item, "
                    "NULL AS stat, NULL AS value WHERE FALSE") + ") __gl"),
        "survival": (_KM_LONG_SQL + " UNION ALL "
                     + _golden_fragment("survival__cox")),
        "t_learner": (
            _T_LEARNER_SQL + " UNION ALL "
            + "SELECT variant, l_returnflag, avg_ite FROM ("
            + _golden_oracles().get(
                "t_learner__cvt", "SELECT NULL AS variant, NULL AS "
                "l_returnflag, NULL AS avg_ite WHERE FALSE") + ") __tc "
            + "UNION ALL SELECT variant, l_returnflag, avg_ite FROM ("
            + _golden_oracles().get(
                "t_learner__x", "SELECT NULL AS variant, NULL AS "
                "l_returnflag, NULL AS avg_ite WHERE FALSE") + ") __tx "
            + "UNION ALL SELECT variant, l_returnflag, avg_ite FROM ("
            + _golden_oracles().get(
                "t_learner__prop", "SELECT NULL AS variant, NULL AS "
                "l_returnflag, NULL AS avg_ite WHERE FALSE") + ") __tp "
            + "UNION ALL SELECT variant, l_returnflag, avg_ite FROM ("
            + _golden_oracles().get(
                "t_learner__retro", "SELECT NULL AS variant, NULL AS "
                "l_returnflag, NULL AS avg_ite WHERE FALSE") + ") __tr "
            + "UNION ALL SELECT variant, l_returnflag, avg_ite FROM ("
            + _golden_oracles().get(
                "t_learner__r", "SELECT NULL AS variant, NULL AS "
                "l_returnflag, NULL AS avg_ite WHERE FALSE") + ") __trl "
            + "UNION ALL SELECT variant, l_returnflag, avg_ite FROM ("
            + _golden_oracles().get(
                "t_learner__dr", "SELECT NULL AS variant, NULL AS "
                "l_returnflag, NULL AS avg_ite WHERE FALSE") + ") __td"),
        "ate": _ATE_SQL,
        "matching": (
            _MATCHING_FAMILY_SQL + " UNION ALL "
            + "SELECT variant, item, stat, value FROM ("
            + _golden_oracles().get(
                "matching__prognostic", "SELECT NULL AS variant, NULL AS "
                "item, NULL AS stat, NULL AS value WHERE FALSE") + ") __mp"
            + " UNION ALL SELECT variant, item, stat, value FROM ("
            + _golden_oracles().get(
                "matching__entropy", "SELECT NULL AS variant, NULL AS "
                "item, NULL AS stat, NULL AS value WHERE FALSE") + ") __me"),
        "multi_arm_tests": _MULTI_ARM_SQL,
        "contingency_tests": _CONTINGENCY_SQL,
        "multiple_testing": _MULTIPLE_TESTING_SQL,
        "temporal_ops": _TEMPORAL_SQL,
        "power_effect_size": (_EFFECT_SIZE_SQL + " UNION ALL "
                              + _golden_fragment("power__closed")),
        "group_set": _GROUP_SET_SQL,
        "lift_gain": _LIFT_FAMILY_SQL,
        "exact_dedup": _EXACT_DEDUP_SQL,
        # the LSH gate's banding params give recall 1.0 on this corpus at
        # threshold 0.5, so the exact all-pairs Jaccard relation IS the
        # oracle — a recall regression turns the row red
        "minhash_lsh_dedup": _NGRAM_JACCARD_SQL,
        "ngram_jaccard_dedup": _NGRAM_JACCARD_SQL,
        "dedup_components": _DEDUP_COMPONENTS_SQL,
        "knn": ("SELECT 'exact' AS variant, query_id, vec_id, rank, score "
                + "FROM (" + _KNN_SQL + ") __kx UNION ALL "
                + "SELECT variant, query_id, vec_id, rank, score FROM ("
                + _golden_oracles().get(
                    "knn__ivf", "SELECT NULL AS variant, NULL AS query_id, "
                    "NULL AS vec_id, NULL AS rank, NULL AS score "
                    "WHERE FALSE") + ") __ki UNION ALL "
                + "SELECT variant, query_id, vec_id, rank, score FROM ("
                + _golden_oracles().get(
                    "knn__lsh", "SELECT NULL AS variant, NULL AS query_id, "
                    "NULL AS vec_id, NULL AS rank, NULL AS score "
                    "WHERE FALSE") + ") __kl UNION ALL "
                + "SELECT variant, query_id, vec_id, rank, score FROM ("
                + _golden_oracles().get(
                    "knn__pq", "SELECT NULL AS variant, NULL AS query_id, "
                    "NULL AS vec_id, NULL AS rank, NULL AS score "
                    "WHERE FALSE") + ") __kp UNION ALL "
                + "SELECT 'bm25' AS variant, query_id, vec_id, rank, score "
                + "FROM (" + _BM25_SQL + ") __kb UNION ALL "
                + "SELECT 'tfidf' AS variant, query_id, vec_id, rank, score "
                + "FROM (" + _TFIDF_SQL + ") __kt"),
        "embedding_near_dup": (
            _EMB_NEAR_DUP_SQL + " UNION ALL "
            + "SELECT variant, id_a, id_b, cosine FROM ("
            + _golden_oracles().get(
                "embedding_near_dup__pca",
                "SELECT NULL AS variant, NULL AS id_a, NULL AS id_b, "
                "NULL AS cosine WHERE FALSE") + ") __gp"),
        "media_features": _MEDIA_FEATURES_SQL,
        "text_profile": _TEXT_PROFILE_SQL,
        "vector_functions": _VECTOR_FUNCTIONS_SQL,
    }


def extra_oracle_sql() -> dict[str, str]:
    """DuckDB oracles for ``extra_queries()`` (locally verified by
    ``tests/test_oracle_parity.py``; outside the driver's 50-row
    correctness window — see ``extra_queries``)."""
    return {
        "feature_encoding": _FEATURE_ENCODING_SQL,
    }
