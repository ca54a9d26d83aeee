"""Temporal joins and rollups: as-of join, range (interval) join,
time-bucket rollup.

Spark has no ASOF JOIN (pandas ``merge_asof``, kdb ``aj``, QuestDB/
ClickHouse ASOF) and naively expresses point-in-interval joins as
broadcast-nested-loop — both are staples of event analytics at scale.
Everything here is pure DataFrame composition (no Python in the row
path), designed around ONE keyed shuffle each:

* **as-of join** — the union trick: tag both inputs, union, and take a
  running ``last(..., ignoreNulls)`` over (key) ordered by (ts, side).
  One shuffle + in-partition sort, identical asymptotics to a sort-merge
  join; no per-key driver work, no pandas.
* **range join** — bucketize: explode each interval into the fixed-width
  buckets it covers, equi-join on (key, bucket), then apply the exact
  containment predicate and drop bucket-duplicate matches.  Turns the
  nested-loop O(|L|·|R|) into a hash join whose fan-out is
  interval_len/bucket_width per row.
* **time_bucket rollup** — ``F.window`` grouping at one or several
  resolutions in one pass (resolutions unioned after per-level
  aggregation — each level is map-side-combined independently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["asof_join", "range_join", "time_bucket_rollup"]


def _ts_double(c: Column) -> Column:
    """Timestamp-ish column → epoch seconds as double.  Goes through a
    TIMESTAMP cast (valid from TIMESTAMP, TIMESTAMP_NTZ, and numeric
    epoch-seconds) because a direct double cast is undefined for NTZ."""
    return F.unix_micros(c.cast("timestamp")) / 1e6


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward",
              tolerance: float | None = None,
              right_cols: list[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``direction='backward'``) or at-or-after (``'forward'``) its
    timestamp, per join key — distributed ``pandas.merge_asof``.

    ``tolerance`` (seconds) nulls the match when the time gap exceeds it.
    Matched right columns (default: all non-key, non-ts) are appended
    with ``suffix``; ``<right_ts><suffix>`` carries the matched
    timestamp.  Ties (equal timestamps) match, like merge_asof; among
    DUPLICATE right timestamps the winner is chosen by payload hash —
    deterministic and retry-stable, where pandas uses input position
    (meaningless for a distributed relation).

    Plan shape: union of the two tagged inputs, one window over
    ``partitionBy(keys) orderBy(ts, side)`` with running
    ``last(ignoreNulls)`` — a single hash shuffle on the join keys, no
    pandas, no broadcast requirement on either side.  Skewed keys: salt
    upstream or pre-filter hot keys; the window is as skew-sensitive as
    any keyed sort."""
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = right_cols or [c for c in right.columns
                             if c not in keys and c != right_ts]
    missing = [c for c in payload if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right: {missing}")

    lt = _ts_double(F.col(left_ts))
    rt = _ts_double(F.col(right_ts))
    # side ordering makes right rows visible to same-timestamp left rows:
    # backward scans ascending with right(0) before left(1); forward scans
    # descending with the same tag order
    l_tagged = left.select(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(keys)],
        lt.alias("__ts"), F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast("double").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in payload])
    r_tagged = right.select(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(keys)],
        rt.alias("__ts"), F.lit(0).alias("__side"),
        # duplicate right timestamps: break the tie on the payload hash so
        # the matched row is a pure function of the DATA, not of shuffle
        # arrival order (pandas resolves this positionally — a notion a
        # distributed relation does not have)
        F.xxhash64(*[F.col(c) for c in payload],
                   F.lit(0)).alias("__tb"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        rt.alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in payload])

    u = l_tagged.unionByName(r_tagged)
    order = [F.col("__ts").asc(), F.col("__side").asc(),
             F.col("__tb").asc()] \
        if direction == "backward" \
        else [F.col("__ts").desc(), F.col("__side").asc(),
              F.col("__tb").asc()]
    w = (Window.partitionBy(*[f"__k{i}" for i in range(len(keys))])
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.select(
        "__side", "__lrow",
        F.last("__rts", ignorenulls=True).over(w).alias("__m_ts"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
          for c in payload])
    out = matched.where(F.col("__side") == 1)
    lts = _ts_double(F.col("__lrow").getField(left_ts))
    gap = (lts - F.col("__m_ts")) if direction == "backward" \
        else (F.col("__m_ts") - lts)
    # a NULL-timestamp left row can never have an as-of match: in the
    # forward (desc) scan NULLs sort last, so the running last() has
    # accumulated every right row and would fabricate a match to the
    # earliest one (backward/asc gets this right only by accident of
    # nulls-first ordering)
    keep = lts.isNotNull() & F.col("__m_ts").isNotNull() & \
        ((gap <= F.lit(float(tolerance))) if tolerance is not None
         else F.lit(True))
    cols = [F.col("__lrow").getField(c).alias(c) for c in left.columns]
    cols.append(F.when(keep, F.timestamp_micros(
        (F.col("__m_ts") * 1e6).cast("long")))
        .alias(right_ts + suffix))
    for c in payload:
        cols.append(F.when(keep, F.col(f"__m_{c}")).alias(c + suffix))
    return out.select(*cols)


def range_join(points: DataFrame, intervals: DataFrame,
               on: list[str] | str | None,
               point_ts: str, start_ts: str, end_ts: str,
               bucket_width: float = 3600.0,
               how: str = "inner") -> DataFrame:
    """Point-in-interval join (``start ≤ point < end``) via bucketing.

    Each interval explodes into the fixed-width time buckets it covers;
    points join their single bucket with a hash equi-join on
    (keys, bucket); the exact containment predicate then filters, and
    bucket-duplicate matches collapse.  Pick ``bucket_width`` near the
    typical interval length: fan-out per interval row is
    ``len/width + 1``.  ``how='left'`` keeps unmatched points.

    This is the standard rewrite that keeps Catalyst off the
    BroadcastNestedLoopJoin path for inequality-only joins."""
    keys = ([on] if isinstance(on, str) else list(on or []))
    p_ts = _ts_double(F.col(point_ts))
    s_ts = _ts_double(F.col(start_ts))
    e_ts = _ts_double(F.col(end_ts))
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    pt = points.withColumn("__bucket", F.floor(p_ts / w).cast("long")) \
               .withColumn("__pts", p_ts)
    # explode to covered buckets below the generate: sequence of longs only
    iv = (intervals
          .withColumn("__s", s_ts).withColumn("__e", e_ts)
          .where(F.col("__e") > F.col("__s"))
          .withColumn("__bucket", F.explode(F.sequence(
              F.floor(F.col("__s") / w).cast("long"),
              F.floor((F.col("__e") - 1e-9) / w).cast("long")))))
    cond = [pt["__bucket"] == iv["__bucket"]] + \
        [pt[k] == iv[k] for k in keys] + \
        [pt["__pts"] >= iv["__s"], pt["__pts"] < iv["__e"]]
    ivp = [c for c in intervals.columns if c not in keys]
    joined = pt.join(iv, cond, "left" if how == "left" else "inner")
    out = joined.select(
        *[pt[c] for c in points.columns],
        *[iv[c].alias(c if c not in points.columns else c + "_interval")
          for c in ivp])
    # a point can meet the same interval only in ONE of its buckets (the
    # point's own), so no bucket-duplicate dedup is needed
    return out


def time_bucket_rollup(df: DataFrame, ts_col: str,
                       resolutions: list[str],
                       aggs: list[Column],
                       group_cols: list[str] | None = None) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the same aggregates at
    each requested window resolution, unioned long-format with a
    ``resolution`` tag and ``bucket_start``/``bucket_end`` columns.

    Each resolution is an independent map-side-combined windowed groupBy
    over one scan of the (cached or columnar) source — at 100 TB the
    right call is coarsest-first cascading only when aggregates are
    reaggregable; this general form recomputes from detail, which is
    exact for any aggregate (quantiles included)."""
    gcols = group_cols or []
    parts = []
    for res in resolutions:
        win = F.window(F.col(ts_col), res)
        agged = df.groupBy(*gcols, win.alias("__w")).agg(*aggs)
        acols = [c for c in agged.columns if c not in set(gcols) | {"__w"}]
        parts.append(
            agged.select(F.lit(res).alias("resolution"),
                         F.col("__w.start").alias("bucket_start"),
                         F.col("__w.end").alias("bucket_end"),
                         *gcols, *acols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
