#!/usr/bin/env python
"""Profile one or more query families job-by-job (guide §1).

Runs each named family solo on a fresh session with the Spark event log
enabled, then parses the log into a per-family summary:

  * wall     — end-to-end time of the family gate (build + count)
  * njobs    — Spark jobs launched
  * job_sec  — sum of job (submission→completion) times
  * gap_sec  — wall minus the union of job intervals = driver/Python time
               (pandas finalizers, solver iterations, createDataFrame, plan
               time) — the part no Spark tuning can see
  * top stages by executor-summed task time

Usage: python tools/profile_family.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--explain", action="store_true",
                    help="also dump explain('formatted') to --plans-dir")
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--plans-dir", default="plans/r12")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    from fast_causal_inference_spark.session import configure_session

    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    for f in os.listdir(evdir):
        try:
            os.unlink(os.path.join(evdir, f))
        except OSError:
            pass

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (SparkSession.builder.appName("fcis-profile")
               .master(f"local[{args.cpus}]")
               .config("spark.ui.enabled", "false")
               .config("spark.ui.showConsoleProgress", "false")
               .config("spark.eventLog.enabled", "true")
               .config("spark.eventLog.dir", evdir)
               .config("spark.eventLog.compress", "false")
               .config("spark.eventLog.rolling.enabled", "false")
               .config("spark.sql.streaming.stateStore.maintenanceInterval",
                       "3600s"))
    spark = configure_session(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # minimal warmup (bench does more; here we only want codegen+arrow pools)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as pd
    from pyspark.sql import functions as F
    _warm = F.pandas_udf(lambda s: s * 1.0, "double")
    spark.range(10000).select(F.sum(_warm(F.col("id").cast("double")))).collect()
    spark.createDataFrame(pd.DataFrame({"a": [1.0, 2.0]})).count()

    qs = {**entry.queries(), **entry.extra_queries()}
    sc = spark.sparkContext
    marks = {}
    for name in args.names:
        if name not in qs:
            print(f"unknown family {name}", file=sys.stderr)
            continue
        walls = []
        for ri in range(args.runs):
            sc.setJobDescription(f"FAMILY:{name}:{ri}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.explain and ri == 0:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted")
                except Exception:
                    import contextlib
                    import io
                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                os.makedirs(args.plans_dir, exist_ok=True)
                with open(os.path.join(
                        args.plans_dir,
                        f"{name}_{args.explain_suffix}.txt"), "w") as fh:
                    fh.write(plan)
            df.count()
            t1 = time.time()
            walls.append((t0, t1))
            spark.catalog.clearCache()
            sc.setJobDescription(None)
        marks[name] = walls
    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)

    # ---- parse the event log ----
    log = os.path.join(evdir, app_id)
    if not os.path.exists(log):
        cand = [f for f in os.listdir(evdir) if app_id in f]
        log = os.path.join(evdir, cand[0])
    if os.path.isdir(log):
        parts = sorted(f for f in os.listdir(log) if f.startswith("events"))
        log_files = [os.path.join(log, p) for p in parts]
    else:
        log_files = [log]
    jobs = []      # (desc, submit_ms, complete_ms, stage_ids)
    stages = {}    # id -> (name, task_time_ms, num_tasks, shuffle_read, sr_wait)
    pending = {}
    import itertools
    with open(log_files[0]) as _f0:
        lines = list(itertools.chain.from_iterable(
            open(lf) for lf in log_files)) if len(log_files) > 1 else \
            _f0.readlines()
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                pending[ev["Job ID"]] = (
                    ev.get("Properties", {}).get("spark.job.description", ""),
                    ev["Submission Time"],
                    [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    [s["Stage Name"].split("\n")[0]
                     for s in ev.get("Stage Infos", [])])
            elif e == "SparkListenerJobEnd":
                p = pending.pop(ev["Job ID"], None)
                if p:
                    jobs.append((p[0], p[1], ev["Completion Time"], p[2],
                                 p[3]))
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0)
                           - si.get("Submission Time", 0)),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {"name": "?", "tasks": 0, "ms": 0})
                ti = ev.get("Task Info") or {}
                st["task_ms"] = st.get("task_ms", 0) + \
                    max(0, ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
                for acc in ti.get("Accumulables", []):
                    nm = acc.get("Name", "")
                    if nm == "internal.metrics.shuffle.read.fetchWaitTime":
                        st["fetch_ms"] = st.get("fetch_ms", 0) + \
                            int(acc.get("Update", 0))
                    elif nm in ("internal.metrics.shuffle.read.localBytesRead",
                                "internal.metrics.shuffle.read."
                                "remoteBytesRead"):
                        st["sr_bytes"] = st.get("sr_bytes", 0) + \
                            int(acc.get("Update", 0))

    for name, walls in marks.items():
        for ri, (t0, t1) in enumerate(walls):
            t0ms, t1ms = t0 * 1000, t1 * 1000
            fam_jobs = [j for j in jobs
                        if t0ms - 500 <= j[1] <= t1ms + 500]
            ivs = sorted((j[1], j[2]) for j in fam_jobs)
            merged: list[list[float]] = []
            for a, b in ivs:
                if merged and a <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], b)
                else:
                    merged.append([a, b])
            covered = sum(b - a for a, b in merged) / 1000.0
            wall = t1 - t0
            print(f"\n=== {name} run{ri}: wall {wall:.2f}s  "
                  f"jobs {len(fam_jobs)}  job-covered {covered:.2f}s  "
                  f"driver-gap {wall - covered:.2f}s")
            sids = set()
            for j in fam_jobs:
                sids.update(j[3])
            fam_stages = [(sid, stages[sid]) for sid in sids if sid in stages]
            fam_stages.sort(key=lambda kv: -kv[1].get("task_ms", 0))
            for sid, st in fam_stages[:12]:
                print(f"  stage {sid:4d} tasks={st['tasks']:4d} "
                      f"wall={st['ms']/1000:6.2f}s "
                      f"taskSum={st.get('task_ms', 0)/1000:7.2f}s "
                      f"fetchWait={st.get('fetch_ms', 0)/1000:5.2f}s "
                      f"shufRead={st.get('sr_bytes', 0)/1e6:7.1f}MB  "
                      f"{st['name']}")
            slow_jobs = sorted(fam_jobs, key=lambda j: -(j[2] - j[1]))[:8]
            for j in slow_jobs:
                print(f"  job {(j[2]-j[1])/1000:6.2f}s  stages={j[3][:6]} "
                      f" {j[4][0][:70] if j[4] else '?'}")
            import collections as _c
            bycs = _c.Counter()
            bytime = _c.Counter()
            for j in fam_jobs:
                cs = j[4][0][:70] if j[4] else "?"
                bycs[cs] += 1
                bytime[cs] += (j[2] - j[1]) / 1000.0
            print("  -- jobs by callsite --")
            for cs, cnt in bycs.most_common(10):
                print(f"  {cnt:3d} jobs {bytime[cs]:6.2f}s  {cs}")


if __name__ == "__main__":
    main()
