#!/usr/bin/env python
"""Wall-clock sampling profiler across ALL driver threads (the gate
fan-out runs inside _concurrent's thread pool, which cProfile on the
main thread cannot see).  Samples sys._current_frames() at ~100 Hz and
aggregates by (file:line) of the deepest non-stdlib frame plus the leaf
function, per family."""

from __future__ import annotations

import argparse
import collections
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--top", type=int, default=18)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    from fast_causal_inference_spark.session import configure_session

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = configure_session(
        SparkSession.builder.appName("fcis-sample")
        .master(f"local[{args.cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stateStore.maintenanceInterval",
                "3600s")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = {**entry.queries(), **entry.extra_queries()}
    for name in args.names:
        qs[name](spark, args.sf).count()        # warm run
        spark.catalog.clearCache()

        samples: collections.Counter = collections.Counter()
        stop = threading.Event()
        main_tid = threading.get_ident()
        sampler_tid = [None]

        def sampler():
            sampler_tid[0] = threading.get_ident()
            while not stop.is_set():
                for tid, frame in sys._current_frames().items():
                    if tid == sampler_tid[0]:
                        continue
                    # walk to the deepest frame; record leaf plus the
                    # deepest repo frame for attribution
                    leaf = frame
                    repo = None
                    f = frame
                    while f is not None:
                        fn = f.f_code.co_filename
                        if "/root/repo/" in fn:
                            repo = f
                        leaf = f
                        f = None  # placeholder
                        break
                    # actually need full walk:
                    stack = []
                    f = frame
                    while f is not None:
                        stack.append(f)
                        f = f.f_back
                    # stack[0] is the LEAF already (sys._current_frames
                    # returns the innermost frame)
                    leaf = stack[0]
                    repo = next((fr for fr in stack
                                 if "/root/repo/" in fr.f_code.co_filename),
                                None)
                    lf = leaf.f_code
                    leaf_key = f"{os.path.basename(lf.co_filename)}:" \
                               f"{leaf.f_lineno}:{lf.co_name}"
                    if repo is not None:
                        rf = repo.f_code
                        repo_key = (f"{rf.co_filename.replace('/root/repo/', '')}"
                                    f":{repo.f_lineno}:{rf.co_name}")
                    else:
                        repo_key = "(no-repo-frame)"
                    samples[(repo_key, leaf_key)] += 1
                time.sleep(0.01)

        th = threading.Thread(target=sampler, daemon=True)
        t0 = time.perf_counter()
        th.start()
        qs[name](spark, args.sf).count()
        stop.set()
        th.join()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        total = sum(samples.values())
        print(f"\n##### {name}: wall {wall:.2f}s, {total} thread-samples")
        for (repo_key, leaf_key), c in samples.most_common(args.top):
            print(f"  {c:5d}  {repo_key}   [{leaf_key}]")
    spark.stop()


if __name__ == "__main__":
    main()
