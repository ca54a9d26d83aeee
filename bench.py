#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    import __spark_entry__ as entry
    from fast_causal_inference_spark.session import get_session

    spark = get_session("fcis-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup (not measured)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = entry.queries()
    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count() if df.isStreaming is False else -1
        times[name] = round(time.perf_counter() - t0, 4)
        _ = n

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_query_suite_wall_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
