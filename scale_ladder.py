"""Scale-ladder probe above sf1: run the most expensive families at a
×30-of-sf0.1 replica ("sf3", 3× the sf1 volume) and record per-family
walls, to evidence the claimed linearity on data that no longer rides
the page cache the way sf0.1 does.

Usage:  python scale_ladder.py            # writes SCALE_LADDER.json
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
        SPARK_GRAFT_CPUS   (default 32)
        SPARK_GRAFT_LADDER_FAMILIES  comma list override

The probe reuses bench.py's replica synthesizer (`_ensure_scaled`, same
id-shift + text-suffix + embedding-rotation construction that keeps
duplicate structure linear in the factor) and the entry's `queries()`
registry, with the bench's isolated-per-family cache policy so sf1→sf3
ratios measure data scaling, not cache reuse.
"""
from __future__ import annotations

import json
import os
import time

import bench
from __spark_entry__ import queries

# the top sf1 families by wall from the round-10 idle record, plus the
# two cheap sanity anchors (q1 scan-bound, exact_dedup shuffle-bound)
DEFAULT_FAMILIES = [
    "media_features", "matching", "t_learner", "dedup_components",
    "corpus_assembly", "ngram_jaccard_dedup", "causal_forest",
    "stochastic_sgd", "ols", "causal_tree",
    "q1_pricing_summary", "exact_dedup",
]


def main() -> None:
    fams = os.environ.get("SPARK_GRAFT_LADDER_FAMILIES")
    fams = fams.split(",") if fams else DEFAULT_FAMILIES
    from pyspark.sql import SparkSession

    from fast_causal_inference_spark.session import configure_session

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (SparkSession.builder.appName("fcis-scale-ladder")
               .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
               .config("spark.ui.enabled", "false")
               .config("spark.ui.showConsoleProgress", "false")
               .config("spark.sql.streaming.stateStore.maintenanceInterval",
                       "3600s"))
    spark = configure_session(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    sf_dir = bench.SF_DIR
    sf1_dir = bench._ensure_scaled(spark, sf_dir, 10, "sf1")
    sf3_dir = bench._ensure_scaled(spark, sf_dir, 30, "sf3")
    out: dict = {"metric": "scale_ladder", "families": {},
                 "provenance": bench._provenance(),
                 "cache_policy": "isolated-per-family"}
    try:
        la0 = os.getloadavg()[0]
    except OSError:
        la0 = None
    out["preflight"] = {"loadavg_1m": la0}
    for name in fams:
        if name not in qs:
            continue
        row: dict = {}
        for label, d in (("sf1", sf1_dir), ("sf3", sf3_dir)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                qs[name](spark, d).count()
                row[label] = round(time.perf_counter() - t0, 4)
            except Exception as exc:  # record, keep laddering
                row[label + "_error"] = f"{type(exc).__name__}: {exc}"[:200]
        if "sf1" in row and "sf3" in row and row["sf1"] > 0:
            row["ratio"] = round(row["sf3"] / row["sf1"], 3)
        try:
            row["loadavg_1m"] = round(os.getloadavg()[0], 2)
        except OSError:
            pass
        out["families"][name] = row
        print(name, row, flush=True)
    with open("SCALE_LADDER.json", "w") as fh:
        fh.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
