#!/usr/bin/env python
"""Scale-ladder probe above sf1 (round 11): run the most expensive
bench families at sf1 (×10 the sf0.1 volume) AND sf3 (×30) and print
one JSON line with per-family walls and sf3/sf1 ratios.

The point is the 100 TB mandate's linearity evidence: a family whose
wall grows ≈3× from ×10 to ×30 data is data-linear (map-linear codecs,
output-bound assembly, banded dedup joins); super-linear growth would
flag a hidden all-pairs or driver-bound step.  Results are recorded in
SCALE.md with an explanation for any family >1.5× super-linear.

Usage: python scale_ladder.py  (env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _ensure_scaled, _preflight_load, _provenance  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# the 10 most expensive sf1 families from the round-10 idle record,
# spanning every structural class: map-linear Arrow codec work (media),
# multi-estimator stat scans (matching, t_learner, ols, causal_forest),
# output-bound assembly (corpus), banded/prefix-filtered dedup joins
# (ngram, dedup_components, simhash), and broadcast-candidate ANN (knn)
FAMILIES = [
    "media_features", "matching", "corpus_assembly", "t_learner",
    "ngram_jaccard_dedup", "dedup_components", "simhash_dedup",
    "causal_forest", "ols", "knn",
]


def main() -> None:
    preflight = _preflight_load()
    import __spark_entry__ as entry

    from pyspark.sql import SparkSession

    from fast_causal_inference_spark.session import configure_session

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (SparkSession.builder.appName("fcis-scale-ladder")
               .master(f"local[{CPUS}]")
               .config("spark.ui.enabled", "false")
               .config("spark.ui.showConsoleProgress", "false")
               .config("spark.sql.streaming.stateStore.maintenanceInterval",
                       "3600s"))
    spark = configure_session(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    dirs = {"sf1": _ensure_scaled(spark, SF_DIR, 10, "sf1"),
            "sf3": _ensure_scaled(spark, SF_DIR, 30, "sf3")}
    out: dict = {"metric": "scale_ladder", "families": {},
                 "preflight": preflight, "provenance": _provenance(),
                 "cache_policy": "isolated-per-family"}
    for name in FAMILIES:
        fam: dict = {}
        for label, d in dirs.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                qs[name](spark, d).count()
                fam[label] = round(time.perf_counter() - t0, 2)
            except Exception as exc:  # record, never zero the ladder
                fam[f"{label}_error"] = f"{type(exc).__name__}: {exc}"[:200]
            try:
                fam[f"{label}_loadavg"] = round(os.getloadavg()[0], 2)
            except OSError:
                pass
        if "sf1" in fam and "sf3" in fam and fam["sf1"] > 0:
            fam["ratio"] = round(fam["sf3"] / fam["sf1"], 2)
        out["families"][name] = fam
        print(f"{name}: {fam}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
