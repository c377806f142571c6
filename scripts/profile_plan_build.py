#!/usr/bin/env python
"""Plan-build vs execution wall breakdown for headline queries (r14,
VERDICT r13 #3: the +22% clean-box sf0.1 drift concentrated in
q15/q16/q17, none of which route — suspect plan-BUILD work).

    python scripts/profile_plan_build.py [query ...]

Per query, 3 runs of (build = calling the queries() thunk, which
constructs the full DataFrame plan incl. any plan-time lookups;
exec = .collect()); reports the medians.  Run on an idle box.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from mondrian_rest_spark.sources.registry import build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["q15_lag_prev_period",
                             "q16_named_set_topcount",
                             "q17_dense_axes"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="mrs-profile",
                          master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    qs["q02_region_revenue"](spark, sf_dir).collect()   # warm JVM
    out = {"loadavg_start": [round(x, 2) for x in os.getloadavg()],
           "sf_dir": sf_dir, "queries": {}}
    for n in names:
        builds, execs = [], []
        for _ in range(3):
            t0 = time.time()
            df = qs[n](spark, sf_dir)
            t1 = time.time()
            _ = df.collect()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        out["queries"][n] = {
            "build_median_s": round(sorted(builds)[1], 3),
            "build_first_s": round(builds[0], 3),
            "exec_median_s": round(sorted(execs)[1], 3)}
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
