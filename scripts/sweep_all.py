#!/usr/bin/env python
"""Time EVERY registered query at $SPARK_GRAFT_SF_DIR (default sf0.1):
the optimization-round checklist source.  Two samples per query (first
touch may pay one-time layout materialization for the ANN layout
queries; the second sample is the steady state).  Writes JSON lines to
stdout, one per query, then a sorted summary to stderr.

    python scripts/sweep_all.py [--runs N] [query ...]
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
    argv = list(sys.argv[1:])
    runs = 2
    if argv and argv[0] == "--runs":
        runs = int(argv[1])
        argv = argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="sweep-all",
                          master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = argv or list(qs)
    qs["q02_region_revenue"](spark, sf_dir).collect()  # warm JVM
    out = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"sweep:{name}")
        ts = []
        try:
            for _ in range(runs):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                rows = df.collect()
                ts.append(round(time.time() - t0, 3))
                # free request-scoped pins like the API layer does —
                # otherwise 200 queries of tagged persists accumulate
                # in one session and skew later timings
                from mondrian_rest_spark.operators.dedup import \
                    unpersist_request_frames
                unpersist_request_frames(df)
            rec = {"query": name, "samples": ts, "rows": len(rows)}
        except Exception as e:  # record, keep sweeping
            rec = {"query": name, "samples": ts,
                   "err": f"{type(e).__name__}: {e}"[:200]}
        finally:
            sc.setJobDescription(None)
        out[name] = rec
        print(json.dumps(rec), flush=True)
    worst = sorted(out.values(),
                   key=lambda r: -(min(r["samples"]) if r["samples"] else 1e9))
    sys.stderr.write("\n== slowest (by best sample) ==\n")
    for r in worst[:30]:
        sys.stderr.write(f"{r['query']:36s} {r['samples']}\n")


if __name__ == "__main__":
    main()
