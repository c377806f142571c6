#!/usr/bin/env python
"""Capture `.explain("formatted")` for bench queries into
plans/r14/<query>_<tag>.txt (optimization-round evidence).

    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

Defaults to the 18 headline bench queries at $SPARK_GRAFT_SF_DIR
(default sf0.1).  Explain only — no query execution beyond the
plan-time lookups the thunks themselves perform.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from mondrian_rest_spark.sources.registry import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="mrs-capture-plans",
                          master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    outdir = os.path.join(REPO, "plans",
                          os.environ.get("MRS_PLANS_ROUND", "r14"))
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        # iterative operators (label propagation) nest one
        # InMemoryRelation per round and the explain printer expands
        # every cached subtree recursively — megabytes of repeats of
        # the same pipeline.  The plan-shape evidence lives in the
        # head; cap the file with an explicit marker.
        lines = txt.splitlines()
        if len(lines) > 4000:
            lines = lines[:4000] + [
                f"[... truncated {len(lines) - 4000} lines: nested "
                "InMemoryRelation lineage repeats the cached subtree "
                "per propagation round ...]"]
            txt = "\n".join(lines) + "\n"
        path = os.path.join(outdir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
