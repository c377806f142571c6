#!/usr/bin/env python
"""(Re)generate committed golden results for registered queries that
have no single-statement DuckDB oracle (today: s08 trained-IVF ANN and
s09 IVF-PQ — iterative training, but DETERMINISTIC integer math, so a
frozen result file upgrades their correctness record from rows-only to
value-checked at zero ongoing cost — r6 VERDICT item 2).

Goldens are parquet (exact dtypes, hash-comparable) committed under
tests/golden/<query>@<sf_name>.parquet; scripts/check_oracle.py
value-compares against them whenever no oracle_sql entry exists.
Regeneration is reproducible bit-for-bit because the paths are
deterministic (no RNG, integer quantization) — any diff after a code
change is a REAL semantic change and must be reviewed, not refreshed
blindly.

Usage:
    python scripts/make_golden.py [sf_dir ...]   # default sf0.001+sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from mondrian_rest_spark.sources.registry import build_session  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def golden_path(name: str, sf_dir: str) -> str:
    return os.path.join(GOLDEN_DIR,
                        f"{name}@{os.path.basename(sf_dir.rstrip('/'))}.parquet")


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    targets = [n for n in qs if n not in oracles]
    for sf_dir in sf_dirs:
        for name in targets:
            pdf = qs[name](spark, sf_dir).toPandas()
            out = golden_path(name, sf_dir)
            pdf.to_parquet(out, index=False)
            print(f"wrote {out}: {len(pdf)} rows, cols={list(pdf.columns)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
