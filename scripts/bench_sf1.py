#!/usr/bin/env python
"""Scale-proof bench at sf1 (10x the driver's bench scale) with the
r13 drift-bounding protocol (VERDICT r12 #6): the headline loop runs
TWICE — once at the start and once at the end of the record — with
1/5/15-min load averages captured around every loop, so box-noise
drift is bounded INSIDE the record instead of guessed between rounds.

    python scripts/gen_sf1.py                # once: writes sf1_data/
    python scripts/bench_sf1.py BENCH_sf1_r13.json [round]

Protocol (matches the r9-r12 records, plus the second loop):
  1. headline loop A: bench.py, median-of-3 interleaved, samples kept
  2. extra loop: d09 (exact-Jaccard PPJoin) + d11 (spill) interleaved
     with the headline set — the adversarial-scale evidence queries
  3. headline loop B: same as A
The parsed record reports loop A (comparable to prior rounds); loop B
and both loops' load averages ride alongside as drift evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(extra: str = "", cooldown: int = 75) -> dict:
    # idle cooldown so the loop's START load average reflects the BOX,
    # not the tail of our own previous loop (1-min loadavg needs ~60s
    # to decay) — without this the drift evidence is self-polluted
    import time
    time.sleep(cooldown)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=os.path.join(REPO, "sf1_data"),
               SPARK_GRAFT_BENCH_SAMPLES="1",
               SPARK_GRAFT_EXTRA=extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    # bench.py prints ONE JSON line last
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def wait_for_idle(max_load: float = 1.5, cap_s: int = 900,
                  poll_s: int = 30) -> dict:
    """Spin-wait until the 1- AND 5-minute load averages drop below
    ``max_load`` (r14, VERDICT r13 #7: BENCH_sf1_r13 ran at 5-min
    loadavg 5-6 and its per-query samples spread 4.7x — an unreadable
    record).  Bounded by ``cap_s``; the check itself is recorded so a
    capped-out (still-busy) record is self-describing."""
    import time
    waited = 0
    while True:
        l1, l5, l15 = os.getloadavg()
        if (l1 < max_load and l5 < max_load) or waited >= cap_s:
            return {"loadavg_at_start": [l1, l5, l15],
                    "max_load": max_load, "waited_s": waited,
                    "idle": l1 < max_load and l5 < max_load}
        time.sleep(poll_s)
        waited += poll_s


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1_r13.json"
    rnd = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    idle_check = wait_for_idle()
    loop_a = run_bench()
    extra = run_bench(extra="d09_neardup_jaccard_prefix,"
                            "d11_neardup_jaccard_spill")
    loop_b = run_bench()
    record = {
        "round": rnd,
        "sf": 1.0,
        "data": ("repo-generated sf1_data/ (scripts/gen_sf1.py): 10x "
                 "sf0.1, schema- and domain-faithful to the driver's "
                 "synthetic tables (seed 42); /root/testdata is "
                 "read-only and stops at sf0.1"),
        "runs": 3,
        "variance_note": (
            "r13 drift-bounding protocol (scripts/bench_sf1.py): the "
            "headline loop runs TWICE (loops A and B bracket the d09/"
            "d11 extra loop) with load averages captured around every "
            "loop.  parsed = loop A (comparable to prior rounds); "
            "headline_loop_b bounds within-record drift; the extra "
            "loop's own headline total cross-checks cache effects."),
        "idle_check": idle_check,
        "parsed": loop_a,
        "headline_loop_b": {"value": loop_b["value"],
                            "queries": loop_b["queries"],
                            "loadavg": loop_b["loadavg"]},
        "extra_loop": {
            "d09_neardup_jaccard_prefix":
                extra["queries"].get("d09_neardup_jaccard_prefix"),
            "d11_neardup_jaccard_spill":
                extra["queries"].get("d11_neardup_jaccard_spill"),
            "headline_total_during_extra": extra["value"],
            "samples": {k: v for k, v in extra.get("samples", {}).items()
                        if k.startswith("d09") or k.startswith("d11")},
            "loadavg": extra["loadavg"]},
        "samples": loop_a.get("samples", {}),
        "samples_loop_b": loop_b.get("samples", {}),
    }
    with open(os.path.join(REPO, dest), "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {dest}: loopA={loop_a['value']}s "
          f"loopB={loop_b['value']}s "
          f"loadA={loop_a['loadavg']} loadB={loop_b['loadavg']}")


if __name__ == "__main__":
    main()
