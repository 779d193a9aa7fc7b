"""Fresh-process sweep harness (r8 verdict item 6): run `python bench.py
--sweep` N times, each in its OWN process (new JVM, new Python workers, new
JIT state — the headline-bench comparability standard), and merge:

  - queries[q][sf]        = min across runs of the per-run (min-of-3) cell
  - run_variance[q][sf]   = (max-min)/min across the runs' per-run minima —
                            the cross-process variance column the in-process
                            spread can't see
  - anchored_ratios[q][sf] = min across runs of (cell / same-run anchor
                            total at that sf) — the primary quantity; raw
                            seconds swing with host drift, ratios cancel it
  - spread[q][sf]          = max across runs of the in-process spread

Usage: python scripts/sweep_fresh.py [n_runs] > BENCH_SWEEP_rN.json
Progress goes to stderr; stdout is the single merged JSON line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    for i in range(n_runs):
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "bench.py", "--sweep"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
        # the JSON line is the last non-empty stdout line
        line = [ln for ln in out.splitlines() if ln.strip()][-1]
        runs.append(json.loads(line))
        print(f"sweep run {i + 1}/{n_runs} done in {time.time() - t0:.0f}s",
              file=sys.stderr)
    names = list(runs[0]["queries"].keys())
    sfs = runs[0]["sfs"]
    queries, variance, ratios, spread = {}, {}, {}, {}
    for q in names:
        queries[q], variance[q], ratios[q], spread[q] = {}, {}, {}, {}
        for sf in sfs:
            cells = [r["queries"][q][sf] for r in runs]
            queries[q][sf] = min(cells)
            variance[q][sf] = round(
                (max(cells) - min(cells)) / max(min(cells), 1e-9), 3)
            ratios[q][sf] = min(
                round(r["queries"][q][sf] / r["anchor_totals"][sf], 4)
                for r in runs)
            spread[q][sf] = max(r["spread"][q][sf] for r in runs)
    print(json.dumps({
        "metric": "scale_curve_fresh",
        "unit": "sec",
        "n_runs": n_runs,
        "sfs": sfs,
        "queries": queries,
        "run_variance": variance,
        "anchored_ratios": ratios,
        "in_process_spread": spread,
        "anchor_totals_per_run": [r["anchor_totals"] for r in runs],
        "methodology": ("min / variance across N fresh-process sweep runs "
                        "(each itself warm-pass + min-of-3 per cell, noop "
                        "sink); anchored_ratios = min over runs of "
                        "cell/same-run-anchor — the primary cross-round "
                        "quantity (r8 verdict item 6)"),
    }))


if __name__ == "__main__":
    main()
