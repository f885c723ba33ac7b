"""Summarize an interleaved scaling-legs JSONL (BENCH/scaling_legs_*.jsonl)
into the north-rule efficiency numbers.

Each line: {"rep": i, "cores": N, "pinned": bool, "load_start": f,
            "r": <replay_bench JSON>}

Noise on this host only ever SLOWS a run, so per-level BEST approximates the
uncontended capability and best-pair efficiency is the meaningful estimator;
medians and every raw leg are printed alongside (nothing hidden).

Usage: python tools/scaling_summary.py BENCH/scaling_legs_r03.jsonl [--json out.json]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    path = sys.argv[1]
    legs = [json.loads(l) for l in open(path) if l.strip()]
    by_cores: dict[int, list[dict]] = {}
    for leg in legs:
        if not leg.get("r"):
            continue
        by_cores.setdefault(leg["cores"], []).append(leg)
    cores_sorted = sorted(by_cores)
    if len(cores_sorted) != 2:
        raise SystemExit(f"expected 2 parallelism levels, got {cores_sorted}")
    lo_c, hi_c = cores_sorted
    factor = hi_c / lo_c
    summary: dict = {"legs": len(legs), "cores": [lo_c, hi_c], "factor": factor}
    for c in cores_sorted:
        eps = [leg["r"]["events_per_sec"] for leg in by_cores[c]]
        loads = [leg["load_start"] for leg in by_cores[c]]
        summary[f"local{c}"] = {
            "runs_events_per_sec": eps,
            "load_start": loads,
            "best": max(eps),
            "median": statistics.median(eps),
        }
        print(f"local[{c}]: " + "  ".join(
            f"{e / 1000:.1f}k(load {l:.1f})" for e, l in zip(eps, loads)))
    lo, hi = summary[f"local{lo_c}"], summary[f"local{hi_c}"]
    summary["scaling_efficiency_best"] = round(hi["best"] / lo["best"] / factor, 3)
    summary["scaling_efficiency_median"] = round(hi["median"] / lo["median"] / factor, 3)
    # per-rep pairs (legs interleave, so rep i's pair shares a time window)
    pairs = {}
    for leg in by_cores[lo_c]:
        pairs.setdefault(leg["rep"], {})[lo_c] = leg["r"]["events_per_sec"]
    for leg in by_cores[hi_c]:
        pairs.setdefault(leg["rep"], {})[hi_c] = leg["r"]["events_per_sec"]
    effs = {
        rep: round(p[hi_c] / p[lo_c] / factor, 3)
        for rep, p in sorted(pairs.items()) if lo_c in p and hi_c in p
    }
    summary["per_rep_efficiency"] = effs
    print(f"per-rep efficiency: {effs}")
    print(f"efficiency: best-pair {summary['scaling_efficiency_best']}, "
          f"median {summary['scaling_efficiency_median']}")
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
