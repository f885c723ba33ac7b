"""Round-over-round bench comparison: make per-query regressions mechanical.

Usage:
    python tools/bench_compare.py BENCH_r01.json [new_bench.json|-]

The first file is the driver's recorded bench (``{"parsed": {...}}`` wrapper
or a bare bench line); the second is a newer bench JSON line (default: run
``python bench.py`` and paste, or pipe it via ``-`` for stdin). Prints a
markdown table of per-query seconds, the delta, and flags >1.3x regressions.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    raw = sys.stdin.read() if path == "-" else open(path).read()
    d = json.loads(raw)
    return d.get("parsed", d)


def main() -> int:
    old = load(sys.argv[1])
    new = load(sys.argv[2])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    names = sorted(set(oq) | set(nq))
    rows, regressions = [], []
    for n in names:
        a, b = oq.get(n), nq.get(n)
        if a and b:
            ratio = b / a
            flag = " **REGRESSION**" if ratio > 1.3 else ""
            if ratio > 1.3:
                regressions.append(n)
            rows.append(f"| {n} | {a:.3f} | {b:.3f} | {ratio:.2f}x{flag} |")
        else:
            rows.append(f"| {n} | {a if a else '—'} | {b if b else '—'} | new/removed |")
    print("| query | old (s) | new (s) | ratio |")
    print("|---|---|---|---|")
    print("\n".join(rows))
    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        print(f"\ntotal: {ot:.1f}s -> {nt:.1f}s ({nt/ot:.2f}x)")
    oe, ne = old.get("replay_events_per_sec"), new.get("replay_events_per_sec")
    if oe and ne:
        print(f"replay throughput: {oe:,.0f} -> {ne:,.0f} events/s ({ne/oe:.2f}x)")
    if regressions:
        print(f"\n{len(regressions)} regression(s): {regressions}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
