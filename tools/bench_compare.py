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


def noise_warnings(tag: str, d: dict) -> list[str]:
    """Flag a sample recorded on a loud host (the r2 driver-bench failure
    mode): start/end 1-min loadavg well above the cores the bench itself
    uses, or rep-to-rep spread far beyond the reported min."""
    warns = []
    p = d.get("provenance")
    if not p:
        return [f"{tag}: no provenance block (pre-r3 bench) — treat with suspicion"]
    cpus = p.get("cpus") or 1
    for which in ("loadavg_start", "loadavg_end"):
        la = p.get(which)
        if la and la[0] > cpus * 1.5:
            warns.append(
                f"{tag}: {which} {la[0]:.1f} >> {cpus} bench cores — host was loud"
            )
    wild = [
        (n, s) for n, s in (p.get("samples") or {}).items()
        if len(s) >= 2 and max(s) > 3 * min(s) and max(s) - min(s) > 0.5
    ]
    if wild:
        names = ", ".join(f"{n} {s}" for n, s in wild[:5])
        warns.append(f"{tag}: >3x rep-to-rep spread on {len(wild)} queries ({names})")
    return warns


def main() -> int:
    old = load(sys.argv[1])
    new = load(sys.argv[2])
    for w in noise_warnings("old", old) + noise_warnings("new", new):
        print(f"WARNING {w}")
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
