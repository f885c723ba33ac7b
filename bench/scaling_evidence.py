"""Two-parallelism scaling-efficiency evidence (north rule ≥0.8, N→4N).

Runs bench/replay_bench.py at local[8] and local[32] on the SAME input,
interleaved R times, and reports per-level best and median throughput plus
scaling efficiency = (eps_32 / eps_8) / 4.

Why best-of-N: this sandbox is a Firecracker microVM on a shared host with
measured noisy-neighbor interference (identical runs vary 3×; idle load
average >10). Best-of-N approximates the uncontended capability of the
dataflow at each parallelism level; the median is reported alongside for
transparency. Results → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = f"/tmp/sodes_bench_{os.getpid()}.zip"  # per-run: a concurrent rebuild of a shared zip mid-fetch kills a leg


def make_zip() -> None:
    if os.path.exists(ZIP):
        os.remove(ZIP)
    subprocess.run(
        ["zip", "-qr", ZIP, "standardized_omop_data_etl_spark"], cwd=REPO, check=True
    )
    # per-PID zips would otherwise accumulate in /tmp across campaign runs
    import atexit

    atexit.register(lambda: os.path.exists(ZIP) and os.remove(ZIP))


def wait_quiet(load_max: float, max_wait_sec: float = 900.0) -> float:
    """Block until the 1-min loadavg drops below ``load_max`` (or the wait
    budget runs out — legs record their actual load either way, so a leg
    launched loud is disclosed, not hidden)."""
    deadline = time.time() + max_wait_sec
    while True:
        load = os.getloadavg()[0]
        if load < load_max or time.time() >= deadline:
            return load
        time.sleep(15)


def run_once(cores: int, events: int, docs: int, epochs: int, workdir: str,
             keep: bool, mode: str, lww: str, maintain_every: int = 0,
             pipeline: bool = False) -> dict:
    cmd = []
    if os.environ.get("SCALE_TASKSET") == "1":
        # Pin the WHOLE JVM (task threads + GC + IO + codegen) to exactly
        # `cores` CPUs. Plain local[N] only bounds task threads — GC/IO
        # spill onto other cores, inflating the small-N runs and
        # systematically depressing measured N→4N efficiency.
        cmd += ["taskset", "-c", f"0-{cores - 1}"]
    cmd += [
        "spark-submit", "--master", f"local[{cores}]", "--driver-memory", "20g",
        # fixed pre-touched heap: without it the JVM's grow/shrink mmap churn
        # shows up as 30-50% system CPU (page-fault storms) and 2-3× noise
        "--conf", "spark.driver.extraJavaOptions=-Xms20g -XX:+AlwaysPreTouch",
        "--conf", "spark.local.dir=/dev/shm/sparklocal",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.sql.shuffle.partitions={cores * 2}",
        # File scans target ≥64 splits (= num_buckets) at EVERY parallelism
        # level: without this, FilePartition packs the ~64-file scratch/
        # narrow scans into `defaultParallelism` splits (4 tasks at 4 cores)
        # whose uneven sizes leave a 1-4 s max-task straggler tail per stage
        # — the r04l eventLog decomposition's second-largest serial term.
        # Same value at both legs keeps the N vs 4N comparison honest.
        "--conf", "spark.sql.files.minPartitionNum=64",
        "--py-files", ZIP,
        os.path.join(REPO, "bench", "replay_bench.py"),
        "--events", str(events), "--docs", str(docs), "--epochs", str(epochs),
        "--buckets", "64", "--workdir", workdir, "--mode", mode, "--lww", lww,
        "--maintain-every", str(maintain_every),
    ]
    if pipeline:
        cmd.append("--pipeline")
    if keep:
        cmd.append("--keep-input")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"replay_bench produced no JSON at local[{cores}]; stderr tail:\n"
            + "\n".join(out.stderr.splitlines()[-15:])
        )
    return json.loads(lines[-1])


def main() -> None:
    events = int(os.environ.get("SCALE_EVENTS", "8000000"))
    docs = int(os.environ.get("SCALE_DOCS", "1600000"))
    epochs = int(os.environ.get("SCALE_EPOCHS", "1"))
    reps = int(os.environ.get("SCALE_REPS", "4"))
    n = int(os.environ.get("SCALE_N", "8"))  # the N of "N and 4N cores"
    mode = os.environ.get("SCALE_MODE", "cow")
    lww = os.environ.get("SCALE_LWW", "auto")
    maintain_every = int(os.environ.get("SCALE_MAINTAIN", "0"))
    pipeline = os.environ.get("SCALE_PIPELINE") == "1"
    load_max = float(os.environ.get("SCALE_LOAD_MAX", "2.5"))
    workdir = os.environ.get("SCALE_WORKDIR", "/dev/shm/rb_evidence")
    out_name = os.environ.get("SCALE_OUT", f"scaling_evidence_{n}_{4*n}.json")
    legs_log = os.environ.get("SCALE_LEGS_LOG", "")
    pair = (n, 4 * n)
    make_zip()
    results: dict[int, list[dict]] = {c: [] for c in pair}
    legs: list[dict] = []
    # SCALE_KEEP_INPUT_FIRST=1: reuse a pre-generated input in SCALE_WORKDIR
    # even on the first leg (generation at local[1] costs ~12 min for a 32M
    # log; pre-generating once at local[32] is identical input — the
    # generator writes a FIXED partition layout regardless of parallelism).
    first = os.environ.get("SCALE_KEEP_INPUT_FIRST") != "1"
    for rep in range(reps):
        for cores in pair:
            subprocess.run(["sync"])
            load = wait_quiet(load_max)
            r = run_once(cores, events, docs, epochs, workdir, keep=not first,
                         mode=mode, lww=lww, maintain_every=maintain_every,
                         pipeline=pipeline)
            first = False
            results[cores].append(r)
            leg = {"rep": rep, "cores": cores,
                   "pinned": os.environ.get("SCALE_TASKSET") == "1",
                   "load_start": round(load, 2), "load_end": round(os.getloadavg()[0], 2),
                   "r": r}
            legs.append(leg)
            if legs_log:
                with open(legs_log, "a") as f:
                    f.write(json.dumps(leg) + "\n")
            print(f"rep{rep} local[{cores}]: wall={r['wall_sec']} eps={r['events_per_sec']}"
                  f" load_start={load:.2f}", flush=True)
    summary = {}
    for cores, rs in results.items():
        eps = [r["events_per_sec"] for r in rs]
        summary[f"local{cores}"] = {
            "runs_events_per_sec": eps,
            "best": max(eps),
            "median": statistics.median(eps),
        }
    lo, hi = f"local{pair[0]}", f"local{pair[1]}"
    summary["scaling_efficiency_best"] = round(
        summary[hi]["best"] / summary[lo]["best"] / 4.0, 3
    )
    summary["scaling_efficiency_median"] = round(
        summary[hi]["median"] / summary[lo]["median"] / 4.0, 3
    )
    summary["config"] = {
        "events": events, "docs": docs, "epochs": epochs, "reps": reps, "cores": pair,
        "mode": mode, "lww": lww, "maintain_every": maintain_every,
        "pipeline": pipeline,
        "pinned": os.environ.get("SCALE_TASKSET") == "1",
        "load_gate": load_max,
    }
    summary["legs"] = legs
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
