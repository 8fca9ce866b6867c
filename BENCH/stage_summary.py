"""Summarize per-stage task metrics from a Spark event log (one run).

Usage: python BENCH/stage_summary.py <eventlog-file-or-dir> [<another> ...]
Prints, per stage: wall, task count, sum runtime, JVM CPU, GC, task-deser
time/CPU, shuffle bytes — the numbers that expose concurrency pathologies
(e.g. task-binary deserialization storms) that per-job walls hide.
"""

from __future__ import annotations

import json
import os
import sys


def iter_lines(path: str):
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if not f.startswith(".")
        )
    else:
        files = [path]
    for f in files:
        if f.endswith(".zstd"):
            import subprocess
            out = subprocess.run(["zstd", "-d", "-c", f],
                                 capture_output=True, text=True)
            yield from out.stdout.splitlines()
        else:
            with open(f, errors="replace") as fh:
                yield from fh


def summarize(path: str) -> None:
    stages: dict[int, dict] = {}
    tasks: dict[int, dict] = {}
    for line in iter_lines(path):
        try:
            e = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:48],
                "wall": dur,
                "n": si.get("Number of Tasks", 0),
            }
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            t = tasks.setdefault(sid, dict(n=0, run=0.0, cpu=0.0, gc=0.0,
                                           deser=0.0, desercpu=0.0,
                                           shread=0, shwrite=0, peak=0,
                                           memspill=0, diskspill=0))
            t["n"] += 1
            t["run"] += m.get("Executor Run Time", 0) / 1000
            t["cpu"] += m.get("Executor CPU Time", 0) / 1e9
            t["gc"] += m.get("JVM GC Time", 0) / 1000
            t["deser"] += m.get("Executor Deserialize Time", 0) / 1000
            t["desercpu"] += m.get("Executor Deserialize CPU Time", 0) / 1e9
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            t["shread"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            t["shwrite"] += sw.get("Shuffle Bytes Written", 0)
            t["peak"] = max(t["peak"], m.get("Peak Execution Memory", 0))
            t["memspill"] += m.get("Memory Bytes Spilled", 0)
            t["diskspill"] += m.get("Disk Bytes Spilled", 0)
    print(f"== {path}")
    hdr = (f"{'stage':>5} {'wall_s':>7} {'tasks':>5} {'sumRun':>8} "
           f"{'jvmCPU':>8} {'gc':>6} {'deser':>7} {'deserCPU':>8} "
           f"{'shMB_r':>7} {'shMB_w':>7} {'spillMB':>8}  name")
    print(hdr)
    for sid in sorted(stages):
        s, t = stages[sid], tasks.get(sid, {})
        print(f"{sid:>5} {s['wall']:>7.1f} {s['n']:>5} "
              f"{t.get('run', 0):>8.1f} {t.get('cpu', 0):>8.1f} "
              f"{t.get('gc', 0):>6.1f} {t.get('deser', 0):>7.1f} "
              f"{t.get('desercpu', 0):>8.1f} "
              f"{t.get('shread', 0) / 1e6:>7.1f} "
              f"{t.get('shwrite', 0) / 1e6:>7.1f} "
              f"{t.get('diskspill', 0) / 1e6:>8.1f}  {s['name']}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        summarize(p)
