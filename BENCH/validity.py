"""Post-hoc validity analysis over the round-4 2-vs-8-core scaling
series (same corpus, same job, byte-identical output every run).

The job's work is constant (bytes_out identical across all runs), so
its CPU consumption should be too.  The measured contamination channel
on this shared VM is *phantom system time*: a run in a bad window burns
2x+ the system-CPU seconds of a clean run for identical work (hypervisor
overhead charged to the guest), at near-zero reported steal and healthy
endpoint memory-bandwidth canaries — i.e. invisible to every *pre/post*
gate.  This script classifies every persisted attempt by that signature
and reports clean-subset medians:

    contaminated(level) := cpu_sys > SYS_FACTOR * min(cpu_sys over the
                           level's attempts)   (identical work)

Usage: python BENCH/validity.py [series.json ...]
Defaults to the four round-4 series files.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SERIES = ["scaling_2_8_r4a.json", "scaling_2_8_r4b.json",
                  "scaling_2_8_r4c.json", "scaling_2_8_r4d.json",
                  "scaling_2_8_r4e.json", "scaling_2_8_r4f.json",
                  "scaling_2_8_r4g.json", "scaling_2_8_r4h.json",
                  "scaling_2_8_r4i.json", "scaling_2_8_r4j.json"]
SYS_FACTOR = 1.5


def load_attempts(paths: list[str]) -> dict[int, list[dict]]:
    by_level: dict[int, list[dict]] = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        series = os.path.basename(p).replace("scaling_2_8_", "").replace(
            ".json", "")
        for level, runs in d["all_attempts"].items():
            for r in runs:
                r["series"] = series
                by_level.setdefault(int(level), []).append(r)
    return by_level


def main() -> None:
    paths = sys.argv[1:] or [os.path.join(BENCH_DIR, f)
                             for f in DEFAULT_SERIES]
    by_level = load_attempts([p for p in paths if os.path.exists(p)])

    # sanity: identical work across every attempt
    outs = {r["bytes_out"] for rs in by_level.values() for r in rs}
    assert len(outs) == 1, f"bytes_out differs across runs: {outs}"

    clean_med: dict[int, float] = {}
    print(f"{'run':16s} {'cores':>5s} {'wall_s':>7s} {'docs/s':>7s} "
          f"{'steal':>6s} {'sysCPU':>7s} {'usrCPU':>7s} "
          f"{'membw a/b':>11s}  verdict")
    for level in sorted(by_level):
        rs = by_level[level]
        sys_min = min(r["host_cpu"]["system"] for r in rs)
        clean = []
        for r in sorted(rs, key=lambda r: r["wall_s"]):
            h = r["host_cpu"]
            dirty = h["system"] > SYS_FACTOR * sys_min
            if not dirty:
                clean.append(r)
            print(f"{r['series'] + ':' + r['run_id']:16s} {level:5d} "
                  f"{r['wall_s']:7.1f} {r['docs_per_s']:7.0f} "
                  f"{h['steal_cores']:6.3f} {h['system']:7.0f} "
                  f"{h['user']:7.0f} "
                  f"{h['membw_before']:5.0f}/{h['membw_after']:5.0f}  "
                  f"{'CONTAMINATED (sys>' + str(SYS_FACTOR) + 'x min)' if dirty else 'clean'}")
        clean_med[level] = statistics.median(
            r["docs_per_s"] for r in clean)
        print(f"  -> level {level}: {len(clean)}/{len(rs)} clean attempts, "
              f"clean-median {clean_med[level]:.0f} docs/s "
              f"(sys-CPU min {sys_min:.0f}s)")

    lo, hi = min(clean_med), max(clean_med)
    ratio = hi // lo
    eff = clean_med[hi] / ((hi / lo) * clean_med[lo])
    print(f"\nPooled clean-subset scaling efficiency "
          f"{lo}->{hi} cores: {clean_med[hi]:.0f} / "
          f"({hi // lo} x {clean_med[lo]:.0f}) = {eff:.3f} "
          f"({'PASS' if eff >= 0.8 else 'FAIL'} vs target 0.8)")
    out = {
        "levels": {str(k): v for k, v in clean_med.items()},
        "sys_factor": SYS_FACTOR,
        "clean_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    with open(os.path.join(BENCH_DIR, "validity.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
