"""Pure-CPU host-capacity sweep: today's scaling ceiling at every
parallelism level, with NO Spark.

Same kernel-and-multiprocessing control as cpu_control.py (the
north-rule confound isolator), but swept across a list of process
counts so the host's *effective concurrent full-speed core* count is
directly visible.  On a healthy dedicated box docs/s grows ~linearly
to the physical core count; on a shared/capped VM it plateaus at the
capacity the hypervisor actually delivers, and run-to-run spread shows
co-tenant bursts.

Writes BENCH/cpu_sweep.json.

Usage: python BENCH/cpu_sweep.py [--pages 30000] [--runs 3]
       [--procs 1,2,4,8,16] [--size-mult 2] [--boiler-mult 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from cpu_control import run_once  # noqa: E402  (same dir)

sys.path.insert(0, os.path.join(ROOT, "BENCH"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=30000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--procs", default="1,2,4,8,16")
    ap.add_argument("--size-mult", type=int, default=2)
    ap.add_argument("--boiler-mult", type=int, default=8)
    args = ap.parse_args()
    procs = [int(p) for p in args.procs.split(",")]

    from ocr_spark.data.synth import gen_pages

    rows = gen_pages(args.pages, seed=42, size_mult=args.size_mult,
                     boiler_mult=args.boiler_mult)
    pages = [r["html"] for r in rows]
    print(f"{len(pages)} pages, {sum(map(len, pages)) / 1e6:.0f} MB html")

    walls: dict[int, list[float]] = {p: [] for p in procs}
    for i in range(args.runs):
        for p in sorted(procs, reverse=True):  # alternate big/small-ish
            w = run_once(pages, p)
            walls[p].append(w)
            print(f"  procs={p} run{i}: {w:.1f}s "
                  f"({len(pages) / w:.0f} docs/s, "
                  f"{len(pages) / w / p:.0f} docs/s/proc)", flush=True)

    out = {
        "pages": len(pages),
        "size_mult": args.size_mult,
        "boiler_mult": args.boiler_mult,
        "runs": args.runs,
        "levels": {},
    }
    base = None
    for p in sorted(procs):
        med = statistics.median(walls[p])
        dps = len(pages) / med
        if base is None:
            base = (p, dps)
        out["levels"][str(p)] = {
            "wall_s_all": [round(x, 2) for x in walls[p]],
            "wall_s_med": round(med, 2),
            "docs_per_s": round(dps, 1),
            "docs_per_s_per_proc": round(dps / p, 1),
            "eff_vs_lowest": round(dps / (base[1] * p / base[0]), 3),
        }
    with open(os.path.join(ROOT, "BENCH", "cpu_sweep.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["levels"]))


if __name__ == "__main__":
    main()
