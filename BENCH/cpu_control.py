"""Pure-CPU scaling control for the sandbox host.

The north rule's criterion (throughput scaling efficiency >= 0.8 from N
to 4N executors) is measured here as local[8] vs local[32] on one VM.
That substitution has a hardware confound: when all 32 host cores are
loaded, per-core throughput drops (VM steal / SMT / memory bandwidth),
so even a perfectly parallel job cannot reach 1.0.  This control
measures that ceiling with NO Spark at all: the same extraction kernel
(`extractor.core.extract_bytes`, the job's dominant cost) over the same
kind of seeded pages, sharded across P worker processes via
multiprocessing — no shuffle, no JVM, no I/O beyond fork.

    efficiency_ceiling(P->4P) = T(P) / (4 * T(4P))

The job's measured efficiency should be read against this ceiling:
eff_job / eff_ceiling is the share of *attainable* scaling the engine
achieves.  Writes BENCH/cpu_control.json.

Usage: python BENCH/cpu_control.py [--pages 40000] [--runs 3]
       [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_PAGES: list[bytes] = []


def _init(pages: list[bytes]) -> None:
    global _PAGES
    _PAGES = pages


def _work(span: tuple[int, int]) -> int:
    from ocr_spark.extractor.core import extract_bytes

    total = 0
    for i in range(span[0], span[1]):
        total += len(extract_bytes(_PAGES[i])["text"])
    return total


def run_once(pages: list[bytes], procs: int) -> float:
    n = len(pages)
    # many small spans so stragglers cannot skew the tail
    step = max(1, n // (procs * 16))
    spans = [(i, min(i + step, n)) for i in range(0, n, step)]
    with mp.Pool(procs, initializer=_init, initargs=(pages,)) as pool:
        t0 = time.perf_counter()
        pool.map(_work, spans)
        return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=40000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    from ocr_spark.data.synth import gen_pages

    rows = gen_pages(args.pages, seed=42, size_mult=8, boiler_mult=8)
    pages = [r["html"] for r in rows]
    print(f"{len(pages)} pages, {sum(map(len, pages)) / 1e6:.0f} MB html")

    walls: dict[int, list[float]] = {args.low: [], args.high: []}
    for i in range(args.runs):
        for procs in (args.high, args.low):  # alternate like run_scaling
            w = run_once(pages, procs)
            walls[procs].append(w)
            print(f"  procs={procs} run{i}: {w:.1f}s "
                  f"({len(pages) / w:.0f} docs/s)")

    t_low = statistics.median(walls[args.low])
    t_high = statistics.median(walls[args.high])
    ratio = args.high / args.low
    eff = t_low / (ratio * t_high)
    out = {
        "pages": len(pages),
        "runs": args.runs,
        "low": {"procs": args.low, "wall_s": round(t_low, 2),
                "docs_per_s": round(len(pages) / t_low, 1)},
        "high": {"procs": args.high, "wall_s": round(t_high, 2),
                 "docs_per_s": round(len(pages) / t_high, 1)},
        "efficiency_ceiling": round(eff, 3),
        "all_runs": {str(k): [round(x, 2) for x in v] for k, v in walls.items()},
    }
    with open(os.path.join(ROOT, "BENCH", "cpu_control.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "all_runs"}))


if __name__ == "__main__":
    main()
