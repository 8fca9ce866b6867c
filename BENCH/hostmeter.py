"""Host CPU meter for benchmark validity gating.

This sandbox is a VM whose physical cores are shared with a co-tenant
at the HYPERVISOR level: /proc/stat column 8 (steal) ticks while guest
vCPUs are runnable but not running.  Measured here: bursts of ~3 cores
stolen continuously for minutes, then quiet hours — which explains the
>2x run-to-run swings that round-2 analysis attributed to a generic
"co-tenant" (identical binaries: 39.5s vs 122s at local[16]; 1018s vs
1391s at local[4]).  A further trap: the guest kernel charges stolen
ticks against the *running thread's* system time, so Spark's
per-task executorCpuTime (ThreadMXBean) inflates 10-40x under steal —
phantom CPU that profilers then "find" in whatever frame was running
(observed as UnsafeRow.getBinary dominating JFR samples).

Every timed run should therefore record the steal delta across its own
window and be rejected (re-run) when steal exceeds a small fraction of
the cores under test.  Uniform steal cancels in an N-vs-4N throughput
RATIO (both sides lose the same fraction); it is the burstiness across
runs that corrupts medians, which is what gating bounds.
"""

from __future__ import annotations

import os
import time

__all__ = ["read_cpu", "cpu_delta", "steal_cores", "membw_mbps"]

_CLK = os.sysconf("SC_CLK_TCK")


def read_cpu() -> dict:
    """Snapshot aggregate /proc/stat cpu line (ticks) + wall time."""
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return {
        "t": time.time(),
        "user": v[0] + v[1],
        "system": v[2],
        "idle": v[3],
        "iowait": v[4],
        "irq": v[5] + v[6],
        "steal": v[7],
    }


def cpu_delta(before: dict, after: dict) -> dict:
    """Seconds-per-category over the window, plus steal_cores (avg
    cores stolen by the hypervisor while this window ran)."""
    wall = max(after["t"] - before["t"], 1e-9)
    d = {k: round((after[k] - before[k]) / _CLK, 2)
         for k in before if k != "t"}
    d["wall_s"] = round(wall, 2)
    d["steal_cores"] = round(d["steal"] / wall, 3)
    return d


def steal_cores(before: dict, after: dict) -> float:
    return cpu_delta(before, after)["steal_cores"]


def membw_mbps(mb: int = 256, repeat: int = 3) -> float:
    """Single-thread memcpy throughput (MB/s), best of ``repeat``.

    Steal only measures CPU-time theft; a co-tenant VM also contends
    for memory bandwidth / LLC, which shows up as wall inflation at
    near-zero steal (observed: 3x on a 16-core run at 0.79 stolen
    cores).  This canary (bytearray slice copy = libc memcpy) read
    before/after a timed run annotates that channel; compare against
    the quiet-host reference recorded in BENCH/BASELINE.md.
    """
    src = bytearray(mb << 20)
    dst = bytearray(mb << 20)
    best = 0.0
    for _ in range(repeat):
        t0 = time.perf_counter()
        dst[:] = src
        dt = time.perf_counter() - t0
        best = max(best, mb / dt)
    return round(best, 1)
