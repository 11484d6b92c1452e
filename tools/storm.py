"""Adversarial allocation-storm simulator for robustness A/B tests.

This sandbox periodically enters a host memory-compaction phase
(khugepaged/DAMON) in which first-touch page faults serialize at ~10-100 MB/s
while warm-buffer streaming stays fast; the driver's BENCH_r03 windows caught
the PageRank df kernel in exactly that phase (supersteps 17-65 s vs 4-5 s
healthy). We cannot summon the host phase on demand, so this tool emulates its
*effect* — concurrent fresh-allocation pressure competing for the kernel fault
path — letting kernel variants be compared under pathological weather instead
of only on lucky windows.

Usage: python tools/storm.py <procs> <mb_per_round> [seconds]
Runs until killed (or for `seconds`). Each process loops: mmap a fresh
anonymous region, touch every page, munmap. MALLOC_* reuse env is explicitly
unset so the pressure is genuine fresh-fault traffic.
"""

from __future__ import annotations

import mmap
import os
import sys
import time


def worker(mb: int, seconds: float):
    os.environ.pop("MALLOC_MMAP_MAX_", None)
    os.environ.pop("MALLOC_TRIM_THRESHOLD_", None)
    n = mb * (1 << 20)
    step = mmap.PAGESIZE
    t0 = time.time()
    while seconds <= 0 or time.time() - t0 < seconds:
        m = mmap.mmap(-1, n)
        for off in range(0, n, step):
            m[off] = 1
        m.close()


def main():
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 0
    pids = []
    for _ in range(procs):
        pid = os.fork()
        if pid == 0:
            try:
                worker(mb, seconds)
            finally:
                os._exit(0)
        pids.append(pid)
    for pid in pids:
        os.waitpid(pid, 0)


if __name__ == "__main__":
    main()
