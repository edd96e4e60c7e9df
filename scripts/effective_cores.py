#!/usr/bin/env python
"""Box-health probe: effective parallel CPU capacity vs nominal cores.

Sandbox hosts are shared; a session can see full single-core speed while
parallel throughput is a third of nominal (CPU oversubscription). Bench
numbers from different sessions are incomparable unless this probe reads
similarly — record its output next to any cross-session comparison.

Usage: python scripts/effective_cores.py [nworkers]
"""
from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor


def _work(_: int) -> int:
    s = 0
    for i in range(10_000_000):
        s += i
    return s


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 1)
    t0 = time.perf_counter()
    _work(0)
    seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    with ProcessPoolExecutor(n) as ex:
        list(ex.map(_work, range(n)))
    par = time.perf_counter() - t0
    print(
        f"nominal={n} seq={seq:.2f}s parallel={par:.2f}s "
        f"effective_cores={n * seq / par:.1f} "
        f"load_avg_1m={os.getloadavg()[0]:.2f}"
    )


if __name__ == "__main__":
    main()
