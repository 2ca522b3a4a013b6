"""Host memory-scaling control experiment (Spark-free).

The scaling harness (bench_scaling.py) shows task CPU-seconds inflating
~2x when the same job runs on 32 threads instead of 8. This control
measures the HOST's intrinsic memory scaling at 4/8/16/32 workers
(both N -> 4N pairs) with zero JVM, zero shuffle, zero
synchronization — pure numpy over arrays far beyond LLC:

- streaming sweep: sequential sum over a 320MB array (DRAM bandwidth);
- random gather:   indexed gather-sum (latency/TLB-bound, the access
  pattern of hash aggregation and string processing).

If even these ideal kernels lose per-thread throughput at 32 workers,
the engine's sub-linear thread-scaling is a single-socket property, not
a plan defect — on a real N -> 4N EXECUTOR cluster each executor brings
its own socket and the contention term vanishes.

Run exclusively; prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _stream(sec: float) -> float:
    a = np.random.rand(40_000_000)  # ~320MB
    a.sum()
    t0 = time.time()
    n = 0
    while time.time() - t0 < sec:
        a.sum()
        n += 1
    return n * a.nbytes / (time.time() - t0)


def _gather(sec: float) -> float:
    rng = np.random.default_rng(0)
    a = np.random.rand(40_000_000)
    idx = rng.integers(0, a.size, 8_000_000)
    a[idx].sum()
    t0 = time.time()
    n = 0
    while time.time() - t0 < sec:
        a[idx].sum()
        n += 1
    return n * idx.size / (time.time() - t0)


def run(kernel, workers: int, sec: float = 6.0) -> float:
    with mp.Pool(workers) as p:
        return sum(p.map(kernel, [sec] * workers))


def main() -> None:
    out: dict = {}
    for name, kernel in (("stream_bytes_per_s", _stream), ("gather_ops_per_s", _gather)):
        r = {w: run(kernel, w) for w in (4, 8, 16, 32)}
        out[name] = {f"p{w}": round(r[w], 0) for w in r}
        for lo, hi in ((4, 16), (8, 32)):
            out[name][f"speedup_{lo}_to_{hi}"] = round(r[hi] / r[lo], 2)
            out[name][f"efficiency_{lo}_to_{hi}"] = round(r[hi] / r[lo] / 4, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
