"""VM parallel-scaling probe (Spark-free control for BENCH.md §1).

Runs a fixed CPU-bound kernel under a process pool at several worker
counts and prints per-level wall time + throughput + efficiency vs the
1-worker baseline. Used to characterize what scaling efficiency THIS
machine can exhibit at all, independent of Spark.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def kernel(seed: int) -> float:
    """~0.4 s of mixed int/string work resembling tokenize+sort."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 40, size=1_200_000)
    for _ in range(3):
        b = np.sort(a ^ (a >> 7))
        a = b * 31 + 7
    return float(a[0])


def run_level(workers: int, tasks: int) -> float:
    t0 = time.monotonic()
    with mp.get_context("spawn").Pool(workers) as p:
        p.map(kernel, range(tasks))
    return time.monotonic() - t0


def main() -> None:
    levels = [int(x) for x in (sys.argv[1:] or ["1", "2", "4", "8"])]
    tasks = 32
    out = {}
    for w in levels:
        t = run_level(w, tasks)
        out[f"w{w}"] = round(t, 2)
        out[f"thr{w}"] = round(tasks / t, 2)
        time.sleep(5)
    lo, hi = levels[0], levels[-1]
    out["efficiency"] = round((out[f"w{lo}"] / out[f"w{hi}"]) / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
