"""Pure-CPU scaling control for the N-vs-4N criterion sessions: k vs
4k worker *processes* (no Spark, no memory traffic beyond L1) running
a fixed float-arithmetic loop, reporting aggregate throughput at both
widths and their ratio/4.  This is the host's own ceiling for the
same process topology the cluster legs use — run it in the SAME
session as the criterion legs so BENCH/CLUSTER.md can report the
control alongside the raw efficiency (the sandbox's co-tenant climate
historically swings same-config measurements 1.2-2x; the control
tells the reader what the silicon gave THIS session).

Usage: python tools/cpu_control.py [--cores 2] [--seconds 6]
Prints one JSON line: {"k": 2, "4k": 8, "k_ops": ..., "4k_ops": ...,
"cpu_ratio_over_4": ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn(out, seconds: float) -> None:
    # float FMA chain, loop-carried dependency — pins one core, no
    # memory traffic, not optimizable away
    x = 1.0000001
    n = 0
    t_end = time.time() + seconds
    while time.time() < t_end:
        for _ in range(100_000):
            x = x * 1.0000001 + 1e-12
        n += 100_000
    out.put((n, x))


def _measure(workers: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_burn, args=(q, seconds)) for _ in range(workers)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    total = sum(q.get()[0] for _ in procs)
    for p in procs:
        p.join()
    return total / (time.time() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    k = args.cores
    # interleave k / 4k twice, best-of — same sampling rationale as the
    # cluster legs
    lo = max(_measure(k, args.seconds) for _ in range(2))
    hi = max(_measure(4 * k, args.seconds) for _ in range(2))
    print(
        json.dumps(
            {
                "k": k,
                "4k": 4 * k,
                "k_ops_per_sec": round(lo),
                "4k_ops_per_sec": round(hi),
                "cpu_ratio_over_4": round(hi / lo / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
