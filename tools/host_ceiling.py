"""Host parallel-scaling ceiling: the same fixed amount of pure-CPU work
(sha256 chains — ALU-bound, no memory traffic, no Python GIL since each
worker is a process) at N and 4N processes. The ratio bounds ANY workload's
achievable N→4N speedup on this machine: local-mode Spark cannot scale
better than the silicon does (all-core turbo drop, shared L3, hypervisor
co-tenancy all land here).

Usage: python tools/host_ceiling.py [n=8] [total_rounds=48000000] [reps=3]
Prints one JSON line: {"n": .., "t_n": .., "t_4n": .., "ceiling_speedup": ..,
"ceiling_efficiency": ..}.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import statistics
import sys
import time


def _burn(n: int) -> int:
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def measure(procs: int, total_rounds: int) -> float:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_burn, [total_rounds // procs] * procs)
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 48_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    t_n, t_4n = [], []
    for _ in range(reps):  # interleave to cancel drift
        t_n.append(measure(n, total))
        t_4n.append(measure(4 * n, total))
    med_n, med_4n = statistics.median(t_n), statistics.median(t_4n)
    speedup = med_n / med_4n
    print(
        json.dumps(
            {
                "n": n,
                "t_n": round(med_n, 2),
                "t_n_all": [round(t, 2) for t in t_n],
                "t_4n": round(med_4n, 2),
                "t_4n_all": [round(t, 2) for t in t_4n],
                "ceiling_speedup": round(speedup, 3),
                "ceiling_efficiency": round(speedup / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
