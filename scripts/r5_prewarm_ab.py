"""Cold-start prewarm concurrency A/B (VERDICT r4 weak item 7): the
manifest loader already fans program loads over a thread pool
(utils/prewarm.py warm(); default threads=8), but nobody has measured
whether more in-flight loads help in a BAD tunnel window — executable
load latency over the tunnel is round-trip-bound, so if loads don't
serialize server-side, threads should scale until bandwidth saturates.

Each trial must run in a FRESH process (program loads are cached
per-process), so this script re-execs itself per (threads,) point via
subprocess. All trials hit the same warm disk cache; order is
interleaved (8,16,32,8,16,32) so window drift doesn't masquerade as a
threads effect.

Usage: python scripts/r5_prewarm_ab.py            # orchestrator
       python scripts/r5_prewarm_ab.py --one 16   # single trial (internal)
Writes benchmarks/prewarm_ab_1m.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "benchmarks", "prewarm_ab_1m.json")
N, DIM = 1_000_000, 128


def one(threads: int) -> None:
    sys.path.insert(0, os.path.join(HERE, ".."))
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from scintirete_tpu.types import DistanceMetric
    from scintirete_tpu.utils import prewarm

    secs = prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16,
                              heuristic=True, threads=threads)
    print(json.dumps({"threads": threads, "seconds": round(secs, 1)}))


def main() -> None:
    rows = []
    for rep in range(2):
        for threads in (8, 16, 32):
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 str(threads)],
                capture_output=True, text=True, timeout=1800)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("{")][-1]
            row = json.loads(line)
            row["rep"] = rep
            row["wall_seconds"] = round(time.time() - t0, 1)
            rows.append(row)
            print(row, flush=True)
            with open(OUT, "w") as f:
                json.dump({"n": N, "dim": DIM, "rows": rows}, f, indent=1)
                f.write("\n")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        one(int(sys.argv[2]))
    else:
        main()
