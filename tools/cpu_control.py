"""No-Spark CPU-scaling control (the host-ceiling measurement cited in
BENCH/BASELINE.md / DESIGN.md "Two-parallelism methodology").

Perfectly parallel pure-Python work (regex parse of synthetic html, the
same kind of byte-chewing the ingest pass does) run under
multiprocessing at two process counts. Any efficiency loss here is the
HOST (vCPU down-clock / steal / oversubscription), not Spark and not
the job — it is the ceiling against which the Spark job's measured
scaling efficiency must be read. Re-run this after every VM reboot:
ceilings have been observed to change between instances.

Usage: python tools/cpu_control.py [lo hi reps]   (default 4 16 3)
Prints one JSON line: per-level throughput, per-rep ratio, ceiling
efficiency (ratio / (hi/lo)).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import re
import statistics
import sys
import time

HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
TAG_RE = re.compile(r"<[^>]*>")

PAGES_PER_TASK = 400


def _page(i: int) -> str:
    words = " ".join(f"tok{(i * 31 + j) % 997}" for j in range(600))
    anchors = "".join(
        f'<a href="http://h{i % 50}.test/p{j}">x</a>' for j in range(32)
    )
    return f"<html><body><p>{words}</p>{anchors}</body></html>"


def _work(seed: int) -> int:
    n = 0
    for i in range(PAGES_PER_TASK):
        s = _page(seed * PAGES_PER_TASK + i)
        n += len(HREF_RE.findall(s)) + len(TAG_RE.sub(" ", s))
    return n


def run_level(procs: int, tasks: int) -> float:
    """Tasks/sec at a given process count (fixed total work)."""
    with mp.Pool(procs) as pool:
        t0 = time.monotonic()
        pool.map(_work, range(tasks), chunksize=1)
        return tasks / (time.monotonic() - t0)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    tasks = hi * 6  # divisible work at both levels
    run_level(lo, lo)  # warm the pool/page code paths
    out: dict[int, list[float]] = {lo: [], hi: []}
    for _ in range(reps):
        for p in (lo, hi):
            out[p].append(run_level(p, tasks))
    per_rep = [out[hi][i] / out[lo][i] for i in range(reps)]
    speedup = statistics.median(per_rep)
    print(json.dumps({
        "pair": [lo, hi],
        "thr": {str(k): [round(x, 2) for x in v] for k, v in out.items()},
        "per_rep_speedup": [round(r, 2) for r in per_rep],
        "median_speedup": round(speedup, 2),
        "ceiling_efficiency": round(speedup / (hi / lo), 3),
    }))


if __name__ == "__main__":
    main()
