"""Probe: does the flush kernel's sort+gather scale better at smaller
working sets on this host?

The posting kernel buffers FLUSH_PAIRS pairs (~28 B/pair across five
lanes) and then does argsort(int64) + 5-lane gather + boundary scan —
the exact shape of indexer._flush. BENCH/BASELINE.md measured this
host's 2→8-core ceilings at 0.918 for a 24 MB/proc working set
(cache-tier) vs 0.465 for 320 MB/proc (DRAM-streaming). If the REAL
kernel shape (sort+gather+scan, not the generic benchmark) shows the
same cliff, shrinking FLUSH_PAIRS converts group-0 from DRAM-bound to
cache-tier and directly lifts the scaling gate.

Usage: python tools/flush_scaling_probe.py [pairs ...]
Prints pairs/sec per (working set, procs) and the 2→8 efficiency.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _kernel_once(seg, doc, dl, tf, codes):
    order = np.argsort(codes, kind="stable")
    seg2, doc2, dl2, tf2, codes2 = (
        seg[order], doc[order], dl[order], tf[order], codes[order]
    )
    n = len(doc2)
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (seg2[1:] != seg2[:-1]) | (codes2[1:] != codes2[:-1])
    starts = np.flatnonzero(new_group)
    return len(starts) + int(doc2[0]) + int(tf2[0]) + int(dl2[0])


def _worker(args):
    pairs, procs, dur = args
    os.sched_setaffinity(0, set(range(procs)))
    rng = np.random.default_rng(os.getpid())
    # zipf-ish term hashes: ~vocab of pairs/30 like a real code corpus
    vocab = max(1000, pairs // 30)
    codes = rng.integers(0, vocab, size=pairs, dtype=np.int64) * np.int64(
        0x9E3779B97F4A7C15 - (1 << 64)  # golden-ratio mix, as signed int64
    )
    seg = rng.integers(0, 32, size=pairs, dtype=np.int32)
    doc = np.sort(rng.integers(0, 1 << 33, size=pairs, dtype=np.int64))
    dl = rng.integers(1, 4000, size=pairs, dtype=np.int32)
    tf = rng.integers(1, 50, size=pairs, dtype=np.int32)
    t0 = time.time()
    t_end = t0 + dur
    n = 0
    while time.time() < t_end or n < 2:
        _kernel_once(seg, doc, dl, tf, codes)
        n += 1
    return pairs * n / (time.time() - t0)


def measure(pairs: int, procs: int, dur: float = 12.0, reps: int = 3) -> float:
    best = 0.0
    for _ in range(reps):
        with mp.Pool(procs) as p:
            tot = sum(p.map(_worker, [(pairs, procs, dur)] * procs))
        best = max(best, tot)
    return best


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [12_000_000, 3_000_000, 1_500_000, 750_000]
    print(f"{'pairs':>12} {'MB/proc':>8} {'2p pairs/s':>12} {'8p pairs/s':>12} {'eff 2->8':>9}")
    for pairs in sizes:
        mb = pairs * 28 / 1e6
        # interleave levels per size so both see similar host windows
        r2, r8 = 0.0, 0.0
        for _ in range(3):
            r2 = max(r2, measure(pairs, 2, reps=1))
            r8 = max(r8, measure(pairs, 8, reps=1))
        eff = (r8 / r2) / 4.0
        print(f"{pairs:>12,} {mb:>8.0f} {r2:>12,.0f} {r8:>12,.0f} {eff:>9.3f}")


if __name__ == "__main__":
    main()
