"""Standalone (no Spark) microbench of the posting kernel's per-batch
steps, single-process vs N parallel pinned processes — separates "the
kernel doesn't scale" from "the host was stolen" and attributes time to
factorize / composite-unique / gathers / flush-sort / encode.

Usage: python tools/kernel_bench.py [procs] [batches]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_PER_BATCH = 10_000
TOKS_PER_DOC = 1_080
VOCAB = 4_200


def one_batch(rng, t):
    n = DOCS_PER_BATCH * TOKS_PER_DOC
    t0 = time.time()
    flat = (rng.zipf(1.3, size=n).astype(np.int64) % VOCAB) * np.int64(
        0x9E3779B97F4A7C15 - (1 << 64)
    )  # hash-like spread (signed-64 multiplier)
    lens = np.full(DOCS_PER_BATCH, TOKS_PER_DOC, dtype=np.int64)
    t["gen"] += time.time() - t0

    t0 = time.time()
    ridx = np.repeat(np.arange(DOCS_PER_BATCH), lens)
    t["repeat"] += time.time() - t0

    t0 = time.time()
    codes, uniq = pd.factorize(flat, sort=False)
    t["factorize"] += time.time() - t0

    t0 = time.time()
    key = ridx * np.int64(len(uniq)) + codes
    t["key"] += time.time() - t0

    t0 = time.time()
    ukey, counts = np.unique(key, return_counts=True)
    t["unique"] += time.time() - t0

    t0 = time.time()
    rr = (ukey // len(uniq)).astype(np.int64)
    tcode = (ukey % len(uniq)).astype(np.int64)
    seg = np.zeros(DOCS_PER_BATCH, dtype=np.int32)[rr]
    doc = np.arange(DOCS_PER_BATCH, dtype=np.int64)[rr]
    dl = lens.astype(np.int32)[rr]
    tf = counts.astype(np.int32)
    code = np.asarray(uniq, dtype=np.int64)[tcode]
    t["gather"] += time.time() - t0
    return seg, doc, dl, tf, code


def run(args):
    procs, batches, pin = args
    if pin is not None:
        os.sched_setaffinity(0, pin)
    rng = np.random.default_rng(os.getpid())
    t = {k: 0.0 for k in
         ("gen", "repeat", "factorize", "key", "unique", "gather",
          "flush_sort", "flush_gather", "encode")}
    bufs = []
    t_all = time.time()
    for _ in range(batches):
        bufs.append(one_batch(rng, t))
    # flush
    seg = np.concatenate([b[0] for b in bufs])
    doc = np.concatenate([b[1] for b in bufs])
    dl = np.concatenate([b[2] for b in bufs])
    tf = np.concatenate([b[3] for b in bufs])
    codes = np.concatenate([b[4] for b in bufs])
    t0 = time.time()
    order = np.argsort(codes, kind="stable")
    t["flush_sort"] += time.time() - t0
    t0 = time.time()
    seg, doc, dl, tf, codes = (
        seg[order], doc[order], dl[order], tf[order], codes[order]
    )
    t["flush_gather"] += time.time() - t0

    t0 = time.time()
    from kbasesearchengine_spark.functions.codec import encode_grouped

    n = len(doc)
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (seg[1:] != seg[:-1]) | (codes[1:] != codes[:-1])
    starts = np.flatnonzero(new_group)
    ends = np.append(starts[1:], n)
    # doc must ascend within group for delta encode; sort stability plus
    # doc-major input guarantees it in the real kernel; here it holds too
    encode_grouped(
        doc.astype(np.uint64), tf.astype(np.uint64), dl.astype(np.uint64),
        starts, ends, 128,
    )
    t["encode"] += time.time() - t0
    t["TOTAL"] = time.time() - t_all
    return {k: round(v, 2) for k, v in t.items()}


def main() -> None:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    single = run((1, batches, {0, 1}))
    print("single (2-core pin):", json.dumps(single))

    pin = set(range(procs))
    with mp.Pool(procs) as p:
        results = p.map(run, [(procs, batches, pin)] * procs)
    worst = max(r["TOTAL"] for r in results)
    mean = sum(r["TOTAL"] for r in results) / len(results)
    print(f"{procs} parallel (pin 0-{procs-1}): mean={mean:.2f}s "
          f"worst={worst:.2f}s single={single['TOTAL']}s "
          f"slowdown={mean / single['TOTAL']:.2f}x")
    agg = {k: round(sum(r[k] for r in results) / len(results), 2)
           for k in results[0]}
    print("per-proc mean stages:", json.dumps(agg))


if __name__ == "__main__":
    main()
