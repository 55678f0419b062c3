"""Generate /root/sf1_synth: a deterministic 10x replica of sf0.1.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r05.json ran at sf1.0: 50 000 documents / 20 000
embeddings). That directory is not present locally, so measurements at
driver-like scale use this synthetic stand-in: every replica's text is
perturbed with a replica-specific token so texts stay byte-distinct
(dedup prefilter sees no fake exact-dup clusters), and embeddings get a
small deterministic per-replica rotation so near-dup structure is not
degenerate. Numbers from this directory are marked *sf1-proxy* in
OPTIMIZATION_r06.md — indicative of driver scale, not identical data.

Usage: python tools/make_sf_proxy.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_synth"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)

    docs = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    n = len(docs)
    parts = []
    for k in range(reps):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * n
        if k > 0:
            # replica-specific suffix token: texts stay byte-distinct and
            # shingle sets diverge slightly (near-dup, not exact-dup)
            d["text"] = d["text"] + (" rep" + str(k) + "x") + d["doc_id"].astype(str)
        parts.append(d)
    big = pd.concat(parts, ignore_index=True)
    big["n_chars"] = big["text"].str.len().astype("int64")
    big.to_parquet(os.path.join(out, "documents.parquet"), index=False)

    emb = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"))
    m = len(emb)
    mat = np.stack(emb["embedding"].to_numpy())
    rng = np.random.default_rng(1234)
    eparts = []
    for k in range(reps):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + k * m
        if k > 0:
            noise = rng.normal(0, 0.02, size=mat.shape).astype(np.float32)
            pert = mat + noise
            e["embedding"] = list(pert)
        eparts.append(e)
    ebig = pd.concat(eparts, ignore_index=True)
    ebig.to_parquet(os.path.join(out, "embeddings.parquet"), index=False)
    print(f"wrote {out}: {len(big)} documents, {len(ebig)} embeddings")


if __name__ == "__main__":
    main()
