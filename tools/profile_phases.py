"""Run tools/profile_worker.py at two parallelism levels (taskset-pinned,
fresh JVM each) over one shared corpus and print the per-stage scaling
table. Iteration harness for the scaling work — NOT the evidence bench
(that is tools/bench_scaling.py).

Usage: python tools/profile_phases.py [n_rows] [N] [4N] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 150000
LEVEL_N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
LEVEL_4N = int(sys.argv[3]) if len(sys.argv) > 3 else 8
ROUNDS = int(sys.argv[4]) if len(sys.argv) > 4 else 1
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, corpus_pq: str, work: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, os.path.join(REPO, "tools", "profile_worker.py"),
         str(cores), corpus_pq, work],
        capture_output=True, text=True, timeout=5400,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(1)
    return json.loads(lines[-1])


def main() -> None:
    work = tempfile.mkdtemp(prefix="kbse_prof_")
    corpus_pq = os.path.join(work, "corpus.parquet")
    gen = subprocess.run(
        [sys.executable, "-c", f"""
import sys; sys.path.insert(0, {REPO!r})
from kbasesearchengine_spark.session import get_spark
from kbasesearchengine_spark.corpus import generate_corpus
spark = get_spark('gen', cores=32, shuffle_partitions=32)
generate_corpus(spark, {N_ROWS}, parallelism=32).write.mode('overwrite').parquet({corpus_pq!r})
"""],
        capture_output=True, text=True, timeout=3600,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    rn_all, r4_all = [], []
    for _ in range(ROUNDS):
        rn = run(LEVEL_N, corpus_pq, work)
        print(json.dumps(rn), flush=True)
        r4 = run(LEVEL_4N, corpus_pq, work)
        print(json.dumps(r4), flush=True)
        rn_all.append(rn)
        r4_all.append(r4)

    # best (min) per stage per level across rounds
    stages = rn_all[0]["stages"].keys()
    bn = {s: min(r["stages"][s] for r in rn_all) for s in stages}
    b4 = {s: min(r["stages"][s] for r in r4_all) for s in stages}
    ratio = LEVEL_4N / LEVEL_N
    print(f"\nstage                 local[{LEVEL_N}]  local[{LEVEL_4N}]  eff")
    for s in stages:
        eff = (bn[s] / b4[s]) / ratio if b4[s] else float("nan")
        print(f"{s:<22}{bn[s]:>8.2f}{b4[s]:>10.2f}  {eff:.3f}")
    print(f"\nderived deltas (4N):")
    print(f"  arrow-boundary  = {b4['arrow_consume'] - b4['jvm_tokenize_hash']:.2f}s")
    print(f"  numpy kernel    = {b4['kernel_no_write'] - b4['arrow_consume']:.2f}s")
    print(f"  parquet write   = {b4['full_group'] - b4['kernel_no_write']:.2f}s")
    print(f"derived deltas ({LEVEL_N}):")
    print(f"  arrow-boundary  = {bn['arrow_consume'] - bn['jvm_tokenize_hash']:.2f}s")
    print(f"  numpy kernel    = {bn['kernel_no_write'] - bn['arrow_consume']:.2f}s")
    print(f"  parquet write   = {bn['full_group'] - bn['kernel_no_write']:.2f}s")


if __name__ == "__main__":
    main()
