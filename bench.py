"""Benchmark: device mapping throughput on an E. coli-scale config.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload (BASELINE.json config 1 analog): synthetic 4.6 Mb genome + simulated
PacBio-CLR-like reads (~7 kb, ~10% err). The baseline is the reference binary
(.ref_build/linear, cmake build of /root/reference) run on the SAME data on
this machine with -t 16; its reads/s is cached in .bench_cache/baseline.json
so machines without the reference toolchain reuse the last measured value.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(ROOT, ".bench_cache")
GENOME_LEN = 4_600_000
N_READS = 256
READ_LEN = 7000
SEED = 42
REF_FALLBACK_READS_PER_S = 1955.62  # reference README human run (BASELINE.md)


def mutate(seq, rng, sub=0.04, ins=0.03, dele=0.03):
    r = rng.random(len(seq) * 2)
    out = []
    i = 0
    k = 0
    while i < len(seq):
        x = r[k % len(r)]
        k += 1
        if x < sub:
            out.append((int(seq[i]) + 1) % 4)
            i += 1
        elif x < sub + ins:
            out.append(int(r[(k + 7) % len(r)] * 4) & 3)
        elif x < sub + ins + dele:
            i += 1
        else:
            out.append(int(seq[i]))
            i += 1
    return np.array(out, dtype=np.uint8)


def make_data():
    from linear_tpu.utils import seqio

    os.makedirs(CACHE, exist_ok=True)
    g_fa = os.path.join(CACHE, "bench_g.fa")
    r_fa = os.path.join(CACHE, "bench_r.fa")
    if not (os.path.exists(g_fa) and os.path.exists(r_fa)):
        rng = np.random.default_rng(SEED)
        genome = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
        reads = []
        for i in range(N_READS):
            pos = int(rng.integers(0, GENOME_LEN - READ_LEN))
            r = mutate(genome[pos: pos + READ_LEN], rng)
            if i % 3 == 2:
                r = seqio.revcomp(r)
            reads.append(r)
        seqio.write_fasta(g_fa, ["U00096.3 synthetic"], [genome])
        seqio.write_fasta(r_fa, [f"read{i} sim" for i in range(len(reads))], reads)
    return g_fa, r_fa


def measure_baseline(g_fa: str, r_fa: str) -> float:
    """reads/s of the reference binary on this machine (-t 16), cached."""
    cache_f = os.path.join(CACHE, "baseline.json")
    ref_bin = os.path.join(ROOT, ".ref_build", "linear")
    if os.path.exists(cache_f):
        return json.load(open(cache_f))["reads_per_s"]
    if not os.path.exists(ref_bin):
        return REF_FALLBACK_READS_PER_S
    out_prefix = os.path.join(CACHE, "ref_bench")
    t0 = time.time()
    subprocess.run(
        [ref_bin, "filter", r_fa, g_fa, "-t", "16", "-o", out_prefix, "-ot", "2"],
        check=True, capture_output=True, cwd=CACHE,
    )
    wall = time.time() - t0
    rps = N_READS / wall
    json.dump({"reads_per_s": rps, "wall_s": wall, "n_reads": N_READS,
               "note": "reference binary, -t 16, whole run incl. load+index"},
              open(cache_f, "w"))
    return rps


def main():
    from linear_tpu.index import dindex as DI
    from linear_tpu.ops import seeding as SD
    from linear_tpu.parallel.mesh import mapping_step
    from linear_tpu.utils import seqio
    import jax
    import jax.numpy as jnp

    g_fa, r_fa = make_data()
    baseline = measure_baseline(g_fa, r_fa)

    genomes = seqio.load_genomes([g_fa])
    idx_cache = os.path.join(CACHE, "bench_index.npz")
    if os.path.exists(idx_cache):
        z = np.load(idx_cache)
        idx = DI.DIndex(span=21, weight=13, dir=z["dir"], hs=z["hs"])
    else:
        idx = DI.build_dindex(genomes.seqs, threads_emul=16)
        np.savez(idx_cache, dir=idx.dir, hs=idx.hs)
    dev = SD.upload_index(idx)

    reads = [r for _, r in seqio.read_seq_records(r_fa)]
    B = 64
    pad = 8192
    n_max = 256
    seqs = np.zeros((len(reads), pad), dtype=np.int32)
    lens = np.zeros((len(reads),), dtype=np.int64)
    for i, r in enumerate(reads):
        n = min(len(r), pad)
        seqs[i, :n] = r[:n]
        lens[i] = n

    has_n = bool((seqs == 4).any())

    def run_batch(b0):
        s = jnp.asarray(seqs[b0: b0 + B])
        l = jnp.asarray(lens[b0: b0 + B])
        out = mapping_step(s, l, dev.dir_start, dev.hs_lo, dev.hs_hi,
                           cap=dev.cap, n_max=n_max, fast=not has_n)
        jax.block_until_ready(out)
        return out

    run_batch(0)  # compile
    t0 = time.time()
    nb = 0
    for b0 in range(0, len(reads), B):
        if b0 + B <= len(reads):
            run_batch(b0)
            nb += B
    dt = time.time() - t0
    rps = nb / dt
    print(json.dumps({
        "metric": "device_seed_chain_reads_per_s",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / baseline, 4),
    }))


if __name__ == "__main__":
    main()
