"""Genome-size scaling: prep + map rates at bacterial to chr21 scale.

For each genome size: build features + DIndex (native) + HIndex (native),
then map a fixed read batch with the production pipeline, printing one
table row. The dense dir table is 4^13 int32 (268 MB) at EVERY size —
bacterial-scale builds are dominated by it, chr21-scale builds by the
genome scan — so build time grows sublinearly until the scan dominates.

Usage: python tools/bench_scale.py [--sizes 4600000,46000000] [--reads 2048]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from linear_tpu.index import hindex as HI
from linear_tpu.map import nengine as NE
from linear_tpu.map.mapper import Mapper, MapperConfig
from linear_tpu.parallel.pipeline import PipelineMapper
from linear_tpu.utils import seqio
from linear_tpu.utils.simdata import make_genomic_genome

ap = argparse.ArgumentParser()
ap.add_argument("--sizes", default="4600000,23000000,46000000")
ap.add_argument("--reads", type=int, default=2048)
ap.add_argument("--read-len", type=int, default=7000)
args = ap.parse_args()

tmp = "/tmp/lt_scale"
os.makedirs(tmp, exist_ok=True)
print(f"{'genome':>10} {'load_s':>7} {'feat_s':>7} {'dindex_s':>9} "
      f"{'hindex_s':>9} {'map_reads_s':>12}")
for size in [int(x) for x in args.sizes.split(",")]:
    rng = np.random.default_rng(size % 100003)
    g_fa = os.path.join(tmp, f"g{size}.fa")
    r_fa = os.path.join(tmp, f"r{size}.fa")
    if not os.path.exists(g_fa):
        # cord x is 30 bits (<=1 Gb per sequence, src/cords.cpp:159-168):
        # human-scale genomes are multi-chromosome, like the reference's
        # flagship 24-sequence 2945 Mb run (README.md:84-92)
        n_chr = max(1, -(-size // 250_000_000))
        csize = size // n_chr
        chrs = [make_genomic_genome(rng, csize) for _ in range(n_chr)]
        seqio.write_fasta(g_fa, [f"chr{i+1}" for i in range(n_chr)], chrs)
        genome = None
        reads = []
        for i in range(args.reads):
            while True:
                c = int(rng.integers(0, n_chr))
                pos = int(rng.integers(0, csize - args.read_len))
                seg = chrs[c][pos: pos + args.read_len]
                if (seg == 4).sum() < args.read_len // 2:
                    break
            r = seg.copy()
            sub = rng.random(len(r)) < 0.08
            r[sub] = (r[sub] + rng.integers(1, 4, int(sub.sum()))) % 4
            if i % 3 == 2:
                r = seqio.revcomp(r)
            reads.append(r)
        seqio.write_fasta(r_fa, [f"rd{i}" for i in range(len(reads))], reads)
    t0 = time.time()
    mapper = Mapper([g_fa], MapperConfig())
    t_load = time.time() - t0
    t0 = time.time()
    mapper.create_features()
    t_feat = time.time() - t0
    t0 = time.time()
    mapper.create_index()
    t_di = time.time() - t0
    t0 = time.time()
    NE.build_hindex_native(mapper.genomes, HI.DEFAULT_SPAN, HI.DEFAULT_STEP,
                           HI.DEFAULT_BLOCKLIMIT, HI.DEFAULT_ALPHA, 16)
    t_hi = time.time() - t0
    pipe = PipelineMapper(mapper)
    # warm pass first: pool spin-up + each worker's soft faults over the
    # (CoW-shared) multi-GB genome/index/feature pages — at 3 Gb the cold
    # pass alone costs several seconds and misreports the map rate 3-4x
    for br in pipe.run(r_fa, collect_cords=False):
        pass
    n = 0
    t0 = time.time()
    for br in pipe.run(r_fa, collect_cords=False):
        n += br.n
    t_map = time.time() - t0
    pipe.close()
    print(f"{size/1e6:>8.1f}M {t_load:>7.2f} {t_feat:>7.2f} {t_di:>9.2f} "
          f"{t_hi:>9.2f} {n / t_map:>12.0f}")
