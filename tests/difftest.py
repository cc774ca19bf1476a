"""Differential test harness: run the reference binary and linear_tpu on the
same inputs and diff SAM/APF output.

Usage: python tests/difftest.py [--n-reads N] [--seed S] [--gap-len G]
Requires the reference binary at .ref_build/linear (cmake build of
/root/reference).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from linear_tpu.utils import seqio  # noqa: E402
from linear_tpu.utils.simdata import make_genomic_genome  # noqa: E402

REF_BIN = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "linear")


def mutate(seq, rng, sub=0.04, ins=0.03, dele=0.03):
    """PacBio-CLR-like error profile."""
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < sub:
            out.append((int(seq[i]) + int(rng.integers(1, 4))) % 4)
            i += 1
        elif r < sub + ins:
            out.append(int(rng.integers(0, 4)))
        elif r < sub + ins + dele:
            i += 1
        else:
            out.append(int(seq[i]))
            i += 1
    return np.array(out, dtype=np.uint8)


def make_repeat_genome(rng, length):
    """Repeat-rich genome: tandem arrays of a 173-mer, dispersed ~3kb TE-like
    copies (lightly mutated), homopolymer runs, and unique stretches.  This is
    the corpus class where the reference's thd_omit_block=400 bucket omission,
    binningFilter, and density filters actually fire."""
    te = rng.integers(0, 4, 3000).astype(np.uint8)
    unit = rng.integers(0, 4, 173).astype(np.uint8)
    parts = []
    total = 0
    while total < length:
        kind = int(rng.integers(0, 10))
        if kind < 3:  # tandem array of the 173-mer
            n = int(rng.integers(20, 200))
            seg = np.tile(unit, n)
        elif kind < 6:  # TE copy with ~2% substitutions
            seg = te.copy()
            nmut = int(rng.integers(0, 60))
            pos = rng.integers(0, len(seg), nmut)
            seg[pos] = (seg[pos] + rng.integers(1, 4, nmut)) % 4
        elif kind == 6:  # homopolymer run
            seg = np.full(int(rng.integers(50, 400)), int(rng.integers(0, 4)), dtype=np.uint8)
        else:  # unique sequence
            seg = rng.integers(0, 4, int(rng.integers(2000, 20000))).astype(np.uint8)
        parts.append(seg)
        total += len(seg)
    return np.concatenate(parts)[:length]


def simulate(rng, genomes, n_reads):
    """Simulated reads: normal fwd/rev, chimeric, with SVs, short, N-laced."""
    reads = []
    for i in range(n_reads):
        gid = int(rng.integers(0, len(genomes)))
        g = genomes[gid]
        kind = i % 8
        ln = int(rng.integers(1500, 12000))
        pos = int(rng.integers(0, max(1, len(g) - ln)))
        seg = g[pos : pos + ln]
        if kind == 1:  # reverse
            read = seqio.revcomp(mutate(seg, rng))
        elif kind == 2:  # chimeric two loci
            pos2 = int(rng.integers(0, max(1, len(g) - ln)))
            read = np.concatenate([mutate(seg[: ln // 2], rng), mutate(g[pos2 : pos2 + ln // 2], rng)])
        elif kind == 3:  # deletion SV
            mid = len(seg) // 2
            dl = int(rng.integers(100, 1000))
            read = mutate(np.concatenate([seg[:mid], seg[mid + dl :]]), rng)
        elif kind == 4:  # insertion SV
            mid = len(seg) // 2
            ins = rng.integers(0, 4, int(rng.integers(100, 1000))).astype(np.uint8)
            read = mutate(np.concatenate([seg[:mid], ins, seg[mid:]]), rng)
        elif kind == 5:  # inversion
            mid = len(seg) // 2
            il = int(rng.integers(300, min(2000, mid)))
            inv = seqio.revcomp(seg[mid : mid + il])
            read = mutate(np.concatenate([seg[:mid], inv, seg[mid + il :]]), rng)
        elif kind == 6:  # N bases sprinkled
            read = mutate(seg, rng)
            npos = rng.integers(0, len(read), max(1, len(read) // 500))
            read[npos] = 4
        elif kind == 7 and i % 16 == 7:  # short read (skipped by mapper)
            read = mutate(seg[:150], rng)
        else:
            read = mutate(seg, rng)
        reads.append(read)
    return reads


def run_reference(reads_fa, genome_fa, out_prefix, threads, gap_len, extra=()):
    cmd = [
        os.path.abspath(REF_BIN), "filter", reads_fa, genome_fa,
        "-t", str(threads), "-g", str(gap_len), "-o", out_prefix, "-ot", "3",
        *extra,
    ]
    subprocess.run(cmd, check=True, capture_output=True, cwd=os.path.dirname(out_prefix))
    return out_prefix + ".sam", out_prefix + ".apf"


def run_ours(reads_fa, genome_fa, out_prefix, threads, gap_len, task_split=0,
             preset=1, f_dup=0, sequence_sam=0, index_type=1, apx_chain_flag=1,
             feature_t=2):
    """task_split emulates the reference pipeline's task granularity: with
    threads > 1 and gaps on, the reference's task->thread race has two
    stable outcomes on a 2-core host — one compute task holding the whole
    block (task_split=0) or a split into 32-read tasks each with fresh
    per-task GapParms (task_split=32). Both are reproduced bit-exactly;
    the differential driver accepts either (see difftest main)."""
    from linear_tpu.map.mapper import Mapper, MapperConfig

    m = Mapper([genome_fa], MapperConfig(gap_len=gap_len, threads=threads,
                                         read_group="", sample_name="",
                                         preset=preset, f_dup=f_dup,
                                         sequence_sam=sequence_sam,
                                         index_type=index_type,
                                         apx_chain_flag=apx_chain_flag,
                                         feature_t=feature_t))
    m.prepare()
    sam_path = out_prefix + ".sam"
    apf_path = out_prefix + ".apf"
    with open(sam_path, "w") as fs, open(apf_path, "w") as fa:
        fs.write(m.sam_header())
        for block in seqio.read_blocks(reads_fa):
            if not task_split:
                cs, ce, sam = m.map_block(block)
                fs.write(sam)
                fa.write(m.apf_block(cs, block))
            else:
                all_cs = []
                for c0 in range(0, len(block.seqs), task_split):
                    sub = seqio.SeqSet(ids=block.ids[c0:c0 + task_split],
                                       seqs=block.seqs[c0:c0 + task_split])
                    m.reset_gap_parms()
                    cs, ce, sam = m.map_block(sub)
                    fs.write(sam)
                    all_cs.extend(cs)
                fa.write(m.apf_block(all_cs, block))
    return sam_path, apf_path


def diff_rate(path1, path2, ignore_blank=False):
    l1 = open(path1).read().splitlines()
    l2 = open(path2).read().splitlines()
    if ignore_blank:
        # The reference's .apf blank-line grouping depends on the adaptive
        # pipeline fetch block size (32-128, src/parallel_io.cpp:237-244),
        # i.e. on runtime scheduling; compare content lines only.
        l1 = [l for l in l1 if l.strip()]
        l2 = [l for l in l2 if l.strip()]
    same = sum(1 for a, b in zip(l1, l2) if a == b)
    total = max(len(l1), len(l2))
    return same, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-reads", type=int, default=64)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--gap-len", type=int, default=0)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--genome-len", type=int, default=200000)
    ap.add_argument("--n-genomes", type=int, default=2)
    ap.add_argument("--corpus", choices=["uniform", "repeat", "genomic"], default="uniform")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    if args.corpus == "repeat":
        genomes = [make_repeat_genome(rng, args.genome_len) for _ in range(args.n_genomes)]
    elif args.corpus == "genomic":
        genomes = [make_genomic_genome(rng, args.genome_len) for _ in range(args.n_genomes)]
    else:
        genomes = [rng.integers(0, 4, args.genome_len).astype(np.uint8) for _ in range(args.n_genomes)]
    tmp = tempfile.mkdtemp(prefix="lineardiff_")
    genome_fa = os.path.join(tmp, "g.fa")
    reads_fa = os.path.join(tmp, "r.fa")
    seqio.write_fasta(genome_fa, [f"chr{i} synthetic" for i in range(args.n_genomes)], genomes)
    reads = simulate(rng, genomes, args.n_reads)
    seqio.write_fasta(reads_fa, [f"read{i} sim" for i in range(len(reads))], reads)

    ref_sam, ref_apf = run_reference(reads_fa, genome_fa, os.path.join(tmp, "ref"), args.threads, args.gap_len)
    my_sam, my_apf = run_ours(reads_fa, genome_fa, os.path.join(tmp, "mine"), args.threads, args.gap_len)
    if (args.threads > 1 and args.gap_len > 0
            and open(ref_sam).read() != open(my_sam).read()):
        # the reference's multi-thread pipeline race: retry with the
        # 32-read task-split schedule (see run_ours)
        my_sam, my_apf = run_ours(reads_fa, genome_fa, os.path.join(tmp, "mine"),
                                  args.threads, args.gap_len, task_split=32)
        print("(schedule B: 32-read task split)")

    pairs = [("SAM", ref_sam, my_sam), ("APF", ref_apf, my_apf)]
    for name, p1, p2 in pairs:
        same, total = diff_rate(p1, p2, ignore_blank=(name == "APF"))
        status = "IDENTICAL" if same == total else f"{same}/{total} lines match"
        print(f"{name}: {status}")
        if same != total:
            import itertools
            l1 = open(p1).read().splitlines()
            l2 = open(p2).read().splitlines()
            shown = 0
            for i, (a, b) in enumerate(itertools.zip_longest(l1, l2, fillvalue="<EOF>")):
                if a != b and shown < 4:
                    print(f"  line {i}:\n    ref : {a[:160]}\n    mine: {b[:160]}")
                    shown += 1
    if args.keep:
        print("kept:", tmp)
    else:
        import shutil
        shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
