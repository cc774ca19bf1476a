"""Differential tests vs the reference binary (skipped if not built).

The reference binary is built out-of-tree into .ref_build (cmake /root/reference).
These tests assert BIT-IDENTICAL SAM and APF output.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import difftest as DT  # noqa: E402

from linear_tpu.utils import seqio  # noqa: E402

needs_ref = pytest.mark.skipif(
    not os.path.exists(DT.REF_BIN), reason="reference binary not built (.ref_build)"
)


@needs_ref
@pytest.mark.parametrize("seed,n_reads,gap_len", [(11, 32, 0), (123, 32, 0), (11, 24, 50), (777, 24, 50)])
def test_sam_apf_bit_identical(tmp_path, seed, n_reads, gap_len):
    rng = np.random.default_rng(seed)
    genomes = [rng.integers(0, 4, 120000).astype(np.uint8) for _ in range(2)]
    genome_fa = str(tmp_path / "g.fa")
    reads_fa = str(tmp_path / "r.fa")
    seqio.write_fasta(genome_fa, ["chrA x", "chrB y"], genomes)
    reads = DT.simulate(rng, genomes, n_reads)
    seqio.write_fasta(reads_fa, [f"read{i} sim" for i in range(len(reads))], reads)
    ref_sam, ref_apf = DT.run_reference(reads_fa, genome_fa, str(tmp_path / "ref"), 4, gap_len)
    my_sam, my_apf = DT.run_ours(reads_fa, genome_fa, str(tmp_path / "mine"), 4, gap_len)
    assert open(ref_sam).read() == open(my_sam).read()
    # APF blank-line grouping depends on the reference's adaptive pipeline
    # fetch blocking (scheduling-dependent); compare content lines.
    strip = lambda p: [l for l in open(p).read().splitlines() if l.strip()]
    assert strip(ref_apf) == strip(my_apf)


@needs_ref
@pytest.mark.parametrize("preset,f_dup,sequence_sam,extra", [
    (0, 0, 0, ("-p", "0")),
    (2, 0, 0, ("-p", "2")),
    (1, 1, 0, ("-dup", "1")),
    (1, 0, 1, ("-ss", "1")),
])
def test_flag_bit_identical(tmp_path, preset, f_dup, sequence_sam, extra):
    """Differential coverage of the remaining CLI-reachable flags: presets
    -p 0/2 (stop_chain_len_ratio + thd_DI/thd_X wiring, src/mapper.cpp:174),
    -dup 1 (try_dup addon), -ss 1 (SEQ synthesis)."""
    rng = np.random.default_rng(4242)
    genomes = [DT.make_repeat_genome(rng, 150000)]
    genome_fa = str(tmp_path / "g.fa")
    reads_fa = str(tmp_path / "r.fa")
    seqio.write_fasta(genome_fa, ["chr0 rep"], genomes)
    reads = DT.simulate(rng, genomes, 24)
    seqio.write_fasta(reads_fa, [f"read{i} sim" for i in range(len(reads))], reads)
    ref_sam, _ = DT.run_reference(reads_fa, genome_fa, str(tmp_path / "ref"),
                                  1, 50, extra=extra)
    my_sam, _ = DT.run_ours(reads_fa, genome_fa, str(tmp_path / "mine"), 1, 50,
                            preset=preset, f_dup=f_dup, sequence_sam=sequence_sam)
    assert open(ref_sam).read() == open(my_sam).read()


@needs_ref
@pytest.mark.parametrize("seed,threads,gap_len", [
    (20260818, 1, 0), (20260818, 4, 0), (20260818, 4, 50),
    (5150, 1, 50), (909, 4, 50),
])
def test_repeat_rich_bit_identical(tmp_path, seed, threads, gap_len):
    """Repeat-rich genomes (tandem 173-mers, dispersed TE copies,
    homopolymers): exercises thd_omit_block omission, binningFilter, the
    density filters, std::sort tie permutations, and the per-thread GapParms
    state leak — all invisible on uniform-random corpora."""
    rng = np.random.default_rng(seed)
    genomes = [DT.make_repeat_genome(rng, 300000)]
    genome_fa = str(tmp_path / "g.fa")
    reads_fa = str(tmp_path / "r.fa")
    seqio.write_fasta(genome_fa, ["chr0 rep"], genomes)
    reads = DT.simulate(rng, genomes, 48)
    seqio.write_fasta(reads_fa, [f"read{i} sim" for i in range(len(reads))], reads)
    ref_sam, ref_apf = DT.run_reference(reads_fa, genome_fa, str(tmp_path / "ref"), threads, gap_len)
    my_sam, my_apf = DT.run_ours(reads_fa, genome_fa, str(tmp_path / "mine"), threads, gap_len)
    if (threads > 1 and gap_len > 0
            and open(ref_sam).read() != open(my_sam).read()):
        # the reference's multi-thread pipeline has two stable schedules on
        # this host (task split races; GapParms is per compute task) — our
        # engine reproduces both; accept whichever the reference took
        my_sam, my_apf = DT.run_ours(reads_fa, genome_fa, str(tmp_path / "mine"),
                                     threads, gap_len, task_split=32)
    assert open(ref_sam).read() == open(my_sam).read()
    strip = lambda p: [l for l in open(p).read().splitlines() if l.strip()]
    assert strip(ref_apf) == strip(my_apf)
