"""End-to-end apxMap + output layer tests on synthetic data."""
import numpy as np
import pytest

from linear_tpu.map.mapper import Mapper, MapperConfig
from linear_tpu.map import pmpfinder as PMP
from linear_tpu.ops import features as F
from linear_tpu.out import bamlink as BL
from linear_tpu.utils import seqio
from linear_tpu.utils.cordscalar import cy, cx, strand, is_end


def mutate(seq, rng, sub=0.05, ins=0.02, dele=0.02):
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < sub:
            out.append((seq[i] + rng.integers(1, 4)) % 4)
            i += 1
        elif r < sub + ins:
            out.append(rng.integers(0, 4))
        elif r < sub + ins + dele:
            i += 1
        else:
            out.append(seq[i])
            i += 1
    return np.array(out, dtype=np.uint8)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 60000).astype(np.uint8)
    d = tmp_path_factory.mktemp("apx")
    seqio.write_fasta(str(d / "g.fa"), ["chr1 desc"], [genome])
    m = Mapper([str(d / "g.fa")], MapperConfig(gap_len=0, threads=16))
    m.prepare()
    return m, genome, rng


def test_forward_read_maps_to_origin(world):
    m, genome, rng = world
    read = mutate(genome[20000:26000], rng)
    cords, cords_end, info = m.map_read(read)
    assert len(cords) > 10
    body = cords[1:]
    # all cords on forward strand, x anchored near 20000 + y
    assert all(strand(c) == 0 for c in body)
    diags = [cx(c) - cy(c) for c in body]
    assert all(abs(d - 20000) < 600 for d in diags)


def test_reverse_read_maps(world):
    m, genome, rng = world
    read = seqio.revcomp(mutate(genome[30000:36000], rng))
    cords, cords_end, info = m.map_read(read)
    assert len(cords) > 10
    assert all(strand(c) == 1 for c in cords[1:])


def test_short_read_skipped(world):
    m, genome, rng = world
    cords, cords_end, info = m.map_read(genome[:199])
    assert cords == []


def test_cigar_lengths_consistent(world):
    m, genome, rng = world
    read = mutate(genome[10000:18000], rng)
    cords, cords_end, info = m.map_read(read)
    records = BL.cords2bamlink(cords, cords_end, len(read))
    BL.fill_bam_records(records, m.genome_ids, "r1")
    lines = BL.sam_lines(records)
    assert len(lines) >= 1
    for line in lines:
        f = line.split("\t")
        cig = f[5]
        # read-consuming ops must sum to read length
        import re
        read_len = sum(
            int(n) for n, op in re.findall(r"(\d+)([SMIX=])", cig) if op in "SMIX="
        )
        read_len -= sum(int(n) for n, op in re.findall(r"(\d+)(M)", cig))
        assert read_len == len(read), (read_len, len(read), cig[:80])


def test_cords_block_structure(world):
    m, genome, rng = world
    read = mutate(genome[20000:26000], rng)
    cords, cords_end, _ = m.map_read(read)
    # header present with blockEnd flag; last cord flagged
    assert is_end(cords[0])
    assert is_end(cords[-1])
    # cords_end = cords_str + (96, 96)
    for cs, ce in zip(cords[1:], cords_end[1:]):
        assert cx(ce) - cx(cs) == 96 and cy(ce) - cy(cs) == 96


def test_sam_header_format(world):
    m, _, _ = world
    h = m.sam_header()
    assert h.startswith("@SQ\tSN:chr1\tLN:60000\n")
    assert "@PG\tID:M1-3\tPN:Linear" in h


def test_window_dist_scalar_matches_vectorized(world):
    rng = np.random.default_rng(3)
    s = rng.integers(0, 4, 500).astype(np.uint8)
    t = rng.integers(0, 4, 500).astype(np.uint8)
    fa, fb = F.create_features(s), F.create_features(t)
    Fa, Fb = PMP.Feats(fa), PMP.Feats(fb)
    for a in range(0, len(fa) - 4, 3):
        b = (a * 7) % (len(fb) - 4)
        assert PMP.window_dist_u(Fa, Fb, a, b) == int(F.window_dist(fa, fb, a, b))


def test_supplementary_flags(world):
    # a chimeric read: two distant segments -> >=2 records, flags 0 then 2048
    m, genome, rng = world
    read = np.concatenate([genome[5000:9000], genome[40000:44000]])
    cords, cords_end, _ = m.map_read(read)
    records = BL.cords2bamlink(cords, cords_end, len(read))
    BL.fill_bam_records(records, m.genome_ids, "r1")
    lines = BL.sam_lines(records)
    if len(lines) >= 2:
        flags = [int(l.split("\t")[1]) for l in lines]
        assert flags[0] in (0, 16)
        assert all(f & 2048 for f in flags[1:])
        assert any("SA:Z:" in l for l in lines)
