"""Synthetic corpus generators (framework feature; the reference has no
read/genome simulator). make_genomic_genome models the repeat statistics
of a bacterial genome for BASELINE config 1 runs — see the docstring."""
from __future__ import annotations

import numpy as np

from . import seqio


def make_genomic_genome(rng, length):
    """Realistic-structure bacterial-genome stand-in (BASELINE config 1's
    E. coli K-12 cannot be fetched in this zero-egress environment, so this
    models its repeat statistics instead): 7 rDNA-like operon copies at
    ~99.5% identity (E. coli has 7 rrn operons — the classic
    thd_omit_block-saturating family), IS-element families (IS1-like 768 bp
    x8, IS3-like 1258 bp x5), ~500 scattered REP-like 40 bp palindromes,
    assembly-gap N runs, AT-rich islands, homopolymers and dinucleotide
    microsatellites embedded in unique sequence."""
    def mutated_copy(base, rate):
        seg = base.copy()
        nmut = rng.binomial(len(seg), rate)
        pos = rng.integers(0, len(seg), nmut)
        seg[pos] = (seg[pos] + rng.integers(1, 4, nmut)) % 4
        return seg

    rrn = rng.integers(0, 4, 5000).astype(np.uint8)
    is1 = rng.integers(0, 4, 768).astype(np.uint8)
    is3 = rng.integers(0, 4, 1258).astype(np.uint8)
    rep_half = rng.integers(0, 4, 20).astype(np.uint8)
    rep = np.concatenate([rep_half, seqio.revcomp(rep_half)])  # palindrome
    features = (
        [("rrn", None)] * 7 + [("is1", None)] * 8 + [("is3", None)] * 5
        + [("rep", None)] * 500 + [("ngap", None)] * 3
        + [("at", None)] * 10 + [("homo", None)] * 40 + [("micro", None)] * 40
    )
    rng.shuffle(features)
    parts = []
    total = 0
    per_gap = max(1, (length - 120000) // (len(features) + 1))
    for kind, _ in features:
        ul = int(rng.integers(per_gap // 2, per_gap + per_gap // 2))
        parts.append(rng.integers(0, 4, ul).astype(np.uint8))
        total += ul
        if kind == "rrn":
            seg = mutated_copy(rrn, 0.005)
        elif kind == "is1":
            seg = mutated_copy(is1, 0.01)
        elif kind == "is3":
            seg = mutated_copy(is3, 0.01)
        elif kind == "rep":
            seg = mutated_copy(rep, 0.02)
        elif kind == "ngap":
            seg = np.full(int(rng.integers(100, 2000)), 4, dtype=np.uint8)
        elif kind == "at":
            seg = rng.choice(np.array([0, 3], dtype=np.uint8),
                             int(rng.integers(2000, 8000)),
                             p=[0.5, 0.5]).astype(np.uint8)
        elif kind == "homo":
            seg = np.full(int(rng.integers(8, 60)),
                          int(rng.integers(0, 4)), dtype=np.uint8)
        else:  # microsatellite
            u2 = rng.integers(0, 4, 2).astype(np.uint8)
            seg = np.tile(u2, int(rng.integers(10, 120)))
        parts.append(seg)
        total += len(seg)
        if total >= length:
            break
    if total < length:
        parts.append(rng.integers(0, 4, length - total).astype(np.uint8))
    return np.concatenate(parts)[:length]
