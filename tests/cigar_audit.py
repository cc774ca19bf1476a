"""check_cigar-style replay audit (reference: src/test_units.cpp:14-164).

Replays every emitted CIGAR against genome + read:
  - structural invariants (exact): read-consuming ops (S/=/X/I/M) of each
    line sum to the read length; the genome walk stays in bounds.
  - '=' base agreement (statistical): the reference emits a "virtual
    alignment" whose '=' runs are approximate diagonals, so '=' positions
    match the genome at a high rate but not exactly; the audit returns the
    aggregate rate for the caller to bound.

Used by tests/test_cigar_audit.py on every difftest corpus so a future
divergence localizes to the output layer vs the mapping layers.
"""
from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

_CIG_RE = re.compile(r"(\d+)([SHMIDX=])")


MAX_SHIFT = 8  # half a 16-base cell: window cords round diagonals to cells


def _best_shift_matches(genome: np.ndarray, it1: int, seq: np.ndarray,
                        it2: int, cnt: int) -> int:
    """Max '=' base agreement of the run over diagonal shifts in
    [-MAX_SHIFT, MAX_SHIFT] — the emitted diagonal is cell-rounded (16-base
    granularity), so the true diagonal lies within half a cell."""
    best = 0
    r = seq[it2: it2 + cnt]
    for d in range(-MAX_SHIFT, MAX_SHIFT + 1):
        a = it1 + d
        if a < 0 or a + cnt > len(genome):
            continue
        eq = int(np.count_nonzero(genome[a: a + cnt] == r))
        if eq > best:
            best = eq
    return best


def audit_sam_line(line: str, genomes: dict, read: np.ndarray,
                   rc: np.ndarray) -> Tuple[int, int, int]:
    """Returns (n_match, n_mismatch, n_match_best_shift) over '=' ops;
    raises AssertionError on structural violations."""
    fields = line.rstrip("\n").split("\t")
    flag = int(fields[1])
    genome = genomes[fields[2]]
    pos = int(fields[3]) - 1
    cig = _CIG_RE.findall(fields[5])
    assert cig, f"unparseable CIGAR: {fields[5]!r}"
    seq = rc if flag & 16 else read
    it1 = pos  # genome
    it2 = 0    # read
    n_match = n_mis = n_best = 0
    read_consumed = 0
    for cnt_s, op in cig:
        cnt = int(cnt_s)
        if op in ("S", "H"):
            it2 += cnt
            read_consumed += cnt
        elif op == "I":
            it2 += cnt
            read_consumed += cnt
        elif op == "D":
            it1 += cnt
        elif op in ("=", "X", "M"):
            assert it1 + cnt <= len(genome), \
                f"genome overrun: {it1}+{cnt} > {len(genome)}"
            assert it2 + cnt <= len(seq), f"read overrun: {it2}+{cnt} > {len(seq)}"
            if op == "=":
                g = genome[it1: it1 + cnt]
                r = seq[it2: it2 + cnt]
                eq = int(np.count_nonzero(g == r))
                n_match += eq
                n_mis += cnt - eq
                n_best += _best_shift_matches(genome, it1, seq, it2, cnt)
            it1 += cnt
            it2 += cnt
            read_consumed += cnt
    assert read_consumed == len(read), \
        f"CIGAR consumes {read_consumed} of a {len(read)}-base read"
    assert it1 <= len(genome)
    return n_match, n_mis, n_best


def audit_sam(sam_text: str, genome_ids: List[str], genome_seqs: List[np.ndarray],
              reads: dict) -> Tuple[int, int]:
    """Audit every alignment line of a SAM text. reads: qname -> codes.
    Returns aggregate ('=' matches, mismatches)."""
    from linear_tpu.utils import seqio

    genomes = dict(zip(genome_ids, genome_seqs))
    tot_m = tot_x = tot_b = 0
    for line in sam_text.splitlines():
        if not line or line.startswith("@"):
            continue
        qname = line.split("\t", 1)[0]
        read = reads[qname]
        m, x, b = audit_sam_line(line, genomes, read, seqio.revcomp(read))
        tot_m += m
        tot_x += x
        tot_b += b
    return tot_m, tot_x, tot_b
