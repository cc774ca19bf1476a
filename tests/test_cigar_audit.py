"""check_cigar replay audit over the difftest corpora (reference oracle:
src/test_units.cpp:14-164): structural CIGAR consistency is exact; '='
base agreement must stay high (the virtual alignment approximates the
diagonal; simulated reads carry ~10% errors)."""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cigar_audit as CA  # noqa: E402
import difftest as DT  # noqa: E402
from linear_tpu.map.mapper import Mapper, MapperConfig  # noqa: E402
from linear_tpu.utils import seqio  # noqa: E402


@pytest.mark.parametrize("corpus,gap_len", [
    ("uniform", 0), ("uniform", 1), ("repeat", 1),
])
def test_cigar_replay(tmp_path, corpus, gap_len):
    rng = np.random.default_rng(13)
    if corpus == "repeat":
        genomes = [DT.make_repeat_genome(rng, 200000)]
    else:
        genomes = [rng.integers(0, 4, 150000).astype(np.uint8)]
    reads = DT.simulate(rng, genomes, 32)
    g_fa = str(tmp_path / "g.fa")
    seqio.write_fasta(g_fa, ["g0 x"], genomes)
    m = Mapper([g_fa], MapperConfig(gap_len=gap_len, threads=16))
    m.prepare()
    block = seqio.SeqSet(ids=[f"read{i}" for i in range(len(reads))], seqs=reads)
    _, _, sam = m.map_block(block)
    read_map = dict(zip(block.ids, block.seqs))
    n_match, n_mis, n_best = CA.audit_sam(sam, m.genome_ids, m.genomes, read_map)
    assert n_match > 0, "no '=' bases audited"
    total = n_match + n_mis
    rate = n_match / total
    rate_b = n_best / total
    # '=' runs sit on cell-rounded (16-base) diagonals and CLR reads carry
    # ~10% error, so raw agreement is modest by construction (the reference's
    # identical SAM audits at the same level). Within +-8 shifts the true
    # diagonal is found where mapping is right; a wrong mapping stays near
    # random (~0.25 raw / ~0.3 best-shift). Observed: raw ~0.31-0.34,
    # best-shift ~0.54 on these corpora — thresholds are regression
    # tripwires a few points below.
    assert rate > 0.28, f"raw '=' agreement at random level: {rate:.3f}"
    assert rate_b > 0.45, f"best-shift '=' agreement collapsed: {rate_b:.3f}"
