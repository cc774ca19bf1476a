"""Native engine (lt_engine) vs Python host oracle: bit-identical cords and
SAM text per read, on uniform and repeat-rich corpora, gaps on and off,
with and without precomputed seed anchors."""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import difftest as DT  # noqa: E402
from linear_tpu.index import dindex as DI  # noqa: E402
from linear_tpu.map import nengine as NE  # noqa: E402
from linear_tpu.map.mapper import Mapper, MapperConfig  # noqa: E402
from linear_tpu.utils import seqio  # noqa: E402

pytestmark = pytest.mark.skipif(
    NE.engine_lib() is None, reason="native toolchain unavailable")


def _mapper_for(genomes, tmp_path, gap_len):
    g_fa = str(tmp_path / "g.fa")
    seqio.write_fasta(g_fa, [f"g{i} x" for i in range(len(genomes))], genomes)
    m = Mapper([g_fa], MapperConfig(gap_len=gap_len, threads=16))
    m.prepare()
    return m


def _native_for(m: Mapper):
    return NE.NativeEngine(
        m.genomes, [f.arr for f in m.f2], m.index, m.genome_ids,
        thd_DI=m.cfg.thd_DI, thd_X=m.cfg.thd_X,
        gap_len_min=(0 if not m.cfg.gap_len else
                     (50 if m.cfg.gap_len == 1 else
                      (10 if m.cfg.gap_len < 10 else m.cfg.gap_len))),
        f_dup=m.cfg.f_dup, f_chain=m.cfg.apx_chain_flag,
        sequence_sam=m.cfg.sequence_sam, reform_ccs=m.cfg.reform_ccs)


@pytest.mark.parametrize("corpus,gap_len,use_seeds", [
    ("uniform", 0, False),
    ("uniform", 1, False),
    ("uniform", 1, True),
    ("repeat", 0, False),
    ("repeat", 1, False),
    ("repeat", 1, True),
])
def test_native_matches_python(tmp_path, corpus, gap_len, use_seeds):
    rng = np.random.default_rng(20260820)
    if corpus == "repeat":
        genomes = [DT.make_repeat_genome(rng, 200000)]
    else:
        genomes = [rng.integers(0, 4, 150000).astype(np.uint8)]
    reads = DT.simulate(rng, genomes, 24)
    m = _mapper_for(genomes, tmp_path, gap_len)
    ne = _native_for(m)
    m.reset_gap_parms()
    ne.reset()
    for k, read in enumerate(reads):
        rid = f"read{k}"
        seeds = None
        if use_seeds and len(read) > 200:
            seeds = DI.query_anchors(m.index, read, 0, len(read), thd_alpha=15)
        # python oracle
        cs_py, ce_py, _info = m.map_read(
            read, seed_anchors=(None if seeds is None else
                                [int(a) for a in seeds]))
        sam_py, _ = m.read_output(read, rid, cs_py, ce_py)
        # native
        cs_n, ce_n, sam_n = ne.map_read(read, rid, seeds=seeds)
        assert [int(c) for c in cs_n] == [int(c) & ((1 << 64) - 1) for c in cs_py], \
            f"cords_str mismatch read {k} ({corpus}, g={gap_len})"
        assert [int(c) for c in ce_n] == [int(c) & ((1 << 64) - 1) for c in ce_py], \
            f"cords_end mismatch read {k}"
        assert sam_n == sam_py, f"SAM mismatch read {k} ({corpus}, g={gap_len})"


@pytest.mark.parametrize("threads", [1, 4, 16])
def test_native_builders_match_numpy(threads):
    """Native genome-feature and DIndex builders produce tables identical to
    the numpy builders, incl. N-laced genomes and thread-count-dependent
    sampling."""
    from linear_tpu.ops import features as F

    rng = np.random.default_rng(3)
    g1 = rng.integers(0, 4, 80001).astype(np.uint8)
    g2 = DT.make_repeat_genome(rng, 60000)
    # lace g2 with N runs (incl. inside the first hash window of a block)
    g2[100:130] = 4
    g2[30000:30007] = 4
    g2[-40:] = 4
    for g in (g1, g2):
        want = F.create_features_genome(g, threads)
        got = NE.build_features_native(g, threads)
        assert got is not None and got.shape == want.shape
        assert np.array_equal(got, want)
    want_ix = DI.build_dindex([g1, g2], threads_emul=threads)
    nat = NE.build_dindex_native([g1, g2], DI.DEFAULT_SPAN, DI.DEFAULT_WEIGHT,
                                 DI.DEFAULT_MIN_STEP, DI.DEFAULT_MAX_STEP,
                                 DI.DEFAULT_OMIT_BLOCK, threads)
    assert nat is not None
    dirp, hs, nz = nat
    assert np.array_equal(dirp.astype(np.int64), np.asarray(want_ix.dir, dtype=np.int64))
    assert np.array_equal(hs, want_ix.hs)
    # the non-empty-bucket bitmap must agree with the dir table
    assert np.array_equal(nz, want_ix.ensure_nz())


def test_native_alg1_matches_python(tmp_path):
    """-c 0 (alg 1) path: native vs python (both may differ from the
    reference — tracked separately — but must agree with each other)."""
    rng = np.random.default_rng(7)
    genomes = [rng.integers(0, 4, 120000).astype(np.uint8)]
    reads = DT.simulate(rng, genomes, 12)
    g_fa = str(tmp_path / "g.fa")
    seqio.write_fasta(g_fa, ["g0 x"], genomes)
    m = Mapper([g_fa], MapperConfig(gap_len=0, apx_chain_flag=0, threads=16))
    m.prepare()
    ne = NE.NativeEngine(
        m.genomes, [f.arr for f in m.f2], m.index, m.genome_ids,
        thd_DI=m.cfg.thd_DI, thd_X=m.cfg.thd_X, gap_len_min=0,
        f_dup=0, f_chain=0, sequence_sam=0, reform_ccs=0)
    for k, read in enumerate(reads):
        cs_py, ce_py, _ = m.map_read(read)
        sam_py, _ = m.read_output(read, f"r{k}", cs_py, ce_py)
        cs_n, ce_n, sam_n = ne.map_read(read, f"r{k}")
        assert [int(c) for c in cs_n] == [int(c) & ((1 << 64) - 1) for c in cs_py]
        assert sam_n == sam_py
