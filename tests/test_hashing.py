"""Hashing: the vectorized closed forms must equal the exact scalar oracle."""
import numpy as np
import pytest

from linear_tpu.ops import hashing as H

SPAN = 21
WEIGHT = 13


def rand_seq(n, seed=0, n_frac=0.0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 4, n).astype(np.uint8)
    if n_frac > 0:
        mask = rng.random(n) < n_frac
        s[mask] = 4
    return s


def oracle_genome_stream(seq, t_str, t_end, span=SPAN):
    st = H.HashStream(span)
    st.init(seq, t_str)
    hs, crhs, xs = [], [], []
    for j in range(t_str, t_end):
        st.nexth(seq, j)
        hs.append(st.h)
        crhs.append(st.crh)
        xs.append(st.x)
    return np.array(hs, np.uint64), np.array(crhs, np.uint64), np.array(xs, np.int64)


def oracle_read_stream(seq, read_str, read_end, span=SPAN):
    st = H.HashStream(span)
    st.init(seq, 0)
    hs, crhs, xs = [], [], []
    for j in range(read_str + span, read_end - span):
        st.nexth(seq, j)
        hs.append(st.h)
        crhs.append(st.crh)
        xs.append(st.x)
    return np.array(hs, np.uint64), np.array(crhs, np.uint64), np.array(xs, np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_genome_stream_matches_oracle(seed):
    seq = rand_seq(800, seed)
    t_str, t_end = SPAN, len(seq) - SPAN
    sh = H.genome_stream_hashes(seq, t_str, t_end, SPAN)
    h0, crh0, x0 = oracle_genome_stream(seq, t_str, t_end)
    np.testing.assert_array_equal(sh.h, h0)
    np.testing.assert_array_equal(sh.crh, crh0)
    np.testing.assert_array_equal(sh.x, x0)


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("read_str", [0, 37])
def test_read_stream_matches_oracle(seed, read_str):
    seq = rand_seq(600, seed)
    read_end = len(seq)
    sh = H.read_stream_hashes(seq, read_str, read_end, SPAN)
    h0, crh0, x0 = oracle_read_stream(seq, read_str, read_end)
    np.testing.assert_array_equal(sh.h, h0)
    np.testing.assert_array_equal(sh.crh, crh0)
    np.testing.assert_array_equal(sh.x, x0)


@pytest.mark.parametrize("n_frac", [0.01, 0.05])
def test_genome_stream_with_n_patched(n_frac):
    seq = rand_seq(1200, 7, n_frac)
    seq[:2 * SPAN] = rand_seq(2 * SPAN, 8)  # keep init window N-free
    t_str, t_end = SPAN, len(seq) - SPAN
    sh = H.genome_stream_hashes(seq, t_str, t_end, SPAN)
    H.patch_n_neighborhoods(seq, sh, SPAN, "genome")
    h0, crh0, x0 = oracle_genome_stream(seq, t_str, t_end)
    np.testing.assert_array_equal(sh.h, h0)
    np.testing.assert_array_equal(sh.crh, crh0)
    np.testing.assert_array_equal(sh.x, x0)


def test_read_stream_with_n_patched():
    seq = rand_seq(900, 11, 0.02)
    seq[: 2 * SPAN] = rand_seq(2 * SPAN, 12)
    sh = H.read_stream_hashes(seq, 0, len(seq), SPAN)
    H.patch_n_neighborhoods(seq, sh, SPAN, "read")
    h0, crh0, x0 = oracle_read_stream(seq, 0, len(seq))
    np.testing.assert_array_equal(sh.h, h0)
    np.testing.assert_array_equal(sh.crh, crh0)
    np.testing.assert_array_equal(sh.x, x0)


def test_init_window_n_full_reroll():
    seq = rand_seq(500, 13)
    seq[5] = 4  # N inside the init window -> permanent x bias path
    sh = H.genome_stream_hashes(seq, SPAN, len(seq) - SPAN, SPAN)
    H.patch_n_neighborhoods(seq, sh, SPAN, "genome")
    h0, crh0, x0 = oracle_genome_stream(seq, SPAN, len(seq) - SPAN)
    np.testing.assert_array_equal(sh.h, h0)
    np.testing.assert_array_equal(sh.x, x0)


def test_minimizer_matches_oracle():
    seq = rand_seq(700, 21)
    t_str, t_end = SPAN, len(seq) - SPAN
    sh = H.genome_stream_hashes(seq, t_str, t_end, SPAN)
    xv, yv, strand = H.minimizer_xy(seq, sh.j, sh.h, sh.crh, sh.x, SPAN, WEIGHT)
    st = H.HashStream(SPAN, WEIGHT)
    st.init(seq, t_str)
    for i, j in enumerate(range(t_str, t_end)):
        st.nexth(seq, j)
        st.nextx(seq, j)
        assert xv[i] == st.xval, (i, j)
        assert yv[i] == st.yval, (i, j)
        assert strand[i] == st.strand, (i, j)


def test_emit_mask_rule():
    # stride 9, max_step 10 -> within an equal-X run emit every 2nd sample
    x = np.array([5, 5, 5, 5, 7, 7, 5, 9, 9, 9])
    m = H.emit_mask_index(x, 9, 10)
    np.testing.assert_array_equal(
        m, [True, False, True, False, True, False, True, True, False, True]
    )
    # oracle: sequential emulation
    prev, last_j, out = None, -10**9, []
    for s, xv in enumerate(x.tolist()):
        j = s * 9
        if prev != xv or j - last_j > 10:
            out.append(True)
            prev, last_j = xv, j
        else:
            out.append(False)
    np.testing.assert_array_equal(m, out)


def test_dedup_mask_query():
    x = np.array([0, 3, 3, 4, 0, 0, 4])
    np.testing.assert_array_equal(
        H.dedup_mask_query(x), [False, True, False, True, True, False, True]
    )
