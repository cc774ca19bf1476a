"""Features: vectorized scripts vs a direct per-window counting oracle."""
import numpy as np
import pytest

from linear_tpu.ops import features as F


def rand_seq(n, seed=0, n_frac=0.0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 4, n).astype(np.uint8)
    if n_frac:
        s[rng.random(n) < n_frac] = 4
    return s


def oracle_script(seq, start):
    """Count 2-mers of the 48 bases at `start` exactly as add2merInt96."""
    val = [0, 0, 0]
    b = np.concatenate([seq.astype(np.int64), [0]])
    for j in range(start, start + 48):
        ordv = b[j] * 5 + b[j + 1]
        u = F._UNITS[ordv]
        i, bit = u >> 8, u & 255
        val[i] = (val[i] + ((1 << bit) & F._INFI_MASK30)) & 0xFFFFFFFF
    return np.array(val, dtype=np.uint32).astype(np.int32)


@pytest.mark.parametrize("n,seed", [(200, 0), (256, 1), (211, 2)])
def test_create_features_oracle(n, seed):
    seq = rand_seq(n, seed, n_frac=0.03)
    f = F.create_features(seq)
    assert len(f) == F.n_scripts(n)
    for i in range(len(f)):
        np.testing.assert_array_equal(f[i], oracle_script(seq, 16 * i), err_msg=str(i))


def test_script_dist_abs_lane_diff():
    rng = np.random.default_rng(3)
    # build two scripts with known lane values (< 32 per lane)
    def pack(lanes):
        out = [0, 0, 0]
        for t in range(3):
            for k in range(5):
                out[t] |= int(lanes[t * 5 + k]) << (6 * k)
        return np.array(out, dtype=np.int32)

    l1 = rng.integers(0, 31, 15)
    l2 = rng.integers(0, 31, 15)
    d = F.script_dist(pack(l1), pack(l2))
    assert d == np.abs(l1 - l2).sum()


def test_window_dist_two_scripts():
    seq1 = rand_seq(300, 5)
    seq2 = rand_seq(300, 6)
    f1 = F.create_features(seq1)
    f2 = F.create_features(seq2)
    a, b = np.array([2]), np.array([4])
    d = F.window_dist(f1, f2, a, b)
    expect = F.script_dist(f1[2], f2[4]) + F.script_dist(f1[5], f2[7])
    assert d[0] == expect
    # identical windows -> 0
    assert F.window_dist(f1, f1, a, a)[0] == 0
