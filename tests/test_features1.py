"""Unit tests for the legacy type-1 (1_16/1_32) feature scripts
(src/pmpfinder.cpp:330-483) and their window distances."""
import numpy as np

from linear_tpu.ops import features as F
from linear_tpu.map import pmpfinder as PMP


def brute_1_32(seq):
    cnt = [1, 32, 1024, 0, 0]
    L = len(seq)
    starts = [0] + list(range(16, L - 32, 16))
    return [sum(cnt[int(b)] for b in seq[s: s + 32]) for s in starts]


def brute_1_16(seq):
    cnt = [1, 32, 1024, 0, 0]
    L = len(seq)
    return [sum(cnt[int(b)] for b in seq[s: s + 16])
            for s in range(0, L - 16, 16)]


def test_builders_match_bruteforce():
    rng = np.random.default_rng(7)
    for L in (33, 48, 64, 100, 333, 1000):
        seq = rng.integers(0, 5, L).astype(np.uint8)
        v32, n32 = F.feats1_parts(seq, 1)
        assert n32 == ((L - 32) >> 4) + 1
        assert [int(x) for x in v32] == brute_1_32(seq)
        v16, n16 = F.feats1_parts(seq, 0)
        assert n16 == ((L - 16) >> 4) + 1
        assert [int(x) for x in v16] == brute_1_16(seq)
        # padded builders agree on the filled prefix, zero elsewhere
        a32 = F.create_features_1_32_serial(seq)
        assert len(a32) == n32
        assert (a32[: len(v32)] == v32).all() and (a32[len(v32):] == 0).all()


def test_parallel_1_16_thread_chunk_zero_slots():
    """The reference's threaded 1_16 builder leaves the last script of each
    thread chunk uninitialized (loop bound thd_end - window,
    src/pmpfinder.cpp:470); large fresh allocations read as 0."""
    rng = np.random.default_rng(8)
    seq = rng.integers(0, 4, 3210).astype(np.uint8)
    f = F.create_features_1_16_parallel(seq, threads=4)
    rng_n = (len(seq) - 32) // 16
    # per-thread chunks: rng_n split as parallelParm_Static does
    chunk, rem = divmod(rng_n, 4)
    sizes = [chunk + 1 if t < rem else chunk for t in range(4)]
    pos = 0
    serial = brute_1_16(seq)
    for sz in sizes:
        for i in range(pos, pos + sz - 1):
            assert int(f[i]) == serial[i]
        assert int(f[pos + sz - 1]) == 0  # uninitialized slot
        pos += sz


def test_script_dist16_3_int16_semantics():
    # overflowed lanes behave like C++ short (arithmetic >> on negatives)
    assert F.script_dist16_3(0, 0) == 0
    s1 = np.int16(31744 + 992 + 31)  # 31 per segment
    assert F.script_dist16_3(int(s1), 0) == 93
    neg = np.int16(-32768)
    assert F.script_dist16_3(int(neg), 0) == abs(int(neg) >> 10)


def test_feat_buf_stale_semantics():
    # long read then short read: tail [n_short, n_long) keeps old values
    buf = PMP.FeatBuf()
    f_long = buf.update(np.arange(1, 101, dtype=np.int16), 100)
    f_short = buf.update(np.full(50, -7, dtype=np.int16), 50)
    assert f_short.n_len == 50
    assert int(f_short.arr[50]) == 51  # stale from the long read
    # growth clears beyond the copied prefix (fresh memory modeled as 0)
    f_grow = buf.update(np.full(200, 3, dtype=np.int16), 200)
    assert int(f_grow.arr[250]) == 0
