"""DIndex: sampling rules, build/query recall, and anchor formation."""
import numpy as np

from linear_tpu.index import dindex as D
from linear_tpu.ops import hashing as H
from linear_tpu.utils import cordlib as C
from linear_tpu.utils.seqio import revcomp


def rand_seq(n, seed=0):
    return np.random.default_rng(seed).integers(0, 4, n).astype(np.uint8)


def oracle_sampled(seq, span, weight, min_step, max_step, threads):
    """Sequential emulation of the createDIndex sampling loop (pass 1)."""
    out = []
    for t_str, t_end in D.thread_blocks(len(seq), span, threads):
        if t_end <= t_str:
            continue
        st = H.HashStream(span, weight)
        st.init(seq, t_str)
        count = 0
        pre = None
        last_j = t_str - 1
        for j in range(t_str, t_end):
            st.nexth(seq, j)
            count += 1
            if count > min_step:
                st.nextx(seq, j)
                if pre != st.xval or j - last_j > max_step:
                    out.append((j, st.xval, st.yval, st.strand))
                    pre = st.xval
                    last_j = j
                count = 0
    return out


def test_sampled_minimizers_match_oracle():
    seq = rand_seq(3000, 0)
    for threads in (1, 3):
        j, xv, yv, s = D.sampled_minimizers(seq, 21, 13, 8, 10, threads)
        oracle = oracle_sampled(seq, 21, 13, 8, 10, threads)
        got = list(zip(j.tolist(), xv.tolist(), yv.tolist(), s.tolist()))
        assert got == oracle, f"threads={threads}"


def test_build_query_recall():
    """check_index-style audit: anchors from a read equal to a genome slice
    must include the true diagonal."""
    genome = rand_seq(20000, 1)
    idx = D.build_dindex([genome], threads_emul=1)
    pos = 5000
    read = genome[pos : pos + 2000].copy()
    anchors = D.query_anchors(idx, read, 0, len(read))
    assert len(anchors) > 10
    # forward anchors on the true diagonal: x - y == pos
    diag = C.anchor_x(anchors).astype(np.int64) - C.cord_y(anchors).astype(np.int64)
    frac = np.mean(np.abs(diag - pos) <= 8)
    assert frac > 0.5, f"true-diagonal fraction {frac}"


def test_query_reverse_strand():
    genome = rand_seq(20000, 2)
    idx = D.build_dindex([genome], threads_emul=1)
    pos = 8000
    read = revcomp(genome[pos : pos + 2000])
    anchors = D.query_anchors(idx, read, 0, len(read))
    assert len(anchors) > 10
    strands = C.cord_strand(anchors)
    assert np.mean(strands) > 0.9  # nearly all reverse
    # reverse anchor: y' = read_len-1-k, genome window x = pos+read_len-k-span,
    # so x - y' = pos - span + 1 for every true rc anchor.
    x = C.anchor_x(anchors).astype(np.int64)
    y = C.cord_y(anchors).astype(np.int64)
    diag = x - y
    frac = np.mean(np.abs(diag - (pos - 21 + 1)) <= 8)
    assert frac > 0.5, f"rc diag fraction {frac}"


def test_omit_block():
    # a highly repetitive genome should drop its dominant k-mer buckets
    unit = rand_seq(50, 3)
    genome = np.tile(unit, 1000)  # 50k of pure repeat
    idx = D.build_dindex([genome], threads_emul=1, omit_block=100)
    counts = np.diff(idx.dir)
    assert counts.max() <= 100
