"""Banded alignment Pallas kernel vs the dense numpy oracle."""
import numpy as np
import pytest

from linear_tpu.ops import align_pallas as AP


def _mutate(seq, rng, err=0.1):
    out = []
    for c in seq:
        x = rng.random()
        if x < err * 0.4:
            out.append(int(rng.integers(0, 4)))
        elif x < err * 0.7:
            out.append(int(rng.integers(0, 4)))
            out.append(int(c))
        elif x < err:
            continue
        else:
            out.append(int(c))
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("W", [64, 128])
def test_kernel_matches_oracle(W):
    rng = np.random.default_rng(17)
    qry, ref = [], []
    for i in range(9):
        base = rng.integers(0, 4, int(rng.integers(50, 400))).astype(np.uint8)
        q = _mutate(base, rng)
        r = base.copy()
        if i % 3 == 1:  # unrelated pair (negative-ish scores exercised)
            r = rng.integers(0, 4, len(base)).astype(np.uint8)
        if i % 4 == 2:  # length-skewed pair (end gaps + band edge)
            r = np.concatenate([rng.integers(0, 4, 70).astype(np.uint8), r])
        qry.append(q)
        ref.append(r)
    qry.append(np.zeros(0, dtype=np.uint8))   # empty query
    ref.append(rng.integers(0, 4, 30).astype(np.uint8))
    got = AP.banded_align_scores(qry, ref, W=W)
    for i, (q, r) in enumerate(zip(qry, ref)):
        exp = AP.banded_align_oracle(q, r, W=W)
        assert got[i] == exp, (i, got[i], exp)


def test_cigar_traceback_consistent():
    """Host traceback: score equals the kernel/oracle; the CIGAR replays
    to exactly that score over the reported spans."""
    rng = np.random.default_rng(23)
    for trial in range(6):
        base = rng.integers(0, 4, int(rng.integers(60, 300))).astype(np.uint8)
        q = _mutate(base, rng)
        r = base
        score, cig, (q0, q1), (r0, r1) = AP.banded_align_cigar(q, r, W=64)
        assert score == AP.banded_align_oracle(q, r, W=64)
        # replay
        import re as _re
        i, j, s = q0, r0, 0
        for cnt, op in _re.findall(r"(\d+)([=XID])", cig):
            cnt = int(cnt)
            if op in "=X":
                for _ in range(cnt):
                    s += AP.S_MATCH if q[i] == r[j] else AP.S_MISMATCH
                    assert (q[i] == r[j]) == (op == "="), (i, j, op)
                    i += 1
                    j += 1
            elif op == "I":
                s += AP.S_GAP * cnt
                i += cnt
            else:
                s += AP.S_GAP * cnt
                j += cnt
        assert (i, j) == (q1, r1)
        assert s == score, (s, score)
