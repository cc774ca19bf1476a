"""cxxsort: the Python introsort replica must match native std::sort
permutations exactly (including tie-group order), across sizes that
exercise insertion sort (<16), quicksort, and the heapsort depth cap."""
import numpy as np
import pytest

from linear_tpu.utils import cxxsort


def _native_available():
    return cxxsort._lib() is not None


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
@pytest.mark.parametrize("n", [0, 1, 2, 5, 15, 16, 17, 33, 100, 1000, 5000])
@pytest.mark.parametrize("desc", [False, True])
@pytest.mark.parametrize("dup", [1, 3, 1000000])
def test_perm_matches_native(n, desc, dup):
    rng = np.random.default_rng(n * 7 + desc * 3 + dup)
    # dup controls tie density: keys drawn from a small range make big ties
    hi = max(1, n // dup) if dup > 1 else (1 << 40)
    keys = rng.integers(0, max(hi, 1), n)
    pn = cxxsort.std_sort_perm(keys, desc=desc)
    pp = cxxsort.std_sort_perm(keys, desc=desc, force_py=True)
    assert pn.tolist() == pp.tolist()


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
def test_adversarial_patterns():
    for desc in (False, True):
        for keys in (
            np.zeros(257, dtype=np.int64),                     # all equal
            np.arange(300)[::-1].copy(),                       # reverse sorted
            np.arange(300),                                    # sorted
            np.tile([5, 5, 1, 9, 9, 9], 50),                   # periodic ties
            np.concatenate([np.zeros(200), np.arange(57)]),    # half ties
        ):
            pn = cxxsort.std_sort_perm(keys, desc=desc)
            pp = cxxsort.std_sort_perm(keys, desc=desc, force_py=True)
            assert pn.tolist() == pp.tolist()


def test_sorted_values_correct():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, 500)
    out = [keys[int(i)] for i in cxxsort.std_sort_perm(keys)]
    assert out == sorted(keys.tolist())
    out = [keys[int(i)] for i in cxxsort.std_sort_perm(keys, desc=True)]
    assert out == sorted(keys.tolist(), reverse=True)
