"""std::sort-exact sorting (permutation-identical to libstdc++).

The reference's output on repeat-rich inputs depends on the unstable
permutation std::sort applies to equal-key runs (anchors by anchor-x
desc, src/pmpfinder.cpp:2465; block pointers by cord-x desc,
src/cluster_util.cpp:558; chain-tree ranks by score desc,
src/cluster_util.cpp:269; block starts by strand-adjusted y,
src/cluster_util.cpp:945; and the gap module's anchor-x sorts).  A stable
sort silently picks a different repeat copy on ties, so every such call
site must route through here.

Fast path: the native lt_sort library sorts an index array with the very
same libstdc++ std::sort and a keys[a] OP keys[b] comparator — the swap
sequence (hence the tie permutation) is identical to the reference's
element sort because std::sort is comparison-based and the comparators
coincide.  Fallback: a statement-level Python replica of libstdc++
introsort (__sort in bits/stl_algo.h: median-of-3 quicksort, depth-capped
heapsort, final insertion sort), property-tested against the native path.
"""
from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

_S_THRESHOLD = 16


def _lg(n: int) -> int:
    return n.bit_length() - 1


# --------------------------------------------------------- python replica
# Exact transliteration of libstdc++ bits/stl_algo.h __sort machinery;
# operates on a Python list `a` of keys, mirroring swaps into `idx`.

def _insertion_sort(a, idx, first, last, less):
    if first == last:
        return
    for i in range(first + 1, last):
        if less(a[i], a[first]):
            v, vi = a[i], idx[i]
            a[first + 1 : i + 1] = a[first:i]
            idx[first + 1 : i + 1] = idx[first:i]
            a[first], idx[first] = v, vi
        else:
            v, vi = a[i], idx[i]
            nxt = i - 1
            while less(v, a[nxt]):
                a[nxt + 1], idx[nxt + 1] = a[nxt], idx[nxt]
                nxt -= 1
            a[nxt + 1], idx[nxt + 1] = v, vi


def _unguarded_insertion_sort(a, idx, first, last, less):
    for i in range(first, last):
        v, vi = a[i], idx[i]
        nxt = i - 1
        while less(v, a[nxt]):
            a[nxt + 1], idx[nxt + 1] = a[nxt], idx[nxt]
            nxt -= 1
        a[nxt + 1], idx[nxt + 1] = v, vi


def _final_insertion_sort(a, idx, first, last, less):
    if last - first > _S_THRESHOLD:
        _insertion_sort(a, idx, first, first + _S_THRESHOLD, less)
        _unguarded_insertion_sort(a, idx, first + _S_THRESHOLD, last, less)
    else:
        _insertion_sort(a, idx, first, last, less)


def _push_heap(a, idx, first, hole, top, v, vi, less):
    parent = (hole - 1) // 2
    while hole > top and less(a[first + parent], v):
        a[first + hole], idx[first + hole] = a[first + parent], idx[first + parent]
        hole = parent
        parent = (hole - 1) // 2
    a[first + hole], idx[first + hole] = v, vi


def _adjust_heap(a, idx, first, hole, length, v, vi, less):
    top = hole
    second = hole
    while second < (length - 1) // 2:
        second = 2 * (second + 1)
        if less(a[first + second], a[first + second - 1]):
            second -= 1
        a[first + hole], idx[first + hole] = a[first + second], idx[first + second]
        hole = second
    if (length & 1) == 0 and second == (length - 2) // 2:
        second = 2 * (second + 1)
        a[first + hole], idx[first + hole] = a[first + second - 1], idx[first + second - 1]
        hole = second - 1
    _push_heap(a, idx, first, hole, top, v, vi, less)


def _make_heap(a, idx, first, last, less):
    length = last - first
    if length < 2:
        return
    parent = (length - 2) // 2
    while True:
        v, vi = a[first + parent], idx[first + parent]
        _adjust_heap(a, idx, first, parent, length, v, vi, less)
        if parent == 0:
            return
        parent -= 1


def _pop_heap(a, idx, first, last, result, less):
    v, vi = a[result], idx[result]
    a[result], idx[result] = a[first], idx[first]
    _adjust_heap(a, idx, first, 0, last - first, v, vi, less)


def _sort_heap(a, idx, first, last, less):
    while last - first > 1:
        last -= 1
        _pop_heap(a, idx, first, last, last, less)


def _heap_sort_range(a, idx, first, last, less):
    # std::__partial_sort(first, last, last): heap_select + sort_heap
    _make_heap(a, idx, first, last, less)
    _sort_heap(a, idx, first, last, less)


def _move_median_to_first(a, idx, result, i1, i2, i3, less):
    if less(a[i1], a[i2]):
        if less(a[i2], a[i3]):
            a[result], a[i2] = a[i2], a[result]
            idx[result], idx[i2] = idx[i2], idx[result]
        elif less(a[i1], a[i3]):
            a[result], a[i3] = a[i3], a[result]
            idx[result], idx[i3] = idx[i3], idx[result]
        else:
            a[result], a[i1] = a[i1], a[result]
            idx[result], idx[i1] = idx[i1], idx[result]
    elif less(a[i1], a[i3]):
        a[result], a[i1] = a[i1], a[result]
        idx[result], idx[i1] = idx[i1], idx[result]
    elif less(a[i2], a[i3]):
        a[result], a[i3] = a[i3], a[result]
        idx[result], idx[i3] = idx[i3], idx[result]
    else:
        a[result], a[i2] = a[i2], a[result]
        idx[result], idx[i2] = idx[i2], idx[result]


def _unguarded_partition(a, idx, first, last, pivot, less):
    while True:
        while less(a[first], a[pivot]):
            first += 1
        last -= 1
        while less(a[pivot], a[last]):
            last -= 1
        if not first < last:
            return first
        a[first], a[last] = a[last], a[first]
        idx[first], idx[last] = idx[last], idx[first]
        first += 1


def _introsort_loop(a, idx, first, last, depth, less):
    while last - first > _S_THRESHOLD:
        if depth == 0:
            _heap_sort_range(a, idx, first, last, less)
            return
        depth -= 1
        mid = first + (last - first) // 2
        _move_median_to_first(a, idx, first, first + 1, mid, last - 1, less)
        cut = _unguarded_partition(a, idx, first + 1, last, first, less)
        _introsort_loop(a, idx, cut, last, depth, less)
        last = cut


def _py_sort_perm(keys: List[int], desc: bool) -> List[int]:
    n = len(keys)
    idx = list(range(n))
    if n < 2:
        return idx
    a = list(keys)
    less = (lambda x, y: x > y) if desc else (lambda x, y: x < y)
    _introsort_loop(a, idx, 0, n, 2 * _lg(n), less)
    _final_insertion_sort(a, idx, 0, n, less)
    return idx


# --------------------------------------------------------------- native
_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        import ctypes

        from ..native import load

        lib = load("lt_sort")
        if lib is not None:
            lib.lt_sort_idx_i64.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.lt_sort_idx_i64.restype = None
        _LIB = lib
    return _LIB


def std_sort_perm(keys, desc: bool = False, force_py: bool = False) -> np.ndarray:
    """The permutation libstdc++ std::sort applies when sorting elements
    whose comparator reduces to keys[a] < keys[b] (or > for desc).
    Returns int64 indices; apply as [elements[i] for i in perm]."""
    karr = np.ascontiguousarray(keys, dtype=np.int64)
    n = len(karr)
    lib = None if force_py else _lib()
    if lib is not None:
        import ctypes

        idx = np.arange(n, dtype=np.int64)
        lib.lt_sort_idx_i64(
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            karr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            1 if desc else 0,
        )
        return idx
    return np.array(_py_sort_perm(karr.tolist(), desc), dtype=np.int64)


def std_sort(items: Sequence, keys, desc: bool = False) -> list:
    """std::sort-permuted copy of items (keys = precomputed comparator
    keys, one per item)."""
    perm = std_sort_perm(keys, desc)
    return [items[int(i)] for i in perm]
