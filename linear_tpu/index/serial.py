"""Index serialization (--save-index / --load-index).

The reference rebuilds its index every run (no serialization exists,
SURVEY §5 "Checkpoint/resume"); this is a framework feature on top. The
DIndex's dense dir table (4^13+1 int32 = 268 MB) is stored SPARSELY —
non-empty bucket ids + counts (a few MB for bacterial genomes) — and
reconstructed with one prefix sum at load, so files stay small and load
time is dominated by a single cumsum pass instead of 268 MB of IO.

Format: numpy .npz with a `kind` field ("dindex" | "hindex") + the
parameters that must match the run's config (span/weight; callers are
responsible for corpus identity, exactly like samtools .fai etc.).
"""
from __future__ import annotations

import numpy as np

from .dindex import DIndex
from .hindex import HIndex


def save_index(path: str, index) -> None:
    if isinstance(index, DIndex):
        counts = np.diff(index.dir).astype(np.int32)
        nz = np.flatnonzero(counts)
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 kind="dindex", span=index.span, weight=index.weight,
                 n_dir=np.int64(index.dir.shape[0]),
                 nz_x=nz.astype(np.int64), nz_cnt=counts[nz],
                 hs=index.hs)
        return
    if isinstance(index, HIndex):
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 kind="hindex", span=index.span, weight=index.weight,
                 ysa=index.ysa, xs_val1=index.xs_val1, xs_val2=index.xs_val2,
                 xs_mask=np.int64(index.xs_mask),
                 empty_dir=np.int64(index.empty_dir))
        return
    raise TypeError(f"unsupported index type {type(index)!r}")


def load_index(path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    kind = str(z["kind"])
    if kind == "dindex":
        n_dir = int(z["n_dir"])
        counts = np.zeros(n_dir, dtype=np.int64)
        counts[z["nz_x"] + 1] = z["nz_cnt"]
        dirp = np.cumsum(counts).astype(np.int32)
        return DIndex(span=int(z["span"]), weight=int(z["weight"]),
                      dir=dirp, hs=z["hs"])
    if kind == "hindex":
        return HIndex(span=int(z["span"]), weight=int(z["weight"]),
                      ysa=z["ysa"], xs_val1=z["xs_val1"], xs_val2=z["xs_val2"],
                      xs_mask=int(z["xs_mask"]), empty_dir=int(z["empty_dir"]))
    raise ValueError(f"unknown index kind {kind!r} in {path}")
