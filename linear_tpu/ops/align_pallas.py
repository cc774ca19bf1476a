"""Banded semi-global alignment as a Pallas TPU wavefront kernel.

The reference's optional `-a` path aligns merged cord windows with
SeqAn's banded `globalAlignment(AlignConfig<true,true,true,true>,
-band, band)` and scheme match +3 / mismatch -2 / gap open -1 / gap
extend -1 (src/align_interface.cpp:178-189,498-513) — with open ==
extend the scheme is effectively LINEAR gap -1, and the AlignConfig
means free end-gaps in both sequences (overlap alignment). The option
is commented out of the reference CLI (src/args_parser.cpp:214-219), so
no reference run ever executes it; this module provides the TPU-native
equivalent as a framework feature.

Design (TPU-first): the classic banded DP has a serial in-row
dependency (H[i][j-1]); rewriting the row update as
  M[k]   = max(diag[k] + sub, up[k] - 1)         (vector ops)
  row[k] = max_{t<=k} (M[t] - (k-t))             (decayed prefix max)
makes each row one VPU pass: the decayed prefix max is computed with
log2(width) shift-subtract-max steps. One grid program per sequence
pair; the row vector lives in registers as a fori_loop carry; band
width is static (lanes), sequence length is static padding with
per-pair true lengths masking validity.

Scores are returned per pair (plus argmax end cell); traceback for
CIGAR emission is a host-side recompute of the accepted pairs only (the
reference clips most candidates by score first, src/align_interface.cpp
:1596-2195).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import configure as _jaxcfg

_jaxcfg()

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NEG = -(1 << 28)
S_MATCH = 3      # src/align_interface.cpp:178
S_MISMATCH = -2  # :179
S_GAP = -1       # :180-181 (open == extend -> linear)


def _decayed_prefix_max(m: jnp.ndarray, width: int) -> jnp.ndarray:
    """r[k] = max_{t <= k} (m[t] - (k - t)) via log-shift steps."""
    r = m
    rows = m.shape[0]
    s = 1
    while s < width:
        shifted = jnp.concatenate(
            [jnp.full((rows, s), NEG, r.dtype), r[:, :-s]], axis=1)
        r = jnp.maximum(r, shifted - jnp.int32(s))
        s <<= 1
    return r


def _ba_kernel(sub_ref, nm_ref, out_ref, row_ref, best_ref, *,
               L: int, W: int, KW: int, SB: int):
    """Grid = (pairs/SB, L): the DP row index is the SECOND grid axis —
    TPU grid steps run sequentially per core, so the row vector and the
    running best live in VMEM scratch across steps (init at i == 0, final
    store at i == L-1). sub_ref delivers row i's substitution scores
    (SB, 1, KW) via its BlockSpec, so the kernel needs no dynamic ref
    slicing (loop-var pl.ds inside fori_loop crashes this stack's remote
    Mosaic compiler, and value dynamic_slice has no TPU lowering)."""
    i = pl.program_id(1)  # DP row i+1 consumes a[i] vs b window i
    n = nm_ref[0, :, 0:1]
    m = nm_ref[0, :, 1:2]
    ks = jax.lax.broadcasted_iota(jnp.int32, (SB, KW), 1)
    zero = jnp.int32(0)
    neg = jnp.int32(NEG)

    # i == 0 initialization by select (no pl.when: conditional whole-block
    # writes fail to legalize in some Mosaic stacks); the scratch holds
    # garbage at i == 0 and is masked out here
    j0 = ks - W
    row0 = jnp.where((j0 >= 0) & (j0 <= m), zero, neg)
    prev = jnp.where(i == 0, row0, row_ref[:])
    best = jnp.where(i == 0, zero, best_ref[:, 0:1])
    ii = i + 1
    j = ii + ks - W
    sub = sub_ref[0]
    diag = prev
    up = jnp.concatenate(
        [prev[:, 1:], jnp.full((SB, 1), NEG, prev.dtype)], axis=1)
    mcand = jnp.maximum(diag + sub, up + jnp.int32(S_GAP))
    # j == 0 column is 0 (free begin gap in a); out-of-range j -> NEG
    mcand = jnp.where(j == 0, zero, mcand)
    mcand = jnp.where((j < 0) | (j > m), neg, mcand)
    row = _decayed_prefix_max(mcand, KW)
    row = jnp.where((j < 0) | (j > m), neg, row)
    # free end gaps: best over column j == m (rows i <= n) and row i == n
    colm = jnp.max(jnp.where((j == m) & (ii <= n), row, neg),
                   axis=1, keepdims=True)
    rown = jnp.max(jnp.where(ii == n, row, neg), axis=1, keepdims=True)
    best = jnp.maximum(best, jnp.maximum(colm, rown))
    # rows past n must not evolve (keeps the i == n row exact)
    row = jnp.where(ii <= n, row, prev)
    row_ref[:] = row
    best_ref[:] = jnp.broadcast_to(best, best_ref.shape)
    # out block is the same for every i of this pair: the last write (the
    # final row's best) is what lands. best started at 0 (all-end-gap
    # paths H[0][m] / H[n][0] always exist regardless of the band).
    out_ref[0] = best_ref[:]


SUBBATCH = 8  # pairs per grid program (TPU sublane tile)


@partial(jax.jit, static_argnames=("L", "W", "interpret"))
def _banded_align_call(a, bpad, nm, L: int, W: int, interpret: bool):
    # The package enables jax_enable_x64 (the cord bit formats need u64 on
    # host paths), but under x64 tracing some kernel intermediates become
    # int64 and Mosaic cannot legalize 64-bit vectors ("failed to legalize
    # func.return"); everything here is int32, so trace with x64 off.
    with jax.enable_x64(False):
        return _banded_align_call_x32(a, bpad, nm, L, W, interpret)


def _banded_align_call_x32(a, bpad, nm, L: int, W: int, interpret: bool):
    KW = 2 * W
    B = a.shape[0]
    SB = SUBBATCH
    # substitution tensor in XLA (the kernel reads one row per grid step):
    # sub[b, i, k] = score(a[b, i], bpad[b, i + k])
    wins = jnp.stack([jax.lax.slice(bpad, (0, k), (B, k + L))
                      for k in range(KW)], axis=2)
    sub = jnp.where(wins == a[:, :, None], jnp.int32(S_MATCH),
                    jnp.int32(S_MISMATCH))
    # TPU tiling wants the LAST TWO block dims to be (sublane, lane)
    # shaped, so lay the tensors out 4D/3D with (SB, KW) / (SB, 128) minor
    # 3-D layouts with (sublane, lane) = (SB, KW) / (SB, 128) minor dims;
    # sub rows flattened to the leading dim, block index p * L + i
    sub3 = (sub.reshape(B // SB, SB, L, KW).transpose(0, 2, 1, 3)
            .reshape((B // SB) * L, SB, KW))
    nm3 = nm.reshape(B // SB, SB, 128)
    out = pl.pallas_call(
        partial(_ba_kernel, L=L, W=W, KW=KW, SB=SB),
        grid=(B // SB, L),
        in_specs=[
            pl.BlockSpec((1, SB, KW), lambda p, i: (p * L + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, 128), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SB, 128), lambda p, i: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // SB, SB, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SB, KW), jnp.int32),
            pltpu.VMEM((SB, 128), jnp.int32),
        ],
        interpret=interpret,
    )(sub3, nm3)
    return out.reshape(B, 128)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def banded_align_scores(qry: list, ref: list, W: int = 128,
                        L: int | None = None) -> np.ndarray:
    """Batch of banded overlap alignments: returns int32 scores (B,).

    qry/ref: lists of uint8 code arrays (pairs aligned elementwise).
    W: band half-width (lanes; KW = 2W, band j - i in [-W, W)).
    L: static pad length (defaults to the next multiple of 128)."""
    B0 = len(qry)
    B = -(-B0 // SUBBATCH) * SUBBATCH
    maxlen = max([1] + [max(len(a), len(b)) for a, b in zip(qry, ref)])
    if L is None:
        L = -(-maxlen // 128) * 128
    KW = 2 * W
    a = np.full((B, L), 7, dtype=np.int32)       # 7 never matches
    bpad = np.full((B, L + KW), 9, dtype=np.int32)
    nm = np.zeros((B, 128), dtype=np.int32)
    for i, (q, r) in enumerate(zip(qry, ref)):
        a[i, : len(q)] = q
        bpad[i, W: W + len(r)] = r
        nm[i, 0] = len(q)
        nm[i, 1] = len(r)
    # chunk the batch: the substitution tensor is L*KW*4 bytes per pair
    # (the XLA-side window stack), so bound the per-call footprint
    CHUNK = 64
    outs = []
    interp = not _on_tpu()
    for c0 in range(0, B, CHUNK):
        c1 = min(c0 + CHUNK, B)
        outs.append(np.asarray(_banded_align_call(
            jnp.asarray(a[c0:c1]), jnp.asarray(bpad[c0:c1]),
            jnp.asarray(nm[c0:c1]), L, W, interpret=interp)))
    out = np.concatenate(outs, axis=0)
    return out[:B0, 0]


def banded_align_oracle(q: np.ndarray, r: np.ndarray, W: int = 128) -> int:
    """Reference oracle: dense semi-global banded DP (numpy, O(n*m))."""
    n, m = len(q), len(r)
    if n == 0 or m == 0:
        return 0
    H = np.full((n + 1, m + 1), NEG, dtype=np.int64)
    H[0, : m + 1] = 0
    H[: n + 1, 0] = 0
    for i in range(1, n + 1):
        lo = max(1, i - W)
        hi = min(m, i + W - 1)
        for j in range(lo, hi + 1):
            s = S_MATCH if q[i - 1] == r[j - 1] else S_MISMATCH
            H[i, j] = max(H[i - 1, j - 1] + s, H[i - 1, j] + S_GAP,
                          H[i, j - 1] + S_GAP)
    return int(max(H[n, : m + 1].max(), H[: n + 1, m].max()))


def banded_align_cigar(q: np.ndarray, r: np.ndarray, W: int = 128):
    """Host traceback companion to the device kernel: full banded DP with
    traceback for the (few) pairs whose kernel score passed the caller's
    acceptance filter — the reference clips most candidates by score
    before emitting records (src/align_interface.cpp:1596-2195), so the
    batch score pass runs on device and only survivors pay the O(n*m)
    host traceback. Returns (score, cigar, q_span, r_span) with cigar in
    SAM =/X/I/D ops ('I' consumes query); end gaps are NOT emitted
    (free-end overlap semantics)."""
    n, m = len(q), len(r)
    if n == 0 or m == 0:
        return 0, "", (0, 0), (0, 0)
    H = np.full((n + 1, m + 1), NEG, dtype=np.int64)
    H[0, : m + 1] = 0
    H[: n + 1, 0] = 0
    for i in range(1, n + 1):
        lo = max(1, i - W)
        hi = min(m, i + W - 1)
        if lo > hi:
            continue
        js = np.arange(lo, hi + 1)
        sub = np.where(q[i - 1] == r[lo - 1: hi], S_MATCH, S_MISMATCH)
        diag = H[i - 1, lo - 1: hi] + sub
        up = H[i - 1, lo: hi + 1] + S_GAP
        cand = np.maximum(diag, up)
        # serial left dependency
        row = H[i]
        prev = row[lo - 1]
        for k, j in enumerate(js):
            v = cand[k]
            if prev + S_GAP > v:
                v = prev + S_GAP
            row[j] = v
            prev = v
    # best end cell over last row / last column
    endr = int(np.argmax(H[n, : m + 1]))
    endc = int(np.argmax(H[: n + 1, m]))
    if H[n, endr] >= H[endc, m]:
        i, j = n, endr
    else:
        i, j = endc, m
    score = int(H[i, j])
    qe, re_ = i, j
    ops = []
    while i > 0 and j > 0:
        s_ = S_MATCH if q[i - 1] == r[j - 1] else S_MISMATCH
        if H[i, j] == H[i - 1, j - 1] + s_:
            ops.append("=" if s_ == S_MATCH else "X")
            i -= 1
            j -= 1
        elif H[i, j] == H[i - 1, j] + S_GAP:
            ops.append("I")
            i -= 1
        else:
            ops.append("D")
            j -= 1
    # compress run-length
    ops.reverse()
    cigar = []
    for op in ops:
        if cigar and cigar[-1][1] == op:
            cigar[-1][0] += 1
        else:
            cigar.append([1, op])
    return (score, "".join(f"{c}{o}" for c, o in cigar), (i, qe), (j, re_))
