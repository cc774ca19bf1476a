"""Multi-chip mapping: reads data-parallel over a device mesh.

The reference is single-node OpenMP (SURVEY §2.3); the TPU-native scaling
axes are:
  - dp: read batches sharded across chips (this module) — the analog of the
    reference's omp-for over reads (src/mapper.cpp:796).
  - index sharding across hosts for >HBM genomes (k-mer table shards +
    all_gather of per-shard anchor candidates) — planned in round 2; the
    E. coli/human DIndex fits a single v5e HBM so dp is the production axis.

`mapping_step` is the jittable device portion of the per-read pipeline
(seed -> anchors -> sort -> chain DP); under a Mesh it is sharded so each
chip processes its slice of the batch with the index replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import configure as _jaxcfg
_jaxcfg()
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.chain_dp import batch_chain_dp, batch_chain_dp_windowed, _anchor_x
from ..ops.seeding import batch_seed_anchors, batch_seed_anchors_fast


@partial(jax.jit, static_argnames=("cap", "n_max", "thd_alpha", "fast"))
def mapping_step(seqs: jnp.ndarray, lens: jnp.ndarray,
                 dir_start: jnp.ndarray, hs_lo: jnp.ndarray, hs_hi: jnp.ndarray,
                 cap: int = 8, n_max: int = 256, thd_alpha: int = 15,
                 fast: bool = False):
    """Device mapping step: seed anchors, sort descending by anchor-x, run
    the chaining DP. Returns (anchors_sorted, n_anchors, p2, score, length).
    fast=True uses the closed-form seeding (exact for N-free batches; the
    caller checks for N bases and falls back to the exact scan kernel).
    """
    seeder = batch_seed_anchors_fast if fast else batch_seed_anchors
    anc, keep = seeder(seqs, lens, dir_start, hs_lo, hs_hi,
                       thd_alpha=thd_alpha, cap=cap)
    B = anc.shape[0]
    flat = anc.reshape(B, -1)
    kflat = keep.reshape(B, -1)
    n_anchors = jnp.minimum(jnp.sum(kflat, axis=1), n_max).astype(jnp.int32)
    ax = _anchor_x(flat)
    # invalid anchors sort to the end: key = (-valid, -ax)
    key = jnp.where(kflat, -ax, jnp.int64(1) << 62)
    order = jnp.argsort(key, axis=1)[:, :n_max]
    sorted_anc = jnp.take_along_axis(flat, order, axis=1)
    p2, score, length, overflow = batch_chain_dp_windowed(sorted_anc, n_anchors, W=64)
    return sorted_anc, n_anchors, p2, score, length, overflow


def make_dp_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def sharded_mapping_step(mesh: Mesh, seqs, lens, dir_start, hs_lo, hs_hi,
                         cap: int = 8, n_max: int = 256):
    """Run mapping_step with the read batch sharded over the mesh's dp axis
    and the index replicated on every chip (lookup tables ride HBM locally;
    no collectives needed until index sharding lands)."""
    dp = NamedSharding(mesh, P("dp"))
    dp2 = NamedSharding(mesh, P("dp", None))
    rep = NamedSharding(mesh, P())
    seqs = jax.device_put(seqs, dp2)
    lens = jax.device_put(lens, dp)
    dir_start = jax.device_put(dir_start, rep)
    hs_lo = jax.device_put(hs_lo, rep)
    hs_hi = jax.device_put(hs_hi, rep)
    return mapping_step(seqs, lens, dir_start, hs_lo, hs_hi, cap=cap, n_max=n_max)
