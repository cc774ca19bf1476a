"""Index sharding across a device mesh: per-shard probe + psum merge must
equal the replicated seed kernel bit-for-bit (SURVEY §2.3 index-sharding
axis; the >HBM-genome scaling path)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def world():
    from linear_tpu.index import dindex as DI
    from linear_tpu.ops import seeding as SD

    rng = np.random.default_rng(11)
    g = rng.integers(0, 4, 20000).astype(np.uint8)
    idx = DI.build_dindex([g], threads_emul=4)
    dev = SD.upload_index(idx)
    B, L = 4, 512
    seqs = np.zeros((B, L), np.int32)
    lens = np.zeros((B,), np.int64)
    for i in range(B):
        r = g[i * 500: i * 500 + 450]
        seqs[i, : len(r)] = r
        lens[i] = len(r)
    return idx, dev, seqs, lens


@pytest.mark.parametrize("n_shards", [8])
def test_index_sharded_seed_equals_replicated(world, n_shards):
    import jax
    import jax.numpy as jnp

    from linear_tpu.ops import seeding as SD
    from linear_tpu.parallel import mesh as MS

    idx, dev, seqs, lens = world
    anc_ref, keep_ref = SD.batch_seed_anchors_fast(
        jnp.asarray(seqs), jnp.asarray(lens),
        dev.dir_start, dev.hs_lo, dev.hs_hi, cap=dev.cap)
    m = MS.Mesh(np.array(jax.devices()[:n_shards]), ("ix",))
    dir_sh, lo_sh, hi_sh, xb, cap = MS.shard_index_by_xval(idx, n_shards)
    anc_sh, keep_sh = MS.index_sharded_seed_step(
        m, jnp.asarray(seqs), jnp.asarray(lens), dir_sh, lo_sh, hi_sh, xb, cap)
    kr, ks = np.asarray(keep_ref), np.asarray(keep_sh)
    ar, ash = np.asarray(anc_ref), np.asarray(anc_sh)
    assert (kr == ks).all()
    assert (np.where(kr, ar, 0) == np.where(ks, ash, 0)).all()
