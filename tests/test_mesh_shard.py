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


def test_grid_mapping_step_equals_single_device(world):
    """2D (dp, ix) grid: sharded seed + psum merge + dp-sharded chain DP
    must equal the single-device mapping_step (fast seeder)."""
    import jax
    import jax.numpy as jnp

    from linear_tpu.parallel import mesh as MS

    idx, dev, seqs, lens = world
    n_dp, n_ix = 4, 2
    gmesh = MS.make_grid_mesh(n_dp, n_ix, jax.devices()[: n_dp * n_ix])
    dir_sh, lo_sh, hi_sh, xb, cap = MS.shard_index_by_xval(idx, n_ix)
    gout = MS.grid_mapping_step(gmesh, jnp.asarray(seqs), jnp.asarray(lens),
                                dir_sh, lo_sh, hi_sh, xb, cap, n_max=32)
    ref = MS.mapping_step(jnp.asarray(seqs), jnp.asarray(lens),
                          dev.dir_start, dev.hs_lo, dev.hs_hi,
                          cap=dev.cap, n_max=32, fast=True)
    n_g, n_r = np.asarray(gout[1]), np.asarray(ref[1])
    assert (n_g == n_r).all()
    msk = np.arange(32)[None, :] < n_r[:, None]
    for g, r in zip(gout[:1] + gout[2:], ref[:1] + ref[2:]):
        ga, ra = np.asarray(g), np.asarray(r)
        if ga.ndim == 2:
            ga = np.where(msk[:, : ga.shape[1]], ga, 0)
            ra = np.where(msk[:, : ra.shape[1]], ra, 0)
        assert (ga == ra).all()


def test_sharded_extend_equals_single_device(world):
    """dp-sharded dense-window extension (ops.extend_dev) must equal the
    single-device kernel."""
    import jax
    import jax.numpy as jnp

    from linear_tpu.ops import extend_dev as ED
    from linear_tpu.ops import features as FE
    from linear_tpu.parallel import mesh as MS
    from linear_tpu.utils.cordscalar import FLAG_END, make_cord, set_end

    idx, dev, seqs, lens = world
    rng = np.random.default_rng(11)
    g = rng.integers(0, 4, 20000).astype(np.uint8)  # same genome as world
    gf = ED.upload_genome_feats([FE.create_features_genome(g, 4)])
    B, pad, H = 8, 1024, 32
    C = H + pad // 32
    R = ((pad - 48) >> 4) + 1
    seqs2 = np.zeros((B, pad), dtype=np.uint8)
    lens2 = np.zeros((B,), dtype=np.int64)
    hitm = np.zeros((B, H), dtype=np.uint64)
    hitn = np.zeros((B,), dtype=np.int32)
    for i in range(B):
        pos = int(rng.integers(0, len(g) - 900))
        r = g[pos: pos + 800]
        seqs2[i, : len(r)] = r
        lens2[i] = len(r)
        hs = [FLAG_END]
        for k in range(0, 600, 192):
            hs.append(make_cord(0, pos + k, k, 0))
        hs[-1] = set_end(hs[-1])
        hitm[i, : len(hs)] = np.array(hs, dtype=np.uint64)
        hitn[i] = len(hs)
    s4 = seqs2.reshape(B, -1, 4).astype(np.uint16)
    packed = (s4[:, :, 0] | (s4[:, :, 1] << 2) | (s4[:, :, 2] << 4)
              | (s4[:, :, 3] << 6)).astype(np.uint8)
    args = (jnp.asarray(packed), jnp.asarray(lens2),
            jnp.asarray(hitm.view(np.int64)), jnp.asarray(hitn))
    mi = 4 * H + 2 * C + 16
    ref = ED.batch_filter_extend_packed(*args, gf.cat, gf.off, gf.rows,
                                        H=H, C=C, R=R, max_iter=mi)
    mesh = MS.make_dp_mesh(jax.devices()[:8])
    sh = MS.sharded_extend_step(mesh, *args, gf, H=H, C=C, R=R, max_iter=mi)
    for a, b in zip(sh, ref):
        assert (np.asarray(a) == np.asarray(b)).all()
