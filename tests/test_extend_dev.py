"""Device dense-window extension (ops/extend_dev) vs the host oracle.

For every read: seeds -> anchor filters -> chain DP -> block chaining give
the pre-filter hits (host oracle, differentially validated elsewhere);
then the device batch kernel (_filterHits + path_dst_2) must produce
bit-identical cords to the host filter_hits + path_dst_2."""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import difftest as DT
from linear_tpu.index import dindex as DI
from linear_tpu.map import pmpfinder as PMP
from linear_tpu.ops import features as F
from linear_tpu.utils import seqio


def host_hits_for_read(index, read, f2):
    """Host pipeline up to (pre-filter) hits for one read: mirrors
    apx_map_ first pass (src/pmpfinder.cpp:2632) before path_dst."""
    hits = [PMP.FLAG_END]
    anchors = [0]
    hits_score = []
    pm = PMP.PMPParms()
    PMP.get_anchor_hits_chains(anchors, hits, hits_score, len(read), pm)
    return hits


def host_cords_for_hits(hits, read, rc, f2):
    f1 = [PMP.Feats(F.create_features_serial(read)),
          PMP.Feats(F.create_features_serial(rc))]
    hits = list(hits)
    cords = []
    if len(hits) >= 2:
        PMP.filter_hits(hits, f1, f2)
        gen = PMP.path_dst_2(hits, f1, f2, cords, 0, len(read), len(read))
        PMP.run_serial(gen)
    return cords


@pytest.mark.parametrize("corpus,seed", [("uniform", 7), ("repeat", 77)])
def test_extend_device_matches_oracle(corpus, seed):
    import jax.numpy as jnp

    from linear_tpu.ops import extend_dev as ED

    rng = np.random.default_rng(seed)
    if corpus == "repeat":
        genomes = [DT.make_repeat_genome(rng, 120000)]
    else:
        genomes = [rng.integers(0, 4, 100000).astype(np.uint8) for _ in range(2)]
    index = DI.build_dindex(genomes, threads_emul=4)
    f2_arr = [F.create_features_genome(g, 4) for g in genomes]
    f2 = [PMP.Feats(a) for a in f2_arr]
    reads = DT.simulate(rng, genomes, 48)
    reads = [r for r in reads if len(r) > 200 and not (r == 4).any()]

    # host side: seeds -> hits (oracle), then filter+path_dst_2 (oracle)
    all_hits = []
    expected = []
    for read in reads:
        anchors = [0]
        anchors.extend(int(a) for a in DI.query_anchors(index, read, 0, len(read)))
        hits = [PMP.FLAG_END]
        hits_score = []
        pm = PMP.PMPParms()
        PMP.get_anchor_hits_chains(anchors, hits, hits_score, len(read), pm)
        all_hits.append(hits)
        rc = seqio.revcomp(read)
        expected.append(host_cords_for_hits(hits, read, rc, f2))

    # device side
    B = len(reads)
    pad = 1 << int(np.ceil(np.log2(max(len(r) for r in reads))))
    pad = max(pad, 1024)
    H = 1 << int(np.ceil(np.log2(max(max(len(h) for h in all_hits), 32))))
    C = H + pad // 32
    R = ((pad - 48) >> 4) + 1
    seqs = np.zeros((B, pad), dtype=np.uint8)
    lens = np.zeros((B,), dtype=np.int64)
    hitm = np.zeros((B, H), dtype=np.uint64)
    hitn = np.zeros((B,), dtype=np.int32)
    for i, (r, h) in enumerate(zip(reads, all_hits)):
        seqs[i, : len(r)] = r
        lens[i] = len(r)
        hitm[i, : len(h)] = np.array(h, dtype=np.uint64)
        hitn[i] = len(h)
    s4 = seqs.reshape(B, -1, 4).astype(np.uint16)
    packed = (s4[:, :, 0] | (s4[:, :, 1] << 2) | (s4[:, :, 2] << 4)
              | (s4[:, :, 3] << 6)).astype(np.uint8)
    gf = ED.upload_genome_feats(f2_arr)
    cords, ncords, ovf = ED.batch_filter_extend_packed(
        jnp.asarray(packed), jnp.asarray(lens), jnp.asarray(hitm.view(np.int64)),
        jnp.asarray(hitn), gf.cat, gf.off, gf.rows,
        H=H, C=C, R=R, max_iter=4 * H + 2 * C + 16)
    cords = np.asarray(cords).view(np.uint64)
    ncords = np.asarray(ncords)
    ovf = np.asarray(ovf)

    n_checked = 0
    for i in range(B):
        assert not ovf[i], f"read {i} overflowed (H={H}, C={C})"
        got = [int(c) for c in cords[i, : ncords[i]]]
        assert got == expected[i], (
            f"read {i}: device cords != oracle\n got {[hex(g) for g in got[:8]]}\n"
            f" exp {[hex(g) for g in expected[i][:8]]}")
        n_checked += 1
    assert n_checked >= 30
