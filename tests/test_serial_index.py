"""Index serialization round-trips (--save-index / --load-index)."""
import numpy as np

from linear_tpu.index import dindex as DI
from linear_tpu.index import hindex as HI
from linear_tpu.index.serial import load_index, save_index


def test_dindex_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 50000).astype(np.uint8)
    idx = DI.build_dindex([genome], threads_emul=4)
    p = str(tmp_path / "d.lti")
    save_index(p, idx)
    got = load_index(p)
    assert got.span == idx.span and got.weight == idx.weight
    assert np.array_equal(got.dir, idx.dir)
    assert np.array_equal(got.hs, idx.hs)


def test_hindex_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    genome = rng.integers(0, 4, 30000).astype(np.uint8)
    idx = HI.build_hindex([genome], threads_emul=4)
    p = str(tmp_path / "h.lti")
    save_index(p, idx)
    got = load_index(p)
    for f in ("ysa", "xs_val1", "xs_val2"):
        assert np.array_equal(getattr(got, f), getattr(idx, f))
    assert (got.xs_mask, got.empty_dir) == (idx.xs_mask, idx.empty_dir)


def test_cli_save_load_same_sam(tmp_path):
    from linear_tpu import cli
    from linear_tpu.utils import seqio

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 60000).astype(np.uint8)
    g_fa = str(tmp_path / "g.fa")
    seqio.write_fasta(g_fa, ["chr1 t"], [genome])
    reads = []
    for i in range(6):
        pos = int(rng.integers(0, 55000))
        r = genome[pos: pos + 2000].copy()
        sub = rng.random(len(r)) < 0.05
        r[sub] = (r[sub] + 1) % 4
        reads.append(r)
    r_fa = str(tmp_path / "r.fa")
    seqio.write_fasta(r_fa, [f"rd{i}" for i in range(6)], reads)
    o1 = str(tmp_path / "o1")
    o2 = str(tmp_path / "o2")
    ixp = str(tmp_path / "ix")
    assert cli.main(["filter", r_fa, g_fa, "-t", "4", "-b", "0",
                     "-o", o1, "--save-index", ixp]) in (0, None)
    assert cli.main(["filter", r_fa, g_fa, "-t", "4", "-b", "0",
                     "-o", o2, "--load-index", ixp]) in (0, None)
    assert open(o1 + ".sam").read() == open(o2 + ".sam").read()
