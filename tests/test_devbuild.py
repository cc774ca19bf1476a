"""Device-side DIndex build (ops/devbuild.py) must be bit-equal to the
host build (reference createDIndex semantics, src/index_util.cpp:1628)."""
import numpy as np
import pytest


@pytest.mark.parametrize("glen,threads", [(20000, 4), (150011, 16), (60000, 1)])
def test_device_build_equals_host(glen, threads):
    from linear_tpu.index import dindex as DI
    from linear_tpu.ops import devbuild as DB

    rng = np.random.default_rng(glen)
    seqs = [rng.integers(0, 4, glen).astype(np.uint8),
            rng.integers(0, 4, glen // 2).astype(np.uint8)]
    host = DI.build_dindex(seqs, threads_emul=threads)
    dev = DB.build_dindex_device_host(seqs, threads_emul=threads)
    assert (host.dir == dev.dir).all()
    assert len(host.hs) == len(dev.hs)
    assert (host.hs == dev.hs).all()


def test_device_build_rejects_n():
    from linear_tpu.ops import devbuild as DB

    seq = np.zeros(1000, dtype=np.uint8)
    seq[500] = 4
    with pytest.raises(ValueError):
        DB.build_dindex_device([seq])
