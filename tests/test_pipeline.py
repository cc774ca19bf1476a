"""PipelineMapper (feeder thread + worker pool + ordered drain) must emit
exactly what the serial block loop emits, in the same order."""
import numpy as np
import pytest

from linear_tpu.map.mapper import Mapper, MapperConfig
from linear_tpu.utils import seqio


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    rng = np.random.default_rng(21)
    genome = rng.integers(0, 4, 60000).astype(np.uint8)
    g_fa = str(d / "g.fa")
    seqio.write_fasta(g_fa, ["chr1 test"], [genome])
    reads = []
    for i in range(24):
        pos = int(rng.integers(0, 55000))
        r = genome[pos: pos + 2500].copy()
        sub = rng.random(len(r)) < 0.05
        r[sub] = (r[sub] + 1) % 4
        if i % 3 == 2:
            r = seqio.revcomp(r)
        reads.append(r)
    r_fa = str(d / "r.fa")
    seqio.write_fasta(r_fa, [f"read{i}" for i in range(len(reads))], reads)
    return g_fa, r_fa


def test_pipeline_matches_serial(world):
    from linear_tpu.parallel.pipeline import PipelineMapper

    g_fa, r_fa = world
    m = Mapper([g_fa], MapperConfig(threads=4))
    m.prepare()
    serial_sam = []
    serial_cs = []
    for block in seqio.read_blocks(r_fa):
        cs, ce, sam = m.map_block(block)
        serial_sam.append(sam)
        serial_cs.extend(cs)
    pipe = PipelineMapper(m, n_workers=2)
    pipe_sam = []
    pipe_cs = []
    for br in pipe.run(r_fa):
        pipe_sam.append(br.sam)
        pipe_cs.extend(br.cords_str)
    pipe.close()
    assert "".join(pipe_sam) == "".join(serial_sam)
    assert pipe_cs == serial_cs


def test_pipeline_device_streaming_matches_serial(world):
    """device='tpu' pipeline (streaming superchunk seed feeder) must equal
    the host-device serial output bit for bit; exercises the
    task-emission-as-seeds-land path with a small superchunk so several
    superchunks and task spans interleave."""
    from linear_tpu.parallel.pipeline import PipelineMapper

    g_fa, r_fa = world
    m0 = Mapper([g_fa], MapperConfig(threads=4))
    m0.prepare()
    serial_sam = []
    for block in seqio.read_blocks(r_fa):
        _, _, sam = m0.map_block(block)
        serial_sam.append(sam)

    m = Mapper([g_fa], MapperConfig(threads=4), device="tpu")
    m.index = m0.index
    m.f2 = m0.f2
    old_sc = Mapper.SEED_SUPERCHUNK
    Mapper.SEED_SUPERCHUNK = 8
    try:
        pipe = PipelineMapper(m, n_workers=2)
        pipe_sam = []
        for br in pipe.run(r_fa):
            pipe_sam.append(br.sam)
        pipe.close()
    finally:
        Mapper.SEED_SUPERCHUNK = old_sc
    assert "".join(pipe_sam) == "".join(serial_sam)


def test_pipeline_sam_only_batched_path(world):
    """collect_cords=False routes chunks through the single-crossing
    native map_block; SAM must equal the per-read path byte for byte."""
    from linear_tpu.parallel.pipeline import PipelineMapper

    g_fa, r_fa = world
    m = Mapper([g_fa], MapperConfig(threads=4))
    pipe = PipelineMapper(m, n_workers=2)
    sam_full = "".join(br.sam for br in pipe.run(r_fa))
    sam_fast = "".join(br.sam for br in pipe.run(r_fa, collect_cords=False))
    pipe.close()
    assert sam_fast == sam_full
