"""Native C++ sequence reader vs the Python oracle: byte-identical ids and
code arrays on fasta / gzipped fasta / fastq, including whitespace and
empty-record edge cases."""
import gzip

import numpy as np
import pytest

from linear_tpu.utils import seqio


@pytest.fixture(scope="module")
def lib():
    from linear_tpu.native import seqio_lib

    lib = seqio_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def _diff(lib, path):
    a = list(seqio._read_seq_records_py(path))
    b = list(seqio._read_seq_records_native(lib, path))
    assert len(a) == len(b)
    for (i1, s1), (i2, s2) in zip(a, b):
        assert i1 == i2
        assert s1.dtype == s2.dtype and (s1 == s2).all()
    return a


def test_fasta_and_gz(lib, tmp_path):
    fa = tmp_path / "t.fa"
    fa.write_text(">r1 desc here\nACGTNacgtn\nGG  \n> r2\n\nTTTT\n>r3\n")
    recs = _diff(lib, str(fa))
    assert [r[0] for r in recs] == ["r1 desc here", " r2", "r3"]
    assert list(recs[0][1]) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 2, 2]
    gz = tmp_path / "t.fa.gz"
    gz.write_bytes(gzip.compress(fa.read_bytes()))
    _diff(lib, str(gz))


def test_fastq(lib, tmp_path):
    fq = tmp_path / "t.fq"
    fq.write_text("@q1 x\nACGT\n+\nIIII\n@q2\nNNAC\n+ junk\n!!!!\n")
    recs = _diff(lib, str(fq))
    assert [r[0] for r in recs] == ["q1 x", "q2"]


def test_fastq_malformed(lib, tmp_path):
    fq = tmp_path / "bad.fq"
    fq.write_text("@q1\nACGT\n+\nIIII\nnot-a-header\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError):
        list(seqio._read_seq_records_native(lib, str(fq)))
    with pytest.raises(ValueError):
        list(seqio._read_seq_records_py(str(fq)))


def test_synthetic_large_roundtrip(lib, tmp_path):
    rng = np.random.default_rng(5)
    ids = [f"read{i} extra meta" for i in range(64)]
    seqs = [rng.integers(0, 5, rng.integers(1, 3000)).astype(np.uint8)
            for _ in range(64)]
    fa = tmp_path / "big.fa"
    seqio.write_fasta(str(fa), ids, seqs)
    recs = _diff(lib, str(fa))
    assert [r[0] for r in recs] == ids
    for (rid, s), ref in zip(recs, seqs):
        assert (s == ref).all()


def test_scan_offsets_and_range_parse(tmp_path):
    """Byte-range worker reads: offsets + range parse == streaming parse,
    for fasta AND fastq, native and Python parsers; gz returns None."""
    import gzip

    from linear_tpu.utils import seqio

    rng = np.random.default_rng(17)
    ids = [f"rec{i} meta {i}" for i in range(40)]
    seqs = [rng.integers(0, 5, int(rng.integers(0, 3000))).astype(np.uint8)
            for _ in range(40)]
    # fasta
    fa = str(tmp_path / "t.fa")
    seqio.write_fasta(fa, ids, seqs)
    offs = seqio.scan_record_offsets(fa)
    assert offs is not None and len(offs) == 41
    got_ids, got_seqs = [], []
    for k in range(0, 40, 7):
        i, j = k, min(k + 7, 40)
        a, b = seqio.parse_records_range(fa, int(offs[i]), int(offs[j]))
        got_ids.extend(a)
        got_seqs.extend(b)
    assert got_ids == ids
    assert all(np.array_equal(x, y) for x, y in zip(got_seqs, seqs))
    # fastq
    fq = str(tmp_path / "t.fq")
    with open(fq, "w") as f:
        for rid, s in zip(ids, seqs):
            txt = seqio.decode(s)
            f.write(f"@{rid}\n{txt}\n+\n{'I' * len(txt)}\n")
    offs = seqio.scan_record_offsets(fq)
    assert offs is not None and len(offs) == 41
    a, b = seqio.parse_records_range(fq, int(offs[3]), int(offs[11]))
    assert a == ids[3:11]
    assert all(np.array_equal(x, y) for x, y in zip(b, seqs[3:11]))
    # gz: no offsets -> pipeline falls back to pickled reads
    gz = str(tmp_path / "t.fa.gz")
    with open(fa, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    assert seqio.scan_record_offsets(gz) is None
