"""Native C++ FASTA/FASTQ parser vs the pure-Python oracle."""
import gzip
import os

import numpy as np
import pytest

from spades_tpu import native
from spades_tpu.io.fastx import read_fastx

TEST_FQ = "/root/reference/src/projects/spades/test_dataset/ecoli_1K_1.fq.gz"


@pytest.fixture(scope="module")
def native_lib():
    l = native.lib()
    if l is None:
        pytest.skip("native library unavailable (no toolchain)")
    return l


class TestNativeParser:
    def test_fastq_gz_matches_python(self, native_lib):
        py = list(read_fastx(TEST_FQ, native=False))
        res = native.read_fastx_native(TEST_FQ)
        assert res is not None
        names, seq, soff = res
        assert len(names) == len(py)
        pool = seq.tobytes()
        for i, rec in enumerate(py):
            assert names[i] == rec.name
            assert pool[soff[i] : soff[i + 1]].decode() == rec.seq

    def test_multiline_fasta(self, native_lib, tmp_path):
        f = str(tmp_path / "x.fasta")
        with open(f, "w") as fh:
            fh.write(">a desc\nACGT\nACGT\n>b\nGGGG\n")
        res = native.read_fastx_native(f)
        names, seq, soff = res
        assert names == ["a desc", "b"]
        pool = seq.tobytes()
        assert pool[soff[0] : soff[1]] == b"ACGTACGT"
        assert pool[soff[1] : soff[2]] == b"GGGG"

    def test_plain_fastq(self, native_lib, tmp_path):
        f = str(tmp_path / "x.fastq")
        with open(f, "w") as fh:
            fh.write("@r1\nACGTN\n+\nIIIII\n@r2\nTTT\n+r2\nIII\n")
        names, seq, soff = native.read_fastx_native(f)
        assert names == ["r1", "r2"]
        pool = seq.tobytes()
        assert pool[soff[0] : soff[1]] == b"ACGTN"
        assert pool[soff[1] : soff[2]] == b"TTT"

    def test_gzipped_fasta(self, native_lib, tmp_path):
        f = str(tmp_path / "x.fasta.gz")
        with gzip.open(f, "wt") as fh:
            fh.write(">only\nAAACCC\n")
        names, seq, soff = native.read_fastx_native(f)
        assert names == ["only"]
        assert seq.tobytes() == b"AAACCC"

    def test_missing_file(self, native_lib):
        assert native.read_fastx_native("/nonexistent/zz.fa") is None

    def test_crlf_line_endings(self, native_lib, tmp_path):
        f = str(tmp_path / "crlf.fasta")
        with open(f, "wb") as fh:
            fh.write(b">a\r\nACGT\r\n")
        names, seq, soff = native.read_fastx_native(f)
        assert names == ["a"]
        assert seq.tobytes() == b"ACGT"

    def test_read_fastx_uses_native_transparently(self, native_lib):
        via_native = [r.seq for r in read_fastx(TEST_FQ, native=True)]
        via_python = [r.seq for r in read_fastx(TEST_FQ, native=False)]
        assert via_native == via_python
