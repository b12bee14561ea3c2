"""SAM I/O and memory budgeting utilities."""
import os

import numpy as np
import pytest

from spades_tpu.io.sam import SamRecord, mappings_to_sam, read_sam, write_sam
from spades_tpu.utils.memory import (
    get_device_memory_stats,
    get_free_memory,
    get_memory_limit,
    get_used_memory,
    suggest_batch_size,
)
from tests.conftest import random_dna


class TestSam:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.sam")
        recs = [
            SamRecord("r1", 0, "ref1", 5, 60, "10M", "ACGTACGTAC", {"NH": 1}),
            SamRecord("r2", 4, "*", 0, 0, "*", "TTTT", {}),
            SamRecord("r3", 16, "ref1", 1, 30, "2S8M", "ACGTACGTAC", {}),
        ]
        write_sam(path, [("ref1", 100)], recs)
        got = list(read_sam(path))
        assert len(got) == 3
        assert got[0].qname == "r1" and got[0].pos == 5 and not got[0].is_unmapped
        assert got[1].is_unmapped
        assert got[2].is_reverse
        assert got[0].tags.get("NH") == "1"

    def test_aligned_pairs(self):
        r = SamRecord("q", 0, "ref", 10, 60, "3M2D2M1I2M", "AAACCGTT", {})
        pairs = r.aligned_pairs()
        # 3M at ref 9..11, 2D skips ref 12-13, 2M at 14-15, 1I skips read, 2M
        assert pairs[:3] == [(0, 9), (1, 10), (2, 11)]
        assert pairs[3] == (3, 14)
        assert pairs[-1][1] == 17

    def test_mappings_to_sam(self, rng, tmp_path):
        from spades_tpu.alignment.mapper import build_edge_index, map_read_batch
        from spades_tpu.graph.graph import CondensedGraph
        from spades_tpu.core import dna

        k = 21
        genome = random_dna(rng, 300)
        g = CondensedGraph.from_sequences([genome], k)
        index = build_edge_index(g)
        reads = [genome[10:70], dna.revcomp_str(genome[100:160]), "A" * 30]
        mappings = map_read_batch(index, g, reads)
        path = str(tmp_path / "m.sam")
        n = mappings_to_sam(path, g, ["a", "b", "c"], reads, mappings)
        assert n == 2
        got = {r.qname: r for r in read_sam(path)}
        assert got["a"].pos == 11 and not got["a"].is_reverse
        assert got["b"].is_reverse
        assert got["c"].is_unmapped


class TestMemory:
    def test_introspection(self):
        assert get_used_memory() > 0
        free = get_free_memory()
        assert free is None or free > 0
        _ = get_memory_limit()  # None or int, must not raise

    def test_device_stats(self):
        stats = get_device_memory_stats()
        assert len(stats) >= 1
        assert "device" in stats[0]

    def test_suggest_batch_size(self):
        b = suggest_batch_size(100, 21, hbm_budget_bytes=1 << 30)
        assert 1024 <= b
        assert suggest_batch_size(100, 21, hbm_budget_bytes=1 << 20) == 1024


class TestBam:
    """BAM round-trip + dispatcher (reference: io/sam/bam_parser.cpp)."""

    def _records(self):
        from spades_tpu.io.sam import SamRecord

        return [
            SamRecord(qname="r1", flag=0, rname="e1", pos=5, mapq=60,
                      cigar="10M2I8M", seq="ACGTACGTACGGTTACGTAC", tags={}),
            SamRecord(qname="r2", flag=16, rname="e2", pos=1, mapq=0,
                      cigar="20M", seq="A" * 20, tags={}),
            SamRecord(qname="u1", flag=4, rname="*", pos=0, mapq=0,
                      cigar="*", seq="ACGTN", tags={}),
        ]

    def test_roundtrip(self, tmp_path):
        from spades_tpu.io.sam import read_bam, write_bam

        path = str(tmp_path / "x.bam")
        refs = [("e1", 100), ("e2", 50)]
        recs = self._records()
        write_bam(path, refs, recs)
        back = list(read_bam(path))
        assert len(back) == len(recs)
        for a, b in zip(recs, back):
            assert (a.qname, a.flag, a.rname, a.pos, a.mapq, a.cigar, a.seq) \
                == (b.qname, b.flag, b.rname, b.pos, b.mapq, b.cigar, b.seq)
        # aligned_pairs walks identically
        assert back[0].aligned_pairs() == recs[0].aligned_pairs()

    def test_dispatcher(self, tmp_path):
        from spades_tpu.io.sam import read_alignments, write_bam, write_sam

        refs = [("e1", 100), ("e2", 50)]
        recs = self._records()
        bam = str(tmp_path / "a.bam")
        sam = str(tmp_path / "a.sam")
        write_bam(bam, refs, recs)
        write_sam(sam, refs, recs)
        rb = list(read_alignments(bam))
        rs = list(read_alignments(sam))
        assert [r.qname for r in rb] == [r.qname for r in rs] == ["r1", "r2", "u1"]
        assert rb[1].is_reverse and rs[1].is_reverse
        assert rb[2].is_unmapped

    def test_gzipped_sam_text_dispatch(self, tmp_path):
        """A gzipped SAM TEXT file must parse as SAM, not crash as BAM
        (content dispatch checks the INFLATED magic)."""
        import gzip

        from spades_tpu.io.sam import read_alignments, write_sam

        refs = [("e1", 100), ("e2", 50)]
        recs = self._records()
        sam = str(tmp_path / "b.sam")
        write_sam(sam, refs, recs)
        gz = str(tmp_path / "b.sam.gz")
        with open(sam, "rb") as fi, gzip.open(gz, "wb") as fo:
            fo.write(fi.read())
        back = list(read_alignments(gz))
        assert [r.qname for r in back] == ["r1", "r2", "u1"]
