"""Strand-specific coverage + SS edge splitting (rna mode)."""
import numpy as np
import pytest

from spades_tpu.alignment.ss_coverage import (
    SSCoverageSplitter, fill_ss_coverage, split_edge,
)
from spades_tpu.core import dna
from spades_tpu.graph.graph import CondensedGraph
from tests.conftest import random_dna


def reads_from(seq: str, n: int, rlen: int, rng):
    return [
        seq[s : s + rlen]
        for s in rng.integers(0, max(1, len(seq) - rlen), n)
    ]


class TestSSCoverage:
    def test_strand_asymmetry(self, rng):
        k = 21
        s = random_dna(rng, 400)
        g = CondensedGraph.from_sequences([s], k)
        fwd = reads_from(s, 200, 60, rng)
        cov = fill_ss_coverage(g, fwd)
        # forward strand sees coverage, conjugate sees ~none
        assert cov[0] > 10
        assert cov[1] == 0
        # rf protocol: reads flipped before mapping land on the conjugate
        cov_rf = fill_ss_coverage(g, fwd, rf=True)
        assert cov_rf[1] > 10
        assert cov_rf[0] == 0

    def test_symmetric_fill(self, rng):
        k = 21
        s = random_dna(rng, 300)
        g = CondensedGraph.from_sequences([s], k)
        cov = fill_ss_coverage(g, reads_from(s, 100, 60, rng), symmetric=True)
        assert cov[0] == cov[1] > 0


class TestSplitEdge:
    def test_split_preserves_sequence(self, rng):
        k = 21
        s = random_dna(rng, 300)
        g = CondensedGraph.from_sequences([s], k)
        pos = 100
        e1, e2 = split_edge(g, 0, pos)
        g.check_invariants()
        assert not g.alive[0]
        assert g.edge_seq(e1) == s[: pos + k]
        assert g.edge_seq(e2) == s[pos:]
        # joined by one shared vertex
        assert g.e_end[e1] == g.e_start[e2]


class TestSSSplitter:
    def test_detects_tail_to_tail_boundary(self, rng):
        """Two transcripts overlapping tail-to-tail: sense coverage descends
        while antisense ascends -> edge is split near the crossing."""
        k = 21
        s = random_dna(rng, 600)
        g = CondensedGraph.from_sequences([s], k)
        # transcript A = forward strand of first 350 bp (deep at the front);
        # transcript B = reverse strand of last 350 bp
        tA = s[:350]
        tB = dna.revcomp_str(s[250:])
        reads = reads_from(tA, 400, 60, rng) + reads_from(tB, 400, 60, rng)
        splitter = SSCoverageSplitter(
            g, bin_size=50, min_edge_len=150, min_edge_coverage=0.0,
            coverage_margin=3.0, min_flanking_coverage=1.0,
        )
        assert 0 in splitter.bins and 1 in splitter.bins
        splitter.fill(reads)
        assert splitter.bins[0].sum() > 0
        assert splitter.bins[1].sum() > 0
        pos = splitter.detect_split(0)
        assert pos > 0
        # crossing is inside the overlap region [250, 350)
        assert 150 <= pos <= 450
        n = splitter.split_edges()
        assert n == 1
        g.check_invariants()
        assert len(g.alive_edge_ids()) == 4  # two conjugate pairs

    def test_no_split_on_uniform_coverage(self, rng):
        k = 21
        s = random_dna(rng, 600)
        g = CondensedGraph.from_sequences([s], k)
        reads = reads_from(s, 300, 60, rng) + [
            dna.revcomp_str(r) for r in reads_from(s, 300, 60, rng)
        ]
        splitter = SSCoverageSplitter(
            g, bin_size=50, min_edge_len=150, min_edge_coverage=0.0,
        )
        splitter.fill(reads)
        assert splitter.split_edges() == 0


class TestRnaSsPipeline:
    def test_ss_flag_accepted(self, rng, tmp_path):
        from spades_tpu.pipeline.main import main

        s = random_dna(rng, 500)
        reads_path = str(tmp_path / "reads.fasta")
        with open(reads_path, "w") as fh:
            for i, r in enumerate(reads_from(s, 300, 80, rng)):
                fh.write(f">r{i}\n{r}\n")
        out = str(tmp_path / "out")
        rc = main(["--rna", "--ss", "fr", "-s", reads_path, "-o", out,
                   "--platform", "cpu", "-k", "21"])
        assert rc == 0
        import os
        assert os.path.exists(os.path.join(out, "transcripts.fasta"))
