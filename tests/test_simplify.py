"""Simplification + end-to-end assembly tests.

The end-to-end oracle is the reference's own --test contract
(/root/reference/src/projects/spades/pipeline/spades_pipeline/supplemetary/
check_test_script.py:58-76): exactly 1 contig of exactly 1000 bp.
"""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.graph.compress import compress
from spades_tpu.graph.simplify import (
    SimplifyConfig,
    clip_tips,
    remove_bulges,
    simplify,
)
from spades_tpu.pipeline.assembler import assemble_multi_k, assemble_single_k
from spades_tpu.pipeline.construction import construct_graph
from tests.conftest import random_dna
from tests.test_condense import clean_random_dna, is_clean


class TestCompress:
    def test_compress_rejoins_split_path(self, rng):
        k = 11
        for _ in range(100):
            main = clean_random_dna(rng, 120, k)
            tip_read = main[:50] + random_dna(rng, 10)
            if is_clean(main + "NN" + tip_read[40:], k):
                break
        g = construct_graph([main, main, tip_read], k).graph
        assert len(g.canonical_edge_ids()) == 3
        # bound chosen so only the 10 nt artifact tip qualifies (the genomic
        # pieces of this tiny genome would legitimately pass the default
        # read-length bound, as they would in the reference)
        n = clip_tips(g, max_len=15)
        assert n == 2  # tip + conjugate
        g2 = compress(g)
        g2.check_invariants()
        assert len(g2.canonical_edge_ids()) == 1
        got = g2.edge_seq(g2.canonical_edge_ids()[0])
        assert got in (main, dna.revcomp_str(main))
        # coverage of merged edge accumulates the pieces
        assert g2.coverage()[g2.canonical_edge_ids()[0]] > 1.5


class TestTipClipper:
    def test_does_not_clip_long_edges(self, rng):
        k = 11
        s = clean_random_dna(rng, 300, k)
        g = construct_graph([s], k).graph
        n = clip_tips(g, max_len=100)
        # a single isolated edge is not a tip (no alternative: outd+ind == 2)
        assert n == 0 and g.num_edges == 2


class TestBulgeRemover:
    def test_snp_bulge_removed(self, rng):
        k = 11
        for _ in range(100):
            a = clean_random_dna(rng, 80, k)
            mid = 40
            alt = "ACGT"[("ACGT".index(a[mid]) + 1) % 4]
            b = a[:mid] + alt + a[mid + 1 :]
            if is_clean(a + "NN" + b, k):
                break
        # a has coverage 3, b coverage 1 -> b's arm should be removed
        g = construct_graph([a, a, a, b], k).graph
        assert len(g.canonical_edge_ids()) == 4
        n = remove_bulges(g, SimplifyConfig())
        assert n >= 2
        g = compress(g)
        g.check_invariants()
        assert len(g.canonical_edge_ids()) == 1
        got = g.edge_seq(g.canonical_edge_ids()[0])
        assert got in (a, dna.revcomp_str(a))


class TestEndToEnd:
    def test_single_k_synthetic_with_errors(self):
        # own rng: results must not depend on draws made by earlier tests
        rng = np.random.default_rng(1234)
        k = 21
        genome = clean_random_dna(rng, 600, k)
        reads = []
        for i in range(0, 501, 5):
            r = genome[i : i + 100]
            reads.append(r)
        # inject sporadic errors
        for j in range(0, len(reads), 7):
            r = list(reads[j])
            p = int(rng.integers(10, 90))
            r[p] = "ACGT"[("ACGT".index(r[p]) + 1) % 4]
            reads[j] = "".join(r)
        res = assemble_single_k(reads, k)
        assert len(res.contigs) == 1
        assert res.contigs[0].seq in (genome, dna.revcomp_str(genome))

    def test_ecoli_1k_single_k(self, ecoli_1k_reads, ecoli_1k_reference):
        """The real --test dataset at k=21: 1 contig x 1000 bp."""
        res = assemble_single_k(ecoli_1k_reads, 21)
        assert len(res.contigs) == 1, [c.name for c in res.contigs]
        c = res.contigs[0]
        assert len(c.seq) == 1000
        genome = ecoli_1k_reference
        assert c.seq in (genome, dna.revcomp_str(genome))
        assert c.name.startswith("NODE_1_length_1000_cov_")

    def test_ecoli_1k_multi_k(self, ecoli_1k_reads, ecoli_1k_reference):
        """Multi-k ladder 21/33/55 with contig feed-forward: same oracle."""
        res = assemble_multi_k(ecoli_1k_reads, [21, 33, 55])
        assert len(res.contigs) == 1, [c.name for c in res.contigs]
        c = res.contigs[0]
        assert len(c.seq) == 1000
        genome = ecoli_1k_reference
        assert c.seq in (genome, dna.revcomp_str(genome))
