"""Graph construction tests on literal sequences — mirrors the reference's
construction_test.cpp pattern (/root/reference/src/test/debruijn/
construction_test.cpp:30-92: build graphs from short literal strings and
check the resulting edge set).

Note: in a conjugate (double-stranded) dBG, a k-mer occurring together with
its reverse complement elsewhere in the genome creates a legitimate junction,
so test sequences are generated 'clean' (no repeated canonical k-mers).
"""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.pipeline.construction import construct_graph
from tests.conftest import random_dna


def canonical_kmer_multiset(s, k):
    return [min(w, dna.revcomp_str(w)) for w in (s[i : i + k] for i in range(len(s) - k + 1))]


def is_clean(s, k):
    ms = canonical_kmer_multiset(s, k)
    return len(ms) == len(set(ms))


def clean_random_dna(rng, n, k):
    for _ in range(1000):
        s = random_dna(rng, n)
        if is_clean(s, k):
            return s
    raise RuntimeError("could not generate clean sequence")


def edge_seq_set(g):
    return {g.edge_seq(e) for e in g.alive_edge_ids()}


class TestSinglePath:
    @pytest.mark.parametrize("k,n", [(5, 30), (11, 120), (21, 500), (33, 800), (55, 400)])
    def test_single_sequence_single_edge(self, rng, k, n):
        s = clean_random_dna(rng, n, k)
        g = construct_graph([s], k).graph
        g.check_invariants()
        assert len(g.canonical_edge_ids()) == 1
        got = g.edge_seq(g.canonical_edge_ids()[0])
        assert got in (s, dna.revcomp_str(s))

    def test_overlapping_reads_reconstruct_genome(self, rng):
        k = 21
        genome = clean_random_dna(rng, 300, k)
        reads = [genome[i : i + 60] for i in range(0, 241, 10)]
        g = construct_graph(reads, k).graph
        g.check_invariants()
        assert len(g.canonical_edge_ids()) == 1
        got = g.edge_seq(g.canonical_edge_ids()[0])
        assert got in (genome, dna.revcomp_str(genome))

    def test_coverage_of_uniform_path(self, rng):
        k = 11
        s = clean_random_dna(rng, 100, k)
        g = construct_graph([s, s, s], k).graph
        cov = g.coverage()[g.canonical_edge_ids()]
        assert np.allclose(cov, 3.0)


class TestBranching:
    def test_snp_bulge(self, rng):
        # two haplotypes differing at one middle base -> 4 condensed edges
        k = 11
        for _ in range(100):
            a = clean_random_dna(rng, 80, k)
            mid = 40
            alt = "ACGT"[(("ACGT".index(a[mid])) + 1) % 4]
            b = a[:mid] + alt + a[mid + 1 :]
            if is_clean(a + "NN" + b, k):
                break
        g = construct_graph([a, b], k).graph
        g.check_invariants()
        # shared prefix, shared suffix, two bulge arms
        assert len(g.canonical_edge_ids()) == 4
        assert g.out_degrees().max() == 2

    def test_tip(self, rng):
        k = 11
        for _ in range(100):
            main = clean_random_dna(rng, 80, k)
            tip_read = main[:40] + random_dna(rng, 8)
            if is_clean(main + "NN" + tip_read[30:], k):
                break
        g = construct_graph([main, main, tip_read], k).graph
        g.check_invariants()
        # main path splits where the tip diverges
        assert len(g.canonical_edge_ids()) == 3

    def test_perfect_cycle(self, rng):
        # circular sequence with no junctions -> one self-loop edge
        k = 11
        for _ in range(100):
            core = random_dna(rng, 60)
            if is_clean(core + core[: k - 1], k):
                break
        s = core + core[: k - 1] + core[k - 1]  # close the cycle
        s = core + core[:k]
        g = construct_graph([s], k).graph
        g.check_invariants()
        assert any(g.e_start[e] == g.e_end[e] for e in g.alive_edge_ids()), (
            "no self-loop edge found for perfect cycle"
        )


class TestRealData:
    def test_ecoli_1k_raw_graph(self, ecoli_1k_reads, ecoli_1k_reference):
        k = 21
        g = construct_graph(ecoli_1k_reads, k).graph
        g.check_invariants()
        genome = ecoli_1k_reference
        rc_genome = dna.revcomp_str(genome)
        ids = g.canonical_edge_ids()
        seqs = [g.edge_seq(e) for e in ids]
        genomic = [s for s in seqs if s in genome or s in rc_genome]
        # sequencing errors split the genome into a handful of genomic edges
        # plus low-coverage error edges; the genomic pieces must cover the
        # genome (pieces overlap junction k-mers by k)
        assert len(genomic) >= 1
        assert max(len(s) for s in genomic) > 400
        cov = g.coverage()[ids]
        genomic_mask = np.array([s in genome or s in rc_genome for s in seqs])
        # error edges have much lower coverage than genomic ones
        assert cov[genomic_mask].min() > cov[~genomic_mask].max()


def test_empty_and_tiny_inputs():
    """Inputs producing zero (k+1)-mers must yield an empty graph (verify probe)."""
    g = construct_graph(["ACGT"], 21).graph
    assert g.num_edges == 0
    g = construct_graph([], 21).graph
    assert g.num_edges == 0


class TestDeviceRanking:
    def test_device_and_numpy_ranking_agree(self, rng, monkeypatch):
        """The jitted pointer-doubling program and the numpy fallback must
        produce identical graphs, including on inputs with perfect cycles."""
        genome = random_dna(rng, 3000)
        cyc = random_dna(rng, 300)
        seqs = [genome, cyc + cyc + cyc[:60]]  # linear chain + perfect cycle
        monkeypatch.setenv("SPADES_TPU_DEVICE_RANK", "always")
        g_dev = construct_graph(seqs, 21).graph
        monkeypatch.setenv("SPADES_TPU_DEVICE_RANK", "never")
        g_np = construct_graph(seqs, 21).graph
        assert g_dev.num_edges == g_np.num_edges
        assert np.array_equal(np.sort(g_dev.e_len), np.sort(g_np.e_len))
        sd = sorted(g_dev.edge_seq(int(e)) for e in g_dev.alive_edge_ids())
        sn = sorted(g_np.edge_seq(int(e)) for e in g_np.alive_edge_ids())
        assert sd == sn
        g_dev.check_invariants()
