"""Long-read aligner + hybrid gap closing tests.

Mirrors the reference's sensitive-aligner contract (alignment/pacbio/
g_aligner.cpp: anchor clustering + chaining yields the edge path of a long
read) and HybridLibrariesAligning gap closing (hybrid_aligning.cpp)."""
import numpy as np

from spades_tpu.alignment.long_read import (
    AlignerConfig,
    align_long_reads,
    build_long_read_storage,
    close_gaps_with_long_reads,
)
from spades_tpu.core import dna
from spades_tpu.pipeline.construction import construct_graph

K = 21


def _random_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _tile(genome, lo, hi, read_len=100, step=7):
    reads = [genome[s : s + read_len] for s in range(lo, hi - read_len + 1, step)]
    reads.append(genome[hi - read_len : hi])
    return reads


def _noisy(seq, rate, seed):
    rng = np.random.default_rng(seed)
    c = dna.encode(seq).copy()
    flip = rng.random(len(c)) < rate
    c[flip] = (c[flip] + rng.integers(1, 4, flip.sum())) % 4
    return dna.decode(c)


class TestAligner:
    def test_clean_read_single_edge(self):
        genome = _random_genome(1200, seed=1)
        g = construct_graph([genome], K).graph
        [al] = align_long_reads(g, [genome[200:900]])
        assert len(al.path) == 1
        assert al.gaps == []
        c = al.path[0]
        assert c.read_start < 30 and c.read_end > 670

    def test_noisy_read_aligns(self):
        genome = _random_genome(1200, seed=2)
        g = construct_graph([genome], K).graph
        noisy = _noisy(genome[100:1100], 0.08, seed=3)
        [al] = align_long_reads(g, [noisy])
        assert len(al.path) >= 1
        assert al.path[0].anchors >= 3

    def test_revcomp_read_aligns_to_conjugate(self):
        genome = _random_genome(900, seed=4)
        g = construct_graph([genome], K).graph
        [fwd] = align_long_reads(g, [genome[100:800]])
        [rev] = align_long_reads(g, [dna.revcomp_str(genome[100:800])])
        assert len(rev.path) == 1
        assert rev.path[0].edge == int(g.e_conj[fwd.path[0].edge])

    def test_junk_read_no_alignment(self):
        genome = _random_genome(800, seed=5)
        g = construct_graph([genome], K).graph
        junk = _random_genome(500, seed=99)
        [al] = align_long_reads(g, [junk])
        assert al.path == []

    def test_read_spanning_gap_has_gap_record(self):
        genome = _random_genome(1400, seed=6)
        reads = _tile(genome, 0, 650) + _tile(genome, 750, 1400)
        g = construct_graph(reads, K).graph
        assert len(g.canonical_edge_ids()) == 2
        [al] = align_long_reads(g, [genome[300:1100]])
        assert len(al.path) == 2
        assert len(al.gaps) == 1
        assert len(al.gaps[0].segment) > 0


class TestHybridGapClosing:
    def test_close_gap_with_long_reads(self):
        genome = _random_genome(1400, seed=7)
        reads = _tile(genome, 0, 650) + _tile(genome, 750, 1400)
        g = construct_graph(reads, K).graph
        assert len(g.canonical_edge_ids()) == 2
        longs = [genome[250:1150], genome[300:1200], genome[200:1100]]
        als = align_long_reads(g, longs)
        closed = close_gaps_with_long_reads(g, als)
        assert closed == 1
        ids = g.canonical_edge_ids()
        assert len(ids) == 1
        seq = g.edge_seq(int(ids[0]))
        assert seq == genome or seq == dna.revcomp_str(genome)
        g.check_invariants()

    def test_insufficient_support_no_close(self):
        genome = _random_genome(1400, seed=8)
        reads = _tile(genome, 0, 650) + _tile(genome, 750, 1400)
        g = construct_graph(reads, K).graph
        als = align_long_reads(g, [genome[300:1100]])
        assert close_gaps_with_long_reads(g, als, min_support=2) == 0
        assert len(g.canonical_edge_ids()) == 2


class TestStorage:
    def test_next_edge_votes_both_orientations(self):
        genome = _random_genome(1400, seed=9)
        reads = _tile(genome, 0, 650) + _tile(genome, 750, 1400)
        g = construct_graph(reads, K).graph
        als = align_long_reads(g, [genome[300:1100], genome[250:1150]])
        st = build_long_read_storage(g, als)
        assert len(st.paths) >= 2  # fwd + conj
        [al] = align_long_reads(g, [genome[300:1100]])
        e1, e2 = al.edges
        assert st.next_edge_votes(e1).get(e2, 0) == 2
        # conjugate direction sees the mirrored vote
        assert st.next_edge_votes(int(g.e_conj[e2])).get(int(g.e_conj[e1]), 0) == 2
