"""Dijkstra-path bulge removal + relative-coverage disconnector tests
(bulge_remover.hpp Dijkstra variant, relative_coverage_remover.hpp)."""
import numpy as np

from spades_tpu.core import dna
from spades_tpu.graph.simplify import (
    SimplifyConfig,
    disconnect_relative_coverage,
    remove_bulges_dijkstra,
)
from spades_tpu.pipeline.construction import construct_graph

K = 21


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _mut(s, pos):
    c = dna.encode(s).copy()
    c[pos] = (c[pos] + 1) % 4
    return dna.decode(c)


class TestDijkstraBulge:
    def test_path_alternative_bulge_removed(self):
        # three haplotypes: ref A (high cov), B = SNP at p (mid cov),
        # C = SNPs at p and p+40 (low cov).  Between the divergence points the
        # C arm's alternative goes through B's sub-path -> a PATH alternative,
        # not a parallel edge.
        a = _random_seq(600, 1)
        b = _mut(a, 300)
        c = _mut(b, 340)
        reads = [a] * 10 + [b] * 6 + [c]
        g = construct_graph(reads, K).graph
        before = len(g.canonical_edge_ids())
        n = remove_bulges_dijkstra(g, SimplifyConfig())
        assert n >= 1, "no path-alternative bulge removed"
        after = len(g.canonical_edge_ids())
        assert after < before

    def test_no_alternative_no_removal(self):
        a = _random_seq(500, 2)
        g = construct_graph([a], K).graph
        assert remove_bulges_dijkstra(g, SimplifyConfig()) == 0


class TestRelativeCoverage:
    def test_chimeric_join_disconnected(self):
        x = _random_seq(800, 3)
        y = _random_seq(800, 4)
        chimera = x[300:360] + y[400:460]
        reads = (
            [x[i : i + 100] for i in range(0, 701, 4)]
            + [x[700:800]]
            + [y[i : i + 100] for i in range(0, 701, 4)]
            + [y[700:800]]
            + [chimera] * 2
        )
        g = construct_graph(reads, K).graph
        # the chimeric junction must currently bridge x and y
        n = disconnect_relative_coverage(g, ratio=5.0)
        assert n >= 1, "chimeric join not disconnected"

    def test_uniform_coverage_untouched(self):
        x = _random_seq(600, 5)
        v = _mut(x, 300)
        g = construct_graph([x] * 5 + [v] * 5, K).graph
        # balanced bulge arms: neither side is 5x below the flow
        assert disconnect_relative_coverage(g, ratio=5.0) == 0
