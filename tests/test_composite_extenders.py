"""Composite extender chain + loop traverser tests.

Mirrors the reference's per-library extender ordering
(`path_extend/pipeline/extenders_logic.cpp:469-548`), the RNA coverage
chooser (`extension_chooser.hpp:284-396`), the long-edge (mate-pair) chooser
(:603-628), and LoopTraverser (`loop_traverser.{hpp,cpp}`)."""
from __future__ import annotations

import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.graph.graph import CondensedGraph
from spades_tpu.paired.paired_info import PairedIndex
from spades_tpu.paired.path_extend import (
    CoverageChooser,
    LongReadChooser,
    PEChooser,
    PEConfig,
    Path,
    _extend_step,
    make_chooser_chain,
    traverse_loops,
)
from tests.conftest import random_dna


def _empty(k=5):
    return CondensedGraph(
        k=k,
        e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
        e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
        e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
        alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
        v_conj=np.zeros(0, np.int64),
    )


def _v(g, n):
    return [g.add_vertex_pair()[0] for _ in range(n)]


def _e(g, rng, a, b, nt, cov=50.0):
    e, _ = g.add_edge_pair(a, b, dna.encode(random_dna(rng, nt)), cov * nt)
    return e


def _empty_pi():
    z = np.zeros(0)
    return PairedIndex(z.astype(np.int64), z.astype(np.int64), z, z)


def _x_junction(rng, cov_in=(100.0, 10.0), cov_out=(100.0, 10.0)):
    """Two transcripts crossing at a 2-in/2-out repeat: in1/in2 -> R -> out1/out2."""
    g = _empty()
    a1, a2, m0, m1, b1, b2 = _v(g, 6)
    e_in1 = _e(g, rng, a1, m0, 300, cov_in[0])
    e_in2 = _e(g, rng, a2, m0, 300, cov_in[1])
    e_rep = _e(g, rng, m0, m1, 60, cov_in[0] + cov_in[1])
    e_out1 = _e(g, rng, m1, b1, 300, cov_out[0])
    e_out2 = _e(g, rng, m1, b2, 300, cov_out[1])
    return g, (e_in1, e_in2, e_rep, e_out1, e_out2)


class TestCoverageChooser:
    def test_ss_coverage_resolves_rna_junction(self, rng):
        """PE info empty -> the single chooser stops at the repeat; the SS
        coverage chooser routes the high-coverage transcript through."""
        g, (e_in1, e_in2, e_rep, e_out1, e_out2) = _x_junction(rng)
        ss = np.zeros(g.alive.shape[0])
        for e, c in ((e_in1, 100.0), (e_in2, 10.0), (e_rep, 110.0),
                     (e_out1, 100.0), (e_out2, 10.0)):
            ss[e] = c
            ss[g.e_conj[e]] = 0.5  # antisense noise
        cfg = PEConfig()
        # single PE chooser over empty info: stuck at the 2-way split
        p = Path([e_in1, e_rep])
        assert not _extend_step(g, p, cfg, [PEChooser(_empty_pi())])
        assert p.edges == [e_in1, e_rep]
        # composite with the coverage chooser: resolves to the matching side
        p2 = Path([e_in1, e_rep])
        chain = [PEChooser(_empty_pi()), CoverageChooser(ss)]
        assert _extend_step(g, p2, cfg, chain)
        assert p2.edges == [e_in1, e_rep, e_out1]
        # and the low-coverage transcript picks the low side
        p3 = Path([e_in2, e_rep])
        assert _extend_step(g, p3, cfg, chain)
        assert p3.edges == [e_in2, e_rep, e_out2]

    def test_similar_coverages_stay_ambiguous(self, rng):
        g, (e_in1, e_in2, e_rep, e_out1, e_out2) = _x_junction(rng)
        ss = np.full(g.alive.shape[0], 50.0)
        p = Path([e_in1, e_rep])
        assert not _extend_step(
            g, p, PEConfig(), [PEChooser(_empty_pi()), CoverageChooser(ss)]
        )


class TestMatePairChooser:
    def test_long_range_mp_resolves_where_pe_cannot(self, rng):
        """A long repeat: PE pairs never span it, mate pairs do.  The
        LongEdgePE chooser (path edges < 200 nt excluded) must route using
        the long flank only."""
        g = _empty()
        a1, a2, m0, m1, b1, b2 = _v(g, 6)
        e_in1 = _e(g, rng, a1, m0, 600)
        e_in2 = _e(g, rng, a2, m0, 600)
        e_rep = _e(g, rng, m0, m1, 800)
        e_out1 = _e(g, rng, m1, b1, 600)
        e_out2 = _e(g, rng, m1, b2, 600)
        # mate-pair info: (e_in1 -> e_out1) at distance ~ len(in1)+len(rep)
        lens = g.edge_kmer_lengths()
        d = float(lens[e_in1] + lens[e_rep])
        pi = PairedIndex(
            np.array([e_in1], np.int64), np.array([e_out1], np.int64),
            np.array([d]), np.array([40.0]),
        )
        cfg = PEConfig(insert_size=250.0, is_var=30.0)
        # plain PE chooser with PE-sized insert: pairs can't span 800 nt
        p = Path([e_in1, e_rep])
        assert not _extend_step(g, p, cfg, [PEChooser(_empty_pi())])
        # mate-pair chooser with MP insert size sees across
        mp = PEChooser(pi, insert_size=2000.0, is_var=200.0,
                       min_path_edge_nt=200)
        p2 = Path([e_in1, e_rep])
        assert _extend_step(g, p2, cfg, [PEChooser(_empty_pi()), mp])
        assert p2.edges == [e_in1, e_rep, e_out1]


class TestChainOrder:
    def test_reference_order(self):
        class LR:  # minimal long-read storage stub
            def next_edge_votes(self, last):
                return {}

        st = type("S", (), {"median": 300.0, "mad": 20.0, "count": 100})()
        chain = make_chooser_chain(
            pair_libs=[("paired-end", _empty_pi(), st),
                       ("mate-pairs", _empty_pi(), st)],
            long_reads=LR(),
            ss_cov=np.zeros(4),
            mode="rna",
        )
        kinds = [type(c).__name__ for c in chain]
        assert kinds[0] == "LongReadChooser"
        assert kinds[1] == "PEChooser" and chain[1].rna
        assert kinds[2] == "PEChooser" and chain[2].min_path_edge_nt == 200
        assert kinds[3] == "CoverageChooser"


class TestLoopTraverser:
    def test_joins_paths_across_small_loop_component(self, rng):
        """long A -> [small loop component] -> long B with one entrance and
        one exit: the two covering paths must be joined through the
        component's connecting path."""
        g = _empty()
        a0, a1, c0, c1, b0, b1 = _v(g, 6)
        e_A = _e(g, rng, a0, a1, 2000)
        e_start = _e(g, rng, a1, c0, 100)   # entrance (short)
        e_mid = _e(g, rng, c0, c1, 80)      # inside
        e_loop = _e(g, rng, c1, c0, 90)     # back edge (the loop)
        e_end = _e(g, rng, c1, b0, 100)     # exit (short)
        e_B = _e(g, rng, b0, b1, 2000)
        paths = [Path([e_A, e_start]), Path([e_end, e_B])]
        n = traverse_loops(g, paths, PEConfig())
        assert n == 1
        assert len(paths) == 1
        p = paths[0]
        assert p.edges[0] == e_A and p.edges[-1] == e_B
        assert e_start in p.edges and e_end in p.edges

    def test_two_entrances_not_joined(self, rng):
        """A component with TWO entrance edges is not a traversable loop
        (FindStart returns null on the second entrance)."""
        g = _empty()
        a0, a1, c0, c1, b0, b1, x0 = _v(g, 7)
        e_A = _e(g, rng, a0, a1, 2000)
        e_A2 = _e(g, rng, x0, c0, 2000)  # second entrance into the component
        e_start = _e(g, rng, a1, c0, 100)
        e_mid = _e(g, rng, c0, c1, 80)
        e_loop = _e(g, rng, c1, c0, 90)
        e_end = _e(g, rng, c1, b0, 100)
        e_B = _e(g, rng, b0, b1, 2000)
        paths = [Path([e_A, e_start]), Path([e_A2]), Path([e_end, e_B])]
        assert traverse_loops(g, paths, PEConfig()) == 0
