"""Pair-info improver + flanking coverage tests.

Mirrors PairInfoImprover (`paired_info/pair_info_improver.hpp`) and
FlankingCoverage (`assembly_graph/graph_support/detail_coverage.hpp`)."""
from __future__ import annotations

import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.graph.graph import CondensedGraph
from spades_tpu.paired.paired_info import PairedIndex
from spades_tpu.paired.pair_info_improver import improve_paired_info
from tests.conftest import random_dna


def _chain_graph(rng, seg_lens, k=5):
    """Linear chain v0 -e0-> v1 -e1-> v2 ... with given kmer lengths."""
    g = CondensedGraph(
        k=k,
        e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
        e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
        e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
        alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
        v_conj=np.zeros(0, np.int64),
    )
    vs = [g.add_vertex_pair()[0] for _ in range(len(seg_lens) + 1)]
    es = []
    for i, L in enumerate(seg_lens):
        e, _ = g.add_edge_pair(
            vs[i], vs[i + 1], dna.encode(random_dna(rng, L + k)), 50.0 * (L + 1)
        )
        es.append(e)
    return g, es


def _pi(g, rows):
    e1, e2, d, w = map(np.array, zip(*rows))
    # conjugate symmetrization as build_paired_index does
    lens = g.edge_kmer_lengths()
    ce1 = g.e_conj[e2.astype(np.int64)]
    ce2 = g.e_conj[e1.astype(np.int64)]
    cd = d + lens[e1.astype(np.int64)] - lens[e2.astype(np.int64)]
    E1 = np.concatenate([e1, ce1]).astype(np.int64)
    E2 = np.concatenate([e2, ce2]).astype(np.int64)
    D = np.concatenate([d, cd]).astype(float)
    W = np.concatenate([w, w]).astype(float)
    order = np.lexsort((D, E2, E1))
    return PairedIndex(E1[order], E2[order], D[order], W[order])


class TestRemoveContradictional:
    def test_contradictory_pair_removed(self, rng):
        """base long edge with partners whose distance gap admits no path:
        the lighter point must be deleted (IsConsistent false branch)."""
        # chain: base(8000) -> A(30) -> B(40); and a detached edge X
        g, es = _chain_graph(rng, [8000, 30, 40])
        base, A, B = es
        x0, _ = g.add_vertex_pair()
        x1, _ = g.add_vertex_pair()
        X, _ = g.add_edge_pair(x0, x1, dna.encode(random_dna(rng, 45)), 100.0)
        # consistent: A at 8000 (right after base), B at 8030
        # contradictory: X at 8010 — no path of length ~10-30 from A to X
        pi = _pi(g, [
            (base, A, 8000.0, 10.0),
            (base, B, 8030.0, 10.0),
            (base, X, 8010.0, 1.0),
        ])
        out, stats = improve_paired_info(
            g, pi, insert_size=200.0, is_var=10.0, max_repeat_length=5000,
            var=5.0,
        )
        assert stats.removed > 0
        kept = set(zip(out.e1.tolist(), out.e2.tolist()))
        assert (base, A) in kept and (base, B) in kept
        assert (base, X) not in kept

    def test_consistent_info_survives(self, rng):
        g, es = _chain_graph(rng, [8000, 30, 40])
        base, A, B = es
        pi = _pi(g, [
            (base, A, 8000.0, 10.0),
            (base, B, 8030.0, 10.0),
        ])
        out, stats = improve_paired_info(
            g, pi, insert_size=200.0, is_var=10.0, max_repeat_length=5000,
            var=5.0,
        )
        assert stats.removed == 0
        kept = set(zip(out.e1.tolist(), out.e2.tolist()))
        assert (base, A) in kept and (base, B) in kept


class TestFillMissing:
    def test_forced_path_infers_intermediate_info(self, rng):
        """base -> A -> B chain with info only for (base, B): the forced
        backward walk must add (base, A) at the interpolated distance
        (SplitPathConstructor semantics)."""
        g, es = _chain_graph(rng, [8000, 30, 40])
        base, A, B = es
        pi = _pi(g, [(base, B, 8030.0, 7.0)])
        out, stats = improve_paired_info(
            g, pi, insert_size=300.0, is_var=20.0, max_repeat_length=5000,
            var=5.0,
        )
        assert stats.added > 0
        rows = {
            (a, b): d for a, b, d in zip(out.e1.tolist(), out.e2.tolist(),
                                         out.dist.tolist())
        }
        assert (base, A) in rows
        assert abs(rows[(base, A)] - 8000.0) < 6.0


class TestFlankingCoverage:
    def test_flank_changes_relative_coverage_decision(self, rng):
        """A long edge with a weak junction flank: whole-edge average says
        keep the chimeric link, the flank says disconnect (the honest local
        signal — LocalCoverage, relative_coverage_remover.hpp:240)."""
        from spades_tpu.graph.flanking import FlankingCoverage
        from spades_tpu.graph.simplify import disconnect_relative_coverage

        k = 5
        g, es = _chain_graph(rng, [60, 8, 60])
        a, mid, b = es
        # strong parallel flows at both junctions
        s0, s1 = int(g.e_start[mid]), int(g.e_end[mid])
        g.add_edge_pair(s0, int(g.add_vertex_pair()[0]),
                        dna.encode(random_dna(rng, 40)), 4000.0)
        g.add_edge_pair(int(g.add_vertex_pair()[0]), s1,
                        dna.encode(random_dna(rng, 40)), 4000.0)
        # whole-edge avg of mid is high (it was built with cov 50*(len+1));
        # give it a high total but WEAK flanks
        raw = np.zeros(g.alive.shape[0])
        raw[:] = 1000.0
        raw[mid] = 2.0 * min(int(g.edge_kmer_lengths()[mid]), 50)  # weak flank
        raw[g.e_conj[mid]] = raw[mid]
        fl = FlankingCoverage(averaging_range=50, raw=raw)
        import copy

        g_whole = copy.deepcopy(g)
        n_whole = disconnect_relative_coverage(g_whole, ratio=5.0)
        g_flank = copy.deepcopy(g)
        n_flank = disconnect_relative_coverage(g_flank, ratio=5.0, flanking=fl)
        assert n_flank > 0, "flank signal must disconnect the weak junction"
        assert g_flank.alive[mid] == False  # noqa: E712
        assert n_whole == 0, "whole-edge average must miss it (the fixture)"

    def test_build_flanking_from_counts(self, rng):
        from spades_tpu.graph.flanking import build_flanking
        from spades_tpu.pipeline.construction import construct_graph
        from tests.conftest import random_dna as rd

        genome = rd(rng, 2000)
        reads = [genome[i:i + 100] for i in range(0, 1900, 4)]
        res = construct_graph(reads, 21)
        fl = build_flanking(res.graph, res.p1_counts.words, res.p1_counts.counts)
        ids = res.graph.alive_edge_ids()
        # flanks are positive and bounded by range * max multiplicity
        start = fl.cov_of_start(res.graph, ids)
        assert np.all(start > 0)
        # conjugate symmetry: end flank of e == start flank of conj(e)
        assert np.allclose(
            fl.cov_of_end(res.graph, ids),
            fl.cov_of_start(res.graph, res.graph.e_conj[ids]),
        )
