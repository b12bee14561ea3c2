"""Superbubble finder, complex bulge collapse, complex tips, max-flow EC."""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.graph.graph import CondensedGraph
from spades_tpu.graph.simplify_complex import (
    clip_complex_tips,
    collapse_superbubbles,
    find_superbubble,
    max_flow_ec_remover,
)
from tests.conftest import random_dna


def empty_graph(k):
    return CondensedGraph(
        k=k,
        e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
        e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
        e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
        alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
        v_conj=np.zeros(0, np.int64),
    )


def add_vertices(g, n):
    """Append n conjugate vertex pairs; returns the forward vertex ids."""
    out = []
    for _ in range(n):
        v = len(g.v_conj)
        g.v_conj = np.append(g.v_conj, [v + 1, v])
        out.append(v)
    return out


def seq(rng, core_in, core_out, mid_len, k):
    return core_in + random_dna(rng, mid_len) + core_out


def make_superbubble_graph(rng, k=5):
    """start ->(a|b)-> m1/m2 ->(c|d)-> end   (two disjoint 2-arm paths)."""
    g = empty_graph(k)
    s, m1, m2, t = add_vertices(g, 4)
    mk = lambda n: dna.encode(random_dna(rng, n))
    eA, _ = g.add_edge_pair(s, m1, mk(20), cov_sum=100.0)
    eB, _ = g.add_edge_pair(s, m2, mk(22), cov_sum=10.0)
    eC, _ = g.add_edge_pair(m1, t, mk(20), cov_sum=100.0)
    eD, _ = g.add_edge_pair(m2, t, mk(18), cov_sum=10.0)
    g.check_invariants()
    return g, (s, m1, m2, t), (eA, eB, eC, eD)


class TestSuperbubble:
    def test_find(self, rng):
        g, (s, m1, m2, t), (eA, eB, eC, eD) = make_superbubble_graph(rng)
        sb = find_superbubble(g, s, max_length=200)
        assert sb is not None
        assert sb.start == s and sb.end == t
        assert sb.inner_vertices == {m1, m2}
        assert sb.heaviest_path == [eA, eC]

    def test_no_bubble_on_linear(self, rng):
        k = 5
        g = empty_graph(k)
        a, b = add_vertices(g, 2)
        g.add_edge_pair(a, b, dna.encode(random_dna(rng, 20)))
        assert find_superbubble(g, a) is None

    def test_collapse(self, rng):
        g, (s, m1, m2, t), (eA, eB, eC, eD) = make_superbubble_graph(rng)
        n = collapse_superbubbles(g, max_length=200)
        assert n >= 2
        assert g.alive[eA] and g.alive[eC]
        assert not g.alive[eB] and not g.alive[eD]
        # coverage glued onto survivors
        assert g.e_cov[eA] > 100.0


class TestComplexTip:
    def test_clips_low_coverage_hanging_component(self, rng):
        k = 5
        g = empty_graph(k)
        a, b, c, x, y = add_vertices(g, 5)
        mk = lambda n, cov: (dna.encode(random_dna(rng, n)), cov)
        # main path a->b->c with deep coverage
        s1, c1 = mk(60, 2000.0)
        s2, c2 = mk(60, 2000.0)
        e_main1, _ = g.add_edge_pair(a, b, s1, c1)
        e_main2, _ = g.add_edge_pair(b, c, s2, c2)
        # shallow short branch b->x->y dead-ending
        s3, c3 = mk(15, 5.0)
        s4, c4 = mk(15, 5.0)
        e_t1, _ = g.add_edge_pair(b, x, s3, c3)
        e_t2, _ = g.add_edge_pair(x, y, s4, c4)
        n = clip_complex_tips(g, relative_coverage=2.0, max_edge_len=20,
                              max_path_len=50)
        assert n >= 2
        assert g.alive[e_main1] and g.alive[e_main2]
        assert not g.alive[e_t1] and not g.alive[e_t2]

    def test_keeps_deep_component(self, rng):
        k = 5
        g = empty_graph(k)
        a, b, x, y = add_vertices(g, 4)
        e_main, _ = g.add_edge_pair(a, b, dna.encode(random_dna(rng, 60)), 100.0)
        e_t1, _ = g.add_edge_pair(b, x, dna.encode(random_dna(rng, 15)), 900.0)
        e_t2, _ = g.add_edge_pair(x, y, dna.encode(random_dna(rng, 15)), 900.0)
        n = clip_complex_tips(g, relative_coverage=2.0, max_edge_len=20,
                              max_path_len=50)
        assert n == 0


class TestMaxFlowEC:
    def test_removes_shortcut_with_plausible_alternative(self, rng):
        k = 5
        g = empty_graph(k)
        a, b, c, d = add_vertices(g, 4)
        mk = lambda n: dna.encode(random_dna(rng, n))
        e_in, _ = g.add_edge_pair(a, b, mk(3000), 100.0)    # unique long
        e_alt, _ = g.add_edge_pair(b, c, mk(500), 100.0)    # plausible path
        e_bad, _ = g.add_edge_pair(b, c, mk(30), 3.0)       # short EC
        e_out, _ = g.add_edge_pair(c, d, mk(3000), 100.0)   # unique long
        n = max_flow_ec_remover(g, max_length=100, uniqueness_length=1500,
                                plausibility_length=200)
        assert n == 2  # oriented edge + its conjugate
        assert not g.alive[e_bad]
        assert g.alive[e_alt] and g.alive[e_in] and g.alive[e_out]

    def test_flow_keeps_needed_edge_despite_plausible_alternative(self, rng):
        """The flow argument must KEEP a short edge that carries irreplaceable
        flow even though a plausible alternative path exists — the case a
        bare connectivity check gets wrong (mf_ec_remover.hpp:484-487:
        incomplete flow => no deletion).  Two unique strands enter s but only
        one can leave through the plausible relay path; the short edge must
        carry the second."""
        k = 5
        g = empty_graph(k)
        a1, a2, s, p, t, d = add_vertices(g, 6)
        mk = lambda n: dna.encode(random_dna(rng, n))
        g.add_edge_pair(a1, s, mk(3000), 100.0)   # unique in #1
        g.add_edge_pair(a2, s, mk(3000), 100.0)   # unique in #2
        e_bad, _ = g.add_edge_pair(s, t, mk(30), 3.0)   # short, flow-needed
        g.add_edge_pair(s, p, mk(500), 100.0)     # plausible relay 1
        g.add_edge_pair(p, t, mk(500), 100.0)     # plausible relay 2
        g.add_edge_pair(t, d, mk(3000), 200.0)    # unique out
        n = max_flow_ec_remover(g, max_length=100, uniqueness_length=1500,
                                plausibility_length=200)
        assert n == 0
        assert g.alive[e_bad]

    def test_flow_removes_zero_flow_edge_in_balanced_component(self, rng):
        """Balanced component where the short edge carries no flow in any
        maximum flow: residual SCC colouring separates its endpoints."""
        k = 5
        g = empty_graph(k)
        a, b, c, d, x, y = add_vertices(g, 6)
        mk = lambda n: dna.encode(random_dna(rng, n))
        g.add_edge_pair(a, b, mk(3000), 100.0)    # unique in at b
        g.add_edge_pair(b, c, mk(500), 100.0)     # plausible carrier
        e_bad, _ = g.add_edge_pair(b, c, mk(40), 2.0)   # chimeric shortcut
        g.add_edge_pair(c, d, mk(3000), 100.0)    # unique out at c
        n = max_flow_ec_remover(g, max_length=100, uniqueness_length=1500,
                                plausibility_length=200)
        assert n == 2
        assert not g.alive[e_bad]

    def test_keeps_edge_without_alternative(self, rng):
        k = 5
        g = empty_graph(k)
        a, b, c, d = add_vertices(g, 4)
        mk = lambda n: dna.encode(random_dna(rng, n))
        g.add_edge_pair(a, b, mk(3000), 100.0)
        e_bad, _ = g.add_edge_pair(b, c, mk(30), 3.0)
        g.add_edge_pair(c, d, mk(3000), 100.0)
        n = max_flow_ec_remover(g, max_length=100, uniqueness_length=1500,
                                plausibility_length=200)
        assert n == 0
        assert g.alive[e_bad]


class TestDominatedComplexBulge:
    def _build(self, rng):
        from tests.conftest import random_dna

        P, Q, T = random_dna(rng, 300), random_dna(rng, 300), random_dna(rng, 400)
        A, B = random_dna(rng, 80), random_dna(rng, 90)
        C = random_dna(rng, 170)          # |C| = |A| + |B|: level-consistent
        seqs = [P + A + B + Q] * 3 + [P + C + Q] + [P + A + T] * 2
        from spades_tpu.pipeline.construction import construct_graph

        return construct_graph(seqs, 21).graph, (P, A, B, Q, T, C)

    def test_multi_exit_component_projected(self, rng):
        from spades_tpu.graph.simplify_complex import (
            collapse_superbubbles,
            remove_complex_bulges,
        )

        g, (P, A, B, Q, T, C) = self._build(rng)
        e0 = g.num_edges
        # the superbubble pass cannot close this component: the inner
        # branch vertex has an exit (the T path)
        assert collapse_superbubbles(g, max_length=205) == 0
        n = remove_complex_bulges(g, max_length=205, length_diff=5)
        assert n > 0
        g.check_invariants()
        # the C arm is gone: its middle is no longer spelled anywhere
        probe = C[80:120]
        rc = {e: g.edge_seq(int(e)) for e in g.alive_edge_ids()}
        assert not any(probe in s for s in rc.values())
        # the surviving arm and the T branch still spell their genomes
        from spades_tpu.core import dna as _dna

        def spelled(sub):
            return any(
                sub in s or sub in _dna.revcomp_str(s) for s in rc.values()
            )

        # probes inside single edges (junction-crossing substrings span the
        # k-overlap and never live in one edge sequence)
        assert spelled(A[10:70])
        assert spelled(B[10:80])
        assert spelled(T[50:150])

    def test_rejects_length_inconsistent_arm(self, rng):
        from tests.conftest import random_dna

        from spades_tpu.graph.simplify_complex import remove_complex_bulges
        from spades_tpu.pipeline.construction import construct_graph

        P, Q, T = random_dna(rng, 300), random_dna(rng, 300), random_dna(rng, 400)
        A, B = random_dna(rng, 80), random_dna(rng, 90)
        C = random_dna(rng, 120)          # 50 nt shorter: NOT projectable
        seqs = [P + A + B + Q] * 3 + [P + C + Q] + [P + A + T] * 2
        g = construct_graph(seqs, 21).graph
        e0 = g.num_edges
        n = remove_complex_bulges(g, max_length=205, length_diff=5)
        assert n == 0
        assert g.num_edges == e0
