"""BinSPreader-equivalent label propagation tests."""
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.graph.binning import BinningConfig, propagate_labels, refine_binning
from spades_tpu.pipeline.construction import construct_graph

K = 21


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _two_component_graph():
    """Two disconnected chains, each broken into 2 adjacent edges by a
    midpoint branch-free coverage gap trick: instead just use two separate
    sequences with an internal repeat-free junction via a shared k-mer fork.

    Simpler: two components, each a pair of edges joined at a vertex, built
    from two sequences with one SNP bulge each."""
    a = _random_seq(900, seed=1)
    b = _random_seq(900, seed=2)
    # create a fork in each: two variants differing at one position make a
    # bulge -> >=2 edges sharing vertices per component
    a2 = a[:450] + ("A" if a[450] != "A" else "C") + a[451:]
    b2 = b[:450] + ("A" if b[450] != "A" else "C") + b[451:]
    g = construct_graph([a, a2, b, b2], K).graph
    return g, a, b


class TestPropagation:
    def test_labels_spread_within_component(self):
        g, a, b = _two_component_graph()
        ids = [int(e) for e in g.canonical_edge_ids()]
        assert len(ids) >= 4
        # find one edge of component A (sequence substring) and label it
        def in_genome(e, genome):
            s = g.edge_seq(e)[:30]
            return s in genome or dna.revcomp_str(g.edge_seq(e))[:30] in genome

        # the SNP-bulge variant edges belong to neither clean genome string;
        # classify only unambiguous edges
        comp_a = [e for e in ids if in_genome(e, a) and not in_genome(e, b)]
        comp_b = [e for e in ids if in_genome(e, b) and not in_genome(e, a)]
        assert comp_a and comp_b
        state = propagate_labels(g, {comp_a[0]: 0, comp_b[0]: 1}, 2)
        for e in comp_a:
            assert state[e, 0] >= state[e, 1], f"edge {e} leaked to bin 1"
        for e in comp_b:
            assert state[e, 1] >= state[e, 0], f"edge {e} leaked to bin 0"

    def test_empty_graph(self):
        g, *_ = _two_component_graph()
        g.kill_edges(g.alive_edge_ids())
        state = propagate_labels(g, {}, 2)
        assert state.shape[1] == 2


class TestBinspreaderTool:
    def test_cli_roundtrip(self, tmp_path):
        from spades_tpu.io.gfa import write_gfa
        from spades_tpu.tools import binspreader

        g, a, b = _two_component_graph()
        gfa = str(tmp_path / "g.gfa")
        write_gfa(gfa, g)
        # label the largest two segments with different bins
        ids = sorted((int(e) for e in g.canonical_edge_ids()),
                     key=lambda e: -int(g.e_len[e]))
        names = [str(e) for e in ids[:2]]
        tsv = str(tmp_path / "binning.tsv")
        with open(tsv, "w") as fh:
            fh.write(f"{names[0]}\tbinA\n{names[1]}\tbinB\n")
        wd = str(tmp_path / "out")
        assert binspreader.main([gfa, tsv, "-w", wd]) == 0
        rows = dict(
            l.split("\t") for l in open(os.path.join(wd, "binning.tsv")).read().strip().split("\n")
        )
        assert rows[names[0]] == "binA"
        assert rows[names[1]] == "binB"
        assert len(rows) >= 4  # unlabelled contigs got assignments


class TestLinkIndexAndStrategies:
    """BinSPreader depth (VERDICT r4 missing #7): link index, assignment
    strategies, alpha propagation, read splitting."""

    def _mapped_graph(self):
        from spades_tpu.alignment.mapper import build_edge_index, map_read_batch

        g, a, b = _two_component_graph()
        idx = build_edge_index(g)
        # paired reads bridging the two components (Hi-C-like links): mate 1
        # from sequence a, mate 2 from sequence b
        r1 = [a[i : i + 60] for i in range(0, 200, 10)]
        r2 = [b[i : i + 60] for i in range(0, 200, 10)]
        m1 = map_read_batch(idx, g, r1)
        m2 = map_read_batch(idx, g, r2)
        return g, a, b, m1, m2

    def test_link_index_symmetric_unique(self):
        from spades_tpu.graph.binning import build_link_index

        g, a, b, m1, m2 = self._mapped_graph()
        li = build_link_index(g, m1, m2)
        assert li.src.size == li.dst.size == li.weight.size
        assert li.num_links >= 1
        # symmetry: every (s, d, w) has its mirror
        fwd = set(zip(li.src.tolist(), li.dst.tolist(), li.weight.tolist()))
        rev = set(zip(li.dst.tolist(), li.src.tolist(), li.weight.tolist()))
        assert fwd == rev

    def test_links_bridge_components(self):
        """With Hi-C links, labels cross components they could never reach
        through graph adjacency alone."""
        from spades_tpu.graph.binning import (
            build_link_index,
            propagate_labels_linked,
        )

        g, a, b, m1, m2 = self._mapped_graph()
        li = build_link_index(g, m1, m2)
        ids = sorted((int(e) for e in g.canonical_edge_ids()),
                     key=lambda e: -int(g.e_len[e]))
        seqs = {e: g.edge_seq(e) for e in ids}
        a_edge = next(e for e in ids if seqs[e][:60] in a or dna.revcomp_str(seqs[e])[:60] in a)
        initial = {a_edge: 0}
        no_links = propagate_labels_linked(g, initial, 1, links=None)
        with_links = propagate_labels_linked(g, initial, 1, links=li)
        b_edges = [e for e in ids if seqs[e][:60] in b or dna.revcomp_str(seqs[e])[:60] in b]
        assert any(with_links[e, 0] > no_links[e, 0] + 1e-6 for e in b_edges)

    def test_assignment_strategies(self):
        from spades_tpu.graph.binning import assign_bins

        state = np.array([
            [0.8, 0.2],
            [0.5, 0.5],
            [0.0, 0.0],
            [0.4, 0.6],
        ])
        maj = assign_bins(state, "majority_length")
        assert maj == [{0}, {0, 1}, set(), {1}]
        ml = assign_bins(state, "max_likelihood", thr=0.35)
        assert ml == [{0}, {0, 1}, set(), {0, 1}]

    def test_scaffold_bins_majority_length(self):
        from spades_tpu.graph.binning import assign_scaffold_bins

        lens = np.array([100, 300, 50])
        edge_bins = [{0}, {1}, set()]
        state = np.array([[0.9, 0.1], [0.2, 0.8], [0.0, 0.0]])
        v = assign_scaffold_bins([0, 1, 2], edge_bins, state, lens, 2)
        assert np.isclose(v[0], 100 / 400) and np.isclose(v[1], 300 / 400)

    def test_alpha_mask_dampens_far_edges(self):
        from spades_tpu.graph.binning import alpha_mask

        g, a, b, m1, m2 = self._mapped_graph()
        ids = sorted((int(e) for e in g.canonical_edge_ids()),
                     key=lambda e: -int(g.e_len[e]))
        seqs = {e: g.edge_seq(e) for e in ids}
        a_edges = {e for e in ids if seqs[e][:60] in a or dna.revcomp_str(seqs[e])[:60] in a}
        alpha = alpha_mask(g, a_edges, metaalpha=0.6)
        b_edges = [
            e for e in ids
            if seqs[e][:60] in b or dna.revcomp_str(seqs[e])[:60] in b
        ]
        assert b_edges
        # binned component keeps (near) full alpha; the other is damped
        assert max(alpha[e] for e in a_edges) > 0.5
        assert all(alpha[e] < 0.2 for e in b_edges)

    def test_split_reads(self):
        from spades_tpu.graph.binning import assign_bins, build_link_index, split_reads
        from spades_tpu.graph.binning import propagate_labels_linked

        g, a, b, m1, m2 = self._mapped_graph()
        ids = sorted((int(e) for e in g.canonical_edge_ids()),
                     key=lambda e: -int(g.e_len[e]))
        seqs = {e: g.edge_seq(e) for e in ids}
        a_edge = next(e for e in ids if seqs[e][:60] in a or dna.revcomp_str(seqs[e])[:60] in a)
        b_edge = next(e for e in ids if seqs[e][:60] in b or dna.revcomp_str(seqs[e])[:60] in b)
        state = propagate_labels_linked(g, {a_edge: 0, b_edge: 1}, 2)
        bins = assign_bins(state)
        buckets = split_reads(g, m1, bins)
        assert 0 in buckets and len(buckets[0]) > 0
        # reads of mate set 1 all map to component a -> bin 0 only
        assert 1 not in buckets or not buckets[1]
