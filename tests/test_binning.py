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
