"""Edge position handler (VERDICT r4 missing #8; reference
handlers/edges_position_handler.hpp)."""
import numpy as np

from spades_tpu.core import dna
from spades_tpu.graph.positions import fill_positions
from spades_tpu.pipeline.construction import construct_graph
from tests.conftest import random_dna

K = 21


class TestFillPositions:
    def test_single_edge_full_interval(self):
        rng = np.random.default_rng(1)
        genome = random_dna(rng, 500)
        g = construct_graph([genome], K).graph
        pos = fill_positions(g, {"ref": genome})
        [e] = [int(e) for e in g.canonical_edge_ids()]
        ps = pos.positions_of(e) or pos.positions_of(int(g.e_conj[e]))
        assert len(ps) == 1
        p = ps[0]
        assert p.ref_start == 0 and p.ref_end == 500
        assert p.edge_end - p.edge_start == 500
        assert "ref" in str(p)

    def test_positions_survive_simplification(self):
        """The recompute design: labels stay correct on ANY graph state —
        here after tips are clipped and chains compressed."""
        rng = np.random.default_rng(2)
        genome = random_dna(rng, 2000)
        reads = [genome[i : i + 100] for i in range(0, 1900, 2)]
        reads += [genome[500:580] + "ACGT" * 5]  # junk tail -> tip
        res = construct_graph(reads, K)
        from spades_tpu.graph.coverage_model import GenomicInfo
        from spades_tpu.graph.simplify import SimplifyConfig, simplify

        info = GenomicInfo(2.0, 5.0, 40.0, 2000)
        g2, _ = simplify(res.graph, info, SimplifyConfig(read_length=100))
        pos = fill_positions(g2, {"genome": genome})
        covered = 0
        for e in g2.canonical_edge_ids():
            for p in pos.positions_of(int(e)) + pos.positions_of(int(g2.e_conj[e])):
                covered += p.ref_end - p.ref_start
        assert covered >= 1900   # nearly the whole genome labelled

    def test_two_references_distinct_names(self):
        rng = np.random.default_rng(3)
        a = random_dna(rng, 400)
        b = random_dna(rng, 400)
        g = construct_graph([a, b], K).graph
        pos = fill_positions(g, {"A": a, "B": b})
        names = set()
        for e in g.canonical_edge_ids():
            for p in pos.positions_of(int(e)) + pos.positions_of(int(g.e_conj[e])):
                names.add(p.name)
        assert names == {"A", "B"}

    def test_reverse_strand_interval(self):
        rng = np.random.default_rng(4)
        genome = random_dna(rng, 300)
        g = construct_graph([genome], K).graph
        pos = fill_positions(g, {"rc": dna.revcomp_str(genome)})
        total = sum(
            p.ref_end - p.ref_start
            for e in g.canonical_edge_ids()
            for p in pos.positions_of(int(e)) + pos.positions_of(int(g.e_conj[e]))
        )
        assert total == 300
