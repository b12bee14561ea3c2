"""Property tests over randomly generated graphs (random_graph.hpp pattern)."""
import numpy as np
import pytest

from tests.conftest import random_condensed_graph


@pytest.mark.parametrize("seed", [1, 7, 13])
def test_invariants_survive_simplification(seed):
    from spades_tpu.graph.compress import compress
    from spades_tpu.graph.simplify import SimplifyConfig, simplify

    rng = np.random.default_rng(seed)
    g = random_condensed_graph(rng)
    g.check_invariants()
    n_before = g.num_edges
    g2, stats = simplify(g, None, SimplifyConfig())
    g2.check_invariants()
    assert g2.num_edges <= n_before
    # every surviving edge still spells a valid sequence of its length
    for e in g2.canonical_edge_ids()[:10]:
        assert len(g2.edge_codes(int(e))) == g2.e_len[e]


@pytest.mark.parametrize("seed", [3, 9])
def test_random_graph_roundtrips_gfa(seed, tmp_path):
    from spades_tpu.graph.from_gfa import graph_from_gfa
    from spades_tpu.io.gfa import read_gfa, write_gfa

    rng = np.random.default_rng(seed)
    g = random_condensed_graph(rng)
    path = str(tmp_path / "g.gfa")
    write_gfa(path, g)
    g2 = graph_from_gfa(read_gfa(path), g.k)
    g2.check_invariants()
    assert g2.num_edges == g.num_edges
    seqs1 = sorted(g.edge_seq(int(e)) for e in g.canonical_edge_ids())
    seqs2 = sorted(g2.edge_seq(int(e)) for e in g2.canonical_edge_ids())
    # sequences match up to strand choice
    from spades_tpu.core import dna
    canon = lambda s: min(s, dna.revcomp_str(s))
    assert sorted(map(canon, seqs1)) == sorted(map(canon, seqs2))
