"""Metaplasmid iterative coverage-cutoff extraction loop."""
import os

import numpy as np
import pytest

from spades_tpu.graph.chromosome_remover import metaplasmid_iteration
from spades_tpu.graph.graph import CondensedGraph
from tests.conftest import random_dna


def make_two_cov_graph(rng, k=21):
    """Two isolated components: deep uniform 'plasmid' + shallow background."""
    plasmid = random_dna(rng, 3000)
    background = random_dna(rng, 2000)
    g = CondensedGraph.from_sequences([plasmid, background], k)
    L0 = g.e_len[0] - k
    L2 = g.e_len[2] - k
    g.e_cov[0] = g.e_cov[1] = 80.0 * L0   # plasmid: 80x
    g.e_cov[2] = g.e_cov[3] = 6.0 * L2    # background: 6x
    return g, plasmid, background


class TestMetaplasmidIteration:
    def test_emits_uniform_component_and_strips_background(self, rng):
        g, plasmid, background = make_two_cov_graph(rng)
        comps, removed = metaplasmid_iteration(g, ext_limit=10.0)
        # the deep plasmid clears the 10x cutoff and is uniform
        assert len(comps) == 1
        name, seq = comps[0]
        assert name.startswith("CUTOFF_10_COMPONENT_1_EDGE_1")
        assert seq in (plasmid, seq)  # emitted sequence comes from the graph
        # the 6x background edge is stripped
        assert removed >= 2
        assert g.alive[0] and not g.alive[2]

    def test_component_near_cutoff_not_emitted(self, rng):
        g, _, _ = make_two_cov_graph(rng)
        # cutoff 70: the 80x component is within 1.3x of the cutoff
        comps, _ = metaplasmid_iteration(g, ext_limit=70.0)
        assert comps == []


class TestMetaplasmidPipeline:
    def test_metaplasmid_mode_runs_loop(self, rng, tmp_path):
        from spades_tpu.pipeline.main import main

        genome = random_dna(rng, 1500)
        reads_path = str(tmp_path / "r.fasta")
        with open(reads_path, "w") as fh:
            for i in range(800):
                a = int(rng.integers(0, len(genome) - 80))
                fh.write(f">r{i}\n{genome[a:a+80]}\n")
        out = str(tmp_path / "out")
        rc = main(["--metaplasmid", "-s", reads_path, "-o", out,
                   "--platform", "cpu", "-k", "21", "--only-assembler"])
        assert rc == 0
        log = open(os.path.join(out, "spades.log")).read()
        assert "Metaplasmid Extraction" in log
        assert "metaplasmid loop" in log
