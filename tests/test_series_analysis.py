"""Series analysis: edge profiles, bin abundance inference, aggressive clearing."""
import os

import numpy as np
import pytest

from spades_tpu.graph.graph import CondensedGraph
from spades_tpu.mts.multiplicity import profiles_from_read_sets
from spades_tpu.mts.series_analysis import (
    SeriesAnalysisConfig,
    aggressive_clearing,
    cosine_sim,
    edge_profiles,
    infer_bin_abundance,
    run_series_analysis,
)
from tests.conftest import random_dna


def reads_from(seq, n, rlen, rng):
    return [seq[s : s + rlen] for s in rng.integers(0, max(1, len(seq) - rlen), n)]


@pytest.fixture
def setup(rng):
    k = 21
    g1 = random_dna(rng, 400)  # "bin" genome: deep in sample 1
    g2 = random_dna(rng, 400)  # contaminant: deep in sample 2
    sets = [
        reads_from(g1, 400, 60, rng) + reads_from(g2, 40, 60, rng),
        reads_from(g1, 40, 60, rng) + reads_from(g2, 400, 60, rng),
    ]
    profiles = profiles_from_read_sets(sets, k, min_samples=1, min_mult=2)
    g = CondensedGraph.from_sequences([g1, g2], k)
    return g, profiles, g1, g2


class TestSeriesAnalysis:
    def test_cosine(self):
        assert cosine_sim(np.array([1.0, 0]), np.array([2.0, 0])) == pytest.approx(1.0)
        assert cosine_sim(np.array([1.0, 0]), np.array([0, 3.0])) == pytest.approx(0.0)
        assert cosine_sim(np.zeros(2), np.ones(2)) == 0.0

    def test_edge_profiles(self, setup):
        g, profiles, _, _ = setup
        ep = edge_profiles(profiles, g)
        assert len(ep) == 2
        e1, e2 = sorted(ep)
        assert ep[e1][0] > ep[e1][1]  # bin edge: deep in sample 1
        assert ep[e2][1] > ep[e2][0]

    def test_infer_bin_abundance(self, tmp_path):
        path = str(tmp_path / "bins.prof")
        with open(path, "w") as fh:
            fh.write("BIN1 10 2\nBIN2 1 50\nBIN1 14 4\n")
        vec = infer_bin_abundance(path, "BIN1", 2)
        assert vec == pytest.approx([12.0, 3.0])

    def test_aggressive_clearing(self, setup):
        g, profiles, _, _ = setup
        ep = edge_profiles(profiles, g)
        e1, e2 = sorted(ep)
        base = ep[e1]
        removed = aggressive_clearing(g, ep, base, similarity_threshold=0.8)
        # the contaminant edge (dissimilar profile, a tip) is removed
        assert removed == 1
        assert g.alive[e1] and not g.alive[e2]

    def test_run_dumps(self, setup, tmp_path):
        g, profiles, _, _ = setup
        mult_path = str(tmp_path / "profiles.npz")
        profiles.save(mult_path)
        cfg = SeriesAnalysisConfig(
            k=profiles.k,
            sample_cnt=2,
            kmer_mult=mult_path,
            min_len=50,
            frag_size=100,
            edges_sqn=str(tmp_path / "edges.fasta"),
            edges_mpl=str(tmp_path / "edges.mpl"),
            edge_fragments_mpl=str(tmp_path / "frags.mpl"),
        )
        run_series_analysis(g, cfg)
        assert open(cfg.edges_sqn).read().count(">") == 2
        lines = open(cfg.edges_mpl).read().splitlines()
        assert len(lines) == 2 and len(lines[0].split()) == 4  # name len ab1 ab2
        frags = open(cfg.edge_fragments_mpl).read().splitlines()
        assert len(frags) == 8  # 400 bp / 100 per edge

    def test_config_yaml_roundtrip(self, tmp_path):
        path = str(tmp_path / "cfg.yaml")
        with open(path, "w") as fh:
            fh.write("k: 21\nsample_cnt: 3\nkmer_mult: mult.npz\nmin_len: 100\n")
        cfg = SeriesAnalysisConfig.load(path)
        assert cfg.k == 21 and cfg.sample_cnt == 3 and cfg.min_len == 100
