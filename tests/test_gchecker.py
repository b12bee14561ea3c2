"""Genome consistency checker tool (SURVEY row 43 promoted to a product
component; reference genome_consistance_checker.cpp + teamcity QUAST gate)."""
import json
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.tools.gchecker import quast_metrics
from tests.conftest import random_dna


class TestQuastMetrics:
    def test_perfect_assembly(self):
        rng = np.random.default_rng(1)
        g = random_dna(rng, 20_000)
        m = quast_metrics([g], [g])
        assert m["genome_fraction"] == 1.0
        assert m["misassembled"] == 0
        assert m["n50"] == 20_000 and m["l50"] == 1

    def test_misassembly_detected(self):
        rng = np.random.default_rng(2)
        g = random_dna(rng, 20_000)
        chimera = g[:3000] + g[10_000:13_000]   # joins distant regions
        m = quast_metrics([g[:8000], chimera], [g])
        assert m["misassembled"] == 1

    def test_rc_contig_placed(self):
        rng = np.random.default_rng(3)
        g = random_dna(rng, 10_000)
        m = quast_metrics([dna.revcomp_str(g)], [g])
        assert m["misassembled"] == 0 and m["genome_fraction"] == 1.0

    def test_multi_reference(self):
        rng = np.random.default_rng(4)
        a, b = random_dna(rng, 8000), random_dna(rng, 6000)
        m = quast_metrics([a, b[:4000]], [a, b])
        assert m["misassembled"] == 0
        assert 0.85 <= m["genome_fraction"] <= 0.93

    def test_cli(self, tmp_path):
        from spades_tpu.io.fastx import write_fasta
        from spades_tpu.tools import gchecker

        rng = np.random.default_rng(5)
        g = random_dna(rng, 9000)
        ref = str(tmp_path / "ref.fa")
        ctg = str(tmp_path / "c.fa")
        write_fasta(ref, [("ref", g)])
        write_fasta(ctg, [("c1", g[:5000]), ("c2", g[5000:])])
        wd = str(tmp_path / "wd")
        assert gchecker.main([ctg, ref, "-w", wd]) == 0
        rows = dict(
            l.split("\t") for l in open(os.path.join(wd, "report.tsv")).read().strip().split("\n")
        )
        assert float(rows["genome_fraction"]) == 1.0
        assert int(rows["misassembled"]) == 0
