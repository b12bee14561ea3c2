"""--assembly-graph (LoadGraph stage) and SAM-based corrector."""
import os

import numpy as np
import pytest

from spades_tpu.core import dna
from tests.conftest import random_dna


class TestLoadGraph:
    def test_pipeline_from_gfa(self, rng, tmp_path):
        from spades_tpu.graph.graph import CondensedGraph
        from spades_tpu.io.gfa import write_gfa
        from spades_tpu.pipeline.main import main

        k = 21
        genome = random_dna(rng, 800)
        g = CondensedGraph.from_sequences([genome], k)
        g.e_cov[:] = 50.0 * (g.e_len[0] - k)
        gfa_path = str(tmp_path / "in.gfa")
        write_gfa(gfa_path, g)

        # paired reads for repeat resolution on the loaded graph
        rlen, ins = 80, 200
        p1, p2 = str(tmp_path / "r1.fa"), str(tmp_path / "r2.fa")
        with open(p1, "w") as f1, open(p2, "w") as f2:
            for i in range(200):
                a = int(rng.integers(0, len(genome) - ins))
                f1.write(f">a{i}\n{genome[a:a+rlen]}\n")
                f2.write(f">a{i}\n{dna.revcomp_str(genome[a+ins-rlen:a+ins])}\n")

        out = str(tmp_path / "out")
        rc = main(["--assembly-graph", gfa_path, "-1", p1, "-2", p2,
                   "-o", out, "--platform", "cpu", "-k", str(k),
                   "--only-assembler"])
        assert rc == 0
        from spades_tpu.io.fastx import read_fastx

        contigs = list(read_fastx(os.path.join(out, "contigs.fasta")))
        assert len(contigs) >= 1
        best = max(contigs, key=lambda c: len(c.seq))
        assert best.seq in (genome, dna.revcomp_str(genome))
        log = open(os.path.join(out, "spades.log")).read()
        assert "Load Graph" in log
        assert "Construction" not in log.replace("Load Graph", "")


class TestSamCorrector:
    def test_sam_majority_fix(self, rng, tmp_path):
        from spades_tpu.io.sam import SamRecord, write_sam
        from spades_tpu.tools.corrector import main

        contig = random_dna(rng, 120)
        # introduce a wrong base at position 50 in the written contig
        truth = contig
        alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[contig[50]]
        broken = contig[:50] + alt + contig[51:]
        contig_path = str(tmp_path / "c.fasta")
        with open(contig_path, "w") as fh:
            fh.write(f">ctg1\n{broken}\n")

        # 5 reads covering pos 50 with the true base
        recs = []
        for i in range(5):
            start = 30 + i * 3
            recs.append(
                SamRecord(f"r{i}", 0, "ctg1", start + 1, 60, "40M",
                          truth[start : start + 40], {})
            )
        sam_path = str(tmp_path / "a.sam")
        write_sam(sam_path, [("ctg1", len(broken))], recs)

        out = str(tmp_path / "out")
        rc = main([contig_path, "--sam", sam_path, "-w", out])
        assert rc == 0
        from spades_tpu.io.fastx import read_fastx

        got = list(read_fastx(os.path.join(out, "corrected_contigs.fasta")))
        assert got[0].seq == truth

    def test_requires_reads_or_sam(self, rng, tmp_path):
        from spades_tpu.tools.corrector import main

        contig_path = str(tmp_path / "c.fasta")
        with open(contig_path, "w") as fh:
            fh.write(f">c\n{random_dna(rng, 60)}\n")
        with pytest.raises(SystemExit):
            main([contig_path, "-w", str(tmp_path / "o")])
