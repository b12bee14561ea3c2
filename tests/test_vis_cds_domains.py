"""online_vis REPL, cds_subgraphs, DomainAnalysis stage tests."""
import io
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.pipeline.construction import construct_graph

K = 21


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


class TestOnlineVis:
    def test_repl_commands(self, capsys):
        from spades_tpu.tools.online_vis import repl

        g = construct_graph([_random_seq(500, 1)], K).graph
        e = int(g.canonical_edge_ids()[0])
        cmds = f"stats\nedge {e}\nseq {e} 10\ncontigs 1\nbogus\nexit\n"
        out = io.StringIO()
        repl(g, out=out, inp=io.StringIO(cmds))
        txt = out.getvalue()
        assert "segments" in txt
        assert f"edge {e}:" in txt
        assert "unknown command" in txt

    def test_repl_draw(self, tmp_path):
        from spades_tpu.tools.online_vis import repl

        g = construct_graph([_random_seq(400, 2)], K).graph
        f = str(tmp_path / "g.dot")
        out = io.StringIO()
        repl(g, out=out, inp=io.StringIO(f"draw {f}\nexit\n"))
        assert open(f).read().startswith("digraph")


class TestCdsSubgraphs:
    def test_extracts_component(self, tmp_path):
        from spades_tpu.io.fastx import write_fasta
        from spades_tpu.io.gfa import write_gfa
        from spades_tpu.tools import cds_subgraphs

        a = _random_seq(800, 3)
        b = _random_seq(800, 4)  # second, unconnected component
        g = construct_graph([a, b], K).graph
        gfa = str(tmp_path / "g.gfa")
        write_gfa(gfa, g)
        q = str(tmp_path / "q.fasta")
        write_fasta(q, [("cds1", a[100:400])])
        wd = str(tmp_path / "out")
        assert cds_subgraphs.main([gfa, q, "-w", wd]) == 0
        sub = open(os.path.join(wd, "cds1.gfa")).read()
        s_lines = [l for l in sub.split("\n") if l.startswith("S\t")]
        assert len(s_lines) == 1  # only a's component, not b's
        assert s_lines[0].split("\t")[2] in (a, dna.revcomp_str(a))


class TestDomainAnalysis:
    def test_bio_mode_writes_hits(self, tmp_path):
        from spades_tpu.hmm.io import hmm_from_consensus
        from spades_tpu.pipeline.run import run_assembly

        motif = "ACGGATTACCAGGATCCGGATAACCGT"
        genome = _random_seq(400, 5) + motif + _random_seq(400, 6)
        reads = [genome[i : i + 100] for i in range(0, len(genome) - 99, 3)]
        reads.append(genome[-100:])
        out = str(tmp_path / "out")
        res = run_assembly(
            reads=reads, k_list=[21, 33], output_dir=out,
            hmm_profiles=[hmm_from_consensus(motif, "domA")],
        )
        hits = open(os.path.join(out, "K33", "domain_hits.tsv")).read().strip().split("\n")
        assert len(hits) >= 2 and hits[1].startswith("domA\t")
        clusters = open(os.path.join(out, "K33", "gene_clusters.txt")).read()
        assert "domA" in clusters
