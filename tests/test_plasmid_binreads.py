"""Chromosome removal (plasmid mode) + binary reads + tool tests."""
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.graph.chromosome_remover import (
    PlasmidConfig,
    remove_chromosomal,
    weighted_median_coverage,
)
from spades_tpu.io.binary_reads import (
    convert_reads,
    read_binary_reads,
    write_binary_reads,
)
from spades_tpu.pipeline.construction import construct_graph

K = 21


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _tile(seq, cov, rl=100, seed=0):
    rng = np.random.default_rng(seed)
    n = int(len(seq) * cov / rl)
    starts = rng.integers(0, len(seq) - rl + 1, n)
    return [seq[s : s + rl] for s in starts]


class TestChromosomeRemoval:
    def _mixed_graph(self):
        chrom = _random_seq(4000, seed=1)
        plasmid = _random_seq(800, seed=2)
        circ = plasmid + plasmid[: 2 * K]  # wrap for circularity
        reads = _tile(chrom, 30, seed=3) + _tile(circ, 60, rl=100, seed=4)
        return construct_graph(reads, K, min_count=2).graph, chrom, plasmid

    def test_removes_chromosome_keeps_plasmid(self):
        g, chrom, plasmid = self._mixed_graph()
        seqs_before = [g.edge_seq(int(e)) for e in g.canonical_edge_ids()]
        assert any(len(s) > 3000 for s in seqs_before)  # chromosome edge present
        remove_chromosomal(g, PlasmidConfig(long_edge_length=1000))
        remaining = [g.edge_seq(int(e)) for e in g.canonical_edge_ids()]
        assert all(len(s) < 3000 for s in remaining)
        # the circular plasmid component survives
        assert any(len(s) >= 700 for s in remaining), [len(s) for s in remaining]

    def test_weighted_median(self):
        g, *_ = self._mixed_graph()
        med = weighted_median_coverage(g, 1000)
        assert med > 0

    def test_uniform_graph_median_band_removes_all_long(self):
        chrom = _random_seq(3000, seed=5)
        g = construct_graph(_tile(chrom, 30, seed=6), K, min_count=2).graph
        remove_chromosomal(g, PlasmidConfig(long_edge_length=1000))
        assert all(g.e_len[e] < 1000 for e in g.canonical_edge_ids())


class TestBinaryReads:
    def test_roundtrip(self, tmp_path):
        seqs = ["ACGTACGTAC", "GGG", "A", "ACGTNNNACGT", ""]
        f = str(tmp_path / "r.bin")
        write_binary_reads(f, seqs)
        assert read_binary_reads(f) == seqs

    def test_chunked_convert_idempotent(self, tmp_path):
        seqs = [_random_seq(50, seed=i) for i in range(100)]
        d = str(tmp_path / "bin_reads")
        paths = convert_reads(d, seqs, chunks=4)
        assert len(paths) == 4
        # second call is a no-op (done marker)
        paths2 = convert_reads(d, seqs, chunks=4)
        assert paths2 == paths
        back = []
        for p in paths:
            back += read_binary_reads(p)
        assert back == seqs


class TestTools:
    def test_gmapper_and_convert(self, tmp_path):
        from spades_tpu.io.fastx import write_fasta
        from spades_tpu.io.gfa import write_gfa
        from spades_tpu.tools import convert_bin_to_fasta, gmapper

        genome = _random_seq(1000, seed=7)
        g = construct_graph([genome], K).graph
        gfa = str(tmp_path / "g.gfa")
        write_gfa(gfa, g)
        reads = str(tmp_path / "reads.fasta")
        write_fasta(reads, [("r1", genome[100:200]), ("r2", "T" * 50)])
        wd = str(tmp_path / "out")
        assert gmapper.main([gfa, reads, "-w", wd]) == 0
        rows = open(os.path.join(wd, "mapping.tsv")).read().strip().split("\n")
        assert len(rows) == 1 and rows[0].startswith("r1\t")

        bdir = str(tmp_path / "bin")
        convert_reads(bdir, [genome[:60], genome[60:130]], chunks=2)
        wd2 = str(tmp_path / "out2")
        assert convert_bin_to_fasta.main([bdir, "-w", wd2]) == 0
        txt = open(os.path.join(wd2, "reads.fasta")).read()
        assert genome[:60] in txt.replace("\n", "")
