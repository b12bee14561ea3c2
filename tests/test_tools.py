"""Standalone tools: HLL estimator, binary k-mer format, CLI drivers, GFA ops."""
import gzip
import os

import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.core.reads import ReadBatch, batch_iter
from spades_tpu.io.binary_kmers import (
    from_binary_records,
    read_kmer_file,
    to_binary_records,
    write_kmer_file,
)
from spades_tpu.ops.count import count_sequences
from spades_tpu.ops.hll import estimate_kmer_cardinality
from tests.conftest import random_dna


class TestHLL:
    def test_cardinality_accuracy(self, rng):
        k = 21
        seqs = [random_dna(rng, 1000) for _ in range(50)]
        exact = count_sequences(seqs, k).num_unique
        est = estimate_kmer_cardinality(batch_iter(seqs, batch_size=16), k)
        assert abs(est - exact) / exact < 0.05, (est, exact)

    def test_empty(self):
        assert estimate_kmer_cardinality(batch_iter([]), 21) == 0.0


class TestBinaryKmers:
    def test_reference_format_example(self):
        """docs/standalone.md example: AGCTCT -> bytes d8 0d 00*6."""
        from spades_tpu.core import kmers as K

        codes = dna.encode("AGCTCT")[None]
        packed = K.pack(codes)
        rec = to_binary_records(packed, 6)
        raw = rec.astype("<u8").tobytes()
        assert raw[:2] == bytes([0xD8, 0x0D])
        assert raw[2:] == bytes(6)

    @pytest.mark.parametrize("k", [21, 33, 55])
    def test_roundtrip_file(self, rng, k, tmp_path):
        kc = count_sequences([random_dna(rng, 300) for _ in range(5)], k)
        path = str(tmp_path / "final_kmers")
        write_kmer_file(path, kc.words, k)
        # record size contract: k=21 -> 8B, k=33/55 -> 16B
        expect_bytes = {21: 8, 33: 16, 55: 16}[k] * kc.num_unique
        assert os.path.getsize(path) == expect_bytes
        back = read_kmer_file(path, k)
        np.testing.assert_array_equal(back, kc.words)


class TestCLIs:
    @pytest.fixture()
    def reads_file(self, rng, tmp_path):
        path = str(tmp_path / "reads.fasta")
        genome = random_dna(rng, 500)
        with open(path, "w") as fh:
            for i in range(0, 400, 10):
                fh.write(f">r{i}\n{genome[i:i+100]}\n")
        return path, genome

    def test_kmercount_cli(self, reads_file, tmp_path):
        from spades_tpu.tools.kmercount import main

        path, genome = reads_file
        wd = str(tmp_path / "kc")
        assert main([path, "-k", "21", "-w", wd, "--counts"]) == 0
        kmers = read_kmer_file(os.path.join(wd, "final_kmers"), 21)
        counts = np.fromfile(os.path.join(wd, "final_kmers.counts"), dtype="<i8")
        assert kmers.shape[0] == counts.shape[0] > 0

    def test_kmer_estimating_cli(self, reads_file, capsys):
        from spades_tpu.tools.kmer_estimating import main

        path, _ = reads_file
        assert main([path, "-k", "21"]) == 0
        out = capsys.readouterr().out
        assert "Estimated number of unique canonical 21-mers" in out

    def test_gbuilder_and_gsimplifier_and_split(self, reads_file, tmp_path):
        from spades_tpu.tools.gbuilder import main as gbuilder
        from spades_tpu.tools.gfa_split import main as gfa_split
        from spades_tpu.tools.gsimplifier import main as gsimplifier

        path, genome = reads_file
        wd = str(tmp_path / "gb")
        assert gbuilder([path, "-k", "21", "-w", wd, "--unitigs"]) == 0
        gfa = os.path.join(wd, "assembly_graph_with_scaffolds.gfa")
        assert os.path.exists(gfa)
        assert os.path.exists(os.path.join(wd, "unitigs.fasta"))

        wd2 = str(tmp_path / "gs")
        assert gsimplifier([gfa, "-k", "21", "-w", wd2]) == 0
        assert os.path.exists(os.path.join(wd2, "simplified.gfa"))

        wd3 = str(tmp_path / "split")
        assert gfa_split([gfa, "-w", wd3]) == 0
        assert os.path.exists(os.path.join(wd3, "component_0.gfa"))

    def test_read_filter_cli(self, rng, tmp_path):
        from spades_tpu.tools.read_filter import main

        genome = random_dna(rng, 400)
        p1 = str(tmp_path / "r1.fasta")
        p2 = str(tmp_path / "r2.fasta")
        with open(p1, "w") as f1, open(p2, "w") as f2:
            for i in range(0, 300, 5):
                f1.write(f">p{i}/1\n{genome[i:i+80]}\n")
                f2.write(f">p{i}/2\n{dna.revcomp_str(genome[i+20:i+100])}\n")
            # junk pair with unique k-mers (coverage 1)
            f1.write(f">junk/1\n{random_dna(rng, 80)}\n")
            f2.write(f">junk/2\n{random_dna(rng, 80)}\n")
        wd = str(tmp_path / "rf")
        assert main(["-1", p1, "-2", p2, "-c", "2", "-o", wd, "-k", "21"]) == 0
        from spades_tpu.io.fastx import read_fastx

        kept = list(read_fastx(os.path.join(wd, "filtered_1.fasta")))
        assert 0 < len(kept) < 62  # junk filtered, genomic kept
        assert all("junk" not in r.name for r in kept)


class TestGfaGraphRoundtrip:
    def test_from_gfa_preserves_structure(self, rng, tmp_path):
        from spades_tpu.graph.from_gfa import graph_from_gfa
        from spades_tpu.io.gfa import read_gfa, write_gfa
        from spades_tpu.pipeline.construction import construct_graph
        from tests.test_condense import clean_random_dna, is_clean

        k = 11
        # build a branching graph (SNP bulge)
        for _ in range(100):
            a = clean_random_dna(rng, 80, k)
            alt = "ACGT"[("ACGT".index(a[40]) + 1) % 4]
            b = a[:40] + alt + a[41:]
            if is_clean(a + "NN" + b, k):
                break
        g = construct_graph([a, a, b], k).graph
        path = str(tmp_path / "g.gfa")
        write_gfa(path, g)
        g2 = graph_from_gfa(read_gfa(path), k)
        g2.check_invariants()
        assert len(g2.canonical_edge_ids()) == len(g.canonical_edge_ids())
        assert sorted(g2.e_len[g2.alive_edge_ids()]) == sorted(
            g.e_len[g.alive_edge_ids()]
        )
        # same degree multiset
        assert sorted(g2.out_degrees()) == sorted(g.out_degrees())
        # coverage preserved through DP tags
        np.testing.assert_allclose(
            np.sort(g2.coverage()[g2.alive_edge_ids()]),
            np.sort(g.coverage()[g.alive_edge_ids()]),
            rtol=1e-5,
        )
