"""Byte-level output-format etalons, hand-traced from the reference writers.

Every expected string below is derived line-by-line from the reference
implementation (NOT from this repo's writers), so a one-character format
drift in any writer fails here:

* contig/scaffold FASTA naming — `io/reads/header_naming.hpp:15-24`
  (`NODE_<n>_length_<l>_cov_<std::to_string(double)>`, i.e. %.6f) wrapped at
  60 columns (`io/reads/osequencestream.hpp:24` WriteWrapped max_width=60);
* GFA segments/links — `io/graph/gfa_writer.cpp` WriteSegment
  (`S\\t<id>\\t<seq>\\tDP:f:<float, ostream default precision 6>\\tKC:i:<n>`)
  and WriteLink (`L\\t<e1>\\t<o1>\\t<e2>\\t<o2>\\t<k>M`);
* .paths records — `bidirectional_path_io/bidirectional_path_output.cpp:16-29`
  ToPathString: comma-joined `<id><+->` items, `;\\n` at gap junctions, the
  conjugate path under `<name>'`.

Deliberate divergences (PARITY.md): segment/edge NUMBERING comes from this
framework's deterministic id order (the reference's ids come from its
id_distributor), and the GFA header keeps a VN tag the reference omits.
"""
from __future__ import annotations

import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.graph.graph import CondensedGraph
from tests.conftest import random_dna


@pytest.fixture
def tiny_graph(rng):
    """Fixed 2-edge chain: e0 (70 nt) -> e1 (50 nt), k=21, known coverages."""
    k = 21
    g = CondensedGraph(
        k=k,
        e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
        e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
        e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
        alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
        v_conj=np.zeros(0, np.int64),
    )
    vs = [g.add_vertex_pair()[0] for _ in range(3)]
    s0 = random_dna(rng, 70)
    s1 = s0[-k:] + random_dna(rng, 50 - k + 29)  # shares the k-overlap
    # e0: len 70 nt (49 kmers), cov sum 122.5 -> avg 2.5
    e0, _ = g.add_edge_pair(vs[0], vs[1], dna.encode(s0), 122.5)
    # e1: len 50+29=... use exactly 79 nt (58 kmers), cov sum 58 -> avg 1.0
    e1, _ = g.add_edge_pair(vs[1], vs[2], dna.encode(s1), 58.0)
    return g, (s0, s1), (e0, e1)


class TestContigFasta:
    def test_exact_bytes(self, tiny_graph, tmp_path):
        from spades_tpu.io.contigs import extract_contigs, write_contigs

        g, (s0, s1), _ = tiny_graph
        contigs = extract_contigs(g)
        out = tmp_path / "contigs.fasta"
        write_contigs(str(out), contigs)
        # hand-traced expectation: ordered by decreasing length; names per
        # MakeContigId(number, length, coverage) with std::to_string(double)
        # == printf %.6f; sequence wrapped at 60 columns
        def wrap60(s):
            return "\n".join(s[i:i + 60] for i in range(0, len(s), 60))

        expected = (
            f">NODE_1_length_{len(s1)}_cov_1.000000\n{wrap60(s1)}\n"
            f">NODE_2_length_{len(s0)}_cov_2.500000\n{wrap60(s0)}\n"
        )
        assert out.read_text() == expected


class TestGFA:
    def test_exact_bytes(self, tiny_graph, tmp_path):
        from spades_tpu.io.gfa import write_gfa
        from spades_tpu import __version__

        g, (s0, s1), (e0, e1) = tiny_graph
        out = tmp_path / "g.gfa"
        write_gfa(str(out), g, version="1.2")
        # S per canonical pair in id order; DP:f: is `<< float(cov)` with
        # ostream default precision 6 -> "2.5" / "1" (NOT "2.500000");
        # KC:i: raw k-mer count; L with <k>M overlap
        expected = (
            f"H\tVN:Z:1.2\tsp:Z:spades-tpu-{__version__}\n"
            f"S\t0\t{s0}\tDP:f:2.5\tKC:i:122\n"
            f"S\t2\t{s1}\tDP:f:1\tKC:i:58\n"
            "L\t0\t+\t2\t+\t21M\n"
        )
        assert out.read_text() == expected

    def test_float_formatting_matches_ostream(self):
        """The DP float format must track C++ `operator<<(float)` defaults
        on awkward values (6 significant digits, general form)."""
        cases = [
            (2.5, "2.5"),
            (1.0, "1"),
            (100.123456, "100.123"),
            (0.000123456, "0.000123456"),
            (1234567.0, "1.23457e+06"),
        ]
        for v, want in cases:
            assert f"{float(np.float32(v)):.6g}" == want


class TestPathsRecords:
    def test_exact_bytes(self, tiny_graph, tmp_path):
        from spades_tpu.paired.path_extend import Path, write_paths

        g, _, (e0, e1) = tiny_graph
        p = Path([e0, e1])
        out = tmp_path / "contigs.paths"
        write_paths(str(out), [("NODE_1_length_128_cov_1.700000", p)], g)
        txt = out.read_text()
        lines = txt.splitlines()
        # ToPathString: "<id><ori>" comma-joined; conjugate record under '
        assert lines[0] == "NODE_1_length_128_cov_1.700000"
        assert lines[1] == "0+,2+"
        assert lines[2] == "NODE_1_length_128_cov_1.700000'"
        assert lines[3] == "2-,0-"

    def test_gap_junction_uses_semicolon_newline(self, tiny_graph, tmp_path):
        from spades_tpu.paired.path_extend import Path, write_paths

        g, _, (e0, e1) = tiny_graph
        p = Path([e0, e1], gaps=[0, 100])  # positive gap -> ";\n" separator
        out = tmp_path / "p.paths"
        write_paths(str(out), [("X", p)], g)
        txt = out.read_text()
        assert "0+;\n2+" in txt
