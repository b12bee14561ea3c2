"""FASTG / .paths / DOT output format tests (reference io/graph surface)."""
import numpy as np

from spades_tpu.core import dna
from spades_tpu.graph.dot import write_dot
from spades_tpu.io.fastg import write_fastg
from spades_tpu.paired.path_extend import Path, path_to_string, write_paths
from spades_tpu.pipeline.construction import construct_graph

K = 21


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _forked_graph():
    a = _random_seq(600, 1)
    a2 = a[:300] + ("A" if a[300] != "A" else "C") + a[301:]
    return construct_graph([a, a2], K).graph


class TestFastg:
    def test_records_and_adjacency(self, tmp_path):
        g = _forked_graph()
        out = str(tmp_path / "g.fastg")
        write_fastg(out, g)
        txt = open(out).read()
        headers = [l for l in txt.split("\n") if l.startswith(">")]
        # one record per oriented edge
        assert len(headers) == len(g.alive_edge_ids())
        assert any(":" in h for h in headers)  # adjacency lists present
        assert all(h.endswith(";") for h in headers)
        assert any("'" in h for h in headers)  # conjugate orientation marks

    def test_sequence_matches_edge(self, tmp_path):
        g = _forked_graph()
        out = str(tmp_path / "g.fastg")
        write_fastg(out, g)
        blocks = open(out).read().split(">")[1:]
        first = blocks[0].split("\n")
        eid = int(first[0].split("_")[1])
        seq = "".join(first[1:]).strip()
        assert seq == g.edge_seq(eid)


class TestPaths:
    def test_path_to_string_orientations(self):
        g = _forked_graph()
        ids = [int(e) for e in g.canonical_edge_ids()]
        e = ids[0]
        ec = int(g.e_conj[e])
        assert path_to_string(g, Path([e])) == f"{e}+"
        if ec != e:
            assert path_to_string(g, Path([ec])) == f"{e}-"

    def test_gap_becomes_semicolon(self):
        g = _forked_graph()
        ids = [int(e) for e in g.canonical_edge_ids()]
        if len(ids) >= 2:
            p = Path([ids[0], ids[1]], [0, 100])
            assert ";" in path_to_string(g, p)

    def test_write_paths_with_conjugate_records(self, tmp_path):
        g = _forked_graph()
        e = int(g.canonical_edge_ids()[0])
        f = str(tmp_path / "c.paths")
        write_paths(f, [("NODE_1_length_5_cov_1.0", Path([e]))], g)
        txt = open(f).read()
        assert "NODE_1_length_5_cov_1.0\n" in txt
        assert "NODE_1_length_5_cov_1.0'\n" in txt


class TestDot:
    def test_writes_digraph(self, tmp_path):
        g = _forked_graph()
        f = str(tmp_path / "g.dot")
        write_dot(f, g)
        txt = open(f).read()
        assert txt.startswith("digraph")
        assert txt.count("->") == len(g.alive_edge_ids())
        assert "cov=" in txt


class TestBreakingScaffolds:
    def test_break_at_n_runs(self):
        from spades_tpu.io.contigs import break_scaffolds

        mod, out = break_scaffolds([("s1 extra", "AAAA" + "N" * 3 + "CCCC")])
        assert mod
        assert out == [("s1_1 extra", "AAAA"), ("s1_2 extra", "CCCC")]

    def test_short_n_runs_kept(self):
        from spades_tpu.io.contigs import break_scaffolds

        mod, out = break_scaffolds([("s1", "AAANNCCC")])
        assert not mod
        assert out == [("s1_1", "AAANNCCC")]

    def test_leading_and_trailing_ns(self):
        from spades_tpu.io.contigs import break_scaffolds

        mod, out = break_scaffolds([("s", "NNNNACGTNNNN")])
        assert mod
        assert out == [("s_1", "ACGT")]


class TestAssemblyStats:
    def test_n50(self):
        from spades_tpu.io.contigs import Contig
        from spades_tpu.pipeline.spades_stages import _assembly_stats

        contigs = [Contig(name=f"c{i}", seq="A" * L, coverage=1.0, edge_id=-1)
                   for i, L in enumerate([100, 200, 300, 400])]
        s = _assembly_stats(contigs)
        assert "4 contigs" in s and "total 1000 bp" in s
        assert "longest 400 bp" in s and "N50 300 bp" in s

    def test_empty(self):
        from spades_tpu.pipeline.spades_stages import _assembly_stats

        assert _assembly_stats([]) == "0 contigs"


class TestGfaGolden:
    """Golden-byte GFA v1.1/v1.2 fixtures (gfa_writer.cpp + GFAPathWriter,
    bidirectional_path_output.cpp:79-166) — first step toward the
    byte-identity regression contract of the reference's etalon diffing
    (detect_diffs.sh)."""

    def _graph_and_scaffold(self):
        from spades_tpu.paired.path_extend import Path

        rng = np.random.default_rng(7)
        a = dna.decode(rng.integers(0, 4, 120).astype(np.uint8))
        a2 = a[:60] + ("A" if a[60] != "A" else "C") + a[61:]
        g = construct_graph([a, a2], K).graph
        p = Path([2, int(g.e_conj[0]), 1], [0, 0, 37])
        return g, [("NODE_1_length_200_cov_1.000000", p)]

    def test_v12_bytes(self, tmp_path):
        from spades_tpu.io.gfa import write_gfa

        g, sp = self._graph_and_scaffold()
        out = str(tmp_path / "g.gfa")
        write_gfa(out, g, scaffold_paths=sp, version="1.2")
        golden = open("tests/golden/tiny_v12.gfa", "rb").read()
        assert open(out, "rb").read() == golden

    def test_v11_bytes(self, tmp_path):
        from spades_tpu.io.gfa import write_gfa

        g, sp = self._graph_and_scaffold()
        out = str(tmp_path / "g.gfa")
        write_gfa(out, g, scaffold_paths=sp, version="1.1")
        golden = open("tests/golden/tiny_v11.gfa", "rb").read()
        assert open(out, "rb").read() == golden

    def test_jump_links_roundtrip(self, tmp_path):
        from spades_tpu.io.gfa import read_gfa, write_gfa

        g, sp = self._graph_and_scaffold()
        out = str(tmp_path / "g.gfa")
        write_gfa(out, g, scaffold_paths=sp, version="1.2")
        parsed = read_gfa(out)
        assert parsed.jumps == [("0", "-", "1", "+")]
        assert parsed.paths[0][1] == "2+,0-;1+"
        # DP wins over KC for coverage
        assert parsed.seg_cov["0"] == 2.0

    def test_adjacent_scaffold_edges_not_jumped(self, tmp_path):
        from spades_tpu.io.gfa import read_gfa, write_gfa
        from spades_tpu.paired.path_extend import Path

        g, _ = self._graph_and_scaffold()
        p = Path([2, int(g.e_conj[0])], [0, 0])  # contiguous walk, no gap
        out = str(tmp_path / "g.gfa")
        write_gfa(out, g, scaffold_paths=[("s", p)], version="1.2")
        parsed = read_gfa(out)
        assert parsed.jumps == []
        assert parsed.paths[0][1] == "2+,0-"


def test_mixed_overlap_gfa_rejected(tmp_path):
    """L-lines with overlap != k raise a typed user error instead of building
    a corrupt flat-k graph (VERDICT r4 item 9; reference carries per-vertex
    OverlapStorage, debruijn_data.hpp:31-42)."""
    import pytest

    from spades_tpu.graph.from_gfa import graph_from_gfa
    from spades_tpu.io.gfa import read_gfa
    from spades_tpu.utils.errors import ExitCode, SpadesError

    p = tmp_path / "mixed.gfa"
    p.write_text(
        "H\tVN:Z:1.0\n"
        "S\ta\tACGTACGTACGTACGTACGTACGTACG\n"
        "S\tb\tCGTACGTACGTACGTACGTACGTACGT\n"
        "L\ta\t+\tb\t+\t13M\n"          # overlap 13 != k=21
    )
    gg = read_gfa(str(p))
    with pytest.raises(SpadesError) as ei:
        graph_from_gfa(gg, 21)
    assert ei.value.code == ExitCode.INVALID_INPUT_FORMAT
    # uniform k overlaps still load
    p2 = tmp_path / "ok.gfa"
    p2.write_text(
        "H\tVN:Z:1.0\n"
        "S\ta\tACGTACGTACGTACGTACGTACGTACG\n"
        "S\tb\tCGTACGTACGTACGTACGTACGTACGT\n"
        "L\ta\t+\tb\t+\t21M\n"
    )
    g = graph_from_gfa(read_gfa(str(p2)), 21)
    assert g.num_edges == 4
