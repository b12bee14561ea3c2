"""SPlitteR equivalent: barcode index, auxiliary graphs, vertex resolution.

Mirrors the reference's tiny-synthetic-graph test style
(`/root/reference/src/test/debruijn/`): hand-built repeat structures with
reads generated to support a known resolution."""
import os

import numpy as np
import pytest

from spades_tpu.aux_graphs.barcode_index import (
    build_barcode_index, parse_barcode,
)
from spades_tpu.aux_graphs.contracted_graph import build_contracted_graph
from spades_tpu.aux_graphs.scaffold_graph import ScaffoldGraph
from spades_tpu.aux_graphs.vertex_resolver import (
    VertexState, extract_paths, merge_paths, resolve_vertices,
)
from spades_tpu.core import dna
from spades_tpu.graph.graph import CondensedGraph
from tests.conftest import random_dna


def make_repeat_graph(rng, k=21, flank=120):
    """X-shaped repeat: in edges A, B -> vertex v -> out edges C, D.

    True haplotypes are A->C and B->D."""
    A = random_dna(rng, flank)
    B = random_dna(rng, flank)
    while B[-k:] == A[-k:]:
        B = random_dna(rng, flank)
    core = A[-k:]
    # B must end with the same k-overlap as A for both to enter one vertex
    B = B[:-k] + core
    C = core + random_dna(rng, flank)
    D = core + random_dna(rng, flank)
    while D[: k + 1] == C[: k + 1]:
        D = core + random_dna(rng, flank)

    g = CondensedGraph(
        k=k,
        e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
        e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
        e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
        alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
        v_conj=np.zeros(0, np.int64),
    )
    # vertices: 0 = shared junction, 1 = its conjugate, then per-edge tips
    # build vertex table: junction J (0) + conj (1); tips for A,B starts and C,D ends
    # simpler: 2 shared + 8 tip vertices (start/end per outer endpoint, conjugated)
    g.v_conj = np.array([1, 0, 3, 2, 5, 4, 7, 6, 9, 8], np.int64)
    enc = lambda s: dna.encode(s)
    eA, _ = g.add_edge_pair(2, 0, enc(A))
    eB, _ = g.add_edge_pair(4, 0, enc(B))
    eC, _ = g.add_edge_pair(0, 6, enc(C))
    eD, _ = g.add_edge_pair(0, 8, enc(D))
    g.check_invariants()
    return g, (A, B, C, D), (eA, eB, eC, eD)


def barcoded_reads_for(hap: str, barcode: str, n: int, rlen: int, rng):
    reads = []
    for i in range(n):
        start = int(rng.integers(0, max(1, len(hap) - rlen)))
        reads.append((f"r{barcode}_{i} BX:Z:{barcode}", hap[start : start + rlen]))
    return reads


class TestBarcodeIndex:
    def test_parse_barcode(self):
        assert parse_barcode("read1 BX:Z:ACGT-1") == "ACGT-1"
        assert parse_barcode("read1 BC:Z:XYZ extra") == "XYZ"
        assert parse_barcode("read1") == ""

    def test_build_and_query(self, rng):
        g, (A, B, C, D), (eA, eB, eC, eD) = make_repeat_graph(rng)
        hapAC = A + C[g.k:]
        reads = barcoded_reads_for(hapAC, "BC1", 40, 60, rng)
        bindex = build_barcode_index(g, reads, mapping_k=21, frame_size=50)
        assert bindex.num_barcodes == 1
        # the cloud must appear on both A (tail) and C (head)
        assert bindex.barcode_number(eA) == 1
        assert bindex.barcode_number(eC) == 1
        # conjugate entries exist too
        assert bindex.barcode_number(int(g.e_conj[eA])) == 1
        score = bindex.link_score(
            eA, int(g.e_len[eA]), eC, int(g.e_len[eC]), tail_threshold=200
        )
        assert score == 1.0
        # no cloud linking A to D
        assert bindex.link_score(
            eA, int(g.e_len[eA]), eD, int(g.e_len[eD]), tail_threshold=200
        ) == 0.0


class TestVertexResolver:
    def _build(self, rng, n_bc=8):
        g, (A, B, C, D), edges = make_repeat_graph(rng)
        eA, eB, eC, eD = edges
        hapAC = A + C[g.k:]
        hapBD = B + D[g.k:]
        reads = []
        for i in range(n_bc):
            reads += barcoded_reads_for(hapAC, f"AC{i}", 30, 60, rng)
            reads += barcoded_reads_for(hapBD, f"BD{i}", 30, 60, rng)
        bindex = build_barcode_index(g, reads, mapping_k=21, frame_size=50)
        return g, edges, bindex

    def test_resolves_completely(self, rng):
        g, (eA, eB, eC, eD), bindex = self._build(rng)
        results = resolve_vertices(g, bindex, tail_threshold=500, score_threshold=2.0)
        # exactly one canonical complex vertex
        assert len(results) == 1
        res = next(iter(results.values()))
        assert res.state == VertexState.COMPLETELY
        assert res.supported_pairs == {eA: eC, eB: eD}

    def test_paths_and_merge(self, rng):
        g, (eA, eB, eC, eD), bindex = self._build(rng)
        results = resolve_vertices(g, bindex, tail_threshold=500, score_threshold=2.0)
        paths = extract_paths(g, results)
        multi = sorted(p for p in paths if len(p) > 1)
        assert multi == sorted([[eA, eC], [eB, eD]])
        resolved, edge_map = merge_paths(g, paths)
        resolved.check_invariants()
        # merged sequence spells the haplotype
        mA = edge_map[eA]
        assert resolved.edge_seq(mA) == g.edge_seq(eA) + g.edge_seq(eC)[g.k:]
        assert edge_map[eC] == mA

    def test_trusted_links_override(self, rng):
        """Trusted contig links force the opposite pairing despite barcodes."""
        g, (eA, eB, eC, eD), bindex = self._build(rng)
        trusted = {eA: {eD}, eB: {eC}}
        results = resolve_vertices(
            g, bindex, trusted, tail_threshold=500, score_threshold=2.0
        )
        res = next(iter(results.values()))
        assert res.supported_pairs == {eA: eD, eB: eC}

    def test_uncovered_without_reads(self, rng):
        g, _, edges = make_repeat_graph(rng), None, None
        g = g[0] if isinstance(g, tuple) else g
        from spades_tpu.aux_graphs.barcode_index import FrameBarcodeIndex
        z = np.zeros(0, np.int64)
        empty = FrameBarcodeIndex(40000, z, z, z, z, z, z, [])
        results = resolve_vertices(g, empty)
        assert all(r.state == VertexState.UNCOVERED for r in results.values())


class TestAuxGraphs:
    def test_scaffold_graph(self):
        sg = ScaffoldGraph()
        sg.add_edge(0, 2, weight=5.0)
        sg.add_edge(0, 4, weight=1.0)
        sg.add_edge(0, 2, weight=3.0)
        sg.dedup()
        assert sg.num_edges == 2
        filtered = sg.filter_by_weight(2.0)
        assert filtered.num_edges == 1
        assert filtered.dst[0] == 2
        assert sg.out_degrees()[0] == 2

    def test_contracted_graph(self, rng):
        g, _, (eA, eB, eC, eD) = make_repeat_graph(rng)
        long_mask = np.zeros(len(g.e_start), bool)
        for e in (eA, eB, eC, eD):
            long_mask[e] = True
        cg = build_contracted_graph(g, long_mask)
        # nothing contracted away: all 4 long edge pairs survive
        assert len(cg.long_edges) == 8
        # A and B end in the same contracted vertex where C and D start
        assert cg.vertex_of(int(g.e_end[eA])) == cg.vertex_of(int(g.e_start[eC]))

    def test_contracted_collapses_short_edges(self, rng):
        k = 21
        s1 = random_dna(rng, 100)
        bridge = s1[-k:] + random_dna(rng, 5)
        s2 = bridge[-k:] + random_dna(rng, 100)
        g = CondensedGraph.from_sequences([s1, bridge, s2], k)
        # glue chain endpoints onto shared vertices: s1 end (vertex 1) ->
        # bridge start; bridge end (vertex 5) -> s2 start (with conjugates)
        g.e_start[2] = 1; g.e_end[3] = int(g.v_conj[1])  # noqa: E702
        g.e_start[4] = 5; g.e_end[5] = int(g.v_conj[5])  # noqa: E702
        long_mask = np.array([True, True, False, False, True, True])
        cg = build_contracted_graph(g, long_mask)
        # bridge is contracted: s1's end and s2's start share a root
        assert cg.vertex_of(1) == cg.vertex_of(5)
        assert cg.vertex_of(1) != cg.vertex_of(0)


class TestSplitterCLI:
    def test_end_to_end(self, rng, tmp_path):
        from spades_tpu.io.gfa import write_gfa
        from spades_tpu.tools.splitter import main

        g, (A, B, C, D), (eA, eB, eC, eD) = make_repeat_graph(rng)
        gfa_path = str(tmp_path / "graph.gfa")
        write_gfa(gfa_path, g)

        hapAC, hapBD = A + C[g.k:], B + D[g.k:]
        reads_path = str(tmp_path / "reads.fasta")
        with open(reads_path, "w") as fh:
            for i in range(8):
                for hap, tag in ((hapAC, f"AC{i}"), (hapBD, f"BD{i}")):
                    for j, (name, seq) in enumerate(
                        barcoded_reads_for(hap, tag, 30, 60, rng)
                    ):
                        fh.write(f">{name}\n{seq}\n")

        outdir = str(tmp_path / "out")
        rc = main([gfa_path, reads_path, "-k", "21", "--mapping-k", "21",
                   "--tail-threshold", "500", "-w", outdir])
        assert rc == 0
        assert os.path.exists(os.path.join(outdir, "vertex_results.tsv"))
        assert os.path.exists(os.path.join(outdir, "resolved_graph.gfa"))
        fasta = open(os.path.join(outdir, "resolved_paths.fasta")).read()
        assert hapAC in fasta or dna.revcomp_str(hapAC) in fasta
        assert hapBD in fasta or dna.revcomp_str(hapBD) in fasta
        tsv = open(os.path.join(outdir, "vertex_results.tsv")).read()
        assert "Completely" in tsv
