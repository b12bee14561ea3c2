"""Profile-HMM parsing + Viterbi + graph alignment tests (pathracer surface)."""
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.hmm import align_hmm_to_graph, read_hmm, viterbi_score
from spades_tpu.hmm.align import translate
from spades_tpu.hmm.io import hmm_from_consensus, write_hmm
from spades_tpu.pipeline.construction import construct_graph

K = 21


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


MOTIF = "ACGTACGGTTCAGGACCATGCTAGGAT"


class TestIO:
    def test_roundtrip(self, tmp_path):
        h = hmm_from_consensus(MOTIF, "m1")
        f = str(tmp_path / "m.hmm")
        write_hmm(f, h)
        [back] = read_hmm(f)
        assert back.name == "m1"
        assert back.length == len(MOTIF)
        assert np.allclose(back.match_emit[1:], h.match_emit[1:], atol=1e-4)
        assert np.allclose(back.trans[1:], h.trans[1:], atol=1e-4)


class TestViterbi:
    def test_motif_found_in_sequence(self):
        h = hmm_from_consensus(MOTIF)
        background = _random_seq(200, 1)
        seq = background[:100] + MOTIF + background[100:]
        score, a, b = viterbi_score(h, seq)
        assert score > 10
        assert abs(a - 100) <= 2 and abs(b - (100 + len(MOTIF))) <= 2

    def test_mutated_motif_still_found(self):
        h = hmm_from_consensus(MOTIF)
        m = list(MOTIF)
        m[10] = "A" if m[10] != "A" else "C"
        seq = _random_seq(80, 2) + "".join(m) + _random_seq(80, 3)
        score, _, _ = viterbi_score(h, seq)
        assert score > 5

    def test_background_scores_low(self):
        h = hmm_from_consensus(MOTIF)
        score, _, _ = viterbi_score(h, _random_seq(300, 4))
        assert score < 10

    def test_translate(self):
        assert translate("ATGGCC") == "MA"
        assert translate("ATGGCCT") == "MA"


class TestGraphAlignment:
    def test_motif_on_single_edge(self):
        genome = _random_seq(300, 5) + MOTIF + _random_seq(300, 6)
        g = construct_graph([genome], K).graph
        h = hmm_from_consensus(MOTIF)
        hits = align_hmm_to_graph(g, h, score_threshold=10)
        assert hits
        assert MOTIF in hits[0].seq or MOTIF in dna.revcomp_str(hits[0].seq)

    def test_motif_spanning_junction(self):
        # motif placed across a bulge junction: the graph has >= 2 edges and
        # the best path must cross them
        a = _random_seq(300, 7) + MOTIF + _random_seq(300, 8)
        b = list(a)
        b[150] = "A" if b[150] != "A" else "C"
        g = construct_graph([a, "".join(b)], K).graph
        assert len(g.canonical_edge_ids()) >= 2
        h = hmm_from_consensus(MOTIF)
        hits = align_hmm_to_graph(g, h, score_threshold=10)
        assert hits

    def test_absent_motif_no_hits(self):
        g = construct_graph([_random_seq(400, 9)], K).graph
        h = hmm_from_consensus(MOTIF)
        assert align_hmm_to_graph(g, h, score_threshold=10) == []


class TestPathracerTool:
    def test_cli(self, tmp_path):
        from spades_tpu.io.gfa import write_gfa
        from spades_tpu.tools import pathracer

        genome = _random_seq(200, 10) + MOTIF + _random_seq(200, 11)
        g = construct_graph([genome], K).graph
        gfa = str(tmp_path / "g.gfa")
        write_gfa(gfa, g)
        hmmf = str(tmp_path / "m.hmm")
        write_hmm(hmmf, hmm_from_consensus(MOTIF, "motif1"))
        wd = str(tmp_path / "out")
        assert pathracer.main([hmmf, gfa, "-w", wd]) == 0
        tsv = open(os.path.join(wd, "pathracer.tsv")).read().strip().split("\n")
        assert len(tsv) >= 2 and tsv[1].startswith("motif1\t")


class TestCursorDP:
    """Exactness of the graph-cursor DP (pathracer hmmpath.hpp analog)."""

    def test_score_matches_sequence_viterbi(self):
        genome = _random_seq(300, 21) + MOTIF + _random_seq(300, 22)
        g = construct_graph([genome], K).graph
        h = hmm_from_consensus(MOTIF)
        [hit, *_] = align_hmm_to_graph(g, h, score_threshold=10)
        # the DP score of a hit equals the sequence-level local Viterbi of
        # its own matched window (identical scoring model)
        s, _, _ = viterbi_score(h, hit.seq)
        assert abs(s - hit.score) < 1e-6

    def test_scale_no_path_cap(self):
        """Motif planted on a high-id edge of a >10k-edge tangle: a DFS
        enumerating at most 1000 seed paths in id order (the round-1
        implementation) could never score this edge; the cursor DP covers
        every cursor exactly."""
        from spades_tpu.graph.synthetic import synthetic_tangled_graph

        g = synthetic_tangled_graph(12_000, k=K, seed=3, fill_sequences=True)
        assert g.num_edges > 10_000
        motif = dna.encode(MOTIF)
        # pick a forward edge with a high id, long enough to hold the motif
        cand = np.flatnonzero(
            (np.arange(g.num_edges) % 2 == 0) & (g.e_len >= len(motif) + 4)
        )
        e = int(cand[-1])
        assert e > 2000
        off = 2
        L = int(g.e_len[e])
        g.seq_pool[g.e_off[e] + off : g.e_off[e] + off + len(motif)] = motif
        # mirror into the conjugate row to keep rc-consistency
        ec = int(g.e_conj[e])
        fwd = g.seq_pool[g.e_off[e] : g.e_off[e] + L]
        g.seq_pool[g.e_off[ec] : g.e_off[ec] + L] = (3 - fwd[::-1]).astype(
            np.uint8
        )
        h = hmm_from_consensus(MOTIF)
        hits = align_hmm_to_graph(g, h, score_threshold=15)
        assert hits
        assert any(e in hit.path or ec in hit.path for hit in hits)

    def test_amino_profile_on_graph(self):
        from spades_tpu.hmm.align import translate

        pep = "MKLVNWAERT" * 3
        codons = {}
        for c, aa in [
            ("ATG", "M"), ("AAA", "K"), ("CTG", "L"), ("GTT", "V"),
            ("AAC", "N"), ("TGG", "W"), ("GCA", "A"), ("GAA", "E"),
            ("CGT", "R"), ("ACC", "T"),
        ]:
            codons[aa] = c
        orf = "".join(codons[a] for a in pep)
        genome = _random_seq(250, 31) + orf + _random_seq(250, 32)
        g = construct_graph([genome], K).graph
        h = hmm_from_consensus(pep, alphabet="amino")
        hits = align_hmm_to_graph(g, h, score_threshold=20)
        assert hits
        t = translate(hits[0].seq)
        trc = translate(dna.revcomp_str(hits[0].seq))
        assert pep in t or pep in trc


class TestPlan7Indels:
    """Full plan7 M/I/D recurrences (VERDICT r4 item 4): alignments with
    insertions and deletions must score correctly in BOTH the sequence
    Viterbi and the graph cursor DP (reference: hmmpath.hpp:271-272,734-762)."""

    @staticmethod
    def _indel_motif():
        # 2-base insertion after position 12, 1-base deletion at position 20
        m = MOTIF
        return m[:12] + "GT" + m[12:20] + m[21:]

    def test_viterbi_scores_indel_motif(self):
        h = hmm_from_consensus(MOTIF)
        seq = _random_seq(80, 5) + self._indel_motif() + _random_seq(80, 6)
        score, a, b = viterbi_score(h, seq)
        # all but ~3 of the 27 positions still match through I/D states
        assert score > 10
        assert abs(a - 80) <= 3

    def test_graph_dp_matches_sequence_viterbi_single_edge(self):
        h = hmm_from_consensus(MOTIF)
        seq = _random_seq(60, 7) + self._indel_motif() + _random_seq(60, 8)
        g = construct_graph([seq], K).graph
        edge_seqs = [g.edge_seq(int(e)) for e in g.alive_edge_ids()]
        assert seq in edge_seqs or dna.revcomp_str(seq) in edge_seqs
        hits = align_hmm_to_graph(g, h, score_threshold=5.0)
        assert hits
        ref_score, _, _ = viterbi_score(h, seq)
        assert np.isclose(hits[0].score, ref_score, atol=1e-6), (
            hits[0].score, ref_score,
        )

    def test_graph_dp_indel_across_junction(self):
        # motif with an insertion spans a junction: two branches share the
        # motif suffix; the DP must cross the junction through I/D states
        h = hmm_from_consensus(MOTIF)
        ind = self._indel_motif()
        cut = 15
        a1 = _random_seq(120, 9) + ind[:cut]
        shared = ind[cut:] + _random_seq(120, 10)
        s1 = a1 + shared
        s2 = _random_seq(120, 11) + shared
        g = construct_graph([s1, s2], K).graph
        hits = align_hmm_to_graph(g, h, score_threshold=5.0)
        assert hits
        ref_score, _, _ = viterbi_score(h, s1)
        assert hits[0].score >= ref_score - 1e-6

    def test_deletion_only_run(self):
        # 3-base deletion: D-chain of length 3
        h = hmm_from_consensus(MOTIF)
        m = MOTIF[:10] + MOTIF[13:]
        seq = _random_seq(70, 12) + m + _random_seq(70, 13)
        score, _, _ = viterbi_score(h, seq)
        assert score > 8
        g = construct_graph([seq], K).graph
        hits = align_hmm_to_graph(g, h, score_threshold=5.0)
        assert hits
        assert np.isclose(hits[0].score, score, atol=1e-6)
