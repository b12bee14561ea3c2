"""Early (pre-condensation) simplification on the extension index.

Mirrors the reference's EarlyTipClipperProcessor / EarlyLowComplexityClipper
(/root/reference/src/common/assembly_graph/construction/
early_simplification.hpp:37-160): clipping runs on k-mer in/out masks BEFORE
the graph is materialized, so the condenser never sees the error tangle.
"""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.ops import early_clip as EC
from spades_tpu.ops.extension import build_extension_index
from spades_tpu.ops.count import count_sequences
from spades_tpu.pipeline.construction import construct_graph
from tests.conftest import random_dna


def canonical_kmer_multiset(s, k):
    return [min(w, dna.revcomp_str(w)) for w in (s[i : i + k] for i in range(len(s) - k + 1))]


def is_clean(s, k):
    ms = canonical_kmer_multiset(s, k)
    return len(ms) == len(set(ms))


def clean_random_dna(rng, n, k):
    for _ in range(1000):
        s = random_dna(rng, n)
        if is_clean(s, k):
            return s
    raise RuntimeError("could not generate clean sequence")


def mutate(s, pos, rng):
    alt = [c for c in "ACGT" if c != s[pos]]
    return s[:pos] + str(rng.choice(alt)) + s[pos + 1 :]


def tile_reads(genome, L, step):
    reads = [genome[i : i + L] for i in range(0, len(genome) - L + 1, step)]
    reads.append(genome[-L:])
    return reads


def build_index(seqs, k):
    p1 = count_sequences(seqs, k + 1)
    return build_extension_index(p1), p1


class TestMaskDeletionAPI:
    def test_delete_outgoing_forward(self, rng):
        k = 11
        s = clean_random_dna(rng, 40, k)
        E, _ = build_index([s], k)
        # pick a row with a nonzero out mask, forward orientation
        rows = np.flatnonzero(E.out_mask > 0)
        r = rows[0]
        c = int(np.flatnonzero((E.out_mask[r] >> np.arange(4)) & 1)[0])
        before = int(E.out_mask[r])
        E.delete_outgoing(np.array([r]), np.array([False]), np.array([c], np.uint8))
        assert int(E.out_mask[r]) == before & ~(1 << c)

    def test_delete_outgoing_rc_view_hits_in_mask(self, rng):
        k = 11
        s = clean_random_dna(rng, 40, k)
        E, _ = build_index([s], k)
        rows = np.flatnonzero(E.in_mask > 0)
        r = rows[0]
        # in-bit b in forward view == out-bit (3-b) in the rc view
        b = int(np.flatnonzero((E.in_mask[r] >> np.arange(4)) & 1)[0])
        before = int(E.in_mask[r])
        E.delete_outgoing(np.array([r]), np.array([True]), np.array([3 - b], np.uint8))
        assert int(E.in_mask[r]) == before & ~(1 << b)

    def test_isolate(self, rng):
        k = 11
        s = clean_random_dna(rng, 40, k)
        E, _ = build_index([s], k)
        E.isolate(np.arange(E.num_kmers))
        assert not E.in_mask.any() and not E.out_mask.any()


class TestEarlyTipClipper:
    @pytest.mark.parametrize("k", [11, 21])
    def test_tip_read_clipped_to_single_edge(self, rng, k):
        # genome reads + one erroneous read that diverges at a single base
        # near its end -> short dead-end branch off a junction k-mer
        genome = clean_random_dna(rng, 400, k)
        reads = tile_reads(genome, 3 * k, 3)
        bad = mutate(genome[50 : 50 + 3 * k], 3 * k - 4, rng)
        res = construct_graph(
            reads + [bad], k, early_tip_clip=True, early_tc_length_bound=2 * k
        )
        g = res.graph
        g.check_invariants()
        assert len(g.canonical_edge_ids()) == 1
        got = g.edge_seq(g.canonical_edge_ids()[0])
        assert got in (genome, dna.revcomp_str(genome))

    def test_without_clip_tip_survives(self, rng):
        k = 11
        genome = clean_random_dna(rng, 400, k)
        reads = tile_reads(genome, 3 * k, 3)
        bad = mutate(genome[50 : 50 + 3 * k], 3 * k - 4, rng)
        g = construct_graph(reads + [bad], k).graph
        assert len(g.canonical_edge_ids()) > 1

    def test_matches_post_condense_tip_clip(self, rng):
        # early-clipped construction == construct-then-clip-tips, edge-set-wise
        from spades_tpu.graph.simplify import clip_tips
        from spades_tpu.graph.compress import compress

        k = 15
        genome = clean_random_dna(rng, 600, k)
        reads = tile_reads(genome, 3 * k, 4)
        bads = [
            mutate(genome[p : p + 3 * k], 3 * k - 5, rng) for p in (40, 200, 390)
        ]
        early = construct_graph(
            reads + bads, k, early_tip_clip=True, early_tc_length_bound=2 * k
        ).graph
        late = construct_graph(reads + bads, k).graph
        while clip_tips(late, max_len=3 * k):
            pass
        late = compress(late)
        early_seqs = {early.edge_seq(e) for e in early.canonical_edge_ids()}
        late_seqs = {late.edge_seq(e) for e in late.canonical_edge_ids()}
        assert early_seqs == late_seqs

    def test_long_branch_not_clipped(self, rng):
        # a "tip" longer than the bound must survive
        k = 11
        genome = clean_random_dna(rng, 300, k)
        reads = tile_reads(genome, 3 * k, 3)
        # diverge early in the read -> long branch (> bound interior nodes)
        bad = mutate(genome[50 : 50 + 3 * k], 5, rng)
        bad_reads = [bad, bad[: 2 * k], bad[k :]]
        n_before = construct_graph(reads + bad_reads, k).graph.num_edges
        g = construct_graph(
            reads + bad_reads, k, early_tip_clip=True, early_tc_length_bound=3
        ).graph
        assert g.num_edges == n_before

    def test_equal_length_tips_both_kept(self, rng):
        # two branches, both tips of the same length: neither is strictly
        # shorter than the longest -> nothing removed (reference keeps both)
        k = 11
        genome = clean_random_dna(rng, 200, k)
        reads = tile_reads(genome, 3 * k, 3)
        bad = mutate(genome[50 : 50 + 3 * k], 3 * k - 4, rng)
        E0, _ = build_index(reads + [bad], k)
        tails = E0.out_mask.copy(), E0.in_mask.copy()
        # clip only the artificial junction's sibling set
        EC.clip_tips_early(E0, 2 * k)
        g = construct_graph(reads + [bad], k, early_tip_clip=True, early_tc_length_bound=2 * k).graph
        assert len(g.canonical_edge_ids()) == 1


class TestEarlyATClipper:
    def test_poly_a_tip_removed(self, rng):
        k = 11
        genome = clean_random_dna(rng, 300, k)
        reads = tile_reads(genome, 3 * k, 3)
        # a read that runs off into poly-A at position 60 (length < 200)
        polya = genome[30:60] + "A" * 25
        g0 = construct_graph(reads + [polya], k).graph
        assert len(g0.canonical_edge_ids()) > 1
        g = construct_graph(reads + [polya], k, early_at_clip=True).graph
        g.check_invariants()
        assert len(g.canonical_edge_ids()) == 1
        got = g.edge_seq(g.canonical_edge_ids()[0])
        assert got in (genome, dna.revcomp_str(genome))

    def test_high_complexity_tip_survives_at_clipper(self, rng):
        k = 11
        genome = clean_random_dna(rng, 300, k)
        reads = tile_reads(genome, 3 * k, 3)
        bad = mutate(genome[50 : 50 + 3 * k], 3 * k - 4, rng)
        n_before = construct_graph(reads + [bad], k).graph.num_edges
        g = construct_graph(reads + [bad], k, early_at_clip=True).graph
        assert g.num_edges == n_before

    def test_base_counts(self):
        from spades_tpu.core import kmers as K

        for s in ["ACGTACGTACG", "AAAAAAAAAAA", "AAAAATTTTTC"]:
            w = K.pack(np.asarray(dna.encode(s))[None, :])
            cnt = EC.base_counts(w, len(s))[0]
            for b, ch in enumerate("ACGT"):
                assert cnt[b] == s.count(ch)
