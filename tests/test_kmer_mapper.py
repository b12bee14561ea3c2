"""KmerMapper: glue-substitution tracking and read-mapping projection."""
import numpy as np
import pytest

from spades_tpu.alignment.kmer_mapper import KmerMapper
from spades_tpu.core import dna
from spades_tpu.core import kmers as K
from spades_tpu.ops.extension import canonicalize
from tests.conftest import random_dna


def pack_canon(seq: str, k: int) -> np.ndarray:
    codes = dna.encode(seq)
    wins = np.lib.stride_tricks.sliding_window_view(codes, k)
    canon, _ = canonicalize(K.pack(np.ascontiguousarray(wins)), k)
    return canon


class TestKmerMapper:
    def test_remap_substitute(self, rng):
        k = 21
        old = random_dna(rng, 60)
        # new differs by one SNP in the middle
        mid = 30
        alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[old[mid]]
        new = old[:mid] + alt + old[mid + 1:]
        m = KmerMapper(k=k)
        m.remap_sequences(old, new)
        assert m.size > 0
        old_words = pack_canon(old, k)
        out = m.substitute(old_words.copy())
        new_words = pack_canon(new, k)
        # every remapped old k-mer must be spelled by the new sequence
        new_set = {tuple(w) for w in new_words}
        assert all(tuple(w) in new_set for w in out)

    def test_identical_sequences_noop(self, rng):
        k = 21
        s = random_dna(rng, 50)
        m = KmerMapper(k=k)
        m.remap_sequences(s, s)
        assert m.size == 0

    def test_chain_normalization(self, rng):
        k = 21
        a = random_dna(rng, 40)
        b = a[:20] + {"A": "C", "C": "G", "G": "T", "T": "A"}[a[20]] + a[21:]
        c = b[:25] + {"A": "C", "C": "G", "G": "T", "T": "A"}[b[25]] + b[26:]
        m = KmerMapper(k=k)
        m.remap_sequences(a, b)
        m.remap_sequences(b, c)
        m.normalize()
        out = m.substitute(pack_canon(a, k).copy())
        c_set = {tuple(w) for w in pack_canon(c, k)}
        b_only = {tuple(w) for w in pack_canon(b, k)} - c_set
        # after compressing chains nothing should land on intermediate b-only kmers
        assert all(tuple(w) not in b_only for w in out)

    def test_bulge_glue_keeps_reads_mappable(self, rng):
        """Reads spelling a removed bulge arm still map via the mapper."""
        from spades_tpu.graph.graph import CondensedGraph
        from spades_tpu.graph.simplify import SimplifyConfig, remove_bulges
        from spades_tpu.alignment.mapper import build_edge_index, map_read_batch

        k = 21
        left = random_dna(rng, 60)
        right = random_dna(rng, 60)
        armA = left[-k:] + random_dna(rng, 3) + right[:k]
        # armB: same endpoints, one-SNP variant of armA interior
        mid = k + 1
        alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[armA[mid]]
        armB = armA[:mid] + alt + armA[mid + 1:]

        g = CondensedGraph(
            k=k,
            e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
            e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
            e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
            alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
            v_conj=np.zeros(0, np.int64),
        )
        g.v_conj = np.array([1, 0, 3, 2], np.int64)
        eA, _ = g.add_edge_pair(0, 2, dna.encode(armA), cov_sum=100.0)
        eB, _ = g.add_edge_pair(0, 2, dna.encode(armB), cov_sum=10.0)
        g.check_invariants()

        mapper = KmerMapper(k=k)
        cfg = SimplifyConfig()
        n = remove_bulges(g, cfg, kmer_mapper=mapper)
        assert n >= 1
        assert g.alive[eA] and not g.alive[eB]
        assert mapper.size > 0

        index = build_edge_index(g)
        # a read spelling the REMOVED arm maps only through the mapper
        read = armB
        plain = map_read_batch(index, g, [read])
        mapped = map_read_batch(index, g, [read], kmer_mapper=mapper)
        assert mapped[0] is not None
        assert mapped[0].edge in (eA, int(g.e_conj[eA]))
        assert plain[0] is None or mapped[0].n_hits >= plain[0].n_hits
