"""Unit tests for the nucleotide codec and packed k-mer codec.

Mirrors the reference's Seq/RtSeq header tests
(/root/reference/src/test/include_test) at the behavior level.
"""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.core import kmers as K
from tests.conftest import random_dna


def brute_canonical(s: str) -> str:
    rc = dna.revcomp_str(s)
    return min(s, rc)


class TestDna:
    def test_roundtrip(self):
        s = "ACGTACGTNNGGC"
        assert dna.decode(dna.encode(s)) == s

    def test_revcomp(self):
        assert dna.revcomp_str("ACGT") == "ACGT"
        assert dna.revcomp_str("AAAC") == "GTTT"
        assert dna.revcomp_str("ANC") == "GNT"


class TestPack:
    @pytest.mark.parametrize("k", [3, 15, 16, 17, 21, 22, 31, 32, 33, 55, 56, 77])
    def test_pack_unpack_roundtrip(self, rng, k):
        codes = rng.integers(0, 4, (5, k)).astype(np.uint8)
        packed = K.pack(codes)
        assert packed.shape == (5, K.kmer_words(k))
        np.testing.assert_array_equal(K.unpack(packed, k), codes)

    @pytest.mark.parametrize("k", [5, 16, 21, 33, 55])
    def test_lexicographic_order_matches_strings(self, rng, k):
        seqs = [random_dna(rng, k) for _ in range(50)]
        packed = K.pack(np.stack([dna.encode(s) for s in seqs]))
        ints = K.kmer_to_int(packed, k)
        by_int = np.argsort([int(v) for v in ints], kind="stable")
        by_str = np.argsort(seqs, kind="stable")
        np.testing.assert_array_equal(by_int, by_str)
        # and word-wise big-endian compare == string compare
        for i in range(10):
            a, b = packed[2 * i], packed[2 * i + 1]
            want = seqs[2 * i] < seqs[2 * i + 1]
            got = bool(np.asarray(K.lex_less(a[None], b[None]))[0])
            assert got == want

    @pytest.mark.parametrize("k", [3, 15, 16, 17, 21, 31, 33, 55])
    def test_revcomp_words(self, rng, k):
        seqs = [random_dna(rng, k) for _ in range(20)]
        packed = K.pack(np.stack([dna.encode(s) for s in seqs]))
        rc = K.revcomp_words(packed, k)
        expect = K.pack(np.stack([dna.encode(dna.revcomp_str(s)) for s in seqs]))
        np.testing.assert_array_equal(np.asarray(rc), expect)

    @pytest.mark.parametrize("k", [4, 16, 21, 33])
    def test_base_extraction(self, rng, k):
        s = random_dna(rng, k)
        packed = K.pack(dna.encode(s)[None])
        import jax.numpy as jnp

        p = jnp.asarray(packed)
        assert int(K.first_base(p, k)[0]) == int(dna.encode(s)[0])
        assert int(K.last_base(p, k)[0]) == int(dna.encode(s)[-1])
        for j in [0, 1, k // 2, k - 1]:
            assert int(K.base_at(p, j, k)[0]) == int(dna.encode(s)[j])


class TestWindows:
    @pytest.mark.parametrize("k", [5, 17, 21, 33])
    def test_canonical_windows_vs_brute(self, rng, k):
        import jax.numpy as jnp
        from spades_tpu.core.reads import ReadBatch

        seqs = [random_dna(rng, 40 + int(rng.integers(0, 20))) for _ in range(8)]
        seqs[3] = seqs[3][:10] + "N" + seqs[3][11:]  # inject an N
        batch = ReadBatch.from_sequences(seqs)
        canon, valid = K.canonical_windows(
            jnp.asarray(batch.codes), jnp.asarray(batch.lengths), jnp.asarray(batch.n_mask), k
        )
        canon, valid = np.asarray(canon), np.asarray(valid)
        for r, s in enumerate(seqs):
            for i in range(batch.max_len - k + 1):
                window = s[i : i + k] if i + k <= len(s) else None
                ok = window is not None and "N" not in window
                assert valid[r, i] == ok, (r, i)
                if ok:
                    got = dna.decode(K.unpack(canon[r, i][None], k)[0])
                    assert got == brute_canonical(window)
                else:
                    assert np.all(canon[r, i] == K.SENTINEL32)
