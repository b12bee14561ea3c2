"""BayesHammer-equivalent error correction tests.

Mirrors the reference's correction contract (projects/hammer): solid k-mer
consensus repairs isolated sequencing errors without corrupting clean reads.
"""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.core import kmers as K
from spades_tpu.hammer import HammerConfig, correct_reads
from spades_tpu.hammer.clustering import cluster_kmers, hamming_distance


def _random_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _tile_reads(genome, read_len, coverage, seed=1):
    rng = np.random.default_rng(seed)
    n_reads = int(len(genome) * coverage / read_len)
    starts = rng.integers(0, len(genome) - read_len + 1, n_reads)
    return [genome[s : s + read_len] for s in starts]


def _inject_errors(reads, rate, seed=2):
    rng = np.random.default_rng(seed)
    out, n_err = [], 0
    for r in reads:
        c = dna.encode(r).copy()
        for i in np.flatnonzero(rng.random(len(c)) < rate):
            c[i] = (c[i] + rng.integers(1, 4)) % 4
            n_err += 1
        out.append(dna.decode(c))
    return out, n_err


class TestHammingDistance:
    def test_zero(self):
        w = K.pack(np.array([[0, 1, 2, 3] * 5 + [1]]))
        assert hamming_distance(w, w)[0] == 0

    def test_one(self):
        a = np.array([[0, 1, 2, 3] * 5 + [1]])
        b = a.copy()
        b[0, 7] = (b[0, 7] + 2) % 4
        assert hamming_distance(K.pack(a), K.pack(b))[0] == 1

    def test_many(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 4, (20, 21))
        b = a.copy()
        flips = rng.integers(0, 21, 20)
        for i, p in enumerate(flips):
            b[i, p] = (b[i, p] + 1) % 4
        d = hamming_distance(K.pack(a), K.pack(b))
        assert (d == 1).all()


class TestClustering:
    def test_distance_one_pairs_cluster(self):
        rng = np.random.default_rng(3)
        base = rng.integers(0, 4, (10, 21))
        mut = base.copy()
        mut[:, 5] = (mut[:, 5] + 1) % 4
        words = K.pack(np.concatenate([base, mut]))
        labels = cluster_kmers(words, 21, tau=1)
        for i in range(10):
            assert labels[i] == labels[i + 10]

    def test_distant_kmers_separate(self):
        rng = np.random.default_rng(4)
        words = K.pack(rng.integers(0, 4, (50, 21)))
        labels = cluster_kmers(words, 21, tau=1)
        # random 21-mers are essentially never within distance 1
        assert len(np.unique(labels)) == 50

    def test_large_block_recursion(self):
        # 300 k-mers sharing the first half exactly -> one oversized block
        rng = np.random.default_rng(5)
        codes = rng.integers(0, 4, (300, 21))
        codes[:, :10] = 1
        words = K.pack(codes)
        labels = cluster_kmers(words, 21, tau=1, cap=64)
        assert labels.shape == (300,)


class TestCorrection:
    def test_fixes_isolated_errors(self):
        genome = _random_genome(2000, seed=10)
        clean = _tile_reads(genome, 100, coverage=40, seed=11)
        noisy, n_err = _inject_errors(clean, 0.005, seed=12)
        assert n_err > 20
        fixed, stats = correct_reads(noisy, HammerConfig())
        rem = sum(
            sum(a != b for a, b in zip(f, c)) for f, c in zip(fixed, clean)
        )
        assert rem < 0.2 * n_err, f"{rem} of {n_err} errors remain"
        assert stats.bases_changed > 0

    def test_clean_reads_mostly_untouched(self):
        genome = _random_genome(1500, seed=20)
        clean = _tile_reads(genome, 100, coverage=30, seed=21)
        fixed, stats = correct_reads(clean, HammerConfig())
        diff = sum(f != c for f, c in zip(fixed, clean))
        assert diff <= len(clean) * 0.02

    def test_preserves_order_and_count(self):
        genome = _random_genome(500, seed=30)
        reads = _tile_reads(genome, 80, coverage=10, seed=31)
        fixed, _ = correct_reads(reads)
        assert len(fixed) == len(reads)
        assert all(len(f) == len(r) for f, r in zip(fixed, reads))

    def test_short_reads_pass_through(self):
        fixed, _ = correct_reads(["ACGT", "GGG"], HammerConfig(k=21))
        assert fixed == ["ACGT", "GGG"]

    def test_n_positions_recovered(self):
        genome = _random_genome(1000, seed=40)
        clean = _tile_reads(genome, 100, coverage=40, seed=41)
        noisy = list(clean)
        noisy[0] = noisy[0][:50] + "N" + noisy[0][51:]
        fixed, _ = correct_reads(noisy)
        assert fixed[0][50] == clean[0][50]

    def test_empty_input(self):
        fixed, stats = correct_reads([])
        assert fixed == []
