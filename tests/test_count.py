"""K-mer counting engine vs a brute-force Python oracle."""
from collections import Counter

import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.core import kmers as K
from spades_tpu.ops import count as C
from tests.conftest import random_dna


def brute_count(seqs, k):
    ctr = Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k]
            if "N" in w:
                continue
            ctr[min(w, dna.revcomp_str(w))] += 1
    return ctr


def counts_to_dict(kc: C.KmerCounts):
    out = {}
    for row, c in zip(kc.words, kc.counts):
        out[dna.decode(K.unpack(row[None], kc.k)[0])] = int(c)
    return out


@pytest.mark.parametrize("k", [5, 17, 21, 33, 55])
def test_count_matches_brute(rng, k):
    seqs = [random_dna(rng, 60 + int(rng.integers(0, 41))) for _ in range(30)]
    seqs[7] = seqs[7][:20] + "N" + seqs[7][21:]
    kc = C.count_sequences(seqs, k)
    expect = brute_count(seqs, k)
    got = counts_to_dict(kc)
    assert got == dict(expect)
    # sortedness invariant
    assert np.all(np.asarray(C._lexsort_rows(kc.words)) == np.arange(kc.num_unique))


def test_multi_batch_merge_equals_single(rng):
    k = 21
    seqs = [random_dna(rng, 100) for _ in range(40)]
    kc1 = C.count_sequences(seqs, k, batch_size=7)
    kc2 = C.count_sequences(seqs, k, batch_size=10_000)
    np.testing.assert_array_equal(kc1.words, kc2.words)
    np.testing.assert_array_equal(kc1.counts, kc2.counts)


def test_searchsorted_rows(rng):
    k = 21
    seqs = [random_dna(rng, 100) for _ in range(10)]
    kc = C.count_sequences(seqs, k)
    idx = C.searchsorted_rows(kc.words, kc.words)
    np.testing.assert_array_equal(idx, np.arange(kc.num_unique))
    # absent needles -> -1 (use k-mers from fresh random sequences)
    other = C.count_sequences([random_dna(rng, 200)], k)
    mask_present = C.searchsorted_rows(kc.words, other.words) >= 0
    expect_present = np.array(
        [w in counts_to_dict(kc) for w in counts_to_dict(other)]
    )
    np.testing.assert_array_equal(mask_present, expect_present)


def test_count_on_ecoli_1k(ecoli_1k_reads, ecoli_1k_reference):
    """The real --test dataset: most genome 21-mers should be present."""
    k = 21
    kc = C.count_sequences(ecoli_1k_reads, k)
    genome = brute_count([ecoli_1k_reference], k)
    got = counts_to_dict(kc)
    present = sum(1 for g in genome if g in got)
    assert present / len(genome) > 0.99
    expected_total = sum(
        sum(
            1
            for i in range(len(s) - k + 1)
            if "N" not in s[i : i + k]
        )
        for s in ecoli_1k_reads
    )
    assert kc.total == expected_total


def test_no_valid_kmers():
    """All-N / empty inputs must yield an empty count, not crash (verify probe)."""
    kc = C.count_sequences(["N" * 50], 21)
    assert kc.num_unique == 0 and kc.total == 0
    kc = C.count_sequences([], 21)
    assert kc.num_unique == 0


class TestChopSequences:
    def test_chop_preserves_kmer_multiset(self, rng):
        from spades_tpu.core.reads import chop_sequences
        from spades_tpu.ops.count import count_sequences
        from tests.conftest import random_dna

        s = random_dna(rng, 5000)
        k = 21
        chunks = list(chop_sequences([s], k, max_len=600))
        assert all(len(c) <= 600 for c in chunks)
        a = count_sequences([s], k)
        b = count_sequences(chunks, k)
        assert np.array_equal(a.words, b.words)
        assert np.array_equal(a.counts, b.counts)

    def test_short_passthrough(self):
        from spades_tpu.core.reads import chop_sequences

        assert list(chop_sequences(["ACGT"], 3, max_len=10)) == ["ACGT"]

    def test_batch_iter_bounds_padded_footprint(self, rng):
        from spades_tpu.core.reads import batch_iter
        from tests.conftest import random_dna

        seqs = [random_dna(rng, 100)] * 50 + [random_dna(rng, 5000)]
        batches = list(batch_iter(seqs, batch_size=1000, max_batch_nt=100_000))
        # the long sequence is flushed into its own batch: no batch pads
        # 50 short reads to 5000 nt
        assert all(b.codes.size <= 120_000 for b in batches)
        # rows are padded to a multiple of 8; count real reads by length
        assert sum(int((b.lengths > 0).sum()) for b in batches) == 51


class TestDeviceRunStack:
    """Device-resident run merging (`DeviceRunStack`): per-batch unique runs
    stay on device and merge in HBM; the host pulls one final table."""

    def test_matches_host_oracle(self, rng, monkeypatch):
        # force every batch through the device path
        monkeypatch.setenv("SPADES_HOST_COUNT_WINDOWS", "0")
        from spades_tpu.core.reads import batch_iter, chop_sequences

        k = 23
        seqs = [random_dna(rng, 120) for _ in range(300)]
        seqs += seqs[:60]                       # duplicate reads
        seqs[5] = seqs[5][:40] + "N" * 5 + seqs[5][45:]
        batches = list(batch_iter(chop_sequences(seqs, k), batch_size=64))
        host = C.merge_counts(
            [C.count_batch_host(b.codes, b.lengths, b.n_mask, k) for b in batches]
        )
        tm = {}
        dev = C.count_reads(
            batch_iter(chop_sequences(seqs, k), batch_size=64), k, timings=tm
        )
        assert dev.num_unique == host.num_unique
        assert np.array_equal(dev.words, host.words)
        assert np.array_equal(dev.counts, host.counts)
        # the device path was actually taken: batches counted, no host runs
        assert tm["n_batches"] == len(batches)
        assert tm["host_s"] == 0.0

    def test_pow2_capacity_quantization(self):
        assert C._pow2ceil(1) == 4096
        assert C._pow2ceil(4096) == 4096
        assert C._pow2ceil(4097) == 8192
        assert C._pow2ceil(5_000_000) == 1 << 23

    def test_empty_and_single_run(self):
        st = C.DeviceRunStack(21)
        assert st.finish().num_unique == 0


def test_fused_structure_counting_matches_two_pass(rng, monkeypatch):
    """Prev-K contigs counted into the same device merge with ZEROED counts
    must give the identical (structure, coverage) table as the two-pass
    count + host merge + lookup path (construction.cpp:110,233 semantics)."""
    from spades_tpu.core.reads import batch_iter, chop_sequences

    k1 = 22
    reads = [random_dna(rng, 100) for _ in range(200)]
    genome = random_dna(rng, 1500)
    extras = [genome, random_dna(rng, 800)]

    # two-pass oracle
    p1 = C.count_reads(batch_iter(chop_sequences(reads, k1), batch_size=64), k1)
    p_extra = C.count_sequences(extras, k1)
    structure = C.merge_counts([p1, p_extra])
    cov = np.zeros(structure.num_unique, np.int64)
    rows = C.searchsorted_rows(structure.words, p1.words)
    cov[rows] = p1.counts
    # fused path (force device so the zeroed-count push is exercised)
    monkeypatch.setenv("SPADES_HOST_COUNT_WINDOWS", "0")
    fused = C.count_reads(
        batch_iter(chop_sequences(reads, k1), batch_size=64), k1,
        structure_batches=batch_iter(chop_sequences(extras, k1), batch_size=64),
    )
    assert np.array_equal(fused.words, structure.words)
    assert np.array_equal(fused.counts, cov)
