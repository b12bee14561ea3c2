"""Multi-device sharded counting on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from spades_tpu.core.reads import ReadBatch
from spades_tpu.ops.count import count_sequences
from spades_tpu.parallel.sharded_count import count_kmers_sharded, make_mesh
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_equals_single_device(rng, mesh8):
    k = 21
    seqs = [random_dna(rng, 100) for _ in range(64)]
    seqs[5] = seqs[5][:30] + "N" + seqs[5][31:]
    batch = ReadBatch.from_sequences(seqs)
    kc_sharded = count_kmers_sharded(batch, k, mesh8)
    kc_single = count_sequences(seqs, k)
    np.testing.assert_array_equal(kc_sharded.words, kc_single.words)
    np.testing.assert_array_equal(kc_sharded.counts, kc_single.counts)


def test_sharded_uneven_reads(rng, mesh8):
    # read count not divisible by mesh size -> padding path
    k = 15
    seqs = [random_dna(rng, 80) for _ in range(13)]
    batch = ReadBatch.from_sequences(seqs, pad_reads_to=1)
    kc_sharded = count_kmers_sharded(batch, k, mesh8)
    kc_single = count_sequences(seqs, k)
    np.testing.assert_array_equal(kc_sharded.words, kc_single.words)
    np.testing.assert_array_equal(kc_sharded.counts, kc_single.counts)
