"""Multi-chip sharded extension-index build vs the host oracle.

Runs on the virtual 8-device CPU mesh (conftest) — the mirror of the
reference's distributed extension fill + MPI_BAND mask allreduce
(hpcspades construction_mpi.cpp:456)."""
import numpy as np
import pytest

from spades_tpu.core.reads import ReadBatch
from spades_tpu.ops.count import count_sequences
from spades_tpu.ops.extension import build_extension_index
from spades_tpu.parallel.sharded_count import make_mesh
from spades_tpu.parallel.sharded_extension import extension_masks_sharded


def _reads(n, length, seed):
    rng = np.random.default_rng(seed)
    return ["".join("ACGT"[i] for i in rng.integers(0, 4, length)) for _ in range(n)]


@pytest.mark.parametrize("n_dev", [2, 8])
def test_matches_host_oracle(n_dev):
    reads = _reads(32, 60, seed=1)
    batch = ReadBatch.from_sequences(reads)
    mesh = make_mesh(n_dev)
    k = 13
    ei = extension_masks_sharded(batch, k, mesh)
    ref = build_extension_index(count_sequences(reads, k + 1))
    assert np.array_equal(ei.kmers, ref.kmers)
    assert np.array_equal(ei.in_mask, ref.in_mask)
    assert np.array_equal(ei.out_mask, ref.out_mask)


def test_multiword_kmers():
    # k=21 -> 2-word k-mers from 22-mers (multi-word shift path)
    reads = _reads(16, 80, seed=2)
    batch = ReadBatch.from_sequences(reads)
    mesh = make_mesh(4)
    ei = extension_masks_sharded(batch, 21, mesh)
    ref = build_extension_index(count_sequences(reads, 22))
    assert np.array_equal(ei.kmers, ref.kmers)
    assert np.array_equal(ei.in_mask, ref.in_mask)
    assert np.array_equal(ei.out_mask, ref.out_mask)


def test_single_genome_linear():
    rng = np.random.default_rng(3)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    batch = ReadBatch.from_sequences([genome])
    mesh = make_mesh(8)
    ei = extension_masks_sharded(batch, 15, mesh)
    ref = build_extension_index(count_sequences([genome], 16))
    assert np.array_equal(ei.kmers, ref.kmers)
    assert np.array_equal(ei.out_mask, ref.out_mask)
