"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Mirrors the reference's CI pattern of simulating multi-node with N MPI ranks
on one machine (SURVEY.md §4): multi-chip sharding is validated on
xla_force_host_platform_device_count virtual devices.
"""
import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS=axon (live TPU) and
# jax may already be imported by sitecustomize, so update jax.config directly
# (backends are initialized lazily, on first use — after this runs).
_platform = os.environ.get("SPADES_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


REFERENCE_TEST_DATASET = "/root/reference/src/projects/spades/test_dataset"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def random_dna(rng, n: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.fixture(scope="session")
def ecoli_1k_reads():
    """The bundled --test paired-end reads from the reference, if present."""
    import os.path as osp

    p1 = osp.join(REFERENCE_TEST_DATASET, "ecoli_1K_1.fq.gz")
    p2 = osp.join(REFERENCE_TEST_DATASET, "ecoli_1K_2.fq.gz")
    if not (osp.exists(p1) and osp.exists(p2)):
        pytest.skip("reference test dataset not available")
    from spades_tpu.io.fastx import read_sequences

    return list(read_sequences([p1, p2]))


@pytest.fixture(scope="session")
def ecoli_1k_reference():
    import os.path as osp

    p = osp.join(REFERENCE_TEST_DATASET, "reference_1K.fa.gz")
    if not osp.exists(p):
        pytest.skip("reference test dataset not available")
    from spades_tpu.io.fastx import read_sequences

    return next(iter(read_sequences(p)))


def random_condensed_graph(rng, n_long: int = 6, k: int = 21, mutate: int = 3):
    """Random-graph generator fixture (the reference's random_graph.hpp
    analog, SURVEY.md §4): build a graph by constructing from reads of a
    random genome with random SNP variants, giving realistic tangles."""
    from spades_tpu.pipeline.construction import construct_graph

    genome = random_dna(rng, 300 * n_long)
    seqs = [genome]
    # SNP haplotype variants create bulges
    for _ in range(mutate):
        pos = int(rng.integers(k + 1, len(genome) - k - 1))
        alt = "ACGT"[(("ACGT".index(genome[pos])) + 1) % 4]
        seqs.append(genome[pos - k : pos] + alt + genome[pos + 1 : pos + k + 1])
    reads = []
    for s in seqs:
        cov = 30 if s is genome else 6
        for _ in range(max(3, cov * len(s) // 100)):
            a = int(rng.integers(0, max(1, len(s) - 100)))
            reads.append(s[a : a + 100])
    res = construct_graph(reads, k)
    return res.graph


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running scale/e2e tests")
