"""Sharded distance estimation vs the host estimator (DistanceEstimationMPI
analog, VERDICT r4 item 7)."""
import jax
import numpy as np
import pytest

from spades_tpu.paired.distance_estimation import DEConfig, estimate_simple
from spades_tpu.paired.paired_info import PairedIndex
from spades_tpu.parallel.sharded_count import make_mesh
from spades_tpu.parallel.sharded_de import estimate_simple_sharded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _random_pi(rng, n_pairs=200, rows_per_pair=6):
    e1, e2, d, w = [], [], [], []
    for _ in range(n_pairs):
        a, b = int(rng.integers(0, 500)), int(rng.integers(0, 500))
        base = int(rng.integers(50, 400))
        for r in range(int(rng.integers(1, rows_per_pair))):
            e1.append(a)
            e2.append(b)
            d.append(base + int(rng.integers(0, 40)))
            w.append(float(rng.integers(1, 5)))
    e1 = np.asarray(e1, np.int64)
    e2 = np.asarray(e2, np.int64)
    d = np.asarray(d, float)
    w = np.asarray(w, float)
    o = np.lexsort((d, e2, e1))
    # collapse duplicate (e1,e2,d) rows as build_paired_index would
    e1, e2, d, w = e1[o], e2[o], d[o], w[o]
    return PairedIndex(e1, e2, d, w)


def test_sharded_de_matches_host(mesh8):
    rng = np.random.default_rng(3)
    pi = _random_pi(rng)
    cfg = DEConfig()
    host = estimate_simple(pi, cfg)
    dev = estimate_simple_sharded(pi, mesh8, cfg)
    assert host.e1.size == dev.e1.size
    o_h = np.lexsort((host.dist, host.e2, host.e1))
    np.testing.assert_array_equal(host.e1[o_h], dev.e1)
    np.testing.assert_array_equal(host.e2[o_h], dev.e2)
    np.testing.assert_allclose(host.dist[o_h], dev.dist, rtol=1e-5)
    np.testing.assert_allclose(host.weight[o_h], dev.weight, rtol=1e-6)


def test_sharded_de_empty(mesh8):
    z = np.zeros(0)
    pi = PairedIndex(z.astype(np.int64), z.astype(np.int64), z, z)
    dev = estimate_simple_sharded(pi, mesh8)
    assert dev.e1.size == 0


def test_sharded_de_single_heavy_group(mesh8):
    # one group with many rows: exercises sentinel padding on 7 idle shards
    n = 300
    d = np.sort(np.arange(n) * 2)  # all gaps <= linkage -> one cluster... no:
    # gaps of 2 <= linkage(10): single cluster
    pi = PairedIndex(
        np.zeros(n, np.int64), np.ones(n, np.int64), d.astype(float),
        np.ones(n),
    )
    host = estimate_simple(pi)
    dev = estimate_simple_sharded(pi, mesh8)
    np.testing.assert_allclose(host.dist, dev.dist, rtol=1e-5)
    np.testing.assert_allclose(host.weight, dev.weight, rtol=1e-6)
