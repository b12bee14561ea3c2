"""Vectorized-simplification parity and scale tests.

Covers the round-2 rework: lexsort two-best competitor coverage, vectorized
bulge grouping, native bounded-Dijkstra bulge pass (vs the pure-Python CSR
fallback), and the lazy compress seq pool — on synthetic tangled graphs
(random_graph.hpp-style fixtures at scale, SURVEY.md §4)."""
from __future__ import annotations

import numpy as np
import pytest

from spades_tpu.graph import simplify as S
from spades_tpu.graph.compress import compress
from spades_tpu.graph.coverage_model import GenomicInfo
from spades_tpu.graph.synthetic import synthetic_tangled_graph


def _clone(g):
    import copy

    return copy.deepcopy(g)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bulge_dijkstra_native_matches_python(seed, monkeypatch):
    from spades_tpu import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    g1 = synthetic_tangled_graph(4000, k=21, seed=seed)
    g2 = _clone(g1)
    cfg = S.SimplifyConfig()

    n_native = S.remove_bulges_dijkstra(g1, cfg)

    monkeypatch.setattr(native, "bulge_pass_native", lambda *a, **k: None)
    n_py = S.remove_bulges_dijkstra(g2, cfg)

    assert n_native == n_py
    assert np.array_equal(g1.alive, g2.alive)
    assert np.allclose(g1.e_cov, g2.e_cov)


def test_two_best_per_key_matches_loop():
    rng = np.random.default_rng(3)
    V = 50
    keys = rng.integers(0, V, 300)
    c = np.round(rng.random(300) * 10, 2)
    best, second = S._two_best_per_key(keys, c, V)
    # sequential oracle (the round-1 implementation)
    b = np.zeros(V)
    s = np.zeros(V)
    order = np.argsort(c, kind="stable")
    for kk, cv in zip(keys[order], c[order]):
        if cv >= b[kk]:
            s[kk] = b[kk]
            b[kk] = cv
        elif cv > s[kk]:
            s[kk] = cv
    assert np.allclose(best, b)
    assert np.allclose(second, s)


def test_simplify_scale_100k_edges_fast_and_clean():
    g = synthetic_tangled_graph(100_000, k=21, seed=7, fill_sequences=False)
    e0 = g.num_edges
    info = GenomicInfo(
        ec_bound=5.0, trusted_bound=10.0, estimated_mean=30.0, genome_size=10**6
    )
    import time

    t0 = time.perf_counter()
    g2, stats = S.simplify(g, info, S.SimplifyConfig())
    dt = time.perf_counter() - t0
    assert stats.tips > 0 and stats.bulges > 0 and stats.ec > 0
    assert g2.num_edges < e0
    # topology invariants survive at scale (seq content is synthetic-random,
    # so only structural checks apply after merges)
    a = g2.alive
    assert np.array_equal(g2.e_conj[g2.e_conj], np.arange(len(a)))
    assert np.array_equal(a, a[g2.e_conj])
    assert dt < 30.0, f"100k-edge simplify took {dt:.1f}s"


def test_compress_lazy_pool_gc():
    g = synthetic_tangled_graph(2000, k=21, seed=5)
    # kill 90% of edges -> pool mostly dead -> GC must repack
    ids = g.alive_edge_ids()
    g.kill_edges(ids[: int(len(ids) * 0.9)])
    g2 = compress(g)
    assert g2.seq_pool.shape[0] <= 2 * int(g2.e_len.sum())
    # offsets all in range
    assert np.all(g2.e_off + g2.e_len <= g2.seq_pool.shape[0])
