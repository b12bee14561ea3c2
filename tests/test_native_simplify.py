"""Native simplification-engine parity tests.

The chain-merging engine (native/simplify.cpp) must reproduce the vectorized
numpy schedule (graph/simplify.py) — which is itself the mirror of the
reference's simplification stage (`stages/simplification.cpp:405-429`,
`modules/simplification/*`) — exactly in retrigger=False mode, and its
event-driven retrigger mode (the reference's SmartSet semantics,
`parallel_simplification_algorithms.hpp`) must agree on these fixtures."""
from __future__ import annotations

import copy

import numpy as np
import pytest

from spades_tpu.graph import simplify as S
from spades_tpu.graph.coverage_model import GenomicInfo
from spades_tpu.graph.synthetic import synthetic_tangled_graph

INFO = GenomicInfo(
    ec_bound=5.0, trusted_bound=10.0, estimated_mean=30.0, genome_size=10**6
)


def _native_available():
    from spades_tpu import native

    return native.lib() is not None


def _edge_multiset(g):
    ids = g.alive_edge_ids()
    return sorted(
        zip(
            g.e_start[ids].tolist(),
            g.e_end[ids].tolist(),
            g.e_len[ids].tolist(),
            np.round(g.e_cov[ids], 6).tolist(),
        )
    )


def _python_simplify(g, cfg):
    from spades_tpu import native

    orig = native.simplify_native
    native.simplify_native = lambda *a, **k: None
    try:
        return S.simplify(g, INFO, cfg)
    finally:
        native.simplify_native = orig


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_schedule_matches_numpy_exactly(seed):
    if not _native_available():
        pytest.skip("native library unavailable")
    g0 = synthetic_tangled_graph(20_000, k=21, seed=seed)
    cfg = S.SimplifyConfig(retrigger=False)
    ga, sa = S.simplify(copy.deepcopy(g0), INFO, cfg)
    gb, sb = _python_simplify(copy.deepcopy(g0), cfg)
    assert (sa.tips, sa.bulges, sa.ec, sa.isolated, sa.iterations) == (
        sb.tips, sb.bulges, sb.ec, sb.isolated, sb.iterations
    )
    assert _edge_multiset(ga) == _edge_multiset(gb)
    # structural invariants (synthetic sequences are per-edge only, so the
    # seq-level conjugate check does not apply after merges)
    a = ga.alive
    assert np.array_equal(ga.e_conj[ga.e_conj], np.arange(len(a)))
    assert np.array_equal(ga.e_start[ga.e_conj[a]], ga.v_conj[ga.e_end[a]])
    assert np.array_equal(ga.e_end[ga.e_conj[a]], ga.v_conj[ga.e_start[a]])


@pytest.mark.parametrize("seed", [0, 3])
def test_retrigger_mode_agrees(seed):
    """Event-driven retriggering must not change results on these graphs."""
    if not _native_available():
        pytest.skip("native library unavailable")
    g0 = synthetic_tangled_graph(20_000, k=21, seed=seed)
    ga, _ = S.simplify(copy.deepcopy(g0), INFO, S.SimplifyConfig(retrigger=False))
    gb, _ = S.simplify(copy.deepcopy(g0), INFO, S.SimplifyConfig(retrigger=True))
    assert _edge_multiset(ga) == _edge_multiset(gb)


def test_real_graph_sequences_and_order(rng):
    """On a real constructed graph the native path must produce the same
    surviving sequences in the same edge order (contig numbering contract)."""
    if not _native_available():
        pytest.skip("native library unavailable")
    from spades_tpu.pipeline.construction import construct_graph
    from tests.conftest import random_dna

    genome = random_dna(rng, 20_000)
    reads = [genome[i : i + 150] for i in range(0, len(genome) - 150, 13)]
    bad = [r[:50] + "ACGT"[rng.integers(0, 4)] + r[51:] for r in reads[::7]]
    g0 = construct_graph(reads + bad, 21).graph
    ga, _ = S.simplify(copy.deepcopy(g0), INFO, S.SimplifyConfig())
    gb, _ = _python_simplify(copy.deepcopy(g0), S.SimplifyConfig())
    seqs_a = [ga.edge_seq(int(e)) for e in ga.alive_edge_ids()]
    seqs_b = [gb.edge_seq(int(e)) for e in gb.alive_edge_ids()]
    assert seqs_a == seqs_b
    ga.check_invariants()


def test_glue_records_feed_kmer_mapper(rng):
    """Bulge glue must reach the kmer mapper identically through the native
    engine's recorded arm/keep chains (RemapKmers contract)."""
    if not _native_available():
        pytest.skip("native library unavailable")
    from spades_tpu.alignment.kmer_mapper import KmerMapper
    from spades_tpu.pipeline.construction import construct_graph
    from tests.conftest import random_dna

    genome = random_dna(rng, 5_000)
    reads = [genome[i : i + 150] for i in range(0, len(genome) - 150, 7)]
    bad = [r[:70] + "ACGT"[rng.integers(0, 4)] + r[71:] for r in reads[::3]]
    g0 = construct_graph(reads + bad, 21).graph
    km_a = KmerMapper(22)
    km_b = KmerMapper(22)
    ga, _ = S.simplify(copy.deepcopy(g0), INFO, S.SimplifyConfig(), kmer_mapper=km_a)
    gb, _ = _python_simplify(copy.deepcopy(g0), S.SimplifyConfig())
    # python loop fills its mapper through remove_bulges directly
    from spades_tpu import native

    orig = native.simplify_native
    native.simplify_native = lambda *a, **k: None
    try:
        gb2, _ = S.simplify(copy.deepcopy(g0), INFO, S.SimplifyConfig(), kmer_mapper=km_b)
    finally:
        native.simplify_native = orig
    assert km_a.size == km_b.size
    if km_a.size:
        probe = np.array([[1, 2]], np.uint32)  # just force materialization
        km_a._materialize()
        km_b._materialize()
        assert np.array_equal(km_a._sorted_src, km_b._sorted_src)
        assert np.array_equal(km_a._sorted_dst, km_b._sorted_dst)


def test_native_simplify_empty_graph():
    if not _native_available():
        pytest.skip("native library unavailable")
    from spades_tpu.graph.graph import CondensedGraph

    g = CondensedGraph.from_sequences([], 21)
    g2, stats = S.simplify(g, INFO, S.SimplifyConfig())
    assert g2.num_edges == 0
