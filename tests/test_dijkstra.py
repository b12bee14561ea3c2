"""Bounded-Dijkstra framework tests (dijkstra_algorithm.hpp analog)."""
import heapq

import numpy as np

from spades_tpu.graph.dijkstra import (
    bounded_dijkstra,
    reached_vertices,
    shortest_path,
)
from spades_tpu.graph.synthetic import synthetic_tangled_graph


def _ref_dijkstra(g, v0, max_d, direction="fwd", edge_mask=None, length="kmer"):
    w = (
        g.edge_kmer_lengths()
        if length == "kmer"
        else np.ones(len(g.alive), np.int64)
    )
    ids = g.alive_edge_ids()
    if edge_mask is not None:
        ids = ids[edge_mask[ids]]
    adj: dict[int, list[int]] = {}
    tail, head = (
        (g.e_start, g.e_end) if direction == "fwd" else (g.e_end, g.e_start)
    )
    for e in ids:
        adj.setdefault(int(tail[e]), []).append(int(e))
    dist = {v0: 0}
    h = [(0, v0)]
    while h:
        d, v = heapq.heappop(h)
        if d > dist.get(v, 1 << 60):
            continue
        for e in adj.get(v, []):
            u = int(head[e])
            nd = d + int(w[e])
            if nd <= max_d and nd < dist.get(u, 1 << 60):
                dist[u] = nd
                heapq.heappush(h, (nd, u))
    return dist


class TestBatchedBounded:
    def test_matches_reference_many_sources(self):
        g = synthetic_tangled_graph(3000, k=21, seed=4, fill_sequences=False)
        rng = np.random.default_rng(0)
        srcs = rng.integers(0, g.num_vertices, 16)
        res = bounded_dijkstra(g, srcs, 150)
        for r, v0 in enumerate(srcs):
            assert res.distances_dict(r) == _ref_dijkstra(g, int(v0), 150)

    def test_backward(self):
        g = synthetic_tangled_graph(2000, k=21, seed=5, fill_sequences=False)
        v0 = int(g.e_end[g.alive_edge_ids()[0]])
        res = bounded_dijkstra(g, [v0], 120, direction="bwd")
        assert res.distances_dict(0) == _ref_dijkstra(g, v0, 120, "bwd")

    def test_edge_mask_and_unit_length(self):
        g = synthetic_tangled_graph(2000, k=21, seed=6, fill_sequences=False)
        mask = g.alive & (g.edge_kmer_lengths() >= 10)
        v0 = int(g.e_start[np.flatnonzero(mask)[0]])
        res = bounded_dijkstra(g, [v0], 4, length="unit", edge_mask=mask)
        assert res.distances_dict(0) == _ref_dijkstra(
            g, v0, 4, edge_mask=mask, length="unit"
        )

    def test_max_vertices_truncates(self):
        g = synthetic_tangled_graph(2000, k=21, seed=7, fill_sequences=False)
        v0 = int(g.e_start[g.alive_edge_ids()[0]])
        full = bounded_dijkstra(g, [v0], 1 << 30)
        lim = bounded_dijkstra(g, [v0], 1 << 30, max_vertices=5)
        if (full.rows == 0).sum() > 8:
            assert lim.truncated[0]
            assert (lim.rows == 0).sum() < (full.rows == 0).sum()


class TestShortestPath:
    def test_path_is_optimal_and_connected(self):
        g = synthetic_tangled_graph(2000, k=21, seed=8, fill_sequences=False)
        w = g.edge_kmer_lengths()
        v0 = int(g.e_start[g.alive_edge_ids()[0]])
        dist = _ref_dijkstra(g, v0, 200)
        far = [v for v, d in dist.items() if d > 60]
        assert far
        vt = far[0]
        p = shortest_path(g, v0, vt, 200)
        assert p is not None
        assert sum(int(w[e]) for e in p) == dist[vt]
        cur = v0
        for e in p:
            assert int(g.e_start[e]) == cur
            cur = int(g.e_end[e])
        assert cur == vt

    def test_unreachable_is_none(self):
        g = synthetic_tangled_graph(200, k=21, seed=9, fill_sequences=False)
        v0 = int(g.e_start[g.alive_edge_ids()[0]])
        assert shortest_path(g, v0, v0 + 1 if v0 + 1 < g.num_vertices else 0, 1) in (None, [])

    def test_reached_vertices(self):
        g = synthetic_tangled_graph(500, k=21, seed=10, fill_sequences=False)
        v0 = int(g.e_start[g.alive_edge_ids()[0]])
        assert reached_vertices(g, v0, 80) == _ref_dijkstra(g, v0, 80)
