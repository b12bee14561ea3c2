"""Advanced simplification: superbubbles, complex tips, max-flow EC removal.

Capability mirror of the reference's subgraph-based simplifiers:
- SuperbubbleFinder (`/root/reference/src/common/modules/simplification/
  superbubble_finder.hpp:22-130`): grow a dominated vertex set from an
  entrance, processing a vertex only when every in-edge starts inside; track
  the heaviest (total-coverage) path; stop at the common exit.
- Complex bulge removal (`complex_bulge_remover.hpp`): collapse everything
  inside a superbubble onto the heaviest entrance->exit path (coverage glue).
- ComplexTipClipper (`complex_tip_clipper.hpp:125-160` + ComplexTipFinder):
  remove dead-end components of short edges whose coverage is low relative
  to the surrounding graph.
- MaxFlowECRemover (`mf_ec_remover.hpp:358-470`): remove a short unreliable
  edge when plausible alternative paths (length >= plausibility bound) still
  carry all flow between the adjacent unique (long) edges.

TPU note: these are control-heavy local subgraph rewrites over the already
tiny simplified graph — host orchestration over the flat arrays, matching
the SURVEY §7.5 plan (masked rewrites + periodic compaction).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .graph import CondensedGraph


@dataclass
class Superbubble:
    start: int
    end: int
    inner_vertices: set[int]
    heaviest_path: list[int]  # edge ids from start to end


def find_superbubble(
    g: CondensedGraph, start: int, max_length: int = 1000, max_count: int = 64
) -> Superbubble | None:
    """SuperbubbleFinder::FindSuperbubble from one entrance vertex.

    Standard dominated-set growth (superbubble_finder.hpp:38-130): a vertex
    is processed only when every in-edge starts at an already-processed
    vertex; the bubble closes when exactly one candidate remains."""
    if len(g.out_edges_of(start)) < 2:
        return None
    lens = g.edge_kmer_lengths()
    cov_sum = g.e_cov
    # vertex -> (best path weight, best path length, backtrace edge)
    info: dict[int, tuple[float, int, int]] = {start: (0.0, 0, -1)}
    seen: set[int] = set()       # discovered, not yet processed
    visited: set[int] = set()
    stack = [start]
    cnt = 0
    while stack:
        v = stack.pop()
        visited.add(v)
        seen.discard(v)
        cnt += 1
        if cnt > max_count:
            return None
        outs = g.out_edges_of(v)
        if len(outs) == 0:
            return None  # dead end (tip) inside the bubble
        w0, l0, _ = info[v]
        for e in outs:
            e = int(e)
            u = int(g.e_end[e])
            if u == start or u == int(g.v_conj[start]) or u == v:
                return None  # cycle back to the entrance / self-loop
            nl = l0 + int(lens[e])
            if nl > max_length:
                return None
            nw = w0 + float(cov_sum[e])
            if u not in info or nw > info[u][0]:
                best_l = nl if u not in info else max(nl, info[u][1])
                info[u] = (nw, best_l, e)
            seen.add(u)
            if u not in visited and all(
                int(g.e_start[x]) in visited for x in g.in_edges_of(u)
            ):
                stack.append(u)
        if len(stack) == 1 and len(seen) == 1 and stack[0] in seen:
            t = stack.pop()
            # exit must not connect straight back to the entrance
            path = []
            vv = t
            while vv != start:
                e = info[vv][2]
                path.append(e)
                vv = int(g.e_start[e])
            path.reverse()
            inner = (visited | {t}) - {start, t}
            return Superbubble(start, t, inner, path)
    return None


def collapse_superbubbles(
    g: CondensedGraph, max_length: int = 1000, max_count: int = 64
) -> int:
    """Complex bulge removal: keep each superbubble's heaviest path, glue the
    rest (complex_bulge_remover.hpp behavior on the flat graph).  Returns the
    number of edges removed."""
    removed = 0
    out_deg = g.out_degrees()
    for start in np.flatnonzero(out_deg >= 2):
        start = int(start)
        sb = find_superbubble(g, start, max_length, max_count)
        if sb is None:
            continue
        keep = set(sb.heaviest_path) | {int(g.e_conj[e]) for e in sb.heaviest_path}
        kill = []
        total_glued = 0.0
        for e in g.alive_edge_ids():
            e = int(e)
            if e in keep:
                continue
            s, t = int(g.e_start[e]), int(g.e_end[e])
            if (s in sb.inner_vertices or s == sb.start) and (
                t in sb.inner_vertices or t == sb.end
            ):
                kill.append(e)
                total_glued += float(g.e_cov[e])
        if not kill:
            continue
        # project removed coverage onto the surviving path
        for e in sb.heaviest_path:
            share = total_glued / (2 * len(sb.heaviest_path))
            g.e_cov[e] += share
            g.e_cov[g.e_conj[e]] += share
        removed += g.kill_edges(np.array(kill))
        out_deg = g.out_degrees()
    return removed


def clip_complex_tips(
    g: CondensedGraph,
    relative_coverage: float = 2.0,
    max_edge_len: int = 100,
    max_path_len: int = 200,
    max_component_edges: int = 16,
) -> int:
    """ComplexTipClipper: remove a dead-end component of short edges when its
    coverage is below relative_coverage x the coverage entering it."""
    lens = g.edge_kmer_lengths()
    cov = g.coverage()
    removed = 0
    out_deg = g.out_degrees()
    in_deg = g.in_degrees()
    for e0 in list(g.alive_edge_ids()):
        e0 = int(e0)
        if not g.alive[e0] or lens[e0] > max_edge_len:
            continue
        v0 = int(g.e_start[e0])
        if in_deg[v0] == 0:
            continue  # plain tip territory, handled by the simple clipper
        # flood forward over short edges; fail if we escape via a long edge
        comp_edges: set[int] = set()
        stack = [e0]
        ok = True
        depth: dict[int, int] = {v0: 0}
        while stack and ok:
            e = stack.pop()
            if e in comp_edges:
                continue
            comp_edges.add(e)
            if len(comp_edges) > max_component_edges:
                ok = False
                break
            if lens[e] > max_edge_len:
                ok = False
                break
            t = int(g.e_end[e])
            d = depth.get(int(g.e_start[e]), 0) + int(lens[e])
            if d > max_path_len:
                ok = False
                break
            depth[t] = max(depth.get(t, 0), d)
            for nxt in g.out_edges_of(t):
                stack.append(int(nxt))
        if not ok or not comp_edges:
            continue
        # component must be a dead end: no edges leave it except via removal
        # and its coverage must be low vs the through coverage at v0
        comp_cov = max(cov[e] for e in comp_edges)
        through = [
            c
            for c in (
                [cov[int(x)] for x in g.in_edges_of(v0)]
                + [cov[int(x)] for x in g.out_edges_of(v0) if int(x) not in comp_edges]
            )
        ]
        if not through or comp_cov * relative_coverage > max(through):
            continue
        removed += g.kill_edges(np.array(sorted(comp_edges)))
        out_deg = g.out_degrees()
        in_deg = g.in_degrees()
        cov = g.coverage()
    return removed


def _plausible_path_exists(
    g: CondensedGraph, v_from: int, v_to: int, avoid: set[int],
    plausibility_length: int, max_hops: int = 8,
) -> bool:
    """Bounded hop search over plausible (long) edges from v_from to v_to,
    via the vectorized Dijkstra framework (unit lengths = hop counting)."""
    if v_from == v_to:
        return True
    from .dijkstra import bounded_dijkstra

    lens = g.edge_kmer_lengths()
    mask = g.alive & (lens >= plausibility_length)
    if avoid:
        mask[list(avoid)] = False
    res = bounded_dijkstra(g, [v_from], max_hops, length="unit", edge_mask=mask)
    return bool(np.isin(v_to, res.vertices))


def max_flow_ec_remover(
    g: CondensedGraph,
    max_length: int = 200,
    uniqueness_length: int = 1500,
    plausibility_length: int = 200,
) -> int:
    """MaxFlowECRemover (mf_ec_remover.hpp:358-470, simplified): remove a
    short implausible edge between unique long edges when plausible
    alternative paths still connect its endpoints."""
    lens = g.edge_kmer_lengths()
    removed = 0
    for e in list(g.alive_edge_ids()):
        e = int(e)
        if not g.alive[e] or lens[e] > max_length or lens[e] >= plausibility_length:
            continue
        s, t = int(g.e_start[e]), int(g.e_end[e])
        in_unique = any(lens[int(x)] >= uniqueness_length for x in g.in_edges_of(s))
        out_unique = any(lens[int(x)] >= uniqueness_length for x in g.out_edges_of(t))
        if not (in_unique and out_unique):
            continue
        avoid = {e, int(g.e_conj[e])}
        if _plausible_path_exists(g, s, t, avoid, plausibility_length):
            removed += g.kill_edges(np.array([e]))
    return removed
