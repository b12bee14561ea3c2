"""Graph compression: re-condense after edge deletions.

The reference mutates its pointer graph through `Compressor`
(`/root/reference/src/common/modules/simplification/compressor.hpp`) by
walking unbranching vertex chains sequentially.  Here compression is the same
log-depth pointer-doubling chain reduction used at construction time
(spades_tpu.ops.condense), applied at the edge level: alive edges are the
arcs, vertices with indeg == outdeg == 1 link consecutive edges, maximal
chains become merged edges whose sequences are concatenated with k-overlap
trimming.
"""
from __future__ import annotations

import numpy as np

from .graph import CondensedGraph


def _ragged_copy(dst, dst_starts, src, src_starts, lens):
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if total == 0:
        return
    ends = np.cumsum(lens)
    starts = ends - lens
    r = np.arange(total)
    seg = np.searchsorted(ends, r, side="right")
    within = r - starts[seg]
    dst[np.asarray(dst_starts)[seg] + within] = src[np.asarray(src_starts)[seg] + within]


def compress(g: CondensedGraph) -> CondensedGraph:
    """Merge edge chains through unbranching vertices; drops dead edges."""
    k = g.k
    ids = g.alive_edge_ids()
    A = ids.shape[0]
    if A == 0:
        return CondensedGraph(
            k=k,
            e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
            e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
            e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
            alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
            v_conj=g.v_conj.copy(),
        )
    # dense arc ids for alive edges
    old2arc = -np.ones(g.alive.shape[0], np.int64)
    old2arc[ids] = np.arange(A)
    src = g.e_start[ids]
    dst = g.e_end[ids]
    w = (g.e_len[ids] - k).astype(np.int64)  # arc weight = length in kmers
    rc_arc = old2arc[g.e_conj[ids]]

    outdeg = np.zeros(g.num_vertices, np.int64)
    indeg = np.zeros(g.num_vertices, np.int64)
    np.add.at(outdeg, src, 1)
    np.add.at(indeg, dst, 1)
    # unique out-edge per vertex (valid only where outdeg == 1)
    vout = np.full(g.num_vertices, -1, np.int64)
    vout[src] = np.arange(A)

    link_ok = (outdeg[dst] == 1) & (indeg[dst] == 1)
    nxt = np.where(link_ok, vout[dst], -1)
    prv = np.full(A, -1, np.int64)
    vn = nxt >= 0
    prv[nxt[vn]] = np.flatnonzero(vn)

    rounds = max(1, int(np.ceil(np.log2(max(A, 2)))) + 1)

    # cut perfect cycles at min arc
    parent = np.where(prv >= 0, prv, np.arange(A))
    done = prv < 0
    for _ in range(rounds):
        done = done | done[parent]
        parent = parent[parent]
    in_cycle = ~done
    if in_cycle.any():
        m = np.arange(A)
        q = np.where(nxt >= 0, nxt, np.arange(A))
        for _ in range(rounds):
            m = np.minimum(m, m[q])
            q = q[q]
        heads = np.unique(m[in_cycle])
        nxt[prv[heads]] = -1
        prv[heads] = -1

    # weighted Wyllie ranking: off = sum of w over proper predecessors
    parent = np.where(prv >= 0, prv, np.arange(A))
    off = np.where(prv >= 0, w[parent], 0).astype(np.int64)
    pos = np.where(prv >= 0, 1, 0).astype(np.int64)
    for _ in range(rounds):
        off = off + off[parent]
        pos = pos + pos[parent]
        parent = parent[parent]
    head = parent

    uheads, edge_of_arc = np.unique(head, return_inverse=True)
    E = uheads.shape[0]
    n_arcs = np.zeros(E, np.int64)
    np.maximum.at(n_arcs, edge_of_arc, pos + 1)
    kmer_len = np.zeros(E, np.int64)
    np.add.at(kmer_len, edge_of_arc, w)
    e_len = kmer_len + k
    e_off = np.concatenate([[0], np.cumsum(e_len)])[:-1].astype(np.int64)
    e_cov = np.zeros(E, np.float64)
    np.add.at(e_cov, edge_of_arc, g.e_cov[ids])

    seq_pool = np.zeros(int(e_len.sum()), np.uint8)
    # every member writes its seq[k:] at new_off + k + off
    _ragged_copy(
        seq_pool,
        e_off[edge_of_arc] + k + off,
        g.seq_pool,
        g.e_off[ids] + k,
        w,
    )
    # heads write their first k bases
    _ragged_copy(
        seq_pool,
        e_off,
        g.seq_pool,
        g.e_off[ids[uheads]],
        np.full(E, k, np.int64),
    )

    tail_arc = np.zeros(E, np.int64)
    is_tail = pos == (n_arcs[edge_of_arc] - 1)
    tail_arc[edge_of_arc[is_tail]] = np.flatnonzero(is_tail)
    e_conj = edge_of_arc[rc_arc[tail_arc]]
    assert np.array_equal(e_conj[e_conj], np.arange(E)), "compress: conj broken"

    return CondensedGraph(
        k=k,
        e_start=src[uheads], e_end=dst[tail_arc], e_conj=e_conj,
        e_off=e_off, e_len=e_len, e_cov=e_cov,
        alive=np.ones(E, bool), seq_pool=seq_pool,
        v_conj=g.v_conj.copy(),
    )
