"""Graph condensation: extension index -> condensed de Bruijn graph.

Replaces the reference's sequential `UnbranchingPathExtractor` +
`FastGraphFromSequencesConstructor`
(`/root/reference/src/common/assembly_graph/construction/
debruijn_graph_constructor.hpp:184,412,574`) with a log-depth, fully
vectorized formulation:

1. expand canonical k-mers into 2U oriented nodes; expand mask bits into the
   arc list (one arc per oriented (k+1)-mer);
2. link arc a -> next arc through its destination node when that node is
   unbranching (outdeg == indeg == 1);
3. cut perfect cycles at their minimum arc (pointer-doubling min);
4. Wyllie pointer-doubling list ranking gives every arc its chain head and
   position — maximal chains ARE the condensed edges;
5. materialize edge sequences into a flat base pool by scatter, pair each
   edge with its reverse-complement conjugate, and emit junction vertices.

Everything is O(A log A) vector work over fixed-shape arrays — no sequential
walks, no pointer graph.
"""
from __future__ import annotations

import functools
import logging

import numpy as np

from ..core import kmers as K
from ..graph.graph import CondensedGraph
from .count import KmerCounts, searchsorted_rows
from .extension import ExtensionIndex, POPCOUNT4, canonicalize, mask_tail

# 4-bit mask reversal: bit c -> bit (3-c). MASK_REV4[m] has bit (3-c) set iff m has bit c.
MASK_REV4 = np.zeros(16, np.uint8)
for _m in range(16):
    _r = 0
    for _c in range(4):
        if _m & (1 << _c):
            _r |= 1 << (3 - _c)
    MASK_REV4[_m] = _r


def _shift_in_base(words: np.ndarray, nt: np.ndarray, k: int) -> np.ndarray:
    """node k-mer -> successor k-mer: drop base 0, append base `nt`."""
    W = words.shape[-1]
    out = (words << np.uint32(2)).astype(np.uint32)
    out[..., : W - 1] |= words[..., 1:] >> np.uint32(30)
    # clear tail beyond k-1 bases, then set base k-1 = nt
    out = mask_tail(out, k)
    w, jj = divmod(k - 1, 16)
    out[..., w] |= nt.astype(np.uint32) << np.uint32(30 - 2 * jj)
    return out


def _set_base(words: np.ndarray, j: int, nt: np.ndarray, k: int) -> np.ndarray:
    w, jj = divmod(j, 16)
    out = words.copy()
    out[..., w] |= nt.astype(np.uint32) << np.uint32(30 - 2 * jj)
    return out


def _doubling_rounds(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)


def _device_rank_wanted() -> bool:
    """Device ranking pays off only when host<->device bandwidth is real
    (direct-attached TPU/GPU).  Tunnel backends (axon) and CPU default to
    the numpy path; SPADES_TPU_DEVICE_RANK=always|never overrides."""
    import os

    ov = os.environ.get("SPADES_TPU_DEVICE_RANK", "")
    if ov == "always":
        return True
    if ov == "never":
        return False
    try:
        import jax

        return jax.default_backend() in ("tpu", "gpu", "cuda", "rocm")
    except Exception:  # pragma: no cover
        return False


def _rank_chains_device(nxt: np.ndarray, prv: np.ndarray, rounds: int):
    """The three pointer-doubling phases (cycle detect, cycle cut at min
    arc, Wyllie list ranking) as ONE jitted device program.

    On the weak assembly host these were ~3 x rounds full-array numpy
    gathers (seconds at millions of arcs); on device each round is a fast
    HBM gather and the whole ranking is one dispatch.  Falls back to numpy
    by the caller if no accelerator is usable."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @functools.partial(jax.jit, static_argnames=("rounds",))
    def run(nxt, prv, rounds):
        A = nxt.shape[0]
        idx = jnp.arange(A, dtype=jnp.int32)
        parent = jnp.where(prv >= 0, prv, idx)
        done = prv < 0

        def b1(_, st):
            d, p = st
            return d | d[p], p[p]

        done, _ = lax.fori_loop(0, rounds, b1, (done, parent))
        in_cycle = ~done
        m = idx
        q = jnp.where(nxt >= 0, nxt, idx)

        def b2(_, st):
            m, q = st
            return jnp.minimum(m, m[q]), q[q]

        m, _ = lax.fori_loop(0, rounds, b2, (m, q))
        # cut each cycle before its minimum arc
        head_mask = in_cycle & (m == idx)
        tail = jnp.where(head_mask, prv, A)       # A = dropped scatter slot
        nxt = nxt.at[tail].set(-1, mode="drop")
        prv = jnp.where(head_mask, -1, prv)
        parent = jnp.where(prv >= 0, prv, idx)
        pos = (prv >= 0).astype(jnp.int32)

        def b3(_, st):
            pos, p = st
            return pos + pos[p], p[p]

        pos, parent = lax.fori_loop(0, rounds, b3, (pos, parent))
        return pos, parent

    pos, head = run(
        jnp.asarray(nxt.astype(np.int32)), jnp.asarray(prv.astype(np.int32)), rounds
    )
    return np.asarray(pos).astype(np.int64), np.asarray(head).astype(np.int64)


def condense(index: ExtensionIndex, p1: KmerCounts | None = None) -> CondensedGraph:
    """Build the condensed conjugate graph from an extension index.

    p1: the (k+1)-mer counts used for per-edge coverage sums (optional).

    Native fast path: when the index carries the inverse indices of its build
    sort (stbr_build_ext) and the matching p1 table is given, the whole
    condensation runs in C++ with zero k-mer lookups and O(A) sequential
    chain walks (native/graph.cpp stbr_condense) — the host-side analog of
    the reference's UnbranchingPathExtractor.  The vectorized numpy/device
    path below is the fallback and the multi-chip formulation.
    """
    if (
        p1 is not None
        and index.pref_idx is not None
        and index.pref_idx.shape[0] == p1.num_unique
        and index.num_kmers > 0
    ):
        from ..native import condense_native

        nat = condense_native(
            index.kmers, index.in_mask, index.out_mask, index.k,
            p1.words, p1.counts,
            index.pref_idx, index.pref_rc, index.suf_idx, index.suf_rc,
        )
        if nat is not None:
            e_start, e_end, e_conj, e_off, e_len, e_cov, seq_pool, v_conj = nat
            return CondensedGraph(
                k=index.k,
                e_start=e_start, e_end=e_end, e_conj=e_conj,
                e_off=e_off, e_len=e_len, e_cov=e_cov,
                alive=np.ones(e_start.shape[0], bool),
                seq_pool=seq_pool, v_conj=v_conj,
            )
    k = index.k
    U = index.num_kmers
    Wk = index.kmers.shape[-1]

    # ---- oriented nodes ------------------------------------------------
    # node 2i = stored (canonical) orientation, node 2i+1 = reverse complement
    omask = np.empty(2 * U, np.uint8)
    imask = np.empty(2 * U, np.uint8)
    omask[0::2] = index.out_mask
    omask[1::2] = MASK_REV4[index.in_mask]
    imask[0::2] = index.in_mask
    imask[1::2] = MASK_REV4[index.out_mask]
    node_outdeg = POPCOUNT4[omask]
    node_indeg = POPCOUNT4[imask]

    rc_kmers = K.revcomp_words(index.kmers, k)
    node_words = np.empty((2 * U, Wk), np.uint32)
    node_words[0::2] = index.kmers
    node_words[1::2] = rc_kmers
    # first base of every oriented node (for conjugate arc resolution)
    node_fb = np.empty(2 * U, np.uint8)
    node_fb[0::2] = np.asarray(K.base_at(index.kmers, 0, k)).astype(np.uint8)
    node_fb[1::2] = 3 - np.asarray(K.base_at(index.kmers, k - 1, k)).astype(np.uint8)

    # ---- arcs (one per oriented (k+1)-mer) ----------------------------
    bits = (omask[:, None] >> np.arange(4, dtype=np.uint8)[None, :]) & 1
    arc_src, arc_nt = np.nonzero(bits)  # row-major: sorted by (node, nt)
    arc_src = arc_src.astype(np.int64)
    arc_nt = arc_nt.astype(np.uint8)
    A = arc_src.shape[0]
    node_arc_start = np.concatenate([[0], np.cumsum(node_outdeg)]).astype(np.int64)

    if A == 0:
        return CondensedGraph(
            k=k,
            e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
            e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
            e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
            alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
            v_conj=np.zeros(0, np.int64),
        )

    # destination nodes
    succ_words = _shift_in_base(node_words[arc_src], arc_nt, k)
    succ_canon, succ_rc = canonicalize(succ_words, k)
    succ_idx = searchsorted_rows(index.kmers, succ_canon)
    assert np.all(succ_idx >= 0), "dangling (k+1)-mer suffix — index inconsistent"
    arc_dst = 2 * succ_idx + succ_rc.astype(np.int64)

    # arc coverage = count of the canonical (k+1)-mer  node_seq + nt
    if p1 is not None:
        p1w = _set_base(node_words[arc_src], k, arc_nt, k + 1)
        p1c, _ = canonicalize(p1w, k + 1)
        cidx = searchsorted_rows(p1.words, p1c)
        assert np.all(cidx >= 0), "arc (k+1)-mer missing from counts"
        arc_cov = p1.counts[cidx].astype(np.float64)
    else:
        arc_cov = np.ones(A, np.float64)

    # ---- chain links ---------------------------------------------------
    nxt = np.full(A, -1, np.int64)
    link_ok = (node_outdeg[arc_dst] == 1) & (node_indeg[arc_dst] == 1)
    nxt[link_ok] = node_arc_start[arc_dst[link_ok]]
    prv = np.full(A, -1, np.int64)
    valid_n = nxt >= 0
    prv[nxt[valid_n]] = np.flatnonzero(valid_n)

    rounds = _doubling_rounds(A)

    # ---- cycle cutting + Wyllie list ranking ---------------------------
    # one jitted device program when a DIRECT-ATTACHED accelerator is
    # usable and ids fit int32; numpy fallback otherwise (same math).
    # Through the axon tunnel the 3x A int32 transfers cost far more than
    # the ranking itself (wire runs at MB/s), so tunnel backends stay on
    # the host path; override with SPADES_TPU_DEVICE_RANK=always|never.
    pos = head = None
    if A < (1 << 31) - 2 and _device_rank_wanted():
        try:
            pos, head = _rank_chains_device(nxt, prv, rounds)
        except Exception as ex:  # pragma: no cover - backendless hosts
            logging.getLogger("spades_tpu.condense").debug(
                "device ranking unavailable (%s); numpy fallback", ex)
    if pos is None:
        # cut perfect cycles at their min arc: done[a] <=> walking prv
        # from a terminates (not a cycle)
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
            tails = prv[heads]
            nxt[tails] = -1
            prv[heads] = -1
        parent = np.where(prv >= 0, prv, np.arange(A))
        pos = np.where(prv >= 0, 1, 0).astype(np.int64)
        for _ in range(rounds):
            pos = pos + pos[parent]
            parent = parent[parent]
        head = parent  # converged root (the chain's first arc)

    # ---- edges ---------------------------------------------------------
    uheads, edge_of_arc = np.unique(head, return_inverse=True)
    E = uheads.shape[0]
    n_arcs = np.zeros(E, np.int64)
    np.maximum.at(n_arcs, edge_of_arc, pos + 1)
    e_len = n_arcs + k
    e_off = np.concatenate([[0], np.cumsum(e_len)])[:-1].astype(np.int64)
    e_cov = np.zeros(E, np.float64)
    np.add.at(e_cov, edge_of_arc, arc_cov)

    # sequences: k-prefix from head's source node, then one nt per arc
    seq_pool = np.zeros(int(e_len.sum()), np.uint8)
    head_src = arc_src[uheads]
    prefix_codes = K.unpack(node_words[head_src], k)  # (E, k)
    pre_pos = (e_off[:, None] + np.arange(k)[None, :]).ravel()
    seq_pool[pre_pos] = prefix_codes.ravel()
    seq_pool[e_off[edge_of_arc] + k + pos] = arc_nt

    # endpoints
    tail_arc = np.zeros(E, np.int64)
    is_tail = pos == (n_arcs[edge_of_arc] - 1)
    tail_arc[edge_of_arc[is_tail]] = np.flatnonzero(is_tail)
    start_node = head_src
    end_node = arc_dst[tail_arc]

    # ---- conjugate pairing --------------------------------------------
    # rc of arc (n -c-> m) is the arc (m^1 -comp(fb(n))-> n^1)
    rc_src = arc_dst ^ 1
    rc_nt = (3 - node_fb[arc_src]).astype(np.uint8)
    below = omask[rc_src] & ((np.uint8(1) << rc_nt) - 1)
    rc_arc = node_arc_start[rc_src] + POPCOUNT4[below]
    assert np.all((omask[rc_src] >> rc_nt) & 1 == 1), "conjugate arc missing"
    e_conj = edge_of_arc[rc_arc[tail_arc]]
    assert np.array_equal(e_conj[e_conj], np.arange(E)), "edge conj not involution"

    # ---- vertices ------------------------------------------------------
    end_nodes = np.concatenate([start_node, end_node])
    vnodes = np.unique(np.concatenate([end_nodes, end_nodes ^ 1]))
    node2v = -np.ones(2 * U, np.int64)
    node2v[vnodes] = np.arange(vnodes.shape[0])
    v_conj = node2v[vnodes ^ 1]
    e_start = node2v[start_node]
    e_end = node2v[end_node]

    g = CondensedGraph(
        k=k,
        e_start=e_start, e_end=e_end, e_conj=e_conj,
        e_off=e_off, e_len=e_len, e_cov=e_cov,
        alive=np.ones(E, bool), seq_pool=seq_pool,
        v_conj=v_conj,
    )
    return g
