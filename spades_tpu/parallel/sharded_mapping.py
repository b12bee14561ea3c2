"""Multi-chip sharded read-to-graph mapping and paired-info filling.

TPU-native replacement for the reference's distributed mapping stages
(`/root/reference/src/projects/hpcspades/mpi/stages/pair_info_count_mpi.hpp`
+ `mpi/alignment/sequence_mapper_notifier_mpi.*`): hpcSPAdes splits read
streams across MPI ranks, each rank maps its chunk against the replicated
GraphPack, and per-rank paired-info buffers are merged on the master.

Mesh design: the edge k-mer index (sorted canonical k-mer rows + parallel
(edge, offset, strand) columns — `alignment/mapper.py` EdgeIndex) is
REPLICATED across chips (it is the GraphPack analog); the read batch is
sharded along the mesh's data axis.  Each chip:

* extracts canonical windows of its read shard,
* binary-searches them in the replicated index (vectorized log2(U) gather
  loop — the on-device `searchsorted_rows`),
* picks the dominant (edge, read-start) vote per read with a row-wise sort +
  run-length argmax (no host loop),

and per-read mappings come back sharded; paired-info tuples are then a
vectorized zip of the two mates' mappings (`is_counter.hpp` semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import kmers as K
from .sharded_count import make_mesh


def _rows_less(a, b_words):
    """Lexicographic a < b for stacked word columns; a: tuple of (N,) arrays,
    b_words: (N, W)."""
    W = b_words.shape[-1]
    lt = jnp.zeros(b_words.shape[:-1], bool)
    eq = jnp.ones(b_words.shape[:-1], bool)
    for w in range(W):
        aw = a[..., w]
        bw = b_words[..., w]
        lt = lt | (eq & (aw < bw))
        eq = eq & (aw == bw)
    return lt, eq


def device_searchsorted_rows(haystack: jnp.ndarray, needles: jnp.ndarray) -> jnp.ndarray:
    """(U, W) sorted unique rows, (N, W) queries -> (N,) index or -1.

    log2(U) rounds of gather + lexicographic compare — the device analog of
    `ops.count.searchsorted_rows` (the MPHF-lookup role)."""
    U = haystack.shape[0]
    # derive the carry from `needles` so its varying-axes type matches inside
    # shard_map (a plain zeros carry is unvarying and trips the vma check)
    zero = (needles[:, 0] & 0).astype(jnp.int32)
    lo = zero
    hi = zero + jnp.int32(U)
    steps = max(1, int(np.ceil(np.log2(max(U, 2)))) + 1)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        row = haystack[jnp.clip(mid, 0, U - 1)]
        lt, _ = _rows_less(row, needles)  # haystack[mid] < needle
        lo = jnp.where(lt, mid + 1, lo)
        hi = jnp.where(lt, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = jnp.clip(lo, 0, U - 1)
    hit = jnp.all(haystack[idx] == needles, axis=-1) & (U > 0)
    return jnp.where(hit, idx, -1)


def _map_shard_body(packed_codes, packed_nmask, lengths, index_words, index_edge,
                    index_off, index_strand, conj, e_len,
                    k: int, L: int, axis: str):
    """Per-device body: map my read shard against the replicated index.

    Reads arrive in the 2-bit packed wire format (~7x less host->device
    traffic than raw codes+mask — the counting path's discipline) and are
    unpacked on device.  Returns per-read (edge, start, votes); edge = -1
    for unmapped."""
    from ..ops.count import unpack_batch_device

    codes, n_mask = unpack_batch_device(packed_codes, packed_nmask, L)
    return _map_shard_core(codes, lengths, n_mask, index_words, index_edge,
                           index_off, index_strand, conj, e_len, k=k, axis=axis)


def _map_shard_core(codes, lengths, n_mask, index_words, index_edge,
                    index_off, index_strand, conj, e_len,
                    k: int, axis: str):
    R, L = codes.shape
    Pn = L - k + 1
    canon, valid, read_rc = K.canonical_windows_strand(codes, lengths, n_mask, k)
    W = canon.shape[-1]

    flat = canon.reshape(-1, W)
    idx = device_searchsorted_rows(index_words, flat)
    idx = jnp.where(valid.reshape(-1), idx, -1)
    safe = jnp.clip(idx, 0, max(index_edge.shape[0] - 1, 0))
    e = index_edge[safe]
    off = index_off[safe]
    istrand = index_strand[safe]
    rrc = read_rc.reshape(-1)
    same = rrc == istrand
    oc = e_len[e] - k - off
    voted_edge = jnp.where(same, e, conj[e])
    jj = jnp.tile(jnp.arange(Pn, dtype=jnp.int32), (R,))
    voted_start = jnp.where(same, off, oc) - jj
    hit = idx >= 0
    voted_edge = jnp.where(hit, voted_edge, jnp.int32(2**30))
    voted_start = jnp.where(hit, voted_start, jnp.int32(2**30))

    # dominant (edge, start) per read: row-wise sort then longest run
    ve = voted_edge.reshape(R, Pn)
    vs = voted_start.reshape(R, Pn)
    se, ss = jax.lax.sort((ve, vs), num_keys=2, dimension=1)
    newrun = jnp.concatenate(
        [jnp.ones((R, 1), bool),
         (se[:, 1:] != se[:, :-1]) | (ss[:, 1:] != ss[:, :-1])], axis=1)
    pos = jnp.arange(Pn, dtype=jnp.int32)[None, :]
    bpos = jnp.where(newrun, pos, Pn)
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(bpos, axis=1), axis=1), axis=1)
    nxt = jnp.concatenate([suffix_min[:, 1:], jnp.full((R, 1), Pn, jnp.int32)], axis=1)
    run_len = jnp.where(newrun & (se < 2**30), nxt - pos, 0)
    best = jnp.argmax(run_len, axis=1)
    rows = jnp.arange(R)
    votes = run_len[rows, best]
    edge_out = jnp.where(votes > 0, se[rows, best], -1)
    start_out = jnp.where(votes > 0, ss[rows, best], 0)
    return edge_out.astype(jnp.int32), start_out.astype(jnp.int32), votes.astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def make_sharded_mapper(mesh: Mesh, k: int, L: int, axis: str = "d"):
    """Jitted multi-chip mapping step: read shards x replicated edge index."""
    body = functools.partial(_map_shard_body, k=k, L=L, axis=axis)
    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis),
                  P(None, None), P(None), P(None), P(None), P(None), P(None)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return jax.jit(shard_fn)


def _pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p <<= 1
    return p


def prepare_index_device(index, g):
    """Pad the edge index + graph columns to pow2 rows and upload ONCE.

    Returns the device-resident tuple consumed by the sharded mapper.  The
    pow2 padding keeps the jitted program shape stable across graph states
    (a fresh XLA compile costs minutes through the remote compile service);
    caching the upload matters just as much: the padded index is hundreds of
    MB on real graphs and used to cross the host->device tunnel on EVERY
    map_reads_sharded call (twice per gap-closer pass).  Index padding rows
    are all-ones k-mers, lexicographically greatest and never equal to a
    real canonical k-mer (odd k leaves zero low bits in the last packed
    word)."""
    U = index.kmers.shape[0]
    U2 = _pow2(max(U, 1))
    kmers = np.full((U2, index.kmers.shape[1]), 0xFFFFFFFF, np.uint32)
    kmers[:U] = index.kmers
    iedge = np.zeros(U2, np.int32)
    iedge[:U] = index.edge
    ioff = np.zeros(U2, np.int32)
    ioff[:U] = index.offset
    istr = np.zeros(U2, np.int32)
    istr[:U] = index.strand
    E = len(g.e_conj)
    E2 = _pow2(max(E, 1))
    conj = np.zeros(E2, np.int32)
    conj[:E] = g.e_conj
    e_len = np.zeros(E2, np.int32)
    e_len[:E] = g.e_len
    return tuple(
        jnp.asarray(a) for a in (kmers, iedge, ioff, istr, conj, e_len)
    )


def map_packed_sharded(prep, k: int, pc, pn, lengths, L: int, R: int,
                       mesh: Mesh):
    """Map one packed wire chunk (host or device arrays) against a prepared
    device index.  Returns (edge, start, votes) numpy arrays of length R."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    rows = int(np.asarray(pc).shape[0] if not hasattr(pc, "shape") else pc.shape[0])
    if rows % n_dev:
        pad = (-rows) % n_dev
        pc = np.pad(np.asarray(pc), ((0, pad), (0, 0)))
        pn = np.pad(np.asarray(pn), ((0, pad), (0, 0)))
        lengths = np.pad(np.asarray(lengths), (0, pad))
    fn = make_sharded_mapper(mesh, k, L, axis)
    edge, start, votes = fn(
        jnp.asarray(pc), jnp.asarray(pn), jnp.asarray(lengths), *prep
    )
    return (np.asarray(edge)[:R], np.asarray(start)[:R], np.asarray(votes)[:R])


def map_reads_sharded(index, g, batch, mesh: Mesh | None = None, prep=None):
    """Host wrapper: map a ReadBatch across the mesh against an EdgeIndex.

    Returns (edge (R,), start (R,), votes (R,)) numpy arrays; edge == -1
    means unmapped.  Matches `alignment.mapper.map_read_batch` decisions up
    to vote ties.  Pass `prep` (from `prepare_index_device`) to reuse a
    device-resident index across calls."""
    mesh = mesh or make_mesh()
    R = batch.codes.shape[0]
    pc, pn, lengths_w, L = batch.packed()
    if prep is None:
        prep = prepare_index_device(index, g)
    return map_packed_sharded(prep, index.k, pc, pn, np.asarray(lengths_w),
                              L, R, mesh)


def pair_info_sharded(g, edge1, start1, edge2, start2, insert_size: float):
    """Vectorized paired-info tuples from two mates' sharded mappings.

    Same geometry as `paired.paired_info.build_paired_index` (FR pairs,
    `paired_info/is_counter.hpp` semantics): read2's edge is conjugated onto
    read1's strand and d estimates start(e2) - start(e1).
    Returns (e1, e2, dist) int64 arrays for pairs where both mates mapped."""
    ok = (edge1 >= 0) & (edge2 >= 0)
    e1 = edge1[ok].astype(np.int64)
    o1 = start1[ok].astype(np.int64)
    e2 = np.asarray(g.e_conj)[edge2[ok]].astype(np.int64)
    o2_end = np.asarray(g.e_len)[e2] - start2[ok]
    d = np.round(o1 + insert_size - o2_end).astype(np.int64)
    return e1, e2, d


def _votes_shard_body(packed_codes, packed_nmask, lengths, index_words,
                      index_edge, index_off, index_strand, conj, e_len, e_off,
                      k: int, L: int, axis: str, pool_pad: int):
    """Map my read shard, scatter per-position base votes, psum across the
    mesh — the MPI_SUM vote merge of MismatchCorrectionMPI
    (`hpcspades/mpi/stages/mismatch_correction_mpi.hpp`)."""
    from ..ops.count import unpack_batch_device

    codes, n_mask = unpack_batch_device(packed_codes, packed_nmask, L)
    edge, start, votes_n = _map_shard_core(
        codes, lengths, n_mask, index_words, index_edge, index_off,
        index_strand, conj, e_len, k=k, axis=axis,
    )
    R = codes.shape[0]
    pos = start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    mapped = (edge >= 0)[:, None]
    safe_e = jnp.clip(edge, 0, e_len.shape[0] - 1)
    inside = (pos >= 0) & (pos < e_len[safe_e][:, None]) & mapped
    valid_base = (codes < 4) & ~n_mask & (jnp.arange(L)[None, :] < lengths[:, None])
    ok = inside & valid_base
    flat = jnp.where(ok, e_off[safe_e][:, None] + pos, pool_pad)
    base = jnp.where(ok, codes, 0).astype(jnp.int32)
    votes = jnp.zeros((pool_pad + 1, 4), jnp.int32)
    votes = votes.at[flat.reshape(-1), base.reshape(-1)].add(
        ok.reshape(-1).astype(jnp.int32), mode="drop"
    )
    return jax.lax.psum(votes[:pool_pad], axis)


@functools.lru_cache(maxsize=16)
def make_sharded_voter(mesh: Mesh, k: int, L: int, pool_pad: int,
                       axis: str = "d"):
    """Jitted multi-chip vote step (cached: a per-call jit wrapper would
    recompile on every invocation)."""
    body = functools.partial(
        _votes_shard_body, k=k, L=L, axis=axis, pool_pad=pool_pad
    )
    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis),
                  P(None, None), P(None), P(None), P(None), P(None),
                  P(None), P(None)),
        out_specs=P(None, None),
    )
    return jax.jit(shard_fn)


def position_votes_sharded(index, g, batch=None, mesh: Mesh | None = None,
                           store=None, prep=None) -> np.ndarray:
    """Multi-chip per-position base votes: (len(seq_pool), 4) int32.

    Same contract as `alignment.mismatch.position_votes`, computed with read
    shards across the mesh and one psum per chunk (the distributed vote
    merge of MismatchCorrectionMPI).  Accepts a single ReadBatch (`batch`)
    or a run-wide packed ReadStore (`store`); `prep` reuses a
    `prepare_index_device` upload.  The pool axis pads to pow2 so the
    program shape survives graph-state changes."""
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    pool_len = int(len(g.seq_pool))
    pool_pad = _pow2(max(pool_len, 1))
    if prep is None:
        prep = prepare_index_device(index, g)
    kmers_d, iedge_d, ioff_d, istr_d, conj_d, elen_d = prep
    eoff = np.zeros(elen_d.shape[0], np.int32)
    eoff[: len(g.e_off)] = g.e_off
    eoff_d = jnp.asarray(eoff)

    if store is not None:
        chunks = [(ch.device(), ch.L, ch.n) for ch in store.chunks]
    else:
        pc, pn, lengths_w, L = batch.packed()
        chunks = [((jnp.asarray(pc), jnp.asarray(pn),
                    jnp.asarray(np.asarray(lengths_w))), L,
                   batch.codes.shape[0])]

    votes_dev = None
    sub = 65536  # bounded sub-slices: full-chunk window tensors OOM v5e
    for (pc, pn, lengths), L, n in chunks:
        rows = pc.shape[0]
        for a in range(0, rows, sub):
            b = min(a + sub, rows)
            pcs, pns, ls = pc[a:b], pn[a:b], lengths[a:b]
            if (b - a) % n_dev:
                pad = (-(b - a)) % n_dev
                pcs = np.pad(np.asarray(pcs), ((0, pad), (0, 0)))
                pns = np.pad(np.asarray(pns), ((0, pad), (0, 0)))
                ls = np.pad(np.asarray(ls), (0, pad))
            fn = make_sharded_voter(mesh, index.k, L, pool_pad, axis)
            v = fn(jnp.asarray(pcs), jnp.asarray(pns), jnp.asarray(ls),
                   kmers_d, iedge_d, ioff_d, istr_d, conj_d, elen_d, eoff_d)
            # accumulate ON DEVICE: pulling the (pool_pad, 4) tally per
            # sub-chunk would move GBs through the tunnel
            votes_dev = v if votes_dev is None else votes_dev + v
    if votes_dev is None:
        return np.zeros((pool_len, 4), np.int32)
    return np.asarray(votes_dev)[:pool_len].astype(np.int32)


# ---------------------------------------------------------------------------
# Device-side edge index construction: the host build (pack + canonicalize +
# 26M-row lexsort) and its ~500 MB padded upload were the dominant costs of
# every mapping pass on big graphs; here the host pushes only the 2-bit
# packed pool (~N/4 bytes) + per-row metadata and the index is extracted,
# canonicalized and sorted IN HBM (the index role of the reference's
# edge_position_index.hpp, built the TPU way).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "L"))
def _extract_index_tier(pool_packed, row_starts, row_lens, row_edge,
                        row_off0, row_ord0, k: int, L: int):
    """One row tier: pool 2-bit packed + row plan -> FLAT window columns
    (word planes, edge, offset, strand, host-order ordinal).

    Rows are <=L-long slices of canonical-edge regions overlapping by k-1
    and never cross an edge boundary (the host row plan guarantees it).
    Invalid (padding) windows become all-ones sentinel words with max
    ordinal so the final sort pushes them to the tail."""
    from ..core import kmers as KK

    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    pool = ((pool_packed[:, None] >> shifts[None, :]) & 3).reshape(-1)
    R = row_starts.shape[0]
    P = L - k + 1
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    gidx = jnp.clip(row_starts[:, None] + j, 0, pool.shape[0] - 1)
    codes = pool[gidx]
    nmask = jnp.zeros((R, L), bool)
    canon, valid, rc = KK.canonical_windows_strand(codes, row_lens, nmask, k)
    W = canon.shape[-1]
    flat_valid = valid.reshape(-1)
    planes = [canon[..., w].reshape(-1) for w in range(W)]
    edge = jnp.broadcast_to(row_edge[:, None], (R, P)).reshape(-1)
    off = (row_off0[:, None] + j[:, :P]).reshape(-1)
    ordn = (row_ord0[:, None] + j[:, :P]).reshape(-1)
    strand = rc.reshape(-1).astype(jnp.int32)
    edge = jnp.where(flat_valid, edge, 0)
    off = jnp.where(flat_valid, off, 0)
    strand = jnp.where(flat_valid, strand, 0)
    ordn = jnp.where(flat_valid, ordn, jnp.int32(2**31 - 1))
    return tuple(planes) + (edge, off, strand, ordn)


@functools.partial(jax.jit, static_argnames=("W",))
def _sort_index_jit(cols, W: int):
    """Flat window columns -> sorted index arrays.  The host-order ordinal is
    the (W+1)-th sort key, so duplicate k-mers order exactly like the host
    build's stable lexsort over its edge-major concatenation — the binary
    search's leftmost-equal hit picks the same occurrence."""
    planes = cols[:W]
    edge, off, strand, ordn = cols[W], cols[W + 1], cols[W + 2], cols[W + 3]
    out = jax.lax.sort(planes + (ordn, edge, off, strand), num_keys=W + 1)
    words = jnp.stack(out[:W], axis=-1)
    return words, out[W + 1], out[W + 2], out[W + 3]


INDEX_ROW_TIERS = (256, 2048, 8192)


def build_index_device(g, k: int | None = None):
    """Build the mapping index prep tuple ON DEVICE from the graph pool.

    Returns the same (kmers, edge, off, strand, conj, e_len) device tuple as
    `prepare_index_device(build_edge_index(g), g)` — same k-mer set, same
    leftmost-equal lookup semantics — without the host lexsort or the padded
    index upload.  Host -> device traffic is pool/4 + O(rows) bytes.

    Edges are binned into row-length TIERS (256/2048/8192): one fixed row
    length would pad every short edge to it, and a post-simplification graph
    with ~50k short edges exploded 11M real windows into 540M padded ones
    (a genuine HBM OOM).  Each tier extracts flat window columns; one global
    sort (host-order ordinal as tiebreak) produces the index."""
    k = k or g.k
    ids = g.canonical_edge_ids()
    pool = np.asarray(g.seq_pool, np.uint8)
    N = len(pool)
    N4 = _pow2((N + 3) // 4, lo=64)
    pp = np.zeros(N4 * 4, np.uint8)
    pp[:N] = pool & 3
    packed = jnp.asarray(
        pp[0::4] | (pp[1::4] << 2) | (pp[2::4] << 4) | (pp[3::4] << 6)
    )

    E = len(g.e_conj)
    E2 = _pow2(max(E, 1))
    conj = np.zeros(E2, np.int32)
    conj[:E] = g.e_conj
    e_len = np.zeros(E2, np.int32)
    e_len[:E] = g.e_len
    conj_d, elen_d = jnp.asarray(conj), jnp.asarray(e_len)

    W = K.kmer_words(k)
    if ids.size == 0:
        sent = jnp.full((8, W), 0xFFFFFFFF, jnp.uint32)
        z = jnp.zeros(8, jnp.int32)
        return (sent, z, z, z, conj_d, elen_d)

    lens = g.e_len[ids].astype(np.int64)
    offs = g.e_off[ids].astype(np.int64)
    keep = lens >= k
    ids_k, offs_k, lens_k = ids[keep], offs[keep], lens[keep]
    # host-order ordinal base per edge: the host index concatenates windows
    # edge-major in canonical-id order
    nwin = np.maximum(lens_k - k + 1, 0)
    ord_base = np.cumsum(nwin) - nwin

    cols = None
    tiers = list(INDEX_ROW_TIERS)
    for ti, L in enumerate(tiers):
        step = L - (k - 1)
        if ti + 1 < len(tiers):
            sel = (lens_k <= L) if ti == 0 else \
                  (lens_k > tiers[ti - 1]) & (lens_k <= L)
        else:
            sel = lens_k > tiers[ti - 1]
        if not sel.any():
            continue
        s_ids, s_offs, s_lens = ids_k[sel], offs_k[sel], lens_k[sel]
        s_ord = ord_base[sel]
        nrows = np.maximum((s_lens - k) // step + 1, 1)
        total = int(nrows.sum())
        e_col = np.repeat(s_ids.astype(np.int32), nrows)
        base = np.repeat(np.cumsum(nrows) - nrows, nrows)
        r_in_e = np.arange(total, dtype=np.int64) - base
        off0 = r_in_e * step
        p0 = np.repeat(s_offs, nrows) + off0
        rl = np.minimum(L, np.repeat(s_offs + s_lens, nrows) - p0)
        ord0 = np.repeat(s_ord, nrows) + off0
        Rp = _pow2(total, lo=8)
        pad = Rp - total

        def _p(a, fill=0):
            return jnp.asarray(np.pad(a.astype(np.int32), (0, pad),
                                      constant_values=fill))

        tier_cols = _extract_index_tier(
            packed, _p(p0), _p(rl), _p(e_col), _p(off0), _p(ord0), k=k, L=L,
        )
        cols = tier_cols if cols is None else tuple(
            jnp.concatenate([a, b]) for a, b in zip(cols, tier_cols)
        )
    if cols is None:
        sent = jnp.full((8, W), 0xFFFFFFFF, jnp.uint32)
        z = jnp.zeros(8, jnp.int32)
        return (sent, z, z, z, conj_d, elen_d)
    # pad the flat columns to pow2 so the sort program shape is stable
    n = cols[0].shape[0]
    n_pad = _pow2(n, lo=8)
    if n_pad != n:
        pad = n_pad - n
        padded = []
        for i, a in enumerate(cols):
            if i < W:
                padded.append(jnp.pad(a, (0, pad), constant_values=np.uint32(0xFFFFFFFF)))
            elif i == W + 3:
                padded.append(jnp.pad(a, (0, pad), constant_values=2**31 - 1))
            else:
                padded.append(jnp.pad(a, (0, pad)))
        cols = tuple(padded)
    words, edge, off, strand = _sort_index_jit(cols, W=W)
    return (words, edge, off, strand, conj_d, elen_d)


def _hit_shard_body(packed_codes, packed_nmask, lengths, tip_words,
                    k: int, L: int, axis: str):
    """Per-device body: does each read have >=1 canonical window in the
    (small, replicated) tip-region k-mer table?"""
    from ..ops.count import unpack_batch_device

    codes, n_mask = unpack_batch_device(packed_codes, packed_nmask, L)
    R = codes.shape[0]
    Pn = L - k + 1
    canon, valid = K.canonical_windows(codes, lengths, n_mask, k)
    W = canon.shape[-1]
    flat = canon.reshape(-1, W)
    idx = device_searchsorted_rows(tip_words, flat)
    hit = (idx >= 0) & valid.reshape(-1)
    return jnp.any(hit.reshape(R, Pn), axis=1)


@functools.lru_cache(maxsize=16)
def make_sharded_hitter(mesh: Mesh, k: int, L: int, axis: str = "d"):
    body = functools.partial(_hit_shard_body, k=k, L=L, axis=axis)
    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(None, None)),
        out_specs=P(axis),
    )
    return jax.jit(shard_fn)


def hit_filter_store(store, tip_words: np.ndarray, k: int,
                     mesh: Mesh | None = None, sub: int = 65536) -> np.ndarray:
    """(store.n,) bool: read has >=1 canonical window among tip_words.

    The gap closer's device prefilter (VERDICT r4 item 2): the tip-region
    table is tiny (fits cache), so the expensive full-index binary search
    runs only for candidate reads afterwards."""
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    U = tip_words.shape[0]
    U2 = _pow2(max(U, 1), lo=8)
    tw = np.full((U2, tip_words.shape[1]), 0xFFFFFFFF, np.uint32)
    tw[:U] = tip_words
    tw_d = jnp.asarray(tw)
    out = np.zeros(store.n, bool)
    # dispatch every sub-slice of every chunk first, pull afterwards: the
    # device fills the tunnel-latency gaps with the next slice's work
    futs = []
    for ch in store.chunks:
        pc, pn, lengths = ch.device()
        rows = pc.shape[0]
        for a in range(0, rows, sub):
            b = min(a + sub, rows)
            pcs, pns, ls = pc[a:b], pn[a:b], lengths[a:b]
            if (b - a) % n_dev:
                pad = (-(b - a)) % n_dev
                pcs = np.pad(np.asarray(pcs), ((0, pad), (0, 0)))
                pns = np.pad(np.asarray(pns), ((0, pad), (0, 0)))
                ls = np.pad(np.asarray(ls), (0, pad))
            fn = make_sharded_hitter(mesh, k, ch.L, axis)
            futs.append((b - a, fn(pcs, pns, ls, tw_d)))
    flat = (np.concatenate([np.asarray(f)[:n] for n, f in futs])
            if futs else np.zeros(0, bool))
    c0 = 0
    a = 0
    for ch in store.chunks:
        rows = ch.pc.shape[0]
        out[c0 : c0 + ch.n] = flat[a : a + rows][: ch.n]
        a += rows
        c0 += ch.n
    return out


def map_packed_async(prep, k: int, pc, pn, lengths, L: int, mesh: Mesh):
    """Dispatch one packed wire chunk against a prepared device index and
    return DEVICE result arrays without blocking — callers queue several
    sub-chunks and pull afterwards, so the device stays busy during the
    (tunnel-latency-dominated) result transfers."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    rows = int(np.asarray(pc).shape[0] if not hasattr(pc, "shape") else pc.shape[0])
    if rows % n_dev:
        pad = (-rows) % n_dev
        pc = np.pad(np.asarray(pc), ((0, pad), (0, 0)))
        pn = np.pad(np.asarray(pn), ((0, pad), (0, 0)))
        lengths = np.pad(np.asarray(lengths), (0, pad))
    fn = make_sharded_mapper(mesh, k, L, axis)
    return fn(jnp.asarray(pc), jnp.asarray(pn), jnp.asarray(lengths), *prep)
