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


def map_reads_sharded(index, g, batch, mesh: Mesh | None = None):
    """Host wrapper: map a ReadBatch across the mesh against an EdgeIndex.

    Returns (edge (R,), start (R,), votes (R,)) numpy arrays; edge == -1
    means unmapped.  Matches `alignment.mapper.map_read_batch` decisions up
    to vote ties.

    The index and graph arrays are padded to pow2 rows so the jitted program
    shape is stable across graph states — every K iteration and every
    gap-closer invocation would otherwise force a fresh XLA compile (minutes
    through the remote compile service).  Index padding rows are all-ones
    k-mers, lexicographically greatest and never equal to a real canonical
    k-mer (odd k leaves zero low bits in the last packed word)."""
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    R = batch.codes.shape[0]
    pad = (-R) % n_dev
    pc, pn, lengths_w, L = batch.packed()
    pc = np.pad(pc, ((0, pad), (0, 0)))
    pn = np.pad(pn, ((0, pad), (0, 0)))
    lengths = np.pad(np.asarray(lengths_w), (0, pad))

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

    fn = make_sharded_mapper(mesh, index.k, L, axis)
    edge, start, votes = fn(
        jnp.asarray(pc), jnp.asarray(pn), jnp.asarray(lengths),
        jnp.asarray(kmers), jnp.asarray(iedge),
        jnp.asarray(ioff), jnp.asarray(istr),
        jnp.asarray(conj), jnp.asarray(e_len),
    )
    return (np.asarray(edge)[:R], np.asarray(start)[:R], np.asarray(votes)[:R])


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


def _votes_shard_body(codes, lengths, n_mask, index_words, index_edge,
                      index_off, index_strand, conj, e_len, e_off,
                      k: int, axis: str, pool_len: int):
    """Map my read shard, scatter per-position base votes, psum across the
    mesh — the MPI_SUM vote merge of MismatchCorrectionMPI
    (`hpcspades/mpi/stages/mismatch_correction_mpi.hpp`)."""
    edge, start, votes_n = _map_shard_core(
        codes, lengths, n_mask, index_words, index_edge, index_off,
        index_strand, conj, e_len, k=k, axis=axis,
    )
    R, L = codes.shape
    pos = start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    mapped = (edge >= 0)[:, None]
    safe_e = jnp.clip(edge, 0, e_len.shape[0] - 1)
    inside = (pos >= 0) & (pos < e_len[safe_e][:, None]) & mapped
    valid_base = (codes < 4) & ~n_mask & (jnp.arange(L)[None, :] < lengths[:, None])
    ok = inside & valid_base
    flat = jnp.where(ok, e_off[safe_e][:, None] + pos, pool_len)
    base = jnp.where(ok, codes, 0).astype(jnp.int32)
    votes = jnp.zeros((pool_len + 1, 4), jnp.int32)
    votes = votes.at[flat.reshape(-1), base.reshape(-1)].add(
        ok.reshape(-1).astype(jnp.int32), mode="drop"
    )
    return jax.lax.psum(votes[:pool_len], axis)


def position_votes_sharded(index, g, batch, mesh: Mesh | None = None) -> np.ndarray:
    """Multi-chip per-position base votes: (len(seq_pool), 4) int32.

    Same contract as `alignment.mismatch.position_votes`, computed with read
    shards across the mesh and one psum (the distributed vote merge)."""
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    R = batch.codes.shape[0]
    pad = (-R) % n_dev
    codes = np.pad(batch.codes, ((0, pad), (0, 0)))
    lengths = np.pad(batch.lengths, (0, pad))
    n_mask = np.pad(batch.n_mask, ((0, pad), (0, 0)))
    pool_len = int(len(g.seq_pool))

    body = functools.partial(
        _votes_shard_body, k=index.k, axis=axis, pool_len=pool_len
    )
    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis), P(axis, None),
                      P(None, None), P(None), P(None), P(None), P(None),
                      P(None), P(None)),
            out_specs=P(None, None),
        )
    )
    votes = fn(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(n_mask),
        jnp.asarray(index.kmers), jnp.asarray(index.edge, jnp.int32),
        jnp.asarray(index.offset, jnp.int32), jnp.asarray(index.strand, jnp.int32),
        jnp.asarray(g.e_conj, jnp.int32), jnp.asarray(g.e_len, jnp.int32),
        jnp.asarray(g.e_off, jnp.int32),
    )
    return np.asarray(votes)
