"""Multi-chip sharded k-mer counting over a device mesh.

TPU-native replacement for the reference's distributed construction
(`/root/reference/src/projects/hpcspades/mpi/stages/construction_mpi.cpp:222-700`):
where hpcSPAdes splits read streams across MPI ranks, writes hash-bucketed
k-mer files to a shared FS and merges them rank-by-rank, this module:

* shards the read batch across the mesh ("d" axis, data parallelism over DCN
  or ICI),
* extracts canonical k-mers locally on every chip,
* routes each k-mer to its owner chip by multiplicative hash (the
  `KMerSegmentPolicy` bucket map, `kmer_mph/kmer_buckets.hpp:17-56`) with a
  single `all_to_all` over ICI (replacing the shared-FS bucket exchange),
* sorts + run-length-counts the received shard on-chip.

Every k-mer ends up on exactly one chip, so per-k-mer state (counts, extension
masks, coverage) needs no further reduction — the MPI_BAND / MPI_SUM
allreduces of the reference (`construction_mpi.cpp:456,678`) collapse into
the routing step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import kmers as K
from ..ops.count import run_starts, sort_words


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _mix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3-style 32-bit finalizer (decorrelates k-mer bits from buckets)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def kmer_bucket(words: jnp.ndarray, n_buckets: int) -> jnp.ndarray:
    """k-mer rows (..., W) -> owner bucket in [0, n_buckets) (Lemire reduce)."""
    h = jnp.zeros(words.shape[:-1], jnp.uint32)
    for w in range(words.shape[-1]):
        h = _mix32(h ^ words[..., w])
    # 32-bit-safe Lemire-style reduce on the top 16 hash bits (no uint64 on TPU)
    assert n_buckets < (1 << 16)
    return (((h >> jnp.uint32(16)) * jnp.uint32(n_buckets)) >> jnp.uint32(16)).astype(
        jnp.int32
    )


def _route_local(canon_flat: jnp.ndarray, valid_flat: jnp.ndarray, n_dev: int, cap: int):
    """Group local k-mers by destination device into a (n_dev, cap, W) tensor.

    Overflowing k-mers beyond `cap` per destination are counted and dropped
    (caller sizes `cap` with a safety factor; overflow > 0 means redo with a
    bigger cap).
    """
    W = canon_flat.shape[-1]
    bucket = jnp.where(valid_flat, kmer_bucket(canon_flat, n_dev), n_dev)
    order = jnp.argsort(bucket)  # stable; invalid (bucket=n_dev) go last
    sorted_bucket = bucket[order]
    sorted_kmers = canon_flat[order]
    # position within bucket
    start = jnp.searchsorted(sorted_bucket, jnp.arange(n_dev + 1, dtype=jnp.int32))
    pos = jnp.arange(sorted_bucket.shape[0]) - start[jnp.clip(sorted_bucket, 0, n_dev)]
    ok = (sorted_bucket < n_dev) & (pos < cap)
    overflow = jnp.sum((sorted_bucket < n_dev) & (pos >= cap))
    out = jnp.full((n_dev, cap, W), K.SENTINEL32, jnp.uint32)
    dst = jnp.where(ok, sorted_bucket * cap + pos, n_dev * cap)
    out = out.reshape(-1, W).at[dst].set(sorted_kmers, mode="drop").reshape(n_dev, cap, W)
    return out, overflow


def _count_shard_body(codes, lengths, n_mask, k: int, cap: int, axis: str):
    """Per-device body (inside shard_map): extract -> route -> exchange -> count."""
    n_dev = jax.lax.axis_size(axis)
    canon, valid = K.canonical_windows(codes, lengths, n_mask, k)
    W = canon.shape[-1]
    routed, overflow = _route_local(canon.reshape(-1, W), valid.reshape(-1), n_dev, cap)
    # ICI exchange: slice j of every device lands on device j
    exchanged = jax.lax.all_to_all(routed, axis, split_axis=0, concat_axis=0, tiled=True)
    mine = exchanged.reshape(-1, W)
    (swords,) = sort_words(mine)
    starts = run_starts(swords)
    n_valid = jnp.sum(jnp.any(swords != K.SENTINEL32, axis=-1)).reshape(1)
    return swords, starts, n_valid, jax.lax.psum(overflow, axis)


def make_sharded_counter(mesh: Mesh, k: int, cap: int, axis: str = "d"):
    """Build the jitted multi-chip counting step for a fixed shard shape.

    Returns fn(codes, lengths, n_mask) -> (sorted_kmers, run_starts, n_valid,
    overflow) with per-device outputs sharded along the first axis.
    """
    spec_reads = P(axis, None)
    spec_vec = P(axis)

    body = functools.partial(_count_shard_body, k=k, cap=cap, axis=axis)
    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_reads, spec_vec, spec_reads),
        out_specs=(P(axis, None), P(axis), P(axis), P()),
    )
    return jax.jit(shard_fn)


def count_kmers_sharded(batch, k: int, mesh: Mesh | None = None, safety: float = 2.0):
    """Host wrapper: count canonical k-mers of a ReadBatch across the mesh.

    Returns (unique_words (U, W) np.uint32 sorted, counts (U,) np.int64).
    """
    from ..ops.count import KmerCounts, merge_counts

    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    R, L = batch.codes.shape
    P_win = L - k + 1
    # pad reads to a multiple of n_dev
    pad = (-R) % n_dev
    codes = np.pad(batch.codes, ((0, pad), (0, 0)))
    lengths = np.pad(batch.lengths, (0, pad))
    n_mask = np.pad(batch.n_mask, ((0, pad), (0, 0)))
    per_dev = codes.shape[0] // n_dev * P_win
    cap = int(np.ceil(per_dev * safety / n_dev)) + 16
    fn = make_sharded_counter(mesh, k, cap, axis)
    swords, starts, n_valid, overflow = fn(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(n_mask)
    )
    if int(overflow) > 0:
        raise RuntimeError(
            f"shard routing overflow ({int(overflow)} k-mers dropped); "
            f"increase safety factor"
        )
    # per-device compaction (device shards hold disjoint sorted k-mer ranges
    # in *hash* space, so host-merge the per-device runs)
    swords = np.asarray(swords)
    starts = np.asarray(starts)
    shard_rows = swords.shape[0] // n_dev
    runs = []
    for d in range(n_dev):
        sw = swords[d * shard_rows : (d + 1) * shard_rows]
        st = starts[d * shard_rows : (d + 1) * shard_rows]
        nv = int(np.sum(np.any(sw != np.uint32(0xFFFFFFFF), axis=-1)))
        if nv == 0:
            continue
        sidx = np.flatnonzero(st[:nv])
        counts = np.diff(np.append(sidx, nv)).astype(np.int64)
        runs.append(KmerCounts(k=k, words=sw[sidx], counts=counts))
    if not runs:
        W = K.kmer_words(k)
        return KmerCounts(k=k, words=np.zeros((0, W), np.uint32), counts=np.zeros(0, np.int64))
    return merge_counts(runs)
