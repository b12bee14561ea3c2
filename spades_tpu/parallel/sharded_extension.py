"""Multi-chip extension-index (in/out mask) build over a device mesh.

TPU-native replacement for the reference's distributed extension-index fill
(`/root/reference/src/projects/hpcspades/mpi/stages/construction_mpi.cpp`
ExtensionIndex fill distributed by bucket + tip clipping synchronized with an
`MPI_BAND` allreduce over the raw mask array :456): every (k+1)-mer shard
computes its prefix/suffix canonical-k-mer mask contributions locally, routes
them to the k-mer's owner chip with one `all_to_all` (hash-bucket ownership,
same policy as sharded counting), and the owner OR-combines — the allreduce
collapses into the routing step because ownership is unique.

Device-side mirrors of the host builders in ops/extension.py; the host
versions remain the behavioral oracle."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import kmers as K
from ..ops.count import run_starts, sort_words
from .sharded_count import kmer_bucket, make_mesh

NT_COMP_J = jnp.array([3, 2, 1, 0], jnp.uint8)


def _mask_tail_j(words: jnp.ndarray, k: int) -> jnp.ndarray:
    W = words.shape[-1]
    used_last = k - 16 * (W - 1)
    if used_last < 16:
        keep = np.uint32(0xFFFFFFFF) << np.uint32(32 - 2 * used_last)
    else:
        keep = np.uint32(0xFFFFFFFF)
    return words.at[..., W - 1].set(words[..., W - 1] & keep)


def _prefix_kmer_j(p1words: jnp.ndarray, k: int) -> jnp.ndarray:
    Wk = K.kmer_words(k)
    return _mask_tail_j(p1words[..., :Wk], k)


def _suffix_kmer_j(p1words: jnp.ndarray, k: int) -> jnp.ndarray:
    W1 = p1words.shape[-1]
    shifted = p1words << jnp.uint32(2)
    if W1 > 1:
        carry = jnp.concatenate(
            [p1words[..., 1:] >> jnp.uint32(30),
             jnp.zeros(p1words.shape[:-1] + (1,), jnp.uint32)], axis=-1)
        shifted = shifted | carry
    Wk = K.kmer_words(k)
    return _mask_tail_j(shifted[..., :Wk], k)


def _canonicalize_j(words: jnp.ndarray, k: int):
    rc = K.revcomp_words(words, k)
    use_rc = K.lex_less(rc, words)
    return jnp.where(use_rc[..., None], rc, words), use_rc


def _route_payload(kmers, payload, valid, n_dev: int, cap: int):
    """Group (kmer, payload) rows by owner chip into (n_dev, cap, ...)."""
    Wk = kmers.shape[-1]
    bucket = jnp.where(valid, kmer_bucket(kmers, n_dev), n_dev)
    order = jnp.argsort(bucket)
    sb = bucket[order]
    sk = kmers[order]
    sp = payload[order]
    start = jnp.searchsorted(sb, jnp.arange(n_dev + 1, dtype=jnp.int32))
    pos = jnp.arange(sb.shape[0]) - start[jnp.clip(sb, 0, n_dev)]
    ok = (sb < n_dev) & (pos < cap)
    overflow = jnp.sum((sb < n_dev) & (pos >= cap))
    dst = jnp.where(ok, sb * cap + pos, n_dev * cap)
    out_k = jnp.full((n_dev * cap, Wk), K.SENTINEL32, jnp.uint32)
    out_k = out_k.at[dst].set(sk, mode="drop")
    out_p = jnp.zeros((n_dev * cap,), jnp.uint32)
    out_p = out_p.at[dst].set(sp, mode="drop")
    return out_k.reshape(n_dev, cap, Wk), out_p.reshape(n_dev, cap), overflow


def _ext_shard_body(codes, lengths, n_mask, k: int, cap: int, axis: str):
    """Per-device: (k+1)-windows -> mask contributions -> exchange -> OR."""
    n_dev = jax.lax.axis_size(axis)
    p1 = k + 1
    canon, valid = K.canonical_windows(codes, lengths, n_mask, p1)
    W1 = canon.shape[-1]
    s = canon.reshape(-1, W1)
    v = valid.reshape(-1)

    last = K.base_at(s, k, p1).astype(jnp.uint8)
    first = K.base_at(s, 0, p1).astype(jnp.uint8)
    pref, pref_rc = _canonicalize_j(_prefix_kmer_j(s, k), k)
    suf, suf_rc = _canonicalize_j(_suffix_kmer_j(s, k), k)

    one = jnp.uint8(1)
    # payload: out bits in low nibble, in bits in high nibble (uint32 lanes)
    p_out = jnp.where(pref_rc, 0, one << last).astype(jnp.uint32)
    p_in = jnp.where(pref_rc, one << NT_COMP_J[last], 0).astype(jnp.uint32)
    pay_pref = p_out | (p_in << 4)
    s_in = jnp.where(suf_rc, 0, one << first).astype(jnp.uint32)
    s_out = jnp.where(suf_rc, one << NT_COMP_J[first], 0).astype(jnp.uint32)
    pay_suf = s_out | (s_in << 4)

    kms = jnp.concatenate([pref, suf], axis=0)
    pays = jnp.concatenate([pay_pref, pay_suf], axis=0)
    vs = jnp.concatenate([v, v], axis=0)

    routed_k, routed_p, overflow = _route_payload(kms, pays, vs, n_dev, cap)
    ex_k = jax.lax.all_to_all(routed_k, axis, split_axis=0, concat_axis=0, tiled=True)
    ex_p = jax.lax.all_to_all(routed_p, axis, split_axis=0, concat_axis=0, tiled=True)
    mine_k = ex_k.reshape(-1, kms.shape[-1])
    mine_p = ex_p.reshape(-1)
    sk, sp = sort_words(mine_k, (mine_p,))
    starts = run_starts(sk)
    # segment-OR of the 8-bit payloads over equal-k-mer runs: per-bit
    # scatter-max (OR == any-bit-set == max of the bit column per segment)
    seg = jnp.cumsum(starts.astype(jnp.int32)) - 1
    n_rows = sk.shape[0]
    orred = jnp.zeros((n_rows,), jnp.uint32)
    for b in range(8):
        bit = (sp >> jnp.uint32(b)) & jnp.uint32(1)
        got = jnp.zeros((n_rows,), jnp.uint32).at[seg].max(bit)
        orred = orred | (got << jnp.uint32(b))
    return sk, starts, orred, jax.lax.psum(overflow, axis)


def make_sharded_ext_builder(mesh: Mesh, k: int, cap: int, axis: str = "d"):
    body = functools.partial(_ext_shard_body, k=k, cap=cap, axis=axis)
    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None)),
        out_specs=(P(axis, None), P(axis), P(axis), P()),
    )
    return jax.jit(shard_fn)


def extension_masks_sharded(batch, k: int, mesh: Mesh | None = None, safety: float = 2.5):
    """Host wrapper: build the extension index of a ReadBatch across the mesh.

    Returns an ops.extension.ExtensionIndex (host arrays), built with the
    same contract as the single-host `build_extension_index` oracle."""
    from ..ops.count import _lexsort_rows
    from ..ops.extension import ExtensionIndex

    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    R, L = batch.codes.shape
    p1 = k + 1
    P_win = L - p1 + 1
    pad = (-R) % n_dev
    codes = np.pad(batch.codes, ((0, pad), (0, 0)))
    lengths = np.pad(batch.lengths, (0, pad))
    n_mask = np.pad(batch.n_mask, ((0, pad), (0, 0)))
    # 2 contributions (prefix+suffix) per (k+1)-window
    per_dev = codes.shape[0] // n_dev * P_win * 2
    cap = int(np.ceil(per_dev * safety / n_dev)) + 16
    fn = make_sharded_ext_builder(mesh, k, cap, axis)
    sk, starts, orred, overflow = fn(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(n_mask)
    )
    if int(overflow) > 0:
        raise RuntimeError(
            f"extension routing overflow ({int(overflow)}); raise safety"
        )
    sk = np.asarray(sk)
    starts = np.asarray(starts)
    orred = np.asarray(orred)
    shard_rows = sk.shape[0] // n_dev
    rows, masks = [], []
    for d in range(n_dev):
        a, b = d * shard_rows, (d + 1) * shard_rows
        sw, st, om = sk[a:b], starts[a:b], orred[a:b]
        real = np.any(sw != np.uint32(0xFFFFFFFF), axis=-1)
        nv = int(real.sum())
        if nv == 0:
            continue
        sidx = np.flatnonzero(st[:nv])
        rows.append(sw[sidx])
        # per-run OR landed at dense run positions 0..n_runs-1
        masks.append(om[: len(sidx)])
    if not rows:
        Wk = K.kmer_words(k)
        return ExtensionIndex(
            k=k, kmers=np.zeros((0, Wk), np.uint32),
            in_mask=np.zeros(0, np.uint8), out_mask=np.zeros(0, np.uint8),
        )
    kmers = np.concatenate(rows)
    mask = np.concatenate(masks)
    order = _lexsort_rows(kmers)
    kmers, mask = kmers[order], mask[order]
    return ExtensionIndex(
        k=k,
        kmers=kmers,
        out_mask=(mask & 0xF).astype(np.uint8),
        in_mask=((mask >> 4) & 0xF).astype(np.uint8),
    )
