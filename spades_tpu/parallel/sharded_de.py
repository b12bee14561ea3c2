"""Multi-chip sharded distance estimation.

TPU-native replacement for the reference's DistanceEstimationMPI
(`/root/reference/src/projects/hpcspades/mpi/stages/distance_estimation_mpi.cpp`):
hpcSPAdes splits the edge-pair ranges of the clustered-index build across MPI
ranks via partask and merges per-rank outputs on the master.  Here the raw
(e1, e2, d, w) table is routed by a hash of the (e1, e2) pair so every
pair-group lands wholly on one device, each device runs the linkage
clustering of `paired.distance_estimation.estimate_simple` as a fully
vectorized segmented reduction (sort -> boundary flags -> segment sums), and
the host concatenates the per-shard cluster rows.

Exactness: per-group results are identical to the host estimator; only the
inter-group ordering is restored by the final host lexsort.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..paired.distance_estimation import DEConfig
from ..paired.paired_info import PairedIndex
from .sharded_count import make_mesh

_SENT = np.int32(2**31 - 1)


def _de_shard_body(e1, e2, d, w, linkage: int, min_weight: float, axis: str):
    """Per-device linkage clustering of its routed rows.

    Rows are (e1, e2, d, w) with sentinel rows (e1 == _SENT) padding the
    shard.  Returns (e1c, e2c, dc, wc, valid) with cluster rows compacted to
    the front."""
    n = e1.shape[0]
    # sort by (e1, e2, d) so groups and distances are contiguous
    e1s, e2s, ds, ws = jax.lax.sort((e1, e2, d, w), num_keys=3)
    new_group = jnp.concatenate([
        jnp.ones((1,), bool),
        (e1s[1:] != e1s[:-1]) | (e2s[1:] != e2s[:-1]),
    ])
    gap_break = jnp.concatenate([
        jnp.ones((1,), bool), (ds[1:] - ds[:-1]) > linkage,
    ])
    newc = new_group | gap_break
    seg = jnp.cumsum(newc.astype(jnp.int32)) - 1
    wsum = jax.ops.segment_sum(ws, seg, num_segments=n)
    dwsum = jax.ops.segment_sum(ds.astype(jnp.float32) * ws, seg, num_segments=n)
    # cluster row at each segment start
    is_start = newc & (e1s != _SENT)
    cw = wsum[seg]
    cd = dwsum[seg] / jnp.maximum(cw, 1e-30)
    keep = is_start & (cw >= min_weight)
    flag = jnp.where(keep, jnp.uint8(0), jnp.uint8(1))
    out = jax.lax.sort(
        (flag, e1s, e2s, cd.astype(jnp.float32), cw.astype(jnp.float32)),
        num_keys=1, is_stable=True,
    )
    n_valid = jnp.sum(keep.astype(jnp.int32)).reshape(1)
    return out[1], out[2], out[3], out[4], n_valid


@functools.lru_cache(maxsize=32)
def _make_de_fn(mesh: Mesh, linkage: int, min_weight: float, axis: str):
    body = functools.partial(
        _de_shard_body, linkage=linkage, min_weight=min_weight, axis=axis
    )
    spec = P(axis)
    return jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec, spec, spec, spec),
        )
    )


def estimate_simple_sharded(
    pi: PairedIndex, mesh: Mesh | None = None, cfg: DEConfig | None = None
) -> PairedIndex:
    """Sharded linkage clustering; exact match of `estimate_simple`."""
    cfg = cfg or DEConfig()
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = pi.e1.size
    if n == 0:
        z = np.zeros(0)
        return PairedIndex(z.astype(np.int64), z.astype(np.int64), z, z)
    # route whole (e1, e2) groups by hash
    h = ((pi.e1 * np.int64(0x9E3779B1) + pi.e2) ^ (pi.e1 >> 7)) % n_dev
    order = np.argsort(h, kind="stable")
    counts = np.bincount(h, minlength=n_dev)
    cap = int(counts.max())
    # pad each shard to `cap` rows with sentinel
    e1p = np.full((n_dev, cap), _SENT, np.int32)
    e2p = np.full((n_dev, cap), _SENT, np.int32)
    dp = np.zeros((n_dev, cap), np.int32)
    wp = np.zeros((n_dev, cap), np.float32)
    off = 0
    for dev in range(n_dev):
        rows = order[off : off + counts[dev]]
        off += counts[dev]
        e1p[dev, : len(rows)] = pi.e1[rows]
        e2p[dev, : len(rows)] = pi.e2[rows]
        dp[dev, : len(rows)] = pi.dist[rows]
        wp[dev, : len(rows)] = pi.weight[rows]
    fn = _make_de_fn(mesh, int(cfg.linkage_distance), float(cfg.min_peak_weight), axis)
    e1c, e2c, dc, wc, nv = fn(
        jnp.asarray(e1p.reshape(-1)), jnp.asarray(e2p.reshape(-1)),
        jnp.asarray(dp.reshape(-1)), jnp.asarray(wp.reshape(-1)),
    )
    nv = np.asarray(nv)
    rows_e1, rows_e2, rows_d, rows_w = [], [], [], []
    e1c = np.asarray(e1c).reshape(n_dev, cap)
    e2c = np.asarray(e2c).reshape(n_dev, cap)
    dc = np.asarray(dc).reshape(n_dev, cap)
    wc = np.asarray(wc).reshape(n_dev, cap)
    for dev in range(n_dev):
        m = int(nv[dev])
        rows_e1.append(e1c[dev, :m])
        rows_e2.append(e2c[dev, :m])
        rows_d.append(dc[dev, :m])
        rows_w.append(wc[dev, :m])
    e1 = np.concatenate(rows_e1).astype(np.int64)
    e2 = np.concatenate(rows_e2).astype(np.int64)
    dd = np.concatenate(rows_d).astype(float)
    ww = np.concatenate(rows_w).astype(float)
    o = np.lexsort((dd, e2, e1))
    return PairedIndex(e1[o], e2[o], dd[o], ww[o])
