"""HyperLogLog cardinality estimation for k-mer streams.

Capability mirror of the reference's `hll::hll` + `HllProcessor`
(`/root/reference/src/common/adt/hll.hpp:18`,
`kmer_index/kmer_counting.hpp:23-120`, used by `EstimateCardinalityUpperBound`
and the spades-kmer-estimating tool) — TPU-native: bucket ids and leading-zero
ranks are vectorized ops over the packed k-mer hash, per-bucket maxima are a
segment-max, and multi-chip merge is an elementwise max over register arrays
(the psum-like merge of HLL state).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmers as K
from ..parallel.sharded_count import _mix32

HLL_P = 12  # 4096 registers, ~1.6% relative error (reference uses precision 12)
HLL_M = 1 << HLL_P


def _hash2(words: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two decorrelated 32-bit hashes per k-mer row."""
    h1 = jnp.zeros(words.shape[:-1], jnp.uint32)
    h2 = jnp.full(words.shape[:-1], jnp.uint32(0x9E3779B9))
    for w in range(words.shape[-1]):
        h1 = _mix32(h1 ^ words[..., w])
        h2 = _mix32(h2 + words[..., w] * jnp.uint32(0x1000193))
    return h1, h2


@functools.partial(jax.jit, static_argnames=("k",))
def hll_registers(codes, lengths, n_mask, k: int) -> jnp.ndarray:
    """One device pass: read batch -> (HLL_M,) uint8 register maxima."""
    canon, valid = K.canonical_windows(codes, lengths, n_mask, k)
    W = canon.shape[-1]
    flat = canon.reshape(-1, W)
    vflat = valid.reshape(-1)
    h1, h2 = _hash2(flat)
    bucket = (h1 & jnp.uint32(HLL_M - 1)).astype(jnp.int32)
    # rank = clz(h2) + 1, exact integer bit-smear + popcount
    y = h2 | jnp.uint32(1)  # avoid clz(0) = 32 edge
    for s in (1, 2, 4, 8, 16):
        y = y | (y >> jnp.uint32(s))
    # popcount(y) = number of bits below the leading one (inclusive)
    v = y - ((y >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    v = (v + (v >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    pop = (v * jnp.uint32(0x01010101)) >> jnp.uint32(24)
    clz = jnp.uint32(32) - pop
    rank = (clz + 1).astype(jnp.uint8)
    rank = jnp.where(vflat, rank, 0)
    regs = jnp.zeros(HLL_M, jnp.uint8)
    regs = regs.at[bucket].max(rank)
    return regs


def merge_registers(regs: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(HLL_M, np.uint8)
    for r in regs:
        out = np.maximum(out, np.asarray(r))
    return out


def estimate_cardinality(registers: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    regs = np.asarray(registers, np.float64)
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = np.sum(regs == 0)
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def estimate_kmer_cardinality(batches, k: int) -> float:
    """Host driver over ReadBatches — the spades-kmer-estimating path."""
    import jax.numpy as jnp

    regs = []
    for b in batches:
        if b.codes.shape[0] == 0 or b.codes.shape[1] < k:
            continue
        r = hll_registers(
            jnp.asarray(b.codes), jnp.asarray(b.lengths), jnp.asarray(b.n_mask), k
        )
        regs.append(np.asarray(r))
    if not regs:
        return 0.0
    return estimate_cardinality(merge_registers(regs))
