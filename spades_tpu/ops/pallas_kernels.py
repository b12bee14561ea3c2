"""Pallas TPU kernels for the counting hot path.

The jnp reference implementation (`core/kmers.py:canonical_windows`) lowers to
~170 separate strided HBM sweeps (one per unrolled shift/or slice over the
(R, P) window matrix), which makes k-mer extraction HBM-bandwidth-bound at
~1.7 ms per 1M k-mers on a v5e chip.  This kernel fuses the whole extraction
— forward pack, reverse-complement pack, lexicographic canonicalization, and
validity masking (read length + N cumsum) — into one VMEM-resident pass per
row tile: one HBM read of the codes tile, one HBM write of the canonical
words.  This is the TPU-native analog of the reference's per-thread k-mer
buffer fill (`/root/reference/src/common/kmer_index/kmer_mph/
kmer_splitter.hpp:75-120`), where a read is scanned once and every k-mer is
emitted in packed canonical form.

Layout: outputs are word-planar `(W, R, P_pad)` uint32 so each word plane is
a well-tiled (rows × 128k lanes) array and the downstream `jax.lax.sort`
consumes the planes directly as its operand tuple without re-stacking.
Invalid windows hold the all-ones sentinel (sorts last; impossible canonical
k-mer since its revcomp would be smaller — see core/kmers.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.kmers import SENTINEL32, kmer_words

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _extract_kernel(codes_ref, lengths_ref, nsuffix_ref, out_ref, valid_ref, *, k: int, P: int):
    """One row-tile: fused pack(fw) + pack(rc) + canonical + valid mask.

    codes_ref:   (TR, Lp)    int32 base codes in {0..3} (garbage beyond read)
    lengths_ref: (TR, 1)     int32 read lengths
    nsuffix_ref: (TR, Lp)    int32 inclusive suffix-style cumsum of N flags
                             (ncum[i] = number of N bases in codes[0..i-1]),
                             precomputed outside (cheap, fused by XLA)
    out_ref:     (W, TR, Pp) uint32 canonical window words (sentinel invalid)
    valid_ref:   (TR, Pp)    int32 1 where window is a real k-mer
    """
    W = kmer_words(k)
    TR, Pp = valid_ref.shape
    c = codes_ref[:].astype(jnp.uint32)

    # validity: window p is real iff p + k <= length and no N in [p, p+k)
    offs = jax.lax.broadcasted_iota(jnp.int32, (TR, Pp), 1)
    inside = (offs + k <= lengths_ref[:]) & (offs < P)
    n_in_win = nsuffix_ref[:, k : k + Pp] - nsuffix_ref[:, 0:Pp]
    valid = inside & (n_in_win == 0)
    valid_ref[:] = valid.astype(jnp.int32)

    # prefix-doubling 16-base packs at every position (see core.kmers.
    # doubling_packs).  NOTE: multiplies instead of left-shifts: Mosaic
    # miscompiles u32 `<<` by 16..22 on this toolchain (minimal repro
    # verified); right shifts are fine.
    Lp = c.shape[1]
    m = k - 16 * (W - 1)

    def shift_cols(a, n):
        z = jnp.zeros((TR, n), jnp.uint32)
        return jnp.concatenate([a[:, n:], z], axis=1)

    B = c * jnp.uint32(1 << 30)
    D = (jnp.uint32(3) - c) * jnp.uint32(1 << 30)
    for n in (1, 2, 4, 8):
        B = B | (shift_cols(B, n) >> jnp.uint32(2 * n))
        D = shift_cols(D, n) | (D >> jnp.uint32(2 * n))

    fw = []
    rc = []
    for w in range(W):
        if w < W - 1:
            fw.append(B[:, 16 * w : 16 * w + Pp])
            rc.append(D[:, k - 16 * (w + 1) : k - 16 * (w + 1) + Pp])
        else:
            f_last = B[:, 16 * w : 16 * w + Pp]
            if m < 16:
                # keep top 2m bits.  Written as x - (x & low_mask): Mosaic
                # miscompiles `rotated_slice & const_with_bit31` (sparse top-
                # bit loss, minimal repro verified); the low-mask AND is safe.
                low = jnp.uint32((1 << (32 - 2 * m)) - 1)
                f_last = f_last - (f_last & low)
            fw.append(f_last)
            r_last = D[:, 0:Pp]
            if m < 16:
                r_last = r_last * jnp.uint32(1 << (32 - 2 * m))
            rc.append(r_last)

    # lexicographic fw vs rc word cascade
    use_rc = rc[0] < fw[0]
    eq = rc[0] == fw[0]
    for w in range(1, W):
        use_rc = use_rc | (eq & (rc[w] < fw[w]))
        eq = eq & (rc[w] == fw[w])

    for w in range(W):
        canon = jnp.where(use_rc, rc[w], fw[w])
        out_ref[w] = jnp.where(valid, canon, SENTINEL32)


@functools.partial(jax.jit, static_argnames=("k", "row_tile", "interpret"))
def canonical_windows_planar(codes, lengths, n_mask, k: int, row_tile: int = 256, interpret: bool = False):
    """Pallas fused canonical k-mer extraction.

    codes: (R, L) uint8/int codes, lengths: (R,) int32, n_mask: (R, L) bool.
    Returns (canon_planar (W, R, P_pad) uint32, valid (R, P_pad) bool) with
    P_pad = L - k + 1 rounded up to the lane width; padding windows are
    sentinel/invalid.  Semantics identical to `core.kmers.canonical_windows`
    modulo the planar layout and P padding.
    """
    R, L = codes.shape
    P = L - k + 1
    if P <= 0:
        raise ValueError(f"read length {L} < k {k}")
    W = kmer_words(k)
    Pp = _round_up(P, _LANE)
    # codes block width: doubling packs read up to position P+16W-2 (fw) and
    # Pp+k-2 (rc); keep lane-aligned (Mosaic mishandles unaligned blocks)
    Lp = _round_up(max(L, Pp + k, P + 16 * W - 1), _LANE)
    # cap the row tile so the kernel's VMEM working set (outputs + two int32
    # input blocks + intermediates) stays well under the ~16 MB scoped limit;
    # long reads / large W otherwise blow the stack at TR=256
    bytes_per_row = 4 * ((W + 1) * Pp + 2 * Lp) * 3  # x3 headroom for temps
    tr_cap = max(8, (4 << 20) // max(bytes_per_row, 1) * 8 // 8)
    tr_cap = max(8, 1 << (tr_cap.bit_length() - 1))  # round down to pow2
    TR = min(row_tile, tr_cap, _round_up(R, 8))
    Rp = _round_up(R, TR)

    c = codes.astype(jnp.int32)
    nm = n_mask.astype(jnp.int32)
    # exclusive cumsum of N flags, padded: ncum[:, i] = #N in codes[:, :i]
    ncum = jnp.cumsum(nm, axis=1)
    ncum = jnp.concatenate([jnp.zeros((R, 1), jnp.int32), ncum], axis=1)
    c = jnp.pad(c, ((0, Rp - R), (0, Lp - L)))
    # pad ncum's tail with its last value so windows past the end see 0 extra N
    ncum = jnp.pad(ncum, ((0, Rp - R), (0, Lp - L - 1)), mode="edge")
    lens = jnp.pad(lengths.astype(jnp.int32), (0, Rp - R)).reshape(Rp, 1)

    grid = (Rp // TR,)
    canon, valid = pl.pallas_call(
        functools.partial(_extract_kernel, k=k, P=P),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, Lp), lambda i: (i, 0)),
            pl.BlockSpec((TR, 1), lambda i: (i, 0)),
            pl.BlockSpec((TR, Lp), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((W, TR, Pp), lambda i: (0, i, 0)),
            pl.BlockSpec((TR, Pp), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W, Rp, Pp), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, Pp), jnp.int32),
        ],
        interpret=interpret,
    )(c, lens, ncum)
    return canon[:, :R], valid[:R].astype(bool)


def planar_to_rows(canon_planar: jnp.ndarray) -> jnp.ndarray:
    """(W, R, Pp) planar canonical words -> (R, Pp, W) row layout."""
    return jnp.moveaxis(canon_planar, 0, -1)


def supports_pallas() -> bool:
    """True when the default JAX backend compiles Mosaic/Pallas TPU kernels."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
