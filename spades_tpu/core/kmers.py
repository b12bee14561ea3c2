"""Packed multi-word k-mer codec (device-side, jittable).

Replaces the reference's `Seq<k>` / `RtSeq` 2-bit packed sequences
(`/root/reference/src/common/sequence/seq.hpp:48`,
`sequence/rtseq.hpp:37`) with a TPU-native layout:

* a k-mer is a row of W = ceil(k/16) uint32 words (TPU-native 32-bit lanes —
  no 64-bit emulation), **big-endian**: base 0 sits in the top 2 bits of word
  0, unused low bits of the last word are zero.  This makes per-word unsigned
  comparison == lexicographic sequence order, so `jax.lax.sort` with
  `num_keys=W` sorts k-mer sets lexicographically and canonicalization is a
  vectorized word-cascade compare.
* canonical k-mer = min(kmer, revcomp(kmer)), same convention as the
  reference's `Seq::IsMinimal` canonical storage.
* the all-ones row is an impossible canonical k-mer (its revcomp would be
  all-zeros and thus smaller), so it serves as the padding sentinel that sorts
  to the end.

All functions here are shape-polymorphic in the batch dims but static in k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL32 = np.uint32(0xFFFFFFFF)


def kmer_words(k: int) -> int:
    """Number of uint32 words per k-mer."""
    return (k + 15) // 16


# ---------------------------------------------------------------------------
# Packing: read code matrices -> per-position packed k-mer words
# ---------------------------------------------------------------------------

def pack_windows(codes: jnp.ndarray, k: int, rc: bool = False) -> jnp.ndarray:
    """Pack every length-k window of each read.

    codes: (R, L) integer codes in {0..3}.
    Returns (R, P, W) uint32 with P = L - k + 1 windows per read.
    With rc=True, packs the reverse complement of each window instead
    (rc_kmer[j] = 3 - base[i + k - 1 - j]); combined with the forward pack this
    yields both orientations without materializing reversed reads.
    """
    R, L = codes.shape
    P = L - k + 1
    if P <= 0:
        raise ValueError(f"read length {L} < k {k}")
    W = kmer_words(k)
    c = codes.astype(jnp.uint32)
    words = []
    for w in range(W):
        acc = jnp.zeros((R, P), jnp.uint32)
        for jj in range(16):
            j = w * 16 + jj
            if j >= k:
                break
            shift = np.uint32(30 - 2 * jj)
            if rc:
                col = jnp.uint32(3) - c[:, k - 1 - j : k - 1 - j + P]
            else:
                col = c[:, j : j + P]
            acc = acc | (col << shift)
        words.append(acc)
    return jnp.stack(words, axis=-1)


def lex_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b over trailing word axis. Shapes (..., W) -> (...)."""
    lt = a < b
    eq = a == b
    res = lt[..., 0]
    eqacc = eq[..., 0]
    for w in range(1, a.shape[-1]):
        res = res | (eqacc & lt[..., w])
        eqacc = eqacc & eq[..., w]
    return res


def window_valid(lengths: jnp.ndarray, n_mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Which windows are real k-mers: inside the read and N-free.

    lengths: (R,), n_mask: (R, L) -> (R, P) bool.
    """
    R, L = n_mask.shape
    P = L - k + 1
    ncum = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), jnp.cumsum(n_mask.astype(jnp.int32), axis=1)],
        axis=1,
    )
    n_in_window = ncum[:, k : k + P] - ncum[:, 0:P]
    offs = jnp.arange(P, dtype=jnp.int32)[None, :]
    inside = offs + k <= lengths[:, None]
    return inside & (n_in_window == 0)


def _shift_cols(a: jnp.ndarray, n: int) -> jnp.ndarray:
    """a[:, i] -> a[:, i+n], zero-filled at the tail (column left-shift)."""
    if n == 0:
        return a
    return jnp.pad(a[:, n:], ((0, 0), (0, n)))


def doubling_packs(codes_u32: jnp.ndarray):
    """Prefix-doubling 16-base packs at every position.

    codes_u32: (R, Lx) uint32 base codes (garbage allowed in padding).
    Returns (B16, R16):
      B16[:, i] = pack of codes[i..i+15]   (base i in the top 2 bits),
      R16[:, i] = pack of (3 - codes)[i+15..i] (complemented, decreasing).
    log-depth construction (4 doubling steps per direction) — O(log 16) full
    sweeps instead of the reference's per-base rolling loop
    (`/root/reference/src/common/sequence/seq.hpp:48` packs base-by-base).
    """
    B = codes_u32 * jnp.uint32(1 << 30)
    D = (jnp.uint32(3) - codes_u32) * jnp.uint32(1 << 30)
    for n in (1, 2, 4, 8):
        B = B | (_shift_cols(B, n) >> jnp.uint32(2 * n))
        D = _shift_cols(D, n) | (D >> jnp.uint32(2 * n))
    return B, D


@functools.partial(jax.jit, static_argnames=("k",))
def canonical_windows(codes, lengths, n_mask, k: int):
    """All canonical k-mers of a read batch.

    Returns (canon (R, P, W) uint32 with sentinel rows where invalid,
             valid (R, P) bool).

    Fast path: windows are slices of the position-wise doubling packs
    (`doubling_packs`), so the per-window cost is W slices + a word-cascade
    compare instead of k shift/or terms (see also ops/pallas_kernels.py for
    the fused VMEM kernel).
    """
    R, L = codes.shape
    P = L - k + 1
    if P <= 0:
        raise ValueError(f"read length {L} < k {k}")
    W = kmer_words(k)
    m = k - 16 * (W - 1)  # bases in the last word (1..16)
    need = P + 16 * W - 1  # doubling packs are read up to index need-1
    c = codes.astype(jnp.uint32)
    if need > L:
        c = jnp.pad(c, ((0, 0), (0, need - L)))
    B16, R16 = doubling_packs(c)

    fwd_w = []
    rc_w = []
    for w in range(W):
        if w < W - 1:
            fwd_w.append(B16[:, 16 * w : 16 * w + P])
            rc_w.append(R16[:, k - 16 * (w + 1) : k - 16 * (w + 1) + P])
        else:
            f_last = B16[:, 16 * w : 16 * w + P]
            if m < 16:  # keep only the top m bases
                f_last = f_last & jnp.uint32(~((1 << (32 - 2 * m)) - 1) & 0xFFFFFFFF)
            fwd_w.append(f_last)
            r_last = R16[:, 0:P]
            if m < 16:  # drop the top 16-m entries, zero-fill low bits
                r_last = r_last * jnp.uint32(1 << (32 - 2 * m))
            rc_w.append(r_last)

    fwd = jnp.stack(fwd_w, axis=-1)
    rcw = jnp.stack(rc_w, axis=-1)
    use_rc = lex_less(rcw, fwd)
    canon = jnp.where(use_rc[..., None], rcw, fwd)
    valid = window_valid(lengths, n_mask, k)
    canon = jnp.where(valid[..., None], canon, SENTINEL32)
    return canon, valid


def canonical_windows_strand(codes, lengths, n_mask, k: int):
    """Like `canonical_windows` but also returns was_rc (R, P) bool — True
    where the canonical form is the reverse complement of the spelled window
    (the orientation bit read mappers need)."""
    R, L = codes.shape
    P = L - k + 1
    W = kmer_words(k)
    m = k - 16 * (W - 1)
    need = P + 16 * W - 1
    c = codes.astype(jnp.uint32)
    if need > L:
        c = jnp.pad(c, ((0, 0), (0, need - L)))
    B16, R16 = doubling_packs(c)
    fwd_w, rc_w = [], []
    for w in range(W):
        if w < W - 1:
            fwd_w.append(B16[:, 16 * w : 16 * w + P])
            rc_w.append(R16[:, k - 16 * (w + 1) : k - 16 * (w + 1) + P])
        else:
            f_last = B16[:, 16 * w : 16 * w + P]
            if m < 16:
                f_last = f_last & jnp.uint32(~((1 << (32 - 2 * m)) - 1) & 0xFFFFFFFF)
            fwd_w.append(f_last)
            r_last = R16[:, 0:P]
            if m < 16:
                r_last = r_last * jnp.uint32(1 << (32 - 2 * m))
            rc_w.append(r_last)
    fwd = jnp.stack(fwd_w, axis=-1)
    rcw = jnp.stack(rc_w, axis=-1)
    use_rc = lex_less(rcw, fwd)
    canon = jnp.where(use_rc[..., None], rcw, fwd)
    valid = window_valid(lengths, n_mask, k)
    canon = jnp.where(valid[..., None], canon, SENTINEL32)
    return canon, valid, use_rc


# ---------------------------------------------------------------------------
# Word-level k-mer manipulation (used by the extension index / condensation)
# ---------------------------------------------------------------------------

def base_at(words: jnp.ndarray, j: int, k: int) -> jnp.ndarray:
    """Extract base j (0-indexed from the 5' end) of packed k-mers (..., W)."""
    w, jj = divmod(j, 16)
    shift = np.uint32(30 - 2 * jj)
    return (words[..., w] >> shift) & jnp.uint32(3)


def first_base(words: jnp.ndarray, k: int) -> jnp.ndarray:
    return base_at(words, 0, k)


def last_base(words: jnp.ndarray, k: int) -> jnp.ndarray:
    return base_at(words, k - 1, k)


def unpack(words: np.ndarray, k: int) -> np.ndarray:
    """Host-side: packed (N, W) -> (N, k) uint8 base codes."""
    words = np.asarray(words, dtype=np.uint32)
    n = words.shape[0]
    out = np.empty((n, k), np.uint8)
    for j in range(k):
        w, jj = divmod(j, 16)
        out[:, j] = (words[:, w] >> np.uint32(30 - 2 * jj)) & 3
    return out


def pack(codes: np.ndarray) -> np.ndarray:
    """Host-side: (N, k) base codes -> packed (N, W) uint32."""
    codes = np.asarray(codes)
    n, k = codes.shape
    W = kmer_words(k)
    out = np.zeros((n, W), np.uint32)
    for j in range(k):
        w, jj = divmod(j, 16)
        out[:, w] |= codes[:, j].astype(np.uint32) << np.uint32(30 - 2 * jj)
    return out


def revcomp_words(words: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse-complement packed k-mers (device or host arrays).

    Implemented as a pure bit-shuffle: complement every 2-bit field, reverse
    the field order across the whole W*32-bit register, then realign for the
    left-aligned layout.
    """
    xp = jnp if isinstance(words, jnp.ndarray) else np
    W = words.shape[-1]
    # Complement: ~x on used bits. Unused low bits of last word must stay 0.
    comp = [~words[..., w] for w in range(W)]
    # Reverse 2-bit fields within each word.
    def rev2(x):
        m2 = xp.uint32(0x33333333)
        m4 = xp.uint32(0x0F0F0F0F)
        m8 = xp.uint32(0x00FF00FF)
        x = ((x >> 2) & m2) | ((x & m2) << 2)
        x = ((x >> 4) & m4) | ((x & m4) << 4)
        x = ((x >> 8) & m8) | ((x & m8) << 8)
        x = (x >> 16) | (x << 16)
        return x
    rev = [rev2(comp[W - 1 - w]) for w in range(W)]
    # Now the k-mer occupies the LOW 2k bits (right-aligned); shift left by
    # (32*W - 2k) to restore left alignment.
    pad = 32 * W - 2 * k
    if pad:
        sh = np.uint32(pad)
        out = []
        for w in range(W):
            hi = rev[w] << sh
            lo = rev[w + 1] >> np.uint32(32 - pad) if w + 1 < W else xp.uint32(0)
            out.append(hi | lo)
        rev = out
    res = xp.stack(rev, axis=-1)
    if xp is np:
        res = res.astype(np.uint32)
    return res


def kmer_to_int(words: np.ndarray, k: int) -> np.ndarray:
    """Host-side: packed k-mer -> python-int array (arbitrary precision) for tests."""
    words = np.asarray(words, dtype=np.uint64)
    val = np.zeros(words.shape[:-1], dtype=object)
    for w in range(words.shape[-1]):
        val = val * (1 << 32) + words[..., w].astype(object)
    return val >> (32 * words.shape[-1] - 2 * k)
