"""K-mer counting engine.

Capability mirror of the reference's disk-based counting pipeline
(`/root/reference/src/common/kmer_index/kmer_mph/kmer_index_builder.hpp:306`:
split reads into hash buckets, sort+dedup buffers, loser-tree merge) —
re-designed for TPU: k-mer extraction and canonicalization are fused
vectorized window ops, counting is sort-based (`jax.lax.sort` lexicographic
multi-word sort runs on-device), run-length boundaries are a vectorized
compare, and per-batch sorted runs are merged on the host.  There is no
disk-bucket machinery: HBM shards + device sort replace tmp files, and the
bucket dimension of the reference maps to the device mesh (see
spades_tpu.parallel).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmers as K
from ..core.reads import ReadBatch


def sort_words(words: jnp.ndarray, extra: tuple = ()) -> tuple:
    """Lexicographic sort of (N, W) packed k-mers; carries `extra` (N,) arrays.

    Returns (sorted_words, sorted_extras...).
    """
    W = words.shape[-1]
    ops = tuple(words[:, w] for w in range(W)) + tuple(extra)
    out = jax.lax.sort(ops, num_keys=W)
    sorted_words = jnp.stack(out[:W], axis=-1)
    return (sorted_words,) + tuple(out[W:])


def run_starts(sorted_words: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of first element of each equal-run in a sorted (N, W) array."""
    neq = jnp.any(sorted_words[1:] != sorted_words[:-1], axis=-1)
    return jnp.concatenate([jnp.ones((1,), bool), neq])


@functools.partial(jax.jit, static_argnames=("k",))
def count_batch_device(codes, lengths, n_mask, k: int):
    """One device pass: reads -> sorted canonical k-mers + run-start flags.

    Invalid windows become sentinel rows that sort to the end.
    Returns (sorted (N, W) uint32, starts (N,) bool, n_valid () int32).
    """
    canon, valid = K.canonical_windows(codes, lengths, n_mask, k)
    W = canon.shape[-1]
    flat = canon.reshape(-1, W)
    (swords,) = sort_words(flat)
    starts = run_starts(swords)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return swords, starts, n_valid


@functools.partial(jax.jit, static_argnames=("k", "tile", "use_pallas"))
def count_batch_device_tiled(codes, lengths, n_mask, k: int, tile: int = 512,
                             use_pallas: bool = False):
    """Tiled device pass: reads -> per-tile sorted runs of canonical k-mers.

    A measured ~6x-cheaper formulation of `count_batch_device`: XLA's TPU
    sort cost grows ~log^2 with the sort-axis length, so thousands of
    independent 512-row sorts (one batched `lax.sort`) beat one 1M-row sort
    (512 measured fastest on v5e: 3.2 vs 1.8 Gkmers/s at 4096).  Each tile
    becomes an independent sorted deduplicated run — exactly the reference's
    per-thread buffer design (`kmer_splitter.hpp:75-120`: pdqsort + dedup per
    buffer, merge later); `merge_counts` sums duplicate k-mers across runs.

    With use_pallas=True the extraction runs as the fused Pallas VMEM kernel
    (ops/pallas_kernels.py); requires a TPU backend.

    Returns (sorted (T, tile, W) uint32, starts (T, tile) bool,
    n_valid (T,) int32 count of non-sentinel rows per tile).
    """
    if use_pallas:
        from .pallas_kernels import canonical_windows_planar

        canon_planar, _ = canonical_windows_planar(codes, lengths, n_mask, k)
        W = canon_planar.shape[0]
        planes = [canon_planar[w].reshape(-1) for w in range(W)]
    else:
        canon, _ = K.canonical_windows(codes, lengths, n_mask, k)
        W = canon.shape[-1]
        flat = canon.reshape(-1, W)
        planes = [flat[:, w] for w in range(W)]
    n = planes[0].shape[0]
    pad = (-n) % tile
    if pad:
        planes = [jnp.pad(p, (0, pad), constant_values=K.SENTINEL32) for p in planes]
    nt = (n + pad) // tile
    ops = tuple(p.reshape(nt, tile) for p in planes)
    out = jax.lax.sort(ops, num_keys=W, dimension=1)
    swords = jnp.stack(out, axis=-1)
    neq = jnp.any(swords[:, 1:] != swords[:, :-1], axis=-1)
    starts = jnp.concatenate([jnp.ones((nt, 1), bool), neq], axis=1)
    n_valid = jnp.sum(jnp.any(swords != K.SENTINEL32, axis=-1), axis=1).astype(jnp.int32)
    return swords, starts, n_valid


@functools.partial(jax.jit, static_argnames=("L",))
def unpack_batch_device(packed_codes, packed_nmask, L: int):
    """Device-side unpack of ReadBatch.packed() wire format.

    packed_codes (R, ceil(L/4)) uint8 -> codes (R, L) uint8 in {0..3};
    packed_nmask (R, ceil(L/8)) uint8 (little bit order) -> n_mask (R, L)."""
    R = packed_codes.shape[0]
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    codes = (packed_codes[:, :, None] >> shifts[None, None, :]) & 3
    codes = codes.reshape(R, -1)[:, :L]
    bits = jnp.arange(8, dtype=jnp.uint8)
    nm = (packed_nmask[:, :, None] >> bits[None, None, :]) & 1
    n_mask = nm.reshape(R, -1)[:, :L].astype(bool)
    return codes, n_mask


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def count_batch_device_unique(codes, lengths, n_mask, k: int, use_pallas: bool = False):
    """Full on-device counting of one batch: sort -> run-length count ->
    compact uniques to the front.

    Unlike `count_batch_device_tiled`, the ENTIRE dedup happens on device, so
    the host only pulls `n_unique` rows (~total/coverage) instead of every
    k-mer — the right split when the host is much slower than the chip (the
    reference's analogous trade is flushing deduplicated buffers instead of
    raw k-mers, `kmer_splitter.hpp:75-120`).

    Returns (words (N, W) uint32 with unique rows in the first n_unique
    positions, counts (N,) int32 aligned to words, n_unique () int32)."""
    if use_pallas:
        from .pallas_kernels import canonical_windows_planar

        canon_planar, _ = canonical_windows_planar(codes, lengths, n_mask, k)
        W = canon_planar.shape[0]
        planes = [canon_planar[w].reshape(-1) for w in range(W)]
    else:
        canon, _ = K.canonical_windows(codes, lengths, n_mask, k)
        W = canon.shape[-1]
        flat = canon.reshape(-1, W)
        planes = [flat[:, w] for w in range(W)]
    n = planes[0].shape[0]
    swords = jax.lax.sort(tuple(planes), num_keys=W)
    stacked = jnp.stack(swords, axis=-1)
    boundary = run_starts(stacked)              # includes the sentinel run
    valid = jnp.any(stacked != K.SENTINEL32, axis=-1)
    starts = boundary & valid
    # run length at each start row = (next boundary position) - (own position),
    # via a reversed cumulative-min scan — log-depth, no scatter
    pos = jnp.arange(n, dtype=jnp.int32)
    bpos = jnp.where(boundary, pos, jnp.int32(n))
    # next_boundary[i] = min boundary position at index > i (n if none)
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(bpos)))
    next_boundary = jnp.concatenate([suffix_min[1:], jnp.full((1,), n, jnp.int32)])
    row_counts = jnp.where(starts, next_boundary - pos, 0)
    # one stable 1-key sort compacts unique rows (flag 0) to the front,
    # preserving lexicographic order and carrying words + counts as values
    flag = jnp.where(starts, jnp.uint8(0), jnp.uint8(1))
    out = jax.lax.sort(
        (flag,) + swords + (row_counts,), num_keys=1, is_stable=True
    )
    unique_words = jnp.stack(out[1 : 1 + W], axis=-1)
    unique_counts = out[1 + W]
    n_unique = jnp.sum(starts.astype(jnp.int32))
    return unique_words, unique_counts, n_unique


@functools.partial(jax.jit, static_argnames=("L", "k", "use_pallas"))
def count_batch_packed_unique(packed_codes, packed_nmask, lengths, L: int,
                              k: int, use_pallas: bool = False):
    """Single-dispatch packed-wire counting: unpack + count on device."""
    codes, n_mask = unpack_batch_device(packed_codes, packed_nmask, L)
    return count_batch_device_unique(codes, lengths, n_mask, k, use_pallas=use_pallas)


# ---------------------------------------------------------------------------
# Device-resident run accumulation: per-batch unique runs stay in HBM and are
# merged ON DEVICE; the host pulls ONE final table per k.  This replaces the
# per-batch device->host pull + host loser-tree merge (the dominant cost when
# the device link is a high-latency tunnel) — the TPU analog of the reference
# keeping buckets on local disk and merging them once at the end of counting
# (`kmer_index_builder.hpp:306-430`).
# ---------------------------------------------------------------------------


def _pow2ceil(n: int, floor: int = 4096) -> int:
    """Smallest power of two >= max(n, floor) — quantizes run capacities so
    the merge/compact programs hit a bounded set of shapes (stable compiles)."""
    n = max(int(n), floor)
    return 1 << (n - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_run_device(words, counts, nu, cap: int):
    """Canonicalize a device run to capacity `cap`: rows [0, nu) keep their
    (sorted unique) words/counts, rows [nu, cap) become sentinel/zero.

    Input rows beyond `cap` are dropped (callers guarantee nu <= cap); inputs
    shorter than `cap` are sentinel-padded."""
    n = words.shape[0]
    W = words.shape[1]
    if cap <= n:
        w, c = words[:cap], counts[:cap]
    else:
        w = jnp.pad(words, ((0, cap - n), (0, 0)), constant_values=K.SENTINEL32)
        c = jnp.pad(counts, (0, cap - n))
    keep = jnp.arange(cap, dtype=jnp.int32) < nu
    w = jnp.where(keep[:, None], w, jnp.uint32(K.SENTINEL32))
    c = jnp.where(keep, c, 0)
    return w, c


@jax.jit
def _merge_runs_device(w1, c1, w2, c2):
    """Merge two canonical device runs (sorted unique + sentinel tail) into
    one: concat -> multiword sort -> per-run count sum -> compact uniques to
    the front (sentinel tail).  Returns (words, counts, n_unique)."""
    W = w1.shape[1]
    planes = tuple(jnp.concatenate([w1[:, i], w2[:, i]]) for i in range(W))
    cnt = jnp.concatenate([c1, c2])
    out = jax.lax.sort(planes + (cnt,), num_keys=W)
    stacked = jnp.stack(out[:W], axis=-1)
    cnt = out[W]
    n = stacked.shape[0]
    boundary = run_starts(stacked)
    valid = jnp.any(stacked != K.SENTINEL32, axis=-1)
    starts = boundary & valid
    pos = jnp.arange(n, dtype=jnp.int32)
    bpos = jnp.where(boundary, pos, jnp.int32(n))
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(bpos)))
    next_boundary = jnp.concatenate([suffix_min[1:], jnp.full((1,), n, jnp.int32)])
    csum = jnp.cumsum(cnt)
    prev = jnp.where(pos > 0, csum[jnp.maximum(pos - 1, 0)], 0)
    run_sum = csum[jnp.maximum(next_boundary - 1, 0)] - prev
    row_counts = jnp.where(starts, run_sum, 0)
    flag = jnp.where(starts, jnp.uint8(0), jnp.uint8(1))
    out2 = jax.lax.sort((flag,) + out[:W] + (row_counts,), num_keys=1, is_stable=True)
    uw = jnp.stack(out2[1 : 1 + W], axis=-1)
    uc = out2[1 + W]
    nu = jnp.sum(starts.astype(jnp.int32))
    keep = pos < nu
    uw = jnp.where(keep[:, None], uw, jnp.uint32(K.SENTINEL32))
    uc = jnp.where(keep, uc, 0)
    return uw, uc, nu


def _oom_retry(fn, attempts: int = 3):
    """Run fn; on a backend ResourceExhausted, give queued frees a moment to
    land (the tunnelled backend releases buffers asynchronously) and retry."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" not in str(exc) or i == attempts - 1:
                raise
            import gc
            import time as _t

            gc.collect()
            _t.sleep(1.0 + i)
    raise RuntimeError("unreachable")


class DeviceRunStack:
    """LSM-style stack of device-resident sorted unique runs.

    `push` adds one batch's counted run; equal-capacity neighbours merge
    eagerly (binary-counter discipline), so at most one run per pow2 level is
    live and total HBM stays O(final unique).  `finish` merges the remainder
    and returns ONE host KmerCounts — the only bulk device->host transfer.
    """

    def __init__(self, k: int, timings: dict | None = None):
        self.k = k
        self.tm = timings if timings is not None else {}
        self.stack: list[list] = []  # [words, counts, cap, nu]

    def _compact(self, w, c, nu: int):
        cap = _pow2ceil(nu)
        w, c = _compact_run_device(w, c, jnp.int32(nu), cap=cap)
        return [w, c, cap, nu]

    def push(self, words, counts, nu: int) -> None:
        import time

        if nu <= 0:
            return
        t0 = time.perf_counter()
        self.stack.append(self._compact(words, counts, nu))
        while len(self.stack) >= 2 and self.stack[-1][2] == self.stack[-2][2]:
            w2, c2, _, _ = self.stack.pop()
            w1, c1, _, _ = self.stack.pop()
            mw, mc, mnu = _oom_retry(lambda: _merge_runs_device(w1, c1, w2, c2))
            self.stack.append(self._compact(mw, mc, int(mnu)))
        self.tm["merge_s"] = self.tm.get("merge_s", 0.0) + time.perf_counter() - t0

    def finish(self) -> KmerCounts:
        import time

        W = K.kmer_words(self.k)
        if not self.stack:
            return KmerCounts(k=self.k, words=np.zeros((0, W), np.uint32),
                              counts=np.zeros(0, np.int64))
        t0 = time.perf_counter()
        while len(self.stack) >= 2:
            w2, c2, _, _ = self.stack.pop()
            w1, c1, _, _ = self.stack.pop()
            mw, mc, mnu = _oom_retry(lambda: _merge_runs_device(w1, c1, w2, c2))
            self.stack.append(self._compact(mw, mc, int(mnu)))
        self.tm["merge_s"] = self.tm.get("merge_s", 0.0) + time.perf_counter() - t0
        w, c, cap, nu = self.stack.pop()
        t0 = time.perf_counter()
        # counts cross the tunnel as uint16 when they fit (the common case:
        # multiplicities ~ coverage) — 2 bytes/row instead of 4
        cmax = int(_oom_retry(lambda: c.max()))
        if cmax < 0xFFFF:
            c = c.astype(jnp.uint16)
        # Chunked pull: fixed pow2 chunk shapes keep the XLA slice programs
        # cacheable (a data-dependent w[:nu] slice would compile per value);
        # at most one chunk of overhang crosses the link beyond nu rows.
        CH = 1 << 21
        if cap <= CH:
            words = _oom_retry(lambda: np.asarray(w))[:nu]
            counts = _oom_retry(lambda: np.asarray(c))[:nu].astype(np.int64)
        else:
            nch = (nu + CH - 1) // CH
            words = np.concatenate(
                [_oom_retry(lambda i=i: np.asarray(w[i * CH : (i + 1) * CH]))
                 for i in range(nch)], axis=0
            )[:nu]
            counts = np.concatenate(
                [_oom_retry(lambda i=i: np.asarray(c[i * CH : (i + 1) * CH]))
                 for i in range(nch)], axis=0
            )[:nu].astype(np.int64)
        self.tm["pull_s"] = self.tm.get("pull_s", 0.0) + time.perf_counter() - t0
        return KmerCounts(k=self.k, words=words, counts=counts)


@dataclass
class KmerCounts:
    """Sorted unique canonical k-mers with multiplicities (host arrays)."""

    k: int
    words: np.ndarray  # (U, W) uint32, lexicographically sorted
    counts: np.ndarray  # (U,) int64

    @property
    def num_unique(self) -> int:
        return int(self.words.shape[0])

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def merge(self, other: "KmerCounts") -> "KmerCounts":
        assert self.k == other.k
        return merge_counts([self, other])


def _compact_run(swords: np.ndarray, starts: np.ndarray, n_valid: int) -> tuple[np.ndarray, np.ndarray]:
    """Host compaction of a sorted run: unique rows + counts (valid prefix only)."""
    swords = np.asarray(swords)[:n_valid]
    starts = np.asarray(starts)[:n_valid]
    idx = np.flatnonzero(starts)
    counts = np.diff(np.append(idx, n_valid)).astype(np.int64)
    return swords[idx], counts


def _lexsort_rows(words: np.ndarray) -> np.ndarray:
    """np.lexsort over word columns (word 0 most significant)."""
    return np.lexsort(tuple(words[:, w] for w in range(words.shape[1] - 1, -1, -1)))


def count_batch_host(
    codes: np.ndarray, lengths: np.ndarray, n_mask: np.ndarray, k: int
) -> KmerCounts:
    """Host (numpy) counting of one batch: canonical windows -> sorted
    unique rows with counts.

    Small batches (prev-K contigs, tool inputs) are counted here so they do
    not cost an XLA compile for their one-off shapes: in this environment
    programs compile through a shared remote service with minutes-scale
    latency, which dwarfs any device-side win on a few Mkmers (the reference
    analogously special-cases small inputs onto the plain sorting splitter,
    `kmer_splitters.hpp:139`)."""
    R, L = codes.shape
    W = K.kmer_words(k)
    if R == 0 or L < k:
        return KmerCounts(k=k, words=np.zeros((0, W), np.uint32),
                          counts=np.zeros(0, np.int64))
    P = L - k + 1
    win = np.lib.stride_tricks.sliding_window_view(
        np.ascontiguousarray(codes), k, axis=1
    ).reshape(-1, k)
    pos = np.tile(np.arange(P), R)
    row = np.repeat(np.arange(R), P)
    bad = np.lib.stride_tricks.sliding_window_view(
        np.ascontiguousarray(n_mask), k, axis=1
    ).any(axis=2).reshape(-1)
    valid = (pos + k <= lengths[row]) & ~bad
    if not valid.any():
        return KmerCounts(k=k, words=np.zeros((0, W), np.uint32),
                          counts=np.zeros(0, np.int64))
    fwd = K.pack(win[valid])
    rc = K.revcomp_words(fwd, k)
    use_rc = K.lex_less(rc, fwd)
    use_rc = np.asarray(use_rc)
    canon = np.where(use_rc[:, None], rc, fwd)
    order = _lexsort_rows(canon)
    s = canon[order]
    new = np.empty(len(s), bool)
    new[0] = True
    new[1:] = np.any(s[1:] != s[:-1], axis=1)
    counts = np.diff(np.append(np.flatnonzero(new), len(s)))
    return KmerCounts(k=k, words=s[new].copy(), counts=counts.astype(np.int64))


def merge_counts(runs: list[KmerCounts]) -> KmerCounts:
    """Merge sorted unique runs (host) — the loser-tree bucket merge.

    Native C++ loser tree when available (`native/merge.cpp`, mirroring
    `kmer_index_builder.hpp:346` MergeKMers); numpy lexsort fallback.
    """
    if not runs:
        raise ValueError("no runs to merge")
    k0 = runs[0].k
    runs = [r for r in runs if r.num_unique > 0]
    if not runs:
        W = K.kmer_words(k0)
        return KmerCounts(k=k0, words=np.zeros((0, W), np.uint32), counts=np.zeros((0,), np.int64))
    if len(runs) == 1:
        return runs[0]
    k = runs[0].k
    words = np.concatenate([r.words for r in runs], axis=0)
    counts = np.concatenate([r.counts for r in runs], axis=0)

    from ..native import merge_runs_native

    run_off = np.zeros(len(runs) + 1, np.uint64)
    np.cumsum([r.num_unique for r in runs], out=run_off[1:])
    merged = merge_runs_native(words, counts, run_off)
    if merged is not None:
        return KmerCounts(k=k, words=merged[0], counts=merged[1])

    order = _lexsort_rows(words)
    words, counts = words[order], counts[order]
    new = np.concatenate([[True], np.any(words[1:] != words[:-1], axis=1)])
    seg = np.cumsum(new) - 1
    out_counts = np.zeros(seg[-1] + 1, np.int64)
    np.add.at(out_counts, seg, counts)
    return KmerCounts(k=k, words=words[new], counts=out_counts)


def count_reads(batches, k: int, tile: int = 512,
                timings: dict | None = None,
                structure_batches=None) -> KmerCounts:
    """Count canonical k-mers over an iterable of ReadBatches.

    Each batch is fully counted ON DEVICE (`count_batch_device_unique`:
    global sort + run-length + compaction) and its sorted unique run STAYS
    on device; runs merge in HBM through a `DeviceRunStack` and the host
    pulls one final merged table per k.  This is the reference's
    buffer-flush/bucket-merge split (`kmer_index_builder.hpp:306-430`) with
    per-thread buffers replaced by device batches and the disk-bucket merge
    replaced by an in-HBM LSM merge — the right split when the host link is
    a high-latency tunnel (round-4 profile: 31 per-batch pulls + host merge
    cost 216s/K vs 22s of device time).

    timings: optional dict accumulating the per-phase wall-time account the
    reference keeps via TIME_TRACE_SCOPE (`kmer_index_builder.hpp:309,318`):
    device_s (dispatch+sync of the counting program), device_first_s (the
    first dispatch, which carries the XLA compile when the persistent cache
    is cold), pull_s (final device->host transfer), merge_s (device run
    merging), host_s (numpy small-batch path), n_batches.
    """
    import os
    import time

    from .pallas_kernels import supports_pallas

    use_pallas = supports_pallas()
    tm = timings if timings is not None else {}
    tm.setdefault("device_s", 0.0)
    tm.setdefault("device_first_s", 0.0)
    tm.setdefault("pull_s", 0.0)
    tm.setdefault("merge_s", 0.0)
    tm.setdefault("host_s", 0.0)
    tm.setdefault("n_batches", 0)
    first_device = True
    # batches below this window count go to the host counter: an XLA compile
    # for a one-off small shape costs far more than counting a few Mkmers in
    # numpy (see count_batch_host)
    host_thresh = int(os.environ.get("SPADES_HOST_COUNT_WINDOWS", 4_000_000))
    from ..core.reads import PackedChunk

    host_runs: list[KmerCounts] = []
    dstack = DeviceRunStack(k, timings=tm)

    def _process(iterable, zero_counts: bool) -> None:
        """Count batches into the shared device stack / host-run list.

        zero_counts=True is the structure-only stream (prev-K / trusted
        contigs, stages/construction.cpp:110,233): their k-mers join the
        merged table but contribute NOTHING to coverage — zeroed counts make
        the single fused merge produce exactly the reads-only coverage with
        structure rows at 0."""
        nonlocal first_device
        for b in iterable:
            if isinstance(b, PackedChunk):
                # run-wide read store: wire arrays already on device
                # (uploaded once for the whole multi-K run)
                if b.L < k or b.n == 0:
                    continue
                if b.n * (b.L - k + 1) < host_thresh:
                    t0 = time.perf_counter()
                    hb = b.unpack_host()
                    r = count_batch_host(
                        hb.codes[: b.n], hb.lengths[: b.n], hb.n_mask[: b.n], k
                    )
                    tm["host_s"] += time.perf_counter() - t0
                    if r.num_unique:
                        if zero_counts:
                            r = KmerCounts(k=r.k, words=r.words,
                                           counts=np.zeros_like(r.counts))
                        host_runs.append(r)
                    continue
                t0 = time.perf_counter()
                pc, pn, lengths = b.device()
                uw, uc, nu = count_batch_packed_unique(
                    pc, pn, lengths, b.L, k, use_pallas=use_pallas
                )
                nu = int(nu)
                dt = time.perf_counter() - t0
            elif isinstance(b, ReadBatch):
                if b.codes.shape[0] == 0 or b.codes.shape[1] < k:
                    continue
                R, L = b.codes.shape
                if R * (L - k + 1) < host_thresh:
                    t0 = time.perf_counter()
                    r = count_batch_host(b.codes, b.lengths, b.n_mask, k)
                    tm["host_s"] += time.perf_counter() - t0
                    if r.num_unique:
                        if zero_counts:
                            r = KmerCounts(k=r.k, words=r.words,
                                           counts=np.zeros_like(r.counts))
                        host_runs.append(r)
                    continue
                # packed wire: ~7x fewer bytes over the host->device link
                t0 = time.perf_counter()
                pc, pn, lengths, L = b.packed()
                uw, uc, nu = count_batch_packed_unique(
                    pc, pn, lengths, L, k, use_pallas=use_pallas
                )
                nu = int(nu)
                dt = time.perf_counter() - t0
            else:
                codes, lengths, n_mask = b
                if codes.shape[0] == 0 or codes.shape[1] < k:
                    continue
                t0 = time.perf_counter()
                uw, uc, nu = count_batch_device_unique(
                    codes, lengths, n_mask, k, use_pallas=use_pallas
                )
                nu = int(nu)
                dt = time.perf_counter() - t0
            tm["device_s"] += dt
            if first_device:
                tm["device_first_s"] = dt
                first_device = False
            tm["n_batches"] += 1
            if nu == 0:
                continue
            dstack.push(uw, uc * 0 if zero_counts else uc, nu)

    _process(batches, zero_counts=False)
    if structure_batches is not None:
        _process(structure_batches, zero_counts=True)
    runs = host_runs
    if dstack.stack:
        runs = runs + [dstack.finish()]
    if not runs:
        W = K.kmer_words(k)
        return KmerCounts(k=k, words=np.zeros((0, W), np.uint32), counts=np.zeros((0,), np.int64))
    t0 = time.perf_counter()
    out = merge_counts(runs)
    tm["merge_s"] += time.perf_counter() - t0
    return out


def count_sequences(seqs, k: int, batch_size: int = 65536,
                    timings: dict | None = None) -> KmerCounts:
    """Convenience: count canonical k-mers of a list of sequences.

    Long sequences are chopped into window-preserving chunks first so a
    single long contig cannot blow up the padded batch shape."""
    from ..core.reads import batch_iter, chop_sequences

    return count_reads(batch_iter(chop_sequences(seqs, k), batch_size=batch_size), k,
                       timings=timings)


def _rows_u64(rows: np.ndarray, w0: int, w1: int) -> np.ndarray:
    """Words [w0, w1) of packed rows as one lexicographic uint64 key
    (missing words padded with zero, matching lexicographic order of
    zero-padded rows)."""
    hi = rows[:, w0].astype(np.uint64) << np.uint64(32)
    if w1 - w0 > 1 and rows.shape[1] > w0 + 1:
        hi |= rows[:, w0 + 1].astype(np.uint64)
    return hi


def searchsorted_rows(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Host-side lookup of packed k-mer rows in a sorted unique array.

    Returns index into haystack, or -1 where absent.  This is the index role of
    the reference's MPHF `KMerIndex` (`kmer_mph/kmer_index.hpp:29`): sorted
    arrays + binary search give a dense kmer->idx map without a BBHash build.

    Rows up to 2 words search as one native uint64 key; rows up to 4 words
    use a two-level search (uint64 prefix blocks, then a bounded scan over
    the uint64 suffix within each block) — ~10x faster than the void-dtype
    memcmp searchsorted on the 2-vCPU host.  Wider rows keep the void path.
    """
    if haystack.shape[0] == 0:
        return np.full(needles.shape[0], -1, np.int64)
    if needles.shape[0] == 0:
        return np.zeros(0, np.int64)
    W = haystack.shape[1]
    if W <= 2:
        h = _rows_u64(haystack, 0, 2)
        n = _rows_u64(needles, 0, 2)
        pos = np.searchsorted(h, n)
        pos_c = np.minimum(pos, len(h) - 1)
        return np.where(h[pos_c] == n, pos_c, -1)
    if W <= 4:
        h1 = _rows_u64(haystack, 0, 2)
        h2 = _rows_u64(haystack, 2, 4)
        n1 = _rows_u64(needles, 0, 2)
        n2 = _rows_u64(needles, 2, 4)
        H = len(h1)
        lo = np.searchsorted(h1, n1, side="left")
        out = np.full(len(n1), -1, np.int64)
        cand = np.minimum(lo, H - 1)
        pending = h1[cand] == n1          # prefix present at all
        j = 0
        while pending.any() and j < 256:
            cand = lo + j
            c = np.minimum(cand, H - 1)
            still = pending & (cand < H) & (h1[c] == n1)
            hit = still & (h2[c] == n2)
            out[hit] = cand[hit]
            pending = still & ~hit
            j += 1
        if pending.any():                 # adversarially long prefix blocks
            rem = np.flatnonzero(pending)
            hb = np.ascontiguousarray(haystack.astype(">u4")).view(f"V{4*W}").ravel()
            nb = np.ascontiguousarray(needles[rem].astype(">u4")).view(f"V{4*W}").ravel()
            pos = np.searchsorted(hb, nb)
            pc = np.minimum(pos, len(hb) - 1)
            out[rem] = np.where(hb[pc] == nb, pc, -1)
        return out
    hb = np.ascontiguousarray(haystack.astype(">u4")).view(f"V{4*W}").ravel()
    nb = np.ascontiguousarray(needles.astype(">u4")).view(f"V{4*W}").ravel()
    pos = np.searchsorted(hb, nb)
    pos_c = np.minimum(pos, len(hb) - 1)
    found = hb[pos_c] == nb
    return np.where(found, pos_c, -1)
