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


def merge_counts(runs: list[KmerCounts]) -> KmerCounts:
    """Merge sorted unique runs (host) — replaces the loser-tree bucket merge."""
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
    order = _lexsort_rows(words)
    words, counts = words[order], counts[order]
    new = np.concatenate([[True], np.any(words[1:] != words[:-1], axis=1)])
    seg = np.cumsum(new) - 1
    out_counts = np.zeros(seg[-1] + 1, np.int64)
    np.add.at(out_counts, seg, counts)
    return KmerCounts(k=k, words=words[new], counts=out_counts)


def count_reads(batches, k: int) -> KmerCounts:
    """Count canonical k-mers over an iterable of ReadBatches."""
    runs: list[KmerCounts] = []
    for b in batches:
        if isinstance(b, ReadBatch):
            codes, lengths, n_mask = b.codes, b.lengths, b.n_mask
        else:
            codes, lengths, n_mask = b
        if codes.shape[0] == 0 or codes.shape[1] < k:
            continue
        swords, starts, n_valid = count_batch_device(codes, lengths, n_mask, k)
        uw, uc = _compact_run(
            np.asarray(swords), np.asarray(starts), int(n_valid)
        )
        runs.append(KmerCounts(k=k, words=uw, counts=uc))
    if not runs:
        W = K.kmer_words(k)
        return KmerCounts(k=k, words=np.zeros((0, W), np.uint32), counts=np.zeros((0,), np.int64))
    return merge_counts(runs)


def count_sequences(seqs, k: int, batch_size: int = 65536) -> KmerCounts:
    """Convenience: count canonical k-mers of a list of sequences."""
    from ..core.reads import batch_iter

    return count_reads(batch_iter(seqs, batch_size=batch_size), k)


def searchsorted_rows(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Host-side lookup of packed k-mer rows in a sorted unique array.

    Returns index into haystack, or -1 where absent.  This is the index role of
    the reference's MPHF `KMerIndex` (`kmer_mph/kmer_index.hpp:29`): sorted
    arrays + binary search give a dense kmer->idx map without a BBHash build.
    """
    if haystack.shape[0] == 0:
        return np.full(needles.shape[0], -1, np.int64)
    W = haystack.shape[1]
    # Pack rows into void dtype for row-wise searchsorted (big-endian bytes
    # preserve lexicographic order).
    hb = np.ascontiguousarray(haystack.astype(">u4")).view(f"V{4*W}").ravel()
    nb = np.ascontiguousarray(needles.astype(">u4")).view(f"V{4*W}").ravel()
    pos = np.searchsorted(hb, nb)
    pos_c = np.minimum(pos, len(hb) - 1)
    found = hb[pos_c] == nb
    return np.where(found, pos_c, -1)
