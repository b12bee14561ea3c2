"""SPAdes-compatible binary k-mer records (`final_kmers` format).

Format contract from the reference (`/root/reference/docs/standalone.md:5-27`):
k-mers written sequentially, 2 bits per nucleotide (00=A 01=C 10=G 11=T),
base i occupying bits [2i, 2i+1] of a little-endian bit stream, each record
padded to a 64-bit boundary (k=21 -> 8 bytes, k=33/55 -> 16 bytes).
"""
from __future__ import annotations

import numpy as np

from ..core import kmers as K


def record_words64(k: int) -> int:
    return (2 * k + 63) // 64


def to_binary_records(words: np.ndarray, k: int) -> np.ndarray:
    """Packed big-endian (U, W) uint32 rows -> (U, record_words64) uint64."""
    codes = K.unpack(words, k)  # (U, k) uint8
    n = codes.shape[0]
    n64 = record_words64(k)
    out = np.zeros((n, n64), np.uint64)
    for j in range(k):
        w, sh = divmod(2 * j, 64)
        out[:, w] |= codes[:, j].astype(np.uint64) << np.uint64(sh)
    return out


def from_binary_records(recs: np.ndarray, k: int) -> np.ndarray:
    """(U, record_words64) uint64 -> packed big-endian (U, W) uint32 rows."""
    recs = np.asarray(recs, np.uint64)
    n = recs.shape[0]
    codes = np.zeros((n, k), np.uint8)
    for j in range(k):
        w, sh = divmod(2 * j, 64)
        codes[:, j] = ((recs[:, w] >> np.uint64(sh)) & np.uint64(3)).astype(np.uint8)
    return K.pack(codes)


def write_kmer_file(path: str, words: np.ndarray, k: int) -> None:
    recs = to_binary_records(words, k)
    with open(path, "wb") as fh:
        fh.write(recs.astype("<u8").tobytes())


def read_kmer_file(path: str, k: int) -> np.ndarray:
    n64 = record_words64(k)
    data = np.fromfile(path, dtype="<u8")
    if data.size % n64:
        raise ValueError(f"{path}: size not a multiple of {8*n64}-byte records")
    return from_binary_records(data.reshape(-1, n64), k)
