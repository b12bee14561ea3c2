"""FASTA/FASTQ readers and writers (host side).

Covers the reference's read-parsing surface (`/root/reference/src/common/io/
reads/file_reader.hpp`, kseq-based FASTA/FASTQ with gzip) with a compact
Python/NumPy implementation; a native C++ parser slots in behind the same API
for throughput (see spades_tpu/native).
"""
from __future__ import annotations

import gzip
import io as _io
import os
from dataclasses import dataclass
from typing import Iterable, Iterator


@dataclass
class FastxRecord:
    name: str
    seq: str
    qual: str | None = None


def _open_text(path: str):
    if str(path).endswith(".gz"):
        return _io.TextIOWrapper(gzip.open(path, "rb"))
    if str(path).endswith(".bz2"):
        import bz2

        return _io.TextIOWrapper(bz2.open(path, "rb"))
    return open(path, "rt")


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Parse FASTA or FASTQ (optionally gzipped), auto-detected."""
    with _open_text(path) as fh:
        first = fh.read(1)
        if not first:
            return
        if first == ">":
            yield from _read_fasta(fh)
        elif first == "@":
            yield from _read_fastq(fh)
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def _read_fasta(fh) -> Iterator[FastxRecord]:
    # fh positioned just after the first '>'
    name = fh.readline().strip()
    chunks: list[str] = []
    for line in fh:
        if line.startswith(">"):
            yield FastxRecord(name=name, seq="".join(chunks))
            name = line[1:].strip()
            chunks = []
        else:
            chunks.append(line.strip())
    yield FastxRecord(name=name, seq="".join(chunks))


def _read_fastq(fh) -> Iterator[FastxRecord]:
    # fh positioned just after the first '@'
    name = fh.readline().strip()
    while True:
        seq = fh.readline().strip()
        plus = fh.readline()
        qual = fh.readline().strip()
        if not plus:
            raise ValueError("truncated FASTQ record")
        yield FastxRecord(name=name, seq=seq, qual=qual)
        nxt = fh.readline()
        if not nxt:
            return
        if not nxt.startswith("@"):
            raise ValueError("malformed FASTQ record header")
        name = nxt[1:].strip()


def read_sequences(paths: str | Iterable[str]) -> Iterator[str]:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    for p in paths:
        for rec in read_fastx(p):
            yield rec.seq


def write_fasta(path: str, records: Iterable[tuple[str, str]], width: int = 60) -> None:
    """Write (name, seq) pairs as wrapped FASTA (reference wraps at 60 cols)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")
