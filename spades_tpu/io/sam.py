"""Minimal SAM read/write support.

Capability mirror of the reference's SAM surface
(`/root/reference/src/common/io/sam/` sam_reader/sam_parser, used by the
post-assembly corrector to consume BWA-MEM alignments,
`projects/corrector/dataset_processor.cpp`): parse alignment records with
enough fidelity for per-position variant counting (QNAME/FLAG/RNAME/POS/
MAPQ/CIGAR/SEQ), and write mappings produced by our own mapper as SAM so
downstream tools can consume them.
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


@dataclass
class SamRecord:
    qname: str
    flag: int
    rname: str
    pos: int        # 1-based leftmost mapping position (0 if unmapped)
    mapq: int
    cigar: str
    seq: str
    tags: dict

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & 0x4)

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & 0x10)

    def cigar_ops(self) -> list[tuple[int, str]]:
        return [(int(n), op) for n, op in _CIGAR_RE.findall(self.cigar)]

    def aligned_pairs(self) -> list[tuple[int, int]]:
        """(read_pos, ref_pos) for every aligned (M/=/X) base — the walk the
        corrector's per-position counter performs."""
        out = []
        rp = 0
        gp = self.pos - 1
        for n, op in self.cigar_ops():
            if op in "M=X":
                out.extend((rp + i, gp + i) for i in range(n))
                rp += n
                gp += n
            elif op in "IS":
                rp += n
            elif op in "DN":
                gp += n
        return out


def read_sam(path: str) -> Iterator[SamRecord]:
    """Iterate alignment records; header lines are skipped."""
    with open(path) as fh:
        for line in fh:
            if line.startswith("@") or not line.strip():
                continue
            f = line.rstrip("\n").split("\t")
            if len(f) < 11:
                continue
            tags = {}
            for tag in f[11:]:
                parts = tag.split(":", 2)
                if len(parts) == 3:
                    tags[parts[0]] = parts[2]
            yield SamRecord(
                qname=f[0], flag=int(f[1]), rname=f[2], pos=int(f[3]),
                mapq=int(f[4]), cigar=f[5], seq=f[9], tags=tags,
            )


def write_sam(path: str, references: list[tuple[str, int]], records: list[SamRecord]) -> None:
    """Write a SAM file with @HD/@SQ headers and the given records."""
    with open(path, "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:unknown\n")
        for name, length in references:
            fh.write(f"@SQ\tSN:{name}\tLN:{length}\n")
        for r in records:
            tags = "".join(
                f"\t{k}:{'i' if isinstance(v, int) else 'Z'}:{v}" for k, v in r.tags.items()
            )
            fh.write(
                f"{r.qname}\t{r.flag}\t{r.rname}\t{r.pos}\t{r.mapq}\t"
                f"{r.cigar}\t*\t0\t0\t{r.seq}\t*{tags}\n"
            )


def mappings_to_sam(
    path: str, g, names: list[str], seqs: list[str], mappings
) -> int:
    """Dump our mapper's dominant-anchor mappings (`alignment.mapper
    .ReadMapping`) as ungapped SAM records against edge references."""
    refs = [(str(int(e)), int(g.e_len[e])) for e in g.canonical_edge_ids()]
    records = []
    n = 0
    for name, seq, m in zip(names, seqs, mappings):
        if m is None:
            records.append(SamRecord(name, 4, "*", 0, 0, "*", seq, {}))
            continue
        e = m.edge
        conj = int(g.e_conj[e])
        # canonical reference is min(e, conj); reverse-strand hit flags 0x10
        if e <= conj:
            rname, flag = str(e), 0
            pos = m.start_offset + 1
        else:
            rname, flag = str(conj), 16
            pos = int(g.e_len[conj]) - (m.start_offset + len(seq)) + 1
        clip_left = max(0, 1 - pos)
        pos = max(pos, 1)
        aligned = min(len(seq) - clip_left, int(g.e_len[int(rname)]) - (pos - 1))
        if aligned <= 0:
            records.append(SamRecord(name, 4, "*", 0, 0, "*", seq, {}))
            continue
        cigar = ""
        if clip_left:
            cigar += f"{clip_left}S"
        cigar += f"{aligned}M"
        rest = len(seq) - clip_left - aligned
        if rest > 0:
            cigar += f"{rest}S"
        records.append(
            SamRecord(name, flag, rname, pos, 60, cigar, seq, {"NH": 1})
        )
        n += 1
    write_sam(path, refs, records)
    return n
