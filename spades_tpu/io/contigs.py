"""Contig extraction and FASTA naming.

Naming follows the reference contract
(`/root/reference/src/common/io/reads/header_naming.hpp:15-24`):
`NODE_<n>_length_<len>_cov_<cov>` with contigs ordered by decreasing length.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import dna
from ..graph.graph import CondensedGraph
from .fastx import write_fasta


@dataclass
class Contig:
    name: str
    seq: str
    coverage: float
    edge_id: int


def extract_contigs(g: CondensedGraph, min_length: int = 0) -> list[Contig]:
    """One contig per conjugate edge pair, ordered by decreasing length."""
    ids = g.canonical_edge_ids()
    cov = g.coverage()
    order = sorted(ids, key=lambda e: (-int(g.e_len[e]), int(e)))
    contigs = []
    n = 0
    for e in order:
        L = int(g.e_len[e])
        if L < min_length:
            continue
        n += 1
        c = float(cov[e])
        contigs.append(
            Contig(
                name=f"NODE_{n}_length_{L}_cov_{c:.6f}",
                seq=g.edge_seq(int(e)),
                coverage=c,
                edge_id=int(e),
            )
        )
    return contigs


def write_contigs(path: str, contigs: list[Contig]) -> None:
    write_fasta(path, [(c.name, c.seq) for c in contigs])
