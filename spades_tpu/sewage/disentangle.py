"""Wastewater (sewage) lineage abundance estimation.

Capability mirror of the reference's WastewaterDisentangle stage
(`/root/reference/src/projects/spades/wastewater_disentangle.cpp:136-478`):
given an usher-style lineage barcode matrix (lineage x SNP, CSV with mutation
columns like `A123T`) and sequencing reads, map the reads onto the reference
genome, measure the alternative-allele frequency at every barcode position,
and solve for per-lineage abundances -> `lineages.csv`.

TPU-native: read mapping + allele counting reuse the framework's vote
machinery (alignment/mismatch.position_votes); the abundance solve is a
projected-gradient non-negative least squares on the small lineage matrix."""
from __future__ import annotations

import logging
import re
from dataclasses import dataclass

import numpy as np

from ..core import dna
from ..graph.graph import CondensedGraph

log = logging.getLogger("spades_tpu.sewage")

_MUT = re.compile(r"^([ACGT])(\d+)([ACGT])$")


@dataclass
class Barcodes:
    lineages: list[str]
    positions: np.ndarray   # (S,) 0-based reference positions
    ref_base: np.ndarray    # (S,) uint8 codes
    alt_base: np.ndarray    # (S,) uint8 codes
    matrix: np.ndarray      # (L, S) floats in [0, 1]


def read_barcodes_csv(path: str) -> Barcodes:
    """Parse the usher barcode CSV: header ,A123T,G456C,...; rows lineage,0,1..."""
    with open(path) as fh:
        header = fh.readline().strip().split(",")
        muts = header[1:]
        pos, ref, alt, keep = [], [], [], []
        for i, m in enumerate(muts):
            mm = _MUT.match(m.strip())
            if mm:
                keep.append(i)
                ref.append("ACGT".index(mm.group(1)))
                pos.append(int(mm.group(2)) - 1)  # CSV is 1-based
                alt.append("ACGT".index(mm.group(3)))
        lineages, rows = [], []
        for line in fh:
            t = line.strip().split(",")
            if len(t) < 2:
                continue
            lineages.append(t[0])
            vals = np.array([float(x) if x else 0.0 for x in t[1:]])
            rows.append(vals[keep])
    return Barcodes(
        lineages=lineages,
        positions=np.array(pos, np.int64),
        ref_base=np.array(ref, np.uint8),
        alt_base=np.array(alt, np.uint8),
        matrix=np.vstack(rows) if rows else np.zeros((0, len(pos))),
    )


def alt_frequencies(
    reference: str, reads: list[str], bc: Barcodes
) -> tuple[np.ndarray, np.ndarray]:
    """Map reads to the reference, return (alt_freq (S,), coverage (S,))."""
    from ..alignment.mismatch import position_votes

    g = CondensedGraph.from_sequences([reference], k=21)
    votes = position_votes(g, reads)
    e = int(g.canonical_edge_ids()[0])
    o = int(g.e_off[e])
    n = int(g.e_len[e])
    v = votes[o : o + n].astype(float)
    # orientation: from_sequences may store the reverse complement
    if g.edge_seq(e) != reference:
        v = v[::-1, ::-1]
    total = v.sum(axis=1)
    S = len(bc.positions)
    freq = np.zeros(S)
    cov = np.zeros(S)
    inb = bc.positions < n
    p = bc.positions[inb]
    cov[inb] = total[p]
    with np.errstate(invalid="ignore", divide="ignore"):
        f = v[p, bc.alt_base[inb]] / np.maximum(total[p], 1.0)
    freq[inb] = np.where(total[p] > 0, f, 0.0)
    return freq, cov


def nnls_abundances(
    matrix: np.ndarray, freq: np.ndarray, weights: np.ndarray, iters: int = 2000
) -> np.ndarray:
    """Weighted NNLS via projected gradient: min ||W(B^T x - f)||^2, x >= 0."""
    B = matrix.T * weights[:, None]        # (S, L)
    f = freq * weights
    L = matrix.shape[0]
    if L == 0:
        return np.zeros(0)
    x = np.full(L, 1.0 / L)
    lr = 1.0 / max(np.linalg.norm(B.T @ B, 2), 1e-9)
    for _ in range(iters):
        grad = B.T @ (B @ x - f)
        x = np.maximum(x - lr * grad, 0.0)
    return x


def estimate_abundances(
    reference: str, reads: list[str], bc: Barcodes, min_coverage: int = 3
) -> list[tuple[str, float]]:
    """Per-lineage abundance estimates, descending; drops ~zero lineages."""
    freq, cov = alt_frequencies(reference, reads, bc)
    weights = (cov >= min_coverage).astype(float)
    if weights.sum() == 0:
        log.warning("no barcode position has coverage >= %d", min_coverage)
        return []
    x = nnls_abundances(bc.matrix, freq, weights)
    total = x.sum()
    if total > 1.0:
        x = x / total
    out = [(l, float(a)) for l, a in zip(bc.lineages, x) if a > 1e-3]
    out.sort(key=lambda t: -t[1])
    return out
