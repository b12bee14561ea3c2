"""Strand-specific coverage tracking and edge splitting (stranded RNA).

Capability mirror of `/root/reference/src/common/alignment/rna/ss_coverage.hpp`
(SSCoverageStorage :18-66, SSCoverageSplitter :137-300),
`ss_coverage_filler.hpp` (SSCoverageFiller/SSBinCoverageFiller), and the
SSEdgeSplit stage (`/root/reference/src/common/stages/ss_edge_split.cpp`):
reads of a strand-specific library are mapped WITHOUT reverse-complement
following, oriented k-mer counts are accumulated per edge (optionally binned),
and an edge whose forward-strand coverage descends while its conjugate's
ascends — two transcripts meeting tail-to-tail — is split at the coverage
intersection point.

TPU-native: coverage is an (E,) array, bin fill is one np.add.at scatter over
(edge, bin) pairs from a batched mapping pass, and the per-edge split
detection is a vectorized scan over the bin matrix.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core import dna
from ..graph.graph import CondensedGraph
from .mapper import EdgeIndex, build_edge_index, map_read_batch

# rna_mode.info ss_coverage_splitter defaults
DEFAULT_BIN_SIZE = 50
DEFAULT_MIN_EDGE_LEN = 200
DEFAULT_MIN_EDGE_COVERAGE = 5.0
DEFAULT_COVERAGE_MARGIN = 5.0
DEFAULT_MIN_FLANKING_COVERAGE = 2.0


def _mapped_spans(
    g: CondensedGraph, reads: list[str], index: EdgeIndex | None = None, rf: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Map a strand-specific read set -> (edge, start, end) arrays.

    `rf` flips reads first so that the mapping orientation always equals the
    transcript strand (the reference encodes this through the library's
    strand-specificity flag)."""
    if index is None:
        index = build_edge_index(g)
    if rf:
        reads = [dna.revcomp_str(r) for r in reads]
    mappings = map_read_batch(index, g, reads)
    es, lo, hi = [], [], []
    for i, m in enumerate(mappings):
        if m is None:
            continue
        L = int(g.e_len[m.edge])
        a = max(0, m.start_offset)
        b = min(L, m.start_offset + len(reads[i]))
        if b - a <= g.k:
            continue
        es.append(m.edge)
        lo.append(a)
        hi.append(b)
    return (
        np.asarray(es, np.int64),
        np.asarray(lo, np.int64),
        np.asarray(hi, np.int64),
    )


def fill_ss_coverage(
    g: CondensedGraph,
    reads: list[str],
    index: EdgeIndex | None = None,
    symmetric: bool = False,
    rf: bool = False,
) -> np.ndarray:
    """Per-oriented-edge strand-specific k-mer coverage (SSCoverageFiller).

    Returns an (E,) float array of average k-mer coverage per edge (after the
    reference's RecalculateCoverage division by edge length)."""
    es, lo, hi = _mapped_spans(g, reads, index, rf)
    cov = np.zeros(len(g.e_start), np.float64)
    kmer_counts = np.maximum(hi - lo - g.k, 0)
    np.add.at(cov, es, kmer_counts)
    if symmetric:
        np.add.at(cov, g.e_conj[es], kmer_counts)
    return cov / np.maximum(g.edge_kmer_lengths(), 1)


@dataclass
class SSCoverageSplitter:
    """Detect and apply antisense-boundary edge splits (SSCoverageSplitter)."""

    g: CondensedGraph
    bin_size: int = DEFAULT_BIN_SIZE
    min_edge_len: int = DEFAULT_MIN_EDGE_LEN
    min_edge_coverage: float = DEFAULT_MIN_EDGE_COVERAGE
    coverage_margin: float = DEFAULT_COVERAGE_MARGIN
    min_flanking_coverage: float = DEFAULT_MIN_FLANKING_COVERAGE
    bins: dict[int, np.ndarray] = field(default_factory=dict)

    def __post_init__(self):
        assert self.min_edge_len >= 3 * self.bin_size
        cov = self.g.coverage()
        for e in self.g.alive_edge_ids():
            e = int(e)
            if self.g.e_conj[e] == e:
                continue
            if self.g.e_len[e] - self.g.k < self.min_edge_len:
                continue
            if cov[e] < self.min_edge_coverage:
                continue
            n_bins = int(self.g.e_len[e] - self.g.k + self.bin_size - 1) // self.bin_size
            self.bins[e] = np.zeros(n_bins, np.int64)

    def fill(self, reads: list[str], index: EdgeIndex | None = None, rf: bool = False) -> None:
        """Accumulate binned strand-specific k-mer counts (SSBinCoverageFiller)."""
        es, lo, hi = _mapped_spans(self.g, reads, index, rf)
        for e, a, b in zip(es, lo, hi):
            e = int(e)
            arr = self.bins.get(e)
            if arr is None:
                continue
            # distribute the read's k-mer positions over bins
            first = int(a) // self.bin_size
            last = min(int(b) - self.g.k - 1, len(arr) * self.bin_size - 1) // self.bin_size
            for bi in range(first, min(last, len(arr) - 1) + 1):
                bin_lo = bi * self.bin_size
                bin_hi = bin_lo + self.bin_size
                arr[bi] += max(0, min(int(b) - self.g.k, bin_hi) - max(int(a), bin_lo))

    # -- detection (DetectEdgeSplit, ss_coverage.hpp:174-204) --------------
    def _is_coverage_different(self, c1: float, c2: float) -> bool:
        if c1 == 0.0 and c2 == 0.0:
            return False
        if c1 > c2:
            return c1 >= self.min_flanking_coverage and c1 >= c2 * self.coverage_margin
        return c2 >= self.min_flanking_coverage and c2 >= c1 * self.coverage_margin

    def detect_split(self, e: int) -> int:
        """Split position in graph (k-mer) coordinates, 0 = no split."""
        cov_bins = self.bins.get(e)
        conj_bins = self.bins.get(int(self.g.e_conj[e]))
        if cov_bins is None or conj_bins is None or len(cov_bins) < 3:
            return 0
        assert len(cov_bins) == len(conj_bins)
        b = float(self.bin_size)
        last_whole = len(cov_bins) - 2
        f_front, f_back = cov_bins[0] / b, cov_bins[last_whole] / b
        r_front, r_back = conj_bins[1] / b, conj_bins[-1] / b
        if not (
            self._is_coverage_different(f_front, f_back)
            and self._is_coverage_different(r_front, r_back)
            and self._is_coverage_different(f_front, r_back)
            and self._is_coverage_different(r_front, f_back)
        ):
            return 0
        descends = f_front > f_back
        if descends:
            if f_front < r_back or r_front < f_back:
                return 0
        else:
            if f_front > r_back or r_front > f_back:
                return 0
        rev = conj_bins[::-1]
        inter = (cov_bins < rev) if descends else (cov_bins > rev)
        idx = np.flatnonzero(inter)
        if len(idx) == 0:
            return 0
        pos = int(idx[0]) * self.bin_size
        if pos <= 0 or pos >= int(self.g.e_len[e]) - self.g.k:
            return 0
        return pos

    def split_edges(self) -> int:
        """Apply all detected splits; returns number of edges split."""
        n = 0
        for e in list(self.bins):
            if not self.g.alive[e]:
                continue
            if int(self.g.e_conj[e]) < e:
                continue  # handle each conjugate pair once
            pos = self.detect_split(e)
            if pos:
                split_edge(self.g, e, pos)
                n += 1
        return n


def split_edge(g: CondensedGraph, e: int, pos: int) -> tuple[int, int]:
    """Split edge `e` at k-mer position `pos` into two edges joined by a new
    vertex pair (the Graph::SplitEdge the SS splitter relies on).

    Returns (first new edge id, second new edge id)."""
    k = g.k
    L = int(g.e_len[e])
    assert 0 < pos < L - k
    codes = g.edge_codes(e)
    v_new = len(g.v_conj)
    g.v_conj = np.append(g.v_conj, [v_new + 1, v_new])
    cov = float(g.e_cov[e])
    total = L - k
    e1, _ = g.add_edge_pair(int(g.e_start[e]), v_new, codes[: pos + k], cov * pos / total)
    e2, _ = g.add_edge_pair(v_new, int(g.e_end[e]), codes[pos:], cov * (total - pos) / total)
    g.kill_edges(np.array([e]))
    return e1, e2
