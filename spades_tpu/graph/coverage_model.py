"""Coverage-model threshold estimation.

Capability mirror of the reference's `KMerCoverageModel::Fit`
(`/root/reference/src/common/modules/coverage_model/kmer_coverage_model.hpp:16-29`
and `stages/genomic_info_filler.cpp:44-71`): fit the k-mer multiplicity
histogram to separate the low-coverage error component from the genomic
component, producing the erroneous-coverage bound (`ec_bound`) and a trusted
coverage bound used by the "auto"/"icb auto" simplification conditions.

Instead of the reference's nlopt mixture-model optimization this uses the
valley heuristic (first local minimum of the smoothed histogram) with a
quantile fallback — adequate until the full mixture fit lands, and robust on
tiny datasets where the mixture fit degenerates (the reference also falls
back in that case).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class GenomicInfo:
    ec_bound: float          # coverage below this is considered erroneous
    trusted_bound: float     # coverage above this is trusted genomic
    estimated_mean: float    # estimated genomic k-mer coverage
    genome_size: int         # estimated genome size in k-mers


def fit_coverage_model(multiplicities: np.ndarray) -> GenomicInfo:
    """Estimate thresholds from k-mer multiplicities (counts per unique k-mer)."""
    m = np.asarray(multiplicities)
    if m.size == 0:
        return GenomicInfo(0.0, 0.0, 0.0, 0)
    cap = int(min(m.max(), 1000))
    hist = np.bincount(np.minimum(m, cap).astype(np.int64), minlength=cap + 1).astype(
        np.float64
    )
    # smooth lightly to suppress single-bin noise
    kernel = np.array([1.0, 2.0, 3.0, 2.0, 1.0])
    kernel /= kernel.sum()
    sm = np.convolve(hist, kernel, mode="same")
    # find first local minimum after the initial error peak (bin >= 2)
    valley = 0
    for i in range(2, cap):
        if sm[i] <= sm[i - 1] and sm[i] <= sm[i + 1]:
            valley = i
            break
    if valley == 0:
        # monotone histogram: fall back to a low quantile
        valley = max(2, int(np.quantile(m, 0.1)))
    # genomic peak = argmax after the valley
    if valley + 1 < len(sm):
        peak = valley + int(np.argmax(sm[valley:]))
    else:
        peak = valley
    mean = float(peak) if peak > valley else float(np.median(m[m > valley]) or valley)
    genomic = m[m > valley]
    info = GenomicInfo(
        ec_bound=float(valley),
        trusted_bound=float(max(valley + 1, mean * 0.25)),
        estimated_mean=mean,
        genome_size=int(genomic.size),
    )
    return info
