"""Construction stage: reads -> counted (k+1)-mers -> extension index -> graph.

Mirrors the reference's Construction composite stage
(`/root/reference/src/common/stages/construction.cpp:439-453`: KMerCounting of
(k+1)-mers -> ExtensionIndexBuilder -> optional EarlyTipClipper ->
GraphCondenser -> coverage fill) as a function pipeline over the TPU counting
engine.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..graph.graph import CondensedGraph
from ..ops import condense as _condense
from ..ops import count as _count
from ..ops import extension as _ext


@dataclass
class ConstructionResult:
    graph: CondensedGraph
    p1_counts: _count.KmerCounts       # canonical (k+1)-mer counts
    index: _ext.ExtensionIndex


def construct_graph(
    sequences,
    k: int,
    min_count: int = 1,
    batch_size: int = 65536,
) -> ConstructionResult:
    """Build the condensed de Bruijn graph at odd k from a sequence iterable.

    min_count: drop (k+1)-mers with multiplicity < min_count before graph
    build (the role of the reference's CQF coverage filter for meta mode).
    """
    if k % 2 == 0:
        raise ValueError("k must be odd")
    p1 = _count.count_sequences(sequences, k + 1, batch_size=batch_size)
    if min_count > 1:
        keep = p1.counts >= min_count
        p1 = _count.KmerCounts(k=p1.k, words=p1.words[keep], counts=p1.counts[keep])
    index = _ext.build_extension_index(p1)
    graph = _condense.condense(index, p1)
    return ConstructionResult(graph=graph, p1_counts=p1, index=index)
