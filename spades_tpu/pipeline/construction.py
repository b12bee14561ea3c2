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


def _count_auto(sequences, k1: int, batch_size: int,
                timings: dict | None = None,
                read_store=None,
                structure_sequences=None) -> "_count.KmerCounts":
    """Count (k+1)-mers on the attached hardware: the multi-chip sharded
    counter (hash routing + all_to_all over ICI, `parallel/sharded_count`)
    when more than one device is visible, else the single-chip engine —
    the ConstructionMPI-vs-Construction dispatch of the reference
    (`hpcspades/pipeline.cpp`), decided by topology instead of a binary."""
    import jax

    try:
        n_dev = len(jax.devices())
    except Exception:
        n_dev = 1
    if n_dev <= 1:
        from ..core.reads import batch_iter, chop_sequences

        structure = None
        if structure_sequences:
            # prev-K / trusted contigs join the SAME device merge with
            # zeroed counts: one fused table replaces the separate count +
            # host merge + host lookup of the two-pass path (the round-4
            # extra_count_s cost)
            structure = batch_iter(
                chop_sequences(structure_sequences, k1), batch_size=batch_size
            )
        if read_store is not None:
            # run-wide packed store: chunks already 2-bit packed and
            # device-uploaded once — skip the per-K re-encode entirely
            return _count.count_reads(read_store.chunks, k1, timings=timings,
                                      structure_batches=structure)
        return _count.count_reads(
            batch_iter(chop_sequences(sequences, k1), batch_size=batch_size),
            k1, timings=timings, structure_batches=structure,
        )

    from ..core.reads import batch_iter, chop_sequences
    from ..parallel.sharded_count import count_kmers_sharded, make_mesh

    mesh = make_mesh()
    runs = []
    for batch in batch_iter(chop_sequences(sequences, k1), batch_size=batch_size):
        if batch.codes.shape[1] < k1:
            continue
        runs.append(count_kmers_sharded(batch, k1, mesh))
    if not runs:
        from ..core import kmers as KK

        W = KK.kmer_words(k1)
        return _count.KmerCounts(
            k=k1, words=np.zeros((0, W), np.uint32), counts=np.zeros(0, np.int64)
        )
    return _count.merge_counts(runs)


from dataclasses import field


@dataclass
class ConstructionResult:
    graph: CondensedGraph
    p1_counts: _count.KmerCounts       # canonical (k+1)-mer counts
    index: _ext.ExtensionIndex
    # Per-phase wall-time account (count device/pull/merge via count_reads'
    # keys, plus filter_s / ext_build_s / early_clip_s / condense_s) — the
    # role of the reference's TIME_TRACE_SCOPE markers in construction.cpp.
    timings: dict = field(default_factory=dict)


def construct_graph(
    sequences,
    k: int,
    min_count: int = 1,
    batch_size: int = 65536,
    early_tip_clip: bool = False,
    early_tc_length_bound: int | None = None,
    early_at_clip: bool = False,
    read_length: int | None = None,
    extra_sequences=None,
    read_store=None,
) -> ConstructionResult:
    """Build the condensed de Bruijn graph at odd k from a sequence iterable.

    min_count: drop (k+1)-mers with multiplicity < min_count before graph
    build (the role of the reference's CQF coverage filter for meta mode).

    early_tip_clip / early_at_clip: run the pre-condensation clippers on the
    extension index (construction.cpp:446-450 EarlyATClipper for RNA
    pipelines, EarlyTipClipper when the gap closer is off; the tip length
    bound defaults to read_length - k, construction.cpp:297-300).  These run
    after the sharded/single-chip count paths converge, so the distributed
    build clips on the OR-merged masks — the MPI_BAND allreduce point of
    construction_mpi.cpp:456.
    """
    import time

    if k % 2 == 0:
        raise ValueError("k must be odd")
    import jax as _jax

    tm: dict = {}
    try:
        _single_dev = len(_jax.devices()) <= 1
    except Exception:  # noqa: BLE001
        _single_dev = True
    fused_structure = bool(extra_sequences) and min_count == 1 and _single_dev
    p1 = _count_auto(
        sequences, k + 1, batch_size, timings=tm, read_store=read_store,
        structure_sequences=extra_sequences if fused_structure else None,
    )
    if min_count > 1:
        t0 = time.perf_counter()
        keep = p1.counts >= min_count
        p1 = _count.KmerCounts(k=p1.k, words=p1.words[keep], counts=p1.counts[keep])
        tm["filter_s"] = round(time.perf_counter() - t0, 2)
    if extra_sequences and not fused_structure:
        # prev-K / trusted contigs contribute GRAPH STRUCTURE but not
        # coverage — the reference keeps them in separate streams "for not
        # counting it in coverage" (stages/construction.cpp:110,233): the
        # counting phase merges read+contig streams, the coverage fill uses
        # read streams only.  Structure rows absent from the read counts
        # carry coverage 0.
        t0 = time.perf_counter()
        p_extra = _count.count_sequences(extra_sequences, k + 1, batch_size=batch_size)
        structure = _count.merge_counts([p1, p_extra])
        cov = np.zeros(structure.num_unique, np.int64)
        rows = _count.searchsorted_rows(structure.words, p1.words)
        cov[rows] = p1.counts
        p1 = _count.KmerCounts(k=p1.k, words=structure.words, counts=cov)
        tm["extra_count_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    index = _ext.build_extension_index(p1)
    tm["ext_build_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    if early_at_clip:
        from ..ops import early_clip as _early

        _early.remove_at_edges(index)
        _early.remove_at_tips(index)
    if early_tip_clip:
        from ..ops import early_clip as _early

        bound = early_tc_length_bound
        if bound is None:
            bound = (read_length - k) if read_length and read_length > k else k
        _early.clip_tips_early(index, bound)
    if early_at_clip or early_tip_clip:
        tm["early_clip_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    graph = _condense.condense(index, p1)
    tm["condense_s"] = round(time.perf_counter() - t0, 2)
    for key in ("device_s", "device_first_s", "pull_s", "merge_s", "host_s"):
        if key in tm:
            tm[key] = round(tm[key], 2)
    return ConstructionResult(graph=graph, p1_counts=p1, index=index, timings=tm)
