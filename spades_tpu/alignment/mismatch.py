"""Mismatch correction of edge sequences by read consensus (careful mode).

Capability mirror of the reference's MismatchCorrection stage
(`/root/reference/src/projects/spades/mismatch_correction.cpp:119-280`): map
all reads back onto graph edges, tally per-position nucleotide votes, and fix
edge-sequence positions where the read consensus contradicts the stored base.

TPU-native: mapping is the batched anchor mapper; the vote tally is a single
scatter-add over the flat sequence pool (one (pool-length, 4) accumulator
instead of the reference's per-edge interesting-position maps); conjugate
edges are patched symmetrically to keep the RC invariant."""
from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..core import dna
from ..graph.graph import CondensedGraph
from .mapper import EdgeIndex, build_edge_index, map_read_batch

log = logging.getLogger("spades_tpu.mismatch")


class _KOnly:
    """Minimal index stand-in when only `.k` is needed (sharded vote path
    with a prepared device index)."""

    def __init__(self, k: int):
        self.k = k


@dataclass
class MismatchConfig:
    min_coverage: int = 2       # votes needed at a position to act
    dominance: float = 0.66     # winning base must exceed this vote share
    batch_size: int = 16384


def position_votes(
    g: CondensedGraph, reads: list[str], index: EdgeIndex | None = None,
    batch_size: int = 16384,
) -> np.ndarray:
    """Per-pool-position base votes from mapped reads: (len(seq_pool), 4)."""
    index = index or build_edge_index(g)
    votes = np.zeros((len(g.seq_pool), 4), np.int32)
    for lo in range(0, len(reads), batch_size):
        chunk = reads[lo : lo + batch_size]
        mappings = map_read_batch(index, g, chunk)
        flat_idx, flat_base = [], []
        for m, s in zip(mappings, chunk):
            if m is None:
                continue
            codes = dna.encode(s)
            ok = codes < 4
            pos = m.start_offset + np.arange(len(codes))
            inside = (pos >= 0) & (pos < g.e_len[m.edge]) & ok
            if not inside.any():
                continue
            flat_idx.append(g.e_off[m.edge] + pos[inside])
            flat_base.append(codes[inside])
        if flat_idx:
            np.add.at(votes, (np.concatenate(flat_idx), np.concatenate(flat_base)), 1)
    return votes


def correct_mismatches(g: CondensedGraph, reads: list[str] | None = None,
                       index: EdgeIndex | None = None, store=None,
                       engine=None, mesh=None) -> int:
    """Fix edge-sequence mismatches by read majority vote.  Returns #bases fixed.

    With `store` (a run-wide packed ReadStore), the mapping + vote tally run
    sharded across the device mesh with a psum vote merge — the
    MismatchCorrectionMPI split (`hpcspades/mpi/stages/
    mismatch_correction_mpi.hpp`: read shards per rank, vote allreduce,
    fixes applied on the master); `engine` reuses a shared MappingEngine's
    index + device upload.  The legacy string-list path stays for
    tools/tests.

    Known divergence (documented per ADVICE r4): the sharded vote path does
    not apply the kmer-mapper projection, so reads whose every anchor was
    glued away during simplification cast no votes here (the host path
    would recover a small minority of them via projection).  Votes are a
    consensus over ~coverage-many reads per position, so dropping that
    sliver cannot flip a majority that the dominance threshold accepts."""
    cfg = MismatchConfig()
    if g.num_edges == 0 or not (reads or store):
        return 0
    if store is not None:
        from ..parallel.sharded_mapping import position_votes_sharded

        # sharded path only needs k + the DEVICE index: touching
        # engine.index here would force the host lexsort build AND flip
        # _device_index onto the padded-upload branch (the exact costs
        # build_index_device exists to avoid)
        if engine is not None:
            prep = engine._device_index()
            mesh = mesh or engine.mesh
            k = engine._k
        else:
            prep = None
            index = index or build_edge_index(g)
            k = index.k
        votes = position_votes_sharded(
            _KOnly(k) if index is None else index, g, mesh=mesh, store=store,
            prep=prep,
        )
    else:
        if engine is not None:
            index = engine.index
        else:
            index = index or build_edge_index(g)
        votes = position_votes(g, reads, index, cfg.batch_size)

    fixed = 0
    for e in g.canonical_edge_ids():
        o, n = int(g.e_off[e]), int(g.e_len[e])
        v = votes[o : o + n].copy()
        # fold in votes landed on the conjugate's pool slice (reads that
        # mapped in the other orientation), mirrored and complemented
        ec = int(g.e_conj[e])
        oc = int(g.e_off[ec])
        if ec != e:
            v += votes[oc : oc + n][::-1, ::-1]
        total = v.sum(axis=1)
        best = v.argmax(axis=1).astype(np.uint8)
        bestv = v.max(axis=1)
        fixable = (total >= cfg.min_coverage) & (bestv > cfg.dominance * total)
        mism = fixable & (best != g.seq_pool[o : o + n])
        if not mism.any():
            continue
        pos = np.flatnonzero(mism)
        g.seq_pool[o + pos] = best[pos]
        if ec != e:
            g.seq_pool[oc + (n - 1 - pos)] = 3 - best[pos]
        fixed += len(pos)
    if fixed:
        log.info("mismatch correction: fixed %d positions", fixed)
    return fixed
