"""Edge position tracking (developer mode).

Capability mirror of the reference's `EdgesPositionHandler`
(`/root/reference/src/common/assembly_graph/handlers/edges_position_handler.hpp`):
label every graph edge with the reference-sequence intervals it spells, so
developer-mode pictures/stats can say "edge 17 = genome[12400..13100]".

TPU-native redesign: the reference keeps positions consistent through every
mutation via the ObservableGraph event bus (merge/glue/split callbacks);
here positions are RECOMPUTED against any graph state with one vectorized
anchor-mapping pass — the flat-array analog of re-firing all handlers, and
immune to transform bookkeeping drift.  `fill_positions` maps every k-window
of each named reference sequence through the edge index and run-length
collapses consecutive hits into intervals.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core import dna
from .graph import CondensedGraph


@dataclass
class EdgePosition:
    name: str          # reference sequence name
    ref_start: int     # interval on the reference (0-based, half open)
    ref_end: int
    edge_start: int    # matching interval on the edge
    edge_end: int
    strand: int        # 0 = edge spells ref forward, 1 = reverse complement

    def __str__(self) -> str:  # the reference's "ref: [a, b] --> edge [c, d]"
        s = "+" if self.strand == 0 else "-"
        return (f"{self.name}{s}: [{self.ref_start}, {self.ref_end}) -> "
                f"[{self.edge_start}, {self.edge_end})")


@dataclass
class EdgePositions:
    """edge id -> interval labels (canonical edges; conjugates mirrored)."""

    k: int
    by_edge: dict[int, list[EdgePosition]] = field(default_factory=dict)

    def positions_of(self, e: int) -> list[EdgePosition]:
        return self.by_edge.get(int(e), [])

    def str_of(self, e: int) -> str:
        return "; ".join(str(p) for p in self.positions_of(e))


def fill_positions(
    g: CondensedGraph, named_seqs: dict[str, str], k: int | None = None
) -> EdgePositions:
    """Anchor every k-window of each named sequence onto the graph edges and
    collapse runs into intervals (the handler's AddEdgePosition stream,
    computed in one vectorized pass per sequence)."""
    from ..alignment.mapper import build_edge_index, canonicalize
    from ..core import kmers as K
    from ..ops.count import searchsorted_rows

    k = k or g.k
    index = build_edge_index(g, k)
    out = EdgePositions(k=k)
    for name, seq in named_seqs.items():
        codes = dna.encode(seq)
        n = len(codes) - k + 1
        if n <= 0 or index.kmers.shape[0] == 0:
            continue
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        packed = K.pack(np.ascontiguousarray(wins))
        canon, was_rc = canonicalize(packed, k)
        idx = searchsorted_rows(index.kmers, canon)
        hit = idx >= 0
        pos = np.flatnonzero(hit)
        if pos.size == 0:
            continue
        e = index.edge[idx[hit]]
        off = index.offset[idx[hit]]
        same = np.asarray(was_rc)[hit] == index.strand[idx[hit]]
        # orient onto the canonical edge: forward hits advance offset with
        # ref position; reverse hits decrease it
        runs_break = np.ones(pos.size, bool)
        if pos.size > 1:
            contig_ref = pos[1:] == pos[:-1] + 1
            same_edge = e[1:] == e[:-1]
            fwd_step = same[1:] & same[:-1] & (off[1:] == off[:-1] + 1)
            rev_step = ~same[1:] & ~same[:-1] & (off[1:] == off[:-1] - 1)
            runs_break[1:] = ~(contig_ref & same_edge & (fwd_step | rev_step))
        starts = np.flatnonzero(runs_break)
        ends = np.append(starts[1:], pos.size)
        for a, b in zip(starts, ends):
            ref_s = int(pos[a])
            ref_e = int(pos[b - 1]) + k
            if same[a]:
                es, ee = int(off[a]), int(off[b - 1]) + k
                strand = 0
            else:
                es, ee = int(off[b - 1]), int(off[a]) + k
                strand = 1
            ep = EdgePosition(name, ref_s, ref_e, es, ee, strand)
            out.by_edge.setdefault(int(e[a]), []).append(ep)
    return out
