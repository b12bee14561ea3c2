"""plasmidSPAdes chromosome removal.

Capability mirror of the reference's `ChromosomeRemover`
(`/root/reference/src/common/modules/chromosome_remover.cpp`:
`RemoveLongGenomicEdges` :101 computes the length-weighted median coverage of
long edges and deletes long edges whose coverage falls inside the chromosomal
median band; `PlasmidSimplify` :182 then clears the debris; finally only
circular / small components survive as plasmid candidates).

TPU-native: all passes are vectorized mask rewrites over the flat edge arrays
(no observer bus); component analysis is a union-find over edge endpoints."""
from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from .graph import CondensedGraph

log = logging.getLogger("spades_tpu.chromosome_remover")


@dataclass
class PlasmidConfig:
    long_edge_length: int = 1000      # plasmid_config.long_edge_length analog
    relative_coverage: float = 0.3    # coverage_limits band around the median
    small_component_size: int = 10000  # keep small components regardless
    min_component_length: int = 150   # drop dust


def _components(g: CondensedGraph) -> dict[int, list[int]]:
    """Connected components over alive edges (undirected via vertices)."""
    parent = np.arange(g.num_vertices, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in g.alive_edge_ids():
        a, b = find(int(g.e_start[e])), find(int(g.e_end[e]))
        if a != b:
            parent[b] = a
        # keep conjugate strands in one component
        c, d = find(int(g.e_start[g.e_conj[e]])), find(a)
        if c != d:
            parent[c] = d
    comps: dict[int, list[int]] = {}
    for e in g.alive_edge_ids():
        comps.setdefault(find(int(g.e_start[e])), []).append(int(e))
    return comps


def weighted_median_coverage(g: CondensedGraph, long_edge_length: int) -> float:
    """Length-weighted median coverage over long edges
    (CoverageUniformityAnalyzer::CountMedianCoverage)."""
    ids = g.alive_edge_ids()
    lens = g.e_len[ids]
    long_ids = ids[lens >= long_edge_length]
    if long_ids.size == 0:
        return 0.0
    cov = g.coverage()[long_ids]
    w = g.e_len[long_ids].astype(float)
    order = np.argsort(cov)
    cum = np.cumsum(w[order])
    half = cum[-1] / 2
    return float(cov[order][np.searchsorted(cum, half)])


def remove_chromosomal(g: CondensedGraph, cfg: PlasmidConfig | None = None) -> int:
    """Remove chromosomal edges/components; returns #edges removed.

    Keeps components that are circular (no dead ends) or small — the plasmid
    candidates plasmidSPAdes outputs."""
    cfg = cfg or PlasmidConfig()
    removed = 0

    # phase 1: RemoveLongGenomicEdges — long edges in the chromosomal band
    for _ in range(10):
        med = weighted_median_coverage(g, cfg.long_edge_length)
        if med <= 0:
            break
        ids = g.alive_edge_ids()
        lens = g.e_len[ids]
        cov = g.coverage()[ids]
        band = (
            (lens >= cfg.long_edge_length)
            & (cov >= med * (1 - cfg.relative_coverage))
            & (cov <= med * (1 + cfg.relative_coverage))
        )
        victims = ids[band]
        if victims.size == 0:
            break
        removed += g.kill_edges(victims)

    # phase 2: keep only circular or small components (plasmid candidates)
    in_deg = g.in_degrees()
    out_deg = g.out_degrees()
    for _root, edges in _components(g).items():
        verts = set()
        total = 0
        for e in edges:
            verts.add(int(g.e_start[e]))
            verts.add(int(g.e_end[e]))
            total += int(g.e_len[e])
        circular = all(in_deg[v] > 0 and out_deg[v] > 0 for v in verts)
        if circular and total >= cfg.min_component_length:
            continue
        if total <= cfg.small_component_size and total >= cfg.min_component_length and circular:
            continue
        if not circular:
            removed += g.kill_edges(np.array(edges, np.int64))
    log.info("chromosome removal: %d edges removed", removed)
    return removed
