"""Metagenomic bin refinement by label propagation over the assembly graph.

Capability mirror of BinSPreader
(`/root/reference/src/projects/binspreader/labels_propagation.cpp`,
`binning_refiner.cpp:163`; docs `docs/binspreader.md`): contig bin labels are
diffused over assembly-graph adjacencies until convergence, unlabelled edges
adopt the stationary distribution, and the refined (optionally multi-bin)
assignment is written back.

TPU-native: the per-edge bin distribution is a dense (E, B) matrix; one
propagation sweep is a sparse-adjacency gather + segment-sum, expressed as
vectorized numpy (jit-able verbatim if B grows large)."""
from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from .graph import CondensedGraph

log = logging.getLogger("spades_tpu.binning")


@dataclass
class BinningConfig:
    eps: float = 1e-5          # convergence threshold (labels_propagation)
    max_iters: int = 100
    alpha: float = 0.6         # neighbor mass vs initial label mass
    multi_bin_threshold: float = 0.35  # secondary assignment cutoff


def _adjacency(g: CondensedGraph) -> tuple[np.ndarray, np.ndarray]:
    """Undirected adjacency pairs (a, b) of alive edges sharing a vertex,
    conjugate-aware (an edge is adjacent to the neighbors of both strands)."""
    pairs = set()
    by_vertex: dict[int, list[int]] = {}
    for e in g.alive_edge_ids():
        e = int(e)
        for v in (int(g.e_start[e]), int(g.e_end[e])):
            by_vertex.setdefault(v, []).append(e)
    canon = {int(e): min(int(e), int(g.e_conj[e])) for e in g.alive_edge_ids()}
    for _v, edges in by_vertex.items():
        for i in range(len(edges)):
            for j in range(i + 1, len(edges)):
                a, b = canon[edges[i]], canon[edges[j]]
                if a != b:
                    pairs.add((a, b))
                    pairs.add((b, a))
    if not pairs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    arr = np.array(sorted(pairs), np.int64)
    return arr[:, 0], arr[:, 1]


def propagate_labels(
    g: CondensedGraph,
    initial: dict[int, int],
    n_bins: int,
    cfg: BinningConfig | None = None,
) -> np.ndarray:
    """Diffuse bin labels; returns (E, n_bins) probabilities (canonical ids).

    `initial` maps canonical edge id -> bin id for the labelled subset."""
    cfg = cfg or BinningConfig()
    E = len(g.e_start)
    state = np.zeros((E, n_bins))
    labelled = np.zeros(E, bool)
    for e, b in initial.items():
        state[e, b] = 1.0
        labelled[e] = True
    init = state.copy()
    src, dst = _adjacency(g)
    deg = np.zeros(E)
    np.add.at(deg, dst, 1.0)
    deg = np.maximum(deg, 1.0)
    for it in range(cfg.max_iters):
        nbr = np.zeros_like(state)
        np.add.at(nbr, dst, state[src])
        nbr /= deg[:, None]
        new = cfg.alpha * nbr + (1 - cfg.alpha) * init
        # labelled edges keep pulling toward their assignment, unlabelled ones
        # follow the neighborhood only
        new[~labelled] = nbr[~labelled]
        norm = new.sum(axis=1, keepdims=True)
        nz = norm[:, 0] > 0
        new[nz] /= norm[nz]
        delta = float(np.abs(new - state).max()) if E else 0.0
        state = new
        if delta < cfg.eps:
            log.info("label propagation converged after %d iterations", it + 1)
            break
    return state


def refine_binning(
    g: CondensedGraph,
    binning: dict[str, str],
    segment_names: dict[str, int],
    cfg: BinningConfig | None = None,
    multi: bool = False,
) -> dict[str, list[str]]:
    """Refine a (contig name -> bin name) assignment.  Returns name -> bins.

    `segment_names` maps GFA segment name -> canonical edge id."""
    cfg = cfg or BinningConfig()
    bin_names = sorted(set(binning.values()))
    bin_idx = {b: i for i, b in enumerate(bin_names)}
    initial = {}
    for name, b in binning.items():
        e = segment_names.get(name)
        if e is not None:
            initial[e] = bin_idx[b]
    state = propagate_labels(g, initial, len(bin_names), cfg)
    out: dict[str, list[str]] = {}
    for name, e in segment_names.items():
        p = state[e]
        if p.sum() <= 0:
            continue
        if multi:
            chosen = [bin_names[i] for i in np.flatnonzero(p >= cfg.multi_bin_threshold)]
            if not chosen:
                chosen = [bin_names[int(p.argmax())]]
        else:
            chosen = [bin_names[int(p.argmax())]]
        out[name] = chosen
    return out
