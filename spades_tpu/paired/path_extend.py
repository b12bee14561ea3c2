"""Repeat resolution and scaffolding as greedy path extension (exSPAnder).

Capability mirror of the reference's path_extend module
(`/root/reference/src/common/modules/path_extend/`): seeds from long edges
(`MakeSimpleSeeds`), a paired-weight extension chooser
(`extension_chooser.hpp` SimpleExtensionChooser: candidate score = sum of
paired-info weights from path edges at consistent distances, with a
relative-weight filter), conjugate-paired bidirectional paths, overlap/
containment removal (`pe_resolver.hpp`), and pair-info-driven scaffold gap
joining (`scaffolder2015` surface, simple-gap variant).

Host-side control loop (the reference's is inherently sequential/greedy too,
`launcher.cpp:633-702`); the per-candidate weight scoring is vectorized over
the sorted paired-index table.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from ..graph.graph import CondensedGraph
from .paired_info import PairedIndex

log = logging.getLogger("spades_tpu.path_extend")


@dataclass
class PEConfig:
    insert_size: float = 250.0
    is_var: float = 50.0
    read_length: int = 100
    min_weight: float = 1.0
    rel_weight: float = 0.6     # priority filter (prior_coeff analog: keep >= rel*best)
    max_edge_repeat: int = 8
    scaffold_min_weight: float = 2.0
    min_gap: int = 1
    max_gap: int = 2000
    # PathCoverWeightCounter knobs (weight_counter.hpp:218-280)
    normalize_weight: bool = True
    single_threshold: float = 0.1   # per-path-edge support cut (pe_config single_threshold)
    weight_threshold: float = 0.35  # final normalized score cut (extension_options)
    # polishing / loops
    max_polisher_gap: int = 700     # pe_config max_polisher_gap (launcher.cpp:485)
    loop_unroll_nt_limit: int = 1000  # full unroll only for short loops (path_extender.hpp:126)


@dataclass
class Path:
    edges: list[int]
    gaps: list[int] = field(default_factory=list)  # gap BEFORE edge i (gaps[0]=0)

    def __post_init__(self):
        if not self.gaps:
            self.gaps = [0] * len(self.edges)


def path_positions(g: CondensedGraph, path: Path) -> np.ndarray:
    """Start position of every path edge in path coordinates (k-mer lengths)."""
    pos = np.zeros(len(path.edges), np.int64)
    run = 0
    for i, e in enumerate(path.edges):
        run += path.gaps[i]
        pos[i] = run
        run += int(g.e_len[e]) - g.k
    return pos


def conj_path(g: CondensedGraph, path: Path) -> Path:
    edges = [int(g.e_conj[e]) for e in reversed(path.edges)]
    gaps = [0] + list(reversed(path.gaps[1:])) if len(path.gaps) > 1 else [0]
    return Path(edges, gaps)


def candidate_weight(
    g: CondensedGraph,
    pi: PairedIndex,
    path: Path,
    pos: np.ndarray,
    cand: int,
    cand_pos: int,
    cfg: PEConfig,
) -> float:
    """Paired support for extending the path with `cand` at cand_pos."""
    delta = max(3.0 * cfg.is_var, 10.0)
    total = 0.0
    for e, p in zip(path.edges, pos):
        expected = cand_pos - p
        if expected - (g.e_len[e] - g.k) > cfg.insert_size + delta:
            continue  # too far back to have pairs
        e2s, ds, ws = pi.pairs_from(int(e))
        if e2s.size == 0:
            continue
        m = (e2s == cand) & (np.abs(ds - expected) <= delta)
        total += float(ws[m].sum())
    return total


def _long_read_choice(long_reads, last: int, cands: list[int]) -> int | None:
    """LongReadsExtensionChooser analog: a unique dominant long-read vote."""
    if long_reads is None:
        return None
    votes = long_reads.next_edge_votes(last)
    scored = sorted(((votes.get(c, 0), c) for c in cands), reverse=True)
    if scored[0][0] >= 2 and (len(scored) == 1 or scored[0][0] >= 2 * max(scored[1][0], 1)):
        return scored[0][1]
    return None


def extend_path_forward(
    g: CondensedGraph, pi: PairedIndex, path: Path, cfg: PEConfig, long_reads=None
) -> bool:
    """Try one forward extension step; returns True if extended."""
    last = path.edges[-1]
    v = int(g.e_end[last])
    cands = [int(e) for e in g.out_edges_of(v)]
    if not cands:
        return False
    counts = {e: path.edges.count(e) for e in cands}
    cands = [e for e in cands if counts[e] < cfg.max_edge_repeat]
    if not cands:
        return False
    if len(cands) == 1:
        path.edges.append(cands[0])
        path.gaps.append(0)
        return True
    pos = path_positions(g, path)
    cand_pos = int(pos[-1]) + int(g.e_len[last]) - g.k
    weights = np.array(
        [candidate_weight(g, pi, path, pos, c, cand_pos, cfg) for c in cands]
    )
    best = int(np.argmax(weights))
    choice: int | None = None
    if weights[best] >= cfg.min_weight:
        strong = np.flatnonzero(weights >= cfg.rel_weight * weights[best])
        if strong.size == 1:
            choice = cands[best]
    if choice is None:
        # paired info ambiguous: a long-read path over the junction decides
        # (extenders_logic.cpp long-read extender in the composite chain)
        choice = _long_read_choice(long_reads, last, cands)
    if choice is None:
        return False  # ambiguous — stop (the reference defers to loop resolvers)
    path.edges.append(choice)
    path.gaps.append(0)
    return True


def resolve_repeats(
    g: CondensedGraph, pi: PairedIndex, cfg: PEConfig, long_reads=None
) -> list[Path]:
    """Greedy seed-and-extend over all edges, longest seeds first."""
    ids = g.canonical_edge_ids()
    order = sorted(ids, key=lambda e: (-int(g.e_len[e]), int(e)))
    used: set[int] = set()
    paths: list[Path] = []
    for seed in order:
        seed = int(seed)
        if seed in used:
            continue
        path = Path([seed])
        # extend forward, then extend the conjugate forward (== backward)
        while extend_path_forward(g, pi, path, cfg, long_reads):
            pass
        path = conj_path(g, path)
        while extend_path_forward(g, pi, path, cfg, long_reads):
            pass
        path = conj_path(g, path)  # restore original orientation
        for e in path.edges:
            used.add(int(e))
            used.add(int(g.e_conj[e]))
        paths.append(path)
    return remove_contained(g, paths)


def remove_contained(g: CondensedGraph, paths: list[Path]) -> list[Path]:
    """Drop paths whose edge sequence is contained in another path (or its
    conjugate) — PEResolver overlap-removal light."""

    def tup(p: Path):
        return tuple(p.edges)

    def contains(big: tuple, small: tuple) -> bool:
        if len(small) > len(big):
            return False
        return any(
            big[i : i + len(small)] == small
            for i in range(len(big) - len(small) + 1)
        )

    keep: list[Path] = []
    all_tups = [(tup(p), tup(conj_path(g, p))) for p in paths]
    for i, p in enumerate(paths):
        t = all_tups[i][0]
        contained = False
        for j, q in enumerate(paths):
            if i == j:
                continue
            tq, tqc = all_tups[j]
            if (len(t) < len(tq) or (len(t) == len(tq) and i > j)) and (
                contains(tq, t) or contains(tqc, t)
            ):
                contained = True
                break
        if not contained:
            keep.append(p)
    return keep


def path_sequence(g: CondensedGraph, path: Path) -> str:
    """Spell the path: k-overlap concatenation; gaps become N runs."""
    from ..core import dna

    parts: list[str] = []
    for i, e in enumerate(path.edges):
        s = g.edge_seq(int(e))
        if i == 0:
            parts.append(s)
        elif path.gaps[i] > 0:
            parts.append("N" * path.gaps[i])
            parts.append(s)
        else:
            parts.append(s[g.k :])
    return "".join(parts)


def path_to_string(g: CondensedGraph, path: Path) -> str:
    """Spell a path as the reference's .paths record line: oriented canonical
    edge ids, ';' before gap-separated runs (bidirectional_path_io)."""
    parts: list[str] = []
    for i, e in enumerate(path.edges):
        can = min(int(e), int(g.e_conj[e]))
        tok = f"{can}{'+' if int(e) == can else '-'}"
        if i > 0 and path.gaps[i] > 0:
            parts.append(";\n" + tok)
        elif i > 0:
            parts.append("," + tok)
        else:
            parts.append(tok)
    return "".join(parts)


def write_paths(path_file: str, named_paths, g: CondensedGraph) -> None:
    """Write contigs.paths/scaffolds.paths: name line + path line, plus the
    conjugate record (name') as the reference does."""
    with open(path_file, "w") as fh:
        for name, p in named_paths:
            fh.write(f"{name}\n{path_to_string(g, p)}\n")
            fh.write(f"{name}'\n{path_to_string(g, conj_path(g, p))}\n")


def path_coverage(g: CondensedGraph, path: Path) -> float:
    lens = np.array([g.e_len[e] - g.k for e in path.edges], float)
    covs = g.coverage()[np.array(path.edges, np.int64)]
    return float((lens * covs).sum() / max(lens.sum(), 1.0))


def scaffold_paths(
    g: CondensedGraph, pi: PairedIndex, paths: list[Path], cfg: PEConfig
) -> list[Path]:
    """Join paths whose ends are linked by pair info with an estimated gap."""
    if not paths:
        return paths
    first_edge = {}
    for i, p in enumerate(paths):
        first_edge.setdefault(p.edges[0], i)
        first_edge.setdefault(int(g.e_conj[p.edges[-1]]), ~i)  # conj start

    joined: list[Path] = []
    consumed = [False] * len(paths)
    for i, p in enumerate(paths):
        if consumed[i]:
            continue
        cur = Path(list(p.edges), list(p.gaps))
        while True:
            last = cur.edges[-1]
            e2s, ds, ws = pi.pairs_from(int(last))
            if e2s.size == 0:
                break
            # candidate links: to first edges of other paths
            best_j, best_w, best_gap = None, 0.0, 0
            for e2, d, w in zip(e2s, ds, ws):
                j = first_edge.get(int(e2))
                if j is None:
                    continue
                jj = j if j >= 0 else ~j
                if jj == i or consumed[jj] or (j < 0):
                    continue  # only forward-orientation joins in this pass
                gap = int(d) - (int(g.e_len[last]) - g.k)
                if not (-g.k < gap <= cfg.max_gap):
                    continue
                if w > best_w:
                    best_j, best_w, best_gap = jj, float(w), gap
            if best_j is None or best_w < cfg.scaffold_min_weight:
                break
            q = paths[best_j]
            cur.edges += list(q.edges)
            cur.gaps += [max(best_gap, cfg.min_gap)] + list(q.gaps[1:])
            consumed[best_j] = True
        joined.append(cur)
        consumed[i] = True
    return joined


def build_scaffold_graph_2015(
    g: CondensedGraph,
    pi: PairedIndex,
    min_edge_length: int = 500,
    min_weight: float = 2.0,
):
    """Mate-pair scaffold graph over long unique edges.

    The scaffolder2015 construction (`modules/path_extend/scaffolder2015/
    scaffold_graph_constructor.hpp` + `connection_condition2015.hpp`):
    scaffold vertices are oriented long edges, a scaffold edge (e1 -> e2)
    aggregates the mate-pair support weight; links below `min_weight` are
    dropped and only the max-weight link per ordered pair is kept."""
    from ..aux_graphs.scaffold_graph import ScaffoldGraph

    lens = g.edge_kmer_lengths()
    long_edge = np.zeros(len(g.e_start), bool)
    ids = g.alive_edge_ids()
    long_edge[ids[lens[ids] >= min_edge_length]] = True

    sg = ScaffoldGraph()
    for e in np.flatnonzero(long_edge):
        sg.add_vertex(int(e))
    keep = long_edge[pi.e1] & long_edge[pi.e2] & (pi.e1 != pi.e2)
    if keep.any():
        # aggregate weight per (e1, e2) over all distances
        key = pi.e1[keep] * np.int64(len(g.e_start)) + pi.e2[keep]
        order = np.argsort(key)
        k_s = key[order]
        w_s = pi.weight[keep][order]
        first = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        gid = np.cumsum(first) - 1
        w_sum = np.zeros(int(gid[-1]) + 1)
        np.add.at(w_sum, gid, w_s)
        uniq = k_s[first]
        e1u = (uniq // len(g.e_start)).astype(np.int64)
        e2u = (uniq % len(g.e_start)).astype(np.int64)
        ok = w_sum >= min_weight
        sg.add_edges(e1u[ok], e2u[ok], w_sum[ok])
        sg.dedup()
    return sg


def scaffold_with_graph_2015(
    g: CondensedGraph, sg, paths: list[Path], cfg: PEConfig, default_gap: int = 100
) -> list[Path]:
    """Join paths along unambiguous scaffold-graph links.

    A link is used when its source has scaffold out-degree 1 and its target
    in-degree 1 (the unambiguous-connection rule of the 2015 scaffolder),
    the source edge ends a path and the target edge starts another."""
    if sg.num_edges == 0 or not paths:
        return paths
    out_deg = sg.out_degrees()
    in_deg = sg.in_degrees()
    path_by_first = {p.edges[0]: i for i, p in enumerate(paths)}
    path_by_last = {p.edges[-1]: i for i, p in enumerate(paths)}

    next_of: dict[int, int] = {}
    for s, d in zip(sg.src, sg.dst):
        s, d = int(s), int(d)
        if out_deg.get(s) == 1 and in_deg.get(d) == 1:
            i = path_by_last.get(s)
            j = path_by_first.get(d)
            if i is not None and j is not None and i != j:
                next_of[i] = j

    has_prev = set(next_of.values())
    joined: list[Path] = []
    consumed = [False] * len(paths)
    for i in range(len(paths)):
        if consumed[i] or i in has_prev:
            continue
        cur = Path(list(paths[i].edges), list(paths[i].gaps))
        consumed[i] = True
        j = next_of.get(i)
        while j is not None and not consumed[j]:
            q = paths[j]
            cur.edges += list(q.edges)
            cur.gaps += [default_gap] + list(q.gaps[1:])
            consumed[j] = True
            j = next_of.get(j)
        joined.append(cur)
    for i in range(len(paths)):
        if not consumed[i]:
            joined.append(paths[i])
    return joined
