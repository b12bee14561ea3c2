"""Multi-sample coverage-series analysis of the assembly graph (meta mode).

Capability mirror of `/root/reference/src/projects/spades/series_analysis.cpp`:
given an MTS k-mer multiplicity table, dump per-edge (and per-edge-fragment)
abundance profiles and edge sequences (:250-287), infer a bin's base profile
from contig profiles (:193-219 InferAbundance), and clear edges whose profile
diverges from the base profile — low cosine similarity or small norm ratio —
restricted to topologically safe edges (tips or alternatives present)
(:135-190 AggressiveClearing).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..graph.graph import CondensedGraph
from .abundance import contig_profiles
from .multiplicity import KmerProfiles


@dataclass
class SeriesAnalysisConfig:
    """YAML config (series_analysis.cpp MappingTraits :41-55)."""

    k: int
    sample_cnt: int
    kmer_mult: str
    bin: str = ""
    bin_prof: str = ""
    min_len: int = 0
    frag_size: int = 0
    edges_sqn: str = ""
    edges_mpl: str = ""
    edge_fragments_mpl: str = ""

    @classmethod
    def load(cls, path: str) -> "SeriesAnalysisConfig":
        import yaml

        with open(path) as fh:
            d = yaml.safe_load(fh)
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


def cosine_sim(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


def infer_bin_abundance(bin_prof_path: str, bin_id: str, sample_cnt: int) -> np.ndarray:
    """Mean profile of a bin's contigs (InferAbundance :193-219)."""
    vecs = []
    with open(bin_prof_path) as fh:
        for line in fh:
            f = line.split()
            if len(f) < 1 + sample_cnt or f[0] != bin_id:
                continue
            vecs.append([float(x) for x in f[1 : 1 + sample_cnt]])
    if not vecs:
        return np.zeros(sample_cnt)
    return np.asarray(vecs).mean(axis=0)


def edge_profiles(
    profiles: KmerProfiles, g: CondensedGraph, min_len: int = 0
) -> dict[int, np.ndarray]:
    """Per-canonical-edge abundance vector (EdgeAbundance::Fill)."""
    ids = [int(e) for e in g.canonical_edge_ids() if g.e_len[e] >= max(min_len, profiles.k)]
    seqs = [g.edge_seq(e) for e in ids]
    ab, _, ok = contig_profiles(profiles, seqs)
    return {e: ab[i] for i, e in enumerate(ids) if ok[i]}


def aggressive_clearing(
    g: CondensedGraph,
    eprofiles: dict[int, np.ndarray],
    base_profile: np.ndarray,
    similarity_threshold: float = 0.8,
    norm_ratio_threshold: float = 0.1,
) -> int:
    """Remove topologically-safe edges whose profile diverges from the base
    (AggressiveClearing::ProcessEdge :146-172).  Returns edges removed."""
    base_norm = np.linalg.norm(base_profile)
    if base_norm == 0:
        return 0
    in_deg = g.in_degrees()
    out_deg = g.out_degrees()
    removed = 0
    for e in list(g.canonical_edge_ids()):
        e = int(e)
        if not g.alive[e]:
            continue
        # topological condition: alternatives present at either end, or tip
        s, t = int(g.e_start[e]), int(g.e_end[e])
        has_alt = out_deg[s] > 1 or in_deg[t] > 1
        is_tip = in_deg[s] == 0 or out_deg[t] == 0
        if not (has_alt or is_tip):
            continue
        prof = eprofiles.get(e)
        if prof is None:
            continue
        sim = cosine_sim(prof, base_profile)
        norm_ratio = float(np.linalg.norm(prof)) / base_norm
        if norm_ratio < norm_ratio_threshold or sim < similarity_threshold:
            g.kill_edges(np.array([e]))
            removed += 1
            in_deg = g.in_degrees()
            out_deg = g.out_degrees()
    return removed


def run_series_analysis(g: CondensedGraph, cfg: SeriesAnalysisConfig) -> None:
    """The SeriesAnalysis stage body (series_analysis.cpp:250-287)."""
    profiles = KmerProfiles.load(cfg.kmer_mult)
    assert profiles.num_samples == cfg.sample_cnt

    if cfg.edges_sqn:
        with open(cfg.edges_sqn, "w") as out:
            for e in g.canonical_edge_ids():
                s = g.edge_seq(int(e))
                out.write(f">NODE_{int(e)}_length_{len(s)}\n{s}\n")

    if cfg.edges_mpl:
        with open(cfg.edges_mpl, "w") as out:
            _print_fragment_profiles(g, profiles, None, cfg.min_len, out)

    if cfg.edge_fragments_mpl:
        with open(cfg.edge_fragments_mpl, "w") as out:
            _print_fragment_profiles(g, profiles, cfg.frag_size, cfg.min_len, out)


def _print_fragment_profiles(
    g: CondensedGraph, profiles: KmerProfiles, split_length: int | None,
    min_len: int, out,
) -> None:
    """PrintEdgeFragmentProfiles (:221-248): whole edges or fixed fragments."""
    names, seqs = [], []
    for e in g.canonical_edge_ids():
        full = g.edge_seq(int(e))
        step = split_length or len(full) or 1
        for i in range(0, len(full), step):
            frag = full[i : i + step]
            if len(frag) < max(min_len, profiles.k):
                break
            names.append(f"{int(e)}_{i // step}" if split_length else str(int(e)))
            seqs.append(frag)
    if not seqs:
        return
    ab, _, ok = contig_profiles(profiles, seqs)
    for i, name in enumerate(names):
        if ok[i]:
            vec = " ".join(f"{x:.2f}" for x in ab[i])
            out.write(f"{name} {len(seqs[i])} {vec}\n")
