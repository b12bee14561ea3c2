"""Profile-HMM alignment to sequences and to the assembly graph.

Capability mirror of PathRacer
(`/root/reference/src/projects/pathracer/{main.cpp:1127,hmmpath.hpp,
find_best_path.cpp}`): find the graph paths whose spelled sequences best
match a profile HMM.  The reference runs a parallel DP over "graph cursors";
this implementation scores candidate paths with a vectorized local Viterbi
(numpy, O(L*M) per path, states vectorized) and enumerates candidate paths by
bounded DFS from seed edges whose local score passes a threshold — the same
seed-and-extend shape at far lower code weight.  Amino-acid profiles are
matched against all six reading frames of the spelled path (the reference's
translation support)."""
from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..core import dna
from ..graph.graph import CondensedGraph
from .io import ProfileHMM

log = logging.getLogger("spades_tpu.hmm")

_CODON = {}


def _codon_table():
    global _CODON
    if _CODON:
        return _CODON
    bases = "TCAG"
    aas = (
        "FFLLSSSSYY**CC*W"
        "LLLLPPPPHHQQRRRR"
        "IIIMTTTTNNKKSSRR"
        "VVVVAAAADDEEGGGG"
    )
    for i, a in enumerate(bases):
        for j, b in enumerate(bases):
            for k, c in enumerate(bases):
                _CODON[a + b + c] = aas[16 * i + 4 * j + k]
    return _CODON


AMINO_ORDER = "ACDEFGHIKLMNPQRSTVWY"
AA_INDEX = {a: i for i, a in enumerate(AMINO_ORDER)}


def translate(seq: str, frame: int = 0) -> str:
    tab = _codon_table()
    s = seq[frame:]
    return "".join(
        tab.get(s[i : i + 3], "X") for i in range(0, len(s) - 2, 3)
    )


def _encode_for(hmm: ProfileHMM, seq: str) -> np.ndarray:
    if hmm.K == 4:
        codes = dna.encode(seq)
        return np.where(codes >= 4, 0, codes).astype(np.int64)
    return np.array([AA_INDEX.get(c, 0) for c in seq], np.int64)


def viterbi_score(hmm: ProfileHMM, seq: str) -> tuple[float, int, int]:
    """Local Viterbi: best -ln-odds score of aligning the profile inside seq.

    Returns (score, start, end) with positive score = better than background
    (scores are accumulated as background minus model, in nats)."""
    if (hmm.K == 4 and len(seq) == 0) or len(seq) == 0:
        return -np.inf, 0, 0
    x = _encode_for(hmm, seq)
    L = len(x)
    M = hmm.length
    bg = hmm.compo if hmm.compo is not None else np.full(hmm.K, -np.log(1.0 / hmm.K))
    # emission log-odds: ln(p_match / p_background) = bg_score - match_score
    lo = bg[None, :] - hmm.match_emit[1:, :]          # (M, K)
    tmm = -hmm.trans[0:M, 0]                          # ln p(m->m) rows 0..M-1
    # uniform local entry/exit (plan7 local mode simplification)
    entry = -np.log(M)
    V = np.full((M,), -np.inf)
    best = (-np.inf, 0, 0)
    start_of = np.zeros(M, np.int64)
    for i in range(L):
        e = lo[:, x[i]]
        stay = V[:-1] + tmm[1:M]                       # come from state j-1
        newV = np.empty_like(V)
        newV[0] = entry + e[0]
        ns = np.empty_like(start_of)
        ns[0] = i
        cont = stay + e[1:]
        fresh = entry + e[1:]
        take_cont = cont >= fresh
        newV[1:] = np.where(take_cont, cont, fresh)
        ns[1:] = np.where(take_cont, start_of[:-1], i)
        V, start_of = newV, ns
        j = int(np.argmax(V))
        if V[j] > best[0]:
            best = (float(V[j]), int(start_of[j]), i + 1)
    return best


@dataclass
class HMMHit:
    path: list[int]        # graph edge ids
    score: float
    seq: str               # matched subsequence (spelled path slice)
    frame: int = 0         # reading frame for amino profiles (0..5)


def _spell(g: CondensedGraph, path: list[int]) -> str:
    parts = [g.edge_seq(path[0])]
    for e in path[1:]:
        parts.append(g.edge_seq(e)[g.k :])
    return "".join(parts)


def _score_any_frame(hmm: ProfileHMM, seq: str) -> tuple[float, int, int, int]:
    if hmm.K == 4:
        s, a, b = viterbi_score(hmm, seq)
        return s, a, b, 0
    best = (-np.inf, 0, 0, 0)
    for frame in range(6):
        src = seq if frame < 3 else dna.revcomp_str(seq)
        aa = translate(src, frame % 3)
        s, a, b = viterbi_score(hmm, aa)
        if s > best[0]:
            best = (s, a, b, frame)
    return best


def align_hmm_to_graph(
    g: CondensedGraph,
    hmm: ProfileHMM,
    score_threshold: float = 5.0,
    max_paths: int = 1000,
    top: int = 10,
) -> list[HMMHit]:
    """Best-scoring graph paths for the profile (find_best_path.cpp surface).

    Candidate paths: bounded DFS from every edge, path length capped at
    ~1.5x the profile span; each spelled path is Viterbi-scored."""
    span = hmm.length * (3 if hmm.K == 20 else 1)
    max_nt = int(1.5 * span) + g.k
    hits: list[HMMHit] = []
    seen_paths = 0
    ids = [int(e) for e in g.alive_edge_ids()]

    def dfs(path: list[int], length: int):
        nonlocal seen_paths
        if seen_paths >= max_paths:
            return
        seen_paths += 1
        seq = _spell(g, path)
        s, a, b, frame = _score_any_frame(hmm, seq)
        if s >= score_threshold:
            hits.append(HMMHit(path=list(path), score=s, seq=seq, frame=frame))
        if length >= max_nt:
            return
        for e in g.out_edges_of(int(g.e_end[path[-1]])):
            e = int(e)
            if path.count(e) < 2:
                dfs(path + [e], length + int(g.e_len[e]) - g.k)

    for e in ids:
        dfs([e], int(g.e_len[e]))
    # prefer high score, then short path (most specific hit)
    hits.sort(key=lambda h: (-h.score, len(h.path)))
    # deduplicate: drop hits whose edge set is a superset of a better hit
    kept: list[HMMHit] = []
    for h in hits:
        if any(set(k.path) <= set(h.path) for k in kept):
            continue
        kept.append(h)
        if len(kept) >= top:
            break
    return kept
