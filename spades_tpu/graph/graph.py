"""Condensed (conjugate, double-stranded) de Bruijn graph as flat arrays.

Capability mirror of the reference's pointer-based conjugate graph
(`/root/reference/src/common/assembly_graph/core/graph_core.hpp:29-121`,
`core/graph.hpp:20`): every edge carries its full nucleotide sequence, edges
and vertices are paired with reverse-complement conjugates, vertices are
k-overlaps between edges.

TPU-native re-design: structure-of-arrays instead of objects+observers.
Edges are rows of parallel arrays (start vertex, end vertex, sequence slice
into a flat base pool, coverage sum, conjugate id, alive flag).  Mutation =
masked rewrites of the `alive` column; topology queries are vectorized
group-bys; re-condensation after deletions is the same pointer-doubling chain
extraction used at construction time (spades_tpu.ops.condense).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core import dna


@dataclass
class CondensedGraph:
    """Flat-array conjugate de Bruijn graph.

    Vertices are oriented junction k-mers; `v_conj[v]` is the id of the
    reverse-complement vertex.  Edges overlap their endpoint vertices by k nt.
    Dead edges stay in the arrays with alive=False until `compact()`.
    """

    k: int
    # --- edges ---
    e_start: np.ndarray  # (E,) int64 vertex id
    e_end: np.ndarray    # (E,) int64 vertex id
    e_conj: np.ndarray   # (E,) int64 conjugate edge id (may equal self)
    e_off: np.ndarray    # (E,) int64 offset into seq_pool
    e_len: np.ndarray    # (E,) int64 sequence length in nt (>= k+1)
    e_cov: np.ndarray    # (E,) float64 coverage sum over (k+1)-mer positions
    alive: np.ndarray    # (E,) bool
    seq_pool: np.ndarray  # (sum e_len,) uint8 base codes
    # --- vertices ---
    v_conj: np.ndarray   # (V,) int64

    @property
    def num_edges(self) -> int:
        return int(self.alive.sum())

    @property
    def num_vertices(self) -> int:
        return int(self.v_conj.shape[0])

    # -- sequences ------------------------------------------------------
    def edge_codes(self, e: int) -> np.ndarray:
        o, n = int(self.e_off[e]), int(self.e_len[e])
        return self.seq_pool[o : o + n]

    def edge_seq(self, e: int) -> str:
        return dna.decode(self.edge_codes(e))

    def edge_nt_lengths(self) -> np.ndarray:
        return self.e_len

    def edge_kmer_lengths(self) -> np.ndarray:
        """Edge length in dBG arcs == #(k+1)-mers == nt length - k.

        This is the reference's `length()` unit (graph_core edge length)."""
        return self.e_len - self.k

    def coverage(self) -> np.ndarray:
        """Average k-mer coverage per edge (reference: cov_sum / length)."""
        L = np.maximum(self.edge_kmer_lengths(), 1)
        return self.e_cov / L

    # -- topology -------------------------------------------------------
    def out_edges_of(self, v: int) -> np.ndarray:
        return np.flatnonzero(self.alive & (self.e_start == v))

    def in_edges_of(self, v: int) -> np.ndarray:
        return np.flatnonzero(self.alive & (self.e_end == v))

    def out_degrees(self) -> np.ndarray:
        """(V,) number of alive out-edges per vertex."""
        return np.bincount(
            self.e_start[self.alive], minlength=self.num_vertices
        ).astype(np.int64)

    def in_degrees(self) -> np.ndarray:
        return np.bincount(
            self.e_end[self.alive], minlength=self.num_vertices
        ).astype(np.int64)

    # -- mutation -------------------------------------------------------
    def kill_edges(self, edge_ids: np.ndarray) -> int:
        """Remove edges and their conjugates. Returns number removed."""
        edge_ids = np.asarray(edge_ids)
        if edge_ids.dtype == bool:
            edge_ids = np.flatnonzero(edge_ids)
        before = self.num_edges
        self.alive[edge_ids] = False
        self.alive[self.e_conj[edge_ids]] = False
        return before - self.num_edges

    def check_invariants(self) -> None:
        a = self.alive
        assert np.array_equal(self.e_conj[self.e_conj], np.arange(len(a))), "conj not involution"
        assert np.array_equal(a, a[self.e_conj]), "conj liveness mismatch"
        assert np.array_equal(self.e_len[a], self.e_len[self.e_conj[a]]), "conj length mismatch"
        assert np.array_equal(
            self.v_conj[self.v_conj], np.arange(self.num_vertices)
        ), "vertex conj not involution"
        # conjugate edge endpoints are conjugated & swapped
        assert np.array_equal(self.e_start[self.e_conj[a]], self.v_conj[self.e_end[a]])
        assert np.array_equal(self.e_end[self.e_conj[a]], self.v_conj[self.e_start[a]])
        # conjugate sequences are reverse complements
        for e in np.flatnonzero(a)[: min(50, len(a))]:
            ec = int(self.e_conj[e])
            assert np.array_equal(
                dna.revcomp_codes(self.edge_codes(e)), self.edge_codes(ec)
            ), f"edge {e} conj seq mismatch"

    @classmethod
    def from_sequences(cls, seqs: list[str], k: int) -> "CondensedGraph":
        """Trivial graph: each sequence is one isolated conjugate edge pair.

        Used by the contig polisher (corrector) and tests — no dBG
        construction, just the flat-array container around given sequences."""
        g = cls(
            k=k,
            e_start=np.zeros(0, np.int64), e_end=np.zeros(0, np.int64),
            e_conj=np.zeros(0, np.int64), e_off=np.zeros(0, np.int64),
            e_len=np.zeros(0, np.int64), e_cov=np.zeros(0, np.float64),
            alive=np.zeros(0, bool), seq_pool=np.zeros(0, np.uint8),
            v_conj=np.zeros(0, np.int64),
        )
        for s in seqs:
            v0 = len(g.v_conj)
            # 4 vertices per edge pair: start/end and their conjugates
            g.v_conj = np.append(g.v_conj, [v0 + 2, v0 + 3, v0, v0 + 1])
            codes = dna.encode(s)
            codes = np.where(codes >= 4, 0, codes).astype(np.uint8)
            g.add_edge_pair(v0, v0 + 1, codes)
        return g

    def add_edge_pair(self, start: int, end: int, codes: np.ndarray, cov_sum: float = 0.0) -> tuple[int, int]:
        """Append a new edge and its conjugate (graph_core AddEdge semantics).

        codes is the forward nucleotide sequence (>= k+1 nt); the conjugate
        edge gets the reverse complement between the conjugate vertices.
        Returns (edge id, conjugate edge id)."""
        codes = np.asarray(codes, np.uint8)
        assert len(codes) >= self.k + 1
        e = len(self.e_start)
        rc = dna.revcomp_codes(codes)
        self.e_start = np.append(self.e_start, [start, self.v_conj[end]])
        self.e_end = np.append(self.e_end, [end, self.v_conj[start]])
        self.e_conj = np.append(self.e_conj, [e + 1, e])
        self.e_off = np.append(self.e_off, [len(self.seq_pool), len(self.seq_pool) + len(codes)])
        self.e_len = np.append(self.e_len, [len(codes), len(codes)])
        self.e_cov = np.append(self.e_cov, [cov_sum, cov_sum])
        self.alive = np.append(self.alive, [True, True])
        self.seq_pool = np.concatenate([self.seq_pool, codes, rc])
        return e, e + 1

    def add_vertex_pair(self) -> tuple[int, int]:
        """Append a fresh conjugate vertex pair (graph_core AddVertex)."""
        v = self.num_vertices
        self.v_conj = np.append(self.v_conj, [v + 1, v])
        return v, v + 1

    def split_edge(self, e: int, pos: int) -> tuple[int, int]:
        """Split edge e at k-mer offset pos (graph_core SplitEdge semantics):
        a new conjugate vertex pair appears in the middle, the two halves
        share the k-overlap, coverage splits proportionally, and the old
        edge (plus conjugate) dies.  Returns (first_half, second_half)."""
        e = int(e)
        assert self.alive[e] and e != int(self.e_conj[e]), "cannot split self-conj"
        kl = int(self.e_len[e]) - self.k
        assert 0 < pos < kl, (pos, kl)
        codes = self.edge_codes(e)
        first = codes[: pos + self.k]
        second = codes[pos:]
        v, _vc = self.add_vertex_pair()
        frac = pos / kl
        c1 = float(self.e_cov[e]) * frac
        c2 = float(self.e_cov[e]) - c1
        a, _ = self.add_edge_pair(int(self.e_start[e]), v, first, c1)
        b, _ = self.add_edge_pair(v, int(self.e_end[e]), second, c2)
        self.kill_edges(np.array([e]))
        return a, b

    def alive_edge_ids(self) -> np.ndarray:
        return np.flatnonzero(self.alive)

    def canonical_edge_ids(self) -> np.ndarray:
        """One representative per conjugate pair (includes self-conjugates)."""
        ids = self.alive_edge_ids()
        return ids[ids <= self.e_conj[ids]]
