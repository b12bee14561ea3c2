"""Sequence mapper + paired info tests on synthetic genomes."""
import numpy as np
import pytest

from spades_tpu.alignment.mapper import build_edge_index, map_read_batch
from spades_tpu.core import dna
from spades_tpu.paired.paired_info import (
    build_paired_index,
    cluster_distances,
    estimate_insert_size,
)
from spades_tpu.pipeline.construction import construct_graph
from tests.conftest import random_dna
from tests.test_condense import clean_random_dna


def make_fr_pairs(genome, n, rl, isize, rng, step=None):
    """FR paired reads: r1 forward at p, r2 = rc(genome[p+isize-rl : p+isize])."""
    r1s, r2s = [], []
    positions = range(0, len(genome) - isize, step or max(1, (len(genome) - isize) // n))
    for p in positions:
        r1s.append(genome[p : p + rl])
        r2s.append(dna.revcomp_str(genome[p + isize - rl : p + isize]))
    return r1s, r2s


class TestMapper:
    def test_map_reads_single_edge(self):
        rng = np.random.default_rng(5)
        k = 21
        genome = clean_random_dna(rng, 400, k)
        g = construct_graph([genome], k).graph
        idx = build_edge_index(g)
        assert idx.kmers.shape[0] == 400 - k + 1
        reads = [genome[i : i + 60] for i in range(0, 340, 17)]
        maps = map_read_batch(idx, g, reads)
        e_canon = int(g.canonical_edge_ids()[0])
        spelled = g.edge_seq(e_canon)
        for i, m in enumerate(maps):
            assert m is not None
            s = g.edge_seq(m.edge)
            p = i * 17
            # the read must be spelled by the mapped edge at the offset
            assert s[m.start_offset : m.start_offset + 60] == reads[i]
            assert m.n_hits == 60 - k + 1

    def test_map_rc_reads(self):
        rng = np.random.default_rng(6)
        k = 21
        genome = clean_random_dna(rng, 300, k)
        g = construct_graph([genome], k).graph
        idx = build_edge_index(g)
        rc_reads = [dna.revcomp_str(genome[i : i + 60]) for i in range(0, 240, 30)]
        maps = map_read_batch(idx, g, rc_reads)
        for i, m in enumerate(maps):
            assert m is not None
            s = g.edge_seq(m.edge)
            assert s[m.start_offset : m.start_offset + 60] == rc_reads[i]

    def test_unmappable_read(self):
        rng = np.random.default_rng(7)
        k = 21
        genome = clean_random_dna(rng, 300, k)
        g = construct_graph([genome], k).graph
        idx = build_edge_index(g)
        maps = map_read_batch(idx, g, [random_dna(rng, 60), "ACGT"])
        assert maps == [None, None]


class TestInsertSize:
    def test_is_estimation(self):
        rng = np.random.default_rng(8)
        k = 21
        genome = clean_random_dna(rng, 600, k)
        g = construct_graph([genome], k).graph
        idx = build_edge_index(g)
        r1s, r2s = make_fr_pairs(genome, 40, 80, 200, rng)
        m1 = map_read_batch(idx, g, r1s)
        m2 = map_read_batch(idx, g, r2s)
        stats = estimate_insert_size(
            g, m1, m2, [len(r) for r in r1s], [len(r) for r in r2s]
        )
        assert stats.count > 20
        assert abs(stats.median - 200) <= 1


class TestPairedIndex:
    def test_same_edge_distance_zero(self):
        rng = np.random.default_rng(9)
        k = 21
        genome = clean_random_dna(rng, 600, k)
        g = construct_graph([genome], k).graph
        idx = build_edge_index(g)
        r1s, r2s = make_fr_pairs(genome, 40, 80, 200, rng)
        m1 = map_read_batch(idx, g, r1s)
        m2 = map_read_batch(idx, g, r2s)
        pi = build_paired_index(g, m1, m2, [len(r) for r in r2s], 200.0)
        ci = cluster_distances(pi)
        # all pairs land on the same edge: dominant distance cluster ~= 0
        mask = ci.e1 == ci.e2
        assert mask.any()
        best = np.argmax(ci.weight[mask])
        assert abs(ci.dist[mask][best]) <= 2


class TestArrayBuilders:
    """Vectorized array-based insert-size / paired-index builders must match
    the per-pair list versions (`paired_info.py`)."""

    def _mapped_pair_fixture(self, rng):
        from spades_tpu.pipeline.construction import construct_graph

        genome = random_dna(rng, 3000)
        g = construct_graph([genome], 21).graph
        from spades_tpu.alignment.mapper import build_edge_index, map_read_batch

        idx = build_edge_index(g)
        rl, isize = 100, 400
        r1s, r2s = [], []
        for _ in range(300):
            a = int(rng.integers(0, len(genome) - isize))
            r1s.append(genome[a : a + rl])
            frag = genome[a + isize - rl : a + isize]
            r2s.append(frag[::-1].translate(str.maketrans("ACGT", "TGCA")))
        m1 = map_read_batch(idx, g, r1s)
        m2 = map_read_batch(idx, g, r2s)
        return g, m1, m2, rl

    def test_equivalence(self, rng):
        from spades_tpu.paired.paired_info import (
            build_paired_index,
            build_paired_index_arrays,
            estimate_insert_size,
            estimate_insert_size_arrays,
        )

        g, m1, m2, rl = self._mapped_pair_fixture(rng)
        e1 = np.array([m.edge if m else -1 for m in m1], np.int64)
        s1 = np.array([m.start_offset if m else 0 for m in m1], np.int64)
        e2 = np.array([m.edge if m else -1 for m in m2], np.int64)
        s2 = np.array([m.start_offset if m else 0 for m in m2], np.int64)
        st_list = estimate_insert_size(g, m1, m2, [rl] * len(m1), [rl] * len(m2))
        st_arr = estimate_insert_size_arrays(g, e1, s1, e2, s2)
        assert st_list.count == st_arr.count
        assert st_list.median == st_arr.median
        assert st_list.mad == st_arr.mad
        pi_list = build_paired_index(g, m1, m2, [rl] * len(m2), st_list.median)
        pi_arr = build_paired_index_arrays(g, e1, s1, e2, s2, st_list.median)
        assert np.array_equal(pi_list.e1, pi_arr.e1)
        assert np.array_equal(pi_list.e2, pi_arr.e2)
        assert np.array_equal(pi_list.dist, pi_arr.dist)
        assert np.array_equal(pi_list.weight, pi_arr.weight)

    def test_rc_store_orientation_roundtrip(self, rng):
        """Mapping rc(read2) and converting back must equal mapping read2."""
        from spades_tpu.alignment.mapper import build_edge_index, map_read_batch
        from spades_tpu.pipeline.construction import construct_graph

        genome = random_dna(rng, 2000)
        g = construct_graph([genome], 21).graph
        idx = build_edge_index(g)
        rl = 90
        r2s = [genome[a : a + rl] for a in rng.integers(0, len(genome) - rl, 50)]
        r2rc = [s[::-1].translate(str.maketrans("ACGT", "TGCA")) for s in r2s]
        m_direct = map_read_batch(idx, g, r2s)
        m_rc = map_read_batch(idx, g, r2rc)
        for md, mr in zip(m_direct, m_rc):
            if md is None or mr is None:
                continue
            e2 = int(g.e_conj[mr.edge])
            s2 = int(g.e_len[mr.edge]) - (mr.start_offset + rl)
            assert e2 == md.edge
            assert s2 == md.start_offset
