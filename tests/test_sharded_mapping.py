"""Multi-chip sharded read mapping vs the host mapper (virtual CPU mesh)."""
import numpy as np
import pytest

from spades_tpu.alignment.mapper import build_edge_index, map_read_batch
from spades_tpu.core.reads import ReadBatch
from spades_tpu.graph.graph import CondensedGraph
from spades_tpu.parallel.sharded_count import make_mesh
from spades_tpu.parallel.sharded_mapping import (
    device_searchsorted_rows,
    map_reads_sharded,
    pair_info_sharded,
)
from tests.conftest import random_dna


class TestDeviceSearchsorted:
    def test_matches_host(self, rng):
        import jax.numpy as jnp

        hay = np.unique(
            rng.integers(0, 2**32, (500, 2), dtype=np.uint32), axis=0
        )
        order = np.lexsort((hay[:, 1], hay[:, 0]))
        hay = hay[order]
        needles = np.concatenate([hay[::7], rng.integers(0, 2**32, (50, 2), dtype=np.uint32)])
        got = np.asarray(device_searchsorted_rows(jnp.asarray(hay), jnp.asarray(needles)))
        from spades_tpu.ops.count import searchsorted_rows

        exp = searchsorted_rows(hay, needles)
        assert np.array_equal(got, exp)


@pytest.fixture
def graph_and_reads(rng):
    k = 21
    genome = random_dna(rng, 600)
    g = CondensedGraph.from_sequences([genome], k)
    reads = []
    from spades_tpu.core import dna

    for i in range(64):
        a = int(rng.integers(0, len(genome) - 60))
        r = genome[a : a + 60]
        reads.append(r if i % 2 == 0 else dna.revcomp_str(r))
    return g, reads


class TestShardedMapping:
    def test_matches_host_mapper(self, graph_and_reads):
        g, reads = graph_and_reads
        index = build_edge_index(g)
        batch = ReadBatch.from_sequences(reads)
        mesh = make_mesh(4)
        edge, start, votes = map_reads_sharded(index, g, batch, mesh)
        host = map_read_batch(index, g, reads)
        n_match = 0
        for i, m in enumerate(host):
            if m is None:
                assert edge[i] == -1 or votes[i] <= 1
                continue
            assert edge[i] == m.edge, f"read {i}: {edge[i]} vs {m.edge}"
            assert start[i] == m.start_offset
            n_match += 1
        assert n_match >= len(reads) * 0.9

    def test_pair_info(self, graph_and_reads, rng):
        g, _ = graph_and_reads
        from spades_tpu.core import dna

        genome = g.edge_seq(0)
        ins, rlen = 200, 60
        r1s, r2s = [], []
        for _ in range(32):
            a = int(rng.integers(0, len(genome) - ins))
            r1s.append(genome[a : a + rlen])
            r2s.append(dna.revcomp_str(genome[a + ins - rlen : a + ins]))
        index = build_edge_index(g)
        mesh = make_mesh(4)
        b1 = ReadBatch.from_sequences(r1s)
        b2 = ReadBatch.from_sequences(r2s)
        e1a, s1a, _ = map_reads_sharded(index, g, b1, mesh)
        e2a, s2a, _ = map_reads_sharded(index, g, b2, mesh)
        e1, e2, d = pair_info_sharded(g, e1a, s1a, e2a, s2a, insert_size=ins)
        assert len(e1) >= 28
        # same-edge pairs: distance estimates ~0 (edge starts coincide)
        same = e2 == e1
        assert same.all()
        assert np.abs(d).max() <= 2


class TestShardedVotes:
    def test_matches_host_position_votes(self, graph_and_reads):
        g, reads = graph_and_reads
        from spades_tpu.alignment.mismatch import position_votes
        from spades_tpu.parallel.sharded_mapping import position_votes_sharded

        index = build_edge_index(g)
        batch = ReadBatch.from_sequences(reads)
        mesh = make_mesh(4)
        got = position_votes_sharded(index, g, batch, mesh)
        exp = position_votes(g, reads, index)
        assert got.shape == exp.shape
        # identical votes wherever the two mappers agree; allow tiny slack
        diff = np.abs(got.astype(np.int64) - exp.astype(np.int64)).sum()
        assert diff <= 0.02 * exp.sum() + 1, (diff, exp.sum())
