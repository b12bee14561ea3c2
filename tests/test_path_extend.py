"""Repeat resolution: the classic A-R-B-R-C two-copy repeat must resolve."""
import numpy as np
import pytest

from spades_tpu.alignment.mapper import build_edge_index, map_read_batch
from spades_tpu.core import dna
from spades_tpu.paired.paired_info import build_paired_index, estimate_insert_size
from spades_tpu.paired.path_extend import (
    PEConfig,
    Path,
    conj_path,
    path_sequence,
    resolve_repeats,
    scaffold_paths,
)
from spades_tpu.pipeline.construction import construct_graph
from tests.conftest import random_dna
from tests.test_condense import clean_random_dna, is_clean
from tests.test_mapper_paired import make_fr_pairs


def repeat_genome(rng, k, a=200, r=60, b=200, c=200):
    """A + R + B + R + C with all other k-mers unique."""
    for _ in range(200):
        A = random_dna(rng, a)
        R = random_dna(rng, r)
        B = random_dna(rng, b)
        C = random_dna(rng, c)
        g = A + R + B + R + C
        # cleanliness: each k-mer appears once except those inside R (twice)
        from tests.test_condense import canonical_kmer_multiset

        ms = canonical_kmer_multiset(g, k)
        from collections import Counter

        cnt = Counter(ms)
        n_twice = sum(1 for v in cnt.values() if v == 2)
        n_more = sum(1 for v in cnt.values() if v > 2)
        if n_more == 0 and n_twice == r - k + 1:
            return g, (A, R, B, C)
    raise RuntimeError("could not build clean repeat genome")


class TestRepeatResolution:
    def test_arbrc_resolves_to_single_path(self):
        rng = np.random.default_rng(11)
        k = 21
        genome, _ = repeat_genome(rng, k)
        g = construct_graph([genome], k).graph
        # repeat collapses: more than 1 edge, repeat edge has coverage 2
        assert len(g.canonical_edge_ids()) > 1

        idx = build_edge_index(g)
        r1s, r2s = make_fr_pairs(genome, 0, 50, 200, rng, step=2)
        m1 = map_read_batch(idx, g, r1s)
        m2 = map_read_batch(idx, g, r2s)
        stats = estimate_insert_size(g, m1, m2, [50] * len(r1s), [50] * len(r2s))
        assert abs(stats.median - 200) < 10
        pi = build_paired_index(g, m1, m2, [50] * len(r2s), stats.median)
        cfg = PEConfig(insert_size=stats.median, is_var=max(stats.mad, 10.0))
        paths = resolve_repeats(g, pi, cfg)
        seqs = [path_sequence(g, p) for p in paths]
        best = max(seqs, key=len)
        assert best in (genome, dna.revcomp_str(genome)), (
            len(best), len(genome), [len(s) for s in seqs],
        )

    def test_no_pairs_no_resolution(self):
        # a CROSS repeat (two chromosomes sharing R: A-R-B and C-R-D) is not
        # the canonical short-loop pattern, so without paired info it must
        # stay unresolved (no wrong joins)
        rng = np.random.default_rng(12)
        k = 21
        A = clean_random_dna(rng, 150, k)
        R = clean_random_dna(rng, 60, k)
        B = clean_random_dna(rng, 150, k)
        C = clean_random_dna(rng, 150, k)
        D = clean_random_dna(rng, 150, k)
        chr1, chr2 = A + R + B, C + R + D
        g = construct_graph([chr1, chr2], k).graph
        from spades_tpu.paired.paired_info import PairedIndex

        z = np.zeros(0)
        pi = PairedIndex(z.astype(np.int64), z.astype(np.int64), z, z)
        paths = resolve_repeats(g, pi, PEConfig())
        seqs = [path_sequence(g, p) for p in paths]
        bad = {chr1, dna.revcomp_str(chr1), chr2, dna.revcomp_str(chr2),
               A + R + D, C + R + B}
        assert all(s not in bad for s in seqs)

    def test_coverage_loop_resolution_without_pairs(self):
        # the dumbbell A-R-B-R-C IS the canonical short loop: the coverage
        # loop estimator resolves it with zero paired info
        # (path_extender.hpp CoverageLoopEstimator)
        rng = np.random.default_rng(12)
        k = 21
        genome, _ = repeat_genome(rng, k)
        g = construct_graph([genome], k).graph
        from spades_tpu.paired.paired_info import PairedIndex

        z = np.zeros(0)
        pi = PairedIndex(z.astype(np.int64), z.astype(np.int64), z, z)
        paths = resolve_repeats(g, pi, PEConfig())
        seqs = [path_sequence(g, p) for p in paths]
        best = max(seqs, key=len)
        assert best in (genome, dna.revcomp_str(genome))


class TestScaffolding:
    def test_gap_joined_with_ns(self):
        rng = np.random.default_rng(13)
        k = 21
        # two unique contig regions separated by an unsequenced gap
        left = clean_random_dna(rng, 300, k)
        gap = 40
        right = clean_random_dna(rng, 300, k)
        genome = left + random_dna(rng, gap) + right
        # reads cover left and right only (gap unsequenced)
        reads = [genome[i : i + 60] for i in range(0, 240, 3)]
        reads += [genome[i : i + 60] for i in range(340 + gap - 40, len(genome) - 60, 3)]
        g = construct_graph(reads, k).graph
        assert len(g.canonical_edge_ids()) == 2

        idx = build_edge_index(g)
        # pairs spanning the gap
        r1s, r2s = make_fr_pairs(genome, 0, 60, 250, rng, step=3)
        m1 = map_read_batch(idx, g, r1s)
        m2 = map_read_batch(idx, g, r2s)
        pi = build_paired_index(g, m1, m2, [60] * len(r2s), 250.0)
        cfg = PEConfig(insert_size=250.0, is_var=10.0)
        paths = resolve_repeats(g, pi, cfg)
        paths = scaffold_paths(g, pi, paths, cfg)
        seqs = [path_sequence(g, p) for p in paths]
        best = max(seqs, key=len)
        assert "N" in best
        # scaffold = left ... right (or rc); length within gap-estimate noise
        assert abs(len(best) - len(genome)) < 25
        core_l = left[:250]
        assert core_l in best or dna.revcomp_str(core_l) in best


class TestScaffolder2015:
    def _graph_three_long_edges(self, rng):
        import numpy as np
        from spades_tpu.graph.graph import CondensedGraph
        from tests.conftest import random_dna

        k = 21
        segs = [random_dna(rng, 800) for _ in range(3)]
        g = CondensedGraph.from_sequences(segs, k)
        return g, segs

    def test_graph_and_join(self, rng):
        import numpy as np
        from spades_tpu.paired.paired_info import PairedIndex
        from spades_tpu.paired.path_extend import (
            PEConfig, Path, build_scaffold_graph_2015, scaffold_with_graph_2015,
        )

        g, segs = self._graph_three_long_edges(rng)
        eA, eB, eC = 0, 2, 4
        # mate-pair support: A -> B (strong), A -> C (weak, filtered)
        pi = PairedIndex(
            e1=np.array([eA, eA, eB], np.int64),
            e2=np.array([eB, eC, eC], np.int64),
            dist=np.array([2000, 4000, 2000], np.int64),
            weight=np.array([9.0, 1.0, 8.0]),
        )
        sg = build_scaffold_graph_2015(g, pi, min_edge_length=100, min_weight=2.0)
        assert sg.num_edges == 2  # A->B and B->C survive, A->C filtered
        paths = [Path([eA]), Path([eB]), Path([eC])]
        joined = scaffold_with_graph_2015(g, sg, paths, PEConfig())
        assert len(joined) == 1
        assert joined[0].edges == [eA, eB, eC]
        assert joined[0].gaps[1] > 0  # N gap inserted at the join

    def test_ambiguous_links_not_joined(self, rng):
        import numpy as np
        from spades_tpu.paired.paired_info import PairedIndex
        from spades_tpu.paired.path_extend import (
            PEConfig, Path, build_scaffold_graph_2015, scaffold_with_graph_2015,
        )

        g, _ = self._graph_three_long_edges(rng)
        eA, eB, eC = 0, 2, 4
        # A links to BOTH B and C strongly -> ambiguous, no join
        pi = PairedIndex(
            e1=np.array([eA, eA], np.int64),
            e2=np.array([eB, eC], np.int64),
            dist=np.array([2000, 2000], np.int64),
            weight=np.array([9.0, 9.0]),
        )
        sg = build_scaffold_graph_2015(g, pi, min_edge_length=100)
        joined = scaffold_with_graph_2015(
            g, sg, [Path([eA]), Path([eB]), Path([eC])], PEConfig()
        )
        assert len(joined) == 3

    def test_dominant_link_resolves_ambiguous_fan(self, rng):
        """connection_condition2015.hpp relative-weight rule: an ambiguous
        fan IS joined when one link dominates the others by the cutoff."""
        import numpy as np
        from spades_tpu.paired.paired_info import PairedIndex
        from spades_tpu.paired.path_extend import (
            PEConfig, Path, build_scaffold_graph_2015, scaffold_with_graph_2015,
        )

        g, _ = self._graph_three_long_edges(rng)
        eA, eB, eC = 0, 2, 4
        # A -> B carries 4.5x the weight of A -> C: dominant, join A-B
        pi = PairedIndex(
            e1=np.array([eA, eA], np.int64),
            e2=np.array([eB, eC], np.int64),
            dist=np.array([2000, 2000], np.int64),
            weight=np.array([9.0, 2.0]),
        )
        sg = build_scaffold_graph_2015(g, pi, min_edge_length=100)
        assert sg.num_edges == 2  # both links above min_weight
        joined = scaffold_with_graph_2015(
            g, sg, [Path([eA]), Path([eB]), Path([eC])], PEConfig()
        )
        by_edges = sorted(tuple(p.edges) for p in joined)
        assert (eA, eB) in by_edges and (eC,) in by_edges
        # at cutoff 9/2 < 5: raising the cutoff refuses the join
        strict = scaffold_with_graph_2015(
            g, sg, [Path([eA]), Path([eB]), Path([eC])], PEConfig(),
            relative_cutoff=5.0,
        )
        assert len(strict) == 3
