"""Corrector-core depth (VERDICT r4 item 8): bucketed contig polishing with
interesting-position machinery (reference: corrector/dataset_processor.hpp,
interesting_pos_processor.cpp)."""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.polish import CorrectorConfig, polish_contigs
from tests.conftest import random_dna


def _plant_mismatches(seq: str, n: int, rng, min_gap: int = 300):
    codes = dna.encode(seq).copy()
    positions = np.arange(min_gap, len(seq) - min_gap, min_gap)[:n]
    for p in positions:
        codes[p] = (codes[p] + 1 + rng.integers(0, 3)) % 4
    return dna.decode(codes), positions


def _reads_from(genome: str, rng, rl=100, cov=20):
    g = dna.encode(genome)
    n = len(genome) * cov // rl
    starts = rng.integers(0, len(genome) - rl, n)
    return [dna.decode(g[s : s + rl]) for s in starts]


class TestMajorityPolish:
    def test_1mb_planted_mismatches_fixed(self):
        rng = np.random.default_rng(1)
        genome = random_dna(rng, 1_000_000)
        # two contigs covering the genome, with planted errors
        c1_true, c2_true = genome[:500_000], genome[500_000:]
        c1, p1 = _plant_mismatches(c1_true, 300, rng)
        c2, p2 = _plant_mismatches(c2_true, 300, rng)
        n_planted = len(p1) + len(p2)
        reads = _reads_from(genome, rng)
        # bounded memory: force multiple buckets
        cfg = CorrectorConfig(bucket_nt=600_000)
        corrected, stats = polish_contigs([c1, c2], reads, cfg)
        fixed = stats["fixed_simple"] + stats["fixed_interesting"]
        assert fixed >= 0.99 * n_planted, (fixed, n_planted)
        # no true position touched: corrected must equal the true contigs
        # everywhere reads covered (ends may be uncovered -> unchanged)
        d1 = np.flatnonzero(dna.encode(corrected[0]) != dna.encode(c1_true))
        d2 = np.flatnonzero(dna.encode(corrected[1]) != dna.encode(c2_true))
        # any residue must be an unfixed planted position, never a new error
        assert set(d1) <= set(p1.tolist())
        assert set(d2) <= set(p2.tolist())

    def test_no_votes_no_change(self):
        rng = np.random.default_rng(2)
        c = random_dna(rng, 5000)
        corrected, stats = polish_contigs([c], [], CorrectorConfig())
        assert corrected == [c]
        assert stats["fixed_simple"] == 0

    def test_reverse_strand_reads_vote_correctly(self):
        rng = np.random.default_rng(3)
        genome = random_dna(rng, 20_000)
        contig, planted = _plant_mismatches(genome, 20, rng, min_gap=500)
        g = dna.encode(genome)
        rl = 100
        reads = [
            dna.revcomp_str(dna.decode(g[s : s + rl]))
            for s in rng.integers(0, len(genome) - rl, 4000)
        ]
        corrected, stats = polish_contigs([contig], reads, CorrectorConfig())
        assert corrected[0] == genome
        assert stats["fixed_simple"] >= len(planted) - 1


class TestInterestingPositions:
    def test_mixed_votes_not_flipped_by_simple_majority(self):
        """A 60/40 vote split (>=20 votes) is an interesting position — the
        simple majority pass must NOT touch it; the weighted sweeps decide."""
        rng = np.random.default_rng(4)
        genome = random_dna(rng, 10_000)
        g = dna.encode(genome)
        rl = 100
        # 60% of reads carry a variant base at position 5000
        var = dna.decode(np.array([(g[5000] + 1) % 4], np.uint8))
        reads = []
        for s in rng.integers(4800, 4999 - rl + 98, 60):
            s = int(min(s, 5000))
            r = list(genome[s : s + rl])
            if s <= 5000 < s + rl:
                r[5000 - s] = var
            reads.append("".join(r))
        for s in rng.integers(4800, 5000, 40):
            reads.append(genome[int(s) : int(s) + rl])
        # plus clean coverage elsewhere
        reads += _reads_from(genome, rng, cov=10)
        corrected, stats = polish_contigs([genome], reads, CorrectorConfig())
        assert stats["interesting_positions"] >= 1
        # position 5000 was decided by the weighted pass (either outcome is
        # legal depending on read weights), but no OTHER position changed
        diff = np.flatnonzero(dna.encode(corrected[0]) != g)
        assert set(diff.tolist()) <= {5000}
