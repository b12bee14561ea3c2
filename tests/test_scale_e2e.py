"""Routine scale end-to-end tests with QUAST-style assertions.

The teamcity nightly-harness analog (`/root/reference/src/test/teamcity/
teamcity.py:66-105`: per-dataset thresholds on genome fraction, misassembly
count, N50) on synthetic genomes large enough to exercise int32/overflow and
batching paths (the class of bug round 1 only caught ad hoc at 200 kb).

Error-free reads make the QUAST metrics exact: a contig is misassembly-free
iff it is an exact substring of the genome (or its reverse complement);
genome fraction is the union of aligned contig intervals.
"""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.pipeline.run import run_assembly


def paired_reads(genome, rng, rl=100, insert=300, cov=40):
    n_pairs = len(genome) * cov // (2 * rl)
    starts = rng.integers(0, len(genome) - insert, n_pairs)
    lefts = [genome[a : a + rl] for a in starts]
    rights = [dna.revcomp_str(genome[a + insert - rl : a + insert]) for a in starts]
    return lefts, rights


def quast_metrics(contigs, genomes):
    """(genome_fraction per genome, n_misassembled, N50) by exact alignment."""
    rcs = [dna.revcomp_str(g) for g in genomes]
    cover = [np.zeros(len(g), bool) for g in genomes]
    mis = 0
    lens = sorted((len(s) for s in contigs), reverse=True)
    for s in contigs:
        placed = False
        for gi, (g, rc) in enumerate(zip(genomes, rcs)):
            i = g.find(s)
            if i < 0:
                j = rc.find(s)
                i = len(g) - j - len(s) if j >= 0 else -1
            if i >= 0:
                cover[gi][i : i + len(s)] = True
                placed = True
                break
        if not placed:
            mis += 1
    total = sum(lens)
    acc, n50 = 0, 0
    for L in lens:
        acc += L
        if acc * 2 >= total:
            n50 = L
            break
    return [c.mean() for c in cover], mis, n50


class TestUniform200kb:
    def test_single_contig_reconstruction(self, tmp_path):
        rng = np.random.default_rng(5)
        genome = dna.decode(rng.integers(0, 4, 200_000).astype(np.uint8))
        lefts, rights = paired_reads(genome, rng)
        res = run_assembly(
            lefts + rights, [55], str(tmp_path / "a"),
            paired_libs=[(lefts, rights)], read_length=100, checkpoints="none",
        )
        fracs, mis, n50 = quast_metrics([c.seq for c in res.contigs], [genome])
        assert mis == 0
        assert fracs[0] >= 0.999
        assert n50 >= 150_000


class TestRepeatRich100kb:
    def _genome(self, rng):
        """~120 kb with planted tandem + dispersed + inverted repeats, all
        shorter than the insert size (resolvable by paired info / loop
        resolver)."""
        def rnd(n):
            return dna.decode(rng.integers(0, 4, n).astype(np.uint8))

        R1 = rnd(180)   # dispersed repeat (2 copies)
        R2 = rnd(150)   # tandem repeat (2 adjacent copies -> short loop)
        R3 = rnd(160)   # inverted repeat (copy + rc copy)
        parts = [
            rnd(20_000), R1,
            rnd(20_000), R2, R2,
            rnd(20_000), R3,
            rnd(20_000), R1,
            rnd(20_000), dna.revcomp_str(R3),
            rnd(20_000),
        ]
        return "".join(parts)

    def test_resolved_by_paired_info(self, tmp_path):
        rng = np.random.default_rng(11)
        genome = self._genome(rng)
        lefts, rights = paired_reads(genome, rng, rl=100, insert=400, cov=40)
        res = run_assembly(
            lefts + rights, [55], str(tmp_path / "a"),
            paired_libs=[(lefts, rights)], read_length=100, checkpoints="none",
        )
        fracs, mis, n50 = quast_metrics([c.seq for c in res.contigs], [genome])
        assert mis == 0, "misassembled contigs"
        assert fracs[0] >= 0.99
        # repeats shorter than the insert must not fragment the assembly to
        # pieces: near-reference N50 (reference-grade would be ~whole genome)
        assert n50 >= 20_000


class TestMetaUnevenCoverage:
    def test_two_genomes_uneven(self, tmp_path):
        rng = np.random.default_rng(23)
        g1 = dna.decode(rng.integers(0, 4, 60_000).astype(np.uint8))
        g2 = dna.decode(rng.integers(0, 4, 60_000).astype(np.uint8))
        l1, r1 = paired_reads(g1, rng, cov=50)
        l2, r2 = paired_reads(g2, rng, cov=8)
        lefts, rights = l1 + l2, r1 + r2
        res = run_assembly(
            lefts + rights, [55], str(tmp_path / "a"), mode="meta",
            paired_libs=[(lefts, rights)], read_length=100, checkpoints="none",
        )
        fracs, mis, n50 = quast_metrics([c.seq for c in res.contigs], [g1, g2])
        assert mis == 0
        assert fracs[0] >= 0.99   # abundant genome fully recovered
        assert fracs[1] >= 0.95   # rare genome may lose a little at cov 8
