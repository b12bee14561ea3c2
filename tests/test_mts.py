"""MTS equivalent: multi-sample multiplicity profiles, abundance, binning."""
import os

import numpy as np
import pytest

from spades_tpu.mts.abundance import contig_profiles, median_mad, winsorized_mean_var
from spades_tpu.mts.binning import canopy_bins
from spades_tpu.mts.multiplicity import (
    KmerProfiles, combine_multiplicities, profiles_from_read_sets,
)
from spades_tpu.ops.count import count_sequences
from tests.conftest import random_dna


def reads_from(genome: str, n: int, rlen: int, rng):
    return [
        genome[s : s + rlen]
        for s in rng.integers(0, len(genome) - rlen, n)
    ]


class TestMultiplicity:
    def test_combine_and_filter(self, rng):
        g1 = random_dna(rng, 300)
        g2 = random_dna(rng, 300)
        k = 21
        # sample A: only genome 1; sample B: both
        cA = count_sequences(reads_from(g1, 200, 60, rng), k)
        cB = count_sequences(
            reads_from(g1, 200, 60, rng) + reads_from(g2, 200, 60, rng), k
        )
        prof = combine_multiplicities([cA, cB], min_samples=1, min_mult=5)
        assert prof.num_samples == 2
        assert prof.num_kmers > 0
        # k-mers of g2 must show zero multiplicity in sample A
        c2 = count_sequences([g2], k)
        m = prof.lookup(c2.words)
        present = m[:, 1] > 0
        assert present.any()
        assert (m[present, 0] == 0).mean() > 0.9

        strict = combine_multiplicities([cA, cB], min_samples=2, min_mult=5)
        assert strict.num_kmers < prof.num_kmers

    def test_roundtrip(self, rng, tmp_path):
        c = count_sequences(reads_from(random_dna(rng, 200), 100, 50, rng), 21)
        prof = combine_multiplicities([c], min_samples=1, min_mult=2)
        path = str(tmp_path / "profiles.npz")
        prof.save(path)
        loaded = KmerProfiles.load(path)
        assert loaded.k == prof.k
        assert np.array_equal(loaded.words, prof.words)
        assert np.array_equal(loaded.mpl, prof.mpl)


class TestAbundance:
    def test_estimators(self):
        m = np.array([[10, 0], [12, 0], [11, 0], [100, 0]], np.uint16)
        med, mad = median_mad(m)
        assert med[0] == pytest.approx(11.5)
        assert med[1] == 0
        mean, var = winsorized_mean_var(m, frac=0.25)
        assert mean[0] < np.mean(m[:, 0])  # winsorizing tames the outlier

    def test_contig_profiles(self, rng):
        g1 = random_dna(rng, 400)
        g2 = random_dna(rng, 400)
        k = 21
        # g1 deep in sample 1, shallow in 2; g2 the opposite
        sets = [
            reads_from(g1, 400, 60, rng) + reads_from(g2, 50, 60, rng),
            reads_from(g1, 50, 60, rng) + reads_from(g2, 400, 60, rng),
        ]
        prof = profiles_from_read_sets(sets, k, min_samples=1, min_mult=2)
        ab, disp, ok = contig_profiles(prof, [g1, g2])
        assert ok.all()
        assert ab[0, 0] > ab[0, 1]
        assert ab[1, 1] > ab[1, 0]
        # unknown contig: not ok
        ab2, _, ok2 = contig_profiles(prof, [random_dna(rng, 300)])
        assert not ok2[0]


class TestBinning:
    def test_canopy_recovers_two_groups(self, rng):
        a = np.array([50.0, 5.0, 40.0])
        b = np.array([3.0, 60.0, 8.0])
        profs = np.vstack(
            [a * rng.uniform(0.8, 1.2) for _ in range(5)]
            + [b * rng.uniform(0.8, 1.2) for _ in range(5)]
        )
        labels = canopy_bins(profs, merge_threshold=0.9)
        assert (labels >= 0).all()
        assert len(set(labels[:5])) == 1
        assert len(set(labels[5:])) == 1
        assert labels[0] != labels[5]

    def test_single_sample(self):
        labels = canopy_bins(np.array([[5.0], [7.0]]))
        assert (labels == 0).all()

    def test_empty(self):
        assert canopy_bins(np.zeros((0, 3))).shape == (0,)


class TestMtsCLI:
    def test_end_to_end(self, rng, tmp_path):
        from spades_tpu.tools.mts import main

        g1 = random_dna(rng, 500)
        g2 = random_dna(rng, 500)
        sample_files = []
        for s, mix in enumerate([(400, 50), (50, 400)]):
            path = str(tmp_path / f"s{s}.fasta")
            with open(path, "w") as fh:
                for i, r in enumerate(
                    reads_from(g1, mix[0], 60, rng) + reads_from(g2, mix[1], 60, rng)
                ):
                    fh.write(f">s{s}r{i}\n{r}\n")
            sample_files.append(path)
        contig_path = str(tmp_path / "contigs.fasta")
        with open(contig_path, "w") as fh:
            fh.write(f">c1\n{g1}\n>c2\n{g2}\n")

        outdir = str(tmp_path / "out")
        rc = main([contig_path] + sample_files
                  + ["-k", "21", "--min-mult", "2", "--min-length", "100",
                     "--split-reads", "-w", outdir])
        assert rc == 0
        binning = dict(
            line.split("\t") for line in
            open(os.path.join(outdir, "binning.tsv")).read().splitlines()
        )
        assert binning["c1"].startswith("BIN")
        assert binning["c2"].startswith("BIN")
        assert binning["c1"] != binning["c2"]
        assert os.path.isdir(os.path.join(outdir, "binned_reads"))
        profs = open(os.path.join(outdir, "profiles.tsv")).read().splitlines()
        assert len(profs) == 2 and len(profs[0].split("\t")) == 3
