"""Distance-estimation estimator family + library model tests.

Mirrors the reference's estimator contracts (paired_info/distance_estimation.hpp,
smoothing_distance_estimation.hpp) and the io::SequencingLibrary dataset model
(common/library/library.hpp)."""
import numpy as np

from spades_tpu.core import dna
from spades_tpu.io.libraries import DataSet, SequencingLibrary, iter_fr_libs
from spades_tpu.paired.distance_estimation import (
    DEConfig,
    estimate_simple,
    estimate_smoothing,
    estimate_weighted,
)
from spades_tpu.paired.paired_info import PairedIndex, merge_paired_indices


def _pi(rows):
    rows = sorted(rows)
    e1, e2, d, w = zip(*rows)
    return PairedIndex(
        np.array(e1, np.int64), np.array(e2, np.int64),
        np.array(d, float), np.array(w, float),
    )


class TestSimple:
    def test_merges_close_points(self):
        pi = _pi([(1, 2, 100, 3.0), (1, 2, 104, 1.0), (1, 2, 300, 4.0)])
        out = estimate_simple(pi)
        assert out.e1.size == 2
        assert abs(out.dist[0] - 101.0) < 1e-9  # weighted mean of 100,104
        assert out.weight[0] == 4.0
        assert out.dist[1] == 300.0

    def test_drops_light_clusters(self):
        pi = _pi([(1, 2, 100, 0.5), (1, 2, 300, 5.0)])
        out = estimate_simple(pi, DEConfig(min_peak_weight=2.0))
        assert out.e1.size == 1
        assert out.dist[0] == 300.0


class TestWeighted:
    def test_drops_weak_sidelobe(self):
        pi = _pi([(1, 2, 100, 50.0), (1, 2, 200, 2.5)])
        out = estimate_weighted(pi)
        # 2.5 < 20% of 50 -> dropped
        assert out.e1.size == 1 and out.dist[0] == 100.0

    def test_keeps_comparable_clusters(self):
        pi = _pi([(1, 2, 100, 10.0), (1, 2, 200, 9.0)])
        out = estimate_weighted(pi)
        assert out.e1.size == 2


class TestSmoothing:
    def test_finds_peak_of_wide_histogram(self):
        rng = np.random.default_rng(0)
        ds = np.clip(np.round(rng.normal(500, 20, 200)), 400, 600).astype(int)
        rows = [(3, 4, int(d), 1.0) for d in ds]
        # merge duplicates through the PairedIndex invariants
        pi = merge_paired_indices([_pi(rows)])
        out = estimate_smoothing(pi)
        assert out.e1.size >= 1
        best = out.dist[np.argmax(out.weight)]
        assert abs(best - 500) < 15

    def test_two_separate_peaks(self):
        rows = [(1, 2, d, 5.0) for d in (100, 101, 102)] + [
            (1, 2, d, 5.0) for d in (400, 401, 402)
        ]
        pi = merge_paired_indices([_pi(rows)])
        out = estimate_smoothing(pi)
        assert out.e1.size == 2
        assert abs(out.dist[0] - 101) < 3 and abs(out.dist[1] - 401) < 3


class TestLibraries:
    def test_mate_pair_rf_to_fr(self):
        lib = SequencingLibrary(type="mate-pairs", left=["ACGT"], right=["GGCC"])
        assert lib.orientation == "rf"
        l, r = lib.fr_pairs()
        assert l == [dna.revcomp_str("ACGT")] and r == [dna.revcomp_str("GGCC")]

    def test_pe_fr_untouched(self):
        lib = SequencingLibrary(type="paired-end", left=["ACGT"], right=["GGCC"])
        l, r = lib.fr_pairs()
        assert l == ["ACGT"] and r == ["GGCC"]

    def test_iter_fr_libs_mixed(self):
        libs = [
            (["AAAA"], ["CCCC"]),
            SequencingLibrary(type="mate-pairs", left=["ACGT"], right=["TTTT"]),
        ]
        out = iter_fr_libs(libs)
        assert out[0] == (["AAAA"], ["CCCC"], "paired-end")
        assert out[1][2] == "mate-pairs"
        assert out[1][0] == ["ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))]

    def test_dataset_accessors(self):
        ds = DataSet(
            [
                SequencingLibrary(type="paired-end", left=["AA"], right=["CC"]),
                SequencingLibrary(type="single", left=["GG"]),
                SequencingLibrary(type="pacbio", left=["TTTT"]),
                SequencingLibrary(type="trusted-contigs", left=["ACACAC"]),
            ]
        )
        assert ds.all_short_reads() == ["AA", "CC", "GG"]
        assert ds.long_reads() == ["TTTT"]
        assert ds.contigs() == ["ACACAC"]
        assert len(ds.paired()) == 1

    def test_merge_paired_indices_sums_duplicates(self):
        a = _pi([(1, 2, 100, 1.0)])
        b = _pi([(1, 2, 100, 2.0), (3, 4, 50, 1.0)])
        out = merge_paired_indices([a, b])
        assert out.e1.size == 2
        assert out.weight[0] == 3.0
