"""Edit-distance alignment + consensus tests (edlib/SPOA-role module)."""
import numpy as np

from spades_tpu.alignment.edit import (
    banded_align,
    consensus,
    edit_distance,
    edit_distances,
    medoid,
)
from spades_tpu.core import dna


def _slow_ed(a, b):
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), int)
    D[:, 0] = np.arange(la + 1)
    D[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i, j] = min(
                D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                D[i - 1, j] + 1,
                D[i, j - 1] + 1,
            )
    return D[la, lb]


def _rand(n, rng):
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


class TestMyers:
    def test_vs_bruteforce_multiword(self):
        rng = np.random.default_rng(1)
        # cover the 64-bit word boundaries explicitly
        for m in [0, 1, 2, 63, 64, 65, 128, 130]:
            for _ in range(5):
                a = _rand(m, rng)
                b = _rand(int(rng.integers(0, 2 * m + 2)), rng)
                assert edit_distance(a, b) == _slow_ed(a, b)

    def test_batched(self):
        rng = np.random.default_rng(2)
        q = _rand(100, rng)
        texts = [_rand(int(rng.integers(0, 200)), rng) for _ in range(30)]
        d = edit_distances(q, texts)
        assert all(d[i] == _slow_ed(q, texts[i]) for i in range(30))

    def test_empty(self):
        assert edit_distance("", "ACGT") == 4
        assert edit_distance("ACGT", "") == 4
        assert edit_distance("", "") == 0


class TestBandedAlign:
    def test_distance_and_columns(self):
        rng = np.random.default_rng(3)
        for _ in range(30):
            a = _rand(int(rng.integers(1, 120)), rng)
            b = _rand(int(rng.integers(1, 120)), rng)
            d, ai, bi = banded_align(dna.encode(a), dna.encode(b))
            assert d == _slow_ed(a, b)
            # aligned columns spell both inputs exactly once, in order
            assert "".join(a[i] for i in ai if i >= 0) == a
            assert "".join(b[j] for j in bi if j >= 0) == b

    def test_band_widening(self):
        # optimum far off the initial band: long insertion in the middle
        a = "ACGT" * 30
        b = a[:60] + "T" * 50 + a[60:]
        d, _, _ = banded_align(dna.encode(a), dna.encode(b))
        assert d == 50


def _noisy(s, rate, rng):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append("ACGT"[rng.integers(0, 4)])
            out.append(ch)
        elif r < rate:
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


class TestConsensus:
    def test_recovers_truth_at_pacbio_noise(self):
        rng = np.random.default_rng(4)
        truth = _rand(300, rng)
        copies = [_noisy(truth, 0.12, rng) for _ in range(15)]
        cons = consensus(copies)
        assert edit_distance(cons, truth) <= 4
        # and it beats every single raw copy by a wide margin
        assert min(edit_distances(truth, copies)) > 15

    def test_medoid(self):
        rng = np.random.default_rng(5)
        truth = _rand(200, rng)
        seqs = [_noisy(truth, 0.25, rng), truth, _noisy(truth, 0.25, rng)]
        assert medoid(seqs) == 1

    def test_degenerate(self):
        assert consensus([]) == ""
        assert consensus(["ACGT"]) == "ACGT"
        assert consensus(["ACGT", "ACGT", "ACGT"]) == "ACGT"


class TestNoisyGapClosing:
    def test_consensus_fill_beats_any_single_read(self):
        """Two contigs bridged only by noisy long reads: the spliced fill
        must be (near-)exact even though every read segment is 12% noisy."""
        from spades_tpu.alignment.long_read import (
            align_long_reads,
            close_gaps_with_long_reads,
        )
        from spades_tpu.graph.graph import CondensedGraph

        rng = np.random.default_rng(6)
        k = 21
        left = _rand(400, rng)
        gap = _rand(250, rng)
        right = _rand(400, rng)
        genome = left + gap + right
        g = CondensedGraph.from_sequences([left, right], k)
        # noisy long reads spanning the whole junction
        reads = [_noisy(genome[300:750], 0.12, rng) for _ in range(12)]
        als = align_long_reads(g, reads)
        closed = close_gaps_with_long_reads(g, als, min_support=3)
        assert closed == 1
        e = int(g.alive_edge_ids()[0])
        got = g.edge_seq(e)
        rc = dna.revcomp_str(got)
        d = min(edit_distance(got, genome), edit_distance(rc, genome))
        assert d <= 5, d
