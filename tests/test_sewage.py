"""Wastewater lineage disentangling tests (wastewater_disentangle.cpp mirror)."""
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.sewage import estimate_abundances, read_barcodes_csv
from spades_tpu.sewage.disentangle import Barcodes, nnls_abundances


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _make_world(seed=0):
    """Reference genome + two lineages with disjoint SNP barcodes."""
    ref = _random_seq(2000, seed)
    rc = dna.encode(ref)

    def mutate(positions):
        c = rc.copy()
        for p in positions:
            c[p] = (c[p] + 1) % 4
        return dna.decode(c), [(int(rc[p]), p, int((rc[p] + 1) % 4)) for p in positions]

    lin_a, muts_a = mutate([200, 600, 1000, 1400])
    lin_b, muts_b = mutate([300, 700, 1100, 1500])
    header = ["" ] + [
        f"{'ACGT'[r]}{p+1}{'ACGT'[a]}" for r, p, a in muts_a + muts_b
    ]
    rows = [
        ["lineageA"] + ["1"] * 4 + ["0"] * 4,
        ["lineageB"] + ["0"] * 4 + ["1"] * 4,
    ]
    csv = ",".join(header) + "\n" + "\n".join(",".join(r) for r in rows) + "\n"
    return ref, lin_a, lin_b, csv


def _tile(seq, cov, rl=100, seed=1):
    rng = np.random.default_rng(seed)
    n = int(len(seq) * cov / rl)
    starts = rng.integers(0, len(seq) - rl + 1, n)
    return [seq[s : s + rl] for s in starts]


class TestBarcodesCSV:
    def test_parse(self, tmp_path):
        _ref, _a, _b, csv = _make_world()
        f = str(tmp_path / "bc.csv")
        open(f, "w").write(csv)
        bc = read_barcodes_csv(f)
        assert bc.lineages == ["lineageA", "lineageB"]
        assert bc.matrix.shape == (2, 8)
        assert bc.positions[0] == 200


class TestAbundances:
    def test_mixture_recovered(self, tmp_path):
        ref, lin_a, lin_b, csv = _make_world(seed=3)
        f = str(tmp_path / "bc.csv")
        open(f, "w").write(csv)
        bc = read_barcodes_csv(f)
        # 70% lineage A, 30% lineage B
        reads = _tile(lin_a, 21, seed=4) + _tile(lin_b, 9, seed=5)
        result = dict(estimate_abundances(ref, reads, bc))
        assert abs(result.get("lineageA", 0) - 0.7) < 0.15, result
        assert abs(result.get("lineageB", 0) - 0.3) < 0.15, result

    def test_single_lineage(self, tmp_path):
        ref, lin_a, _b, csv = _make_world(seed=6)
        f = str(tmp_path / "bc.csv")
        open(f, "w").write(csv)
        bc = read_barcodes_csv(f)
        result = dict(estimate_abundances(ref, _tile(lin_a, 20, seed=7), bc))
        assert result.get("lineageA", 0) > 0.8
        assert result.get("lineageB", 0.0) < 0.1

    def test_no_coverage(self, tmp_path):
        ref, *_rest, csv = _make_world(seed=8)
        f = str(tmp_path / "bc.csv")
        open(f, "w").write(csv)
        bc = read_barcodes_csv(f)
        assert estimate_abundances(ref, [], bc) == []


class TestNNLS:
    def test_exact_solution(self):
        B = np.array([[1.0, 0, 1, 0], [0, 1.0, 0, 1]])
        x_true = np.array([0.6, 0.4])
        f = B.T @ x_true
        x = nnls_abundances(B, f, np.ones(4))
        assert np.allclose(x, x_true, atol=1e-3)


class TestSewageTool:
    def test_cli(self, tmp_path):
        from spades_tpu.io.fastx import write_fasta
        from spades_tpu.tools import sewage

        ref, lin_a, _b, csv = _make_world(seed=9)
        rf = str(tmp_path / "ref.fasta")
        write_fasta(rf, [("ref", ref)])
        bf = str(tmp_path / "bc.csv")
        open(bf, "w").write(csv)
        reads_f = str(tmp_path / "reads.fasta")
        write_fasta(reads_f, [(f"r{i}", r) for i, r in enumerate(_tile(lin_a, 15, seed=10))])
        wd = str(tmp_path / "out")
        assert sewage.main([rf, bf, reads_f, "-w", wd]) == 0
        txt = open(os.path.join(wd, "lineages.csv")).read()
        assert "lineageA" in txt
