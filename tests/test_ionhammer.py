"""IonHammer-equivalent homopolymer correction tests."""
import numpy as np

from spades_tpu.core import dna
from spades_tpu.hammer.ionhammer import (
    IonHammerConfig,
    correct_ion_reads,
    hp_compress,
    hp_expand,
)


def _genome_with_runs(n, seed):
    """Random genome with frequent homopolymer runs (IonTorrent-ish)."""
    rng = np.random.default_rng(seed)
    parts = []
    while sum(len(p) for p in parts) < n:
        b = "ACGT"[rng.integers(0, 4)]
        parts.append(b * int(rng.integers(1, 5)))
    return "".join(parts)[:n]


def _tile(seq, cov, rl=120, seed=1):
    rng = np.random.default_rng(seed)
    nr = int(len(seq) * cov / rl)
    starts = rng.integers(0, len(seq) - rl + 1, nr)
    return [seq[s : s + rl] for s in starts]


def _inject_run_errors(reads, rate, seed=2):
    """Lengthen/shorten random homopolymer runs (the IonTorrent error mode)."""
    rng = np.random.default_rng(seed)
    out, n_err = [], 0
    for r in reads:
        bases, runs = hp_compress(r)
        runs = runs.copy()
        for i in np.flatnonzero(rng.random(len(runs)) < rate):
            if runs[i] >= 2 or rng.random() < 0.5:
                runs[i] += 1 if rng.random() < 0.5 else -1
                runs[i] = max(runs[i], 1)
                n_err += 1
        out.append(hp_expand(bases, runs))
    return out, n_err


class TestHPCodec:
    def test_roundtrip(self):
        s = "AAACCGTTTTA"
        b, r = hp_compress(s)
        assert b == "ACGTA"
        assert list(r) == [3, 2, 1, 4, 1]
        assert hp_expand(b, r) == s

    def test_empty(self):
        b, r = hp_compress("")
        assert b == "" and len(r) == 0


class TestCorrection:
    def test_fixes_run_length_errors(self):
        genome = _genome_with_runs(1500, seed=10)
        clean = _tile(genome, 40, seed=11)
        noisy, n_err = _inject_run_errors(clean, 0.01, seed=12)
        assert n_err > 10
        fixed, changed = correct_ion_reads(noisy, IonHammerConfig())
        assert changed > 0
        # compare in compressed space (run lengths) against the clean reads
        def run_errs(xs):
            total = 0
            for x, c in zip(xs, clean):
                bx, rx = hp_compress(x)
                bc, rc = hp_compress(c)
                if bx == bc and len(rx) == len(rc):
                    total += int(np.sum(rx != rc))
                else:
                    total += max(len(x), len(c))  # structural mismatch
            return total

        before = run_errs(noisy)
        after = run_errs(fixed)
        assert after < 0.5 * before, f"{after} of {before} run errors remain"

    def test_clean_reads_stable(self):
        genome = _genome_with_runs(1000, seed=20)
        clean = _tile(genome, 30, seed=21)
        fixed, changed = correct_ion_reads(clean)
        diff = sum(f != c for f, c in zip(fixed, clean))
        assert diff <= len(clean) * 0.05

    def test_short_input(self):
        fixed, changed = correct_ion_reads(["ACG"])
        assert fixed == ["ACG"] and changed == 0
