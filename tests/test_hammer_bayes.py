"""Quality-aware BayesHammer path (hammer/bayes.py).

Mirrors the reference's quality-weighted clustering + expander behavior
(`/root/reference/src/projects/hammer/{kmer_cluster.cpp,expander.cpp}`):
PHRED qualities change solidity decisions, Bayesian subclustering separates
co-clustered genuine k-mers, and the expander certifies k-mers reachable
through fully-solid-covered reads.
"""
import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.core import kmers as K
from spades_tpu.hammer import HammerConfig, correct_reads
from spades_tpu.hammer.bayes import (
    accumulate_quality,
    bayes_subcluster,
    expand_solid,
    phred_to_err,
    solid_posterior,
    subcluster_all,
)
from spades_tpu.hammer.clustering import cluster_kmers
from spades_tpu.ops.count import count_sequences


def _random_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


def _tile_reads(genome, read_len, coverage, seed=1):
    rng = np.random.default_rng(seed)
    n_reads = int(len(genome) * coverage / read_len)
    starts = rng.integers(0, len(genome) - read_len + 1, n_reads)
    return [genome[s : s + read_len] for s in starts]


def _inject_quality_errors(reads, rate, seed=2, good_q=40, bad_q=5):
    """Errors land at positions flagged low-quality; everything else high-Q.

    Returns (noisy reads, PHRED strings, per-read error position sets)."""
    rng = np.random.default_rng(seed)
    out, quals, err_pos = [], [], []
    for r in reads:
        c = dna.encode(r).copy()
        q = np.full(len(c), good_q, np.int32)
        picks = np.flatnonzero(rng.random(len(c)) < rate)
        for i in picks:
            c[i] = (c[i] + rng.integers(1, 4)) % 4
            q[i] = bad_q
        # some low-quality positions that are NOT errors (realistic noise)
        lows = np.flatnonzero(rng.random(len(c)) < rate)
        q[lows] = np.minimum(q[lows], bad_q + 5)
        out.append(dna.decode(c))
        quals.append("".join(chr(33 + int(x)) for x in q))
        err_pos.append(set(int(i) for i in picks))
    return out, quals, err_pos


class TestPhred:
    def test_phred_to_err(self):
        a = np.frombuffer(b"I$", np.uint8)  # Q40, Q3
        e = phred_to_err(a)
        assert e[0] == pytest.approx(1e-4, rel=1e-3)
        assert e[1] == pytest.approx(10 ** (-0.3), rel=1e-3)


class TestAccumulateQuality:
    def test_high_quality_kmer_low_total_err(self):
        k = 21
        genome = _random_genome(300, seed=1)
        reads = _tile_reads(genome, 60, coverage=20, seed=2)
        quals = ["I" * len(r) for r in reads]  # Q40 everywhere
        kc = count_sequences(reads, k)
        kq = accumulate_quality(kc, reads, quals, k)
        te = kq.total_err_prob()
        # multi-occurrence Q40 k-mers: error prob per position 1e-4 per
        # occurrence, multiplied across occurrences -> tiny totals
        assert (te[kc.counts >= 3] < 1e-6).all()

    def test_no_quality_means_no_evidence(self):
        k = 21
        reads = [_random_genome(40, seed=3)]
        kc = count_sequences(reads, k)
        kq = accumulate_quality(kc, reads, [""], k)
        assert (kq.total_err_prob() == 1.0).all()


class TestBayesSubcluster:
    def test_single_center_stays_one(self):
        rng = np.random.default_rng(5)
        center = rng.integers(0, 4, 21).astype(np.uint8)
        members = [center]
        for i in range(3):  # distance-1 errors around one genuine center
            m = center.copy()
            m[i] = (m[i] + 1) % 4
            members.append(m)
        codes = np.stack(members)
        counts = np.array([50, 1, 1, 1])
        errp = np.full(codes.shape, 1e-4, np.float32)
        errp[1:, :] = 0.3  # error k-mers carry poor quality
        labels = bayes_subcluster(codes, counts, errp)
        assert len(np.unique(labels)) == 1

    def test_two_genuine_centers_split(self):
        rng = np.random.default_rng(6)
        a = rng.integers(0, 4, 21).astype(np.uint8)
        b = a.copy()
        b[10] = (b[10] + 2) % 4  # distance-1 twin, both heavily covered
        codes = np.stack([a, b])
        counts = np.array([60, 55])
        errp = np.full(codes.shape, 1e-4, np.float32)  # both high quality
        labels = bayes_subcluster(codes, counts, errp)
        assert len(np.unique(labels)) == 2

    def test_subcluster_all_roundtrip(self):
        k = 21
        genome = _random_genome(400, seed=7)
        reads = _tile_reads(genome, 60, coverage=15, seed=8)
        quals = ["I" * len(r) for r in reads]
        kc = count_sequences(reads, k)
        kq = accumulate_quality(kc, reads, quals, k)
        labels = cluster_kmers(kc.words, k, 1)
        refined = subcluster_all(kc.words, kc.counts, labels, kq, k)
        # refinement only splits: every refined cluster sits inside one
        # original cluster
        for lab in np.unique(refined):
            assert len(np.unique(labels[refined == lab])) == 1


class TestSolidPosterior:
    def test_count_bound_still_solid(self):
        counts = np.array([10, 1])
        te = np.array([1.0, 1.0])
        s = solid_posterior(counts, te, count_bound=5)
        assert s.tolist() == [True, False]

    def test_quality_rescues_low_count(self):
        counts = np.array([2, 2, 1])
        te = np.array([1e-4, 0.5, 1e-7])
        s = solid_posterior(counts, te, count_bound=5)
        assert s.tolist() == [True, False, True]


class TestExpander:
    def test_expander_certifies_covered_read(self):
        k = 21
        genome = _random_genome(120, seed=9)
        # one read covering the genome start; mark only half its k-mers solid
        read = genome[:80]
        kc = count_sequences([read], k)
        # seed solid set: first and last windows solid -> full position cover
        # needs everything... craft: mark all but 3 middle k-mers solid, with
        # the middle positions still covered by flanking windows
        solid = np.ones(kc.num_unique, bool)
        import jax.numpy as jnp
        from spades_tpu.core.reads import ReadBatch
        from spades_tpu.ops.count import searchsorted_rows

        batch = ReadBatch.from_sequences([read])
        fwd = np.asarray(K.pack_windows(jnp.asarray(batch.codes), k, rc=False))
        rcw = np.asarray(K.pack_windows(jnp.asarray(batch.codes), k, rc=True))
        use_rc = np.asarray(K.lex_less(jnp.asarray(rcw), jnp.asarray(fwd)))
        canon = np.where(use_rc[..., None], rcw, fwd)
        idx = searchsorted_rows(kc.words, canon.reshape(-1, canon.shape[-1]))
        idx = idx[idx >= 0]
        # un-solid three interior windows; their positions remain covered by
        # neighboring solid windows, so the read certifies them back
        solid[idx[10:13]] = False
        expanded, rounds = expand_solid(kc, solid, [read], k)
        assert expanded[idx[10:13]].all()
        assert rounds >= 1

    def test_expander_does_not_certify_uncovered(self):
        k = 21
        genome = _random_genome(120, seed=11)
        read = genome[:80]
        kc = count_sequences([read], k)
        solid = np.zeros(kc.num_unique, bool)  # nothing solid -> no coverage
        expanded, _ = expand_solid(kc, solid, [read], k)
        assert not expanded.any()


class TestQualityAwareCorrection:
    def _run(self, use_quality):
        genome = _random_genome(3000, seed=30)
        clean = _tile_reads(genome, 100, coverage=30, seed=31)
        noisy, quals, err_pos = _inject_quality_errors(clean, 0.004, seed=32)
        cfg = HammerConfig(use_quality=use_quality)
        fixed, st = correct_reads(noisy, cfg, quals=quals if use_quality else None)
        tp = fp = fn = 0
        for f, c, n in zip(fixed, clean, noisy):
            fc, cc, nc = dna.encode(f), dna.encode(c), dna.encode(n)
            changed = fc != nc
            wrong_before = nc != cc
            tp += int((changed & wrong_before & (fc == cc)).sum())
            fp += int((changed & ~wrong_before).sum())
            fn += int((wrong_before & (fc != cc)).sum())
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        return precision, recall, st

    def test_quality_path_beats_count_only(self):
        p_q, r_q, st_q = self._run(use_quality=True)
        p_c, r_c, st_c = self._run(use_quality=False)
        # the quality-aware pass must not lose precision and must correct at
        # least as many true errors (reference motivation for BayesHammer's
        # quality machinery)
        assert r_q >= r_c
        assert p_q >= p_c - 0.01
        assert r_q > 0.9
        assert p_q > 0.95

    def test_solid_set_grows_with_quality(self):
        genome = _random_genome(2000, seed=40)
        clean = _tile_reads(genome, 100, coverage=8, seed=41)  # low coverage
        noisy, quals, _ = _inject_quality_errors(clean, 0.002, seed=42)
        cfg_q = HammerConfig(use_quality=True)
        cfg_c = HammerConfig(use_quality=False)
        _, st_q = correct_reads(list(noisy), cfg_q, quals=quals)
        _, st_c = correct_reads(list(noisy), cfg_c)
        # at low coverage the count bound starves the solid set; quality
        # posterior + expander must recover more solid k-mers
        assert st_q.solid_kmers >= st_c.solid_kmers
