"""Native loser-tree merge of sorted counted runs (native/merge.cpp).

Fuzz against a numpy lexsort+segment-sum oracle, and check merge_counts
integration end-to-end.  Mirrors the reference's MergeKMers loser-tree
(`kmer_index_builder.hpp:346`) contract: input runs sorted unique, output
globally sorted unique with summed multiplicities.
"""
import numpy as np
import pytest

from spades_tpu.native import merge_runs_native
from spades_tpu.ops.count import KmerCounts, merge_counts


def _np_oracle(words, counts, W):
    if not len(words):
        return np.zeros((0, W), np.uint32), np.zeros(0, np.int64)
    order = np.lexsort(tuple(words[:, i] for i in range(W - 1, -1, -1)))
    sw, sc = words[order], counts[order]
    new = np.concatenate([[True], np.any(sw[1:] != sw[:-1], axis=1)])
    seg = np.cumsum(new) - 1
    oc = np.zeros(seg[-1] + 1, np.int64)
    np.add.at(oc, seg, sc)
    return sw[new], oc


def _random_runs(rng, n_runs, W, hi=5, max_len=30):
    rows, cnts, offs = [], [], [0]
    for _ in range(n_runs):
        n = int(rng.integers(0, max_len))
        w = rng.integers(0, hi, (n, W)).astype(np.uint32)
        order = np.lexsort(tuple(w[:, i] for i in range(W - 1, -1, -1)))
        w = w[order]
        keep = (
            np.concatenate([[True], np.any(w[1:] != w[:-1], axis=1)])
            if n
            else np.zeros(0, bool)
        )
        w = w[keep]
        c = rng.integers(1, 10, len(w)).astype(np.int64)
        rows.append(w)
        cnts.append(c)
        offs.append(offs[-1] + len(w))
    words = np.concatenate(rows) if offs[-1] else np.zeros((0, W), np.uint32)
    counts = np.concatenate(cnts) if offs[-1] else np.zeros(0, np.int64)
    return words, counts, np.array(offs, np.uint64)


@pytest.mark.parametrize("seed", range(8))
def test_native_merge_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n_runs = int(rng.integers(1, 9))
    W = int(rng.integers(1, 4))
    words, counts, offs = _random_runs(rng, n_runs, W)
    got = merge_runs_native(words, counts, offs)
    if got is None:
        pytest.skip("native library unavailable")
    ow, oc = _np_oracle(words, counts, W)
    assert np.array_equal(got[0], ow)
    assert np.array_equal(got[1], oc)


def test_merge_counts_uses_same_semantics():
    rng = np.random.default_rng(123)
    runs = []
    for _ in range(5):
        words, counts, offs = _random_runs(rng, 1, 2, hi=4, max_len=40)
        runs.append(KmerCounts(k=17, words=words, counts=counts))
    merged = merge_counts(runs)
    allw = np.concatenate([r.words for r in runs])
    allc = np.concatenate([r.counts for r in runs])
    ow, oc = _np_oracle(allw, allc, 2)
    assert np.array_equal(merged.words, ow)
    assert np.array_equal(merged.counts, oc)
    # strictly sorted unique output
    assert np.all(np.any(merged.words[1:] != merged.words[:-1], axis=1))
