"""Pallas extraction kernel + tiled counting path.

The Pallas kernel runs in interpreter mode on CPU (tests); on TPU the same
code compiles via Mosaic (exercised by bench.py / the driver's compile
check).  The tiled sorted-run counting path must aggregate to exactly the
same k-mer multiset as the exact single-sort path — the invariant the
reference asserts between its per-thread sorted buffers and the merged
bucket files (kmer_splitter.hpp / kmer_index_builder.hpp).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from spades_tpu.core import kmers as K
from spades_tpu.ops.count import (
    KmerCounts,
    _compact_run,
    count_batch_device,
    count_batch_device_tiled,
    count_sequences,
    merge_counts,
)
from spades_tpu.ops.pallas_kernels import canonical_windows_planar, planar_to_rows


@pytest.mark.parametrize("k", [13, 21, 33, 55])
def test_planar_matches_reference(rng, k):
    R, L = 48, 160
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, R).astype(np.int32)
    n_mask = rng.random((R, L)) < 0.03
    ref_c, ref_v = K.canonical_windows(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(n_mask), k
    )
    pc, pv = canonical_windows_planar(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(n_mask), k,
        interpret=True,
    )
    P = L - k + 1
    rows = np.asarray(planar_to_rows(pc))
    assert np.array_equal(rows[:, :P], np.asarray(ref_c))
    assert np.array_equal(np.asarray(pv)[:, :P], np.asarray(ref_v))
    # padding windows are sentinel and invalid
    assert np.all(rows[:, P:] == 0xFFFFFFFF)
    assert not np.asarray(pv)[:, P:].any()


def test_tiled_runs_aggregate_to_exact_counts(rng):
    R, L, k = 128, 120, 21
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, R).astype(np.int32)
    n_mask = rng.random((R, L)) < 0.01
    cj, lj, mj = jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(n_mask)

    sw, st, nv = count_batch_device(cj, lj, mj, k)
    uw, uc = _compact_run(np.asarray(sw), np.asarray(st), int(nv))
    exact = KmerCounts(k=k, words=uw, counts=uc)

    swt, stt, nvt = count_batch_device_tiled(cj, lj, mj, k, tile=512)
    swt, stt, nvt = np.asarray(swt), np.asarray(stt), np.asarray(nvt)
    runs = []
    for t in range(swt.shape[0]):
        if nvt[t] == 0:
            continue
        w2, c2 = _compact_run(swt[t], stt[t], int(nvt[t]))
        # each tile is a sorted unique run
        assert np.all(
            np.any(w2[1:] != w2[:-1], axis=-1)
        ), "tile run must be strictly increasing"
        runs.append(KmerCounts(k=k, words=w2, counts=c2))
    merged = merge_counts(runs)
    assert np.array_equal(merged.words, exact.words)
    assert np.array_equal(merged.counts, exact.counts)


def test_count_sequences_uses_tiled_path_consistently(rng):
    # dup-heavy input: every read shares a genome substring
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    reads = [genome[i : i + 60] for i in range(0, 340, 7)] * 3
    k = 15
    kc = count_sequences(reads, k)
    # brute-force oracle
    from collections import Counter

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    oracle = Counter()
    for r in reads:
        for i in range(len(r) - k + 1):
            s = r[i : i + k]
            oracle[min(s, rc(s))] += 1
    assert kc.num_unique == len(oracle)
    assert kc.total == sum(oracle.values())
    got = {tuple(w): c for w, c in zip(kc.words.tolist(), kc.counts.tolist())}
    packed = K.pack(
        np.array(
            [[("ACGT".index(c)) for c in s] for s in sorted(oracle)], np.uint8
        )
    )
    for row, s in zip(packed, sorted(oracle)):
        assert got[tuple(row.tolist())] == oracle[s]
