"""Quality-aware Bayesian machinery for BayesHammer.

Capability mirror of the reference's quality-weighted clustering and solid-set
expansion (`/root/reference/src/projects/hammer/kmer_cluster.cpp` —
lMeansClustering / Center / GoodKMer discipline — and
`/root/reference/src/projects/hammer/expander.cpp`): PHRED qualities survive
into the k-mer statistics, Hamming clusters are split into sub-clusters by a
BIC-scored l-means over quality-derived per-position error probabilities,
centers are quality-weighted consensi, solidity is a posterior (count OR
low total error probability), and the solid set grows by iterating over reads
fully covered by solid k-mers.

TPU/host split: the per-read window mapping and coverage tests are vectorized
numpy over the batched window->index arrays already produced for correction;
the subclustering operates on the (small) per-cluster member sets on the host,
exactly where the reference also runs per-cluster scalar code inside its
parallel outer loop.
"""
from __future__ import annotations

import logging

import numpy as np

from ..core import kmers as K
from ..core.reads import batch_iter
from ..ops.count import KmerCounts, searchsorted_rows

log = logging.getLogger("spades_tpu.hammer")

# PHRED floor/ceiling: reference clips qualities to avoid log(0)
# (kmer_stat.hpp getProb discipline).
_MIN_Q = 2.0
_MAX_Q = 60.0


def phred_to_err(qual_ascii: np.ndarray, offset: int = 33) -> np.ndarray:
    """ASCII PHRED codes -> per-base error probabilities (float32)."""
    q = np.clip(qual_ascii.astype(np.float32) - offset, _MIN_Q, _MAX_Q)
    return 10.0 ** (-q / 10.0)


def quals_to_array(quals: list[str], L: int, offset: int = 33) -> np.ndarray:
    """Pad a list of PHRED strings into an (R, L) error-probability matrix.

    Positions beyond a read's length get error prob 1.0 (no information)."""
    R = len(quals)
    # uniform-length fast path (the overwhelmingly common case): one
    # frombuffer over the joined strings instead of a per-read Python loop.
    # L is the padded batch row length, so compare reads against EACH OTHER
    # (len(quals[0])), then pad columns up to L with err=1.0.
    if R:
        L0 = len(quals[0])
        if 0 < L0 <= L and all(len(q) == L0 for q in quals):
            a = np.frombuffer("".join(quals).encode("ascii"), np.uint8)
            err0 = phred_to_err(a.reshape(R, L0), offset)
            if L0 == L:
                return err0
            return np.pad(err0, ((0, 0), (0, L - L0)), constant_values=1.0)
    err = np.ones((R, L), np.float32)
    for i, qs in enumerate(quals):
        if not qs:
            continue
        a = np.frombuffer(qs.encode("ascii"), np.uint8)[:L]
        err[i, : len(a)] = phred_to_err(a, offset)
    return err


class KmerQuality:
    """Aggregated per-unique-k-mer quality statistics.

    pos_log_err: (U, k) float32 — sum over occurrences of log10(error prob)
    at each canonical k-mer position, i.e. log10 P(this position was
    mis-called in EVERY observation).  Mirrors the role of the reference's
    per-k-mer QualBitSet / totalQual (kmer_stat.hpp)."""

    def __init__(self, num_unique: int, k: int):
        self.k = k
        self.pos_log_err = np.zeros((num_unique, k), np.float32)

    def total_err_prob(self) -> np.ndarray:
        """P(k-mer contains >=1 consistently mis-called position) per unique
        k-mer — the analog of the reference's totalQual solidity input."""
        p = 10.0 ** np.clip(self.pos_log_err, -30.0, 0.0)
        return np.clip(p.sum(axis=1), 0.0, 1.0)

    def pos_err_prob(self, rows: np.ndarray) -> np.ndarray:
        """(len(rows), k) per-position error probabilities."""
        return 10.0 ** np.clip(self.pos_log_err[rows], -30.0, 0.0)


def accumulate_quality(
    kc: KmerCounts,
    seqs: list[str],
    quals: list[str],
    k: int,
    batch_size: int = 8192,
    maps: list | None = None,
) -> KmerQuality:
    """Aggregate per-position error log-probabilities onto the unique k-mers.

    Every read window that maps into the counted table adds its per-base
    log10(err) at the window's canonical orientation (reverse-complemented
    windows flip the position axis — base j of the canonical k-mer came from
    read position p + k - 1 - j).  `maps` (from hammer.build_window_maps)
    reuses the shared per-pass window->row maps instead of recomputing them."""
    if maps is None:
        from .hammer import build_window_maps

        maps = build_window_maps(seqs, kc.words, k, batch_size)
    kq = KmerQuality(kc.num_unique, k)
    pos = 0
    for batch, n, idx, present, use_rc in maps:
        R, L = batch.codes.shape
        if idx is None:
            pos += n
            continue
        err = quals_to_array(quals[pos : pos + n], L)
        if err.shape[0] < R:  # batch row padding
            err = np.pad(err, ((0, R - err.shape[0]), (0, 0)), constant_values=1.0)
        P = idx.shape[1]
        # per-window per-position log10 error: (R, P, k) gathered from err
        win_err = np.lib.stride_tricks.sliding_window_view(err, k, axis=1)[:, :P, :]
        win_err = np.where(use_rc[..., None], win_err[:, :, ::-1], win_err)
        log_err = np.log10(np.clip(win_err, 1e-30, 1.0)).astype(np.float32)
        rows = idx[present]
        np.add.at(kq.pos_log_err, rows, log_err[present])
        pos += n
    return kq


# ---------------------------------------------------------------------------
# Bayesian sub-clustering (kmer_cluster.cpp lMeansClustering analog)
# ---------------------------------------------------------------------------


def _loglike(codes: np.ndarray, counts: np.ndarray, errp: np.ndarray,
             centers: np.ndarray, assign: np.ndarray) -> float:
    """Log-likelihood of members given their assigned centers.

    For member i at positions where it differs from its center, the
    observation is explained as an error: count_i * log(err_ij / 3); matching
    positions contribute count_i * log(1 - err_ij).  This is the reference's
    quality-weighted distance (kmer_cluster.cpp logLikelihood) with the
    aggregated per-position error probabilities standing in for per-read
    PHRED values."""
    diff = codes != centers[assign]
    e = np.clip(errp, 1e-10, 0.75)
    ll = np.where(diff, np.log(e / 3.0), np.log1p(-e)).sum(axis=1)
    return float((counts * ll).sum())


def _consensus_center(codes: np.ndarray, counts: np.ndarray, errp: np.ndarray) -> np.ndarray:
    """Quality-weighted per-position consensus (kmer_cluster.cpp Center()):
    each member votes count * (1 - err) for its base at each position."""
    k = codes.shape[1]
    votes = np.zeros((k, 4), np.float64)
    w = counts[:, None] * (1.0 - np.clip(errp, 0.0, 0.99))
    flat_pos = np.tile(np.arange(k), len(codes))
    np.add.at(votes, (flat_pos, codes.ravel()), w.ravel())
    return votes.argmax(axis=1).astype(np.uint8)


def batched_lmeans(
    codes: np.ndarray,
    counts: np.ndarray,
    errp: np.ndarray,
    max_l: int = 5,
    iters: int = 4,
) -> np.ndarray:
    """BIC-scored l-means over MANY equal-size clusters at once.

    codes: (C, M, k) uint8 member bases; counts: (C, M) multiplicities; errp:
    (C, M, k) per-position error probabilities.  Returns sub-labels (C, M)
    int32.  Semantics identical to the per-cluster lMeansClustering loop
    (kmer_cluster.cpp): candidate center counts l = 1..max_l, members assigned
    to the likeliest center, centers re-fit as quality-weighted consensi
    (empty sub-centers keep their previous value), assignment iteration stops
    per cluster at its own fixpoint, model chosen per cluster by BIC with k*l
    free parameters and degenerate (empty-sub-cluster) solutions skipped.
    The cluster axis is the TPU-host analog of the reference's OpenMP outer
    loop over clusters — one vectorized sweep instead of C scalar calls."""
    C, M, k = codes.shape
    e = np.clip(errp, 1e-10, 0.75)
    log_err = np.log(e / 3.0).astype(np.float64)
    log_match = np.log1p(-e).astype(np.float64)
    order = np.argsort(-counts, axis=1, kind="stable")
    total = counts.sum(axis=1).astype(np.float64)
    w_vote = (counts[..., None] * (1.0 - np.clip(errp, 0.0, 0.99))).astype(np.float64)
    ci = np.arange(C)[:, None]
    kpos = np.arange(k)[None, None, :]
    best_labels = np.zeros((C, M), np.int32)
    best_bic = np.full(C, -np.inf)
    for l in range(1, min(max_l, M) + 1):
        centers = codes[ci, order[:, :l]].copy()  # (C, l, k) top-count seeds
        assign = np.zeros((C, M), np.int64)
        conv = np.zeros(C, bool)
        for _ in range(iters):
            diff = codes[:, :, None, :] != centers[:, None, :, :]  # (C,M,l,k)
            ll = np.where(diff, log_err[:, :, None, :], log_match[:, :, None, :]).sum(-1)
            new_assign = ll.argmax(-1)  # (C, M)
            conv = conv | (new_assign == assign).all(axis=1)
            assign = np.where(conv[:, None], assign, new_assign)
            if conv.all():
                break
            # re-fit centers as quality-weighted consensi (scatter-add votes)
            flat = (((ci * l + assign)[..., None] * k + kpos) * 4 + codes).ravel()
            votes = np.bincount(flat, weights=w_vote.ravel(), minlength=C * l * k * 4)
            votes = votes.reshape(C, l, k, 4)
            new_centers = votes.argmax(-1).astype(np.uint8)
            has = np.zeros((C, l), bool)
            has[ci, assign] = True  # sub-centers with >=1 member
            keep = conv[:, None] | ~has  # converged cluster or empty sub-center
            centers = np.where(keep[..., None], centers, new_centers)
        cc = centers[ci, assign]  # (C, M, k) each member's center
        llm = np.where(codes != cc, log_err, log_match).sum(-1)
        logl = (counts * llm).sum(axis=1)
        used = np.zeros((C, l), bool)
        used[ci, assign] = True
        bic = 2.0 * logl - l * k * np.log(np.maximum(total, 2.0))
        ok = (used.sum(axis=1) == l) & (bic > best_bic)
        best_bic = np.where(ok, bic, best_bic)
        best_labels[ok] = assign[ok].astype(np.int32)
    return best_labels


def bayes_subcluster(
    codes: np.ndarray,
    counts: np.ndarray,
    errp: np.ndarray,
    max_l: int = 5,
    iters: int = 4,
) -> np.ndarray:
    """Split one Hamming cluster into sub-clusters by BIC-scored l-means.

    Single-cluster view over `batched_lmeans` (C == 1)."""
    n, _ = codes.shape
    if n == 1:
        return np.zeros(1, np.int32)
    return batched_lmeans(
        codes[None], counts[None].astype(np.float64), errp[None], max_l, iters
    )[0]


def subcluster_all(
    words: np.ndarray,
    counts: np.ndarray,
    labels: np.ndarray,
    kq: KmerQuality,
    k: int,
    max_members: int = 64,
) -> np.ndarray:
    """Refine Hamming-cluster labels with Bayesian sub-clustering.

    Clusters larger than `max_members` are left intact (they are dominated by
    genuine repeats, and the reference also bounds subclustering work).
    Returns new dense labels covering every k-mer."""
    codes_all = K.unpack(words, k)
    order = np.argsort(labels, kind="stable")
    lab_sorted = labels[order]
    starts = np.flatnonzero(np.concatenate([[True], lab_sorted[1:] != lab_sorted[:-1]]))
    ends = np.append(starts[1:], len(order))
    sizes = ends - starts
    n_clusters = len(starts)

    # per-cluster sub-label array, filled bucket by bucket (clusters of the
    # SAME size batch into one (C, M, k) `batched_lmeans` call — the host
    # analog of the reference's parallel outer loop over clusters)
    sub_of = np.zeros(len(labels), np.int64)  # sub-label per element (by order pos)
    nsub_of = np.ones(n_clusters, np.int64)   # sub-cluster count per cluster
    eligible = (sizes >= 2) & (sizes <= max_members)
    for m in np.unique(sizes[eligible]):
        all_rows = np.flatnonzero(eligible & (sizes == m))
        # chunk the cluster axis: batched_lmeans materializes (C, M, l, k)
        # float64 temporaries, and real datasets have millions of size-2
        # clusters — cap the per-call element count at ~25M (~200 MB/temp)
        c_chunk = max(1, 25_000_000 // (int(m) * 5 * k))
        for c0 in range(0, len(all_rows), c_chunk):
            rows = all_rows[c0 : c0 + c_chunk]
            # (C, M) member positions in `order`
            pos = starts[rows][:, None] + np.arange(m)[None, :]
            members = order[pos]  # (C, M) global k-mer rows
            sub = batched_lmeans(
                codes_all[members],
                counts[members].astype(np.float64),
                kq.pos_err_prob(members.ravel()).reshape(len(rows), m, k),
            )
            sub_of[pos.ravel()] = sub.ravel()
            nsub_of[rows] = sub.max(axis=1) + 1

    # dense renumber: cluster c's sub-label s -> base[c] + s
    base = np.concatenate([[0], np.cumsum(nsub_of)[:-1]])
    cluster_of_pos = np.repeat(np.arange(n_clusters), sizes)
    new_labels = np.empty(len(labels), np.int64)
    # sub_of is indexed by position in `order`
    new_labels[order] = base[cluster_of_pos] + sub_of
    split = int((nsub_of > 1).sum())
    if split:
        log.info("hammer: Bayesian subclustering split %d clusters (%d -> %d)",
                 split, n_clusters, int(nsub_of.sum()))
    return new_labels


# ---------------------------------------------------------------------------
# Solidity posterior + iterative expansion (expander.cpp analog)
# ---------------------------------------------------------------------------


def solid_posterior(
    counts: np.ndarray,
    total_err: np.ndarray,
    count_bound: float,
    singleton_err: float = 1e-5,
    low_count_err: float = 1e-3,
) -> np.ndarray:
    """Quality-aware solidity: a k-mer is solid if its multiplicity clears the
    coverage-model bound, OR its total error probability is so low that even a
    low count is credible (the reference's good/skip discipline over
    totalQual, kmer_stat.hpp:GoodForIterative)."""
    solid = counts >= count_bound
    solid |= (counts >= 2) & (total_err < low_count_err)
    solid |= (counts == 1) & (total_err < singleton_err)
    return solid


def expand_solid(
    kc: KmerCounts,
    solid: np.ndarray,
    seqs: list[str],
    k: int,
    max_rounds: int = 8,
    batch_size: int = 8192,
    maps: list | None = None,
) -> tuple[np.ndarray, int]:
    """Iterative solid-set expansion (expander.cpp): any read whose every
    position is covered by at least one solid k-mer certifies ALL of its
    k-mers as solid.  Repeats until fixpoint (or max_rounds).

    `maps` (from hammer.build_window_maps) reuses the shared per-pass
    window->row maps.  Returns (expanded solid mask, rounds run)."""
    if maps is None:
        from .hammer import build_window_maps

        maps = build_window_maps(seqs, kc.words, k, batch_size)
    batch_maps = []  # (idx (R,P), present (R,P), lengths (R,), n, L)
    for batch, n, idx, present, _use_rc in maps:
        if idx is None:
            continue
        L = batch.codes.shape[1]
        batch_maps.append(
            (np.where(present, idx, 0), present, batch.lengths[:n], n, L)
        )

    solid = solid.copy()
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        grew = False
        for idx, present, lengths, n, L in batch_maps:
            P = idx.shape[1]
            win_solid = solid[idx] & present  # (R, P)
            # position p of a read is covered iff some solid window starts in
            # [p-k+1, p]; sliding any() via cumulative counts over window starts
            c = np.cumsum(win_solid.astype(np.int32), axis=1)
            cpad = np.concatenate([np.zeros((c.shape[0], 1), np.int32), c], axis=1)
            # coverage of position p: windows with start in [max(0,p-k+1), min(p, P-1)]
            R = idx.shape[0]
            posn = np.arange(L, dtype=np.int32)
            lo = np.maximum(posn - k + 1, 0)
            hi = np.minimum(posn, P - 1)
            covered = (cpad[:, hi + 1] - cpad[:, lo]) > 0  # (R, L)
            inlenm = posn[None, :] < np.pad(lengths, (0, R - n))[:, None]
            fully = np.logical_or(covered, ~inlenm).all(axis=1)
            fully &= np.pad(lengths, (0, R - n)) >= k
            if not fully.any():
                continue
            cert = idx[fully][present[fully]]
            newly = ~solid[cert]
            if newly.any():
                solid[cert] = True
                grew = True
        if not grew:
            break
    return solid, rounds
