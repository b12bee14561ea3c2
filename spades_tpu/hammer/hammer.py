"""BayesHammer-equivalent read error correction, TPU-native.

Capability mirror of `spades-hammer`
(`/root/reference/src/projects/hammer/main.cpp:65-245`): iterative loop of
(1) k-mer counting (fixed k=21 in the reference), (2) Hamming-distance
clustering of the counted k-mers, (3) center selection + solid ("good") k-mer
marking against the coverage model, (4) read correction by per-position
consensus of the solid cluster centers covering each position
(`read_corrector.cpp`).

TPU redesign: counting rides the device sort engine (ops/count); clustering is
sub-k-mer block sorting (clustering.py); correction is a fused device voting
kernel — every read window gathers its cluster center's bases and scatter-adds
one-hot votes onto a (reads, positions, 4) tally, then argmax rewrites the
read.  When PHRED qualities are supplied, the reference's quality-weighted
machinery runs too (`kmer_cluster.cpp`, `expander.cpp` — see hammer/bayes.py):
per-k-mer per-position error probabilities are aggregated during counting,
Hamming clusters are refined by BIC-scored Bayesian subclustering, centers are
quality-weighted consensi, solidity becomes a posterior over count AND total
error probability, and the solid set expands iteratively through reads fully
covered by solid k-mers.  Without qualities the count-only path is used.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..core import kmers as K
from ..core.reads import ReadBatch, batch_iter
from ..graph.coverage_model import fit_coverage_model
from ..ops.count import count_sequences, searchsorted_rows
from .clustering import cluster_kmers

log = logging.getLogger("spades_tpu.hammer")


@dataclass
class HammerConfig:
    k: int = 21
    tau: int = 1
    n_iters: int = 1
    batch_size: int = 8192
    # minimum multiplicity for a center to be trusted when the coverage model
    # can't produce a bound (tiny inputs); the model bound wins when available
    min_solid_count: int = 3
    # a position is rewritten only when the winning base holds a clear
    # majority of the votes (read_corrector.cpp consensus discipline)
    majority: float = 0.5
    # quality-aware path (hammer/bayes.py) switches
    use_quality: bool = True
    subcluster_max_members: int = 64
    expander_rounds: int = 8


@dataclass
class HammerStats:
    reads_total: int = 0
    reads_changed: int = 0
    bases_changed: int = 0
    solid_kmers: int = 0
    unique_kmers: int = 0
    clusters: int = 0


def _cluster_centers(counts_words: np.ndarray, counts: np.ndarray, labels: np.ndarray):
    """Per-cluster center (max-count member) and total count."""
    n_clusters = int(labels.max()) + 1 if labels.size else 0
    # argmax count per cluster via sort by (label, -count)
    order = np.lexsort((-counts, labels))
    lab_sorted = labels[order]
    first = np.concatenate([[True], lab_sorted[1:] != lab_sorted[:-1]])
    center_of_cluster = np.empty(n_clusters, np.int64)
    center_of_cluster[lab_sorted[first]] = order[first]
    totals = np.zeros(n_clusters, np.int64)
    np.add.at(totals, labels, counts)
    return center_of_cluster, totals


def build_window_maps(
    seqs: list[str], words: np.ndarray, k: int, batch_size: int
) -> list:
    """Per-batch window->unique-row maps, computed ONCE per hammer pass and
    shared by quality accumulation, solid-set expansion and the correction
    loop (each recomputed them independently before round 3 — 3x the
    pack/canonicalize/searchsorted cost, the dominant pass cost).

    Returns a list of (batch, n, idx, present, use_rc) where idx is (R, P)
    int32 rows into `words` (-1 where absent), present = in-table AND within
    the read, use_rc marks windows whose canonical form is the reverse
    complement.  Batches shorter than k get (batch, n, None, None, None)."""
    import jax.numpy as jnp

    maps = []
    for batch in batch_iter(seqs, batch_size=batch_size):
        R, L = batch.codes.shape
        n = batch.n_seqs  # batches may flush short (footprint/length bucket)
        if L < k:
            maps.append((batch, n, None, None, None))
            continue
        fwd = np.asarray(K.pack_windows(jnp.asarray(batch.codes), k, rc=False))
        rcw = np.asarray(K.pack_windows(jnp.asarray(batch.codes), k, rc=True))
        use_rc = np.asarray(K.lex_less(jnp.asarray(rcw), jnp.asarray(fwd)))
        canon = np.where(use_rc[..., None], rcw, fwd)
        P = canon.shape[1]
        valid = (
            np.arange(P, dtype=np.int32)[None, :] + k <= batch.lengths[:, None]
        )
        idx = searchsorted_rows(words, canon.reshape(-1, canon.shape[-1]))
        idx = idx.reshape(R, P).astype(np.int32)
        maps.append((batch, n, idx, (idx >= 0) & valid, use_rc))
    return maps


def _vote_correct_batch(
    codes: np.ndarray,
    lengths: np.ndarray,
    n_mask: np.ndarray,
    oriented: np.ndarray,
    good: np.ndarray,
    k: int,
    majority: float,
):
    """Device voting kernel: center bases vote on read positions.

    codes (R, L) uint8, oriented (R, P, k) uint8 center bases in read
    orientation, good (R, P) bool.  Returns (corrected codes (R, L) uint8,
    voted (R, L) bool).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def kernel(codes, oriented, good):
        R, L = codes.shape
        P = oriented.shape[1]
        votes = jnp.zeros((R, L, 4), jnp.int32)
        g = good.astype(jnp.int32)[..., None]
        for j in range(k):
            onehot = jax.nn.one_hot(oriented[:, :, j], 4, dtype=jnp.int32) * g
            votes = votes.at[:, j : j + P, :].add(onehot)
        total = votes.sum(-1)
        best = jnp.argmax(votes, axis=-1).astype(jnp.uint8)
        bestv = jnp.max(votes, axis=-1)
        win = (total > 0) & (bestv > majority * total)
        out = jnp.where(win, best, codes)
        return out, win

    out, win = kernel(jnp.asarray(codes), jnp.asarray(oriented), jnp.asarray(good))
    return np.asarray(out), np.asarray(win)


def _correct_pass(
    seqs: list[str],
    cfg: HammerConfig,
    stats: HammerStats,
    quals: list[str] | None = None,
) -> list[str]:
    # Unlike the assembly counting path, hammer counts N windows too (N read
    # as A): an erroneous k-mer must itself be in the table so the clustering
    # can map it to its solid center (hamcluster semantics — bad k-mers join
    # the cluster of the true k-mer they derive from).
    clean = [s.upper().replace("N", "A") for s in seqs]
    kc = count_sequences(clean, cfg.k)
    if kc.num_unique == 0:
        return seqs
    # window->row maps computed once, shared by every consumer below
    # (N positions are coded 0 == A in ReadBatch, so maps over `seqs`
    # equal maps over `clean`)
    maps = build_window_maps(seqs, kc.words, cfg.k, cfg.batch_size)
    labels = cluster_kmers(kc.words, cfg.k, cfg.tau)
    info = fit_coverage_model(kc.counts)
    solid_bound = max(cfg.min_solid_count, info.ec_bound)

    use_quality = cfg.use_quality and quals is not None and any(quals)
    if use_quality:
        from . import bayes

        kq = bayes.accumulate_quality(kc, clean, quals, cfg.k, cfg.batch_size, maps=maps)
        labels = bayes.subcluster_all(
            kc.words, kc.counts, labels, kq, cfg.k, cfg.subcluster_max_members
        )
        centers, totals = _cluster_centers(kc.words, kc.counts, labels)
        solid_center = bayes.solid_posterior(
            kc.counts[centers], kq.total_err_prob()[centers], solid_bound
        )
        # iterative solid-set expansion runs over the full k-mer solid mask
        solid_kmer = solid_center[labels] & (centers[labels] == np.arange(kc.num_unique))
        solid_kmer, rounds = bayes.expand_solid(
            kc, solid_kmer, clean, cfg.k, cfg.expander_rounds, cfg.batch_size,
            maps=maps,
        )
        # an expanded-solid k-mer acts as its own center from here on
        newly = solid_kmer & (centers[labels] != np.arange(kc.num_unique))
        if newly.any():
            log.info("hammer: expander certified %d extra k-mers in %d rounds",
                     int(newly.sum()), rounds)
    else:
        centers, totals = _cluster_centers(kc.words, kc.counts, labels)
        solid_center = kc.counts[centers] >= solid_bound
        newly = np.zeros(kc.num_unique, bool)
    stats.unique_kmers = kc.num_unique
    stats.clusters = len(centers)
    stats.solid_kmers = int(solid_center.sum())
    log.info(
        "hammer: %d unique %d-mers, %d clusters, %d solid centers (bound %.1f)",
        kc.num_unique, cfg.k, len(centers), stats.solid_kmers, solid_bound,
    )

    # precompute per-unique-kmer: its center row index and solidity;
    # expander-certified k-mers vote for themselves
    center_idx_of_kmer = np.where(newly, np.arange(kc.num_unique), centers[labels])
    kmer_good = solid_center[labels] | newly
    center_codes_all = K.unpack(kc.words, cfg.k)  # canonical orientation

    out: list[str] = []
    pos = 0
    for batch, n, idx, present, use_rc in maps:
        R, L = batch.codes.shape
        if idx is None:
            out.extend(batch.sequences()[:n])
            pos += n
            continue
        safe = np.where(idx >= 0, idx, 0)
        good = present & kmer_good[safe]
        cidx = center_idx_of_kmer[safe]
        oriented = center_codes_all[cidx]  # (R, P, k) canonical
        rc_codes = 3 - oriented[:, :, ::-1]
        oriented = np.where(use_rc[..., None], rc_codes, oriented).astype(np.uint8)

        corrected, win = _vote_correct_batch(
            batch.codes, batch.lengths, batch.n_mask, oriented, good, cfg.k, cfg.majority
        )
        inlen = np.arange(L)[None, :] < batch.lengths[:, None]
        changed = (corrected != batch.codes) & win & inlen
        stats.bases_changed += int(changed.sum())
        stats.reads_changed += int(changed.any(axis=1)[:n].sum())
        # N positions that received votes become called bases
        new_nmask = batch.n_mask & ~win
        fixed = ReadBatch(codes=corrected, lengths=batch.lengths, n_mask=new_nmask)
        out.extend(fixed.sequences()[:n])
        pos += n
    return out


def correct_reads(
    seqs: list[str],
    cfg: HammerConfig | None = None,
    quals: list[str] | None = None,
) -> tuple[list[str], HammerStats]:
    """Correct sequencing errors in reads; returns (corrected reads, stats).

    Order and count of reads are preserved (the reference also keeps pairing
    intact; full-read discarding is left to the caller).  `quals` (parallel
    PHRED strings, or None) turns on the quality-aware Bayesian path.
    """
    cfg = cfg or HammerConfig()
    stats = HammerStats(reads_total=len(seqs))
    for it in range(cfg.n_iters):
        before = stats.bases_changed
        seqs = _correct_pass(seqs, cfg, stats, quals)
        log.info(
            "hammer iteration %d: %d bases changed", it, stats.bases_changed - before
        )
        if stats.bases_changed == before:
            break
    return seqs, stats
