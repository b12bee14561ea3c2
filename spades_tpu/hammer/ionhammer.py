"""IonTorrent homopolymer-space read correction (ionhammer equivalent).

Capability mirror of `spades-ionhammer`
(`/root/reference/src/projects/ionhammer/main.cpp:279`, `hkmer.hpp` HK-mers =
homopolymer-run k-mers, `gamma_poisson_model.cpp` run-length error model,
`read_corrector_new.hpp` flow-space correction): IonTorrent's dominant error
mode is homopolymer run-length miscalls, so correction happens in
homopolymer-compressed (flow) space.

TPU redesign: reads are homopolymer-compressed (base sequence + run lengths);
HK-mers are counted with the standard device engine over the compressed
bases; for every solid HK-mer context the consensus run length of its center
base is learned from the reads themselves (count-weighted mode — the
discrete-Poisson-mode shortcut of the reference's gamma-Poisson fit), and
runs whose length deviates from a confidently-supported consensus are
rewritten."""
from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..core import dna
from ..ops.count import searchsorted_rows
from ..core import kmers as K

log = logging.getLogger("spades_tpu.ionhammer")


@dataclass
class IonHammerConfig:
    k: int = 13                 # HK-mer length (compressed space)
    min_solid: int = 3          # multiplicity for a context to be trusted
    min_consensus: float = 0.8  # run-length agreement required to rewrite
    max_run: int = 31


def hp_compress(seq: str) -> tuple[str, np.ndarray]:
    """Homopolymer-compress: 'AAACCG' -> ('ACG', [3, 2, 1])."""
    if not seq:
        return "", np.zeros(0, np.int64)
    codes = dna.encode(seq)
    change = np.concatenate([[True], codes[1:] != codes[:-1]])
    starts = np.flatnonzero(change)
    runs = np.diff(np.append(starts, len(codes)))
    return dna.decode(codes[starts]), runs


def hp_expand(bases: str, runs: np.ndarray) -> str:
    return "".join(b * int(r) for b, r in zip(bases, runs))


def _context_table(compressed: list[tuple[str, np.ndarray]], cfg: IonHammerConfig):
    """Map solid HK-mer context -> consensus run length of its center base.

    Context = the canonical k-mer of compressed bases centred on a position;
    value = count-weighted mode of observed center run lengths."""
    k = cfg.k
    half = k // 2
    ctx_rows, lens = [], []
    for bases, runs in compressed:
        n = len(bases)
        if n < k:
            continue
        codes = dna.encode(bases)
        if (codes >= 4).any():
            continue
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        packed = K.pack(np.ascontiguousarray(wins))
        from ..ops.extension import canonicalize

        canon, _rc = canonicalize(packed, k)
        ctx_rows.append(canon)
        lens.append(np.minimum(runs[half : half + wins.shape[0]], cfg.max_run))
    if not ctx_rows:
        return None
    rows = np.concatenate(ctx_rows)
    lens = np.concatenate(lens).astype(np.int64)
    from ..ops.count import _lexsort_rows

    order = _lexsort_rows(rows)
    rows, lens = rows[order], lens[order]
    new = np.concatenate([[True], np.any(rows[1:] != rows[:-1], axis=1)])
    seg = np.cumsum(new) - 1
    n_ctx = int(seg[-1]) + 1
    # per-context histogram over run lengths
    hist = np.zeros((n_ctx, cfg.max_run + 1), np.int64)
    np.add.at(hist, (seg, lens), 1)
    total = hist.sum(axis=1)
    best_len = hist.argmax(axis=1)
    best_cnt = hist.max(axis=1)
    solid = (total >= cfg.min_solid) & (best_cnt >= cfg.min_consensus * total)
    return rows[new], best_len, solid


def correct_ion_reads(
    seqs: list[str], cfg: IonHammerConfig | None = None
) -> tuple[list[str], int]:
    """Correct homopolymer run-length errors.  Returns (reads, runs changed)."""
    cfg = cfg or IonHammerConfig()
    compressed = [hp_compress(s) for s in seqs]
    table = _context_table(compressed, cfg)
    if table is None:
        return list(seqs), 0
    ctx_kmers, best_len, solid = table
    k = cfg.k
    half = k // 2
    changed = 0
    out = []
    from ..ops.extension import canonicalize

    for bases, runs in compressed:
        n = len(bases)
        if n < k:
            out.append(hp_expand(bases, runs))
            continue
        codes = dna.encode(bases)
        if (codes >= 4).any():
            out.append(hp_expand(bases, runs))
            continue
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        canon, _rc = canonicalize(K.pack(np.ascontiguousarray(wins)), k)
        idx = searchsorted_rows(ctx_kmers, canon)
        new_runs = runs.copy()
        for w in range(wins.shape[0]):
            i = idx[w]
            if i < 0 or not solid[i]:
                continue
            center = half + w
            want = int(best_len[i])
            if want > 0 and new_runs[center] != want:
                new_runs[center] = want
                changed += 1
        out.append(hp_expand(bases, new_runs))
    log.info("ionhammer: %d homopolymer runs corrected", changed)
    return out, changed
