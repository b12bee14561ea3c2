"""spades-read-filter equivalent: drop reads/pairs with median k-mer coverage
below a threshold.

Reference: `/root/reference/src/projects/spades_tools/read_filter.cpp:128`
(CQF-backed median coverage filter).  TPU-native: exact counts from the
counting engine replace the approximate CQF (SURVEY.md §7 step 2 rationale);
per-read medians are a vectorized lookup into the sorted count table.
"""
from __future__ import annotations

import os
import sys

import numpy as np

from .common import check_odd_k, make_parser, setup


def read_median_coverage(seqs: list[str], k: int, kc) -> np.ndarray:
    """Median multiplicity of each read's canonical k-mers (0 if none)."""
    from ..core import dna
    from ..core import kmers as K
    from ..ops.count import searchsorted_rows

    meds = np.zeros(len(seqs))
    for i, s in enumerate(seqs):
        if len(s) < k:
            continue
        wins = [s[j : j + k] for j in range(len(s) - k + 1) if "N" not in s[j : j + k]]
        if not wins:
            continue
        codes = np.stack([dna.encode(w) for w in wins])
        packed = K.pack(codes)
        rc = K.revcomp_words(packed, k)
        use_rc = K.lex_less(rc, packed)
        canon = np.where(use_rc[..., None], rc, packed)
        idx = searchsorted_rows(kc.words, canon)
        cov = np.where(idx >= 0, kc.counts[np.maximum(idx, 0)], 0)
        meds[i] = np.median(cov)
    return meds


def main(argv=None) -> int:
    p = make_parser("spades_tpu-read-filter", __doc__.split("\n")[0])
    p.add_argument("-1", dest="left", help="left paired reads")
    p.add_argument("-2", dest="right", help="right paired reads")
    p.add_argument("-s", dest="single", action="append", default=[], help="single reads")
    p.add_argument("-c", "--cov", type=float, default=2, help="median coverage threshold")
    p.add_argument("-o", "--outdir", default="filtered", help="output directory")
    args = p.parse_args(argv)
    setup(args)
    check_odd_k(args.kmer)

    from ..io.fastx import read_fastx, write_fasta
    from ..ops.count import count_sequences

    os.makedirs(args.outdir, exist_ok=True)
    if args.left and args.right:
        r1 = list(read_fastx(args.left))
        r2 = list(read_fastx(args.right))
        if len(r1) != len(r2):
            sys.exit("error: paired files have different read counts")
        all_seqs = [r.seq for r in r1] + [r.seq for r in r2]
        kc = count_sequences(all_seqs, args.kmer)
        m1 = read_median_coverage([r.seq for r in r1], args.kmer, kc)
        m2 = read_median_coverage([r.seq for r in r2], args.kmer, kc)
        keep = (np.maximum(m1, m2) > args.cov)
        write_fasta(
            os.path.join(args.outdir, "filtered_1.fasta"),
            [(r.name, r.seq) for r, k_ in zip(r1, keep) if k_],
        )
        write_fasta(
            os.path.join(args.outdir, "filtered_2.fasta"),
            [(r.name, r.seq) for r, k_ in zip(r2, keep) if k_],
        )
        print(f"kept {int(keep.sum())}/{len(keep)} read pairs")
    for path in args.single:
        recs = list(read_fastx(path))
        kc = count_sequences([r.seq for r in recs], args.kmer)
        med = read_median_coverage([r.seq for r in recs], args.kmer, kc)
        keep = med > args.cov
        base = os.path.basename(path).split(".")[0]
        write_fasta(
            os.path.join(args.outdir, f"filtered_{base}.fasta"),
            [(r.name, r.seq) for r, k_ in zip(recs, keep) if k_],
        )
        print(f"{path}: kept {int(keep.sum())}/{len(keep)} reads")
    return 0


if __name__ == "__main__":
    sys.exit(main())
