"""spades-corrector-core equivalent: post-assembly mismatch polishing.

Reference: `/root/reference/src/projects/corrector/dataset_processor.hpp:34-68`
+ `contig_processor.cpp` (+ glue `correction_iteration_script.py`): align the
reads back to the assembled contigs, count per-position variants, apply
majority fixes.  Here the contigs become isolated edges of a flat graph and
the careful-mode mismatch machinery (alignment/mismatch.py) does the voting —
the same map/vote/fix contract without the BWA+SAM detour.
"""
from __future__ import annotations

import os
import sys

from .common import check_inputs_exist, check_odd_k, make_parser, setup


def main(argv=None) -> int:
    p = make_parser("spades_tpu-corrector", __doc__.split("\n")[0])
    p.add_argument("contigs", help="assembled contigs (FASTA)")
    p.add_argument("reads", nargs="+", help="read files (FASTA/FASTQ, optionally .gz)")
    args = p.parse_args(argv)
    setup(args)
    check_odd_k(args.kmer)
    check_inputs_exist([args.contigs] + args.reads)

    from ..alignment.mismatch import correct_mismatches
    from ..graph.graph import CondensedGraph
    from ..io.fastx import read_fastx, read_sequences, write_fasta

    recs = list(read_fastx(args.contigs))
    g = CondensedGraph.from_sequences([r.seq for r in recs], args.kmer)
    reads = list(read_sequences(args.reads))
    fixed = correct_mismatches(g, reads)
    os.makedirs(args.workdir, exist_ok=True)
    out = os.path.join(args.workdir, "corrected_contigs.fasta")
    ids = sorted(int(e) for e in g.canonical_edge_ids())
    write_fasta(out, [(recs[i].name, g.edge_seq(e)) for i, e in enumerate(ids)])
    print(f"fixed {fixed} positions in {len(recs)} contigs -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
