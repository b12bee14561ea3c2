"""spades-gbuilder equivalent: standalone graph construction -> GFA/unitigs.

Reference: `/root/reference/src/projects/spades_tools/gbuilder.cpp:112`.
"""
from __future__ import annotations

import os
import sys

from .common import check_inputs_exist, check_odd_k, make_parser, setup


def main(argv=None) -> int:
    p = make_parser("spades_tpu-gbuilder", __doc__.split("\n")[0])
    p.add_argument("inputs", nargs="+", help="FASTA/FASTQ(.gz) input files")
    p.add_argument("-c", "--min-count", type=int, default=1, help="drop (k+1)-mers below this multiplicity")
    p.add_argument("--unitigs", action="store_true", help="also write unitigs FASTA")
    args = p.parse_args(argv)
    setup(args)
    check_odd_k(args.kmer)
    check_inputs_exist(args.inputs)

    from ..io.contigs import extract_contigs, write_contigs
    from ..io.fastx import read_sequences
    from ..io.gfa import write_gfa
    from ..pipeline.construction import construct_graph

    seqs = list(read_sequences(args.inputs))
    res = construct_graph(seqs, args.kmer, min_count=args.min_count)
    os.makedirs(args.workdir, exist_ok=True)
    gfa_path = os.path.join(args.workdir, "assembly_graph_with_scaffolds.gfa")
    write_gfa(gfa_path, res.graph)
    print(
        f"k={args.kmer}: {len(res.graph.canonical_edge_ids())} segments -> {gfa_path}"
    )
    if args.unitigs:
        upath = os.path.join(args.workdir, "unitigs.fasta")
        write_contigs(upath, extract_contigs(res.graph))
        print(f"unitigs -> {upath}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
