"""BinSPreader equivalent: refine metagenomic bins over the assembly graph.

Reference: `/root/reference/src/projects/binspreader/binning_refiner.cpp:163`
(CLI surface per `docs/binspreader.md`): input = assembly GFA + binning TSV
(<contig>\t<bin>), output = refined `binning.tsv` (+ `--multi` for multiple
assignments per contig).
"""
from __future__ import annotations

import os
import sys

from .common import check_odd_k, make_parser, setup


def main(argv=None) -> int:
    p = make_parser("spades_tpu-binspreader", __doc__.split("\n")[0])
    p.add_argument("gfa", help="assembly graph (GFA 1.x)")
    p.add_argument("binning", help="initial binning TSV: contig<TAB>bin")
    p.add_argument("--multi", action="store_true", help="allow multiple bins per contig")
    p.add_argument("-e", "--eps", type=float, default=1e-5, help="convergence threshold")
    p.add_argument("-n", "--iters", type=int, default=100, help="max propagation sweeps")
    args = p.parse_args(argv)
    setup(args)
    check_odd_k(args.kmer)

    from ..graph.binning import BinningConfig, refine_binning
    from ..graph.from_gfa import graph_from_gfa
    from ..io.gfa import read_gfa

    gg = read_gfa(args.gfa)
    g = graph_from_gfa(gg, args.kmer)
    # segment name -> canonical edge id (graph_from_gfa orders segments by
    # sorted name: edge 2i is '+' of the i-th name, 2i+1 its conjugate)
    seg_names = {}
    for i, name in enumerate(sorted(gg.segments)):
        e = 2 * i
        seg_names[name] = min(e, int(g.e_conj[e]))

    binning = {}
    with open(args.binning) as fh:
        for line in fh:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                binning[parts[0]] = parts[1]
    refined = refine_binning(
        g, binning, seg_names,
        BinningConfig(eps=args.eps, max_iters=args.iters), multi=args.multi,
    )
    os.makedirs(args.workdir, exist_ok=True)
    out = os.path.join(args.workdir, "binning.tsv")
    with open(out, "w") as fh:
        for name in sorted(refined):
            for b in refined[name]:
                fh.write(f"{name}\t{b}\n")
    print(f"refined {len(refined)} contigs over {len(set(binning.values()))} bins -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
