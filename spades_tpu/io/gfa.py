"""GFA v1.1/v1.2 assembly-graph writer and reader.

Mirrors the reference's GFA I/O surface
(`/root/reference/src/common/io/graph/gfa_writer.hpp:24,39-54` and
`gfa_reader.hpp:35`): segments are conjugate edge pairs (one S-record per
pair, orientation via +/-), links record k-overlap adjacencies with `<k>M`
CIGAR overlaps, and path records carry contig paths.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core import dna
from ..graph.graph import CondensedGraph


def _segment_names(g: CondensedGraph) -> dict[int, tuple[str, str]]:
    """edge id -> (segment name, orientation). Conjugate pairs share a name."""
    names: dict[int, tuple[str, str]] = {}
    for e in g.canonical_edge_ids():
        e = int(e)
        ec = int(g.e_conj[e])
        names[e] = (str(e), "+")
        if ec != e:
            names[ec] = (str(e), "-")
    return names


def write_gfa(path: str, g: CondensedGraph, paths: list[tuple[str, list[int]]] | None = None) -> None:
    """Write the graph as GFA 1.x: S per conjugate pair, L per adjacency."""
    names = _segment_names(g)
    cov = g.coverage()
    k = g.k
    with open(path, "w") as fh:
        fh.write("H\tVN:Z:1.0\n")
        for e in g.canonical_edge_ids():
            e = int(e)
            name, _ = names[e]
            seq = g.edge_seq(e)
            fh.write(
                f"S\t{name}\t{seq}\tDP:f:{cov[e]:.6f}\n"
            )
        # links: for every vertex, each incoming edge connects to each
        # outgoing edge with a k-overlap
        by_start: dict[int, list[int]] = {}
        by_end: dict[int, list[int]] = {}
        for e in g.alive_edge_ids():
            e = int(e)
            by_start.setdefault(int(g.e_start[e]), []).append(e)
            by_end.setdefault(int(g.e_end[e]), []).append(e)
        seen = set()
        for v in sorted(by_end):
            for ein in by_end[v]:
                for eout in by_start.get(v, []):
                    n1, o1 = names[ein]
                    n2, o2 = names[eout]
                    # the conjugate of a link is implied by GFA semantics;
                    # emit each undirected link once
                    conj_key = (names[int(g.e_conj[eout])], names[int(g.e_conj[ein])])
                    key = ((n1, o1), (n2, o2))
                    if conj_key in seen:
                        continue
                    seen.add(key)
                    fh.write(f"L\t{n1}\t{o1}\t{n2}\t{o2}\t{k}M\n")
        if paths:
            for pname, edge_list in paths:
                segs = ",".join(
                    names[int(e)][0] + names[int(e)][1] for e in edge_list
                )
                overlaps = ",".join([f"{k}M"] * max(len(edge_list) - 1, 0)) or "*"
                fh.write(f"P\t{pname}\t{segs}\t{overlaps}\n")


@dataclass
class GfaGraph:
    """Parsed GFA: segments + links (host-side; used by gbuilder/gsimplifier)."""

    segments: dict[str, str] = field(default_factory=dict)     # name -> seq
    seg_cov: dict[str, float] = field(default_factory=dict)
    links: list[tuple[str, str, str, str, int]] = field(default_factory=list)
    paths: list[tuple[str, str]] = field(default_factory=list)


def read_gfa(path: str) -> GfaGraph:
    out = GfaGraph()
    with open(path) as fh:
        for line in fh:
            f = line.rstrip("\n").split("\t")
            if not f or not f[0]:
                continue
            if f[0] == "S":
                out.segments[f[1]] = f[2]
                for tag in f[3:]:
                    if tag.startswith(("DP:f:", "dp:f:")):
                        out.seg_cov[f[1]] = float(tag[5:])
                    elif tag.startswith("KC:i:"):
                        n = max(len(f[2]), 1)
                        out.seg_cov[f[1]] = float(tag[5:]) / n
            elif f[0] == "L":
                ov = int(f[5].rstrip("M")) if len(f) > 5 and f[5] not in ("*", "") else 0
                out.links.append((f[1], f[2], f[3], f[4], ov))
            elif f[0] == "P":
                out.paths.append((f[1], f[2]))
    return out
