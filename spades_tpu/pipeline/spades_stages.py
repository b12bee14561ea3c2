"""Concrete per-K assembly stages (the spades-core stage list).

Mirrors `/root/reference/src/projects/spades/pipeline.cpp:263-298` (stage list
by mode) with TPU-native stage bodies.
"""
from __future__ import annotations

import logging
import os

import numpy as np

from ..graph.coverage_model import fit_coverage_model
from ..graph.simplify import SimplifyConfig, simplify
from ..io.contigs import extract_contigs, write_contigs
from ..io.gfa import write_gfa
from .construction import construct_graph
from .stages import AssemblyContext, AssemblyStage

log = logging.getLogger("spades_tpu.stages")


class Construction(AssemblyStage):
    """reads -> (k+1)-mer counts -> extension index -> condensed graph.

    (stages/construction.cpp composite equivalent)"""

    name = "Construction"
    id = "construction"

    def __init__(self, min_count: int = 1):
        self.min_count = min_count

    def run(self, ctx: AssemblyContext) -> None:
        seqs = [r for r in ctx.reads if len(r) > ctx.k]
        seqs += [s for s in ctx.extra_sequences if len(s) > ctx.k]
        res = construct_graph(seqs, ctx.k, min_count=self.min_count)
        ctx.graph = res.graph
        ctx.p1_counts = res.p1_counts
        log.info(
            "k=%d: %d unique (k+1)-mers, %d edges in raw graph",
            ctx.k, res.p1_counts.num_unique, len(res.graph.canonical_edge_ids()),
        )


class GenomicInfoFiller(AssemblyStage):
    """Coverage-model fit -> ec/trusted bounds (stages/genomic_info_filler.cpp)."""

    name = "EC Threshold Finding"
    id = "ec_threshold_finder"

    def run(self, ctx: AssemblyContext) -> None:
        ctx.genomic_info = fit_coverage_model(ctx.p1_counts.counts)
        log.info(
            "ec_bound=%.1f trusted=%.1f mean=%.1f genome~%d",
            ctx.genomic_info.ec_bound, ctx.genomic_info.trusted_bound,
            ctx.genomic_info.estimated_mean, ctx.genomic_info.genome_size,
        )


class Simplification(AssemblyStage):
    """Tip/bulge/EC simplification schedule (stages/simplification.cpp)."""

    name = "Simplification"
    id = "simplification"

    def __init__(self, cfg: SimplifyConfig | None = None):
        self.cfg = cfg

    def run(self, ctx: AssemblyContext) -> None:
        cfg = self.cfg or SimplifyConfig(read_length=ctx.read_length)
        ctx.graph, stats = simplify(ctx.graph, ctx.genomic_info, cfg)
        log.info(
            "simplified: %d edges (tips=%d bulges=%d ec=%d isolated=%d)",
            len(ctx.graph.canonical_edge_ids()),
            stats.tips, stats.bulges, stats.ec, stats.isolated,
        )


class ContigOutput(AssemblyStage):
    """Emit contigs/scaffolds/GFA (contig_output_stage.cpp equivalent)."""

    name = "Contig Output"
    id = "contig_output"

    def __init__(self, out_prefix: str = ""):
        self.out_prefix = out_prefix

    def run(self, ctx: AssemblyContext) -> None:
        ctx.contigs = extract_contigs(ctx.graph)
        if not ctx.scaffolds:
            ctx.scaffolds = ctx.contigs
        d = os.path.join(ctx.output_dir, self.out_prefix) if self.out_prefix else ctx.output_dir
        os.makedirs(d, exist_ok=True)
        write_contigs(os.path.join(d, "contigs.fasta"), ctx.contigs)
        write_contigs(os.path.join(d, "scaffolds.fasta"), ctx.scaffolds)
        write_gfa(os.path.join(d, "assembly_graph_with_scaffolds.gfa"), ctx.graph)
        log.info("%d contigs -> %s", len(ctx.contigs), d)
