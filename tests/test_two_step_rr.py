"""Two-step (meta) repeat resolution: preliminary RR -> SecondPhaseSetup -> RR."""
import os

import numpy as np
import pytest

from spades_tpu.pipeline.main import main
from tests.conftest import random_dna


def test_second_phase_setup_feeds_trusted_paths(rng):
    from spades_tpu.graph.graph import CondensedGraph
    from spades_tpu.io.contigs import Contig
    from spades_tpu.pipeline.spades_stages import SecondPhaseSetup
    from spades_tpu.pipeline.stages import AssemblyContext

    k = 21
    s = random_dna(rng, 400)
    g = CondensedGraph.from_sequences([s], k)
    ctx = AssemblyContext(k=k, output_dir=".", graph=g)
    ctx.contigs = [Contig(name="NODE_1", seq=s, coverage=10.0, edge_id=-1)]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ctx.output_dir = d
        SecondPhaseSetup().run(ctx)
        assert os.path.exists(os.path.join(d, "first_pe_contigs.fasta"))
    # RR products cleared
    assert ctx.contigs == [] and ctx.scaffolds == []
    # single-edge path is not storable (needs >= 2 edges) but storage exists
    assert ctx.long_read_storage is not None


def test_meta_two_step_pipeline(rng, tmp_path):
    """Meta mode with paired reads runs the preliminary RR + second phase and
    still produces correct contigs."""
    genome = random_dna(rng, 1200)
    r1s, r2s = [], []
    rlen, ins = 80, 200
    for _ in range(600):
        a = int(rng.integers(0, len(genome) - ins))
        r1s.append(genome[a : a + rlen])
        frag_end = a + ins
        from spades_tpu.core import dna

        r2s.append(dna.revcomp_str(genome[frag_end - rlen : frag_end]))
    p1, p2 = str(tmp_path / "r1.fasta"), str(tmp_path / "r2.fasta")
    for p, rs in ((p1, r1s), (p2, r2s)):
        with open(p, "w") as fh:
            for i, r in enumerate(rs):
                fh.write(f">r{i}\n{r}\n")
    out = str(tmp_path / "out")
    rc = main(["--meta", "-1", p1, "-2", p2, "-o", out, "--platform", "cpu",
               "-k", "21", "--only-assembler"])
    assert rc == 0
    from spades_tpu.io.fastx import read_fastx

    contigs = list(read_fastx(os.path.join(out, "contigs.fasta")))
    assert len(contigs) >= 1
    # the genome is assembled in one piece
    assert max(len(c.seq) for c in contigs) >= 1100
    # the preliminary contigs were preserved by SecondPhaseSetup
    assert os.path.exists(os.path.join(out, "K21", "first_pe_contigs.fasta"))
    log = open(os.path.join(out, "spades.log")).read()
    assert "Second Phase Setup" in log
    assert "Preliminary Repeat Resolving" in log
