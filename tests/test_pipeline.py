"""Full pipeline CLI tests: the --test smoke contract, checkpoints, restart."""
import json
import os

import numpy as np
import pytest

from spades_tpu.pipeline.main import main
from tests.conftest import random_dna


def test_cli_test_mode(tmp_path, ecoli_1k_reads):
    out = str(tmp_path / "test_run")
    rc = main(["--test", "-o", out, "--platform", "cpu", "-k", "21,33"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "contigs.fasta"))
    assert os.path.exists(os.path.join(out, "scaffolds.fasta"))
    assert os.path.exists(os.path.join(out, "assembly_graph_with_scaffolds.gfa"))
    assert os.path.exists(os.path.join(out, "spades.log"))
    assert os.path.exists(os.path.join(out, "params.txt"))
    from spades_tpu.io.fastx import read_fastx

    contigs = list(read_fastx(os.path.join(out, "contigs.fasta")))
    assert len(contigs) == 1 and len(contigs[0].seq) == 1000


def test_cli_errors(tmp_path, capsys):
    assert main(["-o", str(tmp_path / "x")]) == 64  # no input
    assert main([]) == 64  # no output dir
    # even k rejected
    rc = main([
        "-s", "/dev/null", "-o", str(tmp_path / "y"), "-k", "20", "--platform", "cpu",
    ])
    assert rc in (64, 65)


def test_continue_and_restart(tmp_path, rng):
    genome = random_dna(rng, 400)
    reads_path = str(tmp_path / "reads.fasta")
    with open(reads_path, "w") as fh:
        for i in range(0, 320, 4):
            fh.write(f">r{i}\n{genome[i:i+80]}\n")
    out = str(tmp_path / "run")
    rc = main(["-s", reads_path, "-o", out, "-k", "21", "--platform", "cpu",
               "--checkpoints", "all"])
    assert rc == 0
    cp = json.load(open(os.path.join(out, "K21", "saves", "checkpoint.json")))
    assert cp["last_stage"] == "contig_output"
    c1 = open(os.path.join(out, "contigs.fasta")).read()

    # --continue: resumes (and is a no-op rerun producing the same output)
    rc = main(["-s", reads_path, "-o", out, "-k", "21", "--platform", "cpu",
               "--continue"])
    assert rc == 0
    assert open(os.path.join(out, "contigs.fasta")).read() == c1

    # --restart-from a mid-pipeline stage
    rc = main(["-s", reads_path, "-o", out, "-k", "21", "--platform", "cpu",
               "--restart-from", "k21:simplification", "--checkpoints", "all"])
    assert rc == 0
    assert open(os.path.join(out, "contigs.fasta")).read() == c1


def test_graph_serialization_roundtrip(tmp_path, rng):
    from spades_tpu.graph.serialize import load_graph, save_graph
    from spades_tpu.pipeline.construction import construct_graph

    g = construct_graph([random_dna(rng, 300) for _ in range(5)], 21).graph
    path = str(tmp_path / "graph.npz")
    save_graph(path, g)
    g2 = load_graph(path)
    g2.check_invariants()
    np.testing.assert_array_equal(g.e_len, g2.e_len)
    np.testing.assert_array_equal(g.seq_pool, g2.seq_pool)
    assert g.k == g2.k
