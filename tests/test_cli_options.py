"""CLI option-family tests: numbered libraries, --disable-rr, --gfa11,
--stop-after, --only-generate-config, --tmp-dir (options_parser.py parity)."""
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.pipeline.main import extract_numbered_libs, main
from tests.conftest import random_dna


def _write_pairs(tmp_path, genome, name, n=150, rl=80, insert=200, seed=0):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(genome) - insert, n)
    p1, p2 = str(tmp_path / f"{name}_1.fa"), str(tmp_path / f"{name}_2.fa")
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i, a in enumerate(starts):
            f1.write(f">r{i}/1\n{genome[a:a+rl]}\n")
            f2.write(f">r{i}/2\n{dna.revcomp_str(genome[a+insert-rl:a+insert])}\n")
    return p1, p2


class TestNumberedLibs:
    def test_extraction(self):
        rest, libs = extract_numbered_libs(
            ["--pe1-1", "a.fq", "--pe1-2", "b.fq", "--pe1-rf",
             "--hqmp3-s", "u.fq", "--s2", "x.fq", "-o", "out", "-k", "21"]
        )
        assert rest == ["-o", "out", "-k", "21"]
        assert libs[("pe", 1)] == {"orientation": "rf", "1": ["a.fq"], "2": ["b.fq"]}
        assert libs[("hqmp", 3)] == {"orientation": "", "s": ["u.fq"]}
        assert libs[("single", 2)] == {"orientation": "", "s": ["x.fq"]}

    def test_two_numbered_pe_libs_assemble(self, tmp_path, rng):
        genome = random_dna(rng, 1200)
        a1, a2 = _write_pairs(tmp_path, genome, "libA", seed=1)
        b1, b2 = _write_pairs(tmp_path, genome, "libB", seed=2)
        out = str(tmp_path / "out")
        rc = main(["--pe1-1", a1, "--pe1-2", a2, "--pe2-1", b1, "--pe2-2", b2,
                   "-o", out, "-k", "21", "--only-assembler", "--platform", "cpu"])
        assert rc == 0
        from spades_tpu.io.fastx import read_fastx

        contigs = list(read_fastx(os.path.join(out, "contigs.fasta")))
        assert contigs and max(len(c.seq) for c in contigs) > 1000


class TestAdvancedOptions:
    def test_disable_rr_and_gfa11(self, tmp_path, rng):
        genome = random_dna(rng, 800)
        p1, p2 = _write_pairs(tmp_path, genome, "lib", seed=3)
        out = str(tmp_path / "out")
        rc = main(["-1", p1, "-2", p2, "-o", out, "-k", "21",
                   "--only-assembler", "--disable-rr", "--gfa11",
                   "--platform", "cpu"])
        assert rc == 0
        gfa = open(os.path.join(out, "assembly_graph_with_scaffolds.gfa")).read()
        assert "VN:Z:1.1" in gfa.splitlines()[0]
        assert os.path.exists(os.path.join(out, "contigs.fasta"))

    def test_stop_after_k_truncates_ladder(self, tmp_path, rng):
        genome = random_dna(rng, 800)
        p1, p2 = _write_pairs(tmp_path, genome, "lib", seed=4)
        out = str(tmp_path / "out")
        rc = main(["-1", p1, "-2", p2, "-o", out, "-k", "21,33,55",
                   "--stop-after", "k33", "--only-assembler",
                   "--platform", "cpu"])
        assert rc == 0
        assert os.path.isdir(os.path.join(out, "K21"))
        assert os.path.isdir(os.path.join(out, "K33"))
        assert not os.path.isdir(os.path.join(out, "K55"))

    def test_only_generate_config(self, tmp_path, rng):
        genome = random_dna(rng, 500)
        p1, p2 = _write_pairs(tmp_path, genome, "lib", seed=5)
        out = str(tmp_path / "out")
        rc = main(["-1", p1, "-2", p2, "-o", out, "-k", "21",
                   "--only-generate-config", "--only-assembler",
                   "--platform", "cpu"])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "run_spades.yaml"))
        assert os.path.exists(os.path.join(out, "run_spades.sh"))
        assert not os.path.exists(os.path.join(out, "contigs.fasta"))

    def test_tmp_dir_and_sanger(self, tmp_path, rng):
        genome = random_dna(rng, 800)
        p1, p2 = _write_pairs(tmp_path, genome, "lib", seed=6)
        sang = str(tmp_path / "sanger.fa")
        with open(sang, "w") as f:
            f.write(f">s1\n{genome[100:700]}\n")
        out = str(tmp_path / "out")
        td = str(tmp_path / "mytmp")
        rc = main(["-1", p1, "-2", p2, "--sanger", sang, "-o", out,
                   "-k", "21", "--only-assembler", "--tmp-dir", td,
                   "--platform", "cpu"])
        assert rc == 0
        assert os.path.isdir(td)

    def test_read_cov_threshold_filters(self, tmp_path, rng):
        genome = random_dna(rng, 600)
        p1, p2 = _write_pairs(tmp_path, genome, "lib", n=120, seed=7)
        # contaminate with a junk single-end read that shares no kmers
        junk = str(tmp_path / "junk.fa")
        with open(junk, "w") as f:
            f.write(f">j\n{random_dna(np.random.default_rng(99), 80)}\n")
        out = str(tmp_path / "out")
        rc = main(["-1", p1, "-2", p2, "-s", junk, "-o", out, "-k", "21",
                   "--only-assembler", "--read-cov-threshold", "2",
                   "--platform", "cpu"])
        assert rc == 0
