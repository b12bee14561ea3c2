"""Byte-diff vs outputs of the ACTUAL reference assembler (VERDICT r4 item 1).

Golden files under tests/golden/ were produced by building /root/reference
(CMake Release) and running its own `spades.py --test` (ref_test_out/) and
`spades.py --only-assembler` on the same bundled 1K dataset
(ref_test_out_oa/) on this host; the build recipe and measured walls are in
BASELINE_MEASURED.json.

Known, enumerated divergences (also recorded in PARITY.md):
  D1 orientation — the reference emits each contig in its stored edge's
     orientation, which depends on its id-assignment order during
     construction; ours may be the reverse complement.  Sequences are
     compared up to RC.
  D2 hammer coverage — with error correction on, corrected read sets differ
     slightly (our BayesHammer is a redesign), so the header coverage value
     differs in the --test (with-EC) comparison: ours 141.669841 vs
     140.620106.  With --only-assembler the header matches byte-for-byte.
  D3 graph segment ids — GFA segment names are internal edge ids; ours
     differ.  Segment SEQUENCES and counts are compared instead.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from spades_tpu.core import dna

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD_OA = os.path.join(HERE, "golden", "ref_test_out_oa")
GOLD_EC = os.path.join(HERE, "golden", "ref_test_out")
R1 = "/root/reference/src/projects/spades/test_dataset/ecoli_1K_1.fq.gz"
R2 = "/root/reference/src/projects/spades/test_dataset/ecoli_1K_2.fq.gz"


def _fasta(path):
    """[(header, seq)] of a FASTA file."""
    out, name, seq = [], None, []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    out.append((name, "".join(seq)))
                name, seq = line[1:], []
            else:
                seq.append(line)
    if name is not None:
        out.append((name, "".join(seq)))
    return out


@pytest.fixture(scope="module")
def ours_oa(tmp_path_factory):
    if not os.path.exists(R1):
        pytest.skip("reference test dataset not available")
    out = str(tmp_path_factory.mktemp("ours_1k_oa"))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "spades_tpu.pipeline.main",
         "-1", R1, "-2", R2, "-o", out, "--only-assembler"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(HERE),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return out


class TestOnlyAssemblerBytes:
    """--only-assembler: no EC in either pipeline, so headers (including the
    coverage value) and sequences must match byte-for-byte up to D1."""

    def test_contigs_headers_and_sequences(self, ours_oa):
        ref = _fasta(os.path.join(GOLD_OA, "contigs.fasta"))
        ours = _fasta(os.path.join(ours_oa, "contigs.fasta"))
        assert [h for h, _ in ours] == [h for h, _ in ref]
        for (_, so), (_, sr) in zip(ours, ref):
            assert so == sr or so == dna.revcomp_str(sr)  # D1

    def test_scaffolds_headers_and_sequences(self, ours_oa):
        ref = _fasta(os.path.join(GOLD_OA, "scaffolds.fasta"))
        ours = _fasta(os.path.join(ours_oa, "scaffolds.fasta"))
        assert [h for h, _ in ours] == [h for h, _ in ref]
        for (_, so), (_, sr) in zip(ours, ref):
            assert so == sr or so == dna.revcomp_str(sr)  # D1

    def test_contigs_fasta_line_width(self, ours_oa):
        with open(os.path.join(ours_oa, "contigs.fasta")) as fh:
            lines = [l.rstrip("\n") for l in fh if not l.startswith(">")]
        with open(os.path.join(GOLD_OA, "contigs.fasta")) as fh:
            rlines = [l.rstrip("\n") for l in fh if not l.startswith(">")]
        assert [len(l) for l in lines] == [len(l) for l in rlines]

    def test_gfa_segment_sequences(self, ours_oa):
        def segs(path):
            out = []
            with open(path) as fh:
                for line in fh:
                    if line.startswith("S\t"):
                        out.append(line.split("\t")[2].strip())
            return sorted(min(s, dna.revcomp_str(s)) for s in out)  # D1/D3

        ref = segs(os.path.join(GOLD_OA, "assembly_graph_with_scaffolds.gfa"))
        ours = segs(os.path.join(ours_oa, "assembly_graph_with_scaffolds.gfa"))
        assert ours == ref

    def test_paths_record_shape(self, ours_oa):
        """contigs.paths: same record structure (name, name' pairs, one
        oriented segment per line for the single-contig case); segment ids
        themselves are D3."""
        with open(os.path.join(ours_oa, "contigs.paths")) as fh:
            ours = [l.strip() for l in fh]
        with open(os.path.join(GOLD_OA, "contigs.paths")) as fh:
            ref = [l.strip() for l in fh]
        assert len(ours) == len(ref)
        assert ours[0] == ref[0]                      # name line matches
        assert ours[2] == ref[2]                      # conjugate name line


class TestWithEcBytes:
    """Full --test equivalent (error correction on): sequences byte-identical
    up to D1; header coverage is the enumerated D2 divergence."""

    @pytest.fixture(scope="class")
    def ours_ec(self, tmp_path_factory):
        if not os.path.exists(R1):
            pytest.skip("reference test dataset not available")
        out = str(tmp_path_factory.mktemp("ours_1k_ec"))
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [sys.executable, "-m", "spades_tpu.pipeline.main",
             "-1", R1, "-2", R2, "-o", out],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(HERE),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return out

    def test_sequences_identical_up_to_rc(self, ours_ec):
        ref = _fasta(os.path.join(GOLD_EC, "contigs.fasta"))
        ours = _fasta(os.path.join(ours_ec, "contigs.fasta"))
        assert len(ours) == len(ref) == 1
        (_, so), (_, sr) = ours[0], ref[0]
        assert so == sr or so == dna.revcomp_str(sr)  # D1
        assert len(so) == 1000

    @pytest.mark.xfail(reason="D2: redesigned BayesHammer corrects a "
                              "slightly different read set; header coverage "
                              "differs (141.67 vs 140.62)", strict=True)
    def test_headers_identical(self, ours_ec):
        ref = _fasta(os.path.join(GOLD_EC, "contigs.fasta"))
        ours = _fasta(os.path.join(ours_ec, "contigs.fasta"))
        assert [h for h, _ in ours] == [h for h, _ in ref]


class TestPlasmidOracle:
    """Plasmid --test oracle (check_test_script.py:58-76: 1 contig x 9689 bp
    in plasmid mode).  Our circular-contig convention spells the cycle plus
    a k-wrap (9612 cycle k-mers + 55 = 9667 nt); the reference's emitted
    contig carries a 77 nt duplicated wrap (9689 nt) — same cycle, same
    55-mer content (divergence D4 in PARITY.md).  The assertion is therefore
    one contig, identical canonical 55-mer set, length in [9667, 9689]."""

    PL1 = "/root/reference/src/projects/spades/test_dataset_plasmid/pl1.fq.gz"
    PL2 = "/root/reference/src/projects/spades/test_dataset_plasmid/pl2.fq.gz"

    def test_plasmid_single_contig(self, tmp_path):
        if not os.path.exists(self.PL1):
            pytest.skip("plasmid test dataset not available")
        out = str(tmp_path / "plasmid_out")
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [sys.executable, "-m", "spades_tpu.pipeline.main", "--plasmid",
             "-1", self.PL1, "-2", self.PL2, "-o", out],
            capture_output=True, text=True, env=env, cwd=os.path.dirname(HERE),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        for f in ("contigs.fasta", "scaffolds.fasta"):
            recs = _fasta(os.path.join(out, f))
            assert len(recs) == 1, [h for h, _ in recs]
            seq = recs[0][1]
            assert 9667 <= len(seq) <= 9689, len(seq)
        # 55-mer content identical to the reference's 9689-bp golden contig
        gold = os.path.join(GOLD_EC, "..", "ref_plasmid", "contigs.fasta")
        if os.path.exists(gold):
            from spades_tpu.ops.count import count_sequences, searchsorted_rows

            ref_seq = _fasta(gold)[0][1]
            a = count_sequences([seq], 55)
            b = count_sequences([ref_seq], 55)
            assert a.num_unique == b.num_unique
            assert (searchsorted_rows(b.words, a.words) >= 0).all()
