"""Time tracer, error codes, corrector tool, trivial graph tests."""
import json
import os

import numpy as np

from spades_tpu.core import dna
from spades_tpu.graph.graph import CondensedGraph
from spades_tpu.utils import timetracer
from spades_tpu.utils.errors import ExitCode, SpadesError


def _random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, n).astype(np.uint8))


class TestTimeTracer:
    def test_scopes_written(self, tmp_path):
        timetracer.enable()
        with timetracer.trace_scope("outer", "detail"):
            with timetracer.trace_scope("inner"):
                pass
        timetracer.instant("marker")
        out = str(tmp_path / "trace.json")
        timetracer.write(out)
        timetracer.disable()
        data = json.load(open(out))
        names = [e["name"] for e in data["traceEvents"]]
        assert "outer" in names and "inner" in names and "marker" in names
        outer = next(e for e in data["traceEvents"] if e["name"] == "outer")
        assert outer["ph"] == "X" and outer["args"]["detail"] == "detail"

    def test_disabled_noop(self):
        timetracer.disable()
        with timetracer.trace_scope("ignored"):
            pass  # must not raise or record


class TestErrors:
    def test_codes(self):
        assert ExitCode.INVALID_INPUT_FORMAT == 64
        assert ExitCode.MEMORY_LIMIT_EXCEEDED == 68
        e = SpadesError("bad", ExitCode.FILE_NOT_FOUND)
        assert e.code == 66


class TestTrivialGraph:
    def test_from_sequences_invariants(self):
        g = CondensedGraph.from_sequences([_random_seq(100, 1), _random_seq(80, 2)], 21)
        assert len(g.canonical_edge_ids()) == 2
        g.check_invariants()

    def test_sequences_roundtrip(self):
        s = _random_seq(60, 3)
        g = CondensedGraph.from_sequences([s], 21)
        e = int(g.canonical_edge_ids()[0])
        assert g.edge_seq(e) in (s, dna.revcomp_str(s))


class TestCorrectorTool:
    def test_polishes_contig(self, tmp_path):
        from spades_tpu.io.fastx import write_fasta
        from spades_tpu.tools import corrector

        genome = _random_seq(800, seed=10)
        bad = list(dna.encode(genome))
        bad[333] = (bad[333] + 1) % 4
        bad_contig = dna.decode(np.array(bad, np.uint8))
        contigs = str(tmp_path / "contigs.fasta")
        write_fasta(contigs, [("NODE_1", bad_contig)])
        reads_f = str(tmp_path / "reads.fasta")
        reads = [genome[s : s + 100] for s in range(0, 700, 3)]
        write_fasta(reads_f, [(f"r{i}", r) for i, r in enumerate(reads)])
        wd = str(tmp_path / "out")
        assert corrector.main([contigs, reads_f, "-w", wd]) == 0
        txt = open(os.path.join(wd, "corrected_contigs.fasta")).read()
        seq = "".join(txt.split("\n")[1:])
        assert seq == genome


class TestModeWrappers:
    def test_wrappers_inject_mode_flags(self, tmp_path, rng):
        from tests.conftest import random_dna
        from spades_tpu.pipeline.wrappers import rnaspades

        reads = str(tmp_path / "r.fasta")
        s = random_dna(rng, 400)
        with open(reads, "w") as fh:
            for i in range(100):
                a = int(rng.integers(0, 320))
                fh.write(f">r{i}\n{s[a:a+80]}\n")
        out = str(tmp_path / "o")
        rc = rnaspades(["-s", reads, "-o", out, "--platform", "cpu", "-k", "21"])
        assert rc == 0
        import os
        assert os.path.exists(os.path.join(out, "transcripts.fasta"))
        params = open(os.path.join(out, "params.txt")).read()
        assert "mode=rna" in params

    def test_all_wrappers_importable(self):
        from spades_tpu.pipeline import (  # noqa: F401
            coronaspades, metaplasmidspades, metaspades, metaviralspades,
            plasmidspades, rnaspades, rnaviralspades,
        )
