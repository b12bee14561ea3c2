"""Full-pack checkpoint coverage (io/binary/graph_pack.hpp FullPackIO analog):
paired indices, long-read storage, and the kmer mapper survive stage saves, so
--restart-from inside the repeat-resolution region restores state instead of
recomputing from the reads."""
import os

import numpy as np
import pytest

from spades_tpu.core import dna
from spades_tpu.pipeline.run import run_assembly
from tests.conftest import random_dna


def _paired_reads(genome, rng, n=300, rl=50, insert=150):
    lefts, rights = [], []
    for _ in range(n):
        a = int(rng.integers(0, len(genome) - insert))
        lefts.append(genome[a : a + rl])
        rights.append(dna.revcomp_str(genome[a + insert - rl : a + insert]))
    return lefts, rights


class TestSerializers:
    def test_paired_index_roundtrip(self, tmp_path):
        from spades_tpu.graph.serialize import load_paired_index, save_paired_index
        from spades_tpu.paired.paired_info import PairedIndex

        pi = PairedIndex(
            e1=np.array([0, 0, 2]), e2=np.array([1, 3, 4]),
            dist=np.array([100.0, 220.0, 90.0]), weight=np.array([3.0, 1.0, 7.0]),
        )
        f = str(tmp_path / "pi.npz")
        save_paired_index(f, pi)
        got = load_paired_index(f)
        for a in ("e1", "e2", "dist", "weight"):
            assert np.array_equal(getattr(got, a), getattr(pi, a))

    def test_long_reads_roundtrip(self, tmp_path):
        from spades_tpu.alignment.long_read import LongReadStorage
        from spades_tpu.graph.serialize import load_long_reads, save_long_reads

        st = LongReadStorage()
        st.paths[(1, 2, 3)] = 4
        st.paths[(7, 9)] = 1
        f = str(tmp_path / "lr.npz")
        save_long_reads(f, st)
        got = load_long_reads(f)
        assert got.paths == st.paths

    def test_kmer_mapper_roundtrip(self, tmp_path):
        from spades_tpu.alignment.kmer_mapper import KmerMapper
        from spades_tpu.graph.serialize import load_kmer_mapper, save_kmer_mapper

        m = KmerMapper(k=13)
        src = np.array([[1, 2], [5, 6]], np.uint32)
        dst = np.array([[9, 9], [8, 8]], np.uint32)
        m._src.append(src)
        m._dst.append(dst)
        f = str(tmp_path / "km.npz")
        save_kmer_mapper(f, m)
        got = load_kmer_mapper(f)
        assert got.k == 13
        assert np.array_equal(got._sorted_src, np.array([[1, 2], [5, 6]], np.uint32))
        assert np.array_equal(got._sorted_dst, np.array([[9, 9], [8, 8]], np.uint32))


class TestRestartInsideRR:
    def test_restart_from_rr_without_reads(self, tmp_path, rng):
        """Run with --checkpoints all, then restart from repeat_resolving with
        the read data REMOVED: the full pack must restore the clustered paired
        indices (distance_estimation save) and produce identical contigs."""
        k = 21
        genome = random_dna(rng, 2500)
        lefts, rights = _paired_reads(genome, rng, n=800, rl=60, insert=200)
        reads = lefts + rights
        out = str(tmp_path / "asm")
        res = run_assembly(
            reads, [k], out, paired_libs=[(lefts, rights)], read_length=60,
            checkpoints="all",
        )
        assert res.contigs
        first = [(c.name, c.seq) for c in res.contigs]
        saves = os.path.join(out, f"K{k}", "saves", "distance_estimation")
        assert os.path.exists(os.path.join(saves, "paired_index.npz"))
        assert os.path.exists(os.path.join(saves, "scaffold_index.npz"))

        # restart with NO reads and NO paired libs: everything must come
        # from the saves
        res2 = run_assembly(
            [], [k], out, paired_libs=None, read_length=60,
            checkpoints="all", restart_from=f"k{k}:repeat_resolving",
        )
        second = [(c.name, c.seq) for c in res2.contigs]
        assert first == second

    def test_pair_info_count_save_has_raw_libs(self, tmp_path, rng):
        k = 21
        genome = random_dna(rng, 1500)
        lefts, rights = _paired_reads(genome, rng, n=400, rl=60, insert=180)
        out = str(tmp_path / "asm")
        run_assembly(
            lefts + rights, [k], out, paired_libs=[(lefts, rights)],
            read_length=60, checkpoints="all",
        )
        saves = os.path.join(out, f"K{k}", "saves", "pair_info_count")
        assert os.path.exists(os.path.join(saves, "raw_pairs_0.npz"))
        import json

        state = json.load(open(os.path.join(saves, "state.json")))
        assert state["raw_pair_libs"][0][0] == "paired-end"
