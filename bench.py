#!/usr/bin/env python3
"""Benchmark: canonical k-mer counting throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The measured step is the counting-engine inner loop
(ops/count.py count_batch_device_tiled): fused Pallas extraction of both
orientations + canonicalization (ops/pallas_kernels.py), then the tiled
batched lexicographic sort with per-tile run boundaries — i.e. everything the
reference's KMerSplitter does per k-mer (scan read, emit packed canonical
k-mer into a per-thread buffer, pdqsort + dedup the buffer,
/root/reference/src/common/kmer_index/kmer_mph/kmer_splitter.hpp:75-120),
with tmp-file buckets replaced by on-device sorted tiles.  The loser-tree
bucket merge of the reference (`kmer_index_builder.hpp:346-430`) corresponds
to the host-side `merge_counts` run-merge, which is streaming O(total) work
amortized across batches in the real pipeline (not part of the device step,
same as the reference excludes the final merge from its splitter).

Methodology: the step is iterated inside ONE jitted lax.fori_loop and synced
with a single scalar pull.  Every output is reduced into the carry (full
forcing — nothing is dead-code-eliminated).  Through the axon tunnel a
dispatch+scalar round trip costs ~25-30 ms of pure network latency, which
would dominate at the measured ~0.5 ms/step; the dispatch floor is measured
with a trivial kernel and subtracted.

Baseline: MEASURED from the reference binaries built out of /root/reference
and run on this host (BASELINE_MEASURED.json): `spades-kmercount -k 21 -t 2`
counts the shared 10 Mb dataset's 260M windows at 6.84 Mkmers/s on the host's
2 threads; the >=5x north-star is against 32-thread C++ SPAdes, so the
anchor is the linear 32-thread extrapolation 109.5e6 kmers/s (optimistic for
the reference: its disk-bucket pipeline does not scale linearly).  When
BASELINE_MEASURED.json is absent the prior KMC2-class estimate (150e6)
applies.  vs_baseline is ours/baseline; the >=5x target means
vs_baseline >= 5.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 150e6  # KMC2-class estimate (fallback)
_bm = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
if os.path.exists(_bm):
    try:
        with open(_bm) as _fh:
            BASELINE_KMERS_PER_SEC = (
                json.load(_fh)["kmercount_10mb"]["mkmers_per_s_32threads_linear_extrapolation"] * 1e6
            )
    except Exception:  # noqa: BLE001 — fall back to the estimate
        pass
K = 21
R, L = 4096, 256
ITERS = 256

# Driver contract hardening (round-4 postmortem: the driver's timeout killed
# the bench mid-e2e and the round recorded NO parsed metric): the bench keeps
# its own deadline and guarantees the LAST line of output is always the most
# recent core(+partial) JSON — a SIGTERM/SIGINT reprints it before exit, and
# an internal SIGALRM aborts the e2e cleanly with whatever was measured.
BENCH_DEADLINE_S = float(os.environ.get("SPADES_BENCH_DEADLINE_S", "2700"))
_T0 = time.monotonic()
_LAST_JSON: dict = {}


def _remaining() -> float:
    return BENCH_DEADLINE_S - (time.monotonic() - _T0)


def _emit(obj: dict) -> None:
    global _LAST_JSON
    _LAST_JSON = obj
    print(json.dumps(obj), flush=True)


def _install_signal_reprint() -> None:
    import signal

    def handler(signum, frame):
        if _LAST_JSON:
            print(json.dumps(_LAST_JSON), flush=True)
        raise SystemExit(0)

    for s in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(s, handler)
        except (ValueError, OSError):
            pass


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spades_tpu.ops.count import count_batch_device_tiled
    from spades_tpu.ops.pallas_kernels import supports_pallas

    use_pallas = supports_pallas()

    rng = np.random.default_rng(7)
    n_kmers_per_iter = R * (L - K + 1)
    codes0 = jnp.asarray(rng.integers(0, 4, (R, L)).astype(np.uint8))
    lengths = jnp.full((R,), L, jnp.int32)
    n_mask = jnp.zeros((R, L), bool)

    # measure the dispatch+scalar round-trip floor to subtract it
    f0 = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    for _ in range(2):
        x = f0(x)
        _ = float(x)
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(f0(x))
    floor = (time.perf_counter() - t0) / 5

    def step(i, acc):
        c = jnp.bitwise_xor(codes0, (i & 3).astype(jnp.uint8))
        sw, st, nv = count_batch_device_tiled(
            c, lengths, n_mask, K, use_pallas=use_pallas
        )
        # reduce every output into the carry so nothing is dead-code-eliminated
        return (
            acc
            + jnp.sum(sw, dtype=jnp.uint32).astype(jnp.int32)
            + jnp.sum(st).astype(jnp.int32)
            + jnp.sum(nv)
        )

    fn = jax.jit(lambda _x: jax.lax.fori_loop(0, ITERS, step, jnp.int32(0)))

    # warmup / compile (scalar pull: through the axon tunnel,
    # block_until_ready alone does not guarantee execution completed)
    _ = int(fn(codes0))

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = int(fn(codes0))
        best = min(best, time.perf_counter() - t0)

    per_iter = max(best - floor, 1e-9) / ITERS
    kmers_per_sec = n_kmers_per_iter / per_iter
    core = {
        "metric": "canonical_kmer_counting_throughput",
        "value": round(kmers_per_sec / 1e6, 1),
        "unit": "Mkmers/s/chip",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 2),
        "extra": {
            **bench_simplify(),
            **bench_condense(),
            **speed_of_light(kmers_per_sec),
        },
    }
    # print the core line FIRST so a stall in the (compile-heavy) e2e pass
    # can never lose the primary metrics; the enriched line printed after
    # supersedes it (consumers take the last JSON line)
    _install_signal_reprint()
    _emit(core)
    import signal

    try:
        # abort the e2e with a catchable exception when the internal
        # deadline hits (30 s of slack to print + flush)
        rem = _remaining() - 30
        if rem <= 60:
            raise TimeoutError("no budget left for e2e")
        if hasattr(signal, "SIGALRM"):
            def alarm(_s, _f):
                raise TimeoutError(f"bench deadline {BENCH_DEADLINE_S}s hit")

            signal.signal(signal.SIGALRM, alarm)
            signal.alarm(int(rem))
        e2e = bench_e2e()
    except BaseException as exc:  # noqa: BLE001 — e2e must not sink the bench
        if isinstance(exc, SystemExit):
            raise
        e2e = {"e2e": {"error": str(exc)[:200]}}
    finally:
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)
    if e2e:
        core["extra"].update(e2e)
        _emit(core)


def speed_of_light(kmers_per_sec: float) -> dict:
    """Roofline statement for the counting step (SURVEY BASELINE asks for a
    speed-of-light account).  HBM traffic per k-mer: read the 2-bit codes
    (~1 B amortized across overlapping windows), write both sorted uint32
    words + run-start flags and read them back once for the dedup pass
    (3 x W x 4 B for W=2 words at k=21, + 1 B flags).  The 512-row tile sort
    itself is VMEM-resident, so the kernel is bounded by the bitonic
    compare-exchange network (~log2(512)^2 = 81 passes over W lanes) on the
    VPU, not by HBM."""
    hbm_bytes_per_kmer = 1 + 3 * 2 * 4 + 1
    implied_gbps = kmers_per_sec * hbm_bytes_per_kmer / 1e9
    return {
        "sol_hbm_bytes_per_kmer": hbm_bytes_per_kmer,
        "sol_implied_hbm_gbps": round(implied_gbps, 1),
        "sol_note": "VMEM-resident tile sort: compute-bound on the sort "
                    "network, HBM side uses the fraction above of ~819 GB/s (v5e)",
    }


def bench_condense() -> dict:
    """Condensation throughput: extension index -> condensed conjugate graph
    (the reference's parallel condensers, `construction.cpp` phase 3-4) on a
    2 Mnt random genome at k=55 — a ~2M-node chain, the worst case for the
    Wyllie list-ranking rounds.  Unit: input k-mers per second of condense()
    wall time (index build and counting excluded)."""
    import time

    import numpy as np

    from spades_tpu.core import dna
    from spades_tpu.ops.condense import condense
    from spades_tpu.ops.count import count_sequences
    from spades_tpu.ops.extension import build_extension_index

    rng = np.random.default_rng(3)
    genome = dna.decode(rng.integers(0, 4, 2_000_000).astype(np.uint8))
    kk = 55
    p1 = count_sequences([genome], kk + 1)
    index = build_extension_index(p1)
    t0 = time.perf_counter()
    g = condense(index, p1)
    dt = time.perf_counter() - t0
    return {
        "condense_2M_kmers_per_s": round(index.num_kmers / dt, 0),
        "condense_2M_wall_s": round(dt, 2),
        "condense_2M_edges": int(g.num_edges),
    }


def bench_simplify() -> dict:
    """Secondary metric: the full simplification schedule (TC/BR incl. Dijkstra
    bulges/EC x 10 iterations + compress after every mutating pass) on a
    1M-edge synthetic tangled graph — the graph-phase analog of the counting
    metric.  The reference runs this stage as parallel C++
    (`parallel_simplification_algorithms.hpp`); here it is the native
    chain-merging engine (native/simplify.cpp: O(1) pointer-splice merges,
    event-driven bulge retriggering, zero sequence copies until the final
    materialization sweep), and the unit is oriented edges of the input
    graph processed per second of schedule wall time."""
    import time

    from spades_tpu.graph.coverage_model import GenomicInfo
    from spades_tpu.graph.simplify import SimplifyConfig, simplify
    from spades_tpu.graph.synthetic import synthetic_tangled_graph

    g = synthetic_tangled_graph(1_000_000, k=21, seed=1, fill_sequences=False)
    e0 = g.num_edges
    info = GenomicInfo(
        ec_bound=5.0, trusted_bound=10.0, estimated_mean=30.0, genome_size=10**7
    )
    t0 = time.perf_counter()
    g2, stats = simplify(g, info, SimplifyConfig())
    dt = time.perf_counter() - t0
    return {
        "simplify_1M_edges_per_s": round(e0 / dt, 0),
        "simplify_1M_wall_s": round(dt, 2),
        "simplify_removed_edges": e0 - g2.num_edges,
    }


def make_e2e_dataset(G: int, cov: int, rl: int, err: float, seed: int = 42,
                     insert_mean: int = 400, insert_sd: int = 30):
    """Shared e2e dataset (ours AND the measured reference baseline run):
    G-nt random genome with planted dispersed repeats (3x500bp x 30 copies +
    1x2kb x 10 copies — the repeat structure RR/scaffolding must resolve,
    BASELINE config 3), FR paired reads at the given coverage with
    substitution errors.  Returns (genome_codes, r1_codes, r2_codes)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, G).astype(np.uint8)
    elems = [rng.integers(0, 4, 500).astype(np.uint8) for _ in range(3)]
    elems.append(rng.integers(0, 4, 2000).astype(np.uint8))
    for el, cnt in zip(elems, (30, 30, 30, 10)):
        for pos in rng.integers(0, G - len(el), cnt):
            genome[pos : pos + len(el)] = el
    n_pairs = G * cov // (2 * rl)
    isize = np.clip(
        rng.normal(insert_mean, insert_sd, n_pairs).astype(np.int64), 2 * rl, None
    )
    starts = rng.integers(0, G - isize.max() - 1, n_pairs)
    r1 = genome[starts[:, None] + np.arange(rl)]
    # FR: read2 is the reverse complement of the insert's right end
    r2f = genome[(starts + isize - rl)[:, None] + np.arange(rl)]
    r2 = np.ascontiguousarray((3 - r2f)[:, ::-1])
    for r in (r1, r2):
        em = rng.random(r.shape) < err
        r[em] = (r[em] + rng.integers(1, 4, int(em.sum()))) & 3
    return genome, r1, r2


def write_e2e_fastq(outdir: str, G: int = 10_000_000, cov: int = 30,
                    rl: int = 150, err: float = 0.003, seed: int = 42) -> None:
    """Write the shared e2e dataset as FASTQ pairs (+ genome FASTA) so the
    reference assembler can run the identical workload."""
    import os

    import numpy as np

    os.makedirs(outdir, exist_ok=True)
    genome, r1, r2 = make_e2e_dataset(G, cov, rl, err, seed)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    qual = "I" * rl
    for name, arr in (("r1", r1), ("r2", r2)):
        with open(os.path.join(outdir, f"{name}.fq"), "w") as fh:
            for i in range(arr.shape[0]):
                fh.write(
                    f"@p{i}/{1 if name == 'r1' else 2}\n"
                    + acgt[arr[i]].tobytes().decode() + f"\n+\n{qual}\n"
                )
    with open(os.path.join(outdir, "genome.fasta"), "w") as fh:
        fh.write(">genome\n")
        g = acgt[genome].tobytes().decode()
        for a in range(0, len(g), 80):
            fh.write(g[a : a + 80] + "\n")


def _n50(lens: list[int]) -> int:
    acc = 0
    for L in lens:
        acc += L
        if acc * 2 >= sum(lens):
            return L
    return 0


def _genome_fraction(contigs: list[str], genome, anchor: int = 63) -> float:
    """Approximate covered genome fraction: share of sampled genome anchors
    (every 500th canonical `anchor`-mer) present in the contig set."""
    import numpy as np

    from spades_tpu.core import dna
    from spades_tpu.ops.count import count_sequences, searchsorted_rows

    if not contigs:
        return 0.0
    kc = count_sequences(contigs, anchor, batch_size=16384)
    gseq = dna.decode(np.asarray(genome, np.uint8))
    stride = 500
    wins = [gseq[a : a + anchor] for a in range(0, len(gseq) - anchor, stride)]
    gk = count_sequences(wins, anchor, batch_size=16384)
    hit = searchsorted_rows(kc.words, gk.words) >= 0
    total = gk.counts.sum()
    return float((gk.counts * hit).sum() / max(total, 1))


def bench_e2e() -> dict:
    """End-to-end assembly benchmark (BASELINE config 3): PAIRED reads ->
    contigs + scaffolds on a 10 Mb synthetic genome with planted repeats,
    30x FR 2x150 bp pairs (IS 400+-30) with 0.3% substitution errors,
    k=21/33/55 ladder, full pipeline including PairInfoCount -> distance
    estimation -> exSPAnder repeat resolution -> scaffolding (run through
    the real stage manager, `pipeline/run.py:run_assembly`).

    The measured reference baseline for the SAME dataset (reference SPAdes
    built from /root/reference, run on this host via
    `.refbuild/inst/bin/spades.py --only-assembler -k 21,33,55`) is read
    from BASELINE_MEASURED.json when present and echoed as `ref_measured`.

    XLA compile cost is isolated in `compile_s_est` (first-dispatch wall
    minus warm per-batch mean); the persistent compile cache
    (spades_tpu.__init__) makes it a once-per-machine cost.
    Set SPADES_BENCH_E2E=0 to skip."""
    import json
    import os
    import tempfile
    import time

    if os.environ.get("SPADES_BENCH_E2E", "1") == "0":
        return {}

    from spades_tpu.pipeline import spades_stages
    from spades_tpu.pipeline.run import run_assembly
    from spades_tpu.pipeline.stages import STAGE_TIMES

    G = int(float(os.environ.get("SPADES_BENCH_E2E_MB", "10")) * 1e6)
    # shrink the dataset rather than blow the deadline when the remaining
    # budget cannot carry the full-size e2e (explicit env overrides win)
    if "SPADES_BENCH_E2E_MB" not in os.environ and _remaining() < 900:
        G = min(G, 2_000_000)
    cov, rl, err = 30, 150, 0.003
    genome, r1, r2 = make_e2e_dataset(G, cov, rl, err, seed=42)
    lefts = list(r1)
    rights = list(r2)
    n_reads = len(lefts) + len(rights)

    import logging

    logging.basicConfig(
        level=logging.INFO, stream=__import__("sys").stderr,
        format="%(asctime)s %(name)s: %(message)s",
    )
    STAGE_TIMES.clear()
    spades_stages.CONSTRUCT_PHASES.clear()
    outdir = tempfile.mkdtemp(prefix="bench_e2e_")
    t_all = time.perf_counter()
    res = run_assembly(
        lefts + rights, [21, 33, 55], outdir,
        paired_libs=[(lefts, rights)], read_length=rl, checkpoints="none",
    )
    wall = time.perf_counter() - t_all

    stage_s = {f"k{k}_{sid}": dt for k, sid, dt in STAGE_TIMES}
    phase_s = {f"k{k}_construct": tm for k, tm in spades_stages.CONSTRUCT_PHASES}
    compile_est = 0.0
    for _, tm in spades_stages.CONSTRUCT_PHASES:
        nb = tm.get("n_batches", 0)
        if nb > 1:
            warm = (tm["device_s"] - tm["device_first_s"]) / (nb - 1)
            compile_est += max(tm["device_first_s"] - warm, 0.0)
        elif nb == 1:
            compile_est += tm["device_first_s"]

    contigs = [c.seq for c in res.contigs]
    scaffolds = [c.seq for c in (res.scaffolds or res.contigs)]
    lens = sorted((len(s) for s in contigs), reverse=True)
    slens = sorted((len(s) for s in scaffolds), reverse=True)
    gfrac = _genome_fraction(contigs, genome)

    out = {
        "e2e": {
            "genome_mb": G / 1e6,
            "coverage": cov,
            "error_rate": err,
            "paired": True,
            "planted_repeats": "3x500bp x30 + 2kb x10",
            "wall_s": round(wall, 1),
            "reads_per_s": round(n_reads / wall, 0),
            "n_contigs": len(lens),
            "n50": _n50(lens),
            "scaffold_n50": _n50(slens),
            "largest": lens[0] if lens else 0,
            "total_len": sum(lens),
            "genome_fraction": round(gfrac, 4),
            "compile_s_est": round(compile_est, 1),
            "wall_minus_compile_s": round(wall - compile_est, 1),
            "stages": stage_s,
            "construct_phases": phase_s,
        }
    }
    bm = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(bm):
        with open(bm) as fh:
            out["e2e"]["ref_measured"] = json.load(fh)
        ref_wall = out["e2e"]["ref_measured"].get("e2e_10mb", {}).get("wall_s")
        if ref_wall:
            out["e2e"]["vs_ref_wall"] = round(ref_wall / wall, 2)
    return out


if __name__ == "__main__":
    main()
