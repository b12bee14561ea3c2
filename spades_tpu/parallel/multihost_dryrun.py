"""Multi-host dryrun worker: N processes x M virtual CPU devices.

Run as `python -m spades_tpu.parallel.multihost_dryrun --process-id I ...`
once per process; process 0 cross-checks the multi-process sharded count
against the host oracle and prints MULTIHOST_OK.  This is the CI analog of
the reference's "multi-node simulated by N MPI ranks on one machine" smoke
(`.github/workflows/basic.yml:216-249`, SURVEY §4)."""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--coordinator", default="localhost:12765")
    ap.add_argument("--k", type=int, default=15)
    args = ap.parse_args(argv)

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={args.devices_per_process}"
    )
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == args.num_processes * args.devices_per_process

    import numpy as np

    from spades_tpu.core.reads import ReadBatch
    from spades_tpu.parallel.distributed import (
        count_kmers_sharded_multihost,
        global_mesh,
        process_read_slice,
    )

    mesh = global_mesh()
    rng = np.random.default_rng(7)
    n_reads = 8 * jax.device_count()
    reads = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, 48)) for _ in range(n_reads)
    ]
    lo, hi = process_read_slice(n_reads)
    # equal local shapes: the weighted split of an even total is even here
    local = ReadBatch.from_sequences(reads[lo:hi])
    kc = count_kmers_sharded_multihost(local, args.k, mesh)

    # every process holds the same global result (SyncWorld analog)
    if args.process_id == 0:
        from spades_tpu.ops.count import count_batch_host

        full = ReadBatch.from_sequences(reads)
        ref = count_batch_host(full.codes, full.lengths, full.n_mask, args.k)
        assert np.array_equal(kc.words, ref.words), "words mismatch vs oracle"
        assert np.array_equal(kc.counts, ref.counts), "counts mismatch vs oracle"
        print("MULTIHOST_OK", kc.num_unique, flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
