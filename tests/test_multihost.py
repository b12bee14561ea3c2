"""Multi-host (multi-process) collective correctness.

The CI analog of the reference's N-MPI-ranks-on-one-machine smoke
(`.github/workflows/basic.yml:216-249`): 2 jax processes x 4 virtual CPU
devices over one global mesh, counting with cross-process collectives,
verified against the host oracle by process 0."""
from __future__ import annotations

import numpy as np
import pytest


@pytest.mark.slow
def test_two_process_dryrun():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_graft", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multihost(2, 4)


def test_process_read_slice_weighted():
    from spades_tpu.parallel.distributed import process_read_slice

    # explicit weights: 3:1 split (partask thread-weighting semantics)
    lo0, hi0 = process_read_slice(100, 0, 2, weights=[3, 1])
    lo1, hi1 = process_read_slice(100, 1, 2, weights=[3, 1])
    assert (lo0, hi0) == (0, 75)
    assert (lo1, hi1) == (75, 100)
    # slices tile the input
    assert hi0 == lo1 and hi1 == 100
