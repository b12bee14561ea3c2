"""Shared CLI plumbing for the standalone tools (spades_tools equivalents)."""
from __future__ import annotations

import argparse
import logging
import os
import sys


def make_parser(prog: str, description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description=description)
    p.add_argument("-k", "--kmer", type=int, default=21, help="k-mer length (odd)")
    p.add_argument(
        "-w", "--workdir", default=".", help="working/output directory"
    )
    p.add_argument("-t", "--threads", type=int, default=0, help="accepted for CLI parity (device parallelism is used instead)")
    p.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    return p


def setup(args) -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname).1s %(name)s: %(message)s"
    )
    # --platform wins; else honor JAX_PLATFORMS, which the container's
    # sitecustomize would otherwise override with the axon TPU backend
    platform = args.platform or os.environ.get("JAX_PLATFORMS")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def check_odd_k(k: int) -> None:
    if k % 2 == 0 or k < 3 or k > 127:
        sys.exit(f"error: k must be odd and in [3, 127], got {k}")


def check_inputs_exist(paths) -> None:
    import os

    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        sys.exit(f"error: input file(s) not found: {', '.join(missing)}")
