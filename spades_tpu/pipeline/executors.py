"""Executor surface: pipeline descriptions and batch-system submission.

Capability mirror of the reference's executor family
(`/root/reference/src/projects/spades/pipeline/spades_pipeline/executors/`:
`ExecutorSaveYaml` dumps `run_spades.yaml`, `commands_parser.py:33-70` dumps
`run_spades.sh`, `ExecutorSLURM` builds sbatch job chains).  The TPU pipeline
runs in-process, so a "command" is a stage record; the YAML/sh artifacts keep
the same shape so downstream tooling (and `--continue` style re-runs) keep
working, and the SLURM writer emits a submittable script for cluster
schedulers."""
from __future__ import annotations

import os
import shlex
import sys


def pipeline_description(k_list, mode: str, careful: bool, has_long: bool, has_hmms: bool):
    """The outer command list (run_spades.yaml shape): one entry per K plus
    the shared outer stages."""
    cmds = [
        {"STAGE": "preprocess", "stage": "before_start"},
        {"STAGE": "error correction", "stage": "error_correction"},
    ]
    for i, k in enumerate(k_list):
        stages = ["construction", "ec_threshold_finder", "simplification", "gap_closer_late"]
        if i == len(k_list) - 1:
            if has_long:
                stages.append("hybrid_aligning")
            if careful:
                stages.append("mismatch_correction")
            stages.append("repeat_resolving")
            if has_hmms:
                stages.append("domain_analysis")
        stages.append("contig_output")
        cmds.append({"STAGE": f"K{k}", "stage": f"spades_k{k}", "phases": stages})
    cmds.append({"STAGE": "copy files", "stage": "terminate"})
    return cmds


def dump_yaml(path: str, commands: list[dict]) -> None:
    import yaml

    with open(path, "w") as fh:
        yaml.safe_dump(commands, fh, sort_keys=False)


def dump_sh(path: str, argv: list[str]) -> None:
    """run_spades.sh: re-runs this assembly with the same arguments."""
    with open(path, "w") as fh:
        fh.write("#!/bin/bash\nset -e\n")
        fh.write(
            f"{shlex.quote(sys.executable)} -m spades_tpu.pipeline.main "
            + " ".join(shlex.quote(a) for a in argv)
            + "\n"
        )
    os.chmod(path, 0o755)


def dump_slurm(path: str, argv: list[str], threads: int = 16, memory_gb: int = 250,
               partition: str | None = None, time_limit: str = "24:00:00",
               nnodes: int = 1, extra: str | None = None) -> None:
    """submit_spades.sh: sbatch script (executor_slurm.py surface; the
    --grid-queue/--grid-time/--grid-nnodes/--grid-extra option family)."""
    with open(path, "w") as fh:
        fh.write("#!/bin/bash\n")
        fh.write(f"#SBATCH --job-name=spades_tpu\n")
        fh.write(f"#SBATCH --cpus-per-task={threads}\n")
        fh.write(f"#SBATCH --mem={memory_gb}G\n")
        fh.write(f"#SBATCH --time={time_limit}\n")
        if nnodes > 1:
            fh.write(f"#SBATCH --nodes={nnodes}\n")
        if partition:
            fh.write(f"#SBATCH --partition={partition}\n")
        if extra:
            fh.write(f"#SBATCH {extra}\n")
        fh.write("set -e\n")
        fh.write(
            f"{shlex.quote(sys.executable)} -m spades_tpu.pipeline.main "
            + " ".join(shlex.quote(a) for a in argv)
            + "\n"
        )
    os.chmod(path, 0o755)
