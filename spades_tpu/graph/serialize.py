"""Binary (de)serialization of the condensed graph and pipeline state.

Covers the reference's saves layer (`/root/reference/src/common/io/binary/
graph_pack.hpp`, versioned BinRead/BinWrite of every GraphPack member) with
npz archives of the flat graph arrays — the natural format for an
array-of-structs graph.
"""
from __future__ import annotations

import json
import os

import numpy as np

from .graph import CondensedGraph

FORMAT_VERSION = 1


def save_graph(path: str, g: CondensedGraph) -> None:
    np.savez_compressed(
        path,
        version=np.int64(FORMAT_VERSION),
        k=np.int64(g.k),
        e_start=g.e_start, e_end=g.e_end, e_conj=g.e_conj,
        e_off=g.e_off, e_len=g.e_len, e_cov=g.e_cov,
        alive=g.alive, seq_pool=g.seq_pool, v_conj=g.v_conj,
    )


def load_graph(path: str) -> CondensedGraph:
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path)
    ver = int(z["version"])
    if ver != FORMAT_VERSION:
        raise ValueError(f"{path}: unsupported graph format version {ver}")
    return CondensedGraph(
        k=int(z["k"]),
        e_start=z["e_start"], e_end=z["e_end"], e_conj=z["e_conj"],
        e_off=z["e_off"], e_len=z["e_len"], e_cov=z["e_cov"],
        alive=z["alive"], seq_pool=z["seq_pool"], v_conj=z["v_conj"],
    )
