"""spades_tpu — a TPU-native de Bruijn graph assembly framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of the SPAdes
assembler toolkit (reference: ablab/spades, surveyed in SURVEY.md).  The compute
path (k-mer counting, extension-index construction, graph condensation,
simplification inner loops) is expressed as vectorized XLA programs and Pallas
kernels over fixed-shape arrays; multi-chip scaling uses `jax.sharding.Mesh` +
`shard_map` with ICI collectives.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Point JAX at an on-disk compilation cache shared across processes.

    In this environment XLA programs compile through a remote compile service
    with seconds-to-minutes latency per program; the assembler compiles a
    handful of large counting/sort programs per k.  A persistent cache makes
    every program a one-time cost per machine instead of per process — the
    TPU analog of the reference compiling its binaries once at build time.
    Opt out / relocate with JAX_COMPILATION_CACHE_DIR (JAX's own knob) or
    SPADES_TPU_JAX_CACHE=0.
    """
    import os

    flag = os.environ.get("SPADES_TPU_JAX_CACHE", "")
    if flag == "0" or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if flag:
        cache_dir = flag
    else:
        # Default to a non-repo location; honour a pre-existing repo-level
        # cache so previously compiled executables stay warm.
        repo_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
        if os.path.isdir(repo_cache):
            cache_dir = repo_cache
        else:
            cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "spades_tpu", "jax")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


def _apply_platform_override() -> None:
    """SPADES_TPU_PLATFORM=cpu|tpu|axon pins the JAX platform even when the
    environment force-registers an accelerator backend (some launchers pin
    JAX_PLATFORMS before user code runs, so the standard env var cannot
    win); used to run CLIs on CPU while a device job owns the chip."""
    import os

    plat = os.environ.get("SPADES_TPU_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # noqa: BLE001 — never fatal
        pass


_enable_persistent_compile_cache()
_apply_platform_override()
