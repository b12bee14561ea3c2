"""spades_tpu — a TPU-native de Bruijn graph assembly framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of the SPAdes
assembler toolkit (reference: ablab/spades, surveyed in SURVEY.md).  The compute
path (k-mer counting, extension-index construction, graph condensation,
simplification inner loops) is expressed as vectorized XLA programs and Pallas
kernels over fixed-shape arrays; multi-chip scaling uses `jax.sharding.Mesh` +
`shard_map` with ICI collectives.
"""

__version__ = "0.1.0"
