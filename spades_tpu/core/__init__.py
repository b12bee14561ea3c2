from . import dna, kmers, reads  # noqa: F401
