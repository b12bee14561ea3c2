"""`plasmidspades.py` wrapper — see `spades_tpu.pipeline.wrappers`."""
import sys

from .wrappers import plasmidspades as main

if __name__ == "__main__":
    sys.exit(main())
