#!/usr/bin/env python3
"""Drop-in launcher matching the reference entry point.

The reference is invoked as ``python SimulGen-VAE.py --preset=1 --plot=2
--lc_only=0 --size=small`` (SimulGen-VAE.py:22); this forwards the identical
CLI surface to the TPU framework (``python -m simulgen_vae_tpu`` is the
canonical form).  ``--use_ddp`` is accepted and mapped to the mesh flags.
"""

import sys


def main():
    argv = []
    for arg in sys.argv[1:]:
        if arg == "--use_ddp":
            # NCCL DDP -> GSPMD data parallelism over all local devices.
            continue  # default mesh already uses every device on 'data'
        argv.append(arg)

    from simulgen_vae_tpu.cli import main as cli_main

    return cli_main(argv)


if __name__ == "__main__":
    sys.exit(main())
