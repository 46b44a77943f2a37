#!/usr/bin/env python
"""Multi-host launcher — the TPU-native replacement for launch_ddp.py.

The reference shells out to ``torchrun`` with NCCL rendezvous
(``launch_ddp.py:51-93``) — and, as shipped, passes a flag the main script
doesn't define, so it cannot actually launch (SURVEY §3.4).  On TPU pods no
per-host process spawning is needed: each host runs the SAME command and
``jax.distributed.initialize()`` discovers the slice topology from the TPU
runtime.  This script simply initializes distributed mode and execs the CLI.

Usage (run on every host of the slice, e.g. via gcloud ssh --worker=all):

    python scripts/launch_multihost.py --preset=1 --lc_only=0 [cli args...]

For non-TPU-pod setups pass the coordinator explicitly:

    python scripts/launch_multihost.py --coordinator=host0:1234 \
        --num_processes=4 --process_id=$RANK -- [cli args...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args, rest = parser.parse_known_args()

    import jax

    if args.coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        # TPU pod: topology auto-discovered from the runtime.
        jax.distributed.initialize()

    print(f"[launch_multihost] process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")

    from simulgen_vae_tpu.cli import main as cli_main

    return cli_main(rest)


if __name__ == "__main__":
    sys.exit(main())
