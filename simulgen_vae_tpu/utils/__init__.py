import glob
import os

from simulgen_vae_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from simulgen_vae_tpu.utils.logging import MetricsLogger, epoch_log_line  # noqa: F401


def get_latest_file(directory: str, pattern: str = "*") -> str:
    """Most recently modified file matching pattern (reference utils.py:13-34)."""
    if not os.path.exists(directory):
        raise FileNotFoundError(f"Directory {directory} does not exist")
    files = glob.glob(os.path.join(directory, pattern))
    if not files:
        raise FileNotFoundError(
            f"No files matching '{pattern}' found in {directory}")
    return max(files, key=os.path.getmtime)
