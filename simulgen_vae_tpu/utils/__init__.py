from simulgen_vae_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from simulgen_vae_tpu.utils.logging import MetricsLogger, epoch_log_line  # noqa: F401
