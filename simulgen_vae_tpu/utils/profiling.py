"""Profiling hooks: jax.profiler traces + device memory telemetry.

TPU-native replacement for the reference's GPU-memory checkpoints
(``utils.py:241-252``) and per-step Python-side gradient-norm/ETA telemetry.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_mb(device: Optional[jax.Device] = None) -> dict:
    """Per-device memory stats in MB (TPU analog of print_gpu_mem_checkpoint,
    reference utils.py:241-252)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    scale = 1024 ** 2
    return {
        "bytes_in_use_mb": stats.get("bytes_in_use", 0) / scale,
        "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / scale,
        "bytes_limit_mb": stats.get("bytes_limit", 0) / scale,
    }


def device_memory_cleanup() -> None:
    """Best-effort device-memory release between pipeline stages.

    TPU analog of the reference's gc-walk ``vram_cleanup`` (utils.py:354-426),
    which moves every CUDA tensor to CPU.  Under jax, live buffers are owned
    by Python references; dropping compilation caches releases executables
    and their scratch allocations.
    """
    import gc

    gc.collect()
    jax.clear_caches()


def print_mem_checkpoint(msg: str, debug_mode: int = 0) -> None:
    if debug_mode != 1:
        return
    m = device_memory_mb()
    print(f"[TPU MEM] {msg}: InUse={m['bytes_in_use_mb']:.2f}MB, "
          f"Peak={m['peak_bytes_in_use_mb']:.2f}MB")
