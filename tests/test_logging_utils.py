"""Metrics logger, log-line format, profiling helpers."""

import os

import numpy as np
import pytest

from simulgen_vae_tpu.utils import get_latest_file
from simulgen_vae_tpu.utils.logging import MetricsLogger, epoch_log_line


def test_epoch_log_line_format():
    line = epoch_log_line(4, 100, {
        "loss": 1.234e-2, "val_loss": 2e-2, "recon": 1e-2, "val_recon": 1.5e-2,
        "kl": 3.0, "beta": 1e-4, "grad_norm": 0.5, "epoch_time": 2.0,
        "lr": 1e-3,
    })
    assert line.startswith("[Epoch 5/100]")
    assert "Beta:1.0000E-04" in line
    assert "LR: 1.00E-03" in line
    assert "ETA:" in line


def test_metrics_logger_writes_scalars(tmp_path):
    logger = MetricsLogger(log_dir=str(tmp_path / "runs"), name="T",
                           console=False, samples_per_epoch=100, n_chips=2)
    for e in range(3):
        logger.log(e, {"loss": 1.0 / (e + 1), "epoch_time": 0.5},
                   total_epochs=3)
    logger.close()
    # tensorboardX event files written
    files = []
    for root, _, names in os.walk(tmp_path / "runs"):
        files.extend(names)
    assert any("tfevents" in f for f in files)


def test_get_latest_file(tmp_path):
    import time

    (tmp_path / "a.txt").write_text("1")
    time.sleep(0.01)
    (tmp_path / "b.txt").write_text("2")
    assert get_latest_file(str(tmp_path), "*.txt").endswith("b.txt")

    import pytest

    with pytest.raises(FileNotFoundError):
        get_latest_file(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        get_latest_file(str(tmp_path), "*.bin")


@pytest.mark.slow
def test_device_memory_helpers():
    from simulgen_vae_tpu.utils.profiling import (
        device_memory_cleanup,
        device_memory_mb,
    )

    stats = device_memory_mb()
    assert "bytes_in_use_mb" in stats
    device_memory_cleanup()  # must not raise


def test_log_image_and_file(tmp_path):
    """TB image logging: event files written for array and PNG inputs."""
    import numpy as np
    from simulgen_vae_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(log_dir=str(tmp_path / "runs"), name="T",
                           console=False)
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype("uint8")
    logger.log_image("array", img, step=0)

    png = tmp_path / "cmp.png"
    try:
        from PIL import Image

        Image.fromarray(img).save(png)
        logger.log_image_file("file", str(png), step=1)
    except ImportError:
        pass
    logger.close()
    if logger.writer is not None:
        files = list((tmp_path / "runs").rglob("*"))
        assert any(f.is_file() for f in files)
