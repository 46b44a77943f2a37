"""Metrics logging: TensorBoard-compatible scalars + reference-style lines.

Fixes two reference gaps (SURVEY §5): the VAE TensorBoard writer that is
created but never written (``train.py:51``), and the unimplemented
"samples/second" tracking the README claims — every epoch here logs
loss/val/recon/KL/beta/grad-norm/lr AND samples-per-second-per-chip.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

LOG_FORMAT = "%(asctime)s - %(levelname)s - %(message)s"


def epoch_log_line(epoch: int, epochs: int, m: Dict[str, float]) -> str:
    """Reference VAE log line format (train.py:245-249)."""
    eta_h = (epochs - epoch) * m.get("epoch_time", 0.0) / 3600
    return ("[Epoch {}/{}] Loss: {:.4E}   val_loss: {:.2E}   Recon:{:.4E}   "
            "Recon_val:{:.4E}   KL:{:.4E}   Beta:{:.4E}   AvgGrad:{:.4E}   "
            "Time: {:.2f}s   ETA: {:.2f}h    LR: {:.2E}").format(
        epoch + 1, epochs, m.get("loss", 0.0), m.get("val_loss", 0.0),
        m.get("recon", 0.0), m.get("val_recon", 0.0),
        m.get("kl", 0.0), m.get("beta", 0.0), m.get("grad_norm", 0.0),
        m.get("epoch_time", 0.0), eta_h, m.get("lr", 0.0),
    )


class MetricsLogger:
    """TensorBoard scalar writer (tensorboardX) + console logging.

    Degrades gracefully to console-only if tensorboardX is unavailable.
    """

    def __init__(self, log_dir: str = "./runs", name: str = "VAE",
                 console: bool = True, log_every: int = 1,
                 samples_per_epoch: Optional[int] = None,
                 n_chips: int = 1):
        self.name = name
        self.console = console
        self.log_every = log_every
        self.samples_per_epoch = samples_per_epoch
        self.n_chips = max(n_chips, 1)
        self.writer = None
        # Multi-host: only process 0 writes scalars/console (the reference
        # rank-gates prints, SimulGen-VAE.py:228, but races on event files).
        try:
            import jax

            primary = jax.process_index() == 0
        except Exception:
            primary = True
        if not primary:
            self.console = False
        else:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(log_dir=log_dir, comment=name)
            except Exception:
                pass
        logging.basicConfig(level=logging.INFO, format=LOG_FORMAT)
        self.logger = logging.getLogger(name)

    def log(self, epoch: int, metrics: Dict[str, float],
            total_epochs: Optional[int] = None) -> None:
        metrics = dict(metrics)
        if self.samples_per_epoch and metrics.get("epoch_time"):
            metrics["samples_per_sec_per_chip"] = (
                self.samples_per_epoch / metrics["epoch_time"] / self.n_chips
            )
        if self.writer is not None and epoch % self.log_every == 0:
            for k, v in metrics.items():
                try:
                    self.writer.add_scalar(f"{self.name}/{k}", float(v), epoch)
                except (TypeError, ValueError):
                    pass
        if self.console:
            self.logger.info(
                epoch_log_line(epoch, total_epochs or epoch + 1, metrics)
            )

    def log_image(self, tag: str, image, step: int = 0) -> None:
        """Write an HWC image (uint8 or [0,1] float array) to TensorBoard.

        Used for reconstruction-comparison plots (the reference saves these
        only as PNGs on disk, latent_conditioner.py:383-384)."""
        if self.writer is None:
            return
        try:
            self.writer.add_image(f"{self.name}/{tag}", image, step,
                                  dataformats="HWC")
        except Exception:
            pass

    def log_image_file(self, tag: str, path: str, step: int = 0) -> None:
        """Load a saved comparison PNG and mirror it into TensorBoard."""
        if self.writer is None:
            return
        try:
            import numpy as np
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"))
            self.log_image(tag, img, step)
        except Exception:
            pass

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
