"""Multi-process jax.distributed bring-up (2 procs x 4 CPU devices).

Exercises scripts/multiproc_dryrun.py end-to-end: coordinator rendezvous,
global mesh over both processes, one sharded train step, matching losses —
the testable stand-in for multi-host TPU (SURVEY §2.7; reference analog is
the broken torchrun launcher, launch_ddp.py:51-62).
"""

import re
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "multiproc_dryrun.py"


@pytest.mark.slow
def test_two_process_distributed_train_step():
    res = subprocess.run(
        [sys.executable, str(SCRIPT), "--nproc", "2",
         "--local_devices", "4", "--port", "12399"],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "multiproc dryrun PASS" in res.stdout
    # both processes computed the same global loss
    losses = set(re.findall(r"loss=([0-9.]+)", res.stdout))
    assert len(losses) == 1, res.stdout


@pytest.mark.slow
def test_two_process_fit_checkpoint_resume():
    """The PRODUCT multi-host path (VERDICT r4 missing #2): ``fit()`` with
    val split + nan guard + orbax checkpointing runs multi-controller, saves
    with every process participating, and resumes from the shared directory.
    """
    res = subprocess.run(
        [sys.executable, str(SCRIPT), "--nproc", "2",
         "--local_devices", "2", "--port", "12411", "--mode", "fit"],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "multiproc dryrun PASS (mode=fit" in res.stdout
    # both processes observed identical global loss histories
    pairs = set(re.findall(r"loss0=([0-9.]+) loss_last=([0-9.]+)",
                           res.stdout))
    assert len(pairs) == 1, res.stdout
