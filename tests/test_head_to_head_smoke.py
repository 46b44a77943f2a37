"""Continuous quality-parity smoke: rebuild vs the actual torch reference.

Runs ``scripts/head_to_head.py`` at smoke scale (30 epochs, 8x20x512) in a
subprocess (it pins jax to CPU, so it must not share this process's backend)
and asserts the final recon-MSE ratio stays in a loose parity band.  This
turns the one-time ``docs/artifacts/h2h_smoke.json`` artifact into a test so
quality parity can't silently rot (VERDICT r2 item 8).

Reference trained via import-and-execute of ``/root/reference/modules/train.py``
(no code copied); see scripts/head_to_head.py.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


@pytest.mark.slow
def test_head_to_head_smoke(tmp_path):
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    out = tmp_path / "h2h_smoke.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "head_to_head.py"),
         "--epochs", "30", "--params", "8", "--time", "20", "--nodes", "512",
         "--filters", "32,16", "--json", str(out),
         "--workdir", str(tmp_path / "ref_workdir")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    result = json.loads(out.read_text())
    ratio = result["mse_ratio_rebuild_over_ref"]
    # Loose band: at 30 epochs neither run is converged; the checked-in
    # artifact measured 0.85 (rebuild better).  Catastrophic quality rot
    # (broken loss, gradient, init) shows up as ratio >> 1.
    assert 0.2 < ratio < 2.5, (
        f"recon-MSE ratio {ratio:.3f} outside parity band; "
        f"ref={result['reference']['recon_mse']:.3e} "
        f"rebuild={result['rebuild']['recon_mse']:.3e}")
