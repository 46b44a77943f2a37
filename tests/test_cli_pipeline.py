"""Full-pipeline integration test: synthetic pickle -> CLI -> artifacts.

Mirrors SURVEY §4's "single-host end-to-end on synthetic pickle" requirement:
runs the whole reference pipeline (config parse, load, reduce, scale, VAE
train, latent extraction, LC train, comparison eval) on a tiny geometry and
checks the artifact layout.
"""

import json
import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from simulgen_vae_tpu.data.dataset import synthetic_dataset

CONDITION = """\
Common params
Dim1		12 # number of parameters
Dim2		10 # number of timesteps
Dim3		32 # num nodes
num_var 1
'
%LSH-VAE parameters
Training_epochs	6
Batch_size	4
LearningR	0.001
Latent_dim	4
Latent_dim_end	8
Loss_type	1
Stretch	0
alpha		1000
Recon_iter	1
% reduction
Dim2_red		10
Dim3_start      0
Dim3_end		32
'
%LatentConditioner
num_param	4
param_dir	params.csv
n_epoch	6
latent_conditioner_lr	0.001
latent_conditioner_batch	4
latent_conditioner_weight_decay	1e-5
latent_conditioner_dropout_rate	0.1
use_spatial_attention	1
input_type	csv
param_data_type .csv
'
%End-to-End Training Configuration
use_e2e_training	0
e2e_loss_function	Huber
use_latent_regularization	1
LC_alpha    10
latent_reg_weight	0.001
"""

PRESET = """\
data_No, init_beta_divisior, num_filter_enc, latent_conditioner_filter
1
0
16 8
16 16
"""


@pytest.fixture
def workdir(tmp_path):
    data = synthetic_dataset(12, 10, 32, seed=0)
    with open(tmp_path / "dataset1.pickle", "wb") as f:
        pickle.dump(data, f)
    (tmp_path / "input_data").mkdir()
    (tmp_path / "input_data" / "condition.txt").write_text(CONDITION)
    (tmp_path / "preset.txt").write_text(PRESET)
    rng = np.random.default_rng(0)
    params = rng.standard_normal((12, 4))
    np.savetxt(tmp_path / "params.csv", params, delimiter=",")
    return tmp_path


@pytest.mark.slow
def test_cli_full_pipeline_csv(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    from simulgen_vae_tpu.cli import main

    rc = main(["--preset=1", "--plot=2", "--lc_only=0", "--size=small"])
    assert rc == 0

    # reference artifact layout
    assert os.path.exists("model_save/scaler.pkl")
    assert os.path.exists("model_save/latent_vectors.npy")
    assert os.path.exists("model_save/xs.npy")
    assert os.path.exists("model_save/latent_vectors_scaler.pkl")
    assert os.path.exists("model_save/xs_scaler.pkl")
    assert os.path.exists("SimulGen-VAE_L2_loss.txt")
    assert os.path.exists("checkpoints/reconstruction_dual_view_0.png")
    # per-sample comparison PNGs (reference utils.py:519-545 artifact parity)
    assert os.path.exists(
        "checkpoints/training_reconstruction/reconstruction_sample_001.png")
    assert os.path.exists(
        "checkpoints/validation/reconstruction_sample_001.png")

    lv = np.load("model_save/latent_vectors.npy")
    xs = np.load("model_save/xs.npy")
    assert lv.shape == (12, 8)
    assert xs.shape == (12, 1, 4)  # len([16,8])-1 = 1 hier level

    # lc_only=1 restarts from saved latents + VAE checkpoint
    rc = main(["--preset=1", "--plot=2", "--lc_only=1", "--size=small"])
    assert rc == 0


@pytest.mark.slow
def test_generate_cli_from_artifacts(workdir, monkeypatch):
    """Train the pipeline, then run the standalone generation CLI on fresh
    CSV inputs (the first-class inference path the reference lacks)."""
    monkeypatch.chdir(workdir)
    from simulgen_vae_tpu.cli import main

    rc = main(["--preset=1", "--plot=2", "--lc_only=0", "--size=small"])
    assert rc == 0

    rng = np.random.default_rng(7)
    np.savetxt("new_params.csv", rng.standard_normal((5, 4)), delimiter=",")

    from simulgen_vae_tpu.generate import main as gen_main

    rc = gen_main(["--inputs", "new_params.csv", "--out", "output/gen.npy"])
    assert rc == 0
    fields = np.load("output/gen.npy")
    assert fields.shape == (5, 10, 32)
    assert np.isfinite(fields).all()
    # descaled to physical units: outside the (-0.7, 0.7) model range is OK,
    # but values must be in the data's ballpark
    assert abs(fields).max() < 100.0
