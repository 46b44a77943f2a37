"""CLI integration: image conditioner + end-to-end training path.

Exercises the cv2 image reader, CNN conditioner with SE/spatial attention +
spectral norm, E2E training through the frozen decoder, artifact-layout
parity including the flax model exports."""

import os
import pickle

import numpy as np
import pytest

from simulgen_vae_tpu.data.dataset import synthetic_dataset

CONDITION = """\
Common params
Dim1		8 # number of parameters
Dim2		10 # number of timesteps
Dim3		32 # num nodes
num_var 1
'
%LSH-VAE parameters
Training_epochs	4
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
param_dir	/images
n_epoch	4
latent_conditioner_lr	0.001
latent_conditioner_batch	4
latent_conditioner_weight_decay	1e-5
latent_conditioner_dropout_rate	0.1
use_spatial_attention	1
input_type	image
param_data_type .png
'
%End-to-End Training Configuration
use_e2e_training	1
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
8 8 16
"""


@pytest.fixture
def workdir(tmp_path):
    import cv2

    data = synthetic_dataset(8, 10, 32, seed=0)
    with open(tmp_path / "dataset1.pickle", "wb") as f:
        pickle.dump(data, f)
    (tmp_path / "input_data").mkdir()
    (tmp_path / "input_data" / "condition.txt").write_text(CONDITION)
    (tmp_path / "preset.txt").write_text(PRESET)

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        img = (rng.random((32, 32)) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"design{i}.png"), img)
    return tmp_path


def _patch_image_size(monkeypatch):
    # 256x256 ingest is too slow for a CPU smoke test; shrink it.
    import simulgen_vae_tpu.cli as cli_mod
    from simulgen_vae_tpu.data import images

    orig = images.read_latent_conditioner_dataset_img

    def small(param_dir, param_data_type, im_size=32, base_dir=None):
        return orig(param_dir, param_data_type, im_size=32, base_dir=base_dir)

    monkeypatch.setattr(
        "simulgen_vae_tpu.data.images.read_latent_conditioner_dataset_img",
        small,
    )


@pytest.mark.slow
def test_cli_image_e2e_pipeline(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    _patch_image_size(monkeypatch)
    from simulgen_vae_tpu.cli import main

    rc = main(["--preset=1", "--plot=2", "--lc_only=0", "--size=small"])
    assert rc == 0

    assert os.path.exists("model_save/SimulGen-VAE")
    assert os.path.exists("model_save/LatentConditioner")
    assert os.path.exists("model_save/latent_vectors.npy")
    assert os.path.exists("checkpoints/reconstruction_dual_view_0.png")

    # saved VAE model restores and decodes
    import jax
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import (
        VAEConfig,
        parse_condition_file,
        parse_training_parameters,
        read_preset,
    )
    from simulgen_vae_tpu.models import VAE
    from simulgen_vae_tpu.utils.checkpoint import load_flax_model

    raw = parse_training_parameters(
        parse_condition_file("input_data/condition.txt"))
    _, _, enc, _ = read_preset("preset.txt")
    cfg = VAEConfig.from_condition(raw, enc)
    model = VAE(latent_dim=cfg.latent_dim_end, hierarchical_dim=cfg.latent_dim,
                num_filter_enc=cfg.num_filter_enc,
                num_filter_dec=cfg.num_filter_dec, num_node=cfg.num_node,
                num_time=cfg.num_time, small=True)
    key = jax.random.PRNGKey(0)
    template = model.init({"params": key, "sample": key},
                          jnp.zeros((1, cfg.num_time, cfg.num_node)))
    restored = load_flax_model("model_save/SimulGen-VAE", dict(template))
    z = jnp.zeros((2, cfg.latent_dim_end))
    xs = [jnp.zeros((2, cfg.latent_dim)) for _ in range(cfg.num_hier)]
    out = model.apply(restored, z, xs, method=VAE.generate,
                      rngs={"sample": key})
    assert out.shape == (2, cfg.num_time, cfg.num_node)
