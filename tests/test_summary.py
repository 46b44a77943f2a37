"""Build-time model/train-state summary (torchinfo parity, reference
train.py:67 / latent_conditioner.py:241) — shape-only via eval_shape."""

import numpy as np

import jax

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.models import LatentConditioner
from simulgen_vae_tpu.train.lc_trainer import LCTrainer
from simulgen_vae_tpu.train.vae_trainer import VAETrainer
from simulgen_vae_tpu.utils.summary import model_summary, train_state_summary


def test_vae_summary_counts_match_real_params():
    cfg = VAEConfig(num_param=8, num_time=10, num_node=16, latent_dim_end=4,
                    latent_dim=2, num_filter_enc=[8, 8], n_epochs=2,
                    batch_size=4)
    trainer = VAETrainer(cfg, donate=False)
    s = train_state_summary(trainer, jax.random.PRNGKey(0),
                            name="SimulGen-VAE")
    assert s is not None and "SimulGen-VAE" in s

    # the table's trainable-param total must equal the real param count
    state = trainer.init_state(jax.random.PRNGKey(0))
    n_real = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(state.params))
    total_line = next(l for l in s.splitlines()
                      if l.startswith("trainable params"))
    assert f"{n_real:,}" in total_line
    # optimizer moments and the per-replica HBM line are accounted
    assert "optimizer state" in s
    assert "train state / replica" in s


def test_lc_summary_shape_only():
    lc = LatentConditioner(latent_conditioner_filter=[16, 16],
                           latent_dim_end=8, input_shape=16, latent_dim=3,
                           size2=2, dropout_rate=0.0)
    trainer = LCTrainer(lc, epochs=2, lr=1e-3, batch_size=4,
                        is_image_data=False)
    x = np.zeros((6, 16), np.float32)
    s = train_state_summary(trainer, jax.random.PRNGKey(0), sample_x=x,
                            name="LC")
    assert s is not None and "trainable params" in s


def test_model_summary_plain_tree_bytes():
    tree = {"enc": {"w": jax.ShapeDtypeStruct((4, 8), np.float32),
                    "b": jax.ShapeDtypeStruct((8,), np.float32)},
            "dec": {"w": jax.ShapeDtypeStruct((8, 4), np.float16)}}
    s = model_summary(tree, name="toy", depth=1)
    assert "enc" in s and "dec" in s
    assert "40" in s  # enc params 4*8+8
