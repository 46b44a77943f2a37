"""Configuration system: condition.txt / preset.txt parsing.

Byte-compatible with the reference config surface:

* ``parse_condition_file`` mirrors ``modules/utils.py:255-282``: whitespace
  key-value lines, ``#`` starts a comment anywhere on a line, lines starting
  with ``%`` or ``'`` are section markers and skipped.
* ``parse_training_parameters`` mirrors ``modules/utils.py:285-351``: the
  exact key set, types, and defaults.
* ``read_preset`` mirrors ``SimulGen-VAE.py:197-204``: a 5-line file (header,
  data_No, init_beta_divisor, encoder filters, latent-conditioner filters).

The reference's non-preset path crashes on a typo'd variable name
(``init_beta_diviser`` vs ``init_beta_divisor``, ``SimulGen-VAE.py:206/217``);
we obviously do not reproduce the crash.
"""

from __future__ import annotations

import dataclasses
from typing import List


def parse_condition_file(filepath: str) -> dict:
    """Parse a condition.txt file into a raw {key: str-value} dict.

    Mirrors reference ``modules/utils.py:255-282``: strips ``#`` comments,
    skips blank lines and lines starting with ``%`` or ``'``; for remaining
    lines takes the first token as key and second as value.
    """
    params = {}
    with open(filepath, encoding="utf-8") as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line or line.startswith("%") or line.startswith("'"):
                continue
            parts = line.split()
            if len(parts) >= 2:
                params[parts[0]] = parts[1]
    return params


def parse_training_parameters(params: dict) -> dict:
    """Convert raw condition.txt params into a typed config dict.

    Key set, types, and defaults mirror reference ``modules/utils.py:285-351``.
    """
    config = {}

    # Basic dimensions
    config["num_param"] = int(params["Dim1"])
    config["num_time"] = int(params["Dim2"])
    config["num_time_to"] = int(params["Dim2_red"])
    config["num_node"] = int(params["Dim3"])
    config["num_node_start"] = int(params["Dim3_start"])
    config["num_node_end"] = int(params["Dim3_end"])
    config["num_var"] = int(params["num_var"])

    # Training parameters
    config["n_epochs"] = int(params["Training_epochs"])
    config["batch_size"] = int(params["Batch_size"])
    config["LR"] = float(params["LearningR"])
    config["latent_dim"] = int(params["Latent_dim"])
    config["latent_dim_end"] = int(params["Latent_dim_end"])
    config["loss_type"] = int(params["Loss_type"])
    config["stretch"] = int(params["Stretch"])
    config["alpha"] = int(params["alpha"])

    # Augmentation parameters
    config["num_samples_f"] = int(params.get("num_aug_f", 0))
    config["num_samples_a"] = int(params.get("num_aug_a", 0))
    config["recon_iter"] = int(params.get("Recon_iter", 1))

    # Physical parameters
    config["num_physical_param"] = int(params["num_param"])
    config["param_dir"] = params["param_dir"]

    # Latent conditioner parameters
    config["latent_conditioner_epoch"] = int(params["n_epoch"])
    config["latent_conditioner_lr"] = float(params["latent_conditioner_lr"])
    config["latent_conditioner_batch_size"] = int(params["latent_conditioner_batch"])
    config["latent_conditioner_data_type"] = params["input_type"]
    config["param_data_type"] = params["param_data_type"]
    config["latent_conditioner_weight_decay"] = float(
        params.get("latent_conditioner_weight_decay", 1e-4)
    )
    config["latent_conditioner_dropout_rate"] = float(
        params.get("latent_conditioner_dropout_rate", 0.3)
    )
    config["use_spatial_attention"] = int(params.get("use_spatial_attention", 1))

    # End-to-end training configuration
    config["use_e2e_training"] = int(params.get("use_e2e_training", 0))
    config["use_improved_e2e"] = int(params.get("use_improved_e2e", 0))
    config["e2e_loss_function"] = params.get("e2e_loss_function", "MSE")
    config["e2e_vae_model_path"] = params.get(
        "e2e_vae_model_path", "model_save/SimulGen-VAE"
    )
    config["use_latent_regularization"] = int(
        params.get("use_latent_regularization", 0)
    )
    config["LC_alpha"] = float(params.get("LC_alpha", 1.0))
    config["latent_reg_weight"] = float(params.get("latent_reg_weight", 0.001))

    return config


def read_preset(filepath: str = "preset.txt"):
    """Read preset.txt (reference ``SimulGen-VAE.py:197-204``).

    Returns ``(data_No, init_beta_divisor, num_filter_enc, latent_conditioner_filter)``.
    """
    with open(filepath) as f:
        lines = [line.rstrip("\n") for line in f]
    data_no = int(lines[1])
    init_beta_divisor = int(lines[2])
    num_filter_enc = list(map(int, lines[3].split()))
    latent_conditioner_filter = list(map(int, lines[4].split()))
    return data_no, init_beta_divisor, num_filter_enc, latent_conditioner_filter


def input_user_variables():
    """Interactive stdin fallback when --preset != 1.

    Mirrors reference ``modules/input_variables.py:1-18`` (without the typo'd
    variable name that crashes the reference's non-preset path,
    SimulGen-VAE.py:206/217).
    """
    print()
    print("Input dataset number of pickle file, dataset%d.pickle")
    dataset_no = int(input())
    print("Input initial beta power")
    init_beta_divisor = int(input())
    print("Input SimulGen-VAE filters")
    num_filter_enc = list(map(int, input().split()))
    print("Input LatentConditioner filters")
    latent_conditioner_filter = list(map(int, input().split()))
    return dataset_no, init_beta_divisor, num_filter_enc, latent_conditioner_filter


LOSS_NAMES = {1: "MSE", 2: "MAE", 3: "smoothL1", 4: "Huber"}


@dataclasses.dataclass
class VAEConfig:
    """Typed model/training configuration for the TPU framework.

    Built from the reference's three config tiers (CLI / preset.txt /
    condition.txt) but usable directly from Python.
    """

    # Data dims (post-reduction)
    num_param: int = 16
    num_time: int = 50
    num_node: int = 2048

    # Architecture
    latent_dim_end: int = 32          # main latent (z)
    latent_dim: int = 8               # hierarchical latent
    num_filter_enc: List[int] = dataclasses.field(
        default_factory=lambda: [1024, 512, 256, 128]
    )
    small: bool = True

    # Training
    n_epochs: int = 100
    batch_size: int = 16
    lr: float = 1e-3
    alpha: float = 1e6
    loss_type: str = "MSE"            # MSE | MAE | smoothL1 | Huber
    recon_iter: int = 1

    # Numerics
    dtype: str = "float32"            # compute dtype: float32 | bfloat16
    use_spectral_norm: bool = True
    remat: bool = False               # gradient checkpointing on block level

    # Performance stack (first-class since round 4 — previously env-only,
    # which left the benched configuration unreachable from the CLI).
    # opt_state_dtype: AdamW moment storage.
    #   "auto"     -> bfloat16+SR on TPU when dtype is bfloat16, else float32
    #   "float32"  -> f32 moments (reference-equivalent numerics)
    #   "bfloat16" -> bf16 m+v with fused stochastic rounding (quality h2h
    #                 ratio 1.016, docs/artifacts/h2h_optm_srfused_medium.json)
    #   "bfloat16_rtn" -> deterministic bf16 downcasts (probe only: EMA
    #                 rounding bias measured 1.052, outside the ±5% band)
    opt_state_dtype: str = "auto"
    # sn_cadence: spectral-norm power-iteration refresh.
    #   "auto"  -> "epoch" on TPU when dtype is bfloat16, else "step"
    #   "step"  -> per-step refresh (torch parity: one iteration per forward,
    #              modules/common.py:15-37)
    #   "epoch" -> hoisted to the epoch boundary (quality h2h ratio 1.023,
    #              docs/artifacts/h2h_snpe_medium.json)
    sn_cadence: str = "auto"

    # Parallelism
    data_axis: str = "data"
    model_axis: str = "model"

    @property
    def num_filter_dec(self) -> List[int]:
        # Reference: decoder filters are reversed encoder filters
        # (SimulGen-VAE.py:219).
        return self.num_filter_enc[::-1]

    @property
    def num_hier(self) -> int:
        """Number of hierarchical latents produced by the encoder (= size2)."""
        return len(self.num_filter_enc) - 1

    @classmethod
    def from_condition(cls, config: dict, num_filter_enc: List[int],
                       small: bool = True, dtype: str = "float32") -> "VAEConfig":
        """Build from a parse_training_parameters() dict + preset filters."""
        num_node = config["num_node_end"] - config["num_node_start"]
        return cls(
            num_param=config["num_param"],
            num_time=config["num_time_to"],
            num_node=num_node,
            latent_dim_end=config["latent_dim_end"],
            latent_dim=config["latent_dim"],
            num_filter_enc=list(num_filter_enc),
            small=small,
            n_epochs=config["n_epochs"],
            batch_size=config["batch_size"],
            lr=config["LR"],
            alpha=float(config["alpha"]),
            loss_type=LOSS_NAMES[config["loss_type"]],
            recon_iter=config["recon_iter"],
            dtype=dtype,
        )


# The exact perf stack behind the headline bench number (BENCH_r03+:
# bf16 m+v with fused stochastic rounding, per-epoch SN).  bench.py and the
# trainer's "auto" resolution both derive from resolve_perf_stack so the
# benched configuration and the shipped CLI defaults cannot drift apart
# (tests/test_perf_stack.py pins this).
BENCHED_TPU_STACK = {
    "moment_dtype": "bfloat16",
    "nu_dtype": "bfloat16",
    "stochastic_round": True,
    "sn_per_epoch": True,
}


def resolve_perf_stack(cfg: "VAEConfig", backend: str = None) -> dict:
    """Resolve VAEConfig's perf knobs into concrete trainer settings.

    Returns ``{"moment_dtype", "nu_dtype", "stochastic_round",
    "sn_per_epoch"}``.  "auto" enables the quality-verified TPU stack only
    when compute dtype is bfloat16 on a TPU backend; float32 runs and
    non-TPU backends keep reference-equivalent numerics.
    """
    if backend is None:
        import jax

        backend = jax.default_backend()
    hot = backend == "tpu" and cfg.dtype == "bfloat16"

    osd = cfg.opt_state_dtype
    if osd == "auto":
        osd = "bfloat16" if hot else "float32"
    if osd == "float32":
        opt = {"moment_dtype": "", "nu_dtype": "", "stochastic_round": False}
    elif osd == "bfloat16":
        opt = {"moment_dtype": "bfloat16", "nu_dtype": "bfloat16",
               "stochastic_round": True}
    elif osd == "bfloat16_rtn":
        opt = {"moment_dtype": "bfloat16", "nu_dtype": "bfloat16",
               "stochastic_round": False}
    else:
        raise ValueError(f"opt_state_dtype: {osd!r}")

    cadence = cfg.sn_cadence
    if cadence == "auto":
        cadence = "epoch" if hot else "step"
    if cadence not in ("step", "epoch"):
        raise ValueError(f"sn_cadence: {cfg.sn_cadence!r}")
    return {**opt, "sn_per_epoch": cadence == "epoch"}


@dataclasses.dataclass
class LCConfig:
    """Latent-conditioner configuration (condition.txt %LatentConditioner block)."""

    filters: List[int] = dataclasses.field(
        default_factory=lambda: [32, 64, 128, 256, 512, 1024]
    )
    epochs: int = 500
    lr: float = 1e-3
    batch_size: int = 64
    weight_decay: float = 1e-5
    dropout_rate: float = 0.2
    use_spatial_attention: bool = True
    input_type: str = "image"         # image | csv | image_vit
    param_dir: str = "/images"
    param_data_type: str = ".png"

    # E2E
    use_e2e_training: bool = False
    e2e_loss_function: str = "Huber"
    e2e_vae_model_path: str = "model_save/SimulGen-VAE"
    use_latent_regularization: bool = True
    lc_alpha: float = 1000.0
    latent_reg_weight: float = 1e-3

    @classmethod
    def from_condition(cls, config: dict, filters: List[int]) -> "LCConfig":
        return cls(
            filters=list(filters),
            epochs=config["latent_conditioner_epoch"],
            lr=config["latent_conditioner_lr"],
            batch_size=config["latent_conditioner_batch_size"],
            weight_decay=config["latent_conditioner_weight_decay"],
            dropout_rate=config["latent_conditioner_dropout_rate"],
            use_spatial_attention=bool(config["use_spatial_attention"]),
            input_type=config["latent_conditioner_data_type"],
            param_dir=config["param_dir"],
            param_data_type=config["param_data_type"],
            use_e2e_training=bool(config["use_e2e_training"]),
            e2e_loss_function=config["e2e_loss_function"],
            e2e_vae_model_path=config["e2e_vae_model_path"],
            use_latent_regularization=bool(config["use_latent_regularization"]),
            lc_alpha=config["LC_alpha"],
            latent_reg_weight=config["latent_reg_weight"],
        )
