"""Command-line entry point — the reference ``SimulGen-VAE.py`` pipeline.

Stages (SimulGen-VAE.py:30-497): config parsing -> dataset load/reduce/scale
-> VAE training -> latent extraction -> latent-conditioner training (base /
enhanced / end-to-end) -> reconstruction comparison.

Flag surface keeps the reference CLI (``--preset --plot --lc_only --size
--load_all``) and replaces ``--use_ddp`` with mesh flags (``--mesh_data`` /
``--mesh_model``) since parallelism is GSPMD over a device mesh, not NCCL
(SURVEY §2.7).  ``--load_all=0`` maps to the streaming path (host-resident
dataset, batches streamed to device — reference modules/utils.py:44-66);
``--load_all=1`` (default) keeps the dataset device-resident.

Artifact layout parity: ``model_save/`` (scaler.pkl, latent_vectors.npy, xs.npy,
latent/xs scaler pickles), ``checkpoints/`` (orbax VAE + LC state, comparison
PNGs), ``SimulGen-VAE_L2_loss.txt``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np


def initialize_folder(folder_name: str) -> None:
    """Wipe folder contents (reference utils.py:673-683)."""
    os.makedirs(folder_name, exist_ok=True)
    for item in os.listdir(folder_name):
        path = os.path.join(folder_name, item)
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="SimulGen-VAE TPU: physics-aware generative surrogate",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""Examples:
  Full run : python -m simulgen_vae_tpu --preset=1 --plot=2 --lc_only=0 --size=small
  LC only  : python -m simulgen_vae_tpu --preset=1 --lc_only=1 --size=small
  Multichip: python -m simulgen_vae_tpu --preset=1 --mesh_data=4 --mesh_model=2""",
    )
    parser.add_argument("--preset", dest="preset", default="1")
    parser.add_argument("--plot", dest="plot", default="2")
    parser.add_argument("--lc_only", dest="train_latent_conditioner",
                        default="0")
    parser.add_argument("--size", dest="size", default="small",
                        choices=["small", "large"])
    parser.add_argument("--load_all", dest="load_all", default="1",
                        help="reference-CLI parity: --load_all=0 keeps the "
                             "dataset in host memory and streams batches to "
                             "the device (same as --stream; reference "
                             "modules/utils.py:44-66)")
    parser.add_argument("--mesh_data", type=int, default=None,
                        help="data-parallel mesh axis size (default: all devices)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="model-parallel mesh axis size (node-dim sharding)")
    parser.add_argument("--condition", default="input_data/condition.txt")
    parser.add_argument("--preset_file", default="preset.txt")
    parser.add_argument("--opt_state_dtype", default="auto",
                        choices=["auto", "float32", "bfloat16",
                                 "bfloat16_rtn"],
                        help="AdamW moment storage; auto = bf16 with "
                             "stochastic rounding on TPU when --dtype="
                             "bfloat16, else float32")
    parser.add_argument("--sn_cadence", default="auto",
                        choices=["auto", "step", "epoch"],
                        help="spectral-norm power-iteration refresh; auto = "
                             "per-epoch on TPU when --dtype=bfloat16, else "
                             "per-step (torch parity)")
    parser.add_argument("--lc_loss_mode", default="standard",
                        choices=["standard", "enhanced"],
                        help="latent-conditioner loss (non-E2E): 'standard' "
                             "= reference base loss (image h2h ratio 0.699 "
                             "vs ref); 'enhanced' adds the perceptual term "
                             "the reference advertises but never runs "
                             "(ratio 0.739)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--epochs", type=int, default=None,
                        help="override Training_epochs")
    parser.add_argument("--lc_epochs", type=int, default=None,
                        help="override n_epoch")
    parser.add_argument("--no_wipe", action="store_true",
                        help="skip the reference's destructive folder init")
    parser.add_argument("--resume", action="store_true",
                        help="resume VAE training from the latest checkpoint")
    parser.add_argument("--auto_resume", action="store_true",
                        help="like --resume, but also safe on a fresh run "
                             "(resumes only if a checkpoint exists) — pair "
                             "with a requeueing scheduler: on SIGTERM the "
                             "trainers checkpoint and exit 75 (EX_TEMPFAIL)")
    parser.add_argument("--no_preempt_guard", action="store_true",
                        help="do not install the SIGTERM "
                             "checkpoint-and-requeue handler")
    parser.add_argument("--stream", action="store_true",
                        help="stream batches from host memory (datasets "
                             "larger than device HBM)")
    parser.add_argument("--no_nan_guard", action="store_true",
                        help="disable divergence detection (non-finite "
                             "train loss -> rollback to the last checkpoint "
                             "and retry with fresh randomness)")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def resolve_load_all(args) -> None:
    """Map ``--load_all=0`` to the streaming path (reference semantics:
    modules/utils.py:44-66 keeps the dataset CPU-pinned and moves batches
    per-step when load_all is false)."""
    if str(args.load_all) in ("0", "false", "False"):
        args.stream = True


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    resolve_load_all(args)
    if args.auto_resume:
        args.resume = True

    # Preemption safety (SURVEY §5 failure detection/recovery): SIGTERM →
    # trainers checkpoint at the next epoch boundary and return early; the
    # run exits EX_TEMPFAIL(75) so a scheduler requeues it, and
    # --resume/--auto_resume continues from the saved state.
    from simulgen_vae_tpu.utils import preemption

    if not args.no_preempt_guard:
        preemption.install()

    import jax
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import (
        LCConfig,
        VAEConfig,
        parse_condition_file,
        parse_training_parameters,
        read_preset,
    )
    from simulgen_vae_tpu.data.dataset import input_dataset, reduce_dataset
    from simulgen_vae_tpu.data.scaler import data_scaler, latent_conditioner_scaler
    from simulgen_vae_tpu.evaluation import (
        ReconstructionEvaluator,
        evaluate_vae_reconstruction,
    )
    from simulgen_vae_tpu.evaluation.plotter import (
        dual_view_plotter,
        temporal_plotter,
    )
    from simulgen_vae_tpu.parallel import make_mesh
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer
    from simulgen_vae_tpu.utils.checkpoint import (
        CheckpointManager,
        save_l2_loss,
        save_latents,
    )
    from simulgen_vae_tpu.utils.logging import MetricsLogger

    # Multi-host: rank-0 owns every filesystem artifact outside orbax
    # (which coordinates its own multi-host saves).  The reference's DDP
    # ranks race on these paths (SURVEY §5 "race detection").
    from simulgen_vae_tpu.parallel import is_primary, sync_processes

    primary = is_primary()
    if primary:
        print("Starting SimulGen-VAE TPU...")
        print(f"Devices: {jax.devices()}")

    params = parse_condition_file(args.condition)
    config = parse_training_parameters(params)
    if args.preset == "1":
        data_no, init_beta_divisor, num_filter_enc, lc_filter = read_preset(
            args.preset_file
        )
    else:
        from simulgen_vae_tpu.config import input_user_variables

        data_no, init_beta_divisor, num_filter_enc, lc_filter = \
            input_user_variables()

    small = args.size == "small"
    lc_only = int(args.train_latent_conditioner)
    key = jax.random.PRNGKey(args.seed)

    cfg = VAEConfig.from_condition(config, num_filter_enc, small=small,
                                   dtype=args.dtype)
    cfg.opt_state_dtype = args.opt_state_dtype
    cfg.sn_cadence = args.sn_cadence
    if args.epochs is not None:
        cfg.n_epochs = args.epochs
    lc_cfg = LCConfig.from_condition(config, lc_filter)
    if args.lc_epochs is not None:
        lc_cfg.epochs = args.lc_epochs

    if lc_only == 0 and not args.no_wipe and not args.resume and primary:
        for folder in ("model_save", "checkpoints", "LatentConditionerRuns",
                       "output"):
            initialize_folder(folder)
    sync_processes("folder-init")  # no process may write before the wipe
    os.makedirs("model_save", exist_ok=True)
    os.makedirs("checkpoints", exist_ok=True)

    # -- data ---------------------------------------------------------------
    data_save = input_dataset(config["num_param"], config["num_time"],
                              config["num_node"], data_no)
    num_node_red = config["num_node_end"] - config["num_node_start"]
    num_time, fom_data, num_node = reduce_dataset(
        data_save, config["num_time_to"], num_node_red, config["num_param"],
        config["num_time"], config["num_node_start"], config["num_node_end"],
    )
    del data_save

    if args.plot != "2" and primary:
        dual_view_plotter(fom_data, param_idx=min(7, fom_data.shape[0] - 1),
                          print_graph=args.plot,
                          save_path="output/dual_view.png")
        start = min(7, fom_data.shape[0] - 1)
        temporal_plotter(fom_data, 0, start, 0, args.plot,
                         min(7, fom_data.shape[0] - start),
                         save_path="output/temporal.png")

    new_x_train, _, scaler = data_scaler(
        fom_data, num_time, num_node,
        save_path="model_save/scaler.pkl" if primary else None)
    del fom_data
    new_x_train = np.float32(new_x_train)
    if primary:
        print(f"Dataset value range: [{new_x_train.min():.4f}, "
              f"{new_x_train.max():.4f}]")

    # -- mesh ---------------------------------------------------------------
    mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
    n_chips = int(np.prod(list(mesh.shape.values())))
    print(f"Mesh: {dict(mesh.shape)}")

    trainer = VAETrainer(cfg)
    vae_model = trainer.model
    # Build-time summary (reference prints torchinfo at train.py:67); shapes
    # via eval_shape — zero device allocation.
    from simulgen_vae_tpu.utils.summary import train_state_summary
    s = train_state_summary(trainer, key, name="SimulGen-VAE")
    if s:
        print(s)

    if lc_only == 0:
        logger = MetricsLogger(
            log_dir="./runs", name="VAE",
            samples_per_epoch=int(len(new_x_train) * 0.8), n_chips=n_chips,
        )
        ckpt = CheckpointManager("checkpoints/vae",
                                 save_interval_epochs=max(cfg.n_epochs // 10, 1))

        init_state = None
        remaining = cfg.n_epochs
        if args.resume and ckpt.latest_step() is not None:
            init_state = ckpt.restore(trainer.init_state(key))
            remaining = max(cfg.n_epochs - int(init_state.epoch), 0)
            print(f"Resuming from epoch {int(init_state.epoch)} "
                  f"({remaining} epochs remaining)")

        state, history = trainer.fit(
            new_x_train, key, state=init_state, mesh=mesh,
            stream=args.stream, epochs=remaining, ckpt_manager=ckpt,
            log_fn=lambda e, m: logger.log(e, m, cfg.n_epochs),
            nan_guard=not args.no_nan_guard,
        )
        logger.close()

        if preemption.requested():
            print(f"Preempted at epoch {int(state.epoch)}: train state "
                  f"checkpointed; rerun with --resume to continue "
                  f"(exit {preemption.EX_TEMPFAIL})")
            return preemption.EX_TEMPFAIL

        eval_params = trainer.eval_params(state)
        from simulgen_vae_tpu.utils.checkpoint import save_flax_model

        if primary:
            save_flax_model("model_save/SimulGen-VAE",
                            {"params": eval_params})

        # Evaluation stage is forward-only: the fused Pallas kernels are a
        # free win here (docs/PERF.md) — enable on TPU, restore afterwards.
        from simulgen_vae_tpu.ops.groupnorm_gelu import set_pallas

        if jax.default_backend() == "tpu":
            set_pallas(True)

        # Reference evaluates train / val / whole (SimulGen-VAE.py:315-338).
        n_train = int(len(new_x_train) * 0.8)
        evaluate_vae_reconstruction(
            vae_model, eval_params, new_x_train[:n_train], key,
            recon_iter=cfg.recon_iter, batch_size=cfg.batch_size,
            dataset_name="Training Reconstruction", save_images=primary,
        )
        evaluate_vae_reconstruction(
            vae_model, eval_params, new_x_train[n_train:], key,
            recon_iter=cfg.recon_iter, batch_size=cfg.batch_size,
            dataset_name="Validation", save_images=primary,
        )
        latent_vectors, hierarchical, recon_loss, _, _ = \
            evaluate_vae_reconstruction(
                vae_model, eval_params, new_x_train, key,
                recon_iter=cfg.recon_iter, batch_size=cfg.batch_size,
                dataset_name="Whole Dataset",
            )
        set_pallas(None)
        if primary:
            save_latents("model_save", latent_vectors, hierarchical)
            save_l2_loss("./SimulGen-VAE_L2_loss.txt", recon_loss)
        sync_processes("vae-artifacts")  # LC stage reads these files
    else:
        print("Training LatentConditioner only...")
        latent_vectors = np.load("model_save/latent_vectors.npy")
        hierarchical = np.load("model_save/xs.npy")
        ckpt = CheckpointManager("checkpoints/vae")
        state = ckpt.restore(trainer.init_state(key))
        eval_params = trainer.eval_params(state)

    # -- latent-conditioner stage ------------------------------------------
    rc = run_latent_conditioner_stage(
        args, cfg, lc_cfg, vae_model, eval_params, latent_vectors,
        hierarchical, new_x_train, key,
    )
    return rc


def _maybe_resume_lc(args, trainer, lc_ckpt, sample_x, key, total_epochs):
    """Restore the latest LC checkpoint when --resume is set.

    Returns (initial state or None, remaining epoch count).
    """
    if not getattr(args, "resume", False) or lc_ckpt.latest_step() is None:
        return None, total_epochs
    import jax

    template = trainer.init_state(jax.random.PRNGKey(0), sample_x)
    state = lc_ckpt.restore(template)
    remaining = max(total_epochs - int(state.epoch), 0)
    print(f"Resuming LatentConditioner from epoch {int(state.epoch)} "
          f"({remaining} epochs remaining)")
    return state, remaining


def run_latent_conditioner_stage(args, cfg, lc_cfg, vae_model, vae_params,
                                 latent_vectors, hierarchical, new_x_train,
                                 key) -> int:
    import jax

    from simulgen_vae_tpu.data.images import (
        read_latent_conditioner_dataset,
        read_latent_conditioner_dataset_img,
    )
    from simulgen_vae_tpu.data.scaler import latent_conditioner_scaler
    from simulgen_vae_tpu.evaluation import ReconstructionEvaluator
    from simulgen_vae_tpu.models import (
        LatentConditioner,
        LatentConditionerImg,
        LatentConditionerViT,
    )
    from simulgen_vae_tpu.models.conditioner_cnn import sn_filter
    from simulgen_vae_tpu.train.lc_e2e_trainer import E2ETrainer
    from simulgen_vae_tpu.train.lc_trainer import LCTrainer
    from simulgen_vae_tpu.utils.checkpoint import CheckpointManager
    from simulgen_vae_tpu.utils.logging import MetricsLogger

    num_param = latent_vectors.shape[0]
    out_latent = latent_vectors.reshape(num_param, cfg.latent_dim_end)
    xs_vectors = hierarchical.reshape(num_param, -1)

    data_type = lc_cfg.input_type
    if data_type in ("image", "image_vit"):
        print("Loading image data...")
        physical_input, _ = read_latent_conditioner_dataset_img(
            lc_cfg.param_dir, lc_cfg.param_data_type
        )
        physical_input = physical_input / 255.0
        is_image = True
    elif data_type == "image_pca":
        # PCA_MLP mode: the reference ships this reader
        # (latent_conditioner.py:59-98) but never wires it into main;
        # completed here — PCA coefficients feed the MLP conditioner.
        from simulgen_vae_tpu.data.images import (
            read_latent_conditioner_dataset_img_pca,
        )

        print("Loading image data with PCA preprocessing for MLP...")
        physical_input, _ = read_latent_conditioner_dataset_img_pca(
            lc_cfg.param_dir, lc_cfg.param_data_type,
        )
        physical_input, _ = latent_conditioner_scaler(
            physical_input, "./model_save/latent_conditioner_input_scaler.pkl"
        )
        is_image = False
    elif data_type == "csv":
        print("Loading csv data for MLP...")
        physical_input = read_latent_conditioner_dataset(lc_cfg.param_dir)
        physical_input, _ = latent_conditioner_scaler(
            physical_input, "./model_save/latent_conditioner_input_scaler.pkl"
        )
        is_image = False
    else:
        raise NotImplementedError(
            f"Unrecognized latent_conditioner_data_type: {data_type}. "
            'Supported options: "image" (CNN), "image_vit" (ViT), '
            '"image_pca" (PCA->MLP), "csv" (MLP)'
        )

    out_latent, lv_scaler = latent_conditioner_scaler(
        out_latent, "./model_save/latent_vectors_scaler.pkl"
    )
    out_hier_flat, xs_scaler = latent_conditioner_scaler(
        xs_vectors, "./model_save/xs_scaler.pkl"
    )
    size2 = cfg.num_hier
    out_hier = out_hier_flat.reshape(num_param, size2, cfg.latent_dim)

    # -- model --------------------------------------------------------------
    if data_type == "image":
        lc_model = LatentConditionerImg(
            lc_cfg.filters, cfg.latent_dim_end, cfg.latent_dim, size2,
            dropout_rate=lc_cfg.dropout_rate,
            use_attention=lc_cfg.use_spatial_attention,
        )
        lc_sn = sn_filter
    elif data_type == "image_vit":
        lc_model = LatentConditionerViT(
            latent_dim_end=cfg.latent_dim_end, latent_dim=cfg.latent_dim,
            size2=size2, dropout_rate=lc_cfg.dropout_rate,
        )
        lc_sn = None
    else:  # csv / image_pca -> MLP conditioner
        lc_model = LatentConditioner(
            lc_cfg.filters, cfg.latent_dim_end, physical_input.shape[-1],
            cfg.latent_dim, size2, dropout_rate=lc_cfg.dropout_rate,
        )
        lc_sn = None

    logger = MetricsLogger(log_dir="./LatentConditionerRuns",
                           name="LatentConditioner")
    print("Starting LatentConditioner training...")
    from simulgen_vae_tpu.utils.summary import train_state_summary

    # Mid-run checkpointing + resume for the LC/E2E stage (the reference's
    # only restart mechanism is the --lc_only stage split).
    lc_ckpt = CheckpointManager(
        "checkpoints/latent_conditioner",
        save_interval_epochs=max(lc_cfg.epochs // 10, 1),
    )

    if is_image and lc_cfg.use_e2e_training:
        print("Using end-to-end latent conditioner training")
        trainer = E2ETrainer(
            lc_model, vae_model, vae_params, lv_scaler, xs_scaler,
            epochs=lc_cfg.epochs, lr=lc_cfg.lr, batch_size=lc_cfg.batch_size,
            weight_decay=lc_cfg.weight_decay,
            loss_function=lc_cfg.e2e_loss_function, lc_alpha=lc_cfg.lc_alpha,
            use_latent_regularization=lc_cfg.use_latent_regularization,
            latent_reg_weight=lc_cfg.latent_reg_weight, sn_filter=lc_sn,
        )
        # Reference prints torchinfo at latent_conditioner.py:241.
        s = train_state_summary(trainer, key, sample_x=physical_input,
                                name="LatentConditioner (E2E)")
        if s:
            print(s)
        lc_init, remaining = _maybe_resume_lc(args, trainer, lc_ckpt,
                                              physical_input, key,
                                              lc_cfg.epochs)
        lc_state, _ = trainer.fit(
            physical_input, out_latent, out_hier, new_x_train, key,
            state=lc_init, epochs=remaining, ckpt_manager=lc_ckpt,
            log_fn=lambda e, m: logger.log(e, m, lc_cfg.epochs),
        )
    else:
        # Both modes beat the torch reference on the image path, but
        # "standard" wins (h2h main-MSE ratio 0.699 vs 0.739 for enhanced,
        # 3 seeds, CNN on threshold-150 outline images —
        # docs/artifacts/h2h_lc_image.json).  The reference's enhanced path
        # is dead code anyway (its fallbacks TypeError, SURVEY §2.5); it
        # stays opt-in via --lc_loss_mode.
        loss_mode = args.lc_loss_mode
        trainer = LCTrainer(
            lc_model, epochs=lc_cfg.epochs, lr=lc_cfg.lr,
            batch_size=lc_cfg.batch_size, weight_decay=lc_cfg.weight_decay,
            is_image_data=is_image, loss_mode=loss_mode, sn_filter=lc_sn,
        )
        s = train_state_summary(trainer, key, sample_x=physical_input,
                                name=f"LatentConditioner ({data_type})")
        if s:
            print(s)
        lc_init, remaining = _maybe_resume_lc(args, trainer, lc_ckpt,
                                              physical_input, key,
                                              lc_cfg.epochs)
        lc_state, _ = trainer.fit(
            physical_input, out_latent, out_hier, key,
            state=lc_init, epochs=remaining, ckpt_manager=lc_ckpt,
            log_fn=lambda e, m: logger.log(e, m, lc_cfg.epochs),
        )
    logger.close()
    lc_ckpt.close()

    from simulgen_vae_tpu.utils import preemption

    if preemption.requested():
        print(f"Preempted at LC epoch {int(lc_state.epoch)}: state "
              f"checkpointed; rerun with --resume to continue "
              f"(exit {preemption.EX_TEMPFAIL})")
        return preemption.EX_TEMPFAIL

    from simulgen_vae_tpu.utils.checkpoint import save_flax_model

    save_flax_model("model_save/LatentConditioner", {
        "params": lc_state.params,
        "batch_stats": lc_state.batch_stats,
    })

    print("LatentConditioner training completed successfully")
    print("Starting reconstruction evaluation...")
    evaluator = ReconstructionEvaluator(vae_model, vae_params, cfg.num_time)
    predict = (trainer.predict_fn(lc_state) if hasattr(trainer, "predict_fn")
               else None)
    if predict is None:
        def predict(x):
            p = lc_state.params
            variables = {"params": p}
            if lc_state.batch_stats:
                variables["batch_stats"] = lc_state.batch_stats
            return lc_model.apply(variables, x, deterministic=True)

    evaluator.evaluate_reconstruction_comparison(
        predict, physical_input, out_latent, out_hier, new_x_train,
        lv_scaler, xs_scaler, save_dir="checkpoints",
    )

    # Mirror the comparison plots into TensorBoard (reference leaves them
    # as disk PNGs only).
    import glob

    img_logger = MetricsLogger(log_dir="./LatentConditionerRuns",
                               name="LatentConditioner", console=False)
    for i, png in enumerate(sorted(glob.glob("checkpoints/*.png"))[:10]):
        img_logger.log_image_file(
            f"reconstruction/{os.path.basename(png)[:-4]}", png, step=i
        )
    img_logger.close()
    print("Done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
