from simulgen_vae_tpu.train.schedules import (  # noqa: F401
    cosine_warm_restarts,
    lc_warmup_cosine,
    cosine_annealing,
)
from simulgen_vae_tpu.train.vae_trainer import VAETrainer, VAETrainState  # noqa: F401
from simulgen_vae_tpu.train.lc_trainer import LCTrainer, LCTrainState  # noqa: F401
from simulgen_vae_tpu.train.lc_e2e_trainer import E2ETrainer  # noqa: F401
