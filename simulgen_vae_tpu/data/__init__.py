from simulgen_vae_tpu.data.dataset import (  # noqa: F401
    input_dataset,
    reduce_dataset,
    synthetic_dataset,
)
from simulgen_vae_tpu.data.scaler import MinMaxScaler, data_scaler, latent_conditioner_scaler  # noqa: F401
