from simulgen_vae_tpu.models.vae import VAE  # noqa: F401
from simulgen_vae_tpu.models.encoder import Encoder  # noqa: F401
from simulgen_vae_tpu.models.decoder import Decoder, reparameterize  # noqa: F401
from simulgen_vae_tpu.models.conditioner_mlp import LatentConditioner  # noqa: F401
from simulgen_vae_tpu.models.conditioner_cnn import LatentConditionerImg  # noqa: F401
from simulgen_vae_tpu.models.conditioner_simple_cnn import SimpleLatentConditionerImg  # noqa: F401
from simulgen_vae_tpu.models.conditioner_vit import LatentConditionerViT  # noqa: F401
