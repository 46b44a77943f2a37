from simulgen_vae_tpu.ops.groupnorm_gelu import (  # noqa: F401
    fused_group_norm_gelu,
    group_norm_gelu_reference,
    pallas_enabled,
)
