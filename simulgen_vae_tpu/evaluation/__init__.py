from simulgen_vae_tpu.evaluation.reconstruction import (  # noqa: F401
    evaluate_vae_reconstruction,
    evaluate_vae_simple,
)
from simulgen_vae_tpu.evaluation.evaluator import ReconstructionEvaluator  # noqa: F401
