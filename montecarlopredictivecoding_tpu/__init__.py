"""montecarlopredictivecoding_tpu — a TPU-native JAX framework for
Monte Carlo Predictive Coding (MCPC).

A ground-up, TPU-first rebuild of the capabilities of the reference PyTorch
research code (gaspardol/MonteCarloPredictiveCoding): energy-based
predictive-coding networks with explicit latent pytrees, deterministic PC
inference (MAP descent) and MCPC inference (Langevin dynamics) compiled to
``lax.scan`` chains, Monte-Carlo-averaged local weight updates, the full
evaluation stack (FID, masked-reconstruction MSE, marginal likelihood,
classifier probes, KL statistics), the DLGM baseline and the ResNet-9
ideal-observer classifier, with ``vmap`` over batch/chains and
``jax.sharding`` meshes over TPU chips.
"""

from . import core
from .core import (
    PC,
    Activation,
    EngineConfig,
    GenerativeModel,
    LangevinStep,
    Linear,
    OptimizerSpec,
    PCModel,
    PCTrainer,
    bernoulli_fn,
    bernoulli_fn_mask,
    fe_fn,
    fe_fn_mask,
    gaussian_energy,
    make_mlp_model,
    sample_x_fn,
    sample_x_fn_cte,
    sample_x_fn_normal,
    scaled_gaussian_energy,
    zero_fn,
)

__version__ = "0.1.0"
