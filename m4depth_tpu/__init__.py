"""M4Depth-TPU: a TPU-native (JAX/XLA/Pallas) framework for metric monocular
video depth estimation with known 6-DoF camera motion.

Re-designed from scratch for TPU hardware with the capabilities of the
M4Depth reference (michael-fonder/M4Depth): parallax-sweeping cost volumes,
a recurrent multi-level encoder/decoder pyramid, and metric depth recovery
through closed-form 6-DoF parallax/depth conversions.

Design principles (TPU-first):
  * Functional state: temporal memory is an explicit pytree threaded through
    ``jax.lax.scan`` instead of framework-managed mutable variables.
  * Static shapes everywhere; one XLA compilation per dataset geometry.
  * bf16 compute for convolutions/correlations, fp32 for geometry.
  * Data parallelism via ``jax.sharding.Mesh`` + NamedSharding; collectives
    are inserted by XLA over ICI.
"""

__version__ = "0.1.0"

from m4depth_tpu.config import AblationFlags, ModelConfig

__all__ = ["AblationFlags", "ModelConfig", "__version__"]
