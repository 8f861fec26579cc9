"""Interoperability with the TensorFlow reference implementation.

Two capabilities:
  * ``tf_ref`` — import the reference source tree (read-only) so tests can
    compute golden outputs from the actual TF ops instead of hand-derived
    oracles.
  * ``weight_port`` — port a built reference Keras ``M4Depth`` (or a saved
    reference checkpoint) into a flax parameter pytree for this package's
    ``M4Depth``, enabling full-model forward parity checks and, once the
    released pretrained weights are available, honoring the reference's
    reproduction contract (/root/reference/README.md:155-163).
"""

from m4depth_tpu.interop.weight_port import (  # noqa: F401
    port_reference_model,
    port_reference_checkpoint,
)
from m4depth_tpu.interop.tf_ref import (  # noqa: F401
    reference_available,
    load_reference,
)
