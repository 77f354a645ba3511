"""TPU-native compute ops: jnp reference implementations + Pallas kernels.

Every Pallas kernel has an exactly-matching jnp reference implementation in the
same module; tests assert bit-level (or tolerance-level) parity between the two.
"""

from ecm_tpu.ops.cost_volume import (
    cost_volume,
    cost_volume_concat_jnp,
    cost_volume_correlation_jnp,
)
from ecm_tpu.ops.softargmin import disparity_regression, softargmin_jnp
from ecm_tpu.ops.upsample import upsample_trilinear

__all__ = [
    "cost_volume",
    "cost_volume_concat_jnp",
    "cost_volume_correlation_jnp",
    "disparity_regression",
    "softargmin_jnp",
    "upsample_trilinear",
]
