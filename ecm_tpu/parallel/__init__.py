"""Parallelism layer: device mesh, partition rules, cost-volume sharding,
halo exchange (SURVEY.md 2.4 / section 5).

The reference's only strategy is single-node data parallelism via
``torch.nn.DataParallel``; here parallelism is expressed TPU-natively as
sharding annotations over a ``jax.sharding.Mesh`` with axes ``("data",
"disp")`` — GSPMD inserts the gradient all-reduces (ICI) and the halo
exchanges for disparity-axis-sharded 3D convolutions.
"""

from ecm_tpu.parallel.sharding import (
    batch_sharding,
    constrain_volume,
    make_mesh,
    replicate,
    use_mesh,
)

__all__ = [
    "batch_sharding",
    "constrain_volume",
    "make_mesh",
    "replicate",
    "use_mesh",
]
