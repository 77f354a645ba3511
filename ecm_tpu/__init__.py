"""ecm_tpu — TPU-native Explicit-Context-Mapping stereo-matching engine.

A brand-new JAX/XLA/Pallas/pjit framework (not a port) with the capabilities of
the reference repo ``lidongyv/Explicit-Context-Mapping-for-Stereo-Matching``:

- siamese CNN feature extraction (``ecm_tpu.models.features``)
- 4D cost-volume construction from left-right correlation, hand-written Pallas
  kernel (``ecm_tpu.ops.cost_volume``)
- explicit context-mapping modules injecting global scene context into
  aggregation (``ecm_tpu.models.context``)
- stacked-hourglass 3D-conv cost aggregation (``ecm_tpu.models.aggregation``)
- soft-argmin disparity regression (``ecm_tpu.ops.softargmin``)
- SceneFlow / KITTI 2012+2015 / Middlebury data layer (``ecm_tpu.data``)
- data-parallel + disparity-axis cost-volume sharding over a
  ``jax.sharding.Mesh`` (``ecm_tpu.parallel``)

Capability parity map vs. the reference (SURVEY.md section 2): M1-M8 model
components live in ``models/`` + ``ops/``, D1-D6 data components in ``data/``,
T1-T4 driver entry points in ``cli/``, parallelism (section 2.4) in
``parallel/``, native-kernel equivalents (section 2.5) in ``ops/``.
"""

__version__ = "0.1.0"
