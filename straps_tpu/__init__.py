"""straps_tpu — TPU-native (JAX/XLA/Pallas) framework for synthetic-training
3D human shape & pose estimation, with the capabilities of the reference
STRAPS system (BMVC 2020) re-designed TPU-first.

Layer map (mirrors SURVEY.md §1 of this repo):
  geometry/   pure-jnp geometry core (L1)
  smpl/       body model: assets + pure-JAX LBS (L2)
  render/     MXU-matmul rasterizer, XLA + Pallas paths (L3)
  models/     flax ResNet encoder + IEF regressor (L4)
  data/,
  augment/    synthetic-data layer, PRNG-keyed augmentations (L5)
  losses/,
  metrics/    multi-task loss + metric trackers (L6)
  train/      jitted, mesh-sharded training loop (L7)
  predict/    proxy-representation front-end + inference rollout (L8)
  cli/        entry points (L9)
  parallel/   device mesh + sharding helpers
"""

__version__ = "0.1.0"
