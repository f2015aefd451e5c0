"""glomap_tpu — a TPU-native global structure-from-motion engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of GLOMAP
(reference: /root/reference, "Global Structure-from-Motion Revisited",
ECCV 2024): COLMAP database in, COLMAP sparse reconstruction out, via
view-graph calibration, robust relative pose estimation, L1-IRLS rotation
averaging, track establishment, BATA-style global positioning, and global
bundle adjustment — expressed as batched device computations (vmap/jit/
Pallas) instead of Ceres/Eigen/PoseLib/CHOLMOD.

Layer map (mirrors reference layering, SURVEY.md §1, but array-oriented):
  math/        — rotation/gravity/two-view/Sim3 math on batched arrays
  ops/         — device kernels: camera models, triangulation, RANSAC,
                 Schur-complement products, segment reductions (XLA + Pallas)
  scene/       — flat SoA scene state (cameras/frames/images/pairs/tracks)
  processors/  — stateless mask-producing passes (filters, undistortion, ...)
  estimators/  — optimization engines (rotation averaging, positioning, BA)
  controllers/ — pipeline orchestration (GlobalMapper, TrackEngine, ...)
  io/          — COLMAP SQLite database + sparse-model readers/writers
  parallel/    — jax.sharding mesh + shard_map distributed solvers
  native/      — C++ host-side helpers (union-find, graph ops) via ctypes
"""

__version__ = "0.1.0"
