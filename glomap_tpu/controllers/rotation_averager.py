"""Rotation averager controller: stratified mixed-prior solving.

Counterpart of glomap/controllers/rotation_averager.{h,cc}
(SolveRotationAveraging): with gravity priors + use_stratified, first
solve the 1-DoF subsystem on the gravity-only subgraph (unless it is
empty or covers >95% of pairs), then the full mixed system. Unknown
cam_from_rig sensors are bootstrapped via per-image trivial solving +
quaternion averaging (reference rotation_initializer.cc) — TODO(round 2):
full unknown-rig re-solve loop.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from glomap_tpu.config import RotationEstimatorOptions
from glomap_tpu.estimators.rotation_averaging import estimate_rotations
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.scene.view_graph import ViewGraph

logger = logging.getLogger(__name__)


@dataclass
class RotationAveragerOptions(RotationEstimatorOptions):
    use_stratified: bool = True


def solve_rotation_averaging(scene: Scene, vg: ViewGraph,
                             opts: RotationAveragerOptions | None = None
                             ) -> bool:
    opts = opts or RotationAveragerOptions()
    vg.keep_largest_connected_component(scene)

    solve_1dof = opts.use_gravity and opts.use_stratified and \
        scene.frame_has_gravity.any()
    if solve_1dof:
        f_i = scene.image_frame[vg.pair_i]
        f_j = scene.image_frame[vg.pair_j]
        grav_pair = vg.pair_valid & scene.frame_has_gravity[f_i] & \
            scene.frame_has_gravity[f_j]
        total = int(vg.pair_valid.sum())
        n_grav = int(grav_pair.sum())
        logger.info("Total image pairs: %d, gravity image pairs: %d",
                    total, n_grav)
        if n_grav == 0 or n_grav > 0.95 * total:
            solve_1dof = False
        if solve_1dof:
            # all frames in the subgraph carry gravity -> pure 1-DoF solve
            if not estimate_rotations(scene, vg, opts,
                                      pair_mask=grav_pair):
                return False

    return estimate_rotations(scene, vg, opts)
