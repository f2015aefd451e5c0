"""Scene state as flat structure-of-arrays.

TPU-native counterpart of the reference scene layer (glomap/scene/*.h):
where the reference passes six unordered_maps (rigs, cameras, frames,
images, tracks + view_graph) by reference through every stage
(glomap/controllers/global_mapper.h:49-55), we hold dense index-mapped
numpy/JAX arrays so every estimator is a batched device computation.

Entity model (mirrors reference rig/frame awareness, scene/types.h:14-57):
  camera  — intrinsics (canonicalized superset params, see ops/camera_models)
  sensor  — a (rig, camera) slot; pose `sensor_from_rig`, identity for the
            rig's reference sensor
  frame   — a rig snapshot at one instant; pose `rig_from_world`
  image   — a (frame, sensor) capture; cam_from_world =
            sensor_from_rig ∘ rig_from_world
  track   — a 3D point + its 2D observations (flat obs arrays)

Filters never delete: validity is boolean masks (static shapes under jit).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import numpy as np

from glomap_tpu.math import rotation as rotm
from glomap_tpu.ops import camera_models as cm


def _empty(shape, dtype=np.float64):
    return np.zeros(shape, dtype=dtype)


@dataclass
class Scene:
    """Cameras, sensors, frames, images, keypoints (host-resident SoA)."""

    # --- cameras (C) ---
    camera_ids: np.ndarray = field(default_factory=lambda: _empty((0,), np.int64))
    cam_model_id: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    cam_params: np.ndarray = field(default_factory=lambda: _empty((0, cm.NUM_CANONICAL)))
    cam_kind: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    cam_width: np.ndarray = field(default_factory=lambda: _empty((0,), np.int64))
    cam_height: np.ndarray = field(default_factory=lambda: _empty((0,), np.int64))
    cam_has_prior_focal: np.ndarray = field(default_factory=lambda: _empty((0,), bool))

    # --- rigs (R) / sensors (S) ---
    rig_ids: np.ndarray = field(default_factory=lambda: _empty((0,), np.int64))
    sensor_rig: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    sensor_camera: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    sensor_quat: np.ndarray = field(default_factory=lambda: _empty((0, 4)))
    sensor_trans: np.ndarray = field(default_factory=lambda: _empty((0, 3)))
    sensor_is_ref: np.ndarray = field(default_factory=lambda: _empty((0,), bool))
    # sensor_from_rig known a priori (vs to be estimated on the fly)
    sensor_known: np.ndarray = field(default_factory=lambda: _empty((0,), bool))

    # --- frames (F) ---
    frame_ids: np.ndarray = field(default_factory=lambda: _empty((0,), np.int64))
    frame_rig: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    frame_quat: np.ndarray = field(default_factory=lambda: _empty((0, 4)))
    frame_trans: np.ndarray = field(default_factory=lambda: _empty((0, 3)))
    frame_registered: np.ndarray = field(default_factory=lambda: _empty((0,), bool))
    frame_cluster: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    frame_has_gravity: np.ndarray = field(default_factory=lambda: _empty((0,), bool))
    frame_gravity: np.ndarray = field(default_factory=lambda: _empty((0, 3)))

    # --- images (I) ---
    image_ids: np.ndarray = field(default_factory=lambda: _empty((0,), np.int64))
    image_names: list = field(default_factory=list)
    image_frame: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    image_camera: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    image_sensor: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))

    # --- keypoints, flat over all images (K) ---
    kp_xy: np.ndarray = field(default_factory=lambda: _empty((0, 2)))
    kp_offset: np.ndarray = field(default_factory=lambda: _empty((1,), np.int64))
    # unit bearing rays in camera frame; filled by the undistortion pass
    # (counterpart of reference Image::features_undist)
    kp_ray: np.ndarray = field(default_factory=lambda: _empty((0, 3)))

    # ------------------------------------------------------------------
    @property
    def num_cameras(self):
        return len(self.camera_ids)

    @property
    def num_frames(self):
        return len(self.frame_ids)

    @property
    def num_images(self):
        return len(self.image_ids)

    @property
    def num_keypoints(self):
        return len(self.kp_xy)

    def kp_slice(self, image_idx: int) -> slice:
        return slice(int(self.kp_offset[image_idx]),
                     int(self.kp_offset[image_idx + 1]))

    def kp_index(self, image_idx, feature_idx):
        """Global keypoint index for (image, feature)."""
        return self.kp_offset[image_idx] + feature_idx

    def image_cam_from_world(self):
        """Per-image (quat, trans): sensor_from_rig ∘ rig_from_world.

        Counterpart of reference Image::CamFromWorld composition
        (glomap/scene/image.h:60-104).
        """
        fq = self.frame_quat[self.image_frame]
        ft = self.frame_trans[self.image_frame]
        sq = self.sensor_quat[self.image_sensor]
        st = self.sensor_trans[self.image_sensor]
        q, t = rotm.rigid_compose(sq, st, fq, ft)
        return np.asarray(q), np.asarray(t)

    def image_centers(self):
        q, t = self.image_cam_from_world()
        return np.asarray(rotm.pose_center(q, t))

    def frame_centers(self):
        return np.asarray(rotm.pose_center(self.frame_quat, self.frame_trans))

    def image_registered(self):
        return self.frame_registered[self.image_frame]

    def copy(self) -> "Scene":
        out = Scene()
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            setattr(out, f.name, v.copy() if hasattr(v, "copy") else list(v))
        return out


@dataclass
class Tracks:
    """3D tracks + flat observation arrays (counterpart of
    glomap/scene/track.h, re-laid-out as segment arrays for segment_sum)."""

    xyz: np.ndarray = field(default_factory=lambda: _empty((0, 3)))
    valid: np.ndarray = field(default_factory=lambda: _empty((0,), bool))
    color: np.ndarray = field(default_factory=lambda: _empty((0, 3), np.uint8))

    obs_track: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    obs_image: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    obs_feature: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    obs_valid: np.ndarray = field(default_factory=lambda: _empty((0,), bool))

    @property
    def num_tracks(self):
        return len(self.xyz)

    @property
    def num_obs(self):
        return len(self.obs_track)

    def track_lengths(self, num_tracks=None):
        n = num_tracks or self.num_tracks
        return np.bincount(self.obs_track[self.obs_valid], minlength=n)

    def compact(self) -> "Tracks":
        """Drop invalid tracks/observations and renumber (host-side; used at
        stage boundaries, never inside jitted code)."""
        keep_obs = self.obs_valid & self.valid[self.obs_track]
        counts = np.bincount(self.obs_track[keep_obs], minlength=self.num_tracks)
        keep_track = self.valid & (counts > 0)
        new_idx = np.cumsum(keep_track) - 1
        keep_obs &= keep_track[self.obs_track]
        out = Tracks(
            xyz=self.xyz[keep_track],
            valid=np.ones(int(keep_track.sum()), dtype=bool),
            color=self.color[keep_track] if len(self.color) else self.color,
            obs_track=new_idx[self.obs_track[keep_obs]].astype(np.int32),
            obs_image=self.obs_image[keep_obs],
            obs_feature=self.obs_feature[keep_obs],
            obs_valid=np.ones(int(keep_obs.sum()), dtype=bool),
        )
        return out

    def copy(self) -> "Tracks":
        return Tracks(self.xyz.copy(), self.valid.copy(), self.color.copy(),
                      self.obs_track.copy(), self.obs_image.copy(),
                      self.obs_feature.copy(), self.obs_valid.copy())
