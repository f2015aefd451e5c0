"""Stage-boundary checkpoint/resume (SURVEY.md §5): a run killed after
stage 5 resumes from stage_05.npz and produces the identical final model."""

import glob
import os
import shutil

import numpy as np
import pytest

from glomap_tpu.config import GlobalMapperOptions
from glomap_tpu.controllers.global_mapper import GlobalMapper
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def _opts(ckpt_dir):
    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True   # synthetic poses already decomposed
    opt.skip_view_graph_calibration = True
    opt.opt_relpose.num_hypotheses = 128
    opt.checkpoint_dir = ckpt_dir
    return opt


@pytest.mark.slow
def test_resume_after_stage5_bit_identical(tmp_path):
    def fresh():
        return synthesize_dataset(SyntheticOptions(
            num_frames_per_rig=8, num_points3D=120, seed=90))

    dir_a = str(tmp_path / "ckpt_a")
    scene_a, vg_a, _ = fresh()
    tracks_a = GlobalMapper(_opts(dir_a)).solve(scene_a, vg_a)
    assert tracks_a is not None
    written = sorted(os.path.basename(p) for p in
                     glob.glob(os.path.join(dir_a, "stage_*.npz")))
    assert "stage_05.npz" in written and "stage_07.npz" in written

    # simulate a crash after stage 5: only checkpoints <= 5 survive
    dir_b = str(tmp_path / "ckpt_b")
    os.makedirs(dir_b)
    for name in written:
        if int(name[6:8]) <= 5:
            shutil.copy(os.path.join(dir_a, name),
                        os.path.join(dir_b, name))

    scene_b, vg_b, _ = fresh()
    # poison the fresh inputs to prove the resume path really loads the
    # checkpointed state instead of re-running stages 0-5
    scene_b.frame_quat[:] = np.nan
    tracks_b = GlobalMapper(_opts(dir_b)).solve(scene_b, vg_b)
    assert tracks_b is not None

    assert np.array_equal(scene_a.frame_quat, scene_b.frame_quat)
    assert np.array_equal(scene_a.frame_trans, scene_b.frame_trans)
    assert np.array_equal(scene_a.cam_params, scene_b.cam_params)
    assert np.array_equal(tracks_a.xyz, tracks_b.xyz)
    assert np.array_equal(tracks_a.obs_valid, tracks_b.obs_valid)
    assert np.array_equal(tracks_a.obs_track, tracks_b.obs_track)


def test_maybe_resume_empty_dir(tmp_path):
    from glomap_tpu.controllers.global_mapper import _maybe_resume
    from glomap_tpu.scene.arrays import Scene
    from glomap_tpu.scene.view_graph import ViewGraph
    start, tracks = _maybe_resume(str(tmp_path), Scene(), ViewGraph(),
                                  None)
    assert start == 0 and tracks is None
