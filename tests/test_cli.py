"""CLI tests: mapper, mapper_resume, rotation_averager end to end."""

import pytest

# full-pipeline runs take minutes each; see pyproject markers
pytestmark = pytest.mark.slow

import numpy as np

from glomap_tpu.cli import main
from glomap_tpu.io import pose_io
from glomap_tpu.io.colmap_model import read_model
from glomap_tpu.io.database import write_database
from glomap_tpu.scene.arrays import Scene
from glomap_tpu.utils.synthetic import SyntheticOptions, synthesize_dataset


def test_cli_mapper_and_resume(tmp_path):
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=8, num_points3D=120, seed=90))
    db = str(tmp_path / "db.db")
    write_database(db, scene, vg)

    out = str(tmp_path / "sparse")
    rc = main(["mapper", "--database_path", db, "--output_path", out,
               "--TrackEstablishment.min_num_view_per_track", "3",
               "--RelPoseEstimation.num_hypotheses=128"])
    assert rc == 0
    cams, imgs, pts = read_model(out + "/0")
    assert len(imgs) == scene.num_images
    assert len(pts) > 50

    out2 = str(tmp_path / "sparse2")
    rc = main(["mapper_resume", "--input_path", out + "/0",
               "--output_path", out2])
    assert rc == 0
    cams2, imgs2, pts2 = read_model(out2 + "/0")
    assert len(imgs2) == scene.num_images


def test_cli_rotation_averager(tmp_path):
    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=10, num_points3D=120, seed=91))
    rel = str(tmp_path / "relpose.txt")
    pose_io.write_rel_poses(rel, scene, vg)

    out = str(tmp_path / "rotations.txt")
    rc = main(["rotation_averager", "--relpose_path", rel,
               "--output_path", out])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) == scene.num_images

    # verify pairwise-relative accuracy against GT
    import jax.numpy as jnp
    from glomap_tpu.math import rotation as rotm
    name_to_q = {}
    for ln in lines:
        parts = ln.split()
        name_to_q[parts[0]] = np.asarray([float(x) for x in parts[1:5]])
    q_est = np.stack([name_to_q[n] for n in scene.image_names])
    q_gt = gt["image_quat"]
    ii, jj = np.triu_indices(len(q_est), k=1)
    rel_e = rotm.quat_mul(jnp.asarray(q_est)[ii],
                          rotm.quat_conj(jnp.asarray(q_est)[jj]))
    rel_g = rotm.quat_mul(jnp.asarray(q_gt)[ii],
                          rotm.quat_conj(jnp.asarray(q_gt)[jj]))
    err = np.degrees(np.asarray(rotm.relative_quat_angle_rad(rel_e, rel_g)))
    assert err.max() < 1e-4


def test_cli_rejects_unknown_flags():
    """A typo'd dotted flag exits with an error instead of silently
    running with defaults (reference boost::program_options behavior)."""
    from glomap_tpu.cli import _apply_dotted_flags
    from glomap_tpu.config import GlobalMapperOptions

    with pytest.raises(SystemExit):
        _apply_dotted_flags(GlobalMapperOptions(),
                            ["--BundleAdjustment.max_num_iterationz=5"])
    # valid flags still apply
    opt = _apply_dotted_flags(
        GlobalMapperOptions(),
        ["--BundleAdjustment.max_num_iterations=5",
         "--Thresholds.max_epipolar_error_E=2.0",
         "--GlobalPositioning.use_gpu=1"])
    assert opt.opt_ba.max_num_iterations == 5
    assert opt.inlier_thresholds.max_epipolar_error_E == 2.0


def test_parity_real_harness(tmp_path, capsys, monkeypatch):
    """scripts/parity_real.py runs the mapper on a database and reports
    ATE / rotation / registered counts against a supplied COLMAP model
    (the BASELINE.md real-scene acceptance flow, runnable the moment a
    benchmark DB exists)."""
    import importlib.util
    import json
    import os
    import sys

    from glomap_tpu.io.convert import write_reconstruction
    from glomap_tpu.scene.arrays import Tracks

    scene, vg, gt = synthesize_dataset(
        SyntheticOptions(num_frames_per_rig=8, num_points3D=120, seed=92))
    db = str(tmp_path / "db.db")
    write_database(db, scene, vg)

    # reference model dir from the GT poses (stand-in for a model the
    # reference binary wrote)
    ref_dir = str(tmp_path / "ref")
    gt_scene = scene.copy()
    gt_scene.frame_quat = gt["frame_quat"].copy()
    gt_scene.frame_trans = gt["frame_trans"].copy()
    tr = Tracks(xyz=gt["points"].copy(),
                valid=np.ones(len(gt["points"]), dtype=bool),
                color=np.zeros((len(gt["points"]), 3), dtype=np.uint8),
                obs_track=np.zeros(0, np.int32),
                obs_image=np.zeros(0, np.int32),
                obs_feature=np.zeros(0, np.int32),
                obs_valid=np.zeros(0, bool))
    write_reconstruction(ref_dir, gt_scene, tr)

    spec = importlib.util.spec_from_file_location(
        "parity_real", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "parity_real.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "parity_real.py", db, ref_dir + "/0",
        "--RelPoseEstimation.num_hypotheses=128"])
    rc = mod.main()
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["common"] == scene.num_images
    assert rep["ate_max"] < 0.1
    assert rep["rot_err_max_deg"] < 0.5
    assert rep["registered_est"] == rep["registered_ref"]
