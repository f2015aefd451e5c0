"""Real-scene parity harness: run the mapper on a COLMAP database and
compare against a reference reconstruction (the BASELINE.md acceptance
criterion: ATE parity with GLOMAP's output on gerrard-hall /
south-building / 1DSfM scenes, reference README.md:63-88).

Usage:
  python scripts/parity_real.py <database.db> <ref_model_dir> \
      [--output_path /tmp/parity_out] [--txt] [mapper dotted flags...]

<ref_model_dir> is a COLMAP sparse model dir (cameras/images/points3D in
bin or txt) produced by the reference `glomap mapper` (or colmap). The
harness runs OUR mapper on the database, matches images by NAME,
Sim3-aligns the estimated camera centers onto the reference's, and
prints one JSON line: ATE (max/mean/median), pairwise rotation error,
registered-image counts, and point counts. Zero-egress containers can't
download the benchmark scenes (CLAUDE.md known gaps); when a scene DB is
available this is the one-command parity check.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _model_centers(images):
    """COLMAP images dict -> {name: (center, qvec cam_from_world)}."""
    from glomap_tpu.math import rotation as rotm
    out = {}
    for iid, (q, t, cam_id, name, pts2d, p3d) in images.items():
        c = np.asarray(rotm.pose_center(q, t))
        out[name] = (c, np.asarray(q))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("database_path")
    ap.add_argument("ref_model_dir")
    ap.add_argument("--output_path", default="")
    ap.add_argument("--txt", action="store_true",
                    help="write the estimated model as txt instead of bin")
    args, extra = ap.parse_known_args()

    import logging
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s")

    from glomap_tpu import config as cfg
    from glomap_tpu.cli import _apply_dotted_flags
    from glomap_tpu.controllers.global_mapper import GlobalMapper
    from glomap_tpu.io.colmap_model import read_model
    from glomap_tpu.io.convert import database_to_scene, write_reconstruction
    from glomap_tpu.io.database import read_database
    from glomap_tpu.math import rotation as rotm
    from glomap_tpu.math.sim3 import apply_sim3, umeyama_alignment

    opt = _apply_dotted_flags(cfg.GlobalMapperOptions(), extra)
    scene, vg = database_to_scene(read_database(args.database_path))
    t0 = time.time()
    tracks = GlobalMapper(opt).solve(scene, vg)
    wall = time.time() - t0
    if tracks is None:
        print(json.dumps({"metric": "parity_real", "error": "mapper failed"}))
        return 1
    if args.output_path:
        write_reconstruction(args.output_path, scene, tracks,
                             binary=not args.txt)

    _, ref_images, ref_points = read_model(args.ref_model_dir)
    ref = _model_centers(ref_images)

    reg = scene.frame_registered[scene.image_frame]
    q_img, t_img = scene.image_cam_from_world()
    est_c = np.asarray(rotm.pose_center(q_img, t_img))
    names = scene.image_names

    common, est_list, ref_list, q_est, q_ref = [], [], [], [], []
    for k, name in enumerate(names):
        if reg[k] and name in ref:
            common.append(name)
            est_list.append(est_c[k])
            ref_list.append(ref[name][0])
            q_est.append(np.asarray(q_img[k]))
            q_ref.append(ref[name][1])
    if len(common) < 3:
        print(json.dumps({
            "metric": "parity_real",
            "error": f"only {len(common)} common registered images"}))
        return 1

    est_arr = np.stack(est_list)
    ref_arr = np.stack(ref_list)
    s, R, t = umeyama_alignment(est_arr, ref_arr)
    ate = np.linalg.norm(apply_sim3(s, R, t, est_arr) - ref_arr, axis=-1)

    import jax.numpy as jnp
    qe = jnp.asarray(np.stack(q_est))
    qr = jnp.asarray(np.stack(q_ref))
    n = len(common)
    rng = np.random.default_rng(0)
    ii = rng.integers(0, n, min(20000, n * (n - 1) // 2))
    jj = rng.integers(0, n, len(ii))
    keep = ii != jj
    ii, jj = ii[keep], jj[keep]
    rel_e = rotm.quat_mul(qe[ii], rotm.quat_conj(qe[jj]))
    rel_r = rotm.quat_mul(qr[ii], rotm.quat_conj(qr[jj]))
    rot_err = np.degrees(np.asarray(
        rotm.relative_quat_angle_rad(rel_e, rel_r)))

    print(json.dumps({
        "metric": "parity_real",
        "db": os.path.basename(args.database_path),
        "wall_s": round(wall, 1),
        "registered_est": int(reg.sum()),
        "registered_ref": len(ref),
        "common": len(common),
        "ate_max": float(ate.max()),
        "ate_mean": float(ate.mean()),
        "ate_median": float(np.median(ate)),
        "rot_err_max_deg": float(rot_err.max()),
        "rot_err_median_deg": float(np.median(rot_err)),
        "points_est": int(tracks.valid.sum()),
        "points_ref": len(ref_points),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
